package graft.ops

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.io.{Csv, Fetch, Jdbc, Tables}
import graft.pipeline.Pipeline
import graft.schema.Schemas

/** Source/sink + pipeline operator catalog (SURVEY §2.1 S1-S11, §2.8, §3).
  * Fixture-backed queries (q60/q61) write deterministic inputs to a temp dir
  * driver-side — that's test scaffolding; the operators under test
  * (readers, fetch stage, merge) are fully distributed.
  */
object IoQueries {

  /** FIXTURES.md §B master.idx fixture: 9-line preamble, header, dashed
    * separator, 4 data rows — rows 3 and 4 must die in the semi-joins. */
  private val masterIdx: String =
    """Description:           Master Index of EDGAR Dissemination Feed
      |Last Data Received:    March 31, 2018
      |Comments:              webmaster@sec.gov
      |Anonymous FTP:         ftp://ftp.sec.gov/edgar/
      |Cloud HTTP:            https://www.sec.gov/Archives/
      |
      |
      |
      |CIK|Company Name|Form Type|Date Filed|Filename
      |--------------------------------------------------------------------------------
      |43350|GAS NATURAL INC|10-K|2018-03-14|edgar/data/43350/0000043350-18-000010.txt
      |1616262|ROCKY MOUNTAIN CHOCOLATE|8-K|2018-02-01|edgar/data/1616262/0001616262-18-000004.txt
      |999999|NOT IN UNIVERSE CORP|10-K|2018-01-05|edgar/data/999999/0000999999-18-000001.txt
      |43350|GAS NATURAL INC|4|2018-03-02|edgar/data/43350/0000043350-18-000007.txt
      |""".stripMargin

  /** companies.csv fixture — UTF-8 BOM, quoted name with comma, null cik. */
  private val companiesCsv: String =
    "﻿permno,ticker,cik,business_name\n" +
      "10001,EGAS,43350,Gas Natural Inc.\n" +
      "10044,RMCF,1616262,\"Rocky Mountain Chocolate Factory, Inc.\"\n" +
      "10099,NOCK,,No Cik Corp\n"

  private val filingTypesCsv: String =
    "type_id,type,keep\n1,4,0\n2,8-K,1\n5,10-Q,1\n9,10-K,1\n"

  /** Second-quarter idx fixture for q93: two universe rows (both 10-Q) and
    * one out-of-universe CIK that must die in the semi-join. */
  private val masterIdxQ2: String =
    """Description:           Master Index of EDGAR Dissemination Feed
      |
      |CIK|Company Name|Form Type|Date Filed|Filename
      |--------------------------------------------------------------------------------
      |43350|GAS NATURAL INC|10-Q|2018-05-15|edgar/data/43350/0000043350-18-000020.txt
      |1616262|ROCKY MOUNTAIN CHOCOLATE|10-Q|2018-06-01|edgar/data/1616262/0001616262-18-000011.txt
      |999999|NOT IN UNIVERSE CORP|8-K|2018-04-05|edgar/data/999999/0000999999-18-000002.txt
      |""".stripMargin

  private def writeTemp(prefix: String, files: (String, String)*): String = {
    val dir = java.nio.file.Paths.get(graft.util.Scratch.dir(prefix))
    files.foreach { case (name, content) =>
      Files.write(dir.resolve(name), content.getBytes(StandardCharsets.UTF_8))
    }
    dir.toString
  }

  /** S1+S3+P3-P7+J2 e2e: BOM'd CSV dims + EDGAR idx parse + universe
    * semi-joins (EP2's core DAG on the FIXTURES.md fixtures). */
  private val q60IdxIngest: Q = (s, d) => {
    import s.implicits._
    val dir = writeTemp("graft_idx_",
      "master.idx" -> masterIdx,
      "companies.csv" -> companiesCsv,
      "filing_types.csv" -> filingTypesCsv)
    val (companies, filingTypes) =
      Pipeline.loadDims(s, s"$dir/companies.csv", s"$dir/filing_types.csv")
    val idx = Csv.readEdgarIdx(s, s"$dir/master.idx")
    Pipeline.indexLoad(idx, companies, filingTypes)
      // filing_id in the output gates the id rule itself: DuckDB's
      // md5(path) must equal Spark's md5(path), hex for hex
      .select($"filing_id", $"cik", $"business_name", $"type", $"date", $"path")
      .orderBy($"cik")
  }

  /** S5+X1+T-chain+F1 e2e (EP3 port): queue → partitioned file:// fetch →
    * sanitize → tokenize → merge; output survives a real fetch round-trip. */
  private val q61ScrapePipeline: Q = (s, d) => {
    import s.implicits._
    val docs = Tables.documents(s, d).filter($"doc_id" < 50)
    val dir = java.nio.file.Paths.get(graft.util.Scratch.dir("graft_corpus_"))
    docs.select($"doc_id", $"text").collect().foreach { r =>
      Files.write(dir.resolve(s"doc_${r.getLong(0)}.txt"),
        r.getString(1).getBytes(StandardCharsets.UTF_8))
    }
    val filings = docs.select(
      $"doc_id".as("filing_id"),
      concat(lit("doc_"), $"doc_id", lit(".txt")).as("path"),
      lit(null).cast("string").as("text"),
      lit(null).cast("array<string>").as("token"))
    val scraped = Pipeline.scrape(filings, new Fetch.FileFetcher(),
      p => concat(lit(s"$dir/"), p), parallelism = 4)
    scraped.select($"filing_id".as("doc_id"), $"text".as("clean"))
      .orderBy($"doc_id")
  }

  /** EP2 multi-quarter orchestration (q19 grid → fetch → parse → universe
    * filter → idempotent append, `load_filings_idx.py:37-57`): both fixture
    * quarters are loaded, then quarter 2 is RE-RUN — the second pass must
    * append nothing, so idempotence shows up directly in the oracle's row
    * count (4, not 6). */
  private val q93MultiQuarter: Q = (s, d) => {
    import s.implicits._
    val dir = writeTemp("graft_mq_",
      "2018_QTR1.idx" -> masterIdx,
      "2018_QTR2.idx" -> masterIdxQ2,
      "companies.csv" -> companiesCsv,
      "filing_types.csv" -> filingTypesCsv)
    val store = graft.util.Scratch.dir("graft_mq_store_")
    val (companies, filingTypes) =
      Pipeline.loadDims(s, s"$dir/companies.csv", s"$dir/filing_types.csv")
    val url = (y: org.apache.spark.sql.Column, q: org.apache.spark.sql.Column) =>
      concat(lit(s"$dir/"), y, lit("_QTR"), q, lit(".idx"))
    val fetcher = new Fetch.FileFetcher()
    Pipeline.loadFilings(s, store, Seq((2018, 1), (2018, 2)), url, fetcher,
      companies, filingTypes)
    Pipeline.loadFilings(s, store, Seq((2018, 2)), url, fetcher,
      companies, filingTypes)
      .select($"cik", $"business_name", $"type", $"date", $"path")
      .orderBy($"path")
  }

  /** S10: batch upsert semantics (MERGE as left join + coalesce). */
  private val q62Upsert: Q = (s, d) => {
    import s.implicits._
    val base = Tables.orders(s, d).select($"o_orderkey", $"o_orderstatus")
    val updates = base.filter($"o_orderkey" % 10 === 0)
      .select($"o_orderkey", lit("X").as("new_status"))
    base.join(updates, Seq("o_orderkey"), "left")
      .select($"o_orderkey",
        coalesce($"new_status", $"o_orderstatus").as("o_orderstatus"))
      .orderBy($"o_orderkey")
  }

  /** S6+S7: JDBC round-trip through embedded Derby (write nation, read it
    * back with pruning pushed to the database). */
  private val q63JdbcRoundtrip: Q = (s, d) => {
    import s.implicits._
    val url = s"jdbc:derby:${graft.util.Scratch.dir("graft_derby_")}/db;create=true"
    Tables.nation(s, d).write.mode("overwrite").jdbc(url, "nation", new java.util.Properties())
    Jdbc.readTable(s, url, "nation")
      .toDF("n_nationkey", "n_name", "n_regionkey")
      .select($"n_nationkey".cast("int"), $"n_name", $"n_regionkey".cast("int"))
      .orderBy($"n_nationkey")
  }

  /** S8+S9: DDL + CTAS through the session catalog. */
  private val q64Ctas: Q = (s, d) => {
    import s.implicits._
    val loc = graft.util.Scratch.dir("graft_ctas_")
    s.sql("DROP TABLE IF EXISTS graft_ctas_nation")
    Tables.nation(s, d).createOrReplaceTempView("graft_nation_src")
    s.sql(
      s"""CREATE TABLE graft_ctas_nation USING PARQUET LOCATION '$loc/t'
          AS SELECT n_nationkey, n_name FROM graft_nation_src WHERE n_nationkey < 10""")
    s.table("graft_ctas_nation").orderBy($"n_nationkey")
  }

  /** S11: SQL `TABLESAMPLE (100 ROWS)` parity (the reference's
    * `TABLESAMPLE SYSTEM_ROWS(n)`, `scrape_all_filings.py:128-133`).
    * Which rows land is engine-local, so the gate measures the row-count
    * contract n == least(requested, |table|) — exact, not statistical —
    * plus sample ⊆ source and no duplicate draws, as oracle-able columns
    * (q18's measured-contract pattern). */
  private val q65TableSample: Q = (s, d) => {
    import s.implicits._
    val src = s.read.parquet(s"$d/lineitem.parquet")
      .select($"l_orderkey", $"l_linenumber")
    val sampled = s.sql(
      s"SELECT l_orderkey, l_linenumber FROM parquet.`$d/lineitem.parquet` TABLESAMPLE (100 ROWS)")
      .cache()
    val n = sampled.count()
    val subsetOk =
      sampled.join(src, Seq("l_orderkey", "l_linenumber"), "left_anti").count() == 0
    // per-pair multiplicity, not distinctness — the projected pair isn't
    // unique in the synthetic lineitem (see q18)
    val multOk = sampled.groupBy($"l_orderkey", $"l_linenumber")
      .agg(count(lit(1)).as("ns"))
      .join(src.groupBy($"l_orderkey", $"l_linenumber")
        .agg(count(lit(1)).as("n0")), Seq("l_orderkey", "l_linenumber"), "left")
      .filter($"n0".isNull || $"ns" > $"n0").count() == 0
    s.range(1).select(
      lit(n).as("n_rows"),
      lit(subsetOk).as("subset_of_source"),
      lit(multOk).as("within_source_multiplicity"))
  }

  /** X2/A3: monitor snapshot — done/remaining counts + rate/ETA arithmetic
    * (`monitor_scraper_progress.py:17-29`; 300 s cadence). */
  private val q66Monitor: Q = (s, d) => {
    import s.implicits._
    Tables.documents(s, d)
      .withColumn("text", when($"doc_id" % 3 === 0, lit(null)).otherwise($"text"))
      .agg(
        sum(when($"text".isNotNull, 1L).otherwise(0L)).as("done"),
        sum(when($"text".isNull, 1L).otherwise(0L)).as("remaining"))
      .select($"done", $"remaining",
        ($"done" / lit(300.0)).as("rows_per_sec"),
        ($"remaining" / ($"done" / lit(300.0))).as("eta_sec"))
  }

  /** EP4: the SQL surface — registered engine functions usable from
    * spark.sql over parquet-backed tables (sanitize, tokenize, full-text
    * match compile to the same codegen'd plans as the Column API). */
  private val q67SqlSurface: Q = (s, d) => {
    graft.functions.Functions.registerAll(s)
    s.sql(
      s"""SELECT doc_id,
          graft_nfkd(text) AS norm,
          graft_stem('merges') AS stemmed,
          graft_sanitize(text) AS clean,
          graft_ts_match(graft_tokenize(text), 'merges joining') AS matched
          FROM parquet.`$d/documents.parquet` ORDER BY doc_id""")
  }

  /** S-series: JSON source/sink round-trip — documents land as JSON lines
    * and come back bit-identical through an explicit schema read. */
  private val q68JsonRoundtrip: Q = (s, d) => {
    import s.implicits._
    val dir = graft.util.Scratch.dir("graft_json_")
    val docs = Tables.documents(s, d)
    docs.write.mode("overwrite").json(dir)
    s.read.schema(docs.schema).json(dir)
      .select($"doc_id", $"text", $"lang", $"source", $"n_chars")
      .orderBy($"doc_id")
  }

  /** E4/S-series: whole-file binary source (`binaryFile`) — the multimodal
    * ingestion path: opaque payload bytes + file metadata columns, doc id
    * recovered from the filename. */
  private val q69BinaryFiles: Q = (s, d) => {
    import s.implicits._
    val docs = Tables.documents(s, d).filter($"doc_id" < 50)
    val dir = java.nio.file.Paths.get(graft.util.Scratch.dir("graft_bin_"))
    docs.select($"doc_id", $"text").collect().foreach { r =>
      Files.write(dir.resolve(s"doc_${r.getLong(0)}.bin"),
        r.getString(1).getBytes(StandardCharsets.UTF_8))
    }
    s.read.format("binaryFile").load(dir.toString)
      .select(
        regexp_extract(element_at(split($"path", "/"), -1), "doc_(\\d+)\\.bin", 1)
          .cast("long").as("doc_id"),
        $"length".as("n_bytes"),
        md5($"content").as("md5_hex"))
      .orderBy($"doc_id")
  }

  /** S-series: ORC source/sink round-trip (the second columnar format the
    * engine reads/writes; date + string + integer types preserved). */
  private val q79OrcRoundtrip: Q = (s, d) => {
    import s.implicits._
    val dir = graft.util.Scratch.dir("graft_orc_")
    Tables.orders(s, d)
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_orderdate", $"o_totalprice")
      .write.mode("overwrite").orc(dir)
    s.read.orc(dir).orderBy($"o_orderkey")
  }

  /** S-series: XML source/sink round-trip (Spark 4's built-in XML data
    * source — the format family EDGAR's SGML is adjacent to). */
  private val q87XmlRoundtrip: Q = (s, d) => {
    import s.implicits._
    val dir = graft.util.Scratch.dir("graft_xml_")
    val docs = Tables.documents(s, d)
    docs.write.mode("overwrite")
      .option("rootTag", "docs").option("rowTag", "doc")
      .format("xml").save(dir)
    s.read.schema(docs.schema)
      .option("rowTag", "doc")
      // default trims surrounding whitespace in element text — lossless
      // round-trips need it off
      .option("ignoreSurroundingSpaces", "false")
      .format("xml").load(dir)
      .select($"doc_id", $"text", $"lang", $"source", $"n_chars")
      .orderBy($"doc_id")
  }

  /** Multiset set ops: INTERSECT ALL / EXCEPT ALL (duplicate-preserving
    * variants of q16/q17/q24), tagged and unioned into one result. */
  private val q88MultisetOps: Q = (s, d) => {
    import s.implicits._
    val c = Tables.customer(s, d).select($"c_nationkey".as("nationkey"))
    val p = Tables.supplier(s, d).select($"s_nationkey".as("nationkey"))
    c.intersectAll(p).withColumn("op", lit("intersect_all"))
      .unionByName(c.exceptAll(p).withColumn("op", lit("except_all")))
      .orderBy($"op", $"nationkey")
  }

  /** UDAF surface: custom typed Aggregator (deterministic mode) used from
    * the DataFrame API — merges map-side like built-in aggregates. */
  private val q80GroupMode: Q = (s, d) => {
    import s.implicits._
    val mode = udaf(Aggregators.ModeAgg)
    Tables.orders(s, d)
      .groupBy($"o_orderstatus")
      .agg(mode($"o_orderpriority").as("mode_priority"),
        count(lit(1)).as("n"))
      .orderBy($"o_orderstatus")
  }

  /** Skew pattern: salted join of lineitem against a deliberately skewed
    * key (75% of rows collapse onto one key). Salting changes placement
    * only, so the plain SQL join is the oracle. */
  private val q74SaltedJoin: Q = (s, d) => {
    import s.implicits._
    val skewed = Tables.lineitem(s, d)
      .select(when($"l_suppkey" % 4 =!= 0, lit(0L)).otherwise($"l_suppkey").as("skey"),
        $"l_quantity")
    val dim = Tables.supplier(s, d).select($"s_suppkey".as("skey"), $"s_nationkey")
    SkewJoin.saltedInnerJoin(skewed, dim, "skey", salts = 16)
      .groupBy($"s_nationkey")
      .agg(count(lit(1)).as("n"), sum($"l_quantity").as("sum_qty"))
      .orderBy($"s_nationkey")
  }

  /** Bucketing: co-located join — both sides bucketed by the join key into
    * the session catalog, so the join needs NO exchange (verified in
    * PlanSpec); the scalable shape for repeated fact-fact joins. */
  private val q75BucketedJoin: Q = (s, d) => {
    import s.implicits._
    graft.io.Catalog.dropManaged(s, "graft_bkt_orders")
    graft.io.Catalog.dropManaged(s, "graft_bkt_customer")
    Tables.orders(s, d).select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("graft_bkt_orders")
    Tables.customer(s, d).select($"c_custkey", $"c_mktsegment")
      .write.mode("overwrite").bucketBy(8, "c_custkey").sortBy("c_custkey")
      .saveAsTable("graft_bkt_customer")
    s.table("graft_bkt_orders")
      .join(s.table("graft_bkt_customer"), $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_orders"), money(sum(dec($"o_totalprice"))).as("sum_price"))
      .orderBy($"c_mktsegment")
  }

  /** Partition pruning: events written partitioned by event_type; the
    * 'click' read touches ONE partition directory (PartitionFilters in the
    * scan, verified in PlanSpec) — the layout that turns a 100 TB scan into
    * a per-category one. */
  private val q76PartitionPruning: Q = (s, d) => {
    import s.implicits._
    val dir = graft.util.Scratch.dir("graft_part_")
    Tables.events(s, d).write.mode("overwrite").partitionBy("event_type").parquet(dir)
    s.read.parquet(dir)
      .filter($"event_type" === "click")
      .groupBy(date_trunc("hour", $"ts").as("hour"))
      .agg(count(lit(1)).as("n"), money(sum(dec($"value"))).as("sum_value"))
      .orderBy($"hour")
  }

  val queries: Map[String, Q] = Map(
    "q68_json_roundtrip"  -> q68JsonRoundtrip,
    "q69_binary_files"    -> q69BinaryFiles,
    "q79_orc_roundtrip"   -> q79OrcRoundtrip,
    "q80_group_mode"      -> q80GroupMode,
    "q87_xml_roundtrip"   -> q87XmlRoundtrip,
    "q88_multiset_ops"    -> q88MultisetOps,
    "q74_salted_join"     -> q74SaltedJoin,
    "q75_bucketed_join"   -> q75BucketedJoin,
    "q76_partition_pruning" -> q76PartitionPruning,
    "q60_idx_ingest"      -> q60IdxIngest,
    "q93_multi_quarter"   -> q93MultiQuarter,
    "q61_scrape_pipeline" -> q61ScrapePipeline,
    "q62_upsert"          -> q62Upsert,
    "q63_jdbc_roundtrip"  -> q63JdbcRoundtrip,
    "q64_ctas"            -> q64Ctas,
    "q65_tablesample"     -> q65TableSample,
    "q66_monitor"         -> q66Monitor,
    "q67_sql_surface"     -> q67SqlSurface)

  /** q61's oracle = the sanitize chain in SQL (the fetch round-trip is
    * lossless, so scraped text must equal sanitize(documents.text)). */
  private val sanitizeSql: String =
    """trim(regexp_replace(
       array_to_string(list_filter(string_split(
         regexp_replace(translate(regexp_replace(lower(text), '<.+?>', ' ', 'g'),
                        chr(10)||chr(9)||chr(147)||chr(148), '  ""'),
                        '&#160;|&nbsp;', ' ', 'g'),
         ' '), w -> length(w) < 20), ' '),
       '\s+', ' ', 'g'))"""

  val oracle: Map[String, String] = Map(
    "q68_json_roundtrip" ->
      """SELECT doc_id, text, lang, source, n_chars FROM documents
         ORDER BY doc_id""",
    "q69_binary_files" ->
      """SELECT doc_id, CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
         md5(text) AS md5_hex
         FROM documents WHERE doc_id < 50 ORDER BY doc_id""",
    "q79_orc_roundtrip" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_orderdate, o_totalprice
         FROM orders ORDER BY o_orderkey""",
    "q87_xml_roundtrip" ->
      """SELECT doc_id, text, lang, source, n_chars FROM documents
         ORDER BY doc_id""",
    "q88_multiset_ops" ->
      """SELECT nationkey, 'intersect_all' AS op FROM (
           SELECT c_nationkey AS nationkey FROM customer
           INTERSECT ALL SELECT s_nationkey FROM supplier)
         UNION ALL
         SELECT nationkey, 'except_all' AS op FROM (
           SELECT c_nationkey AS nationkey FROM customer
           EXCEPT ALL SELECT s_nationkey FROM supplier)
         ORDER BY op, nationkey""",
    "q80_group_mode" ->
      """SELECT o_orderstatus, o_orderpriority AS mode_priority, n FROM (
           SELECT o_orderstatus, o_orderpriority,
                  CAST(sum(cnt) OVER (PARTITION BY o_orderstatus) AS BIGINT) AS n,
                  row_number() OVER (PARTITION BY o_orderstatus
                                     ORDER BY cnt DESC, o_orderpriority) AS rk
           FROM (SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
                 FROM orders GROUP BY 1, 2) c) t
         WHERE rk = 1 ORDER BY o_orderstatus""",
    "q74_salted_join" ->
      """SELECT s_nationkey, count(*) AS n, sum(l_quantity) AS sum_qty
         FROM (SELECT CASE WHEN l_suppkey % 4 <> 0 THEN 0 ELSE l_suppkey END AS skey,
                      l_quantity
               FROM lineitem) l
         JOIN supplier ON skey = s_suppkey
         GROUP BY s_nationkey ORDER BY s_nationkey""",
    "q75_bucketed_join" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q76_partition_pruning" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
         count(*) AS n,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events WHERE event_type = 'click'
         GROUP BY 1 ORDER BY hour""",
    "q60_idx_ingest" ->
      """SELECT md5(path) AS filing_id, cik, business_name, type, date, path
         FROM (VALUES
           (CAST(43350 AS BIGINT), 'GAS NATURAL INC', '10-K', DATE '2018-03-14',
            'edgar/data/43350/0000043350-18-000010.txt'),
           (CAST(1616262 AS BIGINT), 'ROCKY MOUNTAIN CHOCOLATE', '8-K', DATE '2018-02-01',
            'edgar/data/1616262/0001616262-18-000004.txt'))
         AS t(cik, business_name, type, date, path) ORDER BY cik""",
    "q93_multi_quarter" ->
      """SELECT * FROM (VALUES
           (CAST(1616262 AS BIGINT), 'ROCKY MOUNTAIN CHOCOLATE', '8-K', DATE '2018-02-01',
            'edgar/data/1616262/0001616262-18-000004.txt'),
           (CAST(1616262 AS BIGINT), 'ROCKY MOUNTAIN CHOCOLATE', '10-Q', DATE '2018-06-01',
            'edgar/data/1616262/0001616262-18-000011.txt'),
           (CAST(43350 AS BIGINT), 'GAS NATURAL INC', '10-K', DATE '2018-03-14',
            'edgar/data/43350/0000043350-18-000010.txt'),
           (CAST(43350 AS BIGINT), 'GAS NATURAL INC', '10-Q', DATE '2018-05-15',
            'edgar/data/43350/0000043350-18-000020.txt'))
         AS t(cik, business_name, type, date, path) ORDER BY path""",
    "q61_scrape_pipeline" ->
      s"SELECT doc_id, $sanitizeSql AS clean FROM documents WHERE doc_id < 50 ORDER BY doc_id",
    "q62_upsert" ->
      """SELECT o_orderkey,
         CASE WHEN o_orderkey % 10 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus
         FROM orders ORDER BY o_orderkey""",
    "q63_jdbc_roundtrip" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
    "q64_ctas" ->
      """SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 10
         ORDER BY n_nationkey""",
    // TABLESAMPLE (n ROWS) must return exactly least(n, |table|) rows from
    // the table — WHICH rows is engine-local; the count and membership
    // contracts gate (q18's pattern)
    "q65_tablesample" ->
      """SELECT CAST(least(100, (SELECT count(*) FROM lineitem)) AS BIGINT) AS n_rows,
                true AS subset_of_source, true AS within_source_multiplicity""",
    "q66_monitor" ->
      """SELECT done, remaining,
         done / 300.0 AS rows_per_sec,
         remaining / (done / 300.0) AS eta_sec
         FROM (SELECT CAST(sum(CASE WHEN doc_id % 3 = 0 THEN 0 ELSE 1 END) AS BIGINT) AS done,
                      CAST(sum(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS remaining
               FROM documents) t""",
    "q67_sql_surface" ->
      s"""SELECT doc_id, text AS norm, '${graft.text.Porter.stem("merges")}' AS stemmed,
          ${TextQueries.sanitizeSql} AS clean,
          list_contains(${TextQueries.tokenizeSql}, '${graft.text.Porter.stem("merges")}')
            AND list_contains(${TextQueries.tokenizeSql}, '${graft.text.Porter.stem("joining")}') AS matched
          FROM documents ORDER BY doc_id""")
}
