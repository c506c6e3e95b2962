package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.{Csv, Fetch}
import graft.schema.Schemas
import graft.text.TextOps

/** The three reference entry points (SURVEY §3 EP1-EP3) re-composed as lazy
  * DataFrame DAGs. Storage is caller-supplied (parquet dirs in tests, JDBC
  * in a production deployment via graft.io.Jdbc) — each stage takes and
  * returns DataFrames.
  */
object Pipeline {

  /** EP1 (bootstrap): load the dimension tables from CSV
    * (`init_tables.py:72-100`). BOM + quoted names handled by the reader. */
  def loadDims(spark: SparkSession, companiesCsv: String,
               filingTypesCsv: String): (DataFrame, DataFrame) =
    (Csv.readCsv(spark, companiesCsv, Schemas.companies),
      Csv.readCsv(spark, filingTypesCsv, Schemas.filingTypes))

  /** EP1 destructive re-init gate (X4): the reference asks Y/N on stdin
    * before dropping tables (`init_tables.py:13-22`); the engine port is a
    * `force` flag — re-initializing a non-empty store without `force=true`
    * throws instead of silently destroying it. Returns the dim frames and
    * (over)writes them to the store. */
  def bootstrap(spark: SparkSession, storeDir: String,
                companiesCsv: String, filingTypesCsv: String,
                force: Boolean = false): (DataFrame, DataFrame) = {
    // Hadoop FS, not java.io.File: on a cluster store (hdfs://, s3a://) a
    // local-File probe is ALWAYS false — the destructive-init gate would
    // silently pass and overwrite a non-empty store without force
    val marker = new org.apache.hadoop.fs.Path(s"$storeDir/companies")
    val fs = marker.getFileSystem(spark.sessionState.newHadoopConf())
    require(force || !fs.exists(marker),
      s"bootstrap would overwrite existing store at $storeDir — pass force=true " +
        "(the reference's interactive Y/N gate, init_tables.py:13-22)")
    val (companies, filingTypes) = loadDims(spark, companiesCsv, filingTypesCsv)
    companies.write.mode("overwrite").parquet(s"$storeDir/companies")
    filingTypes.write.mode("overwrite").parquet(s"$storeDir/filing_types")
    (companies, filingTypes)
  }

  /** EP2 (index load): parse master.idx files, filter to the company /
    * kept-filing-type universe via broadcast semi-joins
    * (`load_filings_idx.py:37-48`), assign filing ids. One lazy DAG; at
    * scale the fact side streams through two broadcast semi-joins with no
    * shuffle. */
  def indexLoad(idx: DataFrame, companies: DataFrame, filingTypes: DataFrame): DataFrame = {
    val universe = broadcast(companies.select("cik").where(col("cik").isNotNull).distinct())
    val keptTypes = broadcast(
      filingTypes.filter(col("keep") === 1).select("type").distinct())
    idx
      .join(universe, Seq("cik"), "left_semi")
      .join(keptTypes, Seq("type"), "left_semi")
      // deterministic 128-bit id from the unique path: md5 hex has no
      // birthday ceiling at any realistic corpus size (10⁹ docs → collision
      // odds ~10⁻²⁰, vs the old 64-bit xxhash64's ~2.7% at 10⁹), and DuckDB
      // computes the identical value, so the id rule itself is oracle-gated
      // (q60). The idempotent append (loadFilings) anti-joins on this id.
      .withColumn("filing_id", md5(col("path")))
      .withColumn("text", lit(null).cast("string"))
      .withColumn("token", lit(null).cast("array<string>"))
      .select("filing_id", "cik", "business_name", "type", "path", "date", "text", "token")
  }

  /** EP2 orchestration, multi-quarter (`load_filings_idx.py:37-57`): the
    * (year × quarter) URL grid → ONE partitioned fetch of every master.idx →
    * parse → universe semi-joins → idempotent append into the filings store.
    * The reference loops quarters sequentially because each is a driver-side
    * download; Spark-first the whole grid is one fetch stage (a partition
    * per quarter) and one append job.
    *
    * Idempotence is an anti-join on `filing_id` against what the store
    * already holds: re-running any quarter — or the whole grid — appends
    * zero duplicate rows, so crashed runs are simply re-run. A quarter whose
    * fetch fails yields a null body, drops out of this batch, and is picked
    * up by the next invocation (the same work-queue semantics as the scrape
    * stage). Returns the refreshed store frame.
    *
    * At warehouse scale the store would be laid out by quarter
    * (`partitionBy(year, qtr)`) or key-bucketed (see
    * `Streams.incrementalMergeBucketed`); the append-only + anti-join shape
    * is unchanged by the layout. */
  def loadFilings(spark: SparkSession, storeDir: String,
                  quarters: Seq[(Int, Int)],
                  url: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column,
                  fetcher: Fetch.Fetcher,
                  companies: DataFrame, filingTypes: DataFrame): DataFrame = {
    import spark.implicits._
    val filingsDir = s"$storeDir/filings"
    val grid = quarters.toDF("year", "qtr")
      .select(($"year" * 10 + $"qtr").cast("long").as("qid"),
        url($"year", $"qtr").as("url"))
    val fetched = Fetch.fetchStage(grid, "qid", "url", fetcher,
      parallelism = math.max(1, quarters.size))
    val idx = Csv.parseEdgarIdxBody(fetched.filter(col("body").isNotNull), col("body"))
    val incoming = indexLoad(idx, companies, filingTypes)
    // schema-explicit read: an existing-but-empty store (all fetches failed
    // on a previous first run) reads as an empty frame instead of failing
    // parquet schema inference
    def store = spark.read.schema(incoming.schema).parquet(filingsDir)
    // Hadoop FS, not java.io.File: a local-File probe is always false on a
    // cluster store, which would skip the anti-join and append duplicate
    // filings on EVERY re-run — the exact idempotence this method promises
    val filingsPath = new org.apache.hadoop.fs.Path(filingsDir)
    val storeExists = filingsPath
      .getFileSystem(spark.sessionState.newHadoopConf()).exists(filingsPath)
    val novel =
      (if (storeExists)
        incoming.join(store.select("filing_id"), Seq("filing_id"), "left_anti")
      else incoming)
        .dropDuplicates("filing_id") // overlapping grid entries within one call
    // parquet append never rewrites existing files, so reading the store in
    // `novel` while appending to it is safe (file listing is pre-append)
    novel.write.mode("append").parquet(filingsDir)
    store
  }

  /** The work queue: rows not yet scraped (null-text semantics drive the
    * queue exactly as in the reference — `load_filings_idx.py:68-72`). */
  def workQueue(filings: DataFrame): DataFrame =
    filings.filter(col("text").isNull).select("filing_id", "path")

  /** EP3 (scrape): fetch every queued document, run the sanitize chain,
    * tokenize, and merge results back — the batch-atomic port of the
    * UPDATE-plus-triggers loop (`scrape_all_filings.py:117-183`;
    * tokenization moves from a Postgres trigger into this explicit
    * write-path transform). Failed fetches keep text NULL and simply stay
    * queued; re-running a batch is idempotent. */
  def scrape(filings: DataFrame, fetcher: Fetch.Fetcher,
             urlFor: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
             parallelism: Int = 20): DataFrame = {
    val queue = workQueue(filings).withColumn("url", urlFor(col("path")))
    val fetched = Fetch.fetchStage(queue, "filing_id", "url", fetcher, parallelism)
      .filter(col("body").isNotNull)
      .select(col("filing_id"),
        TextOps.sanitizeFiling(col("body")).as("new_text"))
      .withColumn("new_token", TextOps.tokenize(col("new_text")))
    mergeScraped(filings, fetched)
  }

  /** Batch MERGE: apply (filing_id, new_text, new_token) onto filings.
    * Equivalent of Delta `MERGE INTO ... WHEN MATCHED UPDATE`; against plain
    * parquet it's a left join + coalesce, one shuffle on the key. */
  def mergeScraped(filings: DataFrame, scraped: DataFrame): DataFrame =
    filings.join(scraped, Seq("filing_id"), "left")
      .withColumn("text", coalesce(col("new_text"), col("text")))
      .withColumn("token", coalesce(col("new_token"), col("token")))
      .drop("new_text", "new_token")

  /** X2 (monitor): progress snapshot + rate/ETA from two snapshots
    * (`monitor_scraper_progress.py:14-29`) — pure arithmetic, testable. */
  case class Progress(done: Long, remaining: Long)

  def progress(filings: DataFrame): Progress = {
    val agg = filings.agg(
      sum(when(col("text").isNotNull, 1L).otherwise(0L)).as("done"),
      sum(when(col("text").isNull, 1L).otherwise(0L)).as("remaining"))
      .head()
    Progress(Option(agg.getLong(0)).getOrElse(0L), Option(agg.getLong(1)).getOrElse(0L))
  }

  /** Rows/sec + ETA-seconds between two snapshots dt seconds apart. */
  def rateAndEta(prev: Progress, cur: Progress, dtSeconds: Double): (Double, Double) = {
    val rate = (cur.done - prev.done) / dtSeconds
    val eta = if (rate > 0) cur.remaining / rate else Double.PositiveInfinity
    (rate, eta)
  }
}
