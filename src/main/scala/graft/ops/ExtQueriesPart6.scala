package graft.ops
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.io.Tables

import graft.ops.ExtQueriesShared._

/** Catalog part 6 — the round-9 storage-layout & serving family: the
  * physical-design audits behind 100 TB table maintenance (Z-order
  * clustering quality, zone-map skipping effectiveness, encoding-gain
  * estimation) and the SymSpell deletion-neighborhood spell corrector
  * (the serving-side fuzzy-lookup primitive). All exact-integer, all
  * DuckDB-oracle-gated. */
private[ops] object ExtQueriesPart6 {

  /** Bits per dimension for the Z-order interleave (16 → a 32-bit key). */
  private val ZBits = 16
  /** Coarse-cell shift: top 6 interleaved bits → 64 cells. */
  private[ops] val ZCellShift = 2 * ZBits - 6

  /** The Morton interleave, built at plan time from the same loop in two
    * dialects (no UDF, no per-row loop — 32 shift-mask terms):
    * z = Σ_i bit_i(x)·4^i + Σ_i bit_i(y)·2·4^i. */
  private def zExprSql(x: String, y: String): String =
    (0 until ZBits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", ") + (", ")")

  private def zCol(x: Column, y: Column): Column =
    (0 until ZBits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** Z-ORDER CLUSTERING AUDIT — the Delta/Iceberg OPTIMIZE ZORDER
    * question answered with numbers: bucket the (user, day) event keys
    * into 64 coarse cells under (a) Morton-interleaved Z-order and (b)
    * plain primary-key order, and measure each cell's min-max extent in
    * BOTH dimensions. Z-order trades a little extent in the lead
    * dimension for bounded extent in both — which is what makes min/max
    * zone maps prune multi-dimensional predicates. The cell key is pure
    * arithmetic on the top interleaved bits (NO global sort, NO ntile —
    * a single-partition window would be the classic scale bug here).
    *
    * 100 TB shape: map-only key derivation, one 128-cell aggregate with
    * map-side partials, 2-row fold. */
  private val q333ZorderAudit: Q = (s, d) => {
    import s.implicits._
    // min-max normalize both dims onto the full 16-bit grid first — raw
    // user ids and epoch days occupy a sliver of [0, 2^16), and Z-order
    // over un-normalized keys collapses every row into one coarse cell
    // (exactly the mistake a real OPTIMIZE ZORDER implementation must
    // avoid: interleave RANKS or scaled values, not raw values)
    val raw = Tables.events(s, d)
      .select($"user_id".cast("long").as("xr"),
        datediff(to_date($"ts"), lit("1970-01-01")).cast("long").as("yr"))
      .distinct()
    val mm = raw.agg(min($"xr").as("mnx"), max($"xr").as("mxx"),
      min($"yr").as("mny"), max($"yr").as("mxy"))
    val top = (1L << ZBits) - 1
    val keys = raw.crossJoin(broadcast(mm))
      .select(
        expr(s"((xr - mnx) * $top) div greatest(mxx - mnx, 1)").as("x"),
        expr(s"((yr - mny) * $top) div greatest(mxy - mny, 1)").as("y"))
    val cells = keys
      .withColumn("zcell", shiftright(zCol($"x", $"y"), ZCellShift))
      .withColumn("kcell", shiftright($"x", ZBits - 6))
    def extents(cellCol: String, layout: String) = cells
      .groupBy(col(cellCol).as("cell"))
      .agg((max($"x") - min($"x")).as("xr"), (max($"y") - min($"y")).as("yr"),
        count(lit(1)).as("n"))
      .agg(lit(layout).as("layout"), count(lit(1)).as("n_cells"),
        expr("sum(xr) div count(1)").as("mean_x_extent"),
        expr("sum(yr) div count(1)").as("mean_y_extent"),
        max($"n").as("max_cell_rows"))
    extents("zcell", "zorder").unionByName(extents("kcell", "rowkey"))
      .orderBy($"layout")
  }

  /** Simulated file width for the zone-map audits (rows per "file"). */
  private[ops] val ZoneFileRows = 1000L

  /** ZONE-MAP SKIPPING AUDIT — the parquet row-group pruning mechanism
    * measured: documents split into doc_id-range "files", per-file
    * min/max of n_chars recorded (the zone map), and a grid of
    * `n_chars >= t` predicates evaluated purely against the maps. For
    * each threshold: how many files a scan may skip (max < t), and the
    * scan amplification — rows inside surviving files vs rows actually
    * matching — in exact ppm. High amplification at high selectivity is
    * the signal that the table needs re-clustering (q333's operation).
    *
    * 100 TB shape: one (file) aggregate builds the maps; the predicate
    * grid is a broadcast crossJoin against the per-file map table (files
    * × thresholds, never rows × thresholds). */
  private val q334ZonemapSkipping: Q = (s, d) => {
    import s.implicits._
    val files = Tables.documents(s, d)
      .select(expr(s"doc_id div $ZoneFileRows").as("file_id"), $"n_chars")
      .groupBy($"file_id")
      .agg(min($"n_chars").as("mn"), max($"n_chars").as("mx"),
        count(lit(1)).as("rows"),
        sum(when($"n_chars" >= 500, 1L).otherwise(0L)).as("m500"),
        sum(when($"n_chars" >= 1000, 1L).otherwise(0L)).as("m1000"),
        sum(when($"n_chars" >= 2000, 1L).otherwise(0L)).as("m2000"),
        sum(when($"n_chars" >= 4000, 1L).otherwise(0L)).as("m4000"))
    val grid = Seq(500L, 1000L, 2000L, 4000L).toDF("t")
    files.crossJoin(broadcast(grid))
      .select($"t", $"file_id", $"rows", $"mx",
        when($"t" === 500, $"m500").when($"t" === 1000, $"m1000")
          .when($"t" === 2000, $"m2000").otherwise($"m4000").as("matched"))
      .groupBy($"t")
      .agg(count(lit(1)).as("n_files"),
        sum(when($"mx" < $"t", 1L).otherwise(0L)).as("n_skipped"),
        sum(when($"mx" >= $"t", $"rows").otherwise(0L)).as("rows_scanned"),
        sum($"matched").as("rows_matched"))
      .withColumn("scan_amp_ppm",
        expr("(rows_scanned * 1000000) div greatest(rows_matched, 1)"))
      .orderBy($"t")
  }

  /** Rows per simulated encoding block (parquet-page-ish). */
  private[ops] val EncBlockRows = 1000L

  /** ENCODING-GAIN ESTIMATOR — the storage-planning audit: for each
    * candidate column, exact run counts (RLE potential) and distinct
    * counts (dictionary width) measured in storage order WITHIN
    * page-sized blocks, folded to dict_bits = ⌈log2(card)⌉ and
    * rle_runs_ppm = runs/rows. Runs are counted per block via a local
    * sort of ≤[[EncBlockRows]] collected (key, value) structs — the
    * per-file shape of a real encoder, NOT a global window (a
    * whole-table lag would single-partition the sort).
    *
    * 100 TB shape: one (block) aggregate per column with bounded
    * collect_list width, then a value-domain fold; distincts are one
    * (column, value) shuffle. */
  private val q335EncodingGain: Q = (s, d) => {
    import s.implicits._
    val cols = Seq("o_orderstatus", "o_orderpriority")
    val stackArgs = lit(cols.size) +:
      cols.flatMap(c => Seq(lit(c), col(c).cast("string")))
    val base = Tables.orders(s, d)
      .select($"o_orderkey", stack(stackArgs: _*).as(Seq("col", "v")))
    val runs = base
      .groupBy($"col", expr(s"o_orderkey div $EncBlockRows").as("blk"))
      .agg(sort_array(collect_list(struct($"o_orderkey", $"v"))).as("arr"))
      .select($"col",
        size($"arr").cast("long").as("n"),
        (size(filter(
          zip_with(slice($"arr", lit(1), size($"arr") - 1),
            slice($"arr", lit(2), size($"arr") - 1),
            (a, b) => a.getField("v") =!= b.getField("v")),
          x => x)) + 1).cast("long").as("n_runs"))
      .groupBy($"col").agg(sum($"n").as("n_rows"), sum($"n_runs").as("n_runs"))
    val card = base.select($"col", $"v").distinct()
      .groupBy($"col").agg(count(lit(1)).as("n_distinct"))
    runs.join(card, "col")
      .select($"col", $"n_rows", $"n_runs", $"n_distinct",
        expr("cast(ceil(ln(n_distinct) / ln(2)) as bigint)").as("dict_bits"),
        expr("(n_runs * 1000000) div n_rows").as("rle_runs_ppm"))
      .orderBy($"col")
  }

  /** SymSpell suggestion count per typo. */
  private[ops] val SymSpellTopK = 3

  /** SYMSPELL SPELL CORRECTION (Garbe's deletion-neighborhood method) —
    * the serving-side fuzzy lookup: instead of an edit-distance join
    * (quadratic) or per-query Levenshtein scan (linear per query),
    * BOTH vocabulary and queries expand to their distance-1 DELETION
    * variants, and candidates form by exact equi-join on the shared
    * variant key — each word generates |w|+1 keys, so the index is
    * linear in corpus vocabulary and lookup is a hash probe. Typos are
    * derived deterministically in-query (3rd char dropped from the five
    * most frequent ≥5-char words), candidates verify with
    * levenshtein ≤ 1 and rank by corpus frequency.
    *
    * 100 TB shape: vocab deletion expansion is one explode (≈|w|×vocab
    * rows); the typo side is broadcast-tiny; candidates are a broadcast
    * hash join + one top-k window over ≤ typos×candidates rows. */
  private val q336Symspell: Q = (s, d) => {
    import s.implicits._
    val vocab = Tables.documents(s, d)
      .select(explode(graft.text.TextOps.words($"text")).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("freq"))
      .cache()
    val typos = vocab.filter(length($"w") >= 5)
      .withColumn("rk", row_number().over(
        Window.orderBy($"freq".desc, $"w")))
      .filter($"rk" <= 5)
      .select(concat(substring($"w", 1, 2), substring($"w", 4, 1000))
        .as("typo"))
      .distinct()
    // deletion variants: the word itself + each single-char-dropped form
    def dels(c: Column): Column = array_union(
      array(c),
      expr(s"transform(sequence(1, length(${c.toString()})), " +
        s"i -> concat(substring(${c.toString()}, 1, i - 1), " +
        s"substring(${c.toString()}, i + 1, 1000000)))"))
    val vIdx = vocab.select($"w", $"freq", explode(dels($"w")).as("k"))
    val tIdx = typos.select($"typo", explode(dels($"typo")).as("k"))
    vIdx.join(broadcast(tIdx), "k")
      .select($"typo", $"w", $"freq").distinct()
      .filter(levenshtein($"typo", $"w") <= 1)
      .withColumn("rank", row_number().over(
        Window.partitionBy($"typo").orderBy($"freq".desc, $"w")))
      .filter($"rank" <= SymSpellTopK)
      .select($"typo", $"rank", $"w".as("suggestion"), $"freq",
        levenshtein($"typo", $"w").cast("long").as("dist"))
      .orderBy($"typo", $"rank")
  }

  /** Shard counts for the q343/q344 placement audits: the "add one
    * shard to a 16-shard fleet" rebalance question. */
  private val ShardsBefore = 16
  private val ShardsAfter = 17
  /** Virtual nodes per shard on the consistent-hash ring. */
  private val RingVnodes = 16
  /** The 52-bit hash space (13 md5 hex digits — the q44 house trick,
    * bit-identical in Spark `conv` and DuckDB '0x' cast). 52 bits, not
    * 60, so that (value · 2048 + shard) packs into ONE long: the packed
    * encoding keeps the per-key argmin/argmax inside codegen
    * HashAggregate with primitive buffers — a min(struct(dist, shard))
    * aggregate falls back to SortAggregate and SORTS the whole
    * keys×ring product (measured 38 s vs ~3 s at sf0.1). */
  private val Ring52 = 4503599627370496L
  /** Shard-id packing radix: shard < 2048 rides the low bits, so
    * min/max over packed longs IS the (value, shard) lexicographic
    * tiebreak. */
  private val PackRadix = 2048L

  /** 52-bit md5-derived key hash, identical in both engines. */
  private def h52(c: Column): Column =
    conv(substring(md5(c), 1, 13), 16, 10).cast("long")

  /** The same 52-bit md5 prefix computed JVM-side — MessageDigest md5 ==
    * Spark md5 == DuckDB md5, so ring-node positions built here are
    * bit-identical to the oracle's SQL derivation. Used for the ring
    * CONSTANT only (272 values); keys always hash engine-side. */
  private def md5hex13(s: String): Long = {
    val dig = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.lang.Long.parseLong(
      dig.take(7).map(b => f"$b%02x").mkString.substring(0, 13), 16)
  }

  /** CONSISTENT-HASH RING REBALANCE AUDIT — the data-movement planning
    * question behind every shard-count change at 100 TB: adding one
    * shard to a 16-shard fleet moves ~16/17 of ALL keys under naive
    * `hash mod S` placement but only ~1/17 under a vnode ring
    * (Karger et al., STOC'97). Both schemes are computed EXACTLY over
    * the order keys: `mod` reassigns h%16 → h%17; `ring` assigns each
    * key to the clockwise-nearest of 17×16 md5-positioned vnodes
    * (before-state = the shard<16 subset of the same ring, so adding a
    * shard only inserts nodes — the property the scheme exists for).
    * Output per scheme: exact moved count/ppm and the post-move max
    * shard load (the balance cost vnodes pay for low movement).
    *
    * 100 TB shape: the ring is a 272-value literal (a model constant,
    * like q49's centroids); assignment is a map-only per-key successor
    * probe over the sorted position array — no keys×ring join, no row
    * amplification, nothing shuffles until the |shards|-row count
    * folds. No global sort, no repartition by ring position. */
  private val q343RingRebalance: Q = (s, d) => {
    import s.implicits._
    // ring nodes are a 272-value MODEL CONSTANT (like q49's centroids):
    // built JVM-side and embedded as SORTED literal arrays, so
    // assignment is a per-key clockwise-SUCCESSOR probe — first ring
    // position ≥ h, wrapping to the global minimum — which is exactly
    // argmin of (pos − h) mod 2^52 with the (pos, shard) tiebreak. The
    // probe replaces a keys×ring crossJoin: no 272× row amplification
    // (measured 30 s → ~1 s at sf0.1; at 10¹² keys the join form would
    // materialize 2.7·10¹⁴ rows), no shuffle until the |shards|-row
    // count folds.
    val ringAll = (for (sh <- 0 until ShardsAfter; v <- 0 until RingVnodes)
      yield (md5hex13(s"$sh:$v"), sh)).sorted
    val ringBef = ringAll.filter(_._2 < ShardsBefore)
    def succ(ring: Seq[(Long, Int)], h: Column): Column = {
      // clockwise successor by BINARY SEARCH over the sorted position
      // array (captured as a plain JVM array — 272 longs ride the task
      // closure). The previous higher-order `filter(pa, p < h)` form
      // allocated and scanned a 272-element array per row per ring
      // (profiled: 1.8 s single-task at sf0.1); lo = |{p : p < h}| is the
      // same index the filter counted, so the assignment is bit-identical.
      val pa = ring.map(_._1).toArray
      val sa = ring.map(_._2).toArray
      val f = udf((hv: Long) => {
        var lo = 0; var hi = pa.length
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (pa(mid) < hv) lo = mid + 1 else hi = mid
        }
        sa(lo % pa.length)
      })
      f(h)
    }
    val asg = Tables.orders(s, d)
      .select(h52($"o_orderkey".cast("string")).as("h"))
      .select($"h",
        succ(ringBef, $"h").as("before"), succ(ringAll, $"h").as("after"))
    val ringStats = asg
      .select(($"before" =!= $"after").cast("long").as("mv"), $"after")
      .groupBy($"after").agg(count(lit(1)).as("n"), sum($"mv").as("mvd"))
      .agg(sum($"n").as("n_keys"), sum($"mvd").as("n_moved"),
        max($"n").as("max_load"))
      .select(lit("ring").as("scheme"), $"n_keys", $"n_moved",
        expr("(n_moved * 1000000) div n_keys").as("moved_ppm"),
        expr("(max_load * 1000000) div n_keys").as("max_load_ppm"))
    val modStats = Tables.orders(s, d)
      .select(h52($"o_orderkey".cast("string")).as("h"))
      .select((pmod($"h", lit(ShardsBefore.toLong)) =!=
        pmod($"h", lit(ShardsAfter.toLong))).cast("long").as("mv"),
        pmod($"h", lit(ShardsAfter.toLong)).as("after"))
      .groupBy($"after").agg(count(lit(1)).as("n"), sum($"mv").as("mvd"))
      .agg(sum($"n").as("n_keys"), sum($"mvd").as("n_moved"),
        max($"n").as("max_load"))
      .select(lit("mod").as("scheme"), $"n_keys", $"n_moved",
        expr("(n_moved * 1000000) div n_keys").as("moved_ppm"),
        expr("(max_load * 1000000) div n_keys").as("max_load_ppm"))
    modStats.unionByName(ringStats).orderBy($"scheme")
  }

  /** RENDEZVOUS (HRW) ROUTING AUDIT — the vnode-free alternative:
    * shard = argmax md5(key#shard) (Thaler & Ravishankar, 1996) gives
    * minimal movement AND near-perfect balance with zero ring state.
    * Per-shard accounting of the same 16→17 transition: the NEW shard
    * gains exactly the keys whose shard-16 score beats their old max
    * (the scheme's optimality made visible — surviving shards gain
    * NOTHING), each surviving shard loses only its ~1/17 departures,
    * and before/after loads show the balance.
    *
    * 100 TB shape: one |shards|-row broadcast crossJoin folding to
    * per-key max-struct partials map-side, then a 17-row value-domain
    * fold — movement accounting for a petabyte fleet with one pass. */
  private val q344RendezvousRouting: Q = (s, d) => {
    import s.implicits._
    val shards = (0 until ShardsAfter).toDF("shard")
    // packed = score·2048 + shard: max(packed) IS argmax by
    // (score desc, shard desc) — same codegen rationale as q343
    val asg = Tables.orders(s, d)
      .select($"o_orderkey".cast("string").as("k"))
      .crossJoin(broadcast(shards))
      .select($"k", $"shard",
        (h52(concat($"k", lit("#"), $"shard".cast("string"))) * PackRadix
          + $"shard").as("packed"))
      .groupBy($"k")
      .agg(
        max(when($"shard" < ShardsBefore, $"packed")).as("pb"),
        max($"packed").as("pa"))
      .select(pmod($"pb", lit(PackRadix)).as("before"),
        pmod($"pa", lit(PackRadix)).as("after"))
    val before = asg.groupBy($"before".as("shard"))
      .agg(count(lit(1)).as("n_before"))
    val after = asg.groupBy($"after".as("shard"))
      .agg(count(lit(1)).as("n_after"),
        sum(($"before" =!= $"after").cast("long")).as("gained"))
    shards.join(before, Seq("shard"), "left").join(after, Seq("shard"), "left")
      .select($"shard",
        coalesce($"n_before", lit(0L)).as("n_before"),
        coalesce($"n_after", lit(0L)).as("n_after"),
        coalesce($"gained", lit(0L)).as("gained"),
        (coalesce($"n_before", lit(0L)) - coalesce($"n_after", lit(0L))
          + coalesce($"gained", lit(0L))).as("lost"))
      .orderBy($"shard")
  }

  /** KMV sketch size: 256 minima → ~1/√254 ≈ 6% relative error. */
  private val KmvK = 256

  /** KMV (K-MINIMUM-VALUES) DISTINCT SKETCH — the order-statistics
    * cardinality estimator (Bar-Yossef et al., RANDOM'02) that HLL
    * (q77/q140) superseded but that remains the textbook MERGEABLE
    * sketch: keep the k smallest hash values; merging shards = k
    * smallest of the union; estimate = (k−1)·H/h₍ₖ₎ over hash space H.
    * Here the whole construction is EXACT and oracle-gated (the house
    * md5→52-bit hash, deterministic kth minimum, integer estimate),
    * alongside the measured error vs the true distinct count — the
    * audit HLL can't have because its register hashes differ across
    * engines.
    *
    * 100 TB shape: the k-minimum set is `orderBy(h).limit(k)` — Spark
    * executes it as per-partition top-k + a k-row merge
    * (TakeOrderedAndProject), i.e. the mergeable-sketch movement
    * pattern itself: only k rows per partition ever move. The exact
    * count (one distinct shuffle) exists only to measure the error. */
  private val q349KmvSketch: Q = (s, d) => {
    import s.implicits._
    val h = Tables.lineitem(s, d)
      .select(h52($"l_orderkey".cast("string")).as("h"))
      .distinct()
    val mins = h.orderBy($"h").limit(KmvK)
      .agg(max($"h").as("hk"), count(lit(1)).as("kk"))
    val exact = h.agg(count(lit(1)).as("n_exact"))
    val rows = Tables.lineitem(s, d).agg(count(lit(1)).as("n_rows"))
    rows.crossJoin(broadcast(exact)).crossJoin(broadcast(mins))
      .select($"n_rows", $"n_exact", lit(KmvK).as("k"),
        // fewer than k distincts → the sketch IS the exact set
        when($"kk" < KmvK, $"kk")
          .otherwise(expr(s"((${KmvK - 1} * $Ring52) div hk)")).as("est"),
        $"kk", $"hk")
      .select($"n_rows", $"n_exact", $"k", $"est",
        expr("(abs(est - n_exact) * 1000000) div n_exact").as("err_ppm"))
  }

  val queries: Map[String, Q] = Map(
    "q349_kmv_sketch" -> q349KmvSketch,
    "q333_zorder_audit" -> q333ZorderAudit,
    "q334_zonemap_skipping" -> q334ZonemapSkipping,
    "q335_encoding_gain" -> q335EncodingGain,
    "q336_symspell" -> q336Symspell,
    "q343_ring_rebalance" -> q343RingRebalance,
    "q344_rendezvous_routing" -> q344RendezvousRouting)

  lazy val oracle: Map[String, String] = Map(
    // the identical 32-term Morton expression, identical coarse cells
    "q333_zorder_audit" ->
      s"""WITH r0 AS (SELECT DISTINCT CAST(user_id AS BIGINT) AS xr,
                   CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS yr
                 FROM events),
          mm AS (SELECT min(xr) AS mnx, max(xr) AS mxx,
                   min(yr) AS mny, max(yr) AS mxy FROM r0),
          k AS (SELECT ((xr - mnx) * ${(1L << ZBits) - 1})
                    // greatest(mxx - mnx, 1) AS x,
                  ((yr - mny) * ${(1L << ZBits) - 1})
                    // greatest(mxy - mny, 1) AS y
                FROM r0, mm),
          c AS (SELECT x, y,
                  (${zExprSql("x", "y")}) >> $ZCellShift AS zcell,
                  x >> ${ZBits - 6} AS kcell
                FROM k),
          z AS (SELECT zcell AS cell, max(x) - min(x) AS xr,
                  max(y) - min(y) AS yr, CAST(count(*) AS BIGINT) AS n
                FROM c GROUP BY zcell),
          r AS (SELECT kcell AS cell, max(x) - min(x) AS xr,
                  max(y) - min(y) AS yr, CAST(count(*) AS BIGINT) AS n
                FROM c GROUP BY kcell)
          SELECT 'zorder' AS layout, CAST(count(*) AS BIGINT) AS n_cells,
                 CAST(sum(xr) AS BIGINT) // count(*) AS mean_x_extent,
                 CAST(sum(yr) AS BIGINT) // count(*) AS mean_y_extent,
                 max(n) AS max_cell_rows
          FROM z
          UNION ALL
          SELECT 'rowkey', CAST(count(*) AS BIGINT),
                 CAST(sum(xr) AS BIGINT) // count(*),
                 CAST(sum(yr) AS BIGINT) // count(*), max(n)
          FROM r
          ORDER BY layout""",
    // same doc_id-range files, same map-only skip decision and ppm
    "q334_zonemap_skipping" ->
      s"""WITH f AS (SELECT doc_id // $ZoneFileRows AS file_id,
                   min(n_chars) AS mn, max(n_chars) AS mx,
                   CAST(count(*) AS BIGINT) AS rows,
                   CAST(sum(CASE WHEN n_chars >= 500 THEN 1 ELSE 0 END) AS BIGINT) AS m500,
                   CAST(sum(CASE WHEN n_chars >= 1000 THEN 1 ELSE 0 END) AS BIGINT) AS m1000,
                   CAST(sum(CASE WHEN n_chars >= 2000 THEN 1 ELSE 0 END) AS BIGINT) AS m2000,
                   CAST(sum(CASE WHEN n_chars >= 4000 THEN 1 ELSE 0 END) AS BIGINT) AS m4000
                 FROM documents GROUP BY 1),
          g AS (SELECT unnest([CAST(500 AS BIGINT), 1000, 2000, 4000]) AS t),
          j AS (SELECT t, file_id, rows, mx,
                  CASE WHEN t = 500 THEN m500 WHEN t = 1000 THEN m1000
                       WHEN t = 2000 THEN m2000 ELSE m4000 END AS matched
                FROM f CROSS JOIN g)
          SELECT t, CAST(count(*) AS BIGINT) AS n_files,
                 CAST(sum(CASE WHEN mx < t THEN 1 ELSE 0 END) AS BIGINT) AS n_skipped,
                 CAST(sum(CASE WHEN mx >= t THEN rows ELSE 0 END) AS BIGINT) AS rows_scanned,
                 CAST(sum(matched) AS BIGINT) AS rows_matched,
                 (CAST(sum(CASE WHEN mx >= t THEN rows ELSE 0 END) AS BIGINT) * 1000000)
                   // greatest(CAST(sum(matched) AS BIGINT), 1) AS scan_amp_ppm
          FROM j GROUP BY t ORDER BY t""",
    // same per-block run counting in key order, same dict-bit fold
    "q335_encoding_gain" ->
      s"""WITH b AS (
            SELECT col, o_orderkey // $EncBlockRows AS blk, o_orderkey, v
            FROM (SELECT o_orderkey, o_orderstatus AS v, 'o_orderstatus' AS col
                  FROM orders
                  UNION ALL
                  SELECT o_orderkey, o_orderpriority, 'o_orderpriority'
                  FROM orders)),
          r AS (SELECT col, blk, CAST(count(*) AS BIGINT) AS n,
                  CAST(1 + sum(CASE WHEN v <> prev THEN 1 ELSE 0 END) AS BIGINT)
                    AS n_runs
                FROM (SELECT col, blk, v,
                        lag(v) OVER (PARTITION BY col, blk
                          ORDER BY o_orderkey) AS prev
                      FROM b)
                GROUP BY col, blk),
          rr AS (SELECT col, CAST(sum(n) AS BIGINT) AS n_rows,
                   CAST(sum(n_runs) AS BIGINT) AS n_runs
                 FROM r GROUP BY col),
          c AS (SELECT col, CAST(count(DISTINCT v) AS BIGINT) AS n_distinct
                FROM b GROUP BY col)
          SELECT col, n_rows, n_runs, n_distinct,
                 CAST(ceil(ln(n_distinct) / ln(2)) AS BIGINT) AS dict_bits,
                 (n_runs * 1000000) // n_rows AS rle_runs_ppm
          FROM rr JOIN c USING (col) ORDER BY col""",
    // same frequency-derived typos, same deletion keys, same verify+rank
    "q336_symspell" ->
      s"""WITH vocab AS (SELECT w, CAST(count(*) AS BIGINT) AS freq
                 FROM (SELECT unnest($wordsSql) AS w FROM documents)
                 GROUP BY w),
          ty AS (SELECT DISTINCT substring(w, 1, 2) || substring(w, 4) AS typo
                 FROM (SELECT w, row_number() OVER (ORDER BY freq DESC, w) AS rk
                       FROM vocab WHERE length(w) >= 5)
                 WHERE rk <= 5),
          vi AS (SELECT w, freq, unnest(list_append(
                   [substring(w, 1, i - 1) || substring(w, i + 1)
                    for i in range(1, length(w) + 1)], w)) AS k
                 FROM vocab),
          ti AS (SELECT typo, unnest(list_append(
                   [substring(typo, 1, i - 1) || substring(typo, i + 1)
                    for i in range(1, length(typo) + 1)], typo)) AS k
                 FROM ty),
          cand AS (SELECT DISTINCT typo, w, freq
                   FROM vi JOIN ti USING (k)
                   WHERE levenshtein(typo, w) <= 1),
          rk AS (SELECT typo, w, freq,
                   CAST(row_number() OVER (PARTITION BY typo
                     ORDER BY freq DESC, w) AS BIGINT) AS rank
                 FROM cand)
          SELECT typo, rank, w AS suggestion, freq,
                 CAST(levenshtein(typo, w) AS BIGINT) AS dist
          FROM rk WHERE rank <= $SymSpellTopK
          ORDER BY typo, rank""",
    // same 52-bit hashes, same kth minimum, same integer estimate
    "q349_kmv_sketch" ->
      s"""WITH h AS (SELECT DISTINCT
                 CAST('0x' || substring(md5(CAST(l_orderkey AS VARCHAR)), 1, 13)
                   AS BIGINT) AS h
               FROM lineitem),
          mins AS (SELECT max(h) AS hk, CAST(count(*) AS BIGINT) AS kk
                   FROM (SELECT h FROM h ORDER BY h LIMIT $KmvK)),
          ex AS (SELECT CAST(count(*) AS BIGINT) AS n_exact FROM h),
          r AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM lineitem),
          e AS (SELECT n_rows, n_exact, $KmvK AS k,
                  CASE WHEN kk < $KmvK THEN kk
                       ELSE (${KmvK - 1} * ${Ring52}) // hk END AS est
                FROM r CROSS JOIN ex CROSS JOIN mins)
          SELECT n_rows, n_exact, k, CAST(est AS BIGINT) AS est,
                 CAST((abs(est - n_exact) * 1000000) // n_exact AS BIGINT)
                   AS err_ppm
          FROM e""",
    // same 52-bit md5 positions, same packed (dist·2048 + shard) argmin
    "q343_ring_rebalance" ->
      s"""WITH keys AS (
            SELECT o_orderkey,
                   CAST('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 13)
                     AS BIGINT) AS h
            FROM orders),
          ring AS (
            SELECT CAST(s.shard AS INTEGER) AS shard,
                   CAST('0x' || substring(md5(CAST(s.shard AS VARCHAR) || ':'
                     || CAST(v.vn AS VARCHAR)), 1, 13) AS BIGINT) AS pos
            FROM range(0, $ShardsAfter) s(shard), range(0, $RingVnodes) v(vn)),
          asg AS (SELECT o_orderkey, h,
                         min(CASE WHEN shard < $ShardsBefore THEN packed END)
                           % $PackRadix AS before,
                         min(packed) % $PackRadix AS after
                  FROM (SELECT o_orderkey, h, shard,
                               (((pos - h) % $Ring52 + $Ring52) % $Ring52)
                                 * $PackRadix + shard AS packed
                        FROM keys CROSS JOIN ring)
                  GROUP BY 1, 2),
          rj AS (SELECT after, CAST(count(*) AS BIGINT) AS n,
                        CAST(sum(CASE WHEN before <> after THEN 1 ELSE 0 END)
                          AS BIGINT) AS mvd
                 FROM asg GROUP BY 1),
          ringrow AS (
            SELECT 'ring' AS scheme, CAST(sum(n) AS BIGINT) AS n_keys,
                   CAST(sum(mvd) AS BIGINT) AS n_moved,
                   CAST((sum(mvd) * 1000000) // sum(n) AS BIGINT) AS moved_ppm,
                   CAST((max(n) * 1000000) // sum(n) AS BIGINT) AS max_load_ppm
            FROM rj),
          mj AS (SELECT h % $ShardsAfter AS after, CAST(count(*) AS BIGINT) AS n,
                        CAST(sum(CASE WHEN h % $ShardsBefore <> h % $ShardsAfter
                                      THEN 1 ELSE 0 END) AS BIGINT) AS mvd
                 FROM keys GROUP BY 1),
          modrow AS (
            SELECT 'mod' AS scheme, CAST(sum(n) AS BIGINT) AS n_keys,
                   CAST(sum(mvd) AS BIGINT) AS n_moved,
                   CAST((sum(mvd) * 1000000) // sum(n) AS BIGINT) AS moved_ppm,
                   CAST((max(n) * 1000000) // sum(n) AS BIGINT) AS max_load_ppm
            FROM mj)
          SELECT * FROM modrow UNION ALL SELECT * FROM ringrow
          ORDER BY scheme""",
    // same key#shard scores, same packed (score·2048 + shard) argmax
    "q344_rendezvous_routing" ->
      s"""WITH k AS (SELECT CAST(o_orderkey AS VARCHAR) AS k FROM orders),
          sh AS (SELECT CAST(t.shard AS INTEGER) AS shard
                 FROM range(0, $ShardsAfter) t(shard)),
          sc AS (SELECT k.k, sh.shard,
                   CAST('0x' || substring(md5(k.k || '#'
                     || CAST(sh.shard AS VARCHAR)), 1, 13) AS BIGINT)
                     * $PackRadix + sh.shard AS packed
                 FROM k CROSS JOIN sh),
          j AS (SELECT max(CASE WHEN shard < $ShardsBefore THEN packed END)
                         % $PackRadix AS before,
                       max(packed) % $PackRadix AS after
                FROM sc GROUP BY k),
          b AS (SELECT before AS shard, CAST(count(*) AS BIGINT) AS n_before
                FROM j GROUP BY 1),
          a AS (SELECT after AS shard, CAST(count(*) AS BIGINT) AS n_after,
                       CAST(sum(CASE WHEN before <> after THEN 1 ELSE 0 END)
                         AS BIGINT) AS gained
                FROM j GROUP BY 1)
          SELECT sh.shard,
                 coalesce(n_before, 0) AS n_before,
                 coalesce(n_after, 0) AS n_after,
                 coalesce(gained, 0) AS gained,
                 coalesce(n_before, 0) - coalesce(n_after, 0)
                   + coalesce(gained, 0) AS lost
          FROM sh LEFT JOIN b USING (shard) LEFT JOIN a USING (shard)
          ORDER BY sh.shard""")
}
