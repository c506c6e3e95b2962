package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{concat, concat_ws, lit}
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(hhmm: String) = Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  test("watermark: append mode finalizes windows and drops late data") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val agg = Streams.hourlyCounts(input.toDF().toDF("ts", "event_type"),
      watermarkDelay = "10 minutes")
    val q = agg.writeStream.format("memory").queryName("wm_test")
      .outputMode(OutputMode.Append()).start()
    try {
      // hour 00 gets two events; an event at 02:31 will push the watermark
      input.addData((ts("00:05"), "a"), (ts("00:15"), "a"))
      q.processAllAvailable()
      input.addData((ts("02:31"), "a")) // watermark -> 02:21 > hour-00 end
      q.processAllAvailable()
      val afterFinalize = spark.table("wm_test").as[(Timestamp, String, Long)].collect()
      assert(afterFinalize.exists { case (h, _, n) => h == ts("00:00") && n == 2 },
        s"hour-00 window should be finalized, got ${afterFinalize.mkString(",")}")

      // late event for hour 00 arrives behind the watermark -> dropped
      input.addData((ts("00:20"), "a"))
      q.processAllAvailable()
      // advance watermark past hour 02 to flush remaining state
      input.addData((ts("04:00"), "a"))
      q.processAllAvailable()
      val rows = spark.table("wm_test").as[(Timestamp, String, Long)].collect()
      val hour0 = rows.filter(_._1 == ts("00:00"))
      assert(hour0.map(_._3).sum == 2, "late event must NOT be added to hour 00")
      assert(rows.exists { case (h, _, n) => h == ts("02:00") && n == 1 })
    } finally q.stop()
  }

  test("conversionPairs: pairs across micro-batches, range and user bounds hold") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val buys = MemoryStream[(Long, Long, Timestamp)]
    val joined = Streams.conversionPairs(
      clicks.toDF().toDF("user_id", "event_id", "ts"),
      buys.toDF().toDF("user_id", "event_id", "ts"), withinMinutes = 30)
    val q = joined.writeStream.format("memory").queryName("conv_test")
      .outputMode(OutputMode.Append()).start()
    try {
      // the click arrives ALONE in its batch: the pair can only come from
      // buffered join state, not intra-batch matching
      clicks.addData((1L, 100L, ts("00:00")))
      q.processAllAvailable()
      buys.addData((1L, 200L, ts("00:10"))) // in window -> the one pair
      buys.addData((1L, 201L, ts("00:45"))) // outside 30 min
      buys.addData((2L, 202L, ts("00:05"))) // other user
      q.processAllAvailable()
      val rows = spark.table("conv_test")
        .select("user_id", "click_id", "buy_id", "delay_us")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(rows == Set((1L, 100L, 200L, 600000000L)))
    } finally q.stop()
  }

  test("checkpointed parquet sink is exactly-once across re-runs") {
    val src = Files.createTempDirectory("graft_eo_src_").toString
    val out = Files.createTempDirectory("graft_eo_out_").toString
    val ck = Files.createTempDirectory("graft_eo_ck_").toString
    val data = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    data.write.mode("overwrite").parquet(src)

    def run(): Unit =
      Streams.runToParquet(Streams.parquetStream(spark, src, data.schema), out, ck)

    run()
    assert(spark.read.parquet(out).count() == 3)
    run() // same checkpoint, no new files -> nothing reprocessed
    assert(spark.read.parquet(out).count() == 3)
  }

  test("incrementalMerge: per-batch upsert by key, exactly-once on re-run") {
    val src = Files.createTempDirectory("graft_im_src_").toString
    val tgt = Files.createTempDirectory("graft_im_tgt_").toString + "/base"
    val ck = Files.createTempDirectory("graft_im_ck_").toString
    val schema = Seq((0L, "x")).toDF("id", "v").schema

    // batch 1: initial rows
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.parquet(s"$src/f1")
    Streams.incrementalMerge(
      Streams.parquetStream(spark, s"$src/*", schema), tgt, "id", ck)
    assert(spark.read.parquet(tgt).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b")))

    // batch 2: update id=2, insert id=3 — trigger-style maintenance
    Seq((2L, "B2"), (3L, "c")).toDF("id", "v").write.parquet(s"$src/f2")
    Streams.incrementalMerge(
      Streams.parquetStream(spark, s"$src/*", schema), tgt, "id", ck)
    assert(spark.read.parquet(tgt).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "B2"), (3L, "c")))

    // re-run with nothing new: checkpoint makes it a no-op
    Streams.incrementalMerge(
      Streams.parquetStream(spark, s"$src/*", schema), tgt, "id", ck)
    assert(spark.read.parquet(tgt).count() == 3)
  }

  test("incrementalMerge: duplicate keys WITHIN one batch collapse to one row") {
    val src = Files.createTempDirectory("graft_imdup_src_").toString
    val tgt = Files.createTempDirectory("graft_imdup_tgt_").toString + "/base"
    val ck = Files.createTempDirectory("graft_imdup_ck_").toString
    val schema = Seq((0L, "x")).toDF("id", "v").schema
    // two files, same key, read in ONE availableNow batch
    Seq((2L, "b")).toDF("id", "v").write.parquet(s"$src/f1")
    Seq((2L, "B2"), (3L, "c")).toDF("id", "v").write.parquet(s"$src/f2")
    Streams.incrementalMerge(
      Streams.parquetStream(spark, s"$src/*", schema), tgt, "id", ck)
    val rows = spark.read.parquet(tgt).as[(Long, String)].collect().toList
    assert(rows.map(_._1).sorted == List(2L, 3L), s"duplicate key survived: $rows")
    // deterministic winner: greatest struct => "b" > "B2" lexicographically
    assert(rows.toMap.apply(2L) == "b")
  }

  test("incrementalMerge: trailing slash in targetDir must not lose the base") {
    // regression: tmp/old built by string concat made ".../base/" + "_tmp"
    // a CHILD of the base — the demote carried it along, the promote failed
    // silently, and the old-cleanup deleted the only copy
    val src = Files.createTempDirectory("graft_imsl_src_").toString
    val tgt = Files.createTempDirectory("graft_imsl_tgt_").toString + "/base/"
    val ck = Files.createTempDirectory("graft_imsl_ck_").toString
    val schema = Seq((0L, "x")).toDF("id", "v").schema
    def run(): Unit = Streams.incrementalMerge(
      Streams.parquetStream(spark, s"$src/*", schema), tgt, "id", ck)

    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.parquet(s"$src/f1")
    run()
    Seq((2L, "B2"), (3L, "c")).toDF("id", "v").write.parquet(s"$src/f2")
    run() // second batch exercises the demote/promote swap against a live base
    assert(spark.read.parquet(tgt).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "B2"), (3L, "c")))
  }

  test("incrementalMerge: crash between tmp-write and promote loses no key") {
    val src = Files.createTempDirectory("graft_imcr_src_").toString
    val tgt = Files.createTempDirectory("graft_imcr_tgt_").toString + "/base"
    val ck = Files.createTempDirectory("graft_imcr_ck_").toString
    val schema = Seq((0L, "x")).toDF("id", "v").schema
    def run(): Unit = Streams.incrementalMerge(
      Streams.parquetStream(spark, s"$src/*", schema), tgt, "id", ck)

    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.parquet(s"$src/f1")
    run()
    Seq((3L, "c")).toDF("id", "v").write.parquet(s"$src/f2")
    run() // base now {1,2,3}

    // simulate the torn swap the old delete-then-rewrite had no answer to:
    // the merged tmp is fully committed, the base is already gone
    val fs = new org.apache.hadoop.fs.Path(tgt)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.rename(new org.apache.hadoop.fs.Path(tgt),
      new org.apache.hadoop.fs.Path(tgt + "_tmp")))

    // next batch: recovery must promote the tmp back to base FIRST, then
    // merge — without it, {4} would silently become the whole base
    Seq((4L, "d"), (2L, "B2")).toDF("id", "v").write.parquet(s"$src/f3")
    run()
    assert(spark.read.parquet(tgt).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "B2"), (3L, "c"), (4L, "d")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(tgt + "_tmp")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(tgt + "_old")))
  }

  test("incrementalMerge: crash after demote with incomplete tmp restores old base") {
    val src = Files.createTempDirectory("graft_imcr2_src_").toString
    val tgt = Files.createTempDirectory("graft_imcr2_tgt_").toString + "/base"
    val ck = Files.createTempDirectory("graft_imcr2_ck_").toString
    val schema = Seq((0L, "x")).toDF("id", "v").schema
    def run(): Unit = Streams.incrementalMerge(
      Streams.parquetStream(spark, s"$src/*", schema), tgt, "id", ck)

    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.parquet(s"$src/f1")
    run()

    // torn state: base demoted to _old, tmp exists but never committed
    // (no _SUCCESS) — recovery must fall back to the old base
    val fs = new org.apache.hadoop.fs.Path(tgt)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.rename(new org.apache.hadoop.fs.Path(tgt),
      new org.apache.hadoop.fs.Path(tgt + "_old")))
    fs.mkdirs(new org.apache.hadoop.fs.Path(tgt + "_tmp"))
    fs.create(new org.apache.hadoop.fs.Path(tgt + "_tmp/part-incomplete")).close()

    Seq((3L, "c")).toDF("id", "v").write.parquet(s"$src/f2")
    run()
    assert(spark.read.parquet(tgt).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(tgt + "_old")))
  }

  test("incrementalMergeBucketed: upserts by key, rewrites ONLY touched buckets") {
    val src = Files.createTempDirectory("graft_imb_src_").toString
    val tgt = Files.createTempDirectory("graft_imb_tgt_").toString + "/base"
    val ck = Files.createTempDirectory("graft_imb_ck_").toString
    val schema = Seq((0L, "x")).toDF("id", "v").schema
    val buckets = 8

    // batch 1: keys spread over several buckets
    Seq.tabulate(32)(i => (i.toLong, s"v$i")).toDF("id", "v").write.parquet(s"$src/f1")
    Streams.incrementalMergeBucketed(
      Streams.parquetStream(spark, s"$src/*", schema), tgt, "id", ck, buckets)
    val base0 = Streams.readMergedBase(spark, tgt)
    assert(base0.count() == 32)
    val bucketDirs = new java.io.File(tgt).listFiles()
      .filter(_.getName.startsWith(s"${Streams.BucketCol}="))
    assert(bucketDirs.length > 1, "keys should spread over several buckets")

    def filesPerBucket(): Map[String, Set[String]] =
      new java.io.File(tgt).listFiles()
        .filter(_.getName.startsWith(s"${Streams.BucketCol}="))
        .map(d => d.getName -> d.listFiles().map(_.getName)
          .filterNot(_.startsWith(".")).toSet)
        .toMap

    val before = filesPerBucket()

    // batch 2: ONE key (update id=2) -> exactly one bucket may change
    Seq((2L, "B2")).toDF("id", "v").write.parquet(s"$src/f2")
    Streams.incrementalMergeBucketed(
      Streams.parquetStream(spark, s"$src/*", schema), tgt, "id", ck, buckets)
    val after = filesPerBucket()

    val changed = before.keySet.union(after.keySet)
      .filter(b => before.get(b) != after.get(b))
    assert(changed.size == 1,
      s"a 1-key batch must rewrite exactly 1 bucket, changed: $changed")

    val rows = Streams.readMergedBase(spark, tgt).as[(Long, String)].collect().toMap
    assert(rows.size == 32 && rows(2L) == "B2" && rows(3L) == "v3",
      s"merge result wrong: ${rows.toSeq.sortBy(_._1).take(5)}")

    // batch 3: insert a NEW key + re-run exactly-once
    Seq((100L, "new")).toDF("id", "v").write.parquet(s"$src/f3")
    Streams.incrementalMergeBucketed(
      Streams.parquetStream(spark, s"$src/*", schema), tgt, "id", ck, buckets)
    Streams.incrementalMergeBucketed(
      Streams.parquetStream(spark, s"$src/*", schema), tgt, "id", ck, buckets)
    val fin = Streams.readMergedBase(spark, tgt).as[(Long, String)].collect().toMap
    assert(fin.size == 33 && fin(100L) == "new")
  }

  test("a merge base carries the single-writer lease: a second maintenance loop fails loudly while the first holds it, and succeeds after release") {
    val src = Files.createTempDirectory("graft_imlk_src_").toString
    val tgt = Files.createTempDirectory("graft_imlk_tgt_").toString + "/base"
    val ck = Files.createTempDirectory("graft_imlk_ck_").toString
    val schema = Seq((0L, "x")).toDF("id", "v").schema
    Seq((1L, "v1"), (2L, "v2")).toDF("id", "v").write.parquet(s"$src/f1")
    // writer A (this thread) fences the base — the reference's multi-worker
    // pattern pointed at ONE merge base; writer B's whole micro-batch must
    // fail with the named error, not interleave a bootstrap/park/fold
    graft.util.WriterLease.acquire(spark, tgt, "merge base")
    try {
      @volatile var err: Throwable = null
      val t = new Thread(() => {
        try Streams.incrementalMergeBucketed(
          Streams.parquetStream(spark, s"$src/*", schema), tgt, "id", ck,
          numBuckets = 4)
        catch { case e: Throwable => err = e }
      })
      t.start(); t.join(120000)
      assert(err != null, "the contested merge loop must fail, not proceed")
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: causes(t.getCause)
      assert(causes(err).exists(c => c.getMessage != null &&
        c.getMessage.contains("SINGLE-WRITER")),
        s"contested merge must name the contract, got: $err")
    } finally graft.util.WriterLease.release(spark, tgt)
    // released: the same merge now runs (fresh checkpoint — the failed
    // attempt consumed nothing) and the base is complete
    val ck2 = Files.createTempDirectory("graft_imlk_ck2_").toString
    Streams.incrementalMergeBucketed(
      Streams.parquetStream(spark, s"$src/*", schema), tgt, "id", ck2,
      numBuckets = 4)
    val rows = Streams.readMergedBase(spark, tgt).as[(Long, String)].collect().toMap
    assert(rows == Map(1L -> "v1", 2L -> "v2"))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$tgt.writer_lock")),
      "a completed merge run must leave no lock behind")
  }

  test("incrementalMergeBucketed batchDeltas: wide deltas park without bucket rewrites, overlay reads resolve latest-wins, one fold applies all; stale plans fail loudly") {
    val src = Files.createTempDirectory("graft_imbd_src_").toString
    val tgt = Files.createTempDirectory("graft_imbd_tgt_").toString + "/base"
    val ck = Files.createTempDirectory("graft_imbd_ck_").toString
    val schema = Seq((0L, "x")).toDF("id", "v").schema
    def merge(): Unit = Streams.incrementalMergeBucketed(
      Streams.parquetStream(spark, s"$src/*", schema), tgt, "id", ck,
      numBuckets = 8, batchDeltas = true, foldAboveBytes = Long.MaxValue)
    Seq.tabulate(32)(i => (i.toLong, s"v$i")).toDF("id", "v").write.parquet(s"$src/f1")
    merge() // bootstrap writes the base itself
    def bucketFiles(): Map[String, Set[String]] =
      new java.io.File(tgt).listFiles()
        .filter(_.getName.startsWith(s"${Streams.BucketCol}="))
        .map(d => d.getName -> d.listFiles().map(_.getName)
          .filterNot(_.startsWith(".")).toSet).toMap
    val before = bucketFiles()
    // two WIDE parked batches with overlapping keys: id=2 is updated by
    // both — the second must win everywhere
    Seq((2L, "B2"), (5L, "B5"), (17L, "B17")).toDF("id", "v").write.parquet(s"$src/f2")
    merge()
    Seq((2L, "C2"), (9L, "C9")).toDF("id", "v").write.parquet(s"$src/f3")
    merge()
    assert(bucketFiles() == before,
      "parked batches must not rewrite ANY base bucket")
    assert(Streams.mergePendingBytes(spark, tgt) > 0L)
    val overlayRows = Streams.readMergedBase(spark, tgt)
      .as[(Long, String)].collect()
    // row-count BEFORE toMap: a supersede leak (a parked key's base row
    // surfacing beside its latest pending row) would be collapsed by the
    // Map and pass the size-32 check silently
    assert(overlayRows.length == 32,
      s"overlay read must return exactly 32 rows, got ${overlayRows.length}")
    val overlay = overlayRows.toMap
    assert(overlay.size == 32 && overlay(2L) == "C2" && overlay(5L) == "B5" &&
      overlay(9L) == "C9" && overlay(17L) == "B17" && overlay(3L) == "v3",
      s"overlay read wrong: ${overlay.toSeq.sortBy(_._1).take(6)}")
    // a plan built over the overlay, executed after the fold, must fail
    // with the named epoch error — not FileNotFound, not silently-stale
    val stale = Streams.readMergedBase(spark, tgt)
    Streams.foldMergePending(spark, tgt, "id", numBuckets = 8)
    assert(Streams.mergePendingBytes(spark, tgt) == 0L)
    val folded = Streams.readMergedBase(spark, tgt)
      .as[(Long, String)].collect().toMap
    assert(folded == overlay, "fold must preserve exactly the overlay rows")
    val e = intercept[Exception](stale.count())
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    // aggregate stage-materialization errors EMBED sub-failure text in
    // the message rather than the cause chain — search both
    assert(causes(e).exists(c => c.getMessage != null &&
      c.getMessage.contains("was folded")),
      s"stale overlay plan must raise the epoch guard (never a bare " +
        s"FileNotFound), got $e")
    // a DIRECT (un-parked) merge against a pending-bearing base refuses
    Seq((3L, "direct")).toDF("id", "v").write.parquet(s"$src/f4")
    merge() // park again so pending exists
    val ck2 = Files.createTempDirectory("graft_imbd_ck2_").toString
    val e2 = intercept[Exception] {
      Streams.incrementalMergeBucketed(
        Streams.parquetStream(spark, s"$src/*", schema), tgt, "id", ck2,
        numBuckets = 8)
    }
    assert(causes(e2).exists(c => c.getMessage != null &&
      c.getMessage.contains("batched-delta pending area")),
      s"direct merge over pending must refuse, got $e2")
  }

  test("incrementalMergeBucketed: a delta into a bucket ABSENT from the base creates it") {
    // the explicit-path read (round 11) probes only touched dirs — a batch
    // whose keys hash into buckets never yet written must find nothing to
    // carry (not throw on a missing path) and land the new partition
    import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
    val src = Files.createTempDirectory("graft_imb2_src_").toString
    val tgt = Files.createTempDirectory("graft_imb2_tgt_").toString + "/base"
    val ck = Files.createTempDirectory("graft_imb2_ck_").toString
    val schema = Seq((0L, "x")).toDF("id", "v").schema
    val buckets = 64
    def merge(): Unit = Streams.incrementalMergeBucketed(
      Streams.parquetStream(spark, s"$src/*", schema), tgt, "id", ck, buckets)
    // tiny seed: most of the 64 bucket dirs don't exist afterwards
    Seq.tabulate(4)(i => (i.toLong, s"v$i")).toDF("id", "v").write.parquet(s"$src/f1")
    merge()
    def dirsNow(): Set[String] = new java.io.File(tgt).listFiles()
      .filter(_.getName.startsWith(s"${Streams.BucketCol}=")).map(_.getName).toSet
    val existing = dirsNow()
    assert(existing.size <= 4, s"4 keys can fill at most 4 of 64 buckets: $existing")
    // pick a key whose bucket dir is absent (same hash the merge uses)
    val cand = spark.range(1000, 1200).toDF("id")
      .select(col("id"), pmod(xxhash64(col("id")), lit(buckets.toLong)).cast("int").as("b"))
      .as[(Long, Int)].collect()
      .find { case (_, b) => !existing.contains(s"${Streams.BucketCol}=$b") }.get
    Seq((cand._1, "fresh")).toDF("id", "v").write.parquet(s"$src/f2")
    merge()
    assert(dirsNow().contains(s"${Streams.BucketCol}=${cand._2}"),
      "the new bucket partition must exist after the merge")
    val rows = Streams.readMergedBase(spark, tgt).as[(Long, String)].collect().toMap
    assert(rows.size == 5 && rows(cand._1) == "fresh" && rows(0L) == "v0",
      s"merge into an absent bucket lost rows: ${rows.toSeq.sortBy(_._1)}")
  }

  test("streaming dedup runs on the RocksDB state store (large keyed-state path)") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    // provider is captured at query START; restored right after, so no
    // other query in the shared session can observe the change
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val input = MemoryStream[(Long, String)]
      val q = Streams.dedupKeys(input.toDF().toDF("k", "v"), Seq("k"))
        .writeStream.format("memory").queryName("rocks_dedup")
        .outputMode(OutputMode.Append()).start()
      try {
        input.addData((1L, "a"), (1L, "b"), (2L, "c"))
        q.processAllAvailable()
        input.addData((1L, "d"), (3L, "e")) // 1 must stay deduped across batches
        q.processAllAvailable()
        val keys = spark.table("rocks_dedup").select("k").as[Long].collect().sorted
        assert(keys.toSeq == Seq(1L, 2L, 3L))
        assert(Option(q.lastProgress).exists(_.toString.contains("rocksdb")),
          "RocksDB provider metrics missing — provider not in use")
      } finally q.stop()
    } finally prev.fold(spark.conf.unset(key))(v => spark.conf.set(key, v))
  }

  test("sessionizeStateful: sessions merge across batches, timeout flushes the tail") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Streams.Ev]
    val sessions = Streams.sessionizeStateful(input.toDS(), gapMinutes = 30,
      watermarkDelay = "0 seconds")
    val q = sessions.toDF().writeStream.format("memory").queryName("sess_stateful")
      .outputMode(OutputMode.Append()).start()
    def rows() = spark.table("sess_stateful")
      .as[(Long, Timestamp, Timestamp, Long)].collect().toSet
    try {
      // batch 1: open session for user 1
      input.addData(Streams.Ev(1L, ts("00:00")), Streams.Ev(1L, ts("00:10")))
      q.processAllAvailable()
      assert(rows().isEmpty, "open session must not emit yet")

      // batch 2: extends the SAME session across the batch boundary,
      // then a far event closes it in-batch
      input.addData(Streams.Ev(1L, ts("00:20")), Streams.Ev(1L, ts("02:00")))
      q.processAllAvailable()
      assert(rows() == Set((1L, ts("00:00"), ts("00:20"), 3L)),
        s"cross-batch merge failed: ${rows()}")

      // batch 3+4: advance the watermark past 02:00 + gap via another key;
      // the timeout fires on the NEXT trigger after the watermark moves
      input.addData(Streams.Ev(2L, ts("05:00")))
      q.processAllAvailable()
      input.addData(Streams.Ev(2L, ts("05:01")))
      q.processAllAvailable()
      assert(rows().contains((1L, ts("02:00"), ts("02:00"), 1L)),
        s"timeout flush missing: ${rows()}")
    } finally q.stop()
  }

  test("sessionize: gap splits, tight sequence stays one session") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Streams.Ev]
    val sessions = Streams.sessionize(input.toDS(), gapMinutes = 30)
    val q = sessions.toDF().writeStream.format("memory").queryName("sess_test")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Streams.Ev(1L, ts("00:00")), Streams.Ev(1L, ts("00:10")), Streams.Ev(1L, ts("00:25")),
        Streams.Ev(1L, ts("01:30")), // 65-min gap -> new session
        Streams.Ev(2L, ts("00:00")))
      q.processAllAvailable()
      val got = spark.table("sess_test")
        .as[(Long, Timestamp, Timestamp, Long)].collect().toSet
      assert(got == Set(
        (1L, ts("00:00"), ts("00:25"), 3L),
        (1L, ts("01:30"), ts("01:30"), 1L),
        (2L, ts("00:00"), ts("00:00"), 1L)))
    } finally q.stop()
  }

  test("transformWithState: ValueState accumulates across micro-batches (RocksDB)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // q214's catalog run lands in one batch; the cross-batch state-merge
    // path its doc comment promises is pinned here with explicit batches.
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[Streams.IdEv]
      val out = input.toDS().groupByKey(_.user_id)
        .transformWithState(new Streams.UserAggProcessor,
          org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
      val q = out.toDF().writeStream.format("memory").queryName("tws_test")
        .outputMode(OutputMode.Update()).start()
      try {
        input.addData(Streams.IdEv(1L, 10L), Streams.IdEv(1L, 5L), Streams.IdEv(2L, 7L))
        q.processAllAvailable()
        input.addData(Streams.IdEv(1L, 99L), Streams.IdEv(2L, 1L))
        q.processAllAvailable()
        val rows = spark.table("tws_test").as[Streams.UserAggOut].collect()
        // the batch-2 emission must reflect state merged across batches
        assert(rows.filter(_.user_id == 1L).maxBy(_.n_events) ==
          Streams.UserAggOut(1L, 3L, 5L, 99L), rows.mkString(","))
        assert(rows.filter(_.user_id == 2L).maxBy(_.n_events) ==
          Streams.UserAggOut(2L, 2L, 1L, 7L), rows.mkString(","))
      } finally q.stop()
    } finally prev.fold(spark.conf.unset(provKey))(v => spark.conf.set(provKey, v))
  }

  test("incrementalMergeBucketed: wide-delta boundary measured and warned, narrow batch quiet") {
    // the guard's math: ≥ 50% of buckets touched warns with the ratio;
    // below stays silent; a 1-bucket layout never warns (it is never
    // incremental to begin with)
    assert(Streams.wideDeltaWarning(4, 8).exists(_.contains("4/8")))
    assert(Streams.wideDeltaWarning(8, 8).exists(_.contains("full")))
    assert(Streams.wideDeltaWarning(3, 8).isEmpty)
    assert(Streams.wideDeltaWarning(1, 1).isEmpty)

    val src = Files.createTempDirectory("graft_imbw_src_").toString
    val tgt = Files.createTempDirectory("graft_imbw_tgt_").toString + "/base"
    val ck = Files.createTempDirectory("graft_imbw_ck_").toString
    val schema = Seq((0L, "x")).toDF("id", "v").schema
    def merge(): Unit = Streams.incrementalMergeBucketed(
      Streams.parquetStream(spark, s"$src/*", schema), tgt, "id", ck, numBuckets = 8)

    Seq.tabulate(64)(i => (i.toLong, s"v$i")).toDF("id", "v").write.parquet(s"$src/f1")
    merge() // bootstrap (no merge ran — no warning semantics yet)

    // BROAD delta: every key — touches all 8 buckets, the measured boundary
    Seq.tabulate(64)(i => (i.toLong, s"w$i")).toDF("id", "v").write.parquet(s"$src/f2")
    merge()
    assert(Streams.lastWideDeltaWarning.exists(_.contains("/8")),
      "a delta touching every bucket must set the measured warning")

    // NARROW delta: one key — the steady state, hook must clear
    Seq((2L, "z")).toDF("id", "v").write.parquet(s"$src/f3")
    merge()
    assert(Streams.lastWideDeltaWarning.isEmpty,
      "a healthy 1-key batch must clear the warning hook")

    // and the merges themselves stayed correct throughout
    val rows = Streams.readMergedBase(spark, tgt).as[(Long, String)].collect().toMap
    assert(rows.size == 64 && rows(2L) == "z" && rows(3L) == "w3")
  }

  private def searchIdx(idx: String, terms: Seq[String], buckets: Int): Seq[Long] =
    graft.text.PostingIndex.searchAllIndexed(spark, idx, "doc_id", terms,
      buckets = buckets).as[Long].collect().sorted.toSeq

  test("maintainPostingIndex mode=buffered: streamed edits buffer in the pending list, replayed epoch converges") {
    val src = Files.createTempDirectory("graft_mpb_src_").toString
    val idx = Files.createTempDirectory("graft_mpb_idx_").toString + "/idx"
    val ck = Files.createTempDirectory("graft_mpb_ck_").toString
    val docs = Seq(
      (1L, "merge join scan"), (2L, "merge sort spill"),
      (3L, "vector join probe"), (4L, "merge join vector"),
      (5L, "window frame scan"), (6L, "hash hash probe"))
      .toDF("doc_id", "text")
    def run(): Unit = Streams.maintainPostingIndex(
      Streams.parquetStream(spark, s"$src/*", docs.schema),
      idx, "doc_id", "text", ck, buckets = 4, mode = "buffered")

    docs.write.parquet(s"$src/f1")
    run() // bootstrap
    assert(searchIdx(idx, Seq("merge", "join"), 4) == Seq(1L, 4L))
    assert(graft.text.PostingIndex.pendingBytes(spark, idx) == 0L,
      "bootstrap writes the base layout, not pending batches")

    // UPDATE doc 2 into a hit + pure-DELETE doc 4 (empty tokenization),
    // as one buffered micro-batch: must land in _pending, never a base
    // bucket rewrite
    val baseFiles = {
      val d = new java.io.File(idx)
      d.listFiles.filter(_.getName.startsWith("lexeme_bucket="))
        .flatMap(_.listFiles).map(f => f.getPath -> f.lastModified).toMap
    }
    Seq((2L, "merge join found"), (4L, "")).toDF("doc_id", "text")
      .write.parquet(s"$src/f2")
    run()
    assert(searchIdx(idx, Seq("merge", "join"), 4) == Seq(1L, 2L))
    assert(graft.text.PostingIndex.pendingBytes(spark, idx) > 0L,
      "the streamed edit must buffer, not COW-rewrite")
    baseFiles.foreach { case (p, m) =>
      val f = new java.io.File(p)
      assert(f.exists && f.lastModified == m, s"base file $p was rewritten")
    }

    // REPLAY: drop the newest commit marker so the engine re-executes the
    // last epoch on restart — the buffered path must converge (same live
    // rows under a higher pending-batch stamp), not duplicate or diverge
    val commits = new java.io.File(s"$ck/commits")
    val newest = commits.listFiles.filter(_.getName.forall(_.isDigit))
      .maxBy(_.getName.toInt)
    assert(newest.delete())
    // the local-FS checksum sidecar must go with it, or the replayed
    // epoch's atomic re-create of the commit file fails on the stale crc
    new java.io.File(commits, s".${newest.getName}.crc").delete()
    run()
    assert(searchIdx(idx, Seq("merge", "join"), 4) == Seq(1L, 2L),
      "replayed epoch must converge to the same search results")

    run() // nothing new: checkpoint no-op
    assert(searchIdx(idx, Seq("merge", "join"), 4) == Seq(1L, 2L))

    // and compaction folds the streamed batches to the same truth
    graft.text.PostingIndex.compactPending(spark, idx, "doc_id", buckets = 4)
    assert(graft.text.PostingIndex.pendingBytes(spark, idx) == 0L)
    assert(searchIdx(idx, Seq("merge", "join"), 4) == Seq(1L, 2L))
  }

  test("maintainPostingIndex mode=buffered: compaction rides compactAboveBytes under the checkpoint") {
    val src = Files.createTempDirectory("graft_mpc_src_").toString
    val idx = Files.createTempDirectory("graft_mpc_idx_").toString + "/idx"
    val ck = Files.createTempDirectory("graft_mpc_ck_").toString
    val docs = Seq((1L, "merge join scan"), (2L, "merge sort spill"))
      .toDF("doc_id", "text")
    def run(): Unit = Streams.maintainPostingIndex(
      Streams.parquetStream(spark, s"$src/*", docs.schema),
      idx, "doc_id", "text", ck, buckets = 4, mode = "buffered",
      compactAboveBytes = 1L)
    docs.write.parquet(s"$src/f1")
    run()
    Seq((2L, "merge join found")).toDF("doc_id", "text").write.parquet(s"$src/f2")
    run()
    // the 1-byte threshold forces the fold inside the same foreachBatch —
    // the index leaves the micro-batch already compacted and correct
    assert(graft.text.PostingIndex.pendingBytes(spark, idx) == 0L,
      "threshold crossing must compact inside the micro-batch")
    assert(searchIdx(idx, Seq("merge", "join"), 4) == Seq(1L, 2L))
  }

  test("maintainPostingIndex autoRebucket: a grown index is rebucketed between micro-batches and later batches ride the new modulus") {
    val src = Files.createTempDirectory("graft_mpr_src_").toString
    val idx = Files.createTempDirectory("graft_mpr_idx_").toString + "/idx"
    val ck = Files.createTempDirectory("graft_mpr_ck_").toString
    val docs = Seq(
      (1L, "merge join scan"), (2L, "merge sort spill"),
      (3L, "vector join probe"), (4L, "merge join vector"),
      (5L, "window frame scan"))
      .toDF("doc_id", "text")
    def run(): Unit = Streams.maintainPostingIndex(
      Streams.parquetStream(spark, s"$src/*", docs.schema),
      idx, "doc_id", "text", ck, buckets = 2, mode = "append",
      autoRebucket = true)
    docs.write.parquet(s"$src/f1")
    run() // bootstrap at the tiny birth sizing (2 buckets over 5 docs)
    assert(graft.text.PostingIndex.layoutBuckets(spark, idx).contains(2))
    // one growth batch far past 4× the birth bucket width (distinct-
    // lexeme-heavy docs so payload dominates footer overhead): the apply
    // arms the advice and the SAME micro-batch must act on it
    spark.range(200).select(($"id" + 100).as("doc_id"),
        concat_ws(" ", (0 until 12).map(j =>
          concat(lit("w"), ($"id" * 12 + j).cast("string"))): _*).as("text"))
      .write.parquet(s"$src/f2")
    run()
    val newBuckets = graft.text.PostingIndex.layoutBuckets(spark, idx).get
    assert(newBuckets > 2,
      s"the grown index must have been auto-rebucketed, still at $newBuckets")
    assert(graft.text.PostingIndex.rebucketAdvice(idx).isEmpty &&
      graft.text.PostingIndex.lastRebucketWarning.isEmpty,
      "acting on the advice must clear both hooks")
    assert(searchIdx(idx, Seq("merge", "join"), newBuckets) == Seq(1L, 4L),
      "postings must survive the swap")
    // a later batch must ride the marker's CURRENT modulus, not the
    // constructor argument (the restart footgun the marker read removes)
    Seq((6L, "merge join late")).toDF("doc_id", "text").write.parquet(s"$src/f3")
    run()
    assert(searchIdx(idx, Seq("merge", "join"),
      graft.text.PostingIndex.layoutBuckets(spark, idx).get) == Seq(1L, 4L, 6L))
  }

  test("maintainPostingIndex autoRebucket composes with mode=buffered: fold arms the trigger, the swap lands compacted") {
    val src = Files.createTempDirectory("graft_mprb_src_").toString
    val idx = Files.createTempDirectory("graft_mprb_idx_").toString + "/idx"
    val ck = Files.createTempDirectory("graft_mprb_ck_").toString
    val docs = Seq((1L, "merge join scan"), (2L, "merge sort spill"))
      .toDF("doc_id", "text")
    def run(): Unit = Streams.maintainPostingIndex(
      Streams.parquetStream(spark, s"$src/*", docs.schema),
      idx, "doc_id", "text", ck, buckets = 2, mode = "buffered",
      compactAboveBytes = 1L, autoRebucket = true)
    docs.write.parquet(s"$src/f1")
    run()
    // growth through the pending list; the 1-byte threshold folds it in
    // the same micro-batch, the fold's COW apply arms the advice, and the
    // act step rebuckets an already-compacted index (rebucket's pending
    // refusal would throw loudly were the ordering ever wrong)
    spark.range(200).select(($"id" + 100).as("doc_id"),
        concat_ws(" ", (0 until 12).map(j =>
          concat(lit("w"), ($"id" * 12 + j).cast("string"))): _*).as("text"))
      .write.parquet(s"$src/f2")
    run()
    val newBuckets = graft.text.PostingIndex.layoutBuckets(spark, idx).get
    assert(newBuckets > 2, s"fold-driven growth must rebucket, still at $newBuckets")
    assert(graft.text.PostingIndex.pendingBytes(spark, idx) == 0L)
    assert(searchIdx(idx, Seq("merge", "join"), newBuckets) == Seq(1L))
  }
}
