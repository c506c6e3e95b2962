package graft.io

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.pipeline.Pipeline
import graft.schema.Schemas

class IoPipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmpFile(name: String, content: String): String = {
    val dir = Files.createTempDirectory("graft_spec_")
    val p = dir.resolve(name)
    Files.write(p, content.getBytes(StandardCharsets.UTF_8))
    p.toString
  }

  test("CSV reader: BOM + quoted comma + null cik") {
    val path = tmpFile("companies.csv",
      "﻿permno,ticker,cik,business_name\n" +
        "10001,EGAS,43350,Gas Natural Inc.\n" +
        "10044,RMCF,1616262,\"Rocky Mountain Chocolate Factory, Inc.\"\n" +
        "10099,NOCK,,No Cik Corp\n")
    val df = Csv.readCsv(spark, path, Schemas.companies)
    val rows = df.orderBy($"permno").collect()
    assert(rows.length == 3)
    assert(rows(0).getLong(0) == 10001L) // BOM didn't corrupt the first column
    assert(rows(1).getString(3) == "Rocky Mountain Chocolate Factory, Inc.")
    assert(rows(2).isNullAt(2))          // empty cik -> null
  }

  test("permissive CSV: malformed rows quarantined, good rows survive") {
    val path = tmpFile("mixed.csv",
      "permno,ticker,cik,business_name\n" +
        "10001,EGAS,43350,Gas Natural Inc.\n" +
        "NOT_A_NUMBER,BAD,xx,Broken Row\n" +
        "10044,RMCF,1616262,Rocky Mountain\n")
    val (good, bad) = Csv.quarantine(Csv.readCsvPermissive(spark, path, Schemas.companies))
    assert(good.count() == 2)
    assert(!good.columns.contains("_corrupt_record"))
    assert(bad.count() == 1)
    assert(bad.as[String].head().contains("NOT_A_NUMBER"))
  }

  test("HttpFetcher: 2xx decoded latin-1, 4xx permanent, 5xx retried") {
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val flakyHits = new java.util.concurrent.atomic.AtomicInteger(0)
    def handler(f: HttpExchange => Unit): HttpHandler = (ex: HttpExchange) => { f(ex); ex.close() }
    server.createContext("/ok", handler { ex =>
      val body = "café filing".getBytes(StandardCharsets.ISO_8859_1)
      ex.sendResponseHeaders(200, body.length); ex.getResponseBody.write(body)
    })
    server.createContext("/gone", handler { ex => ex.sendResponseHeaders(404, -1) })
    server.createContext("/flaky", handler { ex =>
      if (flakyHits.incrementAndGet() < 2) ex.sendResponseHeaders(503, -1)
      else { val b = "recovered".getBytes; ex.sendResponseHeaders(200, b.length); ex.getResponseBody.write(b) }
    })
    server.start()
    val base = s"http://127.0.0.1:${server.getAddress.getPort}"
    try {
      val f = new Fetch.HttpFetcher(delayMillis = 0, retries = 2, backoffMillis = 10)
      assert(f.fetch(s"$base/ok").contains("café filing"))
      assert(f.fetch(s"$base/gone").isEmpty)
      assert(f.fetch(s"$base/flaky").contains("recovered"))
      assert(flakyHits.get() == 2) // one 503, one success — retried exactly once
    } finally server.stop(0)
  }

  test("EDGAR idx reader: preamble/header/separator dropped, date parsed") {
    val path = tmpFile("master.idx",
      "Description: x\nJunk line\n\nCIK|Company Name|Form Type|Date Filed|Filename\n" +
        "-----------------------------------------\n" +
        "43350|GAS NATURAL INC|10-K|2018-03-14|edgar/data/43350/1.txt\n" +
        "99|OTHER CO|8-K|2018-01-02|edgar/data/99/2.txt\n")
    val df = Csv.readEdgarIdx(spark, path)
    val rows = df.orderBy($"cik").collect()
    assert(rows.length == 2)
    assert(rows(0).getLong(0) == 99L)
    assert(rows(1).getDate(3).toString == "2018-03-14")
    assert(df.columns.toSeq == Seq("cik", "business_name", "type", "date", "path"))
  }

  test("JDBC: Derby round-trip + batched updateByKey") {
    val url = s"jdbc:derby:${Files.createTempDirectory("graft_derby_spec_")}/db;create=true"
    val df = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("id", "val")
    df.write.mode("overwrite").option("batchsize", 2).jdbc(url, "t", new java.util.Properties())
    val updates = Seq((2L, "BETA2"), (3L, "GAMMA2")).toDF("id", "val")
    Jdbc.updateByKey(updates, url, "t", "id", Seq("val"), batchSize = 1)
    val back = Jdbc.readTable(spark, url, "t").toDF("id", "val")
      .orderBy($"id").as[(Long, String)].collect().toSeq
    assert(back == Seq((1L, "alpha"), (2L, "BETA2"), (3L, "GAMMA2")))
  }

  test("JDBC upsert: Derby fallback inserts misses, updates hits, idempotent") {
    val url = s"jdbc:derby:${Files.createTempDirectory("graft_derby_ups_")}/db;create=true"
    Seq((1L, "alpha"), (2L, "beta")).toDF("id", "val")
      .write.mode("overwrite").jdbc(url, "t", new java.util.Properties())
    val batch = Seq((2L, "BETA2"), (3L, "gamma"), (4L, "delta")).toDF("id", "val")
    Jdbc.upsertByKey(batch, url, "t", "id", Seq("val"), batchSize = 2)
    def back() = Jdbc.readTable(spark, url, "t").toDF("id", "val")
      .orderBy($"id").as[(Long, String)].collect().toSeq
    val want = Seq((1L, "alpha"), (2L, "BETA2"), (3L, "gamma"), (4L, "delta"))
    assert(back() == want)
    Jdbc.upsertByKey(batch, url, "t", "id", Seq("val")) // re-run: no-op
    assert(back() == want)
  }

  test("JDBC upsert: Postgres statement is the native ON CONFLICT form") {
    val dl = org.apache.spark.sql.jdbc.JdbcDialects.get("jdbc:postgresql://h/db")
    assert(Jdbc.pgUpsertSql("filings", "filing_id", Seq("text", "token"), dl) ==
      """INSERT INTO filings ("filing_id", "text", "token") VALUES (?, ?, ?) """ +
        """ON CONFLICT ("filing_id") DO UPDATE SET "text" = EXCLUDED."text", """ +
        """"token" = EXCLUDED."token"""")
  }

  test("bootstrap: refuses destructive re-init without force") {
    val store = Files.createTempDirectory("graft_boot_").toString
    val companies = tmpFile("companies.csv",
      "permno,ticker,cik,business_name\n1,T,100,Co\n")
    val types = tmpFile("filing_types.csv", "type_id,type,keep\n1,10-K,1\n")
    val (c1, _) = Pipeline.bootstrap(spark, store, companies, types)
    assert(c1.count() == 1)
    val ex = intercept[IllegalArgumentException] {
      Pipeline.bootstrap(spark, store, companies, types)
    }
    assert(ex.getMessage.contains("force"))
    val (c2, _) = Pipeline.bootstrap(spark, store, companies, types, force = true)
    assert(c2.count() == 1)
    assert(spark.read.parquet(s"$store/companies").count() == 1)
  }

  test("pipeline e2e: index load -> scrape -> search finds the planted doc") {
    val dir = Files.createTempDirectory("graft_e2e_")
    Files.write(dir.resolve("f1.txt"),
      "<document><filename>a.htm<text>The merged tables contain sparkling results</text></document>"
        .getBytes(StandardCharsets.UTF_8))
    // f2.txt intentionally missing -> fetch fails -> stays queued
    val companies = Seq((1L, "T", Some(100L), "Co")).toDF("permno", "ticker", "cik", "business_name")
    val types = Seq((1L, "10-K", 1), (2L, "4", 0)).toDF("type_id", "type", "keep")
    val idx = Seq(
      (100L, "CO", "10-K", java.sql.Date.valueOf("2018-01-01"), "f1.txt"),
      (100L, "CO", "10-K", java.sql.Date.valueOf("2018-01-02"), "f2.txt"),
      (100L, "CO", "4", java.sql.Date.valueOf("2018-01-03"), "f3.txt"),   // keep=0 type
      (999L, "XX", "10-K", java.sql.Date.valueOf("2018-01-04"), "f4.txt") // out of universe
    ).toDF("cik", "business_name", "type", "date", "path")

    val filings = Pipeline.indexLoad(idx, companies, types)
    assert(filings.count() == 2) // semi-joins dropped 2 of 4

    val scraped = Pipeline.scrape(filings, new Fetch.FileFetcher(),
      p => concat(lit(s"$dir/"), p), parallelism = 2)
    val p = Pipeline.progress(scraped)
    assert(p == Pipeline.Progress(done = 1, remaining = 1))

    // full-text search over the scraped store finds the planted doc
    val hits = scraped
      .filter(graft.text.TextOps.tsMatchAll(col("token"), Seq("merged", "sparkling")))
      .select("path").as[String].collect()
    assert(hits.toSeq == Seq("f1.txt"))

    // idempotence: re-running scrape must not change the scraped row
    val again = Pipeline.scrape(scraped, new Fetch.FileFetcher(),
      p => concat(lit(s"$dir/"), p), parallelism = 2)
    assert(again.filter(col("path") === "f1.txt").select("text").as[String].head() ==
      scraped.filter(col("path") === "f1.txt").select("text").as[String].head())

    val (rate, eta) = Pipeline.rateAndEta(Pipeline.Progress(0, 2), p, dtSeconds = 10.0)
    assert(rate == 0.1 && eta == 10.0)
  }
}
