package graft.io

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.time.Duration

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col

/** Distributed document fetch (SURVEY §2.1 S4/S5 + §2.8 X1): the reference's
  * 20-process `Pool.map_async(dl_filing)` becomes a partitioned
  * `mapPartitions` fetch stage — Spark tasks replace worker processes, one
  * client per partition, politeness rate limit per task.
  *
  * HTTP lives behind [[Fetcher]] so the zero-egress test environment injects
  * [[FileFetcher]] (file:// corpus) without touching pipeline code.
  */
object Fetch {

  trait Fetcher extends Serializable {
    /** Returns the document body, or None on failure (failed rows keep
      * text=NULL and stay in the work queue — reference semantics). */
    def fetch(url: String): Option[String]
  }

  /** S4/S5: real HTTP fetcher (latin-1 decode per
    * `scrape_all_filings.py:85`; politeness delay per request; bounded
    * retries with exponential backoff on 5xx/transport errors — 4xx is
    * permanent and returns immediately). A failed fetch returns None, so
    * the row keeps text=NULL and stays in the work queue for the next
    * batch, exactly like the reference's crashed-worker semantics. */
  final class HttpFetcher(delayMillis: Long = 100L,
                          timeout: Duration = Duration.ofSeconds(30),
                          retries: Int = 2,
                          backoffMillis: Long = 500L) extends Fetcher {
    @transient private lazy val client =
      HttpClient.newBuilder().connectTimeout(timeout).build()
    def fetch(url: String): Option[String] = {
      var attempt = 0
      while (attempt <= retries) {
        if (attempt > 0) Thread.sleep(backoffMillis << (attempt - 1))
        else if (delayMillis > 0) Thread.sleep(delayMillis)
        try {
          val req = HttpRequest.newBuilder(URI.create(url)).GET().build()
          val resp = client.send(req, HttpResponse.BodyHandlers.ofByteArray())
          resp.statusCode() / 100 match {
            case 2 => return Some(new String(resp.body(), StandardCharsets.ISO_8859_1))
            // 3xx: the client never follows redirects, so retrying can't
            // help either — both are permanent from this fetcher's view
            case 3 | 4 => return None
            case _ => () // 5xx: retry with backoff
          }
        } catch {
          case _: InterruptedException =>
            Thread.currentThread().interrupt() // task kill: stop retrying
            return None
          case _: Exception => () // transport error: retry
        }
        attempt += 1
      }
      None
    }
  }

  /** Local-file fetcher for tests/fixtures ("url" = filesystem path). */
  final class FileFetcher extends Fetcher {
    def fetch(url: String): Option[String] = {
      val p = Paths.get(url.stripPrefix("file://"))
      if (Files.exists(p)) Some(new String(Files.readAllBytes(p), StandardCharsets.UTF_8))
      else None
    }
  }

  /** The fetch stage: (id, url) rows → (id, url, body) with one Fetcher per
    * partition. `parallelism` replaces CONCURRENT_WORKERS
    * (`config/CONSTANTS.py:12`); failed fetches yield null body. The id
    * column keeps its caller-side type (filing ids are md5-hex strings,
    * q61's doc ids are longs — the stage never inspects it). */
  def fetchStage(df: DataFrame, idCol: String, urlCol: String,
                 fetcher: Fetcher, parallelism: Int = 20): DataFrame = {
    val in = df.select(col(idCol), col(urlCol).cast("string").as(urlCol))
    val outSchema = org.apache.spark.sql.types.StructType(
      in.schema.fields :+
        org.apache.spark.sql.types.StructField("body",
          org.apache.spark.sql.types.StringType, nullable = true))
    in.repartition(parallelism)
      .mapPartitions { rows =>
        rows.map { r =>
          val url = r.getString(1)
          org.apache.spark.sql.Row(r.get(0), url, fetcher.fetch(url).orNull)
        }
      }(org.apache.spark.sql.Encoders.row(outSchema))
  }
}
