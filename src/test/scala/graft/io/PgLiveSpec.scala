package graft.io

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import scala.sys.process._

import graft.SparkTestSession
import graft.text.{PostingIndex, TextOps}

/** Live-PostgreSQL parity (the reference's actual engine —
  * `Docker/docker-compose.yml:8-16`): the container ships PostgreSQL 15 but
  * no JDBC driver jar, so the Spark WRITE path stays Derby-tested (q62/q63);
  * here the two Postgres-specific surfaces run against a REAL server over a
  * unix socket via psql:
  *
  *  1. tsquery semantics — every operator mix (AND/OR/NOT/grouping/prefix/
  *     phrase/distance) must select the same doc set as
  *     `token @@ to_tsquery('english', …)` over `to_tsvector`'d rows, which
  *     also cross-checks Porter-vs-snowball stemming and positional
  *     numbering (stopword gaps) on the fixture vocabulary.
  *  2. the generated ON CONFLICT upsert statement — prepared and executed
  *     verbatim (with `?` → `$n`), including `text[]` array binding and
  *     conflict-update semantics, the round-4 residual risk.
  *
  * Tests CANCEL (not fail) when no local postgres is available, so the
  * suite stays green in slimmer environments. */
class PgLiveSpec extends AnyFunSuite with BeforeAndAfterAll {
  private val dir = "/tmp/graft_pglive"
  private var up = false

  private def sh(cmd: String): (Int, String) = {
    val out = new StringBuilder
    val code = Process(Seq("bash", "-c", cmd))
      .!(ProcessLogger(s => { out.append(s).append('\n'); () },
        s => { out.append(s).append('\n'); () }))
    (code, out.toString)
  }

  /** Run SQL through psql (unix socket, tuples-only); asserts success. */
  private def psql(sql: String): String = {
    val tmp = java.nio.file.Files.createTempFile("graft_pg_", ".sql")
    java.nio.file.Files.write(tmp, sql.getBytes("UTF-8"))
    val (c, o) = sh(s"psql -h $dir -U postgres -d postgres -v ON_ERROR_STOP=1 -tA -f $tmp")
    assert(c == 0, s"psql failed:\n$o\n--- sql:\n$sql")
    o
  }

  override def beforeAll(): Unit = {
    // initdb refuses root; the image ships a postgres system user — run the
    // server as that user against a chown'd temp dir, socket-only
    if (sh("command -v initdb && command -v pg_ctl && command -v psql && id postgres")._1 != 0)
      return
    sh(s"rm -rf $dir && mkdir -p $dir && chown postgres:postgres $dir")
    if (sh(s"""su postgres -s /bin/bash -c "initdb -D $dir/data -A trust" """)._1 != 0)
      return
    up = sh(s"""su postgres -s /bin/bash -c "pg_ctl -D $dir/data -o \\"-c listen_addresses='' -c unix_socket_directories=$dir\\" -l $dir/log start" """)._1 == 0
  }

  override def afterAll(): Unit = {
    if (up) { sh(s"""su postgres -s /bin/bash -c "pg_ctl -D $dir/data stop -m immediate" """); () }
    sh(s"rm -rf $dir"); ()
  }

  private val fixture = Seq(
    (1L, "merge the tables fast"),
    (2L, "merge with window functions"),
    (3L, "merge join strategies"),
    (4L, "vector embeddings rule"),
    (5L, "plain sort order"),
    (6L, "window vector blend"))

  test("tsquery semantics match live PostgreSQL on every operator mix") {
    assume(up, "no local postgres server")
    val spark = SparkTestSession.spark
    import spark.implicits._
    psql("DROP TABLE IF EXISTS docs;" +
      "CREATE TABLE docs(doc_id bigint PRIMARY KEY, text text, token tsvector);" +
      fixture.map { case (id, t) => s"INSERT INTO docs VALUES ($id, '$t');" }.mkString +
      "UPDATE docs SET token = to_tsvector('english', text);" +
      "CREATE INDEX docs_gin ON docs USING GIN(token);")
    val docs = fixture.toDF("doc_id", "text")
    val pos = PostingIndex.buildPositional(docs, "doc_id", $"text")
    val queries = Seq(
      "(merge & !(window | join)) | vec:*",
      "!merge & !vector",
      "merging | sorted",          // cross-checks Porter vs snowball stemming
      "!(merge | vec:*)",
      "merge <-> join",
      "merge <2> tables",          // stopword gap counts as a position in BOTH
      "merge <2> tables <-> fast")
    for (q <- queries) {
      val pg = psql(
        s"SELECT doc_id FROM docs WHERE token @@ to_tsquery('english', '$q') ORDER BY doc_id")
        .linesIterator.filter(_.nonEmpty).map(_.trim.toLong).toSet
      val posting = PostingIndex.searchQuery(pos, "doc_id", q, docs.select($"doc_id"))
        .as[Long].collect().toSet
      assert(posting == pg, s"posting path vs live PG for <$q>")
      if (!q.contains("<")) { // phrase needs positions the array path drops
        val arrayPath = docs
          .select($"doc_id", TextOps.tokenize($"text").as("toks"))
          .filter(TextOps.tsMatchQuery($"toks", q))
          .select($"doc_id").as[Long].collect().toSet
        assert(arrayPath == pg, s"array path vs live PG for <$q>")
      }
    }
  }

  test("generated ON CONFLICT upsert executes on live PostgreSQL incl. text[] binding") {
    assume(up, "no local postgres server")
    val dl = org.apache.spark.sql.jdbc.JdbcDialects.get("jdbc:postgresql://h/db")
    val sql = Jdbc.pgUpsertSql("filings", "filing_id", Seq("text", "token"), dl)
    var n = 0
    val pgSql = "\\?".r.replaceAllIn(sql, _ => { n += 1; java.util.regex.Matcher.quoteReplacement("$" + n) })
    val out = psql("DROP TABLE IF EXISTS filings;" +
      "CREATE TABLE filings(filing_id text PRIMARY KEY, text text, token text[]);" +
      s"PREPARE ups(text, text, text[]) AS $pgSql;" +
      "EXECUTE ups('f1', 'first text', ARRAY['first','text']);" +
      "EXECUTE ups('f1', 'updated text', ARRAY['updat','text']);" + // conflict -> update
      "EXECUTE ups('f2', 'other', NULL);" +
      "SELECT filing_id || '|' || text || '|' || coalesce(array_to_string(token, ','), '<null>')" +
      " FROM filings ORDER BY filing_id;")
    // keep only the data rows (psql -tA still prints command tags for DDL)
    val rows = out.linesIterator.map(_.trim).filter(_.contains("|")).toSeq
    assert(rows == Seq("f1|updated text|updat,text", "f2|other|<null>"), s"got: $rows")
  }
}
