package graft.io

import java.sql.DriverManager

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import scala.sys.process._

import graft.SparkTestSession
import graft.streaming.Streams

/** Spark `write.jdbc` / `read.jdbc` against LIVE PostgreSQL 15 over TCP,
  * through the pure-JVM wire-protocol driver ([[graft.io.pgwire.PgWireDriver]]).
  *
  * This closes the one reference boundary Spark itself had never crossed
  * (`load_filings_idx.py:51-57`, BASELINE "Spark + JDBC write to
  * PostgreSQL"): the container has no vendor JDBC jar, so q62/q63/q170
  * gate on embedded Derby — here the SAME Spark paths (dataframe write →
  * CREATE TABLE + batched INSERT, schema-resolve + scan read-back, native
  * ON CONFLICT upsert, streaming foreachBatch upsert with checkpoint
  * idempotence) run against a real PG 15 server under trust auth.
  *
  * Tests CANCEL (not fail) when the postgres binaries aren't available. */
class PgWireSpec extends AnyFunSuite with BeforeAndAfterAll {
  private val dir = "/tmp/graft_pgwire_test"
  private val port = 55432
  private val url = s"jdbc:postgresql://127.0.0.1:$port/postgres?user=postgres"
  private var up = false

  private def sh(cmd: String): (Int, String) = {
    val out = new StringBuilder
    val code = Process(Seq("bash", "-c", cmd))
      .!(ProcessLogger(s => { out.append(s).append('\n'); () },
        s => { out.append(s).append('\n'); () }))
    (code, out.toString)
  }

  override def beforeAll(): Unit = {
    graft.io.pgwire.PgWireDriver.ensureRegistered()
    if (sh("command -v initdb && command -v pg_ctl && id postgres")._1 != 0) return
    sh(s"rm -rf $dir && mkdir -p $dir && chown postgres:postgres $dir")
    if (sh(s"""su postgres -s /bin/bash -c "initdb -D $dir/data -A trust" """)._1 != 0) return
    up = sh(s"""su postgres -s /bin/bash -c "pg_ctl -D $dir/data -o \\"-c listen_addresses='127.0.0.1' -c port=$port -c unix_socket_directories=$dir\\" -l $dir/log start" """)._1 == 0
  }

  override def afterAll(): Unit = {
    if (up) { sh(s"""su postgres -s /bin/bash -c "pg_ctl -D $dir/data stop -m immediate" """); () }
    sh(s"rm -rf $dir"); ()
  }

  private def props: java.util.Properties = {
    val p = new java.util.Properties()
    p.setProperty("user", "postgres")
    p
  }

  test("write.jdbc + read.jdbc round-trips every scalar type Spark's Postgres dialect maps") {
    assume(up, "no local postgres server")
    val spark = SparkTestSession.spark
    import spark.implicits._
    val df = Seq(
      (1, 10000000001L, 1.toShort, 1.5d, 2.5f, true, "plain",
       "quo'te\"d — unicode ≤", BigDecimal("12345.67")),
      (2, -5L, -2.toShort, -0.25d, 0f, false, "row2", "", BigDecimal("-0.01")))
      .toDF("i", "l", "s", "d", "f", "b", "t", "tq", "n")
      .withColumn("dt", to_date(lit("2024-02-29")))
      .withColumn("ts", to_timestamp(lit("2024-02-29 12:34:56.123456")))
      .withColumn("bin", when($"i" === 1, lit(Array[Byte](0, 1, 127, -128, 65))))
    df.write.mode("overwrite").jdbc(url, "typeprobe", props)
    val back = spark.read.jdbc(url, "typeprobe", props)
    assert(back.schema.fields.map(f => (f.name, f.dataType.typeName)).toSet ==
      df.schema.fields.map(f => (f.name, f.dataType.typeName)).toSet,
      "schema round-trip")
    def norm(rows: Array[org.apache.spark.sql.Row]) = rows.map(_.toSeq.map {
      case b: Array[Byte] => b.toSeq
      case d: java.math.BigDecimal => d.stripTrailingZeros()
      case x => x
    }).toSeq
    assert(norm(df.orderBy("i").collect()) == norm(back.orderBy("i").collect()),
      "value round-trip")
  }

  test("append + predicate/prune read-back: filters reach the PG query") {
    assume(up, "no local postgres server")
    val spark = SparkTestSession.spark
    import spark.implicits._
    val rows = (1 to 500).map(i => (i.toLong, s"name_$i", i % 7))
    rows.toDF("id", "name", "bucket")
      .write.mode("overwrite").jdbc(url, "appendprobe", props)
    rows.take(50).toDF("id", "name", "bucket")
      .withColumn("id", $"id" + 1000L)
      .write.mode("append").jdbc(url, "appendprobe", props)
    val got = spark.read.jdbc(url, "appendprobe", props)
      .filter($"bucket" === 3 && $"id" <= 100L)
      .select($"id").as[Long].collect().sorted
    val want = rows.filter(r => r._3 == 3 && r._1 <= 100).map(_._1).sorted
    assert(got.toSeq == want)
    assert(spark.read.jdbc(url, "appendprobe", props).count() == 550)
  }

  test("native ON CONFLICT upsert via upsertByKey, including text[] array binding") {
    assume(up, "no local postgres server")
    val spark = SparkTestSession.spark
    import spark.implicits._
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate("DROP TABLE IF EXISTS filings")
      st.executeUpdate(
        "CREATE TABLE filings(filing_id text PRIMARY KEY, text text, token text[])")
      st.close()
    } finally conn.close()
    val seed = Seq(
      ("f1", "first text", Seq("first", "text")),
      ("f2", "second", Seq("second"))).toDF("filing_id", "text", "token")
    Jdbc.upsertByKey(seed, url, "filings", "filing_id", Seq("text", "token"))
    val round2 = Seq(
      ("f1", "updated text", Seq("updat", "text")), // conflict → update
      ("f3", "third", null.asInstanceOf[Seq[String]])) // new key → insert
      .toDF("filing_id", "text", "token")
    Jdbc.upsertByKey(round2, url, "filings", "filing_id", Seq("text", "token"))
    val back = spark.read.jdbc(url, "filings", props)
      .orderBy("filing_id")
      .collect()
      .map(r => (r.getString(0), r.getString(1),
        Option(r.getSeq[String](2)).map(_.toList).orNull))
    assert(back.toSeq == Seq(
      ("f1", "updated text", List("updat", "text")),
      ("f2", "second", List("second")),
      ("f3", "third", null)))
  }

  test("q170 shape: streaming foreachBatch upsert into live PG with checkpoint idempotence") {
    assume(up, "no local postgres server")
    val spark = SparkTestSession.spark
    import spark.implicits._
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate("DROP TABLE IF EXISTS orders_state")
      // upsert needs the key constraint ON CONFLICT binds to (the
      // reference declares PKs in init_tables.py)
      st.executeUpdate("CREATE TABLE orders_state(k bigint PRIMARY KEY, status text)")
      st.close()
    } finally conn.close()
    val base = (1L to 200L).map(k => (k, "O")).toDF("k", "status")
    base.write.mode("append").jdbc(url, "orders_state", props)
    val updates = base.filter($"k" % 10 === 0).select($"k", lit("X").as("status"))
    val inserts = base.filter($"k" % 50 === 1)
      .select(($"k" + 1000L).as("k"), lit("N").as("status"))
    val src = graft.util.Scratch.dir("graft_pgw_src_")
    updates.write.parquet(s"$src/b1")
    inserts.write.parquet(s"$src/b2")
    val ck = graft.util.Scratch.dir("graft_pgw_ck_")
    def run(): Unit = Streams.runForeachBatch(
        Streams.parquetStream(spark, s"$src/*", updates.schema), ck) { (batch, _) =>
      Jdbc.upsertByKey(batch, url, "orders_state", "k", Seq("status"))
    }
    run()
    run() // checkpoint replay must be a no-op
    val got = spark.read.jdbc(url, "orders_state", props)
      .orderBy("k").as[(Long, String)].collect()
    val want = ((1L to 200L).map(k => (k, if (k % 10 == 0) "X" else "O")) ++
      (1L to 200L).filter(_ % 50 == 1).map(k => (k + 1000L, "N"))).sortBy(_._1)
    assert(got.toSeq == want)
  }

  test("SCRAM-SHA-256: RFC 7677 exchange against PG's default password_encryption") {
    assume(up, "no local postgres server")
    val conn = DriverManager.getConnection(url) // superuser via trust
    try {
      val st = conn.createStatement()
      // PG 15 default is already scram-sha-256; set it explicitly so the
      // stored verifier shape is pinned regardless of initdb-era defaults
      st.executeUpdate("SET password_encryption = 'scram-sha-256'")
      st.executeUpdate("DROP ROLE IF EXISTS scram_probe")
      st.executeUpdate("CREATE ROLE scram_probe LOGIN PASSWORD 'S3cret-probe'")
      // confirm the server stored a SCRAM verifier, not md5 — otherwise
      // this test would silently exercise the md5 path
      val rs = st.executeQuery(
        "SELECT rolpassword FROM pg_authid WHERE rolname = 'scram_probe'")
      assert(rs.next() && rs.getString(1).startsWith("SCRAM-SHA-256$"),
        "server must store a SCRAM-SHA-256 verifier")
      st.close()
    } finally conn.close()
    // force the scram handshake for this role (prepended so it wins over
    // the initdb trust rule), then reload
    assert(sh(s"""su postgres -s /bin/bash -c "sed -i '1i host all scram_probe 127.0.0.1/32 scram-sha-256' $dir/data/pg_hba.conf && pg_ctl -D $dir/data reload" """)._1 == 0)
    val scramUrl =
      s"jdbc:postgresql://127.0.0.1:$port/postgres?user=scram_probe"
    // wrong password must be REJECTED by the server (proof verification)
    intercept[java.sql.SQLException] {
      DriverManager.getConnection(s"$scramUrl&password=wrong").close()
    }
    // missing password must fail loud, not hang
    intercept[java.sql.SQLException] {
      DriverManager.getConnection(scramUrl).close()
    }
    val c2 = DriverManager.getConnection(s"$scramUrl&password=S3cret-probe")
    try {
      val rs = c2.createStatement().executeQuery(
        "SELECT current_user, 41 + 1")
      assert(rs.next() && rs.getString(1) == "scram_probe" && rs.getInt(2) == 42)
    } finally c2.close()
  }

  test("TLS + SCRAM-SHA-256-PLUS: channel-bound auth over an encrypted link") {
    assume(up, "no local postgres server")
    // self-signed server cert; ssl/ssl_cert_file/ssl_key_file are all
    // SIGHUP-context, so a reload (no restart) turns TLS on
    val certOk = sh(
      s"""openssl req -new -x509 -days 2 -nodes -subj "/CN=127.0.0.1" """ +
        s"-newkey rsa:2048 -keyout $dir/server.key -out $dir/server.crt " +
        s"&& chown postgres:postgres $dir/server.key $dir/server.crt " +
        s"&& chmod 600 $dir/server.key")._1 == 0
    assume(certOk, "openssl unavailable")
    val conn0 = DriverManager.getConnection(url)
    try {
      val st = conn0.createStatement()
      st.executeUpdate("ALTER SYSTEM SET ssl = on")
      st.executeUpdate(s"ALTER SYSTEM SET ssl_cert_file = '$dir/server.crt'")
      st.executeUpdate(s"ALTER SYSTEM SET ssl_key_file = '$dir/server.key'")
      st.executeUpdate("SET password_encryption = 'scram-sha-256'")
      st.executeUpdate("DROP ROLE IF EXISTS tls_probe")
      st.executeUpdate("CREATE ROLE tls_probe LOGIN PASSWORD 'Tls-probe-pw'")
      st.close()
    } finally conn0.close()
    // hostssl: this role must arrive over TLS AND prove via SCRAM — the
    // server then offers SCRAM-SHA-256-PLUS alongside SCRAM-SHA-256. The
    // explicit plaintext reject matters: without it a non-SSL tls_probe
    // connection would fall through to initdb's trust rule.
    assert(sh(s"""su postgres -s /bin/bash -c "sed -i '1i hostssl all tls_probe 127.0.0.1/32 scram-sha-256' $dir/data/pg_hba.conf && sed -i '2i host all tls_probe 127.0.0.1/32 reject' $dir/data/pg_hba.conf && pg_ctl -D $dir/data reload" """)._1 == 0)
    Thread.sleep(500)
    // direct socket: pin that the -PLUS mechanism was actually selected
    // (channel binding really negotiated, not silently downgraded to n/y)
    val sock = new graft.io.pgwire.PgWireSocket("127.0.0.1", port, "tls_probe",
      "postgres", Some("Tls-probe-pw"), ssl = true)
    try {
      assert(sock.saslMechanism.contains("SCRAM-SHA-256-PLUS"),
        s"expected SCRAM-SHA-256-PLUS, handshake used ${sock.saslMechanism}")
      val r = sock.simpleQuery("SELECT current_user").head
      assert(r.rows.head.head == "tls_probe")
    } finally sock.close()
    // plaintext is rejected for this role (hostssl rule — encryption is
    // actually enforced, not merely available)
    intercept[java.sql.SQLException] {
      DriverManager.getConnection(
        s"jdbc:postgresql://127.0.0.1:$port/postgres?user=tls_probe&password=Tls-probe-pw").close()
    }
    // wrong password over TLS must still fail the SCRAM proof
    intercept[java.sql.SQLException] {
      DriverManager.getConnection(
        s"jdbc:postgresql://127.0.0.1:$port/postgres?user=tls_probe&password=wrong&sslmode=require").close()
    }
    // the full JDBC layer end-to-end over sslmode=require
    val c = DriverManager.getConnection(
      s"jdbc:postgresql://127.0.0.1:$port/postgres?user=tls_probe&password=Tls-probe-pw&sslmode=require")
    try {
      val rs = c.createStatement().executeQuery("SELECT 40 + 2")
      assert(rs.next() && rs.getInt(1) == 42)
    } finally c.close()
    // a verify mode without anchors must be refused loudly, never
    // silently downgraded to trust-all
    intercept[java.sql.SQLException] {
      DriverManager.getConnection(
        s"jdbc:postgresql://127.0.0.1:$port/postgres?user=tls_probe&password=Tls-probe-pw&sslmode=verify-ca").close()
    }
  }

  test("sslmode=verify-ca / verify-full: PKIX validation against sslrootcert") {
    assume(up, "no local postgres server")
    // phase-1 server cert: CN only, NO SAN — the verify-ca/verify-full
    // split hinges on it (chain validates; an IP target finds no IP SAN).
    // other.crt is an unrelated self-signed root for the wrong-anchor case.
    val certOk = sh(
      s"""openssl req -new -x509 -days 2 -nodes -subj "/CN=127.0.0.1" """ +
        s"-newkey rsa:2048 -keyout $dir/server.key -out $dir/server.crt " +
        s"""&& openssl req -new -x509 -days 2 -nodes -subj "/CN=unrelated" """ +
        s"-newkey rsa:2048 -keyout $dir/other.key -out $dir/other.crt " +
        s"&& chown postgres:postgres $dir/server.key $dir/server.crt " +
        s"&& chmod 600 $dir/server.key")._1 == 0
    assume(certOk, "openssl unavailable")
    val conn0 = DriverManager.getConnection(url)
    try {
      val st = conn0.createStatement()
      st.executeUpdate("ALTER SYSTEM SET ssl = on")
      st.executeUpdate(s"ALTER SYSTEM SET ssl_cert_file = '$dir/server.crt'")
      st.executeUpdate(s"ALTER SYSTEM SET ssl_key_file = '$dir/server.key'")
      st.close()
    } finally conn0.close()
    def connect(mode: String, root: Option[String]): Unit = {
      val extra = root.fold("")(r => s"&sslrootcert=$r")
      DriverManager.getConnection(
        s"jdbc:postgresql://127.0.0.1:$port/postgres?user=postgres" +
          s"&sslmode=$mode$extra").close()
    }
    // pg_ctl reload is asynchronous — poll for the reloaded cert by
    // retrying the positive connect (the old cert fails the new anchor,
    // so success == the new SSL context is live) instead of a fixed
    // sleep, which was flaky on slow reloads (round-12 advice item)
    def reloadUntil(probe: () => Unit, what: String): Unit = {
      assert(sh(s"""su postgres -s /bin/bash -c "pg_ctl -D $dir/data reload" """)._1 == 0)
      val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
      var last: Throwable = null
      while (true) {
        try { probe(); return }
        catch {
          case e: java.sql.SQLException if System.nanoTime() < deadline =>
            last = e; Thread.sleep(100)
          case e: java.sql.SQLException =>
            throw new AssertionError(s"$what not live after reload: ${e.getMessage}", e)
        }
      }
    }
    try {
      // verify-ca: the self-signed server cert is its own anchor
      reloadUntil(() => connect("verify-ca", Some(s"$dir/server.crt")),
        "CN-only server cert")
      // verify-ca against an unrelated root: handshake must be rejected
      val wrongRoot = intercept[java.sql.SQLException] {
        connect("verify-ca", Some(s"$dir/other.crt")) }
      assert(wrongRoot.getMessage.contains("TLS handshake"), wrongRoot.getMessage)
      // a bad anchors file fails loudly, before any handshake
      assert(intercept[java.sql.SQLException] {
        connect("verify-ca", Some(s"$dir/nonexistent.crt"))
      }.getMessage.contains("sslrootcert"))
      // sslrootcert under plain require is honored (libpq's "require with
      // a root CA file behaves as verify-ca"), never silently ignored: a
      // wrong anchor must fail the handshake even at sslmode=require
      intercept[java.sql.SQLException] {
        connect("require", Some(s"$dir/other.crt")) }
      connect("require", Some(s"$dir/server.crt"))
      // verify-full on a SAN-less cert: chain trusts fine (verify-ca above),
      // but JSSE's RFC 6125 rules find no IP SAN for the 127.0.0.1 target —
      // hostname verification is genuinely ON, not a no-op atop verify-ca
      intercept[java.sql.SQLException] {
        connect("verify-full", Some(s"$dir/server.crt")) }
      // phase 2: regenerate WITH the IP SAN, SIGHUP reloads the cert in
      // place — verify-full must now pass end-to-end
      assert(sh(
        s"""openssl req -new -x509 -days 2 -nodes -subj "/CN=127.0.0.1" """ +
          s"""-addext "subjectAltName=IP:127.0.0.1" """ +
          s"-newkey rsa:2048 -keyout $dir/server.key -out $dir/server.crt " +
          s"&& chown postgres:postgres $dir/server.key $dir/server.crt " +
          s"&& chmod 600 $dir/server.key")._1 == 0)
      reloadUntil(() => connect("verify-full", Some(s"$dir/server.crt")),
        "IP-SAN server cert")
      // and the wrong-anchor rejection still holds under verify-full
      intercept[java.sql.SQLException] {
        connect("verify-full", Some(s"$dir/other.crt")) }
    } finally {
      // restore the cluster-wide cert GUCs this test pointed at its own
      // throwaway files — later TLS tests must not inherit them silently
      val c = DriverManager.getConnection(url)
      try {
        val st = c.createStatement()
        st.executeUpdate("ALTER SYSTEM RESET ssl_cert_file")
        st.executeUpdate("ALTER SYSTEM RESET ssl_key_file")
        st.close()
      } finally c.close()
      sh(s"""su postgres -s /bin/bash -c "pg_ctl -D $dir/data reload" """)
      ()
    }
  }

  test("transactional batched writer: updateByKey per-row counts are real on PG") {
    assume(up, "no local postgres server")
    val spark = SparkTestSession.spark
    import spark.implicits._
    (1L to 50L).map(k => (k, "A")).toDF("k", "v")
      .write.mode("overwrite").jdbc(url, "updprobe", props)
    Jdbc.updateByKey(
      (1L to 50L).filter(_ % 5 == 0).map(k => (k, "B")).toDF("k", "v"),
      url, "updprobe", "k", Seq("v"))
    val got = spark.read.jdbc(url, "updprobe", props)
      .filter($"v" === "B").select("k").as[Long].collect().sorted
    assert(got.toSeq == (1L to 50L).filter(_ % 5 == 0))
  }
}
