package graft.io.pgwire

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.nio.charset.StandardCharsets.UTF_8
import java.sql.{Connection, DatabaseMetaData, PreparedStatement, ResultSet, ResultSetMetaData, SQLException, SQLFeatureNotSupportedException, Statement, Types}
import java.util.Properties

/** Pure-JVM JDBC driver over [[PgWireSocket]] — just enough java.sql for
  * Spark's JDBC relation (schema resolve / scan / create / insert-batch)
  * and the engine's `updateByKey`/`upsertByKey` to run against live
  * PostgreSQL when no vendor jar exists on the classpath (this container:
  * PG 15 installed, `/opt/spark/jars` Derby-only, zero egress).
  *
  * Design: the JDBC interfaces are huge (ResultSet alone is ~190 methods),
  * so each object is a dynamic [[Proxy]] whose handler implements the
  * methods Spark and the engine actually call and throws a LOUD
  * `SQLFeatureNotSupportedException` naming anything else — misses surface
  * as a named method in a test failure, never as silent wrong data.
  * PreparedStatement parameters are rendered as typed SQL literals
  * client-side (timestamps as `'…+00'::timestamptz` against the
  * connection's pinned UTC session, bytea as `'\x…'`, arrays as
  * `ARRAY[…]::t[]`), so only the simple-query protocol is needed;
  * `executeBatch` concatenates the batch into ONE multi-statement
  * round trip and recovers REAL per-row counts from the CommandComplete
  * tags (the engine's upsert fallback refuses SUCCESS_NO_INFO drivers).
  *
  * Registered via `META-INF/services/java.sql.Driver`, so both
  * `DriverManager.getConnection` (executor-side upsert path) and Spark's
  * `DriverRegistry` resolve it for `jdbc:postgresql:` URLs.
  */
final class PgWireDriver extends java.sql.Driver {
  override def acceptsURL(url: String): Boolean =
    url != null && url.startsWith("jdbc:postgresql:")
  override def connect(url: String, info: Properties): Connection =
    if (!acceptsURL(url)) null else PgWireJdbc.connect(url, info)
  override def getMajorVersion: Int = 0
  override def getMinorVersion: Int = 8
  override def jdbcCompliant(): Boolean = false
  override def getPropertyInfo(url: String, info: Properties): Array[java.sql.DriverPropertyInfo] =
    Array.empty
  override def getParentLogger: java.util.logging.Logger =
    throw new SQLFeatureNotSupportedException("getParentLogger")
}

object PgWireDriver {
  /** Idempotent DriverManager registration. The META-INF/services entry
    * covers plain JVMs, but classloader-isolated launchers (sbt's forked
    * test runner) never hand the app classpath to DriverManager's
    * ServiceLoader pass — so [[graft.io.Jdbc]] and callers touch this
    * before the first `DriverManager.getConnection`/`getDriver` on a
    * `jdbc:postgresql:` URL. Spark paths that pass the `driver` option go
    * through DriverRegistry (Class.forName + newInstance) and don't need
    * it. */
  private lazy val registration: Unit =
    java.sql.DriverManager.registerDriver(new PgWireDriver)
  def ensureRegistered(): Unit = registration
}

private[pgwire] object PgWireJdbc {

  /** `jdbc:postgresql://host:port/db?user=u&password=p`, or
    * `jdbc:postgresql:db` (localhost:5432). Properties win over URL params. */
  def connect(url: String, info: Properties): Connection = {
    val body = url.stripPrefix("jdbc:postgresql:")
    val (hostPort, pathQ) =
      if (body.startsWith("//")) {
        val rest = body.drop(2)
        val slash = rest.indexOf('/')
        if (slash < 0) (rest, "") else (rest.take(slash), rest.drop(slash + 1))
      } else ("localhost:5432", body)
    val (host, port) = hostPort.split(':') match {
      case Array(h, p) => (h, p.toInt)
      case Array(h) if h.nonEmpty => (h, 5432)
      case _ => ("localhost", 5432)
    }
    val (db, query) = pathQ.split('?') match {
      case Array(d, q) => (d, q)
      case Array(d) => (d, "")
      case _ => ("postgres", "")
    }
    val urlParams = query.split('&').filter(_.contains("="))
      .map { kv => val i = kv.indexOf('='); kv.take(i) -> kv.drop(i + 1) }.toMap
    def opt(k: String): Option[String] =
      Option(if (info == null) null else info.getProperty(k)).orElse(urlParams.get(k))
    val user = opt("user").getOrElse("postgres")
    val database = if (db.nonEmpty) db else "postgres"
    // ssl=true or sslmode=require → TLS (SSLRequest + JSSE + SCRAM-PLUS
    // channel binding when offered; trust-all certs, like libpq require).
    // verify-ca adds PKIX chain validation against the PEM roots named by
    // sslrootcert (libpq's flag, no ~/.postgresql/root.crt default — an
    // implicit file picking the trust anchors would be the kind of silent
    // behavior a verify mode exists to rule out); verify-full additionally
    // checks the server hostname/IP against the cert's SAN (RFC 6125 via
    // JSSE endpoint identification). A verify request without sslrootcert
    // is refused loudly, never downgraded to trust-all.
    val sslMode = opt("sslmode")
    val verify = sslMode.exists(m => m == "verify-ca" || m == "verify-full")
    val rootCert = opt("sslrootcert")
    if (verify && rootCert.isEmpty)
      throw new java.sql.SQLException(
        s"sslmode=${sslMode.get} needs sslrootcert=<PEM file of trusted " +
          "roots> — without anchors certificate validation cannot run, and " +
          "silently falling back to trust-all would misrepresent the mode")
    val ssl = opt("ssl").contains("true") || sslMode.contains("require") || verify
    // sslrootcert under require/ssl=true is HONORED, not ignored (libpq's
    // documented rule: "if a root CA file is present, require behaves the
    // same as verify-ca") — the user who named trust anchors asked for
    // chain validation, and running trust-all anyway would silently
    // misrepresent the request (round-12 advice item).
    val sock = new PgWireSocket(host, port, user, database, opt("password"), ssl,
      sslRootCert = if (ssl) rootCert else None,
      sslVerifyHostname = sslMode.contains("verify-full"))
    new PgConnection(sock, url, user).asJdbc
  }

  // ---- type mapping (OID → java.sql.Types + pg type name) ----------------

  /** The common scalar OIDs (pg_type.dat — public catalog constants). */
  private val oidInfo: Map[Int, (Int, String)] = Map(
    16 -> (Types.BOOLEAN, "bool"),
    17 -> (Types.BINARY, "bytea"),
    18 -> (Types.CHAR, "char"),
    19 -> (Types.VARCHAR, "name"),
    20 -> (Types.BIGINT, "int8"),
    21 -> (Types.SMALLINT, "int2"),
    23 -> (Types.INTEGER, "int4"),
    25 -> (Types.VARCHAR, "text"),
    26 -> (Types.BIGINT, "oid"),
    700 -> (Types.REAL, "float4"),
    701 -> (Types.DOUBLE, "float8"),
    1042 -> (Types.CHAR, "bpchar"),
    1043 -> (Types.VARCHAR, "varchar"),
    1082 -> (Types.DATE, "date"),
    1114 -> (Types.TIMESTAMP, "timestamp"),
    1184 -> (Types.TIMESTAMP, "timestamptz"),
    1700 -> (Types.NUMERIC, "numeric"),
    2950 -> (Types.OTHER, "uuid"),
    114 -> (Types.OTHER, "json"),
    3802 -> (Types.OTHER, "jsonb"))

  /** Array OIDs → element type name ("_text" convention, as pgjdbc reports
    * via getColumnTypeName — PostgresDialect strips the underscore). */
  private val arrayOidInfo: Map[Int, String] = Map(
    1000 -> "_bool", 1001 -> "_bytea", 1005 -> "_int2", 1007 -> "_int4",
    1016 -> "_int8", 1009 -> "_text", 1015 -> "_varchar", 1021 -> "_float4",
    1022 -> "_float8", 1182 -> "_date", 1115 -> "_timestamp", 1231 -> "_numeric")

  def sqlTypeOf(oid: Int): Int =
    oidInfo.get(oid).map(_._1)
      .orElse(arrayOidInfo.get(oid).map(_ => Types.ARRAY))
      .getOrElse(Types.OTHER)

  def typeNameOf(oid: Int): String =
    oidInfo.get(oid).map(_._2).orElse(arrayOidInfo.get(oid)).getOrElse(s"oid$oid")

  // ---- literal rendering -------------------------------------------------

  /** Standard-conforming string literal ('' doubling; PG default since 9.1). */
  def strLit(s: String): String = "'" + s.replace("'", "''") + "'"

  def bytesLit(b: Array[Byte]): String =
    "'\\x" + b.map("%02x".format(_)).mkString + "'"

  private val tsFmt = java.time.format.DateTimeFormatter
    .ofPattern("uuuu-MM-dd HH:mm:ss.SSSSSS")
    .withZone(java.time.ZoneOffset.UTC)

  /** Rendered at UTC with an explicit +00 offset; the connection pins the
    * session TimeZone to UTC, so both tz-aware and plain timestamp columns
    * land (and read back) as the same instant. */
  def timestampLit(ts: java.sql.Timestamp): String =
    "'" + tsFmt.format(ts.toInstant) + "+00'::timestamptz"

  def render(v: Any): String = v match {
    case null => "NULL"
    case s: String => strLit(s)
    case b: java.lang.Boolean => if (b) "TRUE" else "FALSE"
    case d: java.lang.Double =>
      if (d.isNaN || d.isInfinite) s"'$d'::float8" else s"'$d'::float8"
    case f: java.lang.Float => s"'$f'::float4"
    case n: java.math.BigDecimal => s"'${n.toPlainString}'::numeric"
    case t: java.sql.Timestamp => timestampLit(t)
    case d: java.sql.Date => s"DATE '$d'"
    case b: Array[Byte] => bytesLit(b)
    case a: PgArray => a.literal
    case n: Number => n.toString // int/long/short/byte
    case other => throw new SQLException(s"cannot render SQL literal for ${other.getClass}")
  }

  /** Split a statement on `?` placeholders, skipping '…' and "…" spans. */
  def splitPlaceholders(sql: String): IndexedSeq[String] = {
    val parts = IndexedSeq.newBuilder[String]
    val cur = new StringBuilder
    var i = 0
    var inStr = false
    var inIdent = false
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (inStr) { cur.append(c); if (c == '\'') inStr = false }
      else if (inIdent) { cur.append(c); if (c == '"') inIdent = false }
      else c match {
        case '\'' => inStr = true; cur.append(c)
        case '"' => inIdent = true; cur.append(c)
        case '?' => parts += cur.toString; cur.clear()
        case _ => cur.append(c)
      }
      i += 1
    }
    parts += cur.toString
    parts.result()
  }
}

/** Client-side java.sql.Array: carries the element type name + values and
  * renders as an `ARRAY[…]::t[]` literal. */
private[pgwire] final case class PgArray(baseTypeName: String, elems: Array[AnyRef]) {
  private def pgElemType: String = baseTypeName.toLowerCase match {
    case "varchar" | "text" | "string" => "text"
    case "integer" | "int" | "int4" => "int4"
    case "bigint" | "int8" => "int8"
    case "double" | "double precision" | "float8" => "float8"
    case "real" | "float4" => "float4"
    case "boolean" | "bool" => "bool"
    case "date" => "date"
    case "timestamp" | "timestamptz" => "timestamptz"
    case other => other
  }
  def literal: String =
    if (elems == null || elems.isEmpty) s"ARRAY[]::$pgElemType[]"
    else elems.map(PgWireJdbc.render).mkString("ARRAY[", ", ", s"]::$pgElemType[]")
  def asJdbc: java.sql.Array = {
    val self = this
    PgProxy.make[java.sql.Array]("Array") {
      case ("getBaseTypeName", _) => baseTypeName
      case ("getArray", Seq()) => elems
      case ("free", _) => null
      case ("__self", _) => self
    }
  }
}

/** Proxy factory: explicit handlers + loud misses. */
private[pgwire] object PgProxy {
  def make[T: scala.reflect.ClassTag](what: String)(
      handler: PartialFunction[(String, Seq[AnyRef]), Any]): T = {
    val cls = implicitly[scala.reflect.ClassTag[T]].runtimeClass
    Proxy.newProxyInstance(cls.getClassLoader, Array(cls),
      new InvocationHandler {
        override def invoke(p: AnyRef, m: Method, args: Array[AnyRef]): AnyRef = {
          val a: Seq[AnyRef] = if (args == null) Seq.empty else args.toSeq
          m.getName match {
            case "toString" if !handler.isDefinedAt(("toString", a)) =>
              s"PgWire$what"
            case "hashCode" if !handler.isDefinedAt(("hashCode", a)) =>
              Integer.valueOf(System.identityHashCode(p))
            case "equals" if !handler.isDefinedAt(("equals", a)) =>
              java.lang.Boolean.valueOf(p eq a.head)
            case name =>
              handler.andThen(r => r.asInstanceOf[AnyRef])
                .applyOrElse((name, a), (_: (String, Seq[AnyRef])) =>
                  throw new SQLFeatureNotSupportedException(s"$what.$name"))
          }
        }
      }).asInstanceOf[T]
  }
}

/** Live connection state + its java.sql.Connection proxy. */
private[pgwire] final class PgConnection(sock: PgWireSocket, url: String, user: String) {
  private var autoCommit = true
  private var inTxn = false
  private var closed = false
  private var isolation = Connection.TRANSACTION_READ_COMMITTED

  /** Run SQL under the connection's transaction discipline: with
    * autoCommit off, open the transaction lazily on first use. */
  def execute(sql: String): IndexedSeq[PgResult] = {
    if (closed) throw new SQLException("connection is closed")
    if (!autoCommit && !inTxn) { sock.simpleQuery("BEGIN"); inTxn = true }
    sock.simpleQuery(sql)
  }

  private def endTxn(how: String): Unit =
    if (inTxn) { sock.simpleQuery(how); inTxn = false }

  val asJdbc: Connection = PgProxy.make[Connection]("Connection") {
    case ("createStatement", _) => new PgStatement(this, None).asJdbc
    case ("prepareStatement", args) =>
      new PgStatement(this, Some(args.head.asInstanceOf[String])).asJdbcPrepared
    case ("setAutoCommit", Seq(b: java.lang.Boolean)) =>
      if (b && !autoCommit) endTxn("COMMIT")
      autoCommit = b; null
    case ("getAutoCommit", _) => java.lang.Boolean.valueOf(autoCommit)
    case ("commit", _) => endTxn("COMMIT"); null
    case ("rollback", Seq()) => endTxn("ROLLBACK"); null
    case ("close", _) =>
      if (!closed) {
        try endTxn("ROLLBACK") catch { case _: Exception => }
        closed = true; sock.close()
      }
      null
    case ("isClosed", _) => java.lang.Boolean.valueOf(closed)
    case ("isValid", _) => java.lang.Boolean.valueOf(!closed && sock.isOpen)
    case ("setTransactionIsolation", Seq(l: Integer)) =>
      isolation = l
      val name = l.intValue() match {
        case Connection.TRANSACTION_READ_UNCOMMITTED => "READ UNCOMMITTED"
        case Connection.TRANSACTION_READ_COMMITTED => "READ COMMITTED"
        case Connection.TRANSACTION_REPEATABLE_READ => "REPEATABLE READ"
        case Connection.TRANSACTION_SERIALIZABLE => "SERIALIZABLE"
        case other => throw new SQLException(s"unknown isolation level $other")
      }
      execute(s"SET SESSION CHARACTERISTICS AS TRANSACTION ISOLATION LEVEL $name")
      null
    case ("getTransactionIsolation", _) => Integer.valueOf(isolation)
    case ("getMetaData", _) => metaData
    case ("createArrayOf", Seq(tn: String, elems: Array[AnyRef])) =>
      PgArray(tn, elems).asJdbc
    case ("getWarnings", _) => null
    case ("clearWarnings", _) => null
    case ("setNetworkTimeout", _) => null
    case ("getNetworkTimeout", _) => Integer.valueOf(0)
    case ("getCatalog", _) => null
    case ("setCatalog", _) => null
    case ("getSchema", _) => "public"
    case ("setReadOnly", _) => null
    case ("isReadOnly", _) => java.lang.Boolean.FALSE
    case ("__self", _) => this
  }

  /** Permissive metadata proxy: the few capability bits Spark reads are
    * explicit; anything else defaults by return type (probing metadata
    * must not explode). */
  private lazy val metaData: DatabaseMetaData = {
    val cls = classOf[DatabaseMetaData]
    Proxy.newProxyInstance(cls.getClassLoader, Array(cls), new InvocationHandler {
      override def invoke(p: AnyRef, m: Method, args: Array[AnyRef]): AnyRef =
        m.getName match {
          case "getURL" => url
          case "getUserName" => user
          case "getDatabaseProductName" => "PostgreSQL"
          case "getDatabaseProductVersion" =>
            sock.serverParams.getOrElse("server_version", "15")
          case "getDatabaseMajorVersion" =>
            Integer.valueOf(sock.serverParams.getOrElse("server_version", "15")
              .takeWhile(_.isDigit) match { case "" => 15; case s => s.toInt })
          case "getDatabaseMinorVersion" => Integer.valueOf(0)
          case "getDriverName" => "graft-pgwire"
          case "getDriverVersion" => "0.8"
          case "getJDBCMajorVersion" => Integer.valueOf(4)
          case "getJDBCMinorVersion" => Integer.valueOf(2)
          case "getConnection" => asJdbc
          case "supportsTransactions" => java.lang.Boolean.TRUE
          case "supportsDataDefinitionAndDataManipulationTransactions" =>
            java.lang.Boolean.TRUE
          case "supportsDataManipulationTransactionsOnly" => java.lang.Boolean.FALSE
          case "supportsTransactionIsolationLevel" =>
            java.lang.Boolean.valueOf(args(0).asInstanceOf[Integer] != Connection.TRANSACTION_NONE)
          case "getDefaultTransactionIsolation" =>
            Integer.valueOf(Connection.TRANSACTION_READ_COMMITTED)
          case "supportsBatchUpdates" => java.lang.Boolean.TRUE
          case "getIdentifierQuoteString" => "\""
          case "getSearchStringEscape" => "\\"
          case "getSQLKeywords" => ""
          case "getMaxColumnNameLength" => Integer.valueOf(63)
          case "storesLowerCaseIdentifiers" => java.lang.Boolean.TRUE
          case "toString" => "PgWireDatabaseMetaData"
          case "hashCode" => Integer.valueOf(System.identityHashCode(p))
          case "equals" => java.lang.Boolean.valueOf(p eq args(0))
          case _ =>
            m.getReturnType match {
              case java.lang.Boolean.TYPE => java.lang.Boolean.FALSE
              case java.lang.Integer.TYPE => Integer.valueOf(0)
              case java.lang.Long.TYPE => java.lang.Long.valueOf(0L)
              case java.lang.Short.TYPE => java.lang.Short.valueOf(0.toShort)
              case java.lang.Void.TYPE => null
              case _ => null
            }
        }
    }).asInstanceOf[DatabaseMetaData]
  }
}

/** Statement + PreparedStatement over one connection. Prepared parameters
  * are rendered literals; executeBatch sends the whole batch as one
  * multi-statement simple query and reads per-statement tags. */
private[pgwire] final class PgStatement(conn: PgConnection, prepared: Option[String]) {
  private val parts = prepared.map(PgWireJdbc.splitPlaceholders)
  private val nParams = parts.map(_.size - 1).getOrElse(0)
  private var params = new Array[String](nParams)
  private val batch = scala.collection.mutable.ArrayBuffer.empty[String]
  private var results: IndexedSeq[PgResult] = IndexedSeq.empty
  private var resultIdx = 0
  private var stClosed = false

  private def renderedSql: String = {
    val p = parts.getOrElse(throw new SQLException("not a prepared statement"))
    val sb = new StringBuilder(p.head)
    var i = 0
    while (i < nParams) {
      val v = params(i)
      if (v == null)
        throw new SQLException(s"parameter ${i + 1} not set")
      sb.append(v).append(p(i + 1))
      i += 1
    }
    sb.toString
  }

  private def setP(idx: Int, lit: String): Null = {
    params(idx - 1) = lit; null
  }

  private def run(sql: String): IndexedSeq[PgResult] = {
    results = conn.execute(sql)
    resultIdx = 0
    results
  }

  private def firstRows(rs: IndexedSeq[PgResult]): PgResult =
    rs.find(_.hasRows).getOrElse(PgResult(IndexedSeq.empty, IndexedSeq.empty, ""))

  private val common: PartialFunction[(String, Seq[AnyRef]), Any] = {
    case ("executeQuery", Seq(sql: String)) => new PgResultSet(firstRows(run(sql))).asJdbc
    case ("executeUpdate", Seq(sql: String)) =>
      Integer.valueOf(run(sql).map(r => math.max(r.updateCount, 0)).sum)
    case ("execute", Seq(sql: String)) =>
      java.lang.Boolean.valueOf(run(sql).headOption.exists(_.hasRows))
    case ("getResultSet", _) =>
      if (resultIdx < results.size && results(resultIdx).hasRows)
        new PgResultSet(results(resultIdx)).asJdbc
      else null
    case ("getUpdateCount", _) =>
      Integer.valueOf(
        if (resultIdx < results.size && !results(resultIdx).hasRows)
          math.max(results(resultIdx).updateCount, 0)
        else -1)
    case ("getMoreResults", Seq()) =>
      resultIdx += 1
      java.lang.Boolean.valueOf(resultIdx < results.size && results(resultIdx).hasRows)
    case ("setQueryTimeout", _) => null
    case ("getQueryTimeout", _) => Integer.valueOf(0)
    case ("setFetchSize", _) => null
    case ("getFetchSize", _) => Integer.valueOf(0)
    case ("setMaxRows", _) => null
    case ("cancel", _) => null
    case ("close", _) => stClosed = true; null
    case ("isClosed", _) => java.lang.Boolean.valueOf(stClosed)
    case ("getConnection", _) => conn.asJdbc
    case ("getWarnings", _) => null
    case ("clearWarnings", _) => null
    case ("setEscapeProcessing", _) => null
    case ("addBatch", Seq(sql: String)) => batch += sql; null
    case ("clearBatch", _) => batch.clear(); null
    case ("executeBatch", _) =>
      if (batch.isEmpty) Array.empty[Int]
      else {
        // one round trip for the whole batch; per-statement tags give the
        // REAL update counts the upsert fallback insists on
        val rs = run(batch.mkString(";\n"))
        if (rs.size != batch.size)
          throw new SQLException(
            s"batch returned ${rs.size} results for ${batch.size} statements")
        batch.clear()
        rs.map(r => math.max(r.updateCount, 0)).toArray
      }
  }

  private val preparedOnly: PartialFunction[(String, Seq[AnyRef]), Any] = {
    case ("executeQuery", Seq()) => new PgResultSet(firstRows(run(renderedSql))).asJdbc
    case ("executeUpdate", Seq()) =>
      Integer.valueOf(run(renderedSql).map(r => math.max(r.updateCount, 0)).sum)
    case ("execute", Seq()) =>
      java.lang.Boolean.valueOf(run(renderedSql).headOption.exists(_.hasRows))
    case ("addBatch", Seq()) =>
      batch += renderedSql
      params = new Array[String](nParams)
      null
    case ("clearParameters", _) => params = new Array[String](nParams); null
    case ("setNull", Seq(i: Integer, _)) => setP(i, "NULL")
    case ("setString", Seq(i: Integer, v)) =>
      setP(i, if (v == null) "NULL" else PgWireJdbc.strLit(v.asInstanceOf[String]))
    case ("setBoolean", Seq(i: Integer, v: java.lang.Boolean)) =>
      setP(i, if (v) "TRUE" else "FALSE")
    case ("setByte", Seq(i: Integer, v: java.lang.Byte)) => setP(i, v.toString)
    case ("setShort", Seq(i: Integer, v: java.lang.Short)) => setP(i, v.toString)
    case ("setInt", Seq(i: Integer, v: Integer)) => setP(i, v.toString)
    case ("setLong", Seq(i: Integer, v: java.lang.Long)) => setP(i, v.toString)
    case ("setFloat", Seq(i: Integer, v: java.lang.Float)) =>
      setP(i, PgWireJdbc.render(v))
    case ("setDouble", Seq(i: Integer, v: java.lang.Double)) =>
      setP(i, PgWireJdbc.render(v))
    case ("setBigDecimal", Seq(i: Integer, v)) =>
      setP(i, if (v == null) "NULL" else PgWireJdbc.render(v))
    case ("setTimestamp", Seq(i: Integer, v)) =>
      setP(i, if (v == null) "NULL" else PgWireJdbc.timestampLit(v.asInstanceOf[java.sql.Timestamp]))
    case ("setDate", Seq(i: Integer, v)) =>
      setP(i, if (v == null) "NULL" else s"DATE '$v'")
    case ("setBytes", Seq(i: Integer, v)) =>
      setP(i, if (v == null) "NULL" else PgWireJdbc.bytesLit(v.asInstanceOf[Array[Byte]]))
    case ("setArray", Seq(i: Integer, v)) =>
      // v is our own proxied Array — recover the PgArray for its literal
      setP(i, if (v == null) "NULL"
      else Proxy.getInvocationHandler(v)
        .invoke(v, classOf[PgSelfHook].getMethod("__self"), Array.empty)
        .asInstanceOf[PgArray].literal)
    case ("setObject", Seq(i: Integer, v)) =>
      setP(i, PgWireJdbc.render(v))
  }

  val asJdbc: Statement = PgProxy.make[Statement]("Statement")(common)
  val asJdbcPrepared: PreparedStatement =
    PgProxy.make[PreparedStatement]("PreparedStatement")(preparedOnly.orElse(common))
}

/** Marker interface for the proxy `__self` backdoor. */
private[pgwire] trait PgSelfHook { def __self: AnyRef }

/** Buffered, text-format ResultSet + its metadata. */
private[pgwire] final class PgResultSet(res: PgResult) {
  private var idx = -1
  private var nullFlag = false
  private var rsClosed = false
  private val byName: Map[String, Int] =
    res.columns.zipWithIndex.map { case (c, i) => c.name.toLowerCase -> (i + 1) }.toMap

  private def raw(col: Int): String = {
    val v = res.rows(idx)(col - 1)
    nullFlag = v == null
    v
  }

  private def num[T](col: Int, zero: T)(parse: String => T): T = {
    val v = raw(col)
    if (v == null) zero else parse(v.trim)
  }

  /** "2024-01-02 03:04:05.123456+00" / "...‑05" / bare — parsed at the
    * written offset (connection sessions are pinned UTC so it's +00). */
  private def parseTs(s: String): java.sql.Timestamp = {
    val re = "([0-9]{4}-[0-9]{2}-[0-9]{2}) ([0-9:]{8})(\\.[0-9]+)?([+-][0-9]{2}(?::?[0-9]{2})?)?".r
    s match {
      case re(d, t, frac, off) =>
        val base = java.time.LocalDateTime.parse(s"${d}T$t")
        val nanos = if (frac == null) 0L
          else (frac.drop(1).padTo(9, '0').take(9)).toLong
        val zone = if (off == null) java.time.ZoneOffset.UTC
          else java.time.ZoneOffset.of(off)
        val inst = base.plusNanos(nanos).atOffset(zone).toInstant
        java.sql.Timestamp.from(inst)
      case _ => java.sql.Timestamp.valueOf(s)
    }
  }

  private def parseBytea(s: String): Array[Byte] =
    if (s.startsWith("\\x"))
      s.drop(2).grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray
    else s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1) // escape fmt unused on PG9.0+

  /** PG array text format: `{a,"b c",NULL}` — one level (the engine's
    * token columns are 1-D), quotes + backslash escapes honored. */
  private def parsePgArray(s: String): Array[AnyRef] = {
    if (s == null) return null
    val body = s.stripPrefix("{").stripSuffix("}")
    if (body.isEmpty) return Array.empty
    val out = Array.newBuilder[AnyRef]
    val cur = new StringBuilder
    var i = 0
    var quoted = false
    var wasQuoted = false
    def flush(): Unit = {
      val v = cur.toString
      out += (if (!wasQuoted && v == "NULL") null else v)
      cur.clear(); wasQuoted = false
    }
    while (i < body.length) {
      val ch = body.charAt(i)
      if (quoted) ch match {
        case '\\' => cur.append(body.charAt(i + 1)); i += 1
        case '"' => quoted = false
        case c => cur.append(c)
      }
      else ch match {
        case '"' => quoted = true; wasQuoted = true
        case ',' => flush()
        case c => cur.append(c)
      }
      i += 1
    }
    flush()
    out.result()
  }

  private def col(arg: AnyRef): Int = arg match {
    case i: Integer => i.intValue()
    case s: String => byName.getOrElse(s.toLowerCase,
      throw new SQLException(s"no such column $s"))
    case other => throw new SQLException(s"bad column ref $other")
  }

  val asJdbc: ResultSet = PgProxy.make[ResultSet]("ResultSet") {
    case ("next", _) =>
      idx += 1
      java.lang.Boolean.valueOf(idx < res.rows.size)
    case ("close", _) => rsClosed = true; null
    case ("isClosed", _) => java.lang.Boolean.valueOf(rsClosed)
    case ("wasNull", _) => java.lang.Boolean.valueOf(nullFlag)
    case ("getString", Seq(c)) => raw(col(c))
    case ("getBoolean", Seq(c)) =>
      java.lang.Boolean.valueOf(num(col(c), false)(v => v == "t" || v == "true" || v == "1"))
    case ("getByte", Seq(c)) => java.lang.Byte.valueOf(num(col(c), 0.toByte)(_.toByte))
    case ("getShort", Seq(c)) => java.lang.Short.valueOf(num(col(c), 0.toShort)(_.toShort))
    case ("getInt", Seq(c)) => Integer.valueOf(num(col(c), 0)(_.toInt))
    case ("getLong", Seq(c)) => java.lang.Long.valueOf(num(col(c), 0L)(_.toLong))
    case ("getFloat", Seq(c)) => java.lang.Float.valueOf(num(col(c), 0f)(_.toFloat))
    case ("getDouble", Seq(c)) => java.lang.Double.valueOf(num(col(c), 0d)(_.toDouble))
    case ("getBigDecimal", Seq(c)) =>
      num[java.math.BigDecimal](col(c), null)(new java.math.BigDecimal(_))
    case ("getBytes", Seq(c)) => num[Array[Byte]](col(c), null)(parseBytea)
    case ("getDate", Seq(c)) => num[java.sql.Date](col(c), null)(java.sql.Date.valueOf)
    case ("getDate", Seq(c, _)) => num[java.sql.Date](col(c), null)(java.sql.Date.valueOf)
    case ("getTimestamp", Seq(c)) => num[java.sql.Timestamp](col(c), null)(parseTs)
    case ("getTimestamp", Seq(c, _)) => num[java.sql.Timestamp](col(c), null)(parseTs)
    case ("getObject", Seq(c)) => raw(col(c))
    case ("getArray", Seq(c)) =>
      val ci = col(c)
      val parsed = num[Array[AnyRef]](ci, null)(parsePgArray)
      if (parsed == null) null
      else {
        val elemName = PgWireJdbc.typeNameOf(res.columns(ci - 1).typeOid).stripPrefix("_")
        PgProxy.make[java.sql.Array]("Array") {
          case ("getBaseTypeName", _) => elemName
          case ("getArray", Seq()) => parsed
          case ("free", _) => null
        }
      }
    case ("findColumn", Seq(s: String)) => Integer.valueOf(col(s))
    case ("getMetaData", _) => metaData
    case ("getFetchSize", _) => Integer.valueOf(0)
    case ("setFetchSize", _) => null
    case ("getWarnings", _) => null
    case ("clearWarnings", _) => null
    case ("getType", _) => Integer.valueOf(ResultSet.TYPE_FORWARD_ONLY)
    case ("getConcurrency", _) => Integer.valueOf(ResultSet.CONCUR_READ_ONLY)
  }

  private lazy val metaData: ResultSetMetaData = {
    def c(i: AnyRef): PgColumn = res.columns(i.asInstanceOf[Integer] - 1)
    PgProxy.make[ResultSetMetaData]("ResultSetMetaData") {
      case ("getColumnCount", _) => Integer.valueOf(res.columns.size)
      case ("getColumnLabel", Seq(i)) => c(i).name
      case ("getColumnName", Seq(i)) => c(i).name
      case ("getColumnType", Seq(i)) => Integer.valueOf(PgWireJdbc.sqlTypeOf(c(i).typeOid))
      case ("getColumnTypeName", Seq(i)) => PgWireJdbc.typeNameOf(c(i).typeOid)
      case ("getPrecision", Seq(i)) =>
        val pc = c(i)
        Integer.valueOf(pc.typeOid match {
          case 1700 if pc.typeMod >= 4 => ((pc.typeMod - 4) >> 16) & 0xffff
          case 1042 | 1043 if pc.typeMod >= 4 => pc.typeMod - 4
          case _ => 0
        })
      case ("getScale", Seq(i)) =>
        val pc = c(i)
        Integer.valueOf(pc.typeOid match {
          case 1700 if pc.typeMod >= 4 => (pc.typeMod - 4) & 0xffff
          case _ => 0
        })
      case ("isSigned", Seq(i)) =>
        java.lang.Boolean.valueOf(Set(20, 21, 23, 700, 701, 1700, 26).contains(c(i).typeOid))
      case ("isNullable", Seq(_)) => Integer.valueOf(ResultSetMetaData.columnNullable)
      case ("isAutoIncrement", Seq(_)) => java.lang.Boolean.FALSE
      case ("isCaseSensitive", Seq(_)) => java.lang.Boolean.TRUE
      case ("isCurrency", Seq(_)) => java.lang.Boolean.FALSE
      case ("getColumnDisplaySize", Seq(_)) => Integer.valueOf(0)
      case ("getCatalogName", Seq(_)) => ""
      case ("getSchemaName", Seq(_)) => ""
      case ("getTableName", Seq(_)) => ""
      case ("getColumnClassName", Seq(i)) => "java.lang.String"
    }
  }
}
