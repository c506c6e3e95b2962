package graft.io

import java.sql.{Connection, DriverManager, PreparedStatement, Types}
import java.util.Properties

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects}
import org.apache.spark.sql.types._

/** JDBC source/sink wrappers (SURVEY §2.1 S6/S7/S10).
  *
  * Reads push column pruning + predicates into the database (Catalyst JDBC
  * pushdown); writes batch at `batchsize` rows per INSERT exactly like the
  * reference's `to_sql(chunksize=...)` (`load_filings_idx.py:51`), with
  * `numPartitions` capping sink-side connections (the reference's
  * max_connections=400 concern).
  */
object Jdbc {

  // PostgreSQL URLs resolve through the in-repo wire-protocol driver when
  // no vendor jar is on the classpath (see PgWireDriver docs)
  pgwire.PgWireDriver.ensureRegistered()

  /** S6: table read with column pruning (prune via .select — pushed down). */
  def readTable(spark: SparkSession, url: String, table: String,
                props: Properties = new Properties()): DataFrame =
    spark.read.jdbc(url, table, props)

  /** S7: chunked append write. */
  def writeAppend(df: DataFrame, url: String, table: String,
                  batchSize: Int = 10000, numPartitions: Int = 8): DataFrame = {
    df.coalesce(numPartitions)
      .write.mode(SaveMode.Append)
      .option("batchsize", batchSize)
      .jdbc(url, table, new Properties())
    df
  }

  /** S10: batched point-UPDATE by key — the trigger-free port of
    * `filings.update().where(filing_id==id)` (`scrape_all_filings.py:169-171`).
    * One prepared statement per partition, executeBatch per `batchSize` —
    * distributed, idempotent (same update re-applied is a no-op).
    *
    * Identifier quoting and value binding go through Spark's own
    * `JdbcDialect` for the url (overridable via `dialect`), so the statement
    * agrees with whatever `df.write.jdbc` produced on the same connection:
    * columns are dialect-quoted; the table name is passed through verbatim
    * exactly like Spark's writer (callers quote it themselves if they created
    * a case-sensitive name), or dialect-quoted with `quoteTable = true`.
    * Values bind through type-directed setters derived from the DataFrame
    * schema (dates/timestamps/decimals/arrays included) instead of relying
    * on driver-specific `setObject` coercion.
    */
  def updateByKey(df: DataFrame, url: String, table: String,
                  keyCol: String, valueCols: Seq[String],
                  batchSize: Int = 1000,
                  quoteTable: Boolean = false,
                  dialect: JdbcDialect = null): Unit = {
    val dl = Option(dialect).getOrElse(JdbcDialects.get(url))
    val tableRef = if (quoteTable) dl.quoteIdentifier(table) else table
    val sets = valueCols.map(c => s"${dl.quoteIdentifier(c)} = ?").mkString(", ")
    val sql = s"UPDATE $tableRef SET $sets WHERE ${dl.quoteIdentifier(keyCol)} = ?"
    val cols = valueCols :+ keyCol
    val projected = df.selectExpr(cols.map(dialectFree): _*)
    val types = projected.schema.fields.map(_.dataType)
    projected.foreachPartition { (rows: Iterator[Row]) =>
      val conn = DriverManager.getConnection(url)
      try {
        val st = conn.prepareStatement(sql)
        var n = 0
        rows.foreach { r =>
          types.zipWithIndex.foreach { case (dt, i) => bind(conn, st, i + 1, dt, r) }
          st.addBatch()
          n += 1
          if (n % batchSize == 0) st.executeBatch()
        }
        st.executeBatch()
        st.close()
      } finally conn.close()
    }
  }

  /** S10+: idempotent UPSERT by key — the `INSERT ... ON CONFLICT (key) DO
    * UPDATE` path of the reference's Postgres deployment
    * (`init_tables.py:20-22` declares the Postgres store; BASELINE's
    * approach line is "Spark + JDBC write to PostgreSQL"), behind the same
    * dialect hook as [[updateByKey]]. On PostgreSQL URLs the statement is
    * the native single-round-trip ON CONFLICT form ([[pgUpsertSql]] — pure,
    * so the SQL is spec-asserted without a live server); on databases
    * without it (the embedded Derby used in tests) a portable
    * UPDATE-then-INSERT fallback preserves the semantics: batch the
    * UPDATEs, read per-row update counts, INSERT exactly the rows that
    * matched nothing. Re-running a batch is a no-op either way.
    *
    * Rows must be unique per key within the frame (dedupe upstream — same
    * contract as Delta MERGE); the fallback additionally requires a driver
    * that reports real per-row update counts (Derby and Postgres do). A
    * driver returning SUCCESS_NO_INFO would silently DROP unmatched rows
    * (they'd look updated and never insert), so the fallback throws on it
    * instead. */
  def upsertByKey(df: DataFrame, url: String, table: String,
                  keyCol: String, valueCols: Seq[String],
                  batchSize: Int = 1000,
                  quoteTable: Boolean = false,
                  dialect: JdbcDialect = null): Unit = {
    val dl = Option(dialect).getOrElse(JdbcDialects.get(url))
    val tableRef = if (quoteTable) dl.quoteIdentifier(table) else table
    val cols = keyCol +: valueCols
    val projected = df.selectExpr(cols.map(dialectFree): _*)
    val types = projected.schema.fields.map(_.dataType)
    if (url.startsWith("jdbc:postgresql")) {
      val sql = pgUpsertSql(tableRef, keyCol, valueCols, dl)
      projected.foreachPartition { (rows: Iterator[Row]) =>
        val conn = DriverManager.getConnection(url)
        try {
          val st = conn.prepareStatement(sql)
          var n = 0
          rows.foreach { r =>
            types.zipWithIndex.foreach { case (dt, i) => bindAt(conn, st, i + 1, i, dt, r) }
            st.addBatch()
            n += 1
            if (n % batchSize == 0) st.executeBatch()
          }
          st.executeBatch()
          st.close()
        } finally conn.close()
      }
    } else {
      val sets = valueCols.map(c => s"${dl.quoteIdentifier(c)} = ?").mkString(", ")
      val updSql = s"UPDATE $tableRef SET $sets WHERE ${dl.quoteIdentifier(keyCol)} = ?"
      val insSql = s"INSERT INTO $tableRef (${cols.map(dl.quoteIdentifier).mkString(", ")}) " +
        s"VALUES (${cols.map(_ => "?").mkString(", ")})"
      projected.foreachPartition { (rows: Iterator[Row]) =>
        val conn = DriverManager.getConnection(url)
        try {
          val upd = conn.prepareStatement(updSql)
          val ins = conn.prepareStatement(insSql)
          val buf = new scala.collection.mutable.ArrayBuffer[Row](batchSize)
          def flush(): Unit = if (buf.nonEmpty) {
            buf.foreach { r =>
              // UPDATE params: values first, key last; projected row is (key, values...)
              valueCols.indices.foreach { j =>
                bindAt(conn, upd, j + 1, j + 1, types(j + 1), r)
              }
              bindAt(conn, upd, valueCols.size + 1, 0, types(0), r)
              upd.addBatch()
            }
            val counts = upd.executeBatch()
            var misses = 0
            counts.zipWithIndex.foreach { case (c, k) =>
              if (c == java.sql.Statement.SUCCESS_NO_INFO)
                throw new IllegalStateException(
                  "upsertByKey fallback needs real per-row update counts; " +
                    "this driver returned SUCCESS_NO_INFO — unmatched rows " +
                    "would be silently dropped. Use a database with native " +
                    "upsert or a driver that reports counts.")
              if (c == 0) {
                val r = buf(k)
                types.zipWithIndex.foreach { case (dt, i) => bindAt(conn, ins, i + 1, i, dt, r) }
                ins.addBatch()
                misses += 1
              }
            }
            if (misses > 0) ins.executeBatch()
            buf.clear()
          }
          rows.foreach { r => buf += r; if (buf.size >= batchSize) flush() }
          flush()
          upd.close(); ins.close()
        } finally conn.close()
      }
    }
  }

  /** The native Postgres upsert statement — pure, unit-testable without a
    * live server: `INSERT ... ON CONFLICT (key) DO UPDATE SET c = EXCLUDED.c`. */
  def pgUpsertSql(tableRef: String, keyCol: String, valueCols: Seq[String],
                  dl: JdbcDialect): String = {
    val cols = keyCol +: valueCols
    s"INSERT INTO $tableRef (${cols.map(dl.quoteIdentifier).mkString(", ")}) " +
      s"VALUES (${cols.map(_ => "?").mkString(", ")}) " +
      s"ON CONFLICT (${dl.quoteIdentifier(keyCol)}) DO UPDATE SET " +
      valueCols.map(c => s"${dl.quoteIdentifier(c)} = EXCLUDED.${dl.quoteIdentifier(c)}")
        .mkString(", ")
  }

  /** Column names reach selectExpr as quoted identifiers so reserved words
    * ("order", "group") survive as plain column references. */
  private def dialectFree(c: String): String = s"`${c.replace("`", "``")}`"

  /** Type-directed JDBC bind — the subset of Spark's writer setters the
    * engine's tables need, driven by the DataFrame schema rather than
    * runtime-class sniffing in setObject. Statement position == row index+1
    * (the updateByKey layout); [[bindAt]] is the general form. */
  private def bind(conn: Connection, st: PreparedStatement, pos: Int,
                   dt: DataType, r: Row): Unit =
    bindAt(conn, st, pos, pos - 1, dt, r)

  /** [[bind]] with independent statement position and row index. */
  private def bindAt(conn: Connection, st: PreparedStatement, pos: Int,
                     i: Int, dt: DataType, r: Row): Unit = {
    if (r.isNullAt(i)) { st.setNull(pos, sqlType(dt)); return }
    dt match {
      case IntegerType    => st.setInt(pos, r.getInt(i))
      case LongType       => st.setLong(pos, r.getLong(i))
      case ShortType      => st.setShort(pos, r.getShort(i))
      case ByteType       => st.setByte(pos, r.getByte(i))
      case DoubleType     => st.setDouble(pos, r.getDouble(i))
      case FloatType      => st.setFloat(pos, r.getFloat(i))
      case BooleanType    => st.setBoolean(pos, r.getBoolean(i))
      case StringType     => st.setString(pos, r.getString(i))
      case BinaryType     => st.setBytes(pos, r.getAs[Array[Byte]](i))
      case DateType       => st.setDate(pos, r.getAs[java.sql.Date](i))
      case TimestampType  => st.setTimestamp(pos, r.getAs[java.sql.Timestamp](i))
      case _: DecimalType => st.setBigDecimal(pos, r.getAs[java.math.BigDecimal](i))
      case ArrayType(et, _) =>
        val arr = conn.createArrayOf(arrayBaseTypeName(et),
          r.getSeq[Any](i).map(_.asInstanceOf[AnyRef]).toArray)
        st.setArray(pos, arr)
      case other =>
        throw new IllegalArgumentException(s"updateByKey: unsupported type $other")
    }
  }

  private def sqlType(dt: DataType): Int = dt match {
    case IntegerType    => Types.INTEGER
    case LongType       => Types.BIGINT
    case ShortType      => Types.SMALLINT
    case ByteType       => Types.TINYINT
    case DoubleType     => Types.DOUBLE
    case FloatType      => Types.FLOAT
    case BooleanType    => Types.BOOLEAN
    case StringType     => Types.VARCHAR
    case BinaryType     => Types.BINARY
    case DateType       => Types.DATE
    case TimestampType  => Types.TIMESTAMP
    case _: DecimalType => Types.DECIMAL
    case _: ArrayType   => Types.ARRAY
    case _              => Types.OTHER
  }

  private def arrayBaseTypeName(et: DataType): String = et match {
    case IntegerType   => "integer"
    case LongType      => "bigint"
    case DoubleType    => "double"
    case FloatType     => "real"
    case BooleanType   => "boolean"
    case StringType    => "varchar"
    case DateType      => "date"
    case TimestampType => "timestamp"
    case other =>
      throw new IllegalArgumentException(s"updateByKey: unsupported array of $other")
  }
}
