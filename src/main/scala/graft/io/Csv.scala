package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** CSV / EDGAR-index sources (SURVEY §2.1 S1-S3).
  *
  * The EDGAR reader is deliberately NOT "skip 9 lines": positional skipping
  * is a driver-side, single-file idea. Instead data rows are recognized by
  * predicate (numeric CIK + pipe count), which distributes over any number
  * of files/partitions unchanged — the faithful port of
  * `load_filings_idx.py:39-42` (skiprows=9 + drop(labels=[0])) whose intent
  * is "keep only the pipe-delimited data rows".
  */
object Csv {

  /** S1/S2: plain CSV with header + explicit schema. Spark handles the
    * UTF-8 BOM in the first header cell natively (univocity parser). */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("header", "true")
      .option("encoding", "UTF-8")
      .schema(schema)
      .csv(path)

  /** S1 robustness: PERMISSIVE read that captures malformed rows in a
    * `_corrupt_record` column instead of failing the job — the 100 TB
    * posture (a crawl batch with a few broken lines must not kill the
    * ingest; quarantine and continue).
    *
    * NOTE: Spark refuses queries that reference ONLY the corrupt-record
    * column of a raw CSV scan — use [[quarantine]] (which caches first, the
    * supported pattern) rather than filtering this frame directly. */
  def readCsvPermissive(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(schema.add("_corrupt_record", "string"))
      .csv(path)

  /** Split a permissive read into (good rows, quarantined raw lines).
    * Caches the scan — required by Spark before corrupt-record-only
    * filters, and it's read twice anyway. Long-lived callers should
    * `df.unpersist()` the frame THEY passed in once both sides are
    * consumed (the cache is on that frame), or clear the session cache
    * periodically. */
  def quarantine(df: DataFrame): (DataFrame, DataFrame) = {
    val cached = df.cache()
    (cached.filter(col("_corrupt_record").isNull).drop("_corrupt_record"),
      cached.filter(col("_corrupt_record").isNotNull).select("_corrupt_record"))
  }

  /** S3: EDGAR master.idx — pipe-delimited with a 9-line preamble, a
    * `CIK|Company Name|...` header and a dashed separator row. Returns
    * columns (cik, business_name, type, date, path) with `date` parsed.
    * Non-data lines are dropped by predicate: a data row starts with a
    * numeric CIK followed by a pipe. */
  def readEdgarIdx(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    parseIdxLines(spark.read.textFile(path).toDF("value"))
  }

  /** S3 from fetched bodies: the same predicate-recognized parse as
    * [[readEdgarIdx]], applied to whole master.idx files fetched in-cluster
    * (one row per quarter file, e.g. the output of
    * [[Fetch.fetchStage]]) — explode lines, keep data rows, from_csv. */
  def parseEdgarIdxBody(df: DataFrame, bodyCol: org.apache.spark.sql.Column): DataFrame =
    parseIdxLines(df.select(explode(split(bodyCol, "\r?\n")).as("value")))

  /** The shared line→row parse: data rows recognized by predicate. */
  private def parseIdxLines(lines: DataFrame): DataFrame =
    lines
      .filter(col("value").rlike("^[0-9]+\\|"))
      .select(from_csv(col("value"),
        StructType.fromDDL(
          "cik LONG, business_name STRING, type STRING, date_str STRING, path STRING"),
        Map("sep" -> "|")).as("r"))
      .select(
        col("r.cik"), col("r.business_name"), col("r.type"),
        to_date(col("r.date_str"), "yyyy-MM-dd").as("date"), col("r.path"))
}
