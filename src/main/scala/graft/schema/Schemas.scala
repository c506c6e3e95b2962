package graft.schema

import org.apache.spark.sql.types._

import java.sql.Date

/** Normative schemas for the sec_dl star schema (SURVEY.md §1.3; reference
  * `sec_dl/utils/init_tables.py:31-50`). Keys widened to Long for 100 TB
  * headroom; `token` is the faithful Spark analog of Postgres TSVECTOR
  * (sorted, deduped lexemes — positions dropped, see SURVEY §2.7 F1).
  */
object Schemas {

  val companies: StructType = StructType(Seq(
    StructField("permno", LongType, nullable = false),
    StructField("ticker", StringType, nullable = false),
    StructField("cik", LongType, nullable = true), // nullable: init_tables.py:34
    StructField("business_name", StringType, nullable = false)))

  val filingTypes: StructType = StructType(Seq(
    StructField("type_id", LongType, nullable = false),
    StructField("type", StringType, nullable = false),
    StructField("keep", IntegerType, nullable = false)))

  val filings: StructType = StructType(Seq(
    // md5(path) hex — 128-bit content-stable id (Pipeline.indexLoad)
    StructField("filing_id", StringType, nullable = false),
    StructField("cik", LongType, nullable = false),
    StructField("business_name", StringType, nullable = true),
    StructField("type", StringType, nullable = true),
    StructField("path", StringType, nullable = true),
    StructField("date", DateType, nullable = true),
    StructField("text", StringType, nullable = true),   // null until scraped
    StructField("token", ArrayType(StringType), nullable = true)))

  /** EDGAR master.idx row shape after parse+rename
    * (`load_filings_idx.py:40-42`). */
  val idxRecords: StructType = StructType(Seq(
    StructField("cik", LongType, nullable = true),
    StructField("business_name", StringType, nullable = true),
    StructField("type", StringType, nullable = true),
    StructField("date", StringType, nullable = true), // parsed to DateType at sink
    StructField("path", StringType, nullable = true)))
}

case class Company(permno: Long, ticker: String, cik: Option[Long], business_name: String)
case class FilingType(type_id: Long, `type`: String, keep: Int)
case class Filing(filing_id: String, cik: Long, business_name: Option[String],
                  `type`: Option[String], path: Option[String], date: Option[Date],
                  text: Option[String], token: Option[Seq[String]])
