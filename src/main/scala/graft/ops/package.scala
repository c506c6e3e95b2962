package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.types.{DecimalType, DoubleType}

package object ops {
  /** Shape of every catalog query: (session, scale-factor dir) => result. */
  type Q = (SparkSession, String) => DataFrame

  /** Exact-arithmetic bridge for oracle hash-matching: testdata monetary
    * columns are exact 2-decimal doubles, so summing after a decimal(18,2)
    * cast is associative/exact; the final cast back to double is then a
    * deterministic round-to-nearest on BOTH engines (Spark and DuckDB),
    * making float aggregates bit-stable regardless of row order. */
  def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Final projection of an exact decimal aggregate back to double. */
  def money(c: Column): Column = c.cast(DoubleType)
}
