package graft.tools

import java.nio.file.{Files, Paths}

/** Dump SparkEntry.oracleSql as JSON WITHOUT running any queries (no Spark
  * session at all — the map is static).  Feeds tools/lint_oracle_types.py,
  * the precommit oracle-type lint born of round 9's lesson: DuckDB's
  * integer sum() returns HUGEINT, and any final expression left uncast
  * degrades to float64 on the driver's pandas path, hash-mismatching a
  * value-identical result.  The lint plans (never executes) every oracle
  * and fails on HUGEINT output columns, so that class of bug cannot ship.
  *
  * Usage: runMain graft.tools.DumpOracles <outFile.json>
  */
object DumpOracles {
  def main(args: Array[String]): Unit = {
    val outFile = args.headOption.getOrElse("/tmp/oracle_sql.json")
    // Same escaping rules as Verify: backslash, quote, all control chars.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = graft.SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(outFile), json)
    println(s"[dump-oracles] ${graft.SparkEntry.oracleSql.size} oracle" +
      s" statements -> $outFile")
  }
}
