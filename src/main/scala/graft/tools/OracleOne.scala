package graft.tools

/** Print one catalog query's oracle SQL (fully interpolated) to stdout —
  * the missing half of the RunOne fast loop: pipe it straight into DuckDB
  * instead of re-running the whole Verify dump for one query.
  *
  * Usage: sbt "runMain graft.tools.OracleOne q133_ts_rewrite"
  */
object OracleOne {
  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: OracleOne <queryName>")
    val name = args.head
    graft.SparkEntry.oracleSql.get(name) match {
      case Some(sql) => println("-----8<-----"); println(sql); println("----->8-----")
      case None =>
        Console.err.println(s"no oracle for <$name>; known: " +
          graft.SparkEntry.oracleSql.keys.toSeq.sorted.mkString(", "))
        sys.exit(1)
    }
  }
}
