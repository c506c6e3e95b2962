package graft.tools

/** Prints catalog sizes per module and flags any key collisions between
  * the module maps — the README count gate's debugging companion. */
object CatalogStats {
  def main(args: Array[String]): Unit = {
    val mods: Seq[(String, Set[String])] = Seq(
      "Relational" -> graft.ops.Relational.queries.keySet,
      "TextQueries" -> graft.ops.TextQueries.queries.keySet,
      "ExtQueries" -> graft.ops.ExtQueries.queries.keySet,
      "IoQueries" -> graft.ops.IoQueries.queries.keySet,
      "StreamQueries" -> graft.ops.StreamQueries.queries.keySet)
    mods.foreach { case (n, ks) => println(s"$n ${ks.size}") }
    println(s"SparkEntry ${graft.SparkEntry.queries.size}")
    println(s"oracle ${graft.SparkEntry.oracleSql.size}")
    for {
      i <- mods.indices; j <- mods.indices if i < j
      k <- mods(i)._2 intersect mods(j)._2
    } println(s"COLLISION $k in ${mods(i)._1} and ${mods(j)._1}")
    val orphans = graft.SparkEntry.oracleSql.keySet -- graft.SparkEntry.queries.keySet
    orphans.foreach(k => println(s"ORACLE-WITHOUT-QUERY $k"))
  }
}
