package graft

import org.apache.spark.sql.functions._

/** The reference's Adminer ad-hoc search (EP4) as a CLI:
  *
  * {{{ sbt "runMain graft.SearchCli /root/testdata/sf0.001 merges joining" }}}
  *
  * Tokenizes the corpus, runs the stemmed AND-query two ways — the array
  * predicate and the posting-table path — and prints matching doc ids with
  * a snippet. Mirrors `SELECT ... WHERE token @@ to_tsquery('a & b')`.
  */
object SearchCli {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: SearchCli <sfDir> <term> [term ...]")
    val (dir, terms) = (args.head, args.tail.toSeq)
    val spark = GraftSession.local(Runtime.getRuntime.availableProcessors())
    import spark.implicits._
    val docs = io.Tables.documents(spark, dir)
      .select($"doc_id", $"text", text.TextOps.tokenize($"text").as("tokens"))
    val hits = docs
      .filter(text.TextOps.tsMatchAll($"tokens", terms))
      .select($"doc_id", substring($"text", 1, 80).as("snippet"))
      .orderBy($"doc_id")
    // count and head are separate jobs on purpose: collecting the full match
    // set to the driver before take(20) would OOM at corpus scale
    val total = hits.count()
    println(s"query: ${terms.mkString(" & ")} -> $total docs")
    hits.limit(20).collect()
      .foreach(r => println(f"${r.getLong(0)}%8d  ${r.getString(1)}"))
    spark.stop()
  }
}
