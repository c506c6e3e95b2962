package graft

import org.apache.spark.sql.functions._

/** The reference's Adminer ad-hoc search (EP4) as a CLI:
  *
  * {{{ sbt "runMain graft.SearchCli /root/testdata/sf0.001 merges joining" }}}
  * {{{ sbt "runMain graft.SearchCli /root/testdata/sf0.001 merge & !(window | join) | vec:*" }}}
  * {{{ sbt "runMain graft.SearchCli /root/testdata/sf0.001 merge -window or \"hash join\"" }}}
  *
  * Bare terms are an AND query; any to_tsquery operator (`& | ! ( ) :*`)
  * switches to the full syntax (`graft.text.TsQuery`); websearch markers
  * (`-term`, quoted phrases, the word `or`) without tsquery operators
  * switch to `websearch_to_tsquery` semantics. Mirrors
  * `SELECT ... WHERE token @@ to_tsquery('...')`.
  */
object SearchCli {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: SearchCli <sfDir> <term-or-tsquery> [more ...]")
    val dir = args.head
    val raw = args.tail.mkString(" ")
    val isTsQuery = raw.exists("&|!():*<".contains(_))
    val isWebsearch = !isTsQuery && (raw.contains("\"") || raw.contains("-") ||
      args.tail.exists(_.equalsIgnoreCase("or")))
    // bare term lists stay an AND — which IS a tsquery once joined with &
    val query = if (isTsQuery || isWebsearch) raw else args.tail.mkString(" & ")
    val spark = GraftSession.local(Runtime.getRuntime.availableProcessors())
    import spark.implicits._
    val docs = io.Tables.documents(spark, dir)
      .select($"doc_id", $"text", text.TextOps.tokenize($"text").as("tokens"))
    // phrase/distance operators need positions: route through the positional
    // posting table; pure boolean queries use the cheaper array predicate
    val matched =
      if (isWebsearch || query.contains("<")) {
        val postings = text.PostingIndex.buildPositional(docs, "doc_id", $"text")
        val ids =
          if (isWebsearch)
            text.PostingIndex.searchWebsearch(postings, "doc_id", query, docs.select($"doc_id"))
          else
            text.PostingIndex.searchQuery(postings, "doc_id", query, docs.select($"doc_id"))
        docs.join(ids, Seq("doc_id"), "left_semi")
      } else docs.filter(text.TextOps.tsMatchQuery($"tokens", query))
    val hits = matched
      .select($"doc_id", substring($"text", 1, 80).as("snippet"))
      .orderBy($"doc_id")
    // count and head are separate jobs on purpose: collecting the full match
    // set to the driver before take(20) would OOM at corpus scale
    val total = hits.count()
    println(s"query: $query -> $total docs")
    hits.limit(20).collect()
      .foreach(r => println(f"${r.getLong(0)}%8d  ${r.getString(1)}"))
    spark.stop()
  }
}
