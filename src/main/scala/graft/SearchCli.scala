package graft

import org.apache.spark.sql.functions._

/** The reference's Adminer ad-hoc search (EP4) as a CLI:
  *
  * {{{ sbt "runMain graft.SearchCli /root/testdata/sf0.001 merges joining" }}}
  * {{{ sbt "runMain graft.SearchCli /root/testdata/sf0.001 merge & !(window | join) | vec:*" }}}
  * {{{ sbt "runMain graft.SearchCli /root/testdata/sf0.001 merge -window or \"hash join\"" }}}
  *
  * Bare terms are an AND query; any to_tsquery operator (`& | ! ( ) :*`)
  * switches to the full syntax (`graft.text.TsQuery`) — but only when the
  * input parses as one, so prose like `re: merger` degrades to a term
  * search instead of a lexer error; websearch markers (`-term`, quoted
  * phrases, the word `or`) without tsquery operators switch to
  * `websearch_to_tsquery` semantics. Only queries containing an actual
  * phrase/distance node pay the positional posting build. Mirrors
  * `SELECT ... WHERE token @@ to_tsquery('...')`.
  */
object SearchCli {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: SearchCli <sfDir> <term-or-tsquery> [more ...]")
    val dir = args.head
    val raw = args.tail.mkString(" ")
    // dialect detection must never crash on prose: operator characters
    // only select the tsquery dialect when the input actually PARSES as
    // one ("re: merger" has a ':' but is not a tsquery); anything
    // unparsable falls back to an AND of its alphanumeric terms
    val tsAst = if (raw.exists("&|!():*<".contains(_)))
      scala.util.Try(text.TsQuery.parse(raw)).toOption else None
    val wantsWebsearch = tsAst.isEmpty && (raw.contains("\"") || raw.contains("-") ||
      args.tail.exists(_.equalsIgnoreCase("or")))
    val webAst = if (wantsWebsearch)
      scala.util.Try(text.TsQuery.parseWebsearch(raw)).toOption else None
    // bare term lists (and unparsable input) become an AND of their terms —
    // which IS a tsquery once joined with &
    lazy val fallback = args.tail
      .flatMap(_.toLowerCase.split("[^a-z0-9]+")).filter(_.nonEmpty)
      .mkString(" & ")
    val query = if (tsAst.isDefined || webAst.isDefined) raw else fallback
    require(query.nonEmpty, s"no searchable terms in: $raw")
    val spark = GraftSession.local(Runtime.getRuntime.availableProcessors())
    import spark.implicits._
    val docs = io.Tables.documents(spark, dir)
      .select($"doc_id", $"text", text.TextOps.tokenize($"text").as("tokens"))
    // ONLY phrase/distance nodes need positions: route through the
    // positional posting table just for those; phrase-free queries (either
    // dialect) use the cheaper codegen'd array predicate in one scan
    val needsPositional =
      tsAst.exists(text.TsQuery.hasPhrase) || webAst.exists(text.TsQuery.hasPhrase)
    val matched =
      if (needsPositional) {
        val postings = text.PostingIndex.buildPositional(docs, "doc_id", $"text")
        val ids =
          if (webAst.isDefined)
            text.PostingIndex.searchWebsearch(postings, "doc_id", query, docs.select($"doc_id"))
          else
            text.PostingIndex.searchQuery(postings, "doc_id", query, docs.select($"doc_id"))
        docs.join(ids, Seq("doc_id"), "left_semi")
      } else if (webAst.isDefined)
        docs.filter(text.TextOps.tsMatchWebsearch($"tokens", query))
      else docs.filter(text.TextOps.tsMatchQuery($"tokens", query))
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
