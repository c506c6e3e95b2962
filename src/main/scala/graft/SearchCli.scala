package graft

import org.apache.spark.sql.functions._

/** The reference's Adminer ad-hoc search (EP4) as a CLI:
  *
  * {{{ sbt "runMain graft.SearchCli /root/testdata/sf0.001 merges joining" }}}
  * {{{ sbt "runMain graft.SearchCli /root/testdata/sf0.001 merge & !(window | join) | vec:*" }}}
  * {{{ sbt "runMain graft.SearchCli /root/testdata/sf0.001 merge -window or \"hash join\"" }}}
  * {{{ sbt "runMain graft.SearchCli /root/testdata/sf0.001 --dialect=phraseto hash join" }}}
  *
  * Bare terms are an AND query; any to_tsquery operator (`& | ! ( ) :*`)
  * switches to the full syntax (`graft.text.TsQuery`) — but only when the
  * input parses as one, so prose like `re: merger` degrades to a term
  * search instead of a lexer error; websearch markers (`-term`, quoted
  * phrases, the word `or`) without tsquery operators switch to
  * `websearch_to_tsquery` semantics. An explicit
  * `--dialect=tsquery|websearch|plainto|phraseto` overrides detection
  * (plainto/phraseto have no distinguishing syntax, so they are
  * flag-only). Only queries containing an actual phrase/distance node pay
  * the positional posting build. Mirrors
  * `SELECT ... WHERE token @@ to_tsquery('...')`.
  */
object SearchCli {
  private val Dialects = Set("auto", "tsquery", "websearch", "plainto", "phraseto")

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: SearchCli <sfDir> [--dialect=D] <term-or-tsquery> [more ...]")
    val dir = args.head
    val (dialect, queryArgs) = args.tail.headOption match {
      case Some(f) if f.startsWith("--dialect=") =>
        val d = f.stripPrefix("--dialect=").toLowerCase
        require(Dialects.contains(d),
          s"unknown dialect <$d>: expected ${Dialects.toSeq.sorted.mkString("|")}")
        (d, args.drop(2))
      case _ => ("auto", args.tail)
    }
    require(queryArgs.nonEmpty, "no query given")
    val raw = queryArgs.mkString(" ")
    if (dialect == "plainto" || dialect == "phraseto") { runFixed(dir, dialect, raw); return }
    // dialect detection must never crash on prose: operator characters
    // only select the tsquery dialect when the input actually PARSES as
    // one ("re: merger" has a ':' but is not a tsquery); anything
    // unparsable falls back to an AND of its alphanumeric terms. An
    // explicit --dialect skips detection (and strict-parses, surfacing
    // syntax errors instead of degrading).
    val tsAst =
      if (dialect == "tsquery") Some(text.TsQuery.parse(raw))
      else if (dialect == "auto" && raw.exists("&|!():*<".contains(_)))
        scala.util.Try(text.TsQuery.parse(raw)).toOption
      else None
    val wantsWebsearch = dialect == "websearch" ||
      (dialect == "auto" && tsAst.isEmpty && (raw.contains("\"") || raw.contains("-") ||
        queryArgs.exists(_.equalsIgnoreCase("or"))))
    val webAst = if (wantsWebsearch) {
      if (dialect == "websearch") Some(text.TsQuery.parseWebsearch(raw))
      else scala.util.Try(text.TsQuery.parseWebsearch(raw)).toOption
    } else None
    // bare term lists (and unparsable input) become an AND of their terms —
    // which IS a tsquery once joined with &
    lazy val fallback = queryArgs
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

  /** The flag-only dialects: plainto (array predicate, one scan) and
    * phraseto (whole input = one phrase, positional postings). */
  private def runFixed(dir: String, dialect: String, raw: String): Unit = {
    val spark = GraftSession.local(Runtime.getRuntime.availableProcessors())
    import spark.implicits._
    val docs = io.Tables.documents(spark, dir)
      .select($"doc_id", $"text", text.TextOps.tokenize($"text").as("tokens"))
    val matched =
      if (dialect == "plainto") docs.filter(text.TextOps.tsMatchPlainto($"tokens", raw))
      else {
        val postings = text.PostingIndex.buildPositional(docs, "doc_id", $"text")
        val ids = text.PostingIndex.searchPhraseto(postings, "doc_id", raw, docs.select($"doc_id"))
        docs.join(ids, Seq("doc_id"), "left_semi")
      }
    val hits = matched
      .select($"doc_id", substring($"text", 1, 80).as("snippet"))
      .orderBy($"doc_id")
    val total = hits.count()
    println(s"$dialect: $raw -> $total docs")
    hits.limit(20).collect()
      .foreach(r => println(f"${r.getLong(0)}%8d  ${r.getString(1)}"))
    spark.stop()
  }
}
