package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{NfkdNormalize, PorterStemArrayExpr, TrigramsExpr, WordShinglesExpr}

/** Spark-native packaging of the engine's Catalyst expressions: set
  *
  * {{{ spark.sql.extensions=graft.GraftExtensions }}}
  *
  * on any cluster (or `SparkSession.builder().withExtensions(new
  * GraftExtensions)`) and the native functions are available in every
  * session's SQL without per-session registration — the deployment story
  * for the SQL surface (`Functions.registerAll` remains the per-session
  * programmatic path and covers the composite Column-built functions).
  *
  * Only the true Catalyst expressions are injected here: injection happens
  * before any session state exists, so each builder must construct an
  * Expression directly.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    // Optimizer rule: graft_nfkd(graft_nfkd(c)) → graft_nfkd(c) — see
    // [[graft.plans.CollapseNfkd]] for the idempotence justification.
    ext.injectOptimizerRule(_ => graft.plans.CollapseNfkd)
    ext.injectFunction((
      FunctionIdentifier("graft_nfkd"),
      info("graft_nfkd", "graft_nfkd(str) - Unicode NFKD normalization"),
      (exprs: Seq[Expression]) => NfkdNormalize(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_shingles"),
      info("graft_shingles", "graft_shingles(str[, k]) - distinct word k-shingles (k defaults to 3)"),
      (exprs: Seq[Expression]) => {
        val k = if (exprs.length > 1) exprs(1).eval().toString.toInt else 3
        WordShinglesExpr(exprs.head, k)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_trigrams"),
      info("graft_trigrams", "graft_trigrams(str) - pg_trgm padded character trigram set"),
      (exprs: Seq[Expression]) => TrigramsExpr(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_stem_array"),
      info("graft_stem_array", "graft_stem_array(arr) - Porter-stem every array element"),
      (exprs: Seq[Expression]) => PorterStemArrayExpr(exprs.head)))
    // needs no session state either: the query literal is parsed at plan
    // time and compiles to a built-in expression tree over the token array
    ext.injectFunction((
      FunctionIdentifier("graft_ts_query"),
      info("graft_ts_query",
        "graft_ts_query(tokens, 'a & !(b | c) | d:*') - full to_tsquery boolean match"),
      (exprs: Seq[Expression]) => {
        val query = graft.functions.Functions.literalArg2("graft_ts_query", exprs, "query")
        org.apache.spark.sql.graftbridge.ColumnBridge.unwrap(
          graft.text.TextOps.tsMatchQuery(
            org.apache.spark.sql.graftbridge.ColumnBridge.wrap(exprs.head), query))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_plainto"),
      info("graft_plainto",
        "graft_plainto(tokens, 'The merges, joining!') - plainto_tsquery match"),
      (exprs: Seq[Expression]) => {
        val query = graft.functions.Functions.literalArg2("graft_plainto", exprs, "query")
        org.apache.spark.sql.graftbridge.ColumnBridge.unwrap(
          graft.text.TextOps.tsMatchPlainto(
            org.apache.spark.sql.graftbridge.ColumnBridge.wrap(exprs.head), query))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_websearch"),
      info("graft_websearch",
        "graft_websearch(tokens, 'merge -window or fast') - websearch_to_tsquery match"),
      (exprs: Seq[Expression]) => {
        val query = graft.functions.Functions.literalArg2("graft_websearch", exprs, "query")
        org.apache.spark.sql.graftbridge.ColumnBridge.unwrap(
          graft.text.TextOps.tsMatchWebsearch(
            org.apache.spark.sql.graftbridge.ColumnBridge.wrap(exprs.head), query))
      }))
  }
}
