package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.ext.Dedup
import graft.text.{Porter, TextOps}

/** SQL-surface registration (EP4 parity: `spark.sql` over registered tables
  * + engine functions — SURVEY §3 EP4). Idempotent per session.
  *
  * Column-level transforms (which compile to built-in expression trees, no
  * UDF boundary) are exposed to SQL by unwrapping the Column they build —
  * so `graft_sanitize(text)` in SQL runs the exact same codegen'd plan as
  * `TextOps.sanitizeText($"text")` in Scala.
  */
object Functions {

  private def colFn(f: Column => Column): Seq[Expression] => Expression =
    exprs => ColumnBridge.unwrap(f(ColumnBridge.wrap(exprs.head)))

  /** Second-argument string literal of a two-arg SQL function, with usable
    * errors: wrong arity and non-foldable arguments would otherwise die in
    * `exprs(1)` / `eval()` as IndexOutOfBounds/UnsupportedOperation with no
    * mention of the function. Shared by the temp-function and
    * SparkSessionExtensions registrations. */
  private[graft] def literalArg2(fn: String, exprs: Seq[Expression], what: String): String = {
    require(exprs.length == 2,
      s"$fn expects 2 arguments (tokens, $what), got ${exprs.length}")
    require(exprs(1).foldable,
      s"$fn: the $what must be a string literal — it is parsed at plan time")
    val v = exprs(1).eval()
    require(v != null, s"$fn: the $what literal must not be null")
    v.toString
  }

  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_nfkd", exprs => NfkdNormalize(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_sanitize", colFn(TextOps.sanitizeText), "scala_udf")
    reg.createOrReplaceTempFunction("graft_sanitize_filing", colFn(TextOps.sanitizeFiling), "scala_udf")
    reg.createOrReplaceTempFunction("graft_tokenize", colFn(TextOps.tokenize), "scala_udf")
    reg.createOrReplaceTempFunction("graft_tokenize_basic", colFn(TextOps.tokenizeBasic), "scala_udf")
    // graft_shingles(text[, k]) — k defaults to 3, literal when given
    reg.createOrReplaceTempFunction("graft_shingles", exprs => {
      val k = if (exprs.length > 1) exprs(1).eval().toString.toInt else 3
      WordShinglesExpr(exprs.head, k)
    }, "scala_udf")
    reg.createOrReplaceTempFunction("graft_simhash",
      colFn(c => Dedup.simhashMd5(TextOps.tokenizeBasic(c))), "scala_udf")
    // pg_trgm surface: show_trgm / similarity analogs (Trigram.scala)
    reg.createOrReplaceTempFunction("graft_trigrams",
      exprs => TrigramsExpr(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_trgm_similarity", exprs => {
      require(exprs.length == 2,
        s"graft_trgm_similarity expects 2 arguments (a, b), got ${exprs.length}")
      ColumnBridge.unwrap(graft.text.Trigram.similarity(
        ColumnBridge.wrap(exprs(0)), ColumnBridge.wrap(exprs(1))))
    }, "scala_udf")
    // graft_ts_match(tokens, 'space separated terms') — terms must be a
    // literal (they are stemmed at plan time, like to_tsquery parsing)
    reg.createOrReplaceTempFunction("graft_ts_match", exprs => {
      val terms = literalArg2("graft_ts_match", exprs, "terms")
        .split("\\s+").toSeq.filter(_.nonEmpty)
      ColumnBridge.unwrap(TextOps.tsMatchAll(ColumnBridge.wrap(exprs.head), terms))
    }, "scala_udf")
    // graft_ts_query(tokens, 'a & !(b | c) | d:*') — full to_tsquery
    // boolean syntax; the query must be a literal (parsed + stemmed at
    // plan time, like to_tsquery) and compiles to the same built-in
    // expression tree as TextOps.tsMatchQuery: no UDF boundary
    reg.createOrReplaceTempFunction("graft_ts_query", exprs => {
      val query = literalArg2("graft_ts_query", exprs, "query")
      ColumnBridge.unwrap(TextOps.tsMatchQuery(ColumnBridge.wrap(exprs.head), query))
    }, "scala_udf")
    // graft_websearch(tokens, 'merge -window or fast') — websearch_to_tsquery
    // dialect over the same compiled expression tree (phrases need positions
    // and are rejected, exactly like <-> in graft_ts_query)
    reg.createOrReplaceTempFunction("graft_websearch", exprs => {
      val query = literalArg2("graft_websearch", exprs, "query")
      ColumnBridge.unwrap(TextOps.tsMatchWebsearch(ColumnBridge.wrap(exprs.head), query))
    }, "scala_udf")
    // graft_plainto(tokens, 'The merges, joining!') — plainto_tsquery
    // dialect: words ANDed, stopwords/punctuation vanish; always
    // array-compilable (no phrases), same plan-time-literal rule
    reg.createOrReplaceTempFunction("graft_plainto", exprs => {
      val query = literalArg2("graft_plainto", exprs, "query")
      ColumnBridge.unwrap(TextOps.tsMatchPlainto(ColumnBridge.wrap(exprs.head), query))
    }, "scala_udf")
    reg.createOrReplaceTempFunction("graft_stem_array",
      exprs => PorterStemArrayExpr(exprs.head), "scala_udf")
    spark.udf.register("graft_stem", (s: String) => if (s == null) null else Porter.stem(s))
  }
}
