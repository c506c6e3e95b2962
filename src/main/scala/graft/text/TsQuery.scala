package graft.text

/** Postgres `to_tsquery` syntax (the reference's search surface: the GIN
  * index + tsvector trigger of `sec_dl/utils/init_tables.py:56-67` is queried
  * with `token @@ to_tsquery(...)`, reference `README.md:6-7`): a boolean
  * query language over lexemes with
  *
  *   - `&` AND, `|` OR, `!` NOT, parenthesized grouping,
  *   - `<->` phrase (adjacent positions) and `<N>` distance (pos(b) =
  *     pos(a) + N exactly, Postgres FOLLOWED BY semantics),
  *   - `term:*` prefix match,
  *
  * with Postgres precedence (tightest first): `!`, `<->`/`<N>`, `&`, `|`.
  *
  * [[TsQuery.parse]] produces the AST; [[TsQuery.parseStemmed]] additionally
  * lowercases and Porter-stems every lexeme — the SAME normalization the
  * tokenize/index side applies (`TextOps.tokenize`), so a parsed query is
  * directly comparable against stored lexemes. Prefix lexemes are stemmed
  * too, matching `to_tsquery`'s dictionary normalization of prefix terms.
  *
  * Compilers over this AST:
  *  - `TextOps.tsMatchQuery` — boolean `Column` over a token array (corpus
  *    scan path; phrase unsupported there, positions are dropped),
  *  - `PostingIndex.searchQuery` / `searchQueryIndexed` — posting-table
  *    evaluation with semi/anti joins (index path; phrase supported over
  *    positional postings),
  *  - SQL function `graft_ts_query(tokens, 'a & !(b | c)')` (registered in
  *    `graft.functions.Functions`), which compiles the literal at plan time
  *    into the same built-in expression tree as `tsMatchQuery`.
  */
sealed trait TsQuery

object TsQuery {
  /** A single lexeme; `prefix` is the `term:*` form. */
  final case class Term(lexeme: String, prefix: Boolean = false) extends TsQuery
  /** `a <-> b <2> c`: lexemes at exact relative positions — `offsets(i)` is
    * lexeme i's position relative to the phrase head (offsets.head == 0;
    * `<->` contributes +1, `<N>` contributes +N). */
  final case class Phrase(lexemes: Seq[String], offsets: Seq[Int]) extends TsQuery {
    require(lexemes.length == offsets.length && offsets.headOption.contains(0),
      s"malformed phrase: $lexemes / $offsets")
  }
  final case class Not(q: TsQuery) extends TsQuery
  final case class And(qs: Seq[TsQuery]) extends TsQuery
  final case class Or(qs: Seq[TsQuery]) extends TsQuery

  /** Parse without normalizing lexemes (pure syntax). */
  def parse(input: String): TsQuery = {
    val p = new Parser(lex(input), input)
    val q = p.parseOr()
    p.expectEnd()
    q
  }

  /** Parse + lowercase + Porter-stem every lexeme — the form every compiler
    * consumes. Stemming here (not per compiler) keeps the three evaluation
    * paths drift-free by construction. */
  def parseStemmed(input: String): TsQuery = stemmed(parse(input))

  /** Postgres `websearch_to_tsquery`: the forgiving user-facing syntax.
    * Unquoted words are ANDed, `"..."` is a phrase, a `-` prefix negates
    * its word or phrase, the bare word `or` (any case) is OR at the lowest
    * precedence; there are no parentheses or explicit operators, and bare
    * punctuation is ignored rather than rejected. Every word — bare or
    * quoted — is split on the SAME `[^a-z0-9]+` delimiter the tokenizer
    * uses and has stopwords dropped, so query terms can only ever be
    * lexemes the index can actually hold: a bare stopword ("the")
    * vanishes instead of ANDing an unmatchable term, and a hyphenated
    * bare word ("state-of-the-art") becomes the same gap-preserving
    * phrase a quoted `"state of the art"` does rather than one glued
    * never-indexed token. Quoted phrases drop stopwords but KEEP their
    * positional gaps (`"merge the tables"` → `merge <2> tables`),
    * matching to_tsvector's numbering; a phrase reduced to one word
    * becomes a plain term, to zero words disappears. Returns a stemmed
    * AST evaluable by every compiler. */
  def parseWebsearch(input: String): TsQuery = {
    // None = an OR separator; Some(q) = one conjunct
    val toks = scala.collection.mutable.ArrayBuffer.empty[Option[TsQuery]]
    var i = 0
    while (i < input.length) {
      if (input(i).isWhitespace) i += 1
      else {
        val neg = input(i) == '-'
        if (neg) i += 1
        if (i < input.length && input(i) == '"') {
          val close = input.indexOf('"', i + 1)
          val body = if (close < 0) input.substring(i + 1) else input.substring(i + 1, close)
          i = if (close < 0) input.length else close + 1
          websearchPhrase(body).foreach(q => toks += Some(if (neg) Not(q) else q))
        } else {
          val start = i
          while (i < input.length && !input(i).isWhitespace && input(i) != '"') i += 1
          val raw = input.substring(start, i)
          val pieces = raw.toLowerCase(java.util.Locale.ROOT)
            .split("[^a-z0-9]+").filter(_.nonEmpty)
          if (pieces.isEmpty) ()                    // bare punctuation
          else if (!neg && pieces.sameElements(Array("or"))) toks += None
          else
            // tokenizer-identical split + stopword-with-gaps treatment,
            // exactly as if the word run had been quoted
            websearchPhrase(raw).foreach(q => toks += Some(if (neg) Not(q) else q))
        }
      }
    }
    val groups = toks.foldLeft(List(List.empty[TsQuery])) {
      case (acc, None)          => Nil :: acc
      case (g :: rest, Some(q)) => (q :: g) :: rest
      case (Nil, Some(q))       => List(List(q)) // unreachable: acc starts non-empty
    }.map(_.reverse).reverse
    val alts = groups.filter(_.nonEmpty)
      .map(g => if (g.length == 1) g.head else And(g))
    require(alts.nonEmpty, s"websearch: no searchable terms in <$input>")
    stemmed(if (alts.length == 1) alts.head else Or(alts))
  }

  /** Postgres `plainto_tsquery`: no operators at all — tokenize the input
    * exactly like to_tsvector (same `[^a-z0-9]+` delimiter, stopword drop,
    * Porter stem) and AND every surviving lexeme. The remaining member of
    * the to_tsquery parser family after to_tsquery (q99) and
    * websearch_to_tsquery (q110). */
  def parsePlainto(input: String): TsQuery = {
    val ws = input.toLowerCase(java.util.Locale.ROOT)
      .split("[^a-z0-9]+").filter(_.nonEmpty)
      .filterNot(TextOps.englishStopWords.contains)
    require(ws.nonEmpty, s"plainto: no searchable terms in <$input>")
    stemmed(if (ws.length == 1) Term(ws.head) else And(ws.toSeq.map(Term(_))))
  }

  /** Postgres `phraseto_tsquery`: the whole input as ONE gap-preserving
    * phrase — stopwords dropped AFTER position numbering exactly like a
    * quoted websearch phrase ("merge the tables" → `merge <2> tables`); a
    * single surviving word degrades to a plain term. Needs positional
    * postings to evaluate, like any `<->` query. */
  def parsePhraseto(input: String): TsQuery = {
    val q = websearchPhrase(input)
    require(q.nonEmpty, s"phraseto: no searchable terms in <$input>")
    stemmed(q.get)
  }

  /** Quoted-phrase body → AST node: to_tsvector word numbering, stopwords
    * removed AFTER numbering so their gaps survive as `<N>` distances. */
  private def websearchPhrase(body: String): Option[TsQuery] = {
    val ws = body.toLowerCase(java.util.Locale.ROOT)
      .split("[^a-z0-9]+").filter(_.nonEmpty)
    val kept = ws.zipWithIndex
      .filterNot { case (w, _) => TextOps.englishStopWords.contains(w) }
    kept.toSeq match {
      case Seq()         => None
      case Seq((w, _))   => Some(Term(w))
      case ks            => Some(Phrase(ks.map(_._1), ks.map(_._2 - ks.head._2)))
    }
  }

  private def stemmed(q: TsQuery): TsQuery = q match {
    case Term(l, p)      => Term(Porter.stem(l.toLowerCase), p)
    case Phrase(ls, off) => Phrase(ls.map(l => Porter.stem(l.toLowerCase)), off)
    case Not(x)          => Not(stemmed(x))
    case And(qs)         => And(qs.map(stemmed))
    case Or(qs)          => Or(qs.map(stemmed))
  }

  /** Postgres `ts_rewrite(query, target, substitute)` — query expansion
    * (the query-side synonym/thesaurus mechanism): every occurrence of
    * `target` inside `query` is replaced by `substitute`. Matching is
    * commutativity-aware for `&`/`|` exactly as Postgres's is: `b & a`
    * matches target `a & b`, and a target that is a SUBSET of a wider
    * conjunction/disjunction rewrites just that subset (`a & b & c` with
    * target `a & b` → `to & c`). Operates on stemmed ASTs (rewrite after
    * parseStemmed, like Postgres rewrites parsed tsqueries). */
  def rewrite(query: TsQuery, target: TsQuery, substitute: TsQuery): TsQuery = {
    def key(q: TsQuery): String = q match {
      case Term(l, p)      => s"t:$l:$p"
      case Phrase(ls, off) => s"p:${ls.mkString(",")}:${off.mkString(",")}"
      case Not(x)          => s"n:(${key(x)})"
      case And(qs)         => s"a:(${qs.map(key).sorted.mkString("&")})"
      case Or(qs)          => s"o:(${qs.map(key).sorted.mkString("|")})"
    }
    val targetKey = key(target)
    def targetParts(q: TsQuery): Option[Set[String]] = (q, target) match {
      case (And(_), And(ts)) => Some(ts.map(key).toSet)
      case (Or(_), Or(ts))   => Some(ts.map(key).toSet)
      case _                 => None
    }
    def go(q: TsQuery): TsQuery =
      if (key(q) == targetKey) substitute
      else q match {
        case Not(x) => Not(go(x))
        case And(qs) =>
          targetParts(q) match {
            // subset match inside a wider conjunction
            case Some(tks) if tks.subsetOf(qs.map(key).toSet) && tks.size < qs.length =>
              val rest = qs.filterNot(c => tks.contains(key(c))).map(go)
              And(substitute +: rest)
            case _ => And(qs.map(go))
          }
        case Or(qs) =>
          targetParts(q) match {
            case Some(tks) if tks.subsetOf(qs.map(key).toSet) && tks.size < qs.length =>
              val rest = qs.filterNot(c => tks.contains(key(c))).map(go)
              Or(substitute +: rest)
            case _ => Or(qs.map(go))
          }
        case leaf => leaf
      }
    go(query)
  }

  /** [[rewrite]] driven by a RULES TABLE (Postgres's
    * `ts_rewrite(query, 'SELECT target, substitute FROM aliases')` form):
    * rules apply in order, each to the result of the previous. */
  def rewriteAll(query: TsQuery, rules: Seq[(TsQuery, TsQuery)]): TsQuery =
    rules.foldLeft(query) { case (q, (t, s)) => rewrite(q, t, s) }

  /** Exact lexemes NOT under a negation — the terms a headline/snippet
    * should highlight (highlighting a `!term` would be nonsense). */
  def positiveLexemes(q: TsQuery): Seq[String] = q match {
    case Term(l, false) => Seq(l)
    case Term(_, true)  => Nil
    case Phrase(ls, _)  => ls
    case Not(_)         => Nil
    case And(qs)        => qs.flatMap(positiveLexemes)
    case Or(qs)         => qs.flatMap(positiveLexemes)
  }

  /** True iff the query contains a phrase/distance node — the only node
    * kind that needs POSITIONAL postings; phrase-free queries evaluate on
    * the cheaper token-array or plain posting paths. */
  def hasPhrase(q: TsQuery): Boolean = q match {
    case _: Term    => false
    case _: Phrase  => true
    case Not(x)     => hasPhrase(x)
    case And(qs)    => qs.exists(hasPhrase)
    case Or(qs)     => qs.exists(hasPhrase)
  }

  /** Every exact (non-prefix) lexeme in the query — the set an indexed
    * evaluation can bucket-prune its scan to. Prefix lexemes are excluded:
    * a hash bucket cannot be derived from a prefix. */
  def exactLexemes(q: TsQuery): Seq[String] = q match {
    case Term(l, false) => Seq(l)
    case Term(_, true)  => Nil
    case Phrase(ls, _)  => ls
    case Not(x)         => exactLexemes(x)
    case And(qs)        => qs.flatMap(exactLexemes)
    case Or(qs)         => qs.flatMap(exactLexemes)
  }

  // ------------------------------------------------------------------ lexer

  private sealed trait Tok
  private case object TAnd extends Tok
  private case object TOr extends Tok
  private case object TNot extends Tok
  private case object TLParen extends Tok
  private case object TRParen extends Tok
  /** `<->` (gap 1) or `<N>` (gap N). */
  private final case class TFollowedBy(gap: Int) extends Tok
  private final case class TLex(s: String, prefix: Boolean) extends Tok

  private def lex(s: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    while (i < s.length) {
      val c = s(i)
      if (c.isWhitespace) i += 1
      else if (c == '&') { out += TAnd; i += 1 }
      else if (c == '|') { out += TOr; i += 1 }
      else if (c == '!') { out += TNot; i += 1 }
      else if (c == '(') { out += TLParen; i += 1 }
      else if (c == ')') { out += TRParen; i += 1 }
      else if (c == '<') {
        if (s.regionMatches(i, "<->", 0, 3)) { out += TFollowedBy(1); i += 3 }
        else {
          val close = s.indexOf('>', i + 1)
          val digits = if (close > i + 1) s.substring(i + 1, close) else ""
          require(digits.nonEmpty && digits.forall(_.isDigit),
            s"tsquery: bad operator at position $i in <$s> (expected <-> or <N>)")
          out += TFollowedBy(digits.toInt); i = close + 1
        }
      } else if (c.isLetterOrDigit || c == '_') {
        val start = i
        while (i < s.length && (s(i).isLetterOrDigit || s(i) == '_')) i += 1
        val word = s.substring(start, i)
        if (s.regionMatches(i, ":*", 0, 2)) { out += TLex(word, prefix = true); i += 2 }
        else out += TLex(word, prefix = false)
      } else
        throw new IllegalArgumentException(
          s"tsquery: unexpected character '$c' at position $i in <$s>")
    }
    out.result()
  }

  // ----------------------------------------------- recursive-descent parser

  private final class Parser(toks: Vector[Tok], input: String) {
    private var i = 0
    private def peek: Option[Tok] = if (i < toks.length) Some(toks(i)) else None
    private def next(): Tok = { val t = toks(i); i += 1; t }
    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"tsquery: $msg in <$input>")

    def expectEnd(): Unit = if (i < toks.length) fail(s"trailing tokens after position $i")

    // or := and ('|' and)*
    def parseOr(): TsQuery = {
      val parts = Seq.newBuilder[TsQuery]
      parts += parseAnd()
      var n = 1
      while (peek.contains(TOr)) { next(); parts += parseAnd(); n += 1 }
      if (n == 1) parts.result().head else Or(parts.result())
    }

    // and := phrase ('&' phrase)*
    private def parseAnd(): TsQuery = {
      val parts = Seq.newBuilder[TsQuery]
      parts += parsePhrase()
      var n = 1
      while (peek.contains(TAnd)) { next(); parts += parsePhrase(); n += 1 }
      if (n == 1) parts.result().head else And(parts.result())
    }

    // phrase := unary (('<->'|'<N>') unary)* — operands must be plain terms
    // (the posting evaluator resolves phrases by exact (id, pos) equi-joins;
    // prefix or nested operands inside <-> are rejected, not mis-evaluated)
    private def parsePhrase(): TsQuery = {
      def isFollowedBy = peek.exists(_.isInstanceOf[TFollowedBy])
      val first = parseUnary()
      if (!isFollowedBy) first
      else {
        val parts = Seq.newBuilder[TsQuery]
        val offsets = Seq.newBuilder[Int]
        parts += first; offsets += 0
        var at = 0
        while (isFollowedBy) {
          at += next().asInstanceOf[TFollowedBy].gap
          parts += parseUnary(); offsets += at
        }
        Phrase(parts.result().map {
          case Term(l, false) => l
          case other => fail(s"<-> operands must be plain terms, got $other")
        }, offsets.result())
      }
    }

    // unary := '!' unary | '(' or ')' | term
    private def parseUnary(): TsQuery = peek match {
      case Some(TNot)    => next(); Not(parseUnary())
      case Some(TLParen) =>
        next()
        val q = parseOr()
        if (!peek.contains(TRParen)) fail("missing closing parenthesis")
        next(); q
      case Some(TLex(w, p)) => next(); Term(w, p)
      case other => fail(s"expected a term, '!' or '(', got $other")
    }
  }
}
