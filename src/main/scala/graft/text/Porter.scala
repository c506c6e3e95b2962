package graft.text

/** Porter stemming algorithm (M.F. Porter, "An algorithm for suffix
  * stripping", Program 14(3), 1980) — the stemmer behind Postgres
  * `to_tsvector('english', ...)`'s lexeme reduction that the reference relies
  * on via its tsvector trigger (`sec_dl/utils/init_tables.py:59-67`).
  *
  * Clean-room implementation of the published algorithm. Pure function:
  * lowercase input expected (the tokenize chain lowercases first).
  */
object Porter {

  private def isVowel(s: CharSequence, i: Int): Boolean = s.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => true
    case 'y' => i > 0 && !isVowel(s, i - 1)
    case _ => false
  }

  /** m(): number of VC sequences in the stem. */
  private def measure(s: CharSequence): Int = {
    var m = 0; var i = 0; val n = s.length
    while (i < n && !isVowel(s, i)) i += 1
    while (i < n) {
      while (i < n && isVowel(s, i)) i += 1
      if (i < n) { m += 1; while (i < n && !isVowel(s, i)) i += 1 }
    }
    m
  }

  private def hasVowel(s: CharSequence): Boolean =
    (0 until s.length).exists(isVowel(s, _))

  private def endsDoubleConsonant(s: CharSequence): Boolean = {
    val n = s.length
    n >= 2 && s.charAt(n - 1) == s.charAt(n - 2) && !isVowel(s, n - 1)
  }

  /** *o: stem ends cvc where the last c is not w, x or y. */
  private def endsCvc(s: CharSequence): Boolean = {
    val n = s.length
    n >= 3 && !isVowel(s, n - 3) && isVowel(s, n - 2) && !isVowel(s, n - 1) && {
      val c = s.charAt(n - 1); c != 'w' && c != 'x' && c != 'y'
    }
  }

  private def replaceSuffix(w: String, suffix: String, repl: String, minM: Int): Option[String] =
    if (w.endsWith(suffix)) {
      val stem = w.substring(0, w.length - suffix.length)
      if (measure(stem) > minM) Some(stem + repl) else Some(w)
    } else None

  private val step2Rules = Seq(
    "ational" -> "ate", "tional" -> "tion", "enci" -> "ence", "anci" -> "ance",
    "izer" -> "ize", "abli" -> "able", "alli" -> "al", "entli" -> "ent",
    "eli" -> "e", "ousli" -> "ous", "ization" -> "ize", "ation" -> "ate",
    "ator" -> "ate", "alism" -> "al", "iveness" -> "ive", "fulness" -> "ful",
    "ousness" -> "ous", "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble")

  private val step3Rules = Seq(
    "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
    "ical" -> "ic", "ful" -> "", "ness" -> "")

  private val step4Suffixes = Seq(
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize")

  def stem(word: String): String = {
    if (word.length < 3) return word
    var w = word

    // Step 1a
    if (w.endsWith("sses")) w = w.dropRight(2)
    else if (w.endsWith("ies")) w = w.dropRight(2)
    else if (!w.endsWith("ss") && w.endsWith("s")) w = w.dropRight(1)

    // Step 1b
    if (w.endsWith("eed")) {
      if (measure(w.dropRight(3)) > 0) w = w.dropRight(1)
    } else {
      val stripped =
        if (w.endsWith("ed") && hasVowel(w.dropRight(2))) Some(w.dropRight(2))
        else if (w.endsWith("ing") && hasVowel(w.dropRight(3))) Some(w.dropRight(3))
        else None
      stripped.foreach { st =>
        w = st
        if (w.endsWith("at") || w.endsWith("bl") || w.endsWith("iz")) w = w + "e"
        else if (endsDoubleConsonant(w) && !"lsz".contains(w.last)) w = w.dropRight(1)
        else if (measure(w) == 1 && endsCvc(w)) w = w + "e"
      }
    }

    // Step 1c
    if (w.endsWith("y") && hasVowel(w.dropRight(1))) w = w.dropRight(1) + "i"

    // Step 2
    step2Rules.collectFirst {
      case (suf, rep) if w.endsWith(suf) => (suf, rep)
    }.foreach { case (suf, rep) =>
      val stem0 = w.substring(0, w.length - suf.length)
      if (measure(stem0) > 0) w = stem0 + rep
    }

    // Step 3
    step3Rules.collectFirst {
      case (suf, rep) if w.endsWith(suf) => (suf, rep)
    }.foreach { case (suf, rep) =>
      val stem0 = w.substring(0, w.length - suf.length)
      if (measure(stem0) > 0) w = stem0 + rep
    }

    // Step 4
    step4Suffixes.collectFirst {
      case suf if w.endsWith(suf) => suf
    }.foreach { suf =>
      val stem0 = w.substring(0, w.length - suf.length)
      val ok = measure(stem0) > 1 &&
        (suf != "ion" || (stem0.nonEmpty && (stem0.last == 's' || stem0.last == 't')))
      if (ok) w = stem0
    }

    // Step 5a
    if (w.endsWith("e")) {
      val stem0 = w.dropRight(1)
      val m = measure(stem0)
      if (m > 1 || (m == 1 && !endsCvc(stem0))) w = stem0
    }
    // Step 5b
    if (measure(w) > 1 && w.endsWith("ll")) w = w.dropRight(1)

    w
  }
}
