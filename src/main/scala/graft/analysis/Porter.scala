package graft.analysis

/** Porter stemming algorithm (M.F. Porter, 1980 — public domain algorithm),
  * standing in for the reference's snowball stemmers
  * (/root/reference/libs/iresearch/include/iresearch/analysis — `text`
  * analyzer with `stemming=true`). English only; other locales pass through.
  */
object Porter {
  private def isCons(w: String, i: Int): Boolean = w.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => false
    case 'y' => i == 0 || !isCons(w, i - 1)
    case _ => true
  }

  /** Number of VC sequences in w (the "measure" m). */
  private def measure(w: String): Int = {
    var m = 0; var i = 0; val n = w.length
    while (i < n && isCons(w, i)) i += 1
    while (i < n) {
      while (i < n && !isCons(w, i)) i += 1
      if (i < n) { m += 1; while (i < n && isCons(w, i)) i += 1 }
    }
    m
  }

  private def containsVowel(w: String): Boolean =
    w.indices.exists(i => !isCons(w, i))

  private def doubleCons(w: String): Boolean =
    w.length >= 2 && w.charAt(w.length - 1) == w.charAt(w.length - 2) &&
      isCons(w, w.length - 1)

  /** *o — stem ends cvc where the last c is not w, x or y. */
  private def cvc(w: String): Boolean = {
    val n = w.length
    n >= 3 && isCons(w, n - 1) && !isCons(w, n - 2) && isCons(w, n - 3) &&
      !"wxy".contains(w.charAt(n - 1))
  }

  private def replaceSuffix(w: String, suffix: String, repl: String,
      cond: String => Boolean): Option[String] =
    if (w.endsWith(suffix)) {
      val stem = w.substring(0, w.length - suffix.length)
      if (cond(stem)) Some(stem + repl) else Some(w)
    } else None

  private val step2Pairs = Seq(
    "ational" -> "ate", "tional" -> "tion", "enci" -> "ence", "anci" -> "ance",
    "izer" -> "ize", "abli" -> "able", "alli" -> "al", "entli" -> "ent",
    "eli" -> "e", "ousli" -> "ous", "ization" -> "ize", "ation" -> "ate",
    "ator" -> "ate", "alism" -> "al", "iveness" -> "ive", "fulness" -> "ful",
    "ousness" -> "ous", "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble")

  private val step3Pairs = Seq(
    "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
    "ical" -> "ic", "ful" -> "", "ness" -> "")

  private val step4Suffixes = Seq(
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement", "ment",
    "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize")

  def stem(word: String): String = {
    if (word.length <= 2) return word
    var w = word

    // Step 1a: plurals
    if (w.endsWith("sses")) w = w.dropRight(2)
    else if (w.endsWith("ies")) w = w.dropRight(2)
    else if (!w.endsWith("ss") && w.endsWith("s")) w = w.dropRight(1)

    // Step 1b: -ed / -ing
    if (w.endsWith("eed")) {
      if (measure(w.dropRight(3)) > 0) w = w.dropRight(1)
    } else {
      val stripped =
        if (w.endsWith("ed") && containsVowel(w.dropRight(2))) Some(w.dropRight(2))
        else if (w.endsWith("ing") && containsVowel(w.dropRight(3))) Some(w.dropRight(3))
        else None
      stripped.foreach { s =>
        w = if (s.endsWith("at") || s.endsWith("bl") || s.endsWith("iz")) s + "e"
        else if (doubleCons(s) && !"lsz".contains(s.last)) s.dropRight(1)
        else if (measure(s) == 1 && cvc(s)) s + "e"
        else s
      }
    }

    // Step 1c: y → i
    if (w.endsWith("y") && containsVowel(w.dropRight(1))) w = w.dropRight(1) + "i"

    // Step 2
    step2Pairs.collectFirst {
      case (suf, rep) if w.endsWith(suf) => (suf, rep)
    }.foreach { case (suf, rep) =>
      val stem = w.substring(0, w.length - suf.length)
      if (measure(stem) > 0) w = stem + rep
    }

    // Step 3
    step3Pairs.collectFirst {
      case (suf, rep) if w.endsWith(suf) => (suf, rep)
    }.foreach { case (suf, rep) =>
      val stem = w.substring(0, w.length - suf.length)
      if (measure(stem) > 0) w = stem + rep
    }

    // Step 4 — one rule max; "ion" additionally requires the stem to end in
    // s or t (Porter's (*S or *T) ION condition).
    step4Suffixes.collectFirst {
      case suf if w.endsWith(suf) &&
        (suf != "ion" ||
          { val st = w.dropRight(3); st.nonEmpty && "st".contains(st.last) }) => suf
    }.foreach { suf =>
      val stem = w.substring(0, w.length - suf.length)
      if (measure(stem) > 1) w = stem
    }

    // Step 5a: -e
    if (w.endsWith("e")) {
      val stem = w.dropRight(1)
      val m = measure(stem)
      if (m > 1 || (m == 1 && !cvc(stem))) w = stem
    }
    // Step 5b: -ll
    if (measure(w) > 1 && doubleCons(w) && w.endsWith("l")) w = w.dropRight(1)
    w
  }
}
