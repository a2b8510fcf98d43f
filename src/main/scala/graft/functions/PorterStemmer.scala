package graft.functions

/** The Porter stemming algorithm (M.F. Porter, "An algorithm for
  * suffix stripping", 1980 — the standard published algorithm;
  * reference `operator/scalar/WordStemFunction.java` wraps the same
  * algorithm via its stemmer library). Implemented from the paper's
  * step tables; pure string→string, registered as the `word_stem`
  * UDF in GraftFunctions.
  */
object PorterStemmer {

  def stem(word: String): String = {
    if (word == null) return null
    val w = word.toLowerCase
    if (w.length <= 2) return w
    var s = w
    s = step1a(s)
    s = step1b(s)
    s = step1c(s)
    s = step2(s)
    s = step3(s)
    s = step4(s)
    s = step5(s)
    s
  }

  private def isCons(s: String, i: Int): Boolean = s.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => false
    case 'y' => i == 0 || !isCons(s, i - 1)
    case _ => true
  }

  /** m in [C](VC)^m[V]: the number of vowel→consonant transitions. */
  private def measure(s: String): Int = {
    var n = 0
    var i = 0
    val len = s.length
    while (i < len && isCons(s, i)) i += 1
    while (i < len) {
      while (i < len && !isCons(s, i)) i += 1
      if (i < len) {
        n += 1
        while (i < len && isCons(s, i)) i += 1
      }
    }
    n
  }

  private def containsVowel(s: String): Boolean =
    (0 until s.length).exists(i => !isCons(s, i))

  private def endsDoubleCons(s: String): Boolean =
    s.length >= 2 && s.charAt(s.length - 1) == s.charAt(s.length - 2) &&
      isCons(s, s.length - 1)

  /** *o condition: stem ends cvc where the final c is not w, x or y. */
  private def endsCvc(s: String): Boolean = {
    val len = s.length
    len >= 3 && isCons(s, len - 3) && !isCons(s, len - 2) && isCons(s, len - 1) &&
      !"wxy".contains(s.charAt(len - 1))
  }

  /** Longest-suffix rule application: first suffix that matches AND
    * whose stem passes `cond` rewrites; a match that fails the
    * condition still CONSUMES the step (Porter's rule-table
    * semantics). Returns None when no suffix matched at all. */
  private def applyRules(s: String, rules: Seq[(String, String)],
      cond: String => Boolean): Option[String] =
    rules.find { case (suf, _) => s.endsWith(suf) && s.length > suf.length }
      .map { case (suf, rep) =>
        val stem = s.dropRight(suf.length)
        if (cond(stem)) stem + rep else s
      }

  private def step1a(s: String): String =
    if (s.endsWith("sses")) s.dropRight(2)
    else if (s.endsWith("ies")) s.dropRight(2)
    else if (s.endsWith("ss")) s
    else if (s.endsWith("s")) s.dropRight(1)
    else s

  private def step1b(s: String): String = {
    if (s.endsWith("eed")) {
      val stem = s.dropRight(3)
      return if (measure(stem) > 0) s.dropRight(1) else s
    }
    val stripped =
      if (s.endsWith("ed") && containsVowel(s.dropRight(2))) Some(s.dropRight(2))
      else if (s.endsWith("ing") && containsVowel(s.dropRight(3))) Some(s.dropRight(3))
      else None
    stripped match {
      case None => s
      case Some(t) =>
        if (t.endsWith("at") || t.endsWith("bl") || t.endsWith("iz")) t + "e"
        else if (endsDoubleCons(t) && !"lsz".contains(t.last)) t.dropRight(1)
        else if (measure(t) == 1 && endsCvc(t)) t + "e"
        else t
    }
  }

  private def step1c(s: String): String =
    if (s.endsWith("y") && containsVowel(s.dropRight(1))) s.dropRight(1) + "i"
    else s

  private val rules2 = Seq(
    "ational" -> "ate", "tional" -> "tion", "enci" -> "ence", "anci" -> "ance",
    "izer" -> "ize", "abli" -> "able", "alli" -> "al", "entli" -> "ent",
    "eli" -> "e", "ousli" -> "ous", "ization" -> "ize", "ation" -> "ate",
    "ator" -> "ate", "alism" -> "al", "iveness" -> "ive", "fulness" -> "ful",
    "ousness" -> "ous", "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble")

  private def step2(s: String): String =
    applyRules(s, rules2, measure(_) > 0).getOrElse(s)

  private val rules3 = Seq(
    "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
    "ical" -> "ic", "ful" -> "", "ness" -> "")

  private def step3(s: String): String =
    applyRules(s, rules3, measure(_) > 0).getOrElse(s)

  private val rules4 = Seq(
    "ement" -> "", "ance" -> "", "ence" -> "", "able" -> "", "ible" -> "",
    "ment" -> "", "ant" -> "", "ent" -> "", "ion" -> "", "ism" -> "",
    "ate" -> "", "iti" -> "", "ous" -> "", "ive" -> "", "ize" -> "",
    "al" -> "", "er" -> "", "ic" -> "", "ou" -> "")

  private def step4(s: String): String =
    rules4.find { case (suf, _) => s.endsWith(suf) && s.length > suf.length }
      .map { case (suf, _) =>
        val stem = s.dropRight(suf.length)
        val ok = measure(stem) > 1 &&
          (suf != "ion" || stem.endsWith("s") || stem.endsWith("t"))
        if (ok) stem else s
      }.getOrElse(s)

  private def step5(s: String): String = {
    var t = s
    if (t.endsWith("e")) {
      val stem = t.dropRight(1)
      val m = measure(stem)
      if (m > 1 || (m == 1 && !endsCvc(stem))) t = stem
    }
    if (t.endsWith("l") && endsDoubleCons(t) && measure(t.dropRight(1)) > 1)
      t = t.dropRight(1)
    t
  }
}
