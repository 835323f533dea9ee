package graft.analysis

/** German variant stemmer ("german2"), implemented from the published
  * Snowball german2 algorithm description (the reference ships the
  * Snowball-compiler output at
  * /root/reference/src/contrib/Snowball/SF/Snowball/Ext/German2Stemmer.cs:11).
  *
  * It is the standard German algorithm with one prelude change: the
  * typewriter umlaut spellings ae/oe/ue are folded to ä/ö/ü BEFORE
  * region computation and suffix matching (so `ue` counts as one
  * vowel), with `qu` protected (the u of qu is never folded) — and the
  * u/y consonant-marking pass runs FIRST, so a genuine vowel-u between
  * vowels (baUen) is never mistaken for a ue digraph. ß→ss happens in
  * the same fold pass. Steps 1-3 and the finalize are shared verbatim
  * with [[GermanStemmer]].
  */
object German2Stemmer {

  def stem(word: String): String = {
    if (word == null || word.length < 2)
      return if (word == null) "" else word.toLowerCase(java.util.Locale.ROOT)
    val marked = GermanStemmer.markUY(word.toLowerCase(java.util.Locale.ROOT))
    // left-to-right fold: ae→ä, oe→ö, ue→ü (but skip over qu), ß→ss;
    // uppercase U (a marked vowel-u) never matches the lowercase ue
    val b = new StringBuilder(marked.length)
    var i = 0
    while (i < marked.length) {
      val two = if (i + 1 < marked.length) marked.substring(i, i + 2) else ""
      two match {
        case "ae" => b += 'ä'; i += 2
        case "oe" => b += 'ö'; i += 2
        case "ue" => b += 'ü'; i += 2
        case "qu" => b ++= "qu"; i += 2
        case _ =>
          if (marked(i) == 'ß') { b ++= "ss"; i += 1 }
          else { b += marked(i); i += 1 }
      }
    }
    GermanStemmer.steps(b.result())
  }
}
