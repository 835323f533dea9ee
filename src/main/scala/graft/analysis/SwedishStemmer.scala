package graft.analysis

/** Swedish stemmer, implemented from the published Snowball Swedish
  * stemming algorithm (M.F. Porter's Snowball project, public algorithm
  * description). The reference ships the Snowball-generated equivalent
  * (/root/reference/src/contrib/Snowball/SF/Snowball/Ext/SwedishStemmer.cs:11)
  * wrapped by SnowballAnalyzer.cs:39.
  *
  * Outline (a single region R1, adjusted so at least 3 letters precede
  * it):
  *  step 1. longest ending among the a/e/or/arna/heten… set in R1 →
  *          delete; or final s after a valid s-ending → delete.
  *  step 2. final dd/gd/nn/dt/gt/kt/tt in R1 → delete the last letter.
  *  step 3. lig/ig/els in R1 → delete; löst → lös; fullt → full.
  */
object SwedishStemmer {

  private val Vowels = "aeiouyäåö".toSet
  /** Valid s-endings (step 1 s-deletion gate). */
  private val SEnding = "bcdfghjklmnoprtvy".toSet

  @inline private def isVowel(c: Char): Boolean = Vowels(c)

  private val Step1 = Seq(
    "heterna", "hetens", "heter", "heten", "anden", "andes", "arnas",
    "ernas", "ornas", "arne", "arna", "erna", "orna", "ande", "andet",
    "aren", "arens", "aste", "ades", "erns", "ade", "are", "ern", "ens",
    "het", "ast", "ad", "en", "ar", "er", "or", "as", "es", "at", "a", "e")

  def stem(word: String): String = {
    if (word == null || word.length < 2)
      return if (word == null) "" else word.toLowerCase(java.util.Locale.ROOT)
    var s = word.toLowerCase(java.util.Locale.ROOT)

    // R1, but with at least 3 letters before it (the Scandinavian
    // adjustment shared with Danish/Norwegian)
    val r1 = {
      var i = 0
      while (i < s.length && !isVowel(s(i))) i += 1
      while (i < s.length && isVowel(s(i))) i += 1
      val r = if (i < s.length) i + 1 else s.length
      math.max(r, 3)
    }
    def inR1(n: Int) = s.length - n >= r1
    def del(n: Int): Unit = s = s.substring(0, s.length - n)

    // ---- step 1 ----
    Step1.filter(p => s.endsWith(p) && inR1(p.length))
      .sortBy(-_.length).headOption match {
      case Some(p) => del(p.length)
      case None =>
        if (s.endsWith("s") && inR1(1) && s.length >= 2 &&
          SEnding(s(s.length - 2))) del(1)
    }

    // ---- step 2 ----
    Seq("dd", "gd", "nn", "dt", "gt", "kt", "tt")
      .find(p => s.endsWith(p) && inR1(2)).foreach(_ => del(1))

    // ---- step 3 ----
    if (s.endsWith("fullt") && inR1(5)) del(1)
    else if (s.endsWith("löst") && inR1(4)) del(1)
    else
      Seq("lig", "els", "ig").find(p => s.endsWith(p) && inR1(p.length))
        .foreach(p => del(p.length))
    s
  }
}
