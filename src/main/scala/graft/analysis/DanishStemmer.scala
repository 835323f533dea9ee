package graft.analysis

/** Danish stemmer, implemented from the published Snowball Danish
  * stemming algorithm (M.F. Porter's Snowball project, public algorithm
  * description). The reference ships the Snowball-generated equivalent
  * (/root/reference/src/contrib/Snowball/SF/Snowball/Ext/DanishStemmer.cs:11)
  * wrapped by SnowballAnalyzer.cs:39.
  *
  * Outline (single region R1 with the Scandinavian min-3 adjustment,
  * shared with [[SwedishStemmer]]/[[NorwegianStemmer]]):
  *  step 1. longest ending among the hed/ethed/erede… set in R1 →
  *          delete; or final s after a valid s-ending (which in Danish
  *          includes the vowels a and å) → delete.
  *  step 2. final gd/dt/gt/kt in R1 → delete the last letter.
  *  step 3. final igst → drop the st; then ig/lig/elig/els in R1 →
  *          delete and repeat step 2; løst → løs.
  *  step 4. undouble: final double consonant in R1 → drop one.
  */
object DanishStemmer {

  private val Vowels = "aeiouyæåø".toSet
  /** Valid s-endings (step 1 s-deletion gate) — unlike Swedish, the
    * Danish set admits a, å, z and k. */
  private val SEnding = "abcdfghjklmnoprtvyzå".toSet

  @inline private def isVowel(c: Char): Boolean = Vowels(c)

  private val Step1 = Seq(
    "hed", "ethed", "ered", "e", "erede", "ende", "erende", "ene",
    "erne", "ere", "en", "heden", "eren", "er", "heder", "erer", "heds",
    "es", "endes", "erendes", "enes", "ernes", "eres", "ens", "hedens",
    "erens", "ets", "erets", "et", "eret")

  def stem(word: String): String = {
    if (word == null || word.length < 2)
      return if (word == null) "" else word.toLowerCase(java.util.Locale.ROOT)
    var s = word.toLowerCase(java.util.Locale.ROOT)

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
    def step2(): Unit =
      Seq("gd", "dt", "gt", "kt")
        .find(p => s.endsWith(p) && inR1(2)).foreach(_ => del(1))
    step2()

    // ---- step 3 ----
    if (s.endsWith("igst")) del(2) // word-level: drop the final st
    if (s.endsWith("løst") && inR1(4)) del(1)
    else
      Seq("elig", "lig", "els", "ig")
        .filter(p => s.endsWith(p) && inR1(p.length))
        .sortBy(-_.length).headOption.foreach { p =>
          del(p.length)
          step2() // the (a) action repeats the consonant-pair step
        }

    // ---- step 4: undouble ----
    if (s.length >= 2 && s(s.length - 1) == s(s.length - 2) &&
      !isVowel(s(s.length - 1)) && inR1(1)) del(1)
    s
  }
}
