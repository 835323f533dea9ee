package graft.analysis

/** Russian stemmer, implemented from the published Snowball Russian
  * stemming algorithm (M.F. Porter's Snowball project, public algorithm
  * description). The reference ships BOTH the Snowball-generated
  * equivalent (/root/reference/src/contrib/Snowball/SF/Snowball/Ext/
  * RussianStemmer.cs:11, wrapped by SnowballAnalyzer.cs:39) and an older
  * table-driven analyzer (contrib/Analyzers/Ru/RussianStemmer.cs:28,
  * whose wordsUTF8/stemsUTF8 fixtures gate THAT algorithm — a different
  * published design); this follows the Snowball formulation.
  *
  * Outline (all endings must lie in RV = region after the first vowel;
  * R2 gates only the derivational ость/ост):
  *  1. perfective gerund (вшись…; а/я-conditioned group 1), else
  *     reflexive (ся/сь) then one of adjectival (+ optional participle),
  *     verb (а/я-conditioned group 1 / group 2), noun.
  *  2. final и.
  *  3. derivational ость/ост in R2.
  *  4. superlative ейш(е), undouble нн, final ь.
  */
object RussianStemmer {

  private val Vowels = "аеиоуыэюя".toSet

  @inline private def isVowel(c: Char): Boolean = Vowels(c)

  // ---- ending tables (Snowball Russian, published) ----
  // (cond = true marks endings valid only when preceded by а or я)
  private val PerfGerund: Seq[(String, Boolean)] = Seq(
    "ившись" -> false, "ывшись" -> false, "вшись" -> true,
    "ивши" -> false, "ывши" -> false, "вши" -> true,
    "ив" -> false, "ыв" -> false, "в" -> true)

  private val Adjectival: Seq[String] = Seq(
    "ими", "ыми", "его", "ого", "ему", "ому",
    "ее", "ие", "ые", "ое", "ей", "ий", "ый", "ой", "ем", "им", "ым",
    "ом", "их", "ых", "ую", "юю", "ая", "яя", "ою", "ею")

  private val Participle: Seq[(String, Boolean)] = Seq(
    "ивш" -> false, "ывш" -> false, "ующ" -> false,
    "ем" -> true, "нн" -> true, "вш" -> true, "ющ" -> true, "щ" -> true)

  private val Verb: Seq[(String, Boolean)] = Seq(
    "ейте" -> false, "уйте" -> false, "ила" -> false, "ыла" -> false,
    "ена" -> false, "ите" -> false, "или" -> false, "ыли" -> false,
    "ило" -> false, "ыло" -> false, "ено" -> false, "ует" -> false,
    "уют" -> false, "ены" -> false, "ить" -> false, "ыть" -> false,
    "ишь" -> false,
    "ете" -> true, "йте" -> true, "ешь" -> true, "нно" -> true,
    "ла" -> true, "на" -> true, "ли" -> true, "ем" -> true, "ло" -> true,
    "но" -> true, "ет" -> true, "ют" -> true, "ны" -> true, "ть" -> true,
    "ей" -> false, "уй" -> false, "ил" -> false, "ыл" -> false,
    "им" -> false, "ым" -> false, "ен" -> false, "ят" -> false,
    "ит" -> false, "ыт" -> false, "ую" -> false, "ю" -> false,
    "й" -> true, "л" -> true, "н" -> true)

  private val Noun: Seq[String] = Seq(
    "иями", "ями", "ами", "ией", "иям", "ием", "иях", "ию", "ья", "ия",
    "ии", "еи", "ей", "ой", "ий", "ям",
    "ем", "ам", "ом", "ах", "ях", "ью", "ие", "ье", "ев", "ов",
    "а", "е", "и", "й", "о", "у", "ы", "ь", "ю", "я")

  def stem(word: String): String = {
    if (word == null || word.isEmpty) return ""
    var s = word.toLowerCase(java.util.Locale.ROOT).replace('ё', 'е')
    if (s.length < 2) return s

    // regions on the original buffer (prefix positions never change)
    val rv = {
      var i = 0
      while (i < s.length && !isVowel(s(i))) i += 1
      if (i < s.length) i + 1 else s.length
    }
    def regionAfter(from: Int): Int = {
      var i = from
      while (i < s.length && !isVowel(s(i))) i += 1
      while (i < s.length && isVowel(s(i))) i += 1
      if (i < s.length) i + 1 else s.length
    }
    val r1 = regionAfter(0)
    val r2 = regionAfter(r1)

    def del(n: Int): Unit = s = s.substring(0, s.length - n)

    /** Longest string match in RV (Snowball among: longest wins, its
      * condition decides, no fallback to shorter patterns). The а/я
      * condition character must itself lie in RV — the reference runs
      * the whole backwards pass under `setlimit tomark pV`
      * (Ext/RussianStemmer.cs StemImpl), so no match crosses the RV
      * boundary. */
    def amongCond(pats: Seq[(String, Boolean)]): Boolean = {
      val hit = pats.filter { case (p, _) =>
        s.endsWith(p) && s.length - p.length >= rv
      }.sortBy { case (p, _) => -p.length }.headOption
      hit match {
        case Some((p, needsAYa)) =>
          val ok = !needsAYa || {
            val i = s.length - p.length - 1
            i >= rv && (s(i) == 'а' || s(i) == 'я')
          }
          if (ok) del(p.length)
          ok
        case None => false
      }
    }
    def among(pats: Seq[String]): Boolean =
      amongCond(pats.map(_ -> false))

    // ---- step 1 ----
    if (!amongCond(PerfGerund)) {
      if (s.endsWith("ся") && s.length - 2 >= rv) del(2)
      else if (s.endsWith("сь") && s.length - 2 >= rv) del(2)
      if (among(Adjectival)) { amongCond(Participle); () }
      else if (amongCond(Verb)) ()
      else among(Noun)
    }

    // ---- step 2: final и ----
    if (s.endsWith("и") && s.length - 1 >= rv) del(1)

    // ---- step 3: derivational ость/ост in R2 ----
    if (s.endsWith("ость") && s.length - 4 >= r2) del(4)
    else if (s.endsWith("ост") && s.length - 3 >= r2) del(3)

    // ---- step 4 (both н of a doubled нн must lie in RV) ----
    if (s.endsWith("нн") && s.length - 2 >= rv) del(1)
    else {
      val sup =
        if (s.endsWith("ейше") && s.length - 4 >= rv) 4
        else if (s.endsWith("ейш") && s.length - 3 >= rv) 3
        else 0
      if (sup > 0) {
        del(sup)
        if (s.endsWith("нн") && s.length - 2 >= rv) del(1)
      } else if (s.endsWith("ь") && s.length - 1 >= rv) del(1)
    }
    s
  }
}
