package graft.analysis

/** Brazilian-Portuguese stemmer — the reference BR chain's OWN
  * algorithm (`src/contrib/Analyzers/BR/BrazilianStemmer.cs:25`), which
  * is "very similar to the snowball portuguese algorithm but not
  * exactly the same" (the reference's own test note): the input is
  * accent-FOLDED up front (so stems come out unaccented, unlike
  * [[PortugueseStemmer]]), the suffix tables are ASCII, and the step
  * structure is Snowball-shaped (R1/R2/RV regions, standard → verb →
  * residual suffix removal). Validated against the reference's golden
  * vectors (`test/contrib/Analyzers/Br/TestBrazilianStemmer.cs`, all
  * pairs — BrazilianGoldenSpec).
  *
  * Expressed as ordered rule TABLES (first rule whose conditions hold
  * fires), not the reference's if-chain; the tables are the spec.
  * Region strings are computed once from the folded term and FROZEN —
  * later steps test suffixes against the original regions while
  * mutating only the working term, exactly like the reference.
  *
  * Reference quirks deliberately preserved because the golden corpus /
  * fall-through behavior encodes them:
  *   - the `logias → log` rewrite's result is discarded (the C#
  *     statement never assigns), so the term is unchanged but counts
  *     as "altered" and routes to step 3 instead of step 4;
  *   - the first step-2 `ira` rule removes `ava` — a guaranteed no-op
  *     (the term ends "ira" there) that still marks the word altered,
  *     shadowing the real `ira` rule three entries later;
  *   - region scans never examine the LAST character (`j < i` with
  *     i = length−1), so e.g. "bobs" has R1 = "s" but R2 = null;
  *   - a region that cannot be found is null, not empty — and a null
  *     region fails every suffix test.
  */
object BrazilianStemmer {

  /** Filter contract (`BrazilianStemFilter.cs:58-63`): when the stemmer
    * abstains (too short/long → null), the token passes unchanged. */
  def stem(term: String): String = {
    val s = stemOrNull(term)
    if (s == null) term else s
  }

  /** Null when the term is not indexable (folded length outside
    * (2, 30)); the folded-but-unstemmed term when it contains a
    * non-letter; otherwise the stem. */
  def stemOrNull(term: String): String = {
    val ct0 = createCT(term)
    if (ct0.length <= 2 || ct0.length >= 30) return null
    if (!ct0.forall(_.isLetter)) return ct0

    val r1 = region1(ct0)
    val r2 = region1(r1)
    val rv = regionV(ct0)

    var ct = ct0
    var altered = false

    // step 1: standard suffixes, longest group first; the region
    // condition must hold IN ADDITION to the literal term suffix
    val it1 = Step1Rules.iterator
    while (!altered && it1.hasNext) {
      val r = it1.next()
      val reg = r.reg match {
        case InR1 => r1; case InR2 => r2; case InRV => rv
      }
      if (ends(ct, r.sfx) && ends(reg, r.sfx) &&
          (r.precededBy.isEmpty ||
            ends(ct.dropRight(r.sfx.length), r.precededBy))) {
        if (!r.discard)
          ct = ct.dropRight(r.sfx.length) + r.replaceWith
        altered = true
      }
    }

    // step 2: verb suffixes — matched against (frozen) RV, removed
    // from the working term
    if (!altered) {
      val it2 = Step2Rules.iterator
      while (!altered && it2.hasNext) {
        val (inRv, fromCt) = it2.next()
        if (ends(rv, inRv)) {
          ct = rmIf(ct, fromCt)
          altered = true
        }
      }
    }

    if (altered) {
      // step 3: drop a c-preceded 'i' (tested in RV, removed if the
      // working term still ends with it)
      if (ends(rv, "i") && rv.dropRight(1).endsWith("c"))
        ct = rmIf(ct, "i")
    } else {
      // step 4: residual suffix, first match in RV wins
      val hit = Step4Suffixes.find(ends(rv, _))
      hit.foreach(s => ct = rmIf(ct, s))
    }

    // step 5: final 'e' (and the u of -gue / i of -cie with it)
    if (ends(rv, "e")) {
      val before = rv.dropRight(1)
      if (before.endsWith("gu")) { ct = rmIf(ct, "e"); ct = rmIf(ct, "u") }
      else if (before.endsWith("ci")) { ct = rmIf(ct, "e"); ct = rmIf(ct, "i") }
      else ct = rmIf(ct, "e")
    }

    ct
  }

  // ---- regions ----------------------------------------------------

  private def isVowel(c: Char): Boolean =
    c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u'

  /** R1: the region after the first non-vowel following a vowel — null
    * (not empty) when no such position exists before the last char. */
  private def region1(value: String): String = {
    if (value == null) return null
    val i = value.length - 1
    var j = 0
    while (j < i && !isVowel(value.charAt(j))) j += 1
    if (j >= i) return null
    while (j < i && isVowel(value.charAt(j))) j += 1
    if (j >= i) return null
    value.substring(j + 1)
  }

  /** RV: consonant second letter → after the next vowel; two leading
    * vowels → after the next consonant; otherwise after the third
    * letter; null when the position cannot be found. */
  private def regionV(value: String): String = {
    if (value == null) return null
    val i = value.length - 1
    if (i > 0 && !isVowel(value.charAt(1))) {
      var j = 2
      while (j < i && !isVowel(value.charAt(j))) j += 1
      if (j < i) return value.substring(j + 1)
    }
    if (i > 1 && isVowel(value.charAt(0)) && isVowel(value.charAt(1))) {
      var j = 2
      while (j < i && isVowel(value.charAt(j))) j += 1
      if (j < i) return value.substring(j + 1)
    }
    if (i > 2) value.substring(3) else null
  }

  // ---- normalization ----------------------------------------------

  /** Lowercase + Portuguese accent fold (á â ã→a, é ê→e, í→i,
    * ó ô õ→o, ú ü→u, ç→c, ñ→n), then strip ONE leading and ONE
    * trailing punctuation character. */
  private def createCT(term: String): String = {
    val sb = new StringBuilder(term.length)
    term.toLowerCase.foreach {
      case 'á' | 'â' | 'ã' => sb += 'a'
      case 'é' | 'ê'       => sb += 'e'
      case 'í'             => sb += 'i'
      case 'ó' | 'ô' | 'õ' => sb += 'o'
      case 'ú' | 'ü'       => sb += 'u'
      case 'ç'             => sb += 'c'
      case 'ñ'             => sb += 'n'
      case c               => sb += c
    }
    var ct = sb.toString
    if (ct.length >= 2 && "\"'-,;.?!".indexOf(ct.charAt(0)) >= 0)
      ct = ct.substring(1)
    if (ct.length >= 2 && "-,;.?!'\"".indexOf(ct.charAt(ct.length - 1)) >= 0)
      ct = ct.substring(0, ct.length - 1)
    ct
  }

  // ---- rule tables (reference order) ------------------------------

  private def ends(value: String, sfx: String): Boolean =
    value != null && value.endsWith(sfx)

  /** Remove the suffix only if the term actually ends with it. */
  private def rmIf(ct: String, sfx: String): String =
    if (ct.endsWith(sfx)) ct.dropRight(sfx.length) else ct

  private sealed trait Reg
  private case object InR1 extends Reg
  private case object InR2 extends Reg
  private case object InRV extends Reg

  /** One step-1 rule: term must end `sfx`, the region string must also
    * end `sfx`, and (optionally) `precededBy` must precede it in the
    * term; then the suffix is replaced by `replaceWith` — unless
    * `discard` (the preserved `logias` quirk: altered, term kept). */
  private final case class R1Rule(sfx: String, reg: Reg,
      replaceWith: String = "", precededBy: String = "",
      discard: Boolean = false)

  private val Step1Rules: Vector[R1Rule] = Vector(
    R1Rule("uciones", InR2, replaceWith = "u"),
    R1Rule("imentos", InR2),
    R1Rule("amentos", InR2),
    R1Rule("adores", InR2),
    R1Rule("adoras", InR2),
    R1Rule("logias", InR2, discard = true), // rewrite result discarded
    R1Rule("encias", InR2, replaceWith = "ente"),
    R1Rule("amente", InR1), // the one R1-scoped rule
    R1Rule("idades", InR2),
    R1Rule("acoes", InR2),
    R1Rule("imento", InR2),
    R1Rule("amento", InR2),
    R1Rule("adora", InR2),
    R1Rule("ismos", InR2),
    R1Rule("istas", InR2),
    R1Rule("logia", InR2, replaceWith = "log"),
    R1Rule("ucion", InR2, replaceWith = "u"),
    R1Rule("encia", InR2, replaceWith = "ente"),
    R1Rule("mente", InR2),
    R1Rule("idade", InR2),
    R1Rule("acao", InR2),
    R1Rule("ezas", InR2),
    R1Rule("icos", InR2),
    R1Rule("icas", InR2),
    R1Rule("ismo", InR2),
    R1Rule("avel", InR2),
    R1Rule("ivel", InR2),
    R1Rule("ista", InR2),
    R1Rule("osos", InR2),
    R1Rule("osas", InR2),
    R1Rule("ador", InR2),
    R1Rule("ivas", InR2),
    R1Rule("ivos", InR2),
    R1Rule("iras", InRV, replaceWith = "ir", precededBy = "e"),
    R1Rule("eza", InR2),
    R1Rule("ico", InR2),
    R1Rule("ica", InR2),
    R1Rule("oso", InR2),
    R1Rule("osa", InR2),
    R1Rule("iva", InR2),
    R1Rule("ivo", InR2),
    R1Rule("ira", InRV, replaceWith = "ir", precededBy = "e"))

  /** Step-2 verb suffixes: (matched against RV, removed from the
    * term). The pair ("ira", "ava") is the preserved reference quirk —
    * a no-op removal that still marks the word altered and shadows the
    * later real ("ira", "ira") entry. Duplicate entries (areis, iras,
    * iu) are kept as in the reference; they can never fire. */
  private val Step2Rules: Vector[(String, String)] = {
    def same(s: String*) = s.map(x => (x, x))
    (same("issemos", "essemos", "assemos", "ariamos", "eriamos",
      "iriamos",
      "iremos", "eremos", "aremos", "avamos", "iramos", "eramos",
      "aramos", "asseis", "esseis", "isseis", "arieis", "erieis",
      "irieis",
      "irmos", "iamos", "armos", "ermos", "areis", "ereis", "ireis",
      "asses", "esses", "isses", "astes", "assem", "essem", "issem",
      "ardes", "erdes", "irdes", "ariam", "eriam", "iriam", "arias",
      "erias", "irias", "estes", "istes", "areis", "aveis",
      "aria", "eria", "iria", "asse", "esse", "isse", "aste", "este",
      "iste", "arei", "erei", "irei", "aram", "eram", "iram", "avam",
      "arem", "erem", "irem", "ando", "endo", "indo", "arao", "erao",
      "irao", "adas", "idas", "aras", "eras", "iras", "avas", "ares",
      "eres", "ires", "ados", "idos", "amos", "emos", "imos", "iras",
      "ieis",
      "ada", "ida", "ara", "era") :+ ("ira" -> "ava")) ++
      same("iam", "ado", "ido", "ias", "ais", "eis", "ira", "ear",
        "ia", "ei", "am", "em", "ar", "er", "ir", "as", "es", "is",
        "eu", "iu", "iu", "ou")
  }.toVector

  private val Step4Suffixes: Vector[String] = Vector("os", "a", "i", "o")
}
