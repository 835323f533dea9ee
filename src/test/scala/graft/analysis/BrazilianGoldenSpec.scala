package graft.analysis

import org.scalatest.funsuite.AnyFunSuite

/** Golden validation of [[BrazilianStemmer]] against the reference's
  * own test vectors (`test/contrib/Analyzers/Br/TestBrazilianStemmer
  * .cs` — TestWithSnowballExamples + TestNormalization, transcribed
  * verbatim; the fixtures are inline in the C# test, not a data file).
  * The vectors encode the chain's deviations from Snowball Portuguese
  * (accent folding, the altered `quintessência → quintessente`) and
  * the abstain cases (too-short `áá` unchanged WITH its accents,
  * non-letter `quimio5terápicos` folded but unstemmed). */
class BrazilianGoldenSpec extends AnyFunSuite {

  /** Every Check(input, expected) pair of the reference test. The
    * reference runs them through the full BrazilianAnalyzer; none of
    * the inputs is a stop word, so analyzer output == filter output
    * == stem(lowercased token). */
  private val golden: Seq[(String, String)] = Seq(
    "boa" -> "boa",
    "boainain" -> "boainain",
    "boas" -> "boas",
    "bôas" -> "boas",
    "boassu" -> "boassu",
    "boataria" -> "boat",
    "boate" -> "boat",
    "boates" -> "boat",
    "boatos" -> "boat",
    "bob" -> "bob",
    "boba" -> "bob",
    "bobagem" -> "bobag",
    "bobagens" -> "bobagens",
    "bobalhões" -> "bobalho",
    "bobear" -> "bob",
    "bobeira" -> "bobeir",
    "bobinho" -> "bobinh",
    "bobinhos" -> "bobinh",
    "bobo" -> "bob",
    "bobs" -> "bobs",
    "boca" -> "boc",
    "bocadas" -> "boc",
    "bocadinho" -> "bocadinh",
    "bocado" -> "boc",
    "bocaiúva" -> "bocaiuv",
    "boçal" -> "bocal",
    "bocarra" -> "bocarr",
    "bocas" -> "boc",
    "bode" -> "bod",
    "bodoque" -> "bodoqu",
    "body" -> "body",
    "boeing" -> "boeing",
    "boem" -> "boem",
    "boemia" -> "boem",
    "boêmio" -> "boemi",
    "bogotá" -> "bogot",
    "boi" -> "boi",
    "bóia" -> "boi",
    "boiando" -> "boi",
    "quiabo" -> "quiab",
    "quicaram" -> "quic",
    "quickly" -> "quickly",
    "quieto" -> "quiet",
    "quietos" -> "quiet",
    "quilate" -> "quilat",
    "quilates" -> "quilat",
    "quilinhos" -> "quilinh",
    "quilo" -> "quil",
    "quilombo" -> "quilomb",
    "quilométricas" -> "quilometr",
    "quilométricos" -> "quilometr",
    "quilômetro" -> "quilometr",
    "quilômetros" -> "quilometr",
    "quilos" -> "quil",
    "quimica" -> "quimic",
    "quimicas" -> "quimic",
    "quimico" -> "quimic",
    "quimicos" -> "quimic",
    "quimioterapia" -> "quimioterap",
    "quimioterápicos" -> "quimioterap",
    "quimono" -> "quimon",
    "quincas" -> "quinc",
    "quinhão" -> "quinha",
    "quinhentos" -> "quinhent",
    "quinn" -> "quinn",
    "quino" -> "quin",
    "quinta" -> "quint",
    "quintal" -> "quintal",
    "quintana" -> "quintan",
    "quintanilha" -> "quintanilh",
    "quintão" -> "quinta",
    "quintessência" -> "quintessente",
    "quintino" -> "quintin",
    "quinto" -> "quint",
    "quintos" -> "quint",
    "quintuplicou" -> "quintuplic",
    "quinze" -> "quinz",
    "quinzena" -> "quinzen",
    "quiosque" -> "quiosqu",
    // TestNormalization (lowercase is the analyzer's; stem() receives
    // the raw term and folds it itself, so these hold directly)
    "Brasil" -> "brasil",
    "Brasília" -> "brasil",
    "quimio5terápicos" -> "quimio5terapicos",
    "áá" -> "áá",
    "ááá" -> "aaa")

  test("stemmer matches every reference TestBrazilianStemmer vector") {
    val mismatches = golden.collect {
      case (w, s) if BrazilianStemmer.stem(w) != s =>
        s"$w: got ${BrazilianStemmer.stem(w)}, reference $s"
    }
    assert(mismatches.isEmpty,
      s"${mismatches.size} of ${golden.size} diverge: " +
        mismatches.mkString("; "))
  }

  test("Brazilian chain: stop set is unaccented, stems are folded") {
    // literal "nao" IS stopped (BrazilianAnalyzer.cs:41 list), but
    // accented "não" is NOT (the list is unaccented) — it reaches the
    // stemmer, which folds it to "nao": one surviving "nao", at the
    // accented token's position, with stop gaps preserved
    val ts = Analyzers.tokenize(Analyzers.Brazilian,
      "nao gosto, não gosto das boates")
    assert(ts.map(t => t.term -> t.pos) == Vector(
      "gost" -> 1, "nao" -> 2, "gost" -> 3, "boat" -> 5))
  }

  test("stem-exclusion table via StemAdjusted (reference exclusion test)") {
    // TestStemExclusionTable: an excluded word passes fully unchanged
    val kind = Analyzers.StemAdjusted(Analyzers.Brazilian,
      exclusions = Set("quintessência"))
    val ts = Analyzers.tokenize(kind, "quintessência")
    assert(ts.map(_.term) == Vector("quintessência"))
    val un = Analyzers.tokenize(Analyzers.Brazilian, "quintessência")
    assert(un.map(_.term) == Vector("quintessente"))
  }

  test("abstain contract: null-stem tokens pass through the filter") {
    // length <= 2 or >= 30 after folding → stemmer abstains
    assert(BrazilianStemmer.stemOrNull("áá") == null)
    assert(BrazilianStemmer.stem("x" * 30) == "x" * 30)
    assert(BrazilianStemmer.stemOrNull("x" * 30) == null)
  }
}
