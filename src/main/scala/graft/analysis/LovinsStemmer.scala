package graft.analysis

/** Lovins stemmer (J.B. Lovins, 1968, "Development of a stemming
  * algorithm"), implemented from the published algorithm as realized by
  * the Snowball project's lovins script — the reference ships the
  * Snowball-compiler output at
  * /root/reference/src/contrib/Snowball/SF/Snowball/Ext/LovinsStemmer.cs:11.
  * This generation carries 263 endings (not the paper's full 294); the
  * table below reproduces its ending→condition map exactly.
  *
  * Three passes, longest-match-wins with NO fallback (a matched ending
  * whose context condition fails removes nothing — e.g. `nationally`
  * matches `ationally` with condition B, stem "n" is too short, and
  * the word is left whole rather than trying `ally`):
  *  1. endings: remove the longest registered ending whose condition
  *     (A-CC: minimum stem lengths and stem-final letter tests) holds;
  *  2. undouble: a final bb/dd/gg/ll/mm/nn/pp/rr/ss/tt loses one letter;
  *  3. respell: 34 fixed transformations (uct→uc, metr→meter,
  *     olv→olut, yz→ys, ...), some gated on the preceding letter.
  */
object LovinsStemmer {

  /** (ending, condition letter), in the reference table's order. */
  private val Spec: Seq[(String, String)] = Seq(
    "ia:A", "ata:A", "aic:A", "allic:BB", "aric:A", "atic:B", "itic:H",
    "antic:C", "istic:A", "alistic:B", "aristic:A", "ivistic:A", "anced:B",
    "enced:A", "ished:A", "ied:A", "ened:E", "ioned:A", "ated:I",
    "ented:C", "ized:F", "arized:A", "aroid:A", "ehood:A", "ihood:A",
    "elihood:E", "ae:A", "ance:B", "icance:A", "ence:A", "ide:L",
    "icide:A", "otide:A", "age:B", "able:A", "atable:A", "izable:E",
    "arizable:A", "ible:A", "encible:A", "ene:E", "ine:M", "idine:I",
    "ature:E", "eature:Z", "ese:A", "wise:A", "ate:A", "entiate:A",
    "inate:A", "ionate:D", "ite:AA", "ive:A", "ative:A", "ize:F",
    "alize:A", "icalize:A", "ialize:A", "entialize:A", "ionalize:A",
    "arize:A", "ancing:B", "encing:A", "aging:B", "ening:E", "ioning:A",
    "ating:I", "enting:C", "ying:B", "izing:F", "arizing:A", "yish:A",
    "ical:A", "aical:A", "istical:A", "oidal:A", "eal:Y", "ial:A",
    "ancial:A", "arial:A", "ential:A", "ional:A", "ational:B",
    "izational:A", "ental:A", "eful:A", "iful:A", "icism:A", "oidism:A",
    "alism:B", "icalism:A", "ionalism:A", "inism:J", "ativism:A", "ium:A",
    "ician:A", "ogen:A", "ion:Q", "ation:B", "ication:G", "entiation:A",
    "ination:A", "isation:A", "arisation:A", "entation:A", "ization:F",
    "arization:A", "action:G", "ear:Y", "arizer:A", "ator:A", "'s:A",
    "as:B", "ics:A", "istics:A", "es:E", "ances:B", "ences:A", "ides:L",
    "oides:A", "ages:B", "ies:P", "acies:A", "ancies:A", "encies:A",
    "aries:A", "ities:A", "alities:A", "ivities:A", "ines:M", "nesses:A",
    "ates:A", "atives:A", "ings:N", "is:A", "als:BB", "ials:A",
    "entials:A", "ionals:A", "isms:B", "ians:A", "icians:A", "ions:B",
    "ations:B", "arisations:A", "entations:A", "izations:A",
    "arizations:A", "ars:O", "iers:A", "izers:F", "ators:A", "less:A",
    "eless:A", "ness:A", "eness:E", "ableness:A", "eableness:E",
    "ibleness:A", "ateness:A", "iteness:A", "iveness:A", "ativeness:A",
    "ingness:A", "ishness:A", "iness:A", "ariness:E", "alness:A",
    "icalness:A", "antialness:A", "entialness:A", "ionalness:A",
    "fulness:A", "lessness:A", "ousness:A", "eousness:A", "iousness:A",
    "itousness:A", "entness:A", "ants:B", "ists:A", "icists:A", "us:V",
    "ous:A", "eous:A", "aceous:A", "antaneous:A", "ious:A", "acious:B",
    "itous:A", "icant:A", "ement:A", "izement:A", "icist:A", "alist:A",
    "icalist:A", "ialist:A", "ionist:A", "entist:A", "acy:A", "ancy:B",
    "ency:A", "ly:B", "ealy:Y", "ably:A", "ibly:A", "edly:E", "iedly:A",
    "ely:E", "ately:A", "ively:A", "atively:A", "ingly:B", "atingly:A",
    "ily:A", "lily:A", "arily:A", "ally:B", "ically:A", "aically:A",
    "allically:C", "istically:A", "alistically:B", "oidally:A", "ially:A",
    "entially:A", "ionally:A", "ationally:B", "izationally:B", "entally:A",
    "fully:A", "efully:A", "ifully:A", "enly:E", "arly:K", "early:Y",
    "lessly:A", "ously:A", "eously:A", "iously:A", "ently:A", "ary:F",
    "ery:E", "icianry:A", "atory:A", "ity:A", "acity:A", "icity:A",
    "eity:A", "ality:A", "icality:A", "iality:A", "antiality:A",
    "entiality:A", "ionality:A", "elity:A", "ability:A", "izability:A",
    "arizability:A", "ibility:A", "inity:CC", "arity:B", "ivity:A"
  ).map { sc =>
    val Array(suf, c) = sc.split(":"); (suf, c)
  }

  private val CondOf: Map[String, String] = Spec.toMap

  /** Context conditions, applied to the candidate STEM. */
  private def cond(c: String, st: String): Boolean = {
    val n = st.length
    def last = st(n - 1)
    def ends(x: String) = st.endsWith(x)
    c match {
      case "A" => n >= 2
      case "B" => n >= 3
      case "C" => n >= 4
      case "D" => n >= 5
      case "E" => n >= 2 && last != 'e'
      case "F" => n >= 3 && last != 'e'
      case "G" => n >= 3 && last == 'f'
      case "H" => n >= 2 && (last == 't' || ends("ll"))
      case "I" => n >= 2 && last != 'o' && last != 'e'
      case "J" => n >= 2 && last != 'a' && last != 'e'
      case "K" => n >= 3 &&
        (last == 'l' || last == 'i' || (last == 'e' && st(n - 3) == 'u'))
      case "L" => n >= 2 && last != 'u' && last != 'x' &&
        !(last == 's' && st(n - 2) != 'o')
      case "M" => n >= 2 && "acem".indexOf(last) < 0
      case "N" => n >= 3 && (n >= 4 || st(n - 3) != 's')
      case "O" => n >= 2 && (last == 'l' || last == 'i')
      case "P" => n >= 2 && last != 'c'
      case "Q" => n >= 3 && last != 'l' && last != 'n'
      case "R" => n >= 2 && (last == 'n' || last == 'r')
      case "S" => n >= 2 && (ends("dr") || (last == 't' && !ends("tt")))
      case "T" => n >= 2 && (last == 's' || (last == 't' && !ends("ot")))
      case "U" => n >= 2 && "lmnr".indexOf(last) >= 0
      case "V" => n >= 2 && last == 'c'
      case "W" => n >= 2 && last != 's' && last != 'u'
      case "X" => n >= 2 && (last == 'l' || last == 'i' ||
        (n >= 3 && last == 'e' && st(n - 3) == 'u'))
      case "Y" => n >= 2 && ends("in")
      case "Z" => n >= 2 && last != 'f'
      case "AA" => n >= 2 && (last == 'd' || last == 'f' || ends("ph") ||
        ends("th") || last == 'l' || ends("er") || ends("or") ||
        ends("es") || last == 't')
      case "BB" => n >= 3 && !ends("met") && !ends("ryst")
      case "CC" => n >= 2 && last == 'l'
      case _ => false
    }
  }

  /** respell transformations: (suffix, replacement, forbidden chars
    * immediately before the suffix — empty = unconditional). */
  private val Respell: Seq[(String, String, String)] = Seq(
    ("iev", "ief", ""), ("uct", "uc", ""), ("umpt", "um", ""),
    ("rpt", "rb", ""), ("urs", "ur", ""), ("istr", "ister", ""),
    ("metr", "meter", ""), ("olv", "olut", ""), ("ul", "l", "aio"),
    ("bex", "bic", ""), ("dex", "dic", ""), ("pex", "pic", ""),
    ("tex", "tic", ""), ("ax", "ac", ""), ("ex", "ec", ""),
    ("ix", "ic", ""), ("lux", "luc", ""), ("uad", "uas", ""),
    ("vad", "vas", ""), ("cid", "cis", ""), ("lid", "lis", ""),
    ("erid", "eris", ""), ("pand", "pans", ""), ("end", "ens", "s"),
    ("ond", "ons", ""), ("lud", "lus", ""), ("rud", "rus", ""),
    ("her", "hes", "pt"), ("mit", "mis", ""), ("ent", "ens", "m"),
    ("ert", "ers", ""), ("et", "es", "n"), ("yt", "ys", ""),
    ("yz", "ys", ""))

  private val Doubles = "bdglmnprst".toSet

  def stem(word: String): String = {
    if (word == null || word.isEmpty) return ""
    var s = word.toLowerCase(java.util.Locale.ROOT)

    // 1. endings (longest match; condition failure removes nothing)
    Spec.map(_._1).filter(s.endsWith).sortBy(-_.length).headOption
      .foreach { suf =>
        val st = s.substring(0, s.length - suf.length)
        if (cond(CondOf(suf), st)) s = st
      }

    // 2. undouble
    if (s.length >= 2 && s(s.length - 1) == s(s.length - 2) &&
      Doubles(s.last)) s = s.dropRight(1)

    // 3. respell (longest match; letter-gated entries remove nothing
    // when the gate fails)
    Respell.filter(r => s.endsWith(r._1)).sortBy(-_._1.length).headOption
      .foreach { case (suf, rep, forbidden) =>
        val p = s.length - suf.length
        val blocked = forbidden.nonEmpty && p >= 1 &&
          forbidden.indexOf(s(p - 1)) >= 0
        if (!blocked) s = s.substring(0, p) + rep
      }
    s
  }
}
