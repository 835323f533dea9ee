package graft.analysis

/** Knuth–Liang pattern hyphenation — the engine under the reference's
  * hyphenation-based decompounder (`src/contrib/Analyzers/Compound/
  * Hyphenation/HyphenationTree.cs`, a FOP port; the wrapping
  * `HyphenationCompoundWordTokenFilter.cs` ships with its body
  * commented out — an unfinished port — so the semantics here follow
  * that documented source and Liang's published algorithm, validated
  * against the classic TeXbook worked example in HyphenatorSpec).
  *
  * Patterns are the standard Liang strings (letters with interleaved
  * digits, '.' = word-boundary marker, e.g. ".ach4", "hy3ph"): a
  * pattern matching anywhere in the dotted word contributes its digit
  * at each letter boundary it covers, maxed across all matching
  * patterns; a break is legal where the final value is ODD. The
  * reference walks a ternary tree; a first-char-indexed flat scan
  * computes the identical max-fold (pattern sets are data the caller
  * supplies — none ship with the reference checkout).
  *
  * Exceptions ("as-so-ciate") override the patterns for whole words.
  *
  * Deviation (documented): the reference's normalizer skips leading /
  * trailing non-letters and nulls out on interior ones; tokens here
  * arrive from an analyzer chain that never carries edge punctuation,
  * so any non-letter simply makes the word unhyphenatable.
  */
final class Hyphenator(patternStrings: Seq[String],
    exceptionStrings: Seq[String] = Nil) extends Serializable {

  /** (letters incl. '.' markers, boundary digit values of size
    * letters.length + 1), indexed by first char. */
  private val byFirst: Map[Char, Array[(String, Array[Int])]] =
    patternStrings.iterator.map(Hyphenator.parsePattern).toArray
      .groupBy(_._1.charAt(0))

  /** word → inner break positions (prefix lengths), from '-' marks. */
  private val exceptions: Map[String, Vector[Int]] =
    exceptionStrings.iterator.map { e =>
      val breaks = Vector.newBuilder[Int]
      var letters = 0
      e.foreach { c =>
        if (c == '-') breaks += letters else letters += 1
      }
      e.replace("-", "") -> breaks.result()
    }.toMap

  /** Hyphenation points as prefix lengths INCLUDING the synthetic 0
    * and word-length endpoints (`HyphenationTree.cs` res[0]/res[k+1]);
    * None when the word is too short, non-letter, or has no legal
    * break — the reference's null. `remain`/`push` are the minimum
    * letters before the first / after the last break (the compound
    * filter passes 1/1). */
  def hyphenate(word: String, remain: Int = 1, push: Int = 1)
      : Option[Vector[Int]] = {
    val len = word.length
    if (len < remain + push || !word.forall(_.isLetter)) return None
    val inner: Vector[Int] = exceptions.get(word) match {
      case Some(brs) =>
        // exception path bounds: j >= remain && j < len - push
        // (strict <, unlike the pattern path's <= — reference quirk)
        brs.filter(j => j >= remain && j < len - push)
      case None =>
        val dotted = "." + word + "."
        val il = new Array[Int](len + 3)
        var i = 0
        while (i <= len) { searchAt(dotted, i, il); i += 1 }
        (0 until len).iterator
          .filter(i => (il(i + 1) & 1) == 1 &&
            i >= remain && i <= len - push)
          .toVector
    }
    if (inner.isEmpty) None else Some(0 +: inner :+ len)
  }

  /** Fold every pattern that matches the dotted word AT `pos` into the
    * boundary-value array (max per boundary). */
  private def searchAt(dotted: String, pos: Int, il: Array[Int]): Unit =
    byFirst.get(dotted.charAt(pos)).foreach { pats =>
      var p = 0
      while (p < pats.length) {
        val (letters, values) = pats(p)
        if (dotted.regionMatches(pos, letters, 0, letters.length)) {
          var k = 0
          while (k < values.length) {
            val idx = pos + k
            if (idx < il.length && values(k) > il(idx)) il(idx) = values(k)
            k += 1
          }
        }
        p += 1
      }
    }
}

object Hyphenator {

  /** "hy3ph" → ("hyph", [0,0,3,0,0]): values(k) is the digit at the
    * boundary BEFORE letter k (values(last) = after the final one). */
  private[analysis] def parsePattern(p: String): (String, Array[Int]) = {
    val letters = new StringBuilder
    val values = Vector.newBuilder[Int]
    var pending = 0
    p.foreach { c =>
      if (c.isDigit) pending = c - '0'
      else { values += pending; pending = 0; letters += c }
    }
    values += pending
    (letters.toString, values.result().toArray)
  }

  /** Minimal loader for the FOP/OFFO hyphenation-XML format the
    * reference's PatternParser.cs reads: the whitespace-separated
    * bodies of `<patterns>` and `<exceptions>`, XML comments stripped;
    * `<classes>` and custom hyphen chars are not supported (the
    * standard files use plain '-'). */
  def fromXml(text: String): Hyphenator = {
    val noComments = text.replaceAll("(?s)<!--.*?-->", "")
    def body(tag: String): Seq[String] =
      s"(?s)<$tag[^>]*>(.*?)</$tag>".r.findFirstMatchIn(noComments)
        .map(_.group(1)).getOrElse("")
        .split("\\s+").toSeq.filter(_.nonEmpty)
    new Hyphenator(body("patterns"), body("exceptions"))
  }
}
