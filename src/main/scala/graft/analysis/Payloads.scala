package graft.analysis

/** Payload producers — the reference's payload-attaching token filters
  * re-expressed as pure functions the partition-local inversion applies
  * per token (no extra pass, no shuffle).
  *
  * Reference analogs:
  *  - [[delimitedTokenize]] — DelimitedPayloadTokenFilter over a
  *    whitespace tokenizer with the float encoder
  *    (/root/reference/src/contrib/Analyzers/Payloads/
  *    DelimitedPayloadTokenFilter.cs:30-63 + FloatEncoder.cs:26): token
  *    text "term|1.5" becomes term `term` with payload 1.5f.
  *  - [[positionBoost]] — NumericPayloadTokenFilter shape
  *    (/root/reference/src/contrib/Analyzers/Payloads/
  *    NumericPayloadTokenFilter.cs:28-52): a constant float payload
  *    attached by a per-token predicate; ours predicates on the token
  *    POSITION (early-in-turn tokens carry a boost — the transcript
  *    analog of boosting title terms), which keeps the oracle
  *    SQL-expressible.
  *
  * Payload absence is Float.NaN (the codec stores no bytes for it and
  * scoring reads it back as the neutral 1.0f).
  */
object Payloads {

  /** (term, position) → payload; NaN = none. */
  type Assigner = (String, Int) => Float

  /** No payloads at all (the default chain). */
  val none: Assigner = (_, _) => Float.NaN

  /** Constant payload for tokens whose position < firstN, none after —
    * the NumericPayloadTokenFilter shape with a position predicate. */
  def positionBoost(firstN: Int, boost: Float): Assigner =
    (_, pos) => if (pos < firstN) boost else Float.NaN

  final case class PayToken(term: String, pos: Int, payload: Float)

  /** Whitespace-split then `delim`-split per token: "term|1.5" → term
    * with payload 1.5f; unparseable or absent weights yield NaN (the
    * filter's identity-encoder fallback is not modeled — weights are
    * floats, period). Lowercasing matches WhitespaceAnalyzer + an
    * explicit LowerCaseFilter chain. */
  def delimitedTokenize(text: String, delim: Char = '|'): Vector[PayToken] = {
    if (text == null) return Vector.empty
    val out = Vector.newBuilder[PayToken]
    var pos = 0
    text.split("\\s+").foreach { raw =>
      if (raw.nonEmpty) {
        val i = raw.lastIndexOf(delim)
        val (t, pay) =
          if (i < 0) (raw, Float.NaN)
          else
            (raw.substring(0, i),
              try raw.substring(i + 1).toFloat
              catch { case _: NumberFormatException => Float.NaN })
        if (t.nonEmpty) {
          out += PayToken(t.toLowerCase(java.util.Locale.ROOT), pos, pay)
          pos += 1
        }
      }
    }
    out.result()
  }
}
