package graft.analysis

/** contrib Miscellaneous token-stream combinators (reference dir
  * src/contrib/Analyzers/Miscellaneous — the SURVEY §2.2 grab-bag row):
  * streams here are materialized token vectors, like every analyzer in
  * this engine, and tokens carry the offset attribute the combinators
  * exist to rewrite. The reference's mutable IncrementToken plumbing
  * becomes pure vector concatenation + a last-token fold. */
object MiscStreams {

  /** The attribute surface the reference combinators read/write
    * (term, position increment, start/end offset — Token.cs shape). */
  final case class MToken(term: String, start: Int, end: Int,
      posInc: Int = 1, tpe: String = "word")

  /** EmptyTokenStream.cs: a stream that yields nothing. */
  val emptyStream: Vector[MToken] = Vector.empty

  /** SingleTokenTokenStream.cs: exactly one (immutable) token. */
  def singleToken(t: MToken): Vector[MToken] = Vector(t)

  /** WhitespaceTokenizer WITH offsets (the misc tests' input shape):
    * maximal non-space runs, offsets in original coordinates. */
  def whitespaceWithOffsets(text: String): Vector[MToken] = {
    val out = Vector.newBuilder[MToken]
    var i = 0
    while (i < text.length) {
      if (!text.charAt(i).isWhitespace) {
        val s = i
        while (i < text.length && !text.charAt(i).isWhitespace) i += 1
        out += MToken(text.substring(s, i), s, i)
      } else i += 1
    }
    out.result()
  }

  /** PrefixAwareTokenStream.cs:85 (PrefixAwareTokenFilter): joins two
    * streams; every suffix token is updated against the LAST prefix
    * token (the default update adds the last prefix end offset to the
    * suffix token's start and end). An empty prefix leaves suffix
    * tokens untouched (the reference's fresh Token has end offset 0). */
  def prefixAware(prefix: Vector[MToken], suffix: Vector[MToken],
      update: (MToken, MToken) => MToken = shiftBeyond): Vector[MToken] = {
    val lastPrefix = prefix.lastOption.getOrElse(MToken("", 0, 0))
    prefix ++ suffix.map(update(_, lastPrefix))
  }

  /** The default UpdateSuffixToken (PrefixAwareTokenStream.cs:158). */
  def shiftBeyond(suffixToken: MToken, lastPrefixToken: MToken): MToken =
    suffixToken.copy(start = lastPrefixToken.end + suffixToken.start,
      end = lastPrefixToken.end + suffixToken.end)

  /** InjectablePrefixAwareTokenFilter.cs: [[prefixAware]] with a
    * caller-supplied update action — in Scala the function parameter
    * IS the injection point; this named wrapper keeps the reference
    * surface explicit. */
  def injectablePrefixAware(prefix: Vector[MToken],
      suffix: Vector[MToken],
      updateAction: (MToken, MToken) => MToken): Vector[MToken] =
    prefixAware(prefix, suffix, updateAction)

  /** PrefixAndSuffixAwareTokenFilter.cs:33: prefix ++ input ++ suffix,
    * input shifted past the prefix, suffix shifted past the (shifted)
    * input — literally two linked [[prefixAware]] passes, exactly the
    * reference's nested InjectablePrefixAwareTokenFilter pair. */
  def prefixAndSuffixAware(prefix: Vector[MToken], input: Vector[MToken],
      suffix: Vector[MToken]): Vector[MToken] =
    prefixAware(prefixAware(prefix, input), suffix)
}
