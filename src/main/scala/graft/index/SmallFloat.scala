package graft.index

/** Lossy float↔byte codec for norms — the reference encodes one norm
  * byte per doc per field via a tiny floating-point format with a
  * 3-bit mantissa and 5-bit-ranged exponent zero-shifted by 15
  * (SmallFloat.FloatToByte315, /root/reference/src/core/Util/
  * SmallFloat.cs:151 LoC; consumed by Similarity.EncodeNorm /
  * DecodeNorm, Similarity.cs:434-439,501-503 via a 256-entry decode
  * table). The engine scores from exact integer lengths (SURVEY §1.1),
  * so this codec is not in the scoring path — it exists as the
  * compatibility surface: a user migrating stored norm bytes gets the
  * identical quantization.
  *
  * Implemented from the published format definition, not the reference
  * source: the byte is the top (1 + exponent-bits + mantissa-bits) of
  * the IEEE-754 single's bit pattern, re-biased so the byte value 0
  * lands at the chosen zero exponent; out-of-range values clamp
  * (negative/zero → 0, positives below the format's zero band → 1, the
  * zero band [2^-31, 1.125·2^-31) itself → 0, too large → 255 — the
  * boundary is the reference's strict-< test, including its
  * non-monotone underflow quirk).
  */
object SmallFloat {

  /** floatToByte(f, mantissaBits = 3, zeroExp = 15) — the "315" format
    * used for norms. */
  def floatToByte315(f: Float): Byte = {
    val fzero = (63 - 15) << 3
    val bits = java.lang.Float.floatToRawIntBits(f)
    val small = bits >> (24 - 3)
    // strict <: small == fzero encodes byte 0 through the final branch
    // (positives in [2^-31, 1.125*2^-31) quantize to zero, exactly as
    // the format's underflow boundary defines)
    if (small < fzero) { if (bits <= 0) 0 else 1 }
    else if (small >= fzero + 0x100) -1
    else (small - fzero).toByte
  }

  /** byteToFloat(b, mantissaBits = 3, zeroExp = 15). Total — every byte
    * decodes; 0 decodes to 0.0 (the only non-positive representable). */
  def byte315ToFloat(b: Byte): Float = {
    if (b == 0) return 0.0f
    var bits = (b & 0xff) << (24 - 3)
    bits += (63 - 15) << 24
    java.lang.Float.intBitsToFloat(bits)
  }

  /** The reference's 256-entry norm decode table
    * (Similarity.cs NORM_TABLE shape). */
  lazy val normTable: Array[Float] =
    Array.tabulate(256)(i => byte315ToFloat(i.toByte))

  /** EncodeNorm/DecodeNorm pair: norm = lengthNorm quantized through the
    * byte. */
  def encodeNorm(f: Float): Byte = floatToByte315(f)
  def decodeNorm(b: Byte): Float = normTable(b & 0xff)
}
