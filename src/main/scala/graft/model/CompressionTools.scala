package graft.model

import java.util.zip.{Deflater, Inflater}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Stored-field compression
  * (/root/reference/src/core/Document/CompressionTools.cs: zlib
  * deflate/inflate over field bytes, BEST_COMPRESSION). Same codec
  * (RFC 1950 zlib via java.util.zip), same default level. Plain JVM
  * functions plus Column wrappers — stored-field (de)compression is a
  * per-row byte transform on the STORE path, never in a scoring plan,
  * so a non-codegen UDF is the honest shape (the parquet store already
  * page-compresses; this is the API-compatibility surface for blobs a
  * user compressed with the reference and wants to read back). */
object CompressionTools {

  def compress(bytes: Array[Byte],
      level: Int = Deflater.BEST_COMPRESSION): Array[Byte] = {
    val d = new Deflater(level)
    try {
      d.setInput(bytes)
      d.finish()
      val out = new java.io.ByteArrayOutputStream(
        math.max(32, bytes.length / 2))
      val buf = new Array[Byte](4096)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    } finally d.end()
  }

  def decompress(bytes: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    try {
      inf.setInput(bytes)
      val out = new java.io.ByteArrayOutputStream(
        math.max(32, bytes.length * 2))
      val buf = new Array[Byte](4096)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && !inf.finished())
          throw new IllegalArgumentException(
            if (inf.needsInput()) "truncated zlib stream"
            else "unsupported zlib stream (preset dictionary)")
        out.write(buf, 0, n)
      }
      out.toByteArray
    } finally inf.end()
  }

  def compressString(s: String): Array[Byte] =
    compress(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  def decompressString(b: Array[Byte]): String =
    new String(decompress(b), java.nio.charset.StandardCharsets.UTF_8)

  /** Column forms (binary → binary). */
  val compressCol: Column => Column = {
    val u = udf((b: Array[Byte]) => if (b == null) null else compress(b))
    c => u(c)
  }
  val decompressCol: Column => Column = {
    val u = udf((b: Array[Byte]) => if (b == null) null else decompress(b))
    c => u(c)
  }
}
