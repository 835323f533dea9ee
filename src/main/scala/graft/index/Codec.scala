package graft.index

import scala.collection.mutable.ArrayBuffer

/** Variable-byte posting-block codec — pure functions over byte arrays.
  *
  * Wire format reproduces the reference's semantics (not its files):
  *  - VByte/VLong: 7-bit groups, low group first, high bit = continuation
  *    (reference /root/reference/src/core/Store/IndexOutput.cs:79-110).
  *  - Doc+freq stream: per posting, gap = docid - prevDocid;
  *    tf==1 → VLong(gap<<1 | 1); else VLong(gap<<1) then VLong(tf)
  *    (reference /root/reference/src/core/Index/FormatPostingsDocsWriter.cs:72-110).
  *  - Position stream: per occurrence, delta from previous position in the
  *    same doc, VLong-coded (reference
  *    /root/reference/src/core/Index/FormatPostingsPositionsWriter.cs:56-78,
  *    payload bit dropped — we carry no payloads).
  *  - Doc-length stream (our norms analog — exact ints instead of the
  *    lossy norm byte, see SURVEY.md §1.1): VLong(len) per posting.
  *
  * Blocks hold up to [[BlockSize]] postings of one term and carry
  * skip/WAND stats: (min_docid, max_docid, max_tf, min_len). max_tf and
  * min_len upper-bound the BM25 contribution of every posting in the
  * block (tfNorm is monotone increasing in tf, decreasing in len) — the
  * block-max WAND bound (Ding & Suel SIGIR'11), replacing the
  * reference's multi-level skip lists
  * (/root/reference/src/core/Index/MultiLevelSkipListWriter.cs:28-65).
  */
object Codec {

  /** Postings per block. 128 = the reference's term-index interval
    * (TermInfosWriter.cs:63); a pragmatic VByte block size. */
  val BlockSize = 128

  // ---- VLong primitive ----

  def writeVLong(buf: ArrayBuffer[Byte], v0: Long): Unit = {
    require(v0 >= 0, s"VLong must be non-negative: $v0")
    var v = v0
    while ((v & ~0x7fL) != 0L) {
      buf += ((v & 0x7f) | 0x80).toByte
      v >>>= 7
    }
    buf += v.toByte
  }

  /** Reads a VLong at pos; returns (value, nextPos). */
  def readVLong(bytes: Array[Byte], pos: Int): (Long, Int) = {
    var p = pos
    var b = bytes(p); p += 1
    var v = (b & 0x7f).toLong
    var shift = 7
    while ((b & 0x80) != 0) {
      b = bytes(p); p += 1
      v |= (b & 0x7f).toLong << shift
      shift += 7
    }
    (v, p)
  }

  // ---- one posting within a block ----

  final case class Posting(docid: Long, tf: Long, len: Long,
      positions: Array[Int])

  /** One encoded block of ≤ BlockSize postings for a single term. */
  final case class Block(
      term: String,
      n: Int,
      minDocid: Long,
      maxDocid: Long,
      maxTf: Long,
      minLen: Long,
      docs: Array[Byte],
      lens: Array[Byte],
      pos: Array[Byte])

  /** Encode postings (MUST be docid-ascending, one term) into blocks. */
  def encode(term: String, postings: Iterator[Posting]): Iterator[Block] =
    postings.grouped(BlockSize).map { group =>
      val docsB = new ArrayBuffer[Byte](group.size * 2)
      val lensB = new ArrayBuffer[Byte](group.size)
      val posB = new ArrayBuffer[Byte](group.size * 2)
      var prevDoc = group.head.docid // first gap = 0 relative to minDocid
      var maxTf = 0L
      var minLen = Long.MaxValue
      var prev = -1L
      group.foreach { p =>
        require(p.docid > prev || prev == -1L,
          s"postings not ascending for term=$term: ${p.docid} after $prev")
        prev = p.docid
        val gap = p.docid - prevDoc
        prevDoc = p.docid
        if (p.tf == 1L) writeVLong(docsB, (gap << 1) | 1L)
        else { writeVLong(docsB, gap << 1); writeVLong(docsB, p.tf) }
        writeVLong(lensB, p.len)
        var prevPos = 0L
        p.positions.foreach { pp =>
          writeVLong(posB, pp - prevPos); prevPos = pp
        }
        if (p.tf > maxTf) maxTf = p.tf
        if (p.len < minLen) minLen = p.len
      }
      Block(term, group.size, group.head.docid, group.last.docid,
        maxTf, minLen, docsB.toArray, lensB.toArray, posB.toArray)
    }

  def decode(b: Block): Iterator[Posting] = new Iterator[Posting] {
    private var i = 0
    private var dp = 0
    private var lp = 0
    private var pp = 0
    private var docid = b.minDocid
    override def hasNext: Boolean = i < b.n
    override def next(): Posting = {
      val (code, dp1) = readVLong(b.docs, dp); dp = dp1
      docid += (code >>> 1)
      val tf =
        if ((code & 1L) == 1L) 1L
        else { val (t, dp2) = readVLong(b.docs, dp); dp = dp2; t }
      val (len, lp1) = readVLong(b.lens, lp); lp = lp1
      val positions = new Array[Int](tf.toInt)
      var prevPos = 0L
      var k = 0
      while (k < tf) {
        val (d, pp1) = readVLong(b.pos, pp); pp = pp1
        prevPos += d
        positions(k) = prevPos.toInt
        k += 1
      }
      i += 1
      Posting(docid, tf, len, positions)
    }
  }
}
