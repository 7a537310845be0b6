package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._

/** Hand-rolled gzip (RFC 1952) DECODER over the shared DEFLATE
  * machinery of [[PngCodec]] — the container a real crawl pipeline
  * actually ingests (Common Crawl ships `.warc.gz`, one gzip MEMBER
  * per WARC record, members concatenated per file; the reference's
  * closest cell is the chunked byte source `sourceHandle`,
  * `/root/reference/src/Data/Conduino/Combinators.hs:280-288`, already
  * ported as fileChunks — this adds the decompression step in front).
  *
  * Differences from the PNG zlib path, both load-bearing:
  *   - gzip frames DEFLATE with its own header (magic/CM/FLG + the
  *     optional FEXTRA/FNAME/FCOMMENT/FHCRC fields) and trailer
  *     (CRC-32 + ISIZE), where zlib uses a 2-byte header and Adler-32;
  *   - the uncompressed size is NOT known before inflating (ISIZE sits
  *     AFTER the deflate stream), so decoding uses a growable output
  *     buffer rather than PNG's exact `expectLen` preallocation, and
  *     the trailer is verified AFTER the fact — both checksum and
  *     length, fail-closed.
  *
  * Strictly validating, null on ANY malformation (bad magic, reserved
  * FLG bits, truncation, over-subscribed Huffman code, CRC or ISIZE
  * mismatch, trailing garbage that is not another member) — the strict
  * NULL is what the dispatch tier uses as its format sniffer, same
  * discipline as the WAV/BMP/PNG codecs.
  *
  * Decoding is a per-row single pass; as a Spark operator this is a
  * map-only codegen'd projection — at 100 TB the cost is the scan plus
  * the inflate, zero shuffle.
  */
object GzipCodec {

  /** Output cap per decoded FILE — the budget accumulates across all
    * members of a multi-member buffer (256 MiB total, not per member) —
    * a zip-bomb guard: DEFLATE's max ratio is 1032:1, so any genuine
    * crawl shard stays far below; fail-closed beyond it rather than
    * OOM an executor.
    */
  val MaxOutput: Int = 256 << 20

  import PngCodec.{BitReader, Huffman, Malformed}

  /** Growable LZ77 sliding-window output buffer. */
  private final class OutBuf {
    private var buf = new Array[Byte](64 << 10)
    var n = 0
    private def ensure(extra: Int): Unit = {
      if (n + extra > MaxOutput) throw Malformed
      if (n + extra > buf.length) {
        var cap = buf.length
        while (cap < n + extra) cap <<= 1
        buf = java.util.Arrays.copyOf(buf, math.min(cap, MaxOutput))
      }
    }
    def put(b: Byte): Unit = { ensure(1); buf(n) = b; n += 1 }
    def putRaw(src: Array[Byte], from: Int, len: Int): Unit = {
      ensure(len); System.arraycopy(src, from, buf, n, len); n += len
    }
    /** LZ77 back-reference copy (byte-at-a-time: ranges may overlap). */
    def copyBack(distance: Int, len: Int): Unit = {
      if (distance <= 0 || distance > n) throw Malformed
      ensure(len)
      var j = 0
      while (j < len) { buf(n) = buf(n - distance); n += 1; j += 1 }
    }
    def bytes(from: Int): Array[Byte] = java.util.Arrays.copyOfRange(buf, from, n)
  }

  /** One Huffman-coded block into the growable buffer (the PNG
    * decodeBlock with the fixed-size output swapped for [[OutBuf]]).
    */
  private def decodeBlock(r: BitReader, lit: Huffman, dist: Huffman,
                          out: OutBuf): Unit = {
    var eob = false
    while (!eob) {
      val sym = lit.decode(r)
      if (sym < 256) out.put(sym.toByte)
      else if (sym == 256) eob = true
      else {
        val li = sym - 257
        if (li >= PngCodec.LenBase.length) throw Malformed
        val len = PngCodec.LenBase(li) + r.readBits(PngCodec.LenExtra(li))
        val d = dist.decode(r)
        if (d >= PngCodec.DistBase.length) throw Malformed
        val distance = PngCodec.DistBase(d) + r.readBits(PngCodec.DistExtra(d))
        out.copyBack(distance, len)
      }
    }
  }

  /** Inflate one complete DEFLATE stream starting at the reader's
    * position into `out`; leaves the reader byte-aligned just past the
    * stream's final block.
    */
  private def inflateInto(r: BitReader, out: OutBuf): Unit = {
    var fin = false
    while (!fin) {
      fin = r.readBits(1) == 1
      r.readBits(2) match {
        case 0 => // stored
          r.alignByte()
          if (r.pos + 4 > r.data.length) throw Malformed
          val len = (r.data(r.pos) & 0xff) | ((r.data(r.pos + 1) & 0xff) << 8)
          val nlen = (r.data(r.pos + 2) & 0xff) | ((r.data(r.pos + 3) & 0xff) << 8)
          if ((len ^ 0xffff) != nlen) throw Malformed
          r.pos += 4
          if (r.pos + len > r.data.length) throw Malformed
          out.putRaw(r.data, r.pos, len)
          r.pos += len
        case 1 =>
          decodeBlock(r, PngCodec.FixedLit, PngCodec.FixedDist, out)
        case 2 =>
          val (lit, dist) = PngCodec.readDynamicTables(r)
          decodeBlock(r, lit, dist, out)
        case _ => throw Malformed // BTYPE 11 is reserved
      }
    }
    r.alignByte()
  }

  // gzip FLG bits (RFC 1952 §2.3.1)
  private val FHCRC = 2
  private val FEXTRA = 4
  private val FNAME = 8
  private val FCOMMENT = 16

  private def le16(a: Array[Byte], off: Int): Int =
    (a(off) & 0xff) | ((a(off + 1) & 0xff) << 8)
  private def le32(a: Array[Byte], off: Int): Long =
    (a(off) & 0xffL) | ((a(off + 1) & 0xffL) << 8) |
      ((a(off + 2) & 0xffL) << 16) | ((a(off + 3) & 0xffL) << 24)

  /** Parse one member header starting at `pos`; returns the offset of
    * the deflate stream.
    */
  private def memberHeader(a: Array[Byte], pos: Int): Int = {
    if (pos + 10 > a.length) throw Malformed
    if ((a(pos) & 0xff) != 0x1f || (a(pos + 1) & 0xff) != 0x8b) throw Malformed
    if ((a(pos + 2) & 0xff) != 8) throw Malformed // CM: deflate only
    val flg = a(pos + 3) & 0xff
    if ((flg & 0xe0) != 0) throw Malformed // reserved bits must be zero
    var p = pos + 10 // skip MTIME(4) XFL OS
    if ((flg & FEXTRA) != 0) {
      if (p + 2 > a.length) throw Malformed
      p += 2 + le16(a, p)
    }
    if ((flg & FNAME) != 0) {
      while (p < a.length && a(p) != 0) p += 1
      if (p >= a.length) throw Malformed
      p += 1
    }
    if ((flg & FCOMMENT) != 0) {
      while (p < a.length && a(p) != 0) p += 1
      if (p >= a.length) throw Malformed
      p += 1
    }
    if ((flg & FHCRC) != 0) {
      if (p + 2 > a.length) throw Malformed
      p += 2 // header CRC16 present; skip (payload CRC32 is verified)
    }
    if (p > a.length) throw Malformed
    p
  }

  /** Decompress a complete (possibly multi-member) gzip buffer; null on
    * any malformation. Members' outputs are concatenated — the
    * `gzip -c a b > ab.gz` / warc.gz semantics.
    */
  def gunzip(bytes: Array[Byte]): Array[Byte] = {
    try {
      val out = new OutBuf
      var pos = 0
      if (bytes.length == 0) throw Malformed
      while (pos < bytes.length) {
        val start = memberHeader(bytes, pos)
        val r = new BitReader(bytes)
        r.pos = start
        val memberFrom = out.n
        inflateInto(r, out)
        if (r.pos + 8 > bytes.length) throw Malformed
        val crcWant = le32(bytes, r.pos)
        val isize = le32(bytes, r.pos + 4)
        val memberLen = out.n - memberFrom
        if ((memberLen.toLong & 0xffffffffL) != isize) throw Malformed
        val crcGot = {
          val whole = out.bytes(memberFrom)
          PngCodec.crc32(whole, 0, whole.length) & 0xffffffffL
        }
        if (crcGot != crcWant) throw Malformed
        pos = r.pos + 8
      }
      out.bytes(0)
    } catch {
      case Malformed | _: ArrayIndexOutOfBoundsException => null
    }
  }

  /** Decompress a zlib (RFC 1950) stream — the body form RFC 9110
    * names for `Content-Encoding: deflate`. Null on any malformation
    * (bad CM/FCHECK, FDICT set, Adler-32 mismatch, trailing garbage).
    */
  def zlibInflate(bytes: Array[Byte]): Array[Byte] = {
    try {
      if (bytes == null || bytes.length < 6) throw Malformed
      val cmf = bytes(0) & 0xff
      val flg = bytes(1) & 0xff
      if ((cmf & 0x0f) != 8) throw Malformed
      if ((cmf * 256 + flg) % 31 != 0) throw Malformed
      if ((flg & 0x20) != 0) throw Malformed // FDICT: no shared dictionary
      val out = new OutBuf
      val r = new BitReader(bytes)
      r.pos = 2
      inflateInto(r, out)
      if (r.pos + 4 != bytes.length) throw Malformed
      val want = ((bytes(r.pos) & 0xffL) << 24) | ((bytes(r.pos + 1) & 0xffL) << 16) |
        ((bytes(r.pos + 2) & 0xffL) << 8) | (bytes(r.pos + 3) & 0xffL)
      val whole = out.bytes(0)
      if ((PngCodec.adler32(whole) & 0xffffffffL) != want) throw Malformed
      whole
    } catch {
      case Malformed | _: ArrayIndexOutOfBoundsException => null
    }
  }

  /** Raw DEFLATE with no wrapper — the non-conformant `deflate` body
    * many real servers ship (the reason every HTTP client sniffs both
    * forms). No checksum exists to verify; framing errors still null.
    */
  def inflateRaw(bytes: Array[Byte]): Array[Byte] = {
    try {
      if (bytes == null || bytes.length == 0) throw Malformed
      val out = new OutBuf
      val r = new BitReader(bytes)
      inflateInto(r, out)
      if (r.pos != bytes.length) throw Malformed
      out.bytes(0)
    } catch {
      case Malformed | _: ArrayIndexOutOfBoundsException => null
    }
  }

  /** Member count of a well-formed multi-member buffer (metadata the
    * ingest audit reports per shard); null on malformation.
    */
  def memberCount(bytes: Array[Byte]): java.lang.Long = {
    try {
      var pos = 0
      var cnt = 0L
      if (bytes.length == 0) throw Malformed
      val probe = new OutBuf
      while (pos < bytes.length) {
        val start = memberHeader(bytes, pos)
        val r = new BitReader(bytes)
        r.pos = start
        inflateInto(r, probe)
        if (r.pos + 8 > bytes.length) throw Malformed
        pos = r.pos + 8
        cnt += 1
      }
      java.lang.Long.valueOf(cnt)
    } catch {
      case Malformed | _: ArrayIndexOutOfBoundsException => null
    }
  }
}

/** `gzip_decode(bytes)` — strict multi-member gunzip, null on any
  * malformation; see [[GzipCodec.gunzip]].
  */
case class GzipDecode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"gzip_decode needs a binary column, got ${child.dataType.catalogString}")
  override def nullSafeEval(input: Any): Any =
    GzipCodec.gunzip(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.GzipCodec.gunzip($c);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildInternal(newChild: Expression): GzipDecode =
    copy(child = newChild)
  override def prettyName: String = "gzip_decode"
}

object GzipDecode {
  def gzip_decode(c: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(GzipDecode(GraftColumnBridge.expression(c)))
  }
}
