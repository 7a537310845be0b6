package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** REAL (minimal, deterministic) audio codec: canonical RIFF/WAVE PCM
  * 16-bit. This replaces the byte-decimation stand-in as the "decode"
  * step of the multimodal column family — the payload is a genuine WAV
  * container (12-byte RIFF header, 24-byte fmt chunk, 8-byte data chunk
  * header, little-endian s16 samples), the decoder is a strict
  * validating parser, and decode(encode(s)) == s byte-exactly, so the
  * DuckDB oracle can check the whole path by computing the expected
  * features directly from the source signal: any mis-parse (wrong
  * offset, wrong endianness, wrong field width) breaks the hash match.
  *
  * Three native expressions (SURVEY.md §4 preference (b) — one tight
  * loop in whole-stage codegen, no UDF, no kryo closure):
  *   - `wav_decode(media)`   → struct(sample_rate, channels, n_samples,
  *                             min_s, max_s, sum_abs, sum_sq) — header
  *                             fields PARSED from the container plus
  *                             integer signal moments (the audio
  *                             feature-extract slot).
  *   - `wav_samples(media)`  → array<int> of PCM samples (the
  *                             frame/sample fan-out slot).
  *   - `wav_resample(media, k)` → binary: REAL decimation — decode,
  *                             keep every k-th sample, divide the
  *                             declared rate by k, RE-ENCODE to a valid
  *                             WAV (the thumbnail/downsample slot; the
  *                             output round-trips through `wav_decode`).
  * A malformed container (bad magic, size mismatch, non-PCM, not 16-bit)
  * decodes to NULL — fail-closed, never garbage features.
  *
  * Reference cell: the reference's closest surface is raw ByteString
  * chunk I/O (`/root/reference/src/Data/Conduino/Combinators.hs:280-297`,
  * covered byte-exactly by q_binary_chunks); this codec is the
  * north-star multimodal extension giving those binary columns a real
  * decode path without external libraries.
  */
object WavCodec {

  /** Fixed container geometry: canonical 44-byte header, PCM (format 1),
    * 16 bits per sample.
    */
  val HeaderLen = 44

  /** Encode mono 16-bit PCM: samples must fit a signed short (the
    * builder's mapping guarantees it; out-of-range throws rather than
    * silently wrapping).
    */
  def encodePcm16(samples: Array[Int], sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new Array[Byte](HeaderLen + dataLen)
    def u32(off: Int, v: Long): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
      out(off + 2) = ((v >> 16) & 0xff).toByte; out(off + 3) = ((v >> 24) & 0xff).toByte
    }
    def u16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
    }
    def tag(off: Int, s: String): Unit = {
      var i = 0; while (i < 4) { out(off + i) = s.charAt(i).toByte; i += 1 }
    }
    tag(0, "RIFF"); u32(4, 36L + dataLen); tag(8, "WAVE")
    tag(12, "fmt "); u32(16, 16L); u16(20, 1); u16(22, 1)
    u32(24, sampleRate.toLong); u32(28, sampleRate.toLong * 2L); u16(32, 2); u16(34, 16)
    tag(36, "data"); u32(40, dataLen.toLong)
    var i = 0
    while (i < samples.length) {
      val s = samples(i)
      require(s >= Short.MinValue && s <= Short.MaxValue, s"sample out of s16 range: $s")
      out(HeaderLen + 2 * i) = (s & 0xff).toByte
      out(HeaderLen + 2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  /** Parsed container: header fields + raw sample view (offset into the
    * original bytes — no copy).
    */
  private final class Parsed(val sampleRate: Int, val channels: Int, val nSamples: Int,
                             val bytes: Array[Byte]) {
    @inline def sample(i: Int): Int =
      ((bytes(HeaderLen + 2 * i) & 0xff) | (bytes(HeaderLen + 2 * i + 1) << 8)).toShort.toInt
  }

  /** Strict validating parse; null on ANY malformation (fail-closed). */
  private def parse(bytes: Array[Byte]): Parsed = {
    if (bytes == null || bytes.length < HeaderLen) return null
    @inline def u32(off: Int): Long =
      (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
        ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
    @inline def u16(off: Int): Int = (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    @inline def tag(off: Int, s: String): Boolean = {
      var i = 0
      while (i < 4) { if (bytes(off + i) != s.charAt(i).toByte) return false; i += 1 }
      true
    }
    if (!tag(0, "RIFF") || !tag(8, "WAVE") || !tag(12, "fmt ") || !tag(36, "data")) return null
    if (u32(4) != bytes.length - 8L) return null        // RIFF size covers the file
    if (u32(16) != 16L || u16(20) != 1) return null     // canonical fmt, PCM only
    val channels = u16(22)
    val rate = u32(24)
    if (channels < 1 || rate <= 0 || rate > Int.MaxValue) return null
    if (u16(34) != 16) return null                      // 16-bit only
    if (u16(32) != channels * 2) return null            // blockAlign
    if (u32(28) != rate * channels * 2) return null     // byteRate
    val dataLen = u32(40)
    if (dataLen != bytes.length - HeaderLen.toLong) return null
    if (dataLen % (2L * channels) != 0) return null
    new Parsed(rate.toInt, channels, (dataLen / 2).toInt, bytes)
  }

  val decodeSchema: StructType = StructType(Seq(
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("min_s", LongType, nullable = false),
    StructField("max_s", LongType, nullable = false),
    StructField("sum_abs", LongType, nullable = false),
    StructField("sum_sq", LongType, nullable = false)))

  /** Decode + integer signal moments in one loop. min/max are 0 for an
    * empty (but valid) container — defined-degenerate, never null inside
    * the struct. Null for a malformed container. sum_sq envelope:
    * 32768² · n ≈ 1.07e9·n — exact in a Long to ~8.6e9 samples per
    * asset.
    */
  def decodeFeatures(bytes: Array[Byte]): InternalRow = {
    val p = parse(bytes)
    if (p == null) return null
    var mn = 0L; var mx = 0L; var sAbs = 0L; var sSq = 0L
    var i = 0
    while (i < p.nSamples) {
      val s = p.sample(i)
      if (i == 0) { mn = s; mx = s } else { if (s < mn) mn = s; if (s > mx) mx = s }
      sAbs += math.abs(s); sSq += s.toLong * s; i += 1
    }
    new GenericInternalRow(Array[Any](p.sampleRate, p.channels, p.nSamples.toLong,
      mn, mx, sAbs, sSq))
  }

  /** PCM samples as array<int>; null for a malformed container. */
  def samples(bytes: Array[Byte]): ArrayData = {
    val p = parse(bytes)
    if (p == null) return null
    val out = new Array[Any](p.nSamples)
    var i = 0
    while (i < p.nSamples) { out(i) = p.sample(i); i += 1 }
    new GenericArrayData(out)
  }

  /** Real decimation: every k-th sample (indices 0, k, 2k, …), declared
    * rate divided by k (integer division; the fixture rates are chosen
    * divisible so the oracle needs no float). Mono only — the builder's
    * contract; a multi-channel container returns null rather than
    * interleaving incorrectly. Output is a fully valid WAV.
    */
  def resample(bytes: Array[Byte], k: Int): Array[Byte] = {
    val p = parse(bytes)
    // k > rate would integer-divide the declared rate to 0 — an invalid
    // container this parser itself rejects, breaking the "output is a
    // fully valid WAV" invariant; decimating past the sample rate has
    // no defined meaning, so it is NULL like any other malformed ask
    if (p == null || p.channels != 1 || k > p.sampleRate) return null
    val n = (p.nSamples + k - 1) / k
    val kept = new Array[Int](n)
    var i = 0
    while (i < n) { kept(i) = p.sample(i * k); i += 1 }
    encodePcm16(kept, p.sampleRate / k)
  }
}

/** `wav_decode(media)` — see [[WavCodec.decodeFeatures]]. */
case class WavDecode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = WavCodec.decodeSchema
  override def nullable: Boolean = true // malformed container → null
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"wav_decode needs a binary column, got ${child.dataType.catalogString}")
  override def nullSafeEval(input: Any): Any =
    WavCodec.decodeFeatures(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.WavCodec.decodeFeatures($c);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildInternal(newChild: Expression): WavDecode =
    copy(child = newChild)
  override def prettyName: String = "wav_decode"
}

object WavDecode {
  def wav_decode(c: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(WavDecode(GraftColumnBridge.expression(c)))
  }
}

/** `wav_samples(media)` — see [[WavCodec.samples]]. */
case class WavSamples(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"wav_samples needs a binary column, got ${child.dataType.catalogString}")
  override def nullSafeEval(input: Any): Any =
    WavCodec.samples(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.WavCodec.samples($c);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildInternal(newChild: Expression): WavSamples =
    copy(child = newChild)
  override def prettyName: String = "wav_samples"
}

object WavSamples {
  def wav_samples(c: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(WavSamples(GraftColumnBridge.expression(c)))
  }
}

/** `wav_resample(media, k)` — see [[WavCodec.resample]]. */
case class WavResample(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"decimation factor must be >= 1, got $k")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"wav_resample needs a binary column, got ${child.dataType.catalogString}")
  override def nullSafeEval(input: Any): Any =
    WavCodec.resample(input.asInstanceOf[Array[Byte]], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.WavCodec.resample($c, $k);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildInternal(newChild: Expression): WavResample =
    copy(child = newChild)
  override def prettyName: String = "wav_resample"
}

object WavResample {
  def wav_resample(c: Column, k: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(WavResample(GraftColumnBridge.expression(c), k))
  }
}
