package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the engine's portable text hash.
  *
  * `word_hashes(text)` = array of rolling polynomial hashes, one per
  * space-separated word: `H(w) = foldl (acc*31 + codepoint(c)) mod P`
  * over the word's characters — the same value as the composable SQL
  * form `list_reduce(list_prepend(0, [ascii(c) for c in split(w,'')]),
  * (a,c) -> (a*31+c) % P)` used by the DuckDB oracle, and as
  * `TextOps.charHash` per word.
  *
  * Why a custom Expression (SURVEY.md §4 preference order (b)): the
  * higher-order-function formulation builds three nested lambda
  * evaluations per word (split → transform → aggregate) with per-element
  * closures; this expression is one tight loop over the string bytes,
  * participates in whole-stage codegen via a static-call `doGenCode`
  * (no interpreted fallback on the hot path), and allocates only the
  * output array.
  */
case class WordHashes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"word_hashes needs a string column, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    WordHashes.hashWords(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordHashes.hashWords($c);")

  override protected def withNewChildInternal(newChild: Expression): WordHashes =
    copy(child = newChild)

  override def prettyName: String = "word_hashes"
}

object WordHashes {
  val P: Long = 1000000007L

  /** One pass over the string's code points; words split on ' ' (the
    * same split as `split(text, " ")` — empty words hash to 0, matching
    * the fold's zero).
    */
  def hashWords(s: UTF8String): ArrayData = {
    val str = s.toString
    val out = new scala.collection.mutable.ArrayBuffer[Any](16)
    var acc = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      if (cp == ' ') {
        out += acc
        acc = 0L
      } else {
        acc = (acc * 31 + cp) % P
      }
      i += Character.charCount(cp)
    }
    out += acc
    new GenericArrayData(out.toArray)
  }

  /** Column-API entry point (Spark 4 Column↔Expression bridge). */
  def word_hashes(c: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(WordHashes(GraftColumnBridge.expression(c)))
  }
}

/** Native Catalyst expression decoding a string to its CODE POINTS as
  * `array<bigint>` — the composition seed for fused char-n-gram hashing:
  * `ngram_hashes(code_points(t), n)[j]` equals
  * `TextOps.charHash(substring(t, j+1, n))` exactly, because a single
  * code point's charHash is the code point itself (cp < P) and both
  * folds then share the `(acc*31 + cp) mod P` recurrence.
  *
  * Why it exists (optimization round): the HOF gram formulation
  * `transform(sequence(0, len-n), i -> substr(t, i+1, n))` is O(len²)
  * per document — `substr` on a variable-width UTF8String walks from
  * the string head to find the char offset on EVERY call — and the
  * transform lambda is CodegenFallback. This expression is one O(len)
  * code-point walk inside whole-stage codegen; the n-gram fold on top
  * ([[NgramHashes]]) is O(n·len). Values are IDENTICAL, so oracles are
  * unchanged (pinned by PolyHashSpec's charHash-equivalence row).
  */
case class CodePoints(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"code_points needs a string column, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    CodePoints.codePoints(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CodePoints.codePoints($c);")

  override protected def withNewChildInternal(newChild: Expression): CodePoints =
    copy(child = newChild)

  override def prettyName: String = "code_points"
}

object CodePoints {
  /** One pass; surrogate pairs stay one code point (the `split(s, "")`
    * + `ascii` contract [[WordHashes.hashWords]] already pins).
    * Primitive long[] throughout (GenericArrayData takes it directly) —
    * the ArrayBuffer[Any] form boxed every code point and re-copied on
    * growth (advisor finding); codePointCount pre-sizes exactly.
    */
  def codePoints(s: UTF8String): ArrayData = {
    val str = s.toString
    val n = str.length
    val out = new Array[Long](str.codePointCount(0, n))
    var i = 0
    var k = 0
    while (i < n) {
      val cp = str.codePointAt(i)
      out(k) = cp.toLong
      k += 1
      i += Character.charCount(cp)
    }
    new GenericArrayData(out)
  }

  /** Column-API entry point (Spark 4 Column↔Expression bridge). */
  def code_points(c: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(CodePoints(GraftColumnBridge.expression(c)))
  }
}

/** Native Catalyst expression counting array elements that belong to a
  * LITERAL string set: `count_in_set(arr, set)` ≡
  * `size(filter(arr, x -> x IN (set)))` — occurrences counted, not
  * distinct members, and comparison is exact byte equality, matching
  * both the HOF `isin` form and the DuckDB `list_filter(w IN (...))`
  * mirror.
  *
  * Why it exists (optimization round): the HOF filter is
  * CodegenFallback — an interpreted lambda invocation per array element
  * with an O(|set|) linear `In` scan inside — and it sits on the
  * quality-gate path every corpus build runs. This expression is one
  * codegen'd loop with an O(1) hash-set probe per element.
  */
case class CountInSet(child: Expression, values: Seq[String])
    extends UnaryExpression {
  require(values.nonEmpty, "count_in_set needs a non-empty literal set")
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"count_in_set needs array<string>, got ${other.catalogString}")
    }

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](values.size * 2)
    values.foreach(v => s.add(UTF8String.fromString(v)))
    s
  }

  override def nullSafeEval(input: Any): Any =
    CountInSet.count(input.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("inSet", set, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CountInSet.count($c, $setRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): CountInSet =
    copy(child = newChild)

  override def prettyName: String = "count_in_set"
}

object CountInSet {
  /** Null elements never match (the `isin` lambda yields null → filtered
    * out); callers' arrays are split() products and carry none anyway.
    */
  def count(arr: ArrayData, set: java.util.HashSet[UTF8String]): Long = {
    val n = arr.numElements()
    var c = 0L
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  /** Column-API entry point (Spark 4 Column↔Expression bridge). */
  def count_in_set(c: Column, values: Seq[String]): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(CountInSet(GraftColumnBridge.expression(c), values))
  }
}

/** Native Catalyst expression for byte-level shingling of BINARY media
  * payloads: `byte_gram_hashes(media)` = array of polynomial hashes of
  * every 4-byte gram, `H(i) = fold (acc*31 + byte) mod P` over bytes
  * i..i+3 — the content unit of media near-dup fingerprinting
  * ([[graft.operators.Multimodal.mediaNearDups]]), where text shingles
  * don't exist. Same rationale as [[WordHashes]]: one tight loop over
  * the payload inside whole-stage codegen instead of nested
  * transform/aggregate lambdas per gram. A payload shorter than 4 bytes
  * yields an empty array (no gram exists).
  */
case class ByteGramHashes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"byte_gram_hashes needs a binary column, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    ByteGramHashes.hashGrams(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ByteGramHashes.hashGrams($c);")

  override protected def withNewChildInternal(newChild: Expression): ByteGramHashes =
    copy(child = newChild)

  override def prettyName: String = "byte_gram_hashes"
}

object ByteGramHashes {
  val P: Long = WordHashes.P
  val Gram = 4

  /** With `Gram = 4` the fold's intermediate never reaches P
    * (max 255·(31³+31²+31+1) ≈ 7.9e6), so the per-step mod is a no-op
    * the oracle can skip: DuckDB computes the plain integer polynomial.
    */
  def hashGrams(bytes: Array[Byte]): ArrayData = {
    val n = bytes.length - Gram + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      var acc = 0L
      var j = 0
      while (j < Gram) { acc = (acc * 31 + (bytes(i + j) & 0xff)) % P; j += 1 }
      out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry point (Spark 4 Column↔Expression bridge). */
  def byte_gram_hashes(c: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(ByteGramHashes(GraftColumnBridge.expression(c)))
  }
}

/** Native Catalyst expression computing k affine minwise hashes over an
  * array<long> of element hashes in ONE pass:
  * `out[j] = min over h of (a[j]*h + b[j]) mod P`.
  *
  * The HOF formulation (`array_min(transform(g, ...))` × k) materializes
  * k intermediate arrays per row and walks the input k times through
  * lambda-evaluation plumbing; this expression is a single loop over the
  * input with k running minima in a local array — the signature pass of
  * both the text MinHash pipeline ([[graft.operators.Dedup]]) and the
  * media fingerprint ([[graft.operators.Multimodal]]), which at 100 TB
  * is a per-row cost paid once per document. Values are IDENTICAL to
  * the HOF form (same affine constants, same mod), so oracles are
  * unchanged. An empty input yields NULL (no minimum exists), matching
  * `array_min`'s null-on-empty — callers exclude empty inputs upstream.
  */
case class MinwiseHashes(child: Expression, as: Seq[Long], bs: Seq[Long])
    extends UnaryExpression {
  require(as.length == bs.length && as.nonEmpty, "need matching a/b constant vectors")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minwise_hashes needs array<bigint>, got ${other.catalogString}")
    }

  private lazy val aArr: Array[Long] = as.toArray
  private lazy val bArr: Array[Long] = bs.toArray

  override def nullSafeEval(input: Any): Any =
    MinwiseHashes.minwise(input.asInstanceOf[ArrayData], aArr, bArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minwiseA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("minwiseB", bArr, "long[]")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MinwiseHashes.minwise($c, $aRef, $bRef);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")
  }

  override protected def withNewChildInternal(newChild: Expression): MinwiseHashes =
    copy(child = newChild)

  override def prettyName: String = "minwise_hashes"
}

object MinwiseHashes {
  val P: Long = WordHashes.P

  /** One pass, k running minima. Returns null for an empty input (no
    * minimum exists), mirroring array_min.
    */
  def minwise(hashes: ArrayData, a: Array[Long], b: Array[Long]): ArrayData = {
    val n = hashes.numElements()
    if (n == 0) return null
    val k = a.length
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var j = 0
      while (j < k) {
        val v = (a(j) * h + b(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(x => x: Any))
  }

  /** Column-API entry point (Spark 4 Column↔Expression bridge). */
  def minwise_hashes(c: Column, as: Seq[Long], bs: Seq[Long]): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(MinwiseHashes(GraftColumnBridge.expression(c), as, bs))
  }
}

/** One-pass SimHash over a word-hash array: bit b of the output is set
  * iff a STRICT majority of the input hashes have bit b set — the same
  * value as the 30-lambda HOF formulation it replaces
  * ([[graft.operators.Dedup.simhashDf]]), which traversed the array once
  * PER BIT (30 `filter` closures per row). This expression keeps `bits`
  * running counters over a single traversal and participates in
  * whole-stage codegen via a static-call `doGenCode` (SURVEY.md §4
  * preference (b) — same discipline as [[MinwiseHashes]]). An empty
  * input yields 0 (no majorities), matching the fold's zero.
  */
case class SimhashBits(child: Expression, bits: Int) extends UnaryExpression {
  require(bits > 0 && bits <= 62, s"bits=$bits out of range")
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash_bits needs array<bigint>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    SimhashBits.simhash(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimhashBits.simhash($c, $bits);")

  override protected def withNewChildInternal(newChild: Expression): SimhashBits =
    copy(child = newChild)

  override def prettyName: String = "simhash_bits"
}

object SimhashBits {
  /** One traversal, `bits` running counters; strict majority sets the bit. */
  def simhash(hashes: ArrayData, bits: Int): Long = {
    val n = hashes.numElements()
    val cnt = new Array[Int](bits)
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var b = 0
      while (b < bits) {
        if (((h >> b) & 1L) == 1L) cnt(b) += 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) {
      if (2 * cnt(b) > n) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Column-API entry point (Spark 4 Column↔Expression bridge). */
  def simhash_bits(c: Column, bits: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(SimhashBits(GraftColumnBridge.expression(c), bits))
  }
}

/** Native Σ of UNSIGNED byte values over a BINARY payload — the
  * raw-route accounting of [[graft.operators.Multimodal.decodeDispatch]].
  * The HOF form it replaces expanded every payload to a 2n-char hex
  * string plus an n-element int array with per-element instr/substring
  * lambdas (~10× the CPU and allocation of the codec decodes beside
  * it); this is one tight loop in whole-stage codegen, the same
  * discipline as [[ByteGramHashes]]. Empty payload sums to 0.
  */
case class ByteSum(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"byte_sum needs a binary column, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    ByteSum.sumBytes(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ByteSum.sumBytes($c);")

  override protected def withNewChildInternal(newChild: Expression): ByteSum =
    copy(child = newChild)

  override def prettyName: String = "byte_sum"
}

object ByteSum {
  def sumBytes(bytes: Array[Byte]): Long = {
    var s = 0L
    var i = 0
    while (i < bytes.length) { s += bytes(i) & 0xff; i += 1 }
    s
  }

  /** Column-API entry point (Spark 4 Column↔Expression bridge). */
  def byte_sum(c: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(ByteSum(GraftColumnBridge.expression(c)))
  }
}

/** Positioned word-n-gram hash composition over a word-hash array: out[j]
  * = foldl over hw[j..j+n-1] of `(acc*31 + h) mod P` (acc seeded with
  * hw[j]) — the SAME arithmetic as the HOF `transform`+`aggregate`
  * formulation it replaces in [[graft.operators.Dedup.shingleHashes]]
  * and `contaminationSpans`' positioned shingles, but in ONE fused loop
  * that participates in whole-stage codegen (higher-order array
  * functions are CodegenFallback — interpreted per element — which made
  * shingle composition the hottest interpreted step of the dedup/
  * decontamination family). A shorter-than-n input yields an EMPTY
  * array (the callers' `when(size >= n, …).otherwise(array())` guard,
  * now internal). Output order is positional: element j is the n-gram
  * starting at word j, which positioned consumers (span extension)
  * rely on; set consumers apply array_distinct on top.
  */
case class NgramHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 2, s"ngram width must be >= 2, got $n")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      // containsNull = false ONLY: the fused loop reads getLong without
      // isNullAt, which would silently hash a null element as 0 — the
      // HOF form this replaced null-propagated instead, so a nullable
      // array must be rejected at analysis, not corrupted at runtime
      case ArrayType(LongType, false) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ngram_hashes needs array<bigint> with non-null elements, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    NgramHashes.ngrams(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NgramHashes.ngrams($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): NgramHashes =
    copy(child = newChild)

  override def prettyName: String = "ngram_hashes"
}

object NgramHashes {
  val P: Long = WordHashes.P

  def ngrams(hw: ArrayData, n: Int): ArrayData = {
    val len = hw.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](len - n + 1)
    var j = 0
    while (j <= len - n) {
      var acc = hw.getLong(j)
      var k = 1
      while (k < n) { acc = (acc * 31 + hw.getLong(j + k)) % P; k += 1 }
      out(j) = acc
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry point (Spark 4 Column↔Expression bridge). */
  def ngram_hashes(c: Column, n: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(NgramHashes(GraftColumnBridge.expression(c), n))
  }
}
