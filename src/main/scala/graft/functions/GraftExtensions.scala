package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions for SQL use —
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`. After that:
  * `spark.sql("SELECT word_hashes(text) FROM docs")`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("word_hashes"),
      new ExpressionInfo(classOf[WordHashes].getName, "word_hashes"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "word_hashes(text) takes one argument")
        WordHashes(children.head)
      }))
    e.injectFunction((
      new FunctionIdentifier("simhash_bits"),
      new ExpressionInfo(classOf[SimhashBits].getName, "simhash_bits"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "simhash_bits(hashes, bits) takes two arguments")
        val bits = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"simhash_bits: bits must be an integer literal, got $other")
        }
        SimhashBits(children.head, bits)
      }))
    e.injectFunction((
      new FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[DotF64].getName, "vector_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "vector_dot(a, b) takes two arguments")
        DotF64(children(0), children(1))
      }))
    e.injectFunction((
      new FunctionIdentifier("vector_sqdist"),
      new ExpressionInfo(classOf[SqDistF64].getName, "vector_sqdist"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "vector_sqdist(a, b) takes two arguments")
        SqDistF64(children(0), children(1))
      }))
    e.injectFunction((
      new FunctionIdentifier("byte_sum"),
      new ExpressionInfo(classOf[ByteSum].getName, "byte_sum"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "byte_sum(media) takes one argument")
        ByteSum(children.head)
      }))
    e.injectFunction((
      new FunctionIdentifier("byte_gram_hashes"),
      new ExpressionInfo(classOf[ByteGramHashes].getName, "byte_gram_hashes"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "byte_gram_hashes(media) takes one argument")
        ByteGramHashes(children.head)
      }))
    e.injectFunction((
      new FunctionIdentifier("wav_decode"),
      new ExpressionInfo(classOf[WavDecode].getName, "wav_decode"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "wav_decode(media) takes one argument")
        WavDecode(children.head)
      }))
    e.injectFunction((
      new FunctionIdentifier("wav_samples"),
      new ExpressionInfo(classOf[WavSamples].getName, "wav_samples"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "wav_samples(media) takes one argument")
        WavSamples(children.head)
      }))
    e.injectFunction((
      new FunctionIdentifier("wav_resample"),
      new ExpressionInfo(classOf[WavResample].getName, "wav_resample"),
      (children: Seq[Expression]) =>
        WavResample(children.head, intLit("wav_resample", children, 2))))
    e.injectFunction((
      new FunctionIdentifier("bmp_decode"),
      new ExpressionInfo(classOf[BmpDecode].getName, "bmp_decode"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "bmp_decode(media) takes one argument")
        BmpDecode(children.head)
      }))
    e.injectFunction((
      new FunctionIdentifier("bmp_resample"),
      new ExpressionInfo(classOf[BmpResample].getName, "bmp_resample"),
      (children: Seq[Expression]) =>
        BmpResample(children.head, intLit("bmp_resample", children, 2))))
  }

  /** Second-argument constant integer of a (media, k) signature. Any
    * FOLDABLE integral expression qualifies — `4`, `4L` (BIGINT
    * literals are what many SQL frontends emit for bare numbers),
    * `CAST(4 AS INT)`, `2+2` — evaluated here at registration/analysis
    * time; only a genuinely non-constant or non-integral k is rejected.
    */
  private def intLit(fn: String, children: Seq[Expression], arity: Int): Int = {
    require(children.size == arity, s"$fn(media, k) takes $arity arguments")
    val e = children(1)
    val v = if (e.foldable) e.eval(org.apache.spark.sql.catalyst.InternalRow.empty)
      else throw new IllegalArgumentException(
        s"$fn: k must be a constant integer expression, got non-foldable $e")
    v match {
      case i: Int => i
      case l: Long if l.isValidInt => l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case other => throw new IllegalArgumentException(
        s"$fn: k must be a constant 32-bit integer, got $other")
    }
  }
}
