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
  }
}
