package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Session hygiene + fail-loud guards on the columnar operators. */
class ColOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("events read leaves the session conf untouched; repeated reads work") {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val before = spark.conf.getOption(key)
    assert(!before.contains("true"), "precondition: flag not set by anything else")
    val ev = ColOps.table(spark, dir, "events")
    assert(ev.selectExpr("max(ts)").head().getLong(0) > 0L) // nanos read as Long
    assert(spark.conf.getOption(key) == before)             // untouched
    assert(ColOps.table(spark, dir, "events").count() > 0)  // later read fine
  }

  test("zipBySeq assumeDense: dense keys pass, sparse keys fail loudly") {
    import spark.implicits._
    val a = Seq((0L, "x"), (1L, "y"), (2L, "z")).toDF("seq", "va")
    val bDense = Seq((0L, 1.0), (1L, 2.0)).toDF("seq", "vb")
    assert(ColOps.zipBySeq(a, bDense, "b_", assumeDense = true).count() == 2)
    val bSparse = Seq((0L, 1.0), (5L, 2.0)).toDF("seq", "vb")
    val ex = intercept[Throwable] {
      ColOps.zipBySeq(a, bSparse, "b_", assumeDense = true).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("not dense")))
  }

  test("multimodal thumb digest is byte-based: non-ASCII row agrees with the oracle formula") {
    val s = "héllo wörld exträ pädding"
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    def hex(b: Array[Byte]) = b.map("%02x".format(_)).mkString
    def md5hex(b: Array[Byte]) =
      hex(java.security.MessageDigest.getInstance("MD5").digest(b))
    // the oracle computes md5(substring(lower(hex(encode(text))), 1, 32)):
    // md5 of the lowercase-hex STRING of the first 16 bytes
    val expectedThumb = md5hex(hex(bytes.take(16))
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val (n, digest, thumb, _, _, _) = Multimodal.stubDecode(bytes)
    assert(n == bytes.length.toLong)
    assert(digest == md5hex(bytes))
    assert(thumb == expectedThumb)
    // and through the distributed decode plumbing
    import spark.implicits._
    val assets = Seq((1L, s)).toDF("asset_id", "text")
      .select(col("asset_id"), encode(col("text"), "UTF-8").as("media"),
        struct(lit("x").as("container"), lit(1L).as("declared_size")).as("meta"))
    val out = Multimodal.decode(assets).head()
    assert(out.getAs[String]("thumb_digest") == expectedThumb)
    assert(out.getAs[Long]("n_bytes") == bytes.length.toLong)
  }
}
