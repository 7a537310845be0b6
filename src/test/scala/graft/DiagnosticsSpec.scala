package graft

import org.apache.spark.sql.functions._

import graft.operators.{Diagnostics, Graph, Sampling, TextOps}

/** Semantic guarantees of the pre-flight diagnostics and the graph
  * family, independent of the oracle hash-match: PageRank matches an
  * in-test reference of the exact integer recurrence, the join audit's
  * pair estimate is the true join cardinality, the skew audit conserves
  * totals and uses the portable scatter assignment, and the purge audit
  * partitions every table exactly.
  */
class DiagnosticsSpec extends SparkSpec {

  // ---------- pageRank ----------

  /** Driver-side reference of the same integer recurrence. */
  private def refPageRank(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val sym = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct
    val deg = sym.groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
    var rank = deg.map { case (n, _) => n -> 1000000L }
    for (_ <- 1 to iters) {
      val in = sym.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => rank(u) / deg(u) }.sum
      }
      rank = in.map { case (v, s) => v -> (150000L + 850000L * s / 1000000L) }
    }
    rank
  }

  test("pageRank matches the integer reference recurrence exactly (star + chain + cycle)") {
    import spark.implicits._
    // star around 1, a chain 10-11-12, a triangle 20-21-22, and a
    // bridge 1-10 — mixed degrees so div/rounding paths all exercise
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L),
      (10L, 11L), (11L, 12L), (20L, 21L), (21L, 22L), (22L, 20L), (1L, 10L))
    val got = Graph.pageRank(edges.toDF("src", "dst"), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == refPageRank(edges, 3))
    // hub of the star must outrank its leaves
    assert(got(1L) > got(2L))
  }

  test("pageRank is input-order and duplicate-edge invariant") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L))
    val a = Graph.pageRank(edges.toDF("src", "dst"), 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Graph.pageRank((edges.reverse ++ edges).toDF("src", "dst"), 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  // ---------- joinAudit ----------

  test("joinAudit: est_pairs is the true join cardinality; one-sided keys surface with 0") {
    import spark.implicits._
    val l = Seq(1L, 1L, 1L, 2L, 3L).toDF("k")
    val r = Seq(1L, 1L, 2L, 4L).toDF("k")
    val rows = Diagnostics.joinAudit(l, "k", r, "k", topK = 10)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(rows.toSet == Set((1L, 3L, 2L, 6L), (2L, 1L, 1L, 1L),
      (3L, 1L, 0L, 0L), (4L, 0L, 1L, 0L)))
    // ranked by contribution, and the estimate equals the real join size
    assert(rows.head == ((1L, 3L, 2L, 6L)))
    val trueJoin = l.join(r, "k").count()
    assert(rows.map(_._4).sum == trueJoin)
  }

  test("joinAudit plans the top-K as TakeOrderedAndProject, not a global sort") {
    // input must be large enough that EliminateLimits can't prove the
    // Limit redundant (maxRows > topK), as at real scale; sparkPlan, not
    // executedPlan, because AQE wraps the latter before first execution
    val l = spark.range(100).withColumnRenamed("id", "k")
    val plan = Diagnostics.joinAudit(l, "k", l, "k", 5)
      .queryExecution.sparkPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"plan:\n$plan")
  }

  // ---------- partitionSkew ----------

  test("partitionSkew conserves totals and assigns buckets by the portable scatter hash") {
    import spark.implicits._
    val df = (1L to 500L).map(i => (i, i % 7 + 1)).toDF("id", "w")
    val out = Diagnostics.partitionSkew(df, col("id"), col("w"), buckets = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.map(_._2).sum == 500L)
    assert(out.map(_._3).sum == (1L to 500L).map(_ % 7 + 1).sum)
    // recompute one bucket's row count from the scatter formula
    val expected0 = (1L to 500L).count(i =>
      (i * Sampling.ScatterA % TextOps.HashMod) % 8 == 0).toLong
    assert(out.find(_._1 == 0L).map(_._2).contains(expected0))
    // a perfectly even split would put every bucket at 1_000_000 ppm;
    // totals imply the ppm column averages to ~1e6 (integer-div slack)
    val ppm = out.map(_._4)
    assert(ppm.sum / ppm.length <= 1000000L)
    assert(ppm.sum / ppm.length >= 900000L)
  }

  // ---------- tableChecksum ----------

  test("tableChecksum: identical content ⇒ identical digests; any single-field edit flips its bucket") {
    import spark.implicits._
    val base = (1L to 300L).map(i => (i, i * 7 % 13, i % 5)).toDF("id", "a", "b")
    def sums(df: org.apache.spark.sql.DataFrame) =
      Diagnostics.tableChecksum(df, col("id"), Seq(col("a"), col("b")), 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val s1 = sums(base)
    // same rows, different physical order → same checksums (order-free)
    assert(sums(base.orderBy(col("b"), col("id").desc)) == s1)
    // edit one field of one row → exactly that id's bucket changes
    val edited = base.withColumn("a",
      when(col("id") === 42L, col("a") + 1).otherwise(col("a")))
    val s2 = sums(edited)
    val changed = (s1 diff s2).map(_._1) ++ (s2 diff s1).map(_._1)
    val bucket42 = (42L * Sampling.ScatterA % TextOps.HashMod) % 8
    assert(changed == Set(bucket42), s"changed buckets $changed != $bucket42")
    // counts are untouched by the edit
    assert(s2.map(t => t._1 -> t._2) == s1.map(t => t._1 -> t._2))
  }

  test("tableChecksum second moment catches a compensating edit the sum misses") {
    import spark.implicits._
    // rows digest to d and d' with d+d' preserved but d²+d'² changed:
    // swap a=(x, y) for (x+1, y-31) in the SAME bucket — the fold makes
    // the two digests shift by +31 and −31 respectively
    val base = Seq((1L, 10L, 20L), (2L, 30L, 40L)).toDF("id", "a", "b")
    val comp = Seq((1L, 11L, 20L), (2L, 30L, 9L)).toDF("id", "a", "b")
    def row(df: org.apache.spark.sql.DataFrame) =
      Diagnostics.tableChecksum(df, lit(0L), Seq(col("a"), col("b")), 1)
        .select("sum1", "sum2").head()
    val (r1, r2) = (row(base), row(comp))
    assert(r1.getLong(0) == r2.getLong(0), "fixture must collide on sum1")
    assert(r1.getLong(1) != r2.getLong(1), "sum2 must catch the compensating edit")
  }

  // ---------- purgeAudit ----------

  test("purgeAudit partitions each table exactly (purged + kept == rows; cascade composes)") {
    import spark.implicits._
    val users = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("uid", "name")
    val posts = Seq((10L, 1L), (11L, 1L), (12L, 2L), (13L, 3L)).toDF("pid", "uid")
    val del = Seq(1L).toDF("key")
    val audit = Diagnostics.purgeAudit(
      Seq(("users", users, "uid"), ("posts", posts, "uid")), del)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(audit == Set(("users", 1L, 2L), ("posts", 2L, 2L)))
    // duplicate keys in the delete set must not double-count
    val audit2 = Diagnostics.purgeAudit(Seq(("posts", posts, "uid")),
      Seq(1L, 1L, 1L).toDF("key"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(audit2 == Set(("posts", 2L, 2L)))
  }

  test("distributionDrift: exact ppm deltas, one-sided bins, null bins dropped") {
    import spark.implicits._
    val a = Seq[java.lang.Long](1L, 1L, 2L, 3L, null).toDF("v")
    val b = Seq[java.lang.Long](1L, 2L, 2L, 9L).toDF("v")
    val got = Diagnostics.distributionDrift(a, b, col("v"))
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, 2L, 1L, 500000L, 250000L, 250000L),
      (2L, 1L, 2L, 250000L, 500000L, -250000L),
      (3L, 1L, 0L, 250000L, 0L, 250000L),
      (9L, 0L, 1L, 0L, 250000L, -250000L)), got.toSeq.toString)
    // Σ|delta|/2 = the TVD in ppm
    assert(got.map(_._6).map(math.abs).sum / 2 == 500000L)
  }

  test("triangleCount: two disjoint triangles + K4, reversed dups and self-loops ignored") {
    import spark.implicits._
    val k4 = for (x <- 10L to 13L; y <- 10L to 13L if x < y) yield (x, y)
    val edges = (Seq(
      (1L, 2L), (2L, 3L), (1L, 3L),   // triangle
      (2L, 1L),                       // reversed duplicate
      (3L, 4L), (4L, 5L), (5L, 3L),   // second triangle sharing node 3
      (5L, 6L),                       // dangling edge
      (7L, 7L)                        // self-loop
    ) ++ k4).toDF("src", "dst")
    val n = Graph.triangleCount(edges).as[Long].collect().head
    assert(n == 2L + 4L, s"got $n") // K4 contains 4 triangles
    // empty edge set still yields the single (0) row
    val z = Graph.triangleCount(Seq.empty[(Long, Long)].toDF("src", "dst"))
      .as[Long].collect().toSeq
    assert(z == Seq(0L))
  }

  test("columnProfile: one-pass stats, null accounting, all-null column yields NULL min/max/sum") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(10L), Option.empty[Long]),
      (2L, None, None),
      (3L, Some(-5L), None)).toDF("a", "b", "c")
    val got = Diagnostics.columnProfile(df,
      Seq("a" -> col("a"), "b" -> col("b"), "c" -> col("c")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(5)) None else Some(r.getLong(5)))).sortBy(_._1).toSeq
    assert(got == Seq(
      ("a", 3L, 0L, Some(1L), Some(3L), Some(6L)),
      ("b", 2L, 1L, Some(-5L), Some(10L), Some(5L)),
      ("c", 0L, 3L, None, None, None)), got.toString)
  }

  test("clusteringCoef: per-node triangles and exact ppm coefficients") {
    import spark.implicits._
    // triangle 1-2-3 plus pendant edge 3-4
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("src", "dst")
    val got = Graph.clusteringCoef(edges)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 2L, 1L, 1000000L),
      (2L, 2L, 1L, 1000000L),
      (3L, 3L, 1L, 333333L), // 2·1·10⁶ div (3·2) floors
      (4L, 1L, 0L, 0L)),     // degree < 2 → defined as 0
      got.toString)
  }
}
