package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Degenerate-input contracts: every major operator family on an EMPTY
  * corpus (and a couple of singletons) must return a well-formed empty
  * (or defined-degenerate) result, never throw. A library dies in the
  * field on exactly these shapes — a filter upstream matched nothing,
  * a new tenant has no data yet — and an oracle harness never exercises
  * them, so they get pinned here.
  */
class DegenerateSpec extends SparkSpec {

  private def emptyDocs = {
    import spark.implicits._
    Seq.empty[(Long, String)].toDF("doc_id", "text")
  }

  private def emptyEvents = {
    import spark.implicits._
    Seq.empty[(Long, Long, String, java.sql.Timestamp)]
      .toDF("user_id", "event_id", "event_type", "ts2")
  }

  test("dedup family: empty corpus → empty results, no throw") {
    assert(Dedup.exact(emptyDocs, "doc_id", "text").count() == 0L)
    val sig = Dedup.minhashSignatures(emptyDocs, "doc_id", "text")
    assert(sig.count() == 0L)
    assert(Dedup.candidatePairs(sig).count() == 0L)
  }

  test("bpeLearn/bpeApply: empty corpus → zero merges, empty accounting") {
    val (merges, vocab) = TextOps.bpeRun(emptyDocs, "text", 4)
    assert(merges.count() == 0L)
    assert(TextOps.bpeApply(emptyDocs, "doc_id", "text", vocab).count() == 0L)
  }

  test("graph family: empty edges → empty ranks/coefficients, 0-count triangles") {
    import spark.implicits._
    val e = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(Graph.pageRank(e, 2).count() == 0L)
    assert(Graph.clusteringCoef(e).count() == 0L)
    // triangleCount's 1-row zero is pinned in DiagnosticsSpec
  }

  test("behavioral: funnel and co-occurrence over no events") {
    import spark.implicits._
    val f = Behavior.funnel(emptyEvents, "user_id", "event_type", "ts2",
      Seq("view", "click"))
    // per-stage counts still come back (one row per stage), all zero
    assert(f.collect().forall(_.getLong(1) == 0L))
    val ev = Seq.empty[(Long, Long)].toDF("u", "item")
    assert(Behavior.coOccurrence(ev, "u", "item", 1, 10).count() == 0L)
  }

  test("diagnostics: audits over empty tables are empty or all-zero, never errors") {
    import spark.implicits._
    val e = Seq.empty[(Long, String)].toDF("k", "v")
    assert(Diagnostics.joinAudit(e, "k", e, "k", 5).count() == 0L)
    val prof = Diagnostics.columnProfile(e, Seq("k" -> col("k")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(prof.toSeq == Seq(("k", 0L, 0L)))
  }

  test("sampling/packing: empty inputs flow through ordinal machinery") {
    assert(Sampling.stratifiedTake(
      emptyDocs.withColumnRenamed("text", "lang"), "lang", "doc_id", 5)
      .count() == 0L)
    assert(Packing.concatSplit(emptyDocs, "doc_id", "text", 100L).count() == 0L)
  }

  test("sketches: empty corpus sketch row is the defined degenerate (n=0, est=0)") {
    val r = Sketches.kmvWordSketch(emptyDocs, "text").collect()
    assert(r.length == 1)
    assert(r.head.getLong(2) == 0L) // n_in_sketch
    // est falls back to the exact count branch (n < k) → 0
    assert(r.head.getLong(3) == 0L)
  }

  test("embedding stats: empty collection → 0 stats rows and 0 standardized rows; singleton → zvec all zero") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Seq[Double])].toDF("vec_id", "emb")
    assert(Similarity.dimStats(empty).count() == 0L)
    assert(Similarity.standardize(empty).count() == 0L)
    // a single vector has zero variance in every dimension — the defined
    // degenerate is z = 0.0 everywhere, never a divide-by-zero Inf/NaN.
    // 0.1 is deliberately NON-dyadic: the FP variance expression leaves
    // a tiny positive residual for it, so this row only passes through
    // the exact integer-domain (minq == maxq) zero-variance gate
    val one = Seq((7L, Seq(0.25, -0.5, 0.1))).toDF("vec_id", "emb")
    val z = Similarity.standardize(one).head()
    assert(z.getLong(0) == 7L && z.getSeq[Double](1).forall(_ == 0.0))
    // multi-row corpus with a constant non-dyadic dimension: dim 0 must
    // standardize to exactly 0.0 for every row (no 1e8-scale junk from a
    // ~1e-8 sd residual), while the varying dim 1 standardizes normally
    val const = Seq((1L, Seq(0.1, 0.2)), (2L, Seq(0.1, 0.4)),
      (3L, Seq(0.1, 0.9))).toDF("vec_id", "emb")
    val zc = Similarity.standardize(const).collect()
    assert(zc.length == 3)
    assert(zc.forall(_.getSeq[Double](1).head == 0.0),
      "constant non-dyadic dimension leaked a nonzero z-score")
    assert(zc.exists(r => math.abs(r.getSeq[Double](1)(1)) > 0.1),
      "varying dimension unexpectedly zeroed")
  }

  test("ANN over an empty collection: IVF index rows, topk and persisted-serve all return 0 rows") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Seq[Double])].toDF("vec_id", "emb")
    val sig = Similarity.withNorm(empty)
    assert(Similarity.ivfIndexRows(sig).count() == 0L)
    assert(Similarity.ivfTopK(empty, 5, 3).count() == 0L)
    // serving against an empty inverted file: no probes, no candidates,
    // a clean 0-row result — never a seed-lookup error
    assert(Similarity.ivfServe(Similarity.ivfIndexRows(sig), sig, 5, 3).count() == 0L)
  }

  test("singleton corpus: dedup keeps it, bpe learns from it, profile counts it") {
    import spark.implicits._
    val one = Seq((7L, "aa bb aa")).toDF("doc_id", "text")
    assert(Dedup.exact(one, "doc_id", "text").count() == 1L)
    assert(TextOps.bpeLearn(one, "text", 1).count() == 1L)
    val p = Diagnostics.columnProfile(one, Seq("doc_id" -> col("doc_id")))
      .collect().head
    assert(p.getLong(1) == 1L && p.getLong(3) == 7L && p.getLong(4) == 7L)
  }
}
