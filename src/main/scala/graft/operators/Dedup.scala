package graft.operators

import org.apache.spark.sql._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines:
  *
  *  - exact: hash-groupBy on the full text (one shuffle on a 32-byte key);
  *  - near-dup MinHash+LSH: word-3-gram shingles → k portable min-hashes →
  *    banded buckets → candidate pairs ONLY within a shared bucket
  *    (never all-pairs — the candidate join is a plain shuffle join on the
  *    band key, so it scales as O(docs × bands), not O(docs²));
  *  - SimHash: 30-bit sign fingerprint of word hashes, bucketable by
  *    prefix for Hamming-near candidates.
  *
  * Signatures are computed entirely inside per-row column expressions
  * (transform/aggregate/filter over arrays — whole-stage codegen, zero
  * shuffle); only the final bucket join shuffles. All hashes are the
  * portable `TextOps.charHash`, so the DuckDB oracle replicates results
  * exactly.
  */
object Dedup {

  val P: Long = TextOps.HashMod
  val NumHashes = 16
  val BandSize = 4 // 4 bands × 4 rows
  val NumBands: Int = NumHashes / BandSize

  /** Band buckets more populated than this are dropped from candidacy
    * (mirrored in the oracle SQL): a viral bucket — boilerplate shared by
    * millions of docs — would otherwise degenerate to O(bucket²)
    * candidate pairs at 100 TB. Exact duplicates inside a dropped bucket
    * are still caught by [[exact]]; a bucket this hot carries no near-dup
    * signal anyway.
    */
  val MaxBucket = 1024

  /** Fixed affine constants for the k min-hash functions (replicated in
    * the oracle SQL — keep in sync with [[minhashSqlParts]]).
    */
  val HashA: Seq[Long] = (0 until NumHashes).map(i => (1103515245L * (2 * i + 1)) % P)
  val HashB: Seq[Long] = (0 until NumHashes).map(i => (12345L * (i + 1) + 678910L) % P)

  /** Exact dedup: group by text hash; keep the smallest id, count dups. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("h"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Per-source dedup HEALTH: how much of each source is redundant
    * under exact-text dedup — the corpus-composition diagnostic that
    * decides which feeds are worth keeping. A doc is redundant iff it
    * is not its text family's canonical keeper (`min(id)` per md5, the
    * [[exact]] contract), so cross-source copies charge every source
    * except the keeper's. dup_ppm is exact integer parts-per-million.
    * Plan: the [[exact]] hash aggregate, keeper ids joined back on the
    * (pruned) id column, one source-key aggregate — the doc payload is
    * scanned once and never shuffled.
    */
  def dedupRates(df: DataFrame, idCol: String, textCol: String,
                 srcCol: String): DataFrame = {
    val keepers = exact(df, idCol, textCol)
      .select(col("keep_id").as(idCol), lit(1L).as("__keep"))
    df.select(col(idCol), col(srcCol))
      .join(keepers, Seq(idCol), "left")
      .groupBy(col(srcCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("__keep"), lit(0L))).as("n_canonical"))
      .select(col(srcCol), col("n_docs"), col("n_canonical"),
        // DIV: exact integral division — the FP `/`-then-cast could
        // round a just-below-integer quotient up across engines
        expr("(n_docs - n_canonical) * 1000000 DIV n_docs").as("dup_ppm"))
  }

  /** DuckDB mirror of [[dedupRates]]. */
  def dedupRatesSql(table: String, idCol: String, textCol: String,
                    srcCol: String): String =
    s"""WITH k AS (SELECT MIN($idCol) AS keep_id FROM $table GROUP BY md5($textCol)),
        j AS (SELECT d.$srcCol,
                     CASE WHEN k.keep_id IS NULL THEN 0 ELSE 1 END AS kept
              FROM $table d LEFT JOIN k ON k.keep_id = d.$idCol)
        SELECT $srcCol, COUNT(*) AS n_docs,
               CAST(SUM(kept) AS BIGINT) AS n_canonical,
               CAST((COUNT(*) - SUM(kept)) * 1000000 // COUNT(*) AS BIGINT) AS dup_ppm
        FROM j GROUP BY $srcCol"""

  /** Streaming exact dedup: drop rows whose key columns were already
    * seen within the watermark horizon — the streaming form of [[exact]]
    * with state BOUNDED by the watermark (unbounded dropDuplicates state
    * is the classic streaming-dedup OOM at 100 TB; the horizon is the
    * documented trade: a duplicate arriving later than `delay` after its
    * original passes through).
    */
  def streamingExact(df: DataFrame, tsCol: String, delay: String,
                     keyCols: Seq[String]): DataFrame =
    df.withWatermark(tsCol, delay).dropDuplicatesWithinWatermark(keyCols)

  /** (doc_id, sh: array<long>) — the distinct word-3-gram shingle hashes
    * of each document (the first two stages of [[minhashSignatures]];
    * also the overlap unit of [[contaminatedBy]]).
    *
    * Staged as separate Projects so each intermediate array is computed
    * exactly once per row: (1) `hw` = per-word char hashes; (2) `sh` =
    * shingle hashes composed arithmetically from `hw`
    * ((((h1*31 + h2) mod P)*31 + h3) mod P — shingle strings never
    * materialize). Referencing a `transform(...)` Column from inside
    * another lambda would instead INLINE it at every element_at —
    * Catalyst does not CSE across lambda boundaries, and the recompute
    * is quadratic (measured 10× slower).
    */
  def shingleHashes(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val withHw = df.select(col(idCol).as("doc_id"),
      graft.functions.WordHashes.word_hashes(col(textCol)).as("hw"))
    // native fused-loop composition (functions.NgramHashes): same values
    // as the former transform(sequence…) HOF form, but inside
    // whole-stage codegen — HOFs are CodegenFallback, and the
    // interpreted per-element fold was the hottest step of the
    // dedup/decontamination family
    withHw.select(col("doc_id"),
      array_distinct(
        graft.functions.NgramHashes.ngram_hashes(col("hw"), 3)).as("sh"))
  }

  /** doc → (id, sh: array<long>, minhash: array<long>[k]): the shingle
    * hashes plus the k affine min-hashes over them — one more staged
    * Project on top of [[shingleHashes]] (same lambda-inlining caveat).
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val withSh = shingleHashes(df, idCol, textCol)
    // one-pass native minwise (functions.MinwiseHashes): k running minima
    // in a single loop over the shingle array. Values identical to the
    // former array_min(transform(...)) × k form; a shingle-less doc gets
    // a NULL signature (vs an array of NULLs) — equivalent downstream:
    // element_at(NULL, i) is NULL, and bucket generation filters
    // size(sh) > 0 before banding either way.
    withSh.select(col("doc_id"), col("sh"),
      graft.functions.MinwiseHashes.minwise_hashes(col("sh"), HashA, HashB)
        .as("minhash"))
  }

  /** Incremental (new-vs-corpus) exact dedup — the ingestion shape: keep
    * the incoming rows whose text digest does NOT appear in the existing
    * corpus. The corpus side is projected to distinct 32-byte digests
    * BEFORE the join, so the anti-join carries digests, not documents;
    * at 100 TB the corpus digest set lives as its own compacted table
    * and the join shuffles on the digest (or broadcasts, when the
    * incoming batch is the small side).
    */
  def newAgainstCorpus(incoming: DataFrame, corpus: DataFrame,
                       textCol: String): DataFrame = {
    val seen = corpus.select(md5(col(textCol)).as("__corpus_h")).distinct()
    incoming.join(seen, md5(incoming(textCol)) === col("__corpus_h"), "left_anti")
  }

  /** Benchmark decontamination — the train/eval overlap check: flag
    * documents sharing ANY word-3-gram shingle with the benchmark set.
    * Both sides explode their shingle hashes (never shingle STRINGS —
    * the arithmetic composition stays in whole-stage codegen); the
    * benchmark side is distinct-projected and BROADCAST (eval sets are
    * tiny next to a training corpus), so the semi-join adds no shuffle
    * to the corpus scan.
    */
  def contaminatedBy(docs: DataFrame, bench: DataFrame, idCol: String,
                     textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val d = shingleHashes(docs, idCol, textCol)
      .select(col("doc_id"), explode(col("sh")).as("__sh"))
    // ONE bench-side job: the distinct shingle hashes of the eval suite,
    // collected to the driver. This is not a new scale commitment — the
    // exact semi-join below broadcasts this same set, so it must be
    // driver-memory-sized by the operator's own contract; collecting it
    // lets both the Bloom AND the join's build side come from one pass
    // over the benchmark docs instead of two.
    val benchHashes = shingleHashes(bench, idCol, textCol)
      .select(explode(col("sh")).as("__sh")).distinct()
      .as[Long].collect()
    // Bloom prefilter BELOW the join: a fixed-size bitset over the bench
    // shingles (ContamBloomBits/64 longs no matter how large the eval
    // suite grows), built driver-side for free from the collected set
    // and inlined as a plan literal — the membership test runs inside
    // the corpus scan's codegen stage, so non-candidate shingle rows
    // never reach the join probe (and, in a shuffled-join deployment,
    // never ship). No false negatives by Bloom's contract — the exact
    // semi-join then removes the false positives, so the result is
    // UNCHANGED and the oracle stays the same.
    val bits = contamBloomBits(benchHashes)
    val b = benchHashes.toSeq.toDF("__sh")
    val pre = d.withColumn("__bloom", typedLit(bits.toSeq))
      .filter(expr(bloomTestSql("__sh", "__bloom")))
      .drop("__bloom")
    pre.join(broadcast(b), Seq("__sh"), "left_semi")
      .select(col("doc_id")).distinct()
  }

  /** Bloom geometry for the decontamination prefilter: 2^17 bits packed
    * into 64-bit slots (16 KiB — trivially a broadcast literal), 3
    * probes. Sized for eval-suite shingle sets (tens of thousands of
    * distinct shingles at ~0.2 load); a saturated filter degrades to
    * pass-through, never to a wrong answer.
    */
  val ContamBloomBits = 1 << 17
  val ContamBloomK = 3

  /** Driver-side build of the packed-slot Bloom bitset over a hash set —
    * the ONE place the probe arithmetic lives alongside its in-plan
    * mirror [[bloomTestSql]]: a divergence between build and test would
    * silently drop candidates, so [[contaminatedBy]] and
    * [[contaminationSpans]] must share this.
    */
  private def contamBloomBits(hashes: IterableOnce[Long]): Array[Long] = {
    val bits = new Array[Long](ContamBloomBits / 64)
    hashes.iterator.foreach { h =>
      var j = 0
      while (j < ContamBloomK) {
        val (a, c) = Sketches.RowConsts(j)
        val p = (((a * h + c) % TextOps.HashMod) % ContamBloomBits).toInt
        bits(p >> 6) |= 1L << (p & 63)
        j += 1
      }
    }
    bits
  }

  /** SQL predicate testing `hCol`'s ContamBloomK probe bits against the
    * packed-slot array column `bloomCol` — pure arithmetic + element_at,
    * stays in whole-stage codegen.
    */
  private def bloomTestSql(hCol: String, bloomCol: String): String =
    (0 until ContamBloomK).map { j =>
      val p = Sketches.bucketSql(hCol, j, ContamBloomBits)
      s"(element_at($bloomCol, CAST(($p) div 64 AS INT) + 1) & " +
        s"shiftleft(CAST(1 AS BIGINT), CAST(($p) % 64 AS INT))) != 0"
    }.mkString(" AND ")

  /** Exact token-run decontamination WITH SPANS — the published
    * GPT-3/Pile methodology: a training doc is contaminated when it
    * shares an EXACT n-token run with an eval document; the pipeline
    * needs the span (where, how long, against which benchmark doc) to
    * cut or audit it, not just a flag ([[contaminatedBy]]'s coarser
    * any-3-gram answer). Emits one row per MAXIMAL shared run:
    * (doc_id, bench_id, span_start, bench_start, span_len), positions
    * 0-based over the single-space word split, span_len ≥ n.
    *
    * Algorithm — shingle match + run extension, never all-pairs:
    * positioned n-gram hashes on both sides (arithmetic composition of
    * [[TextOps.charHash]] word hashes, computed in-plan exactly like
    * [[shingleHashes]]); the eval side is collected once
    * (driver-sized by the decontamination contract — the broadcast
    * join needs it driver-resident anyway) and feeds BOTH the
    * [[ContamBloomBits]] in-scan Bloom prefilter and the broadcast
    * build side; matched positions then collapse to maximal runs by
    * gaps-and-islands: group (doc, bench, delta = pos − bench_pos),
    * island key = pos − row_number, one window + one aggregate. At
    * 100 TB the corpus pays one scan + an explode; the window runs
    * ONLY over matched candidate positions (eval-overlap-sized, tiny),
    * never over the corpus.
    *
    * Matches are n-gram HASH runs (P = 1e9+7): a cross-doc collision
    * could in principle seed a span, but the oracle composes the same
    * hashes, so both engines agree exactly.
    */
  def contaminationSpans(docs: DataFrame, bench: DataFrame, idCol: String,
                         textCol: String, n: Int): DataFrame = {
    require(n >= 2, s"span shingle width must be >= 2, got $n")
    val spark = docs.sparkSession
    import spark.implicits._
    def posShingles(df: DataFrame, outId: String): DataFrame =
      df.select(col(idCol).as(outId),
        graft.functions.WordHashes.word_hashes(col(textCol)).as("hw"))
        // native fused loop (functions.NgramHashes) — element j IS the
        // n-gram at word offset j, so posexplode's pos is the span
        // coordinate; short docs yield an empty array (no positions)
        .select(col(outId),
          graft.functions.NgramHashes.ngram_hashes(col("hw"), n).as("sh"))
        .select(col(outId), posexplode(col("sh")).as(Seq("pos", "h")))
    val benchRows = posShingles(bench, "bench_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val bits = contamBloomBits(benchRows.iterator.map(_._3))
    val b = benchRows.toSeq.toDF("bench_id", "bpos", "h")
    val pre = posShingles(docs, "doc_id")
      .withColumn("__bloom", typedLit(bits.toSeq))
      .filter(expr(bloomTestSql("h", "__bloom")))
      .drop("__bloom")
    val m = pre.join(broadcast(b), Seq("h"))
      .select(col("doc_id"), col("bench_id"), col("pos"),
        (col("pos") - col("bpos")).as("delta"))
    val w = Window.partitionBy(col("doc_id"), col("bench_id"), col("delta"))
      .orderBy(col("pos"))
    m.withColumn("grp", col("pos") - row_number().over(w))
      .groupBy(col("doc_id"), col("bench_id"), col("delta"), col("grp"))
      .agg(min(col("pos")).cast("long").as("span_start"),
        (count(lit(1)) + lit(n - 1).cast("long")).as("span_len"))
      .select(col("doc_id"), col("bench_id"), col("span_start"),
        (col("span_start") - col("delta")).cast("long").as("bench_start"),
        col("span_len"))
  }

  /** INTRA-corpus duplicated-passage spans — the exact-substring dedup
    * signal of Lee et al. ("Deduplicating Training Data Makes Language
    * Models Better"): one row per MAXIMAL n-token run shared by two
    * documents, (doc_a, doc_b, span_a_start, span_b_start, span_len),
    * doc_a < doc_b, positions 0-based over the single-space word split.
    * [[contaminationSpans]] asks "does my corpus leak the eval set";
    * this asks "does my corpus repeat itself" — the passage-level
    * signal that doc-level MinHash and chunk-level hashing both miss
    * (a duplicated paragraph at different offsets in otherwise-novel
    * docs).
    *
    * Fully distributed — unlike the contamination form there is no
    * small side to collect: positioned n-gram hashes over the corpus,
    * a VIRAL-SHINGLE CAP (a hash occurring > `cap` times is ubiquitous
    * boilerplate whose pair set would go O(occ²); chunk-level dedup
    * owns those — the [[Similarity]] bucket-cap discipline), a
    * self-equi-join on the hash (never all-pairs), then the same
    * gaps-and-islands collapse as the contamination spans. Shuffles:
    * the hash count, the self-join, the per-(pair, delta) window —
    * all on narrow keys; the window runs only over matched positions.
    */
  def selfSpans(docs: DataFrame, idCol: String, textCol: String, n: Int,
                cap: Int = 64): DataFrame = {
    require(n >= 2, s"span shingle width must be >= 2, got $n")
    // checkpoint the positioned-shingle stage BEFORE its two consumers
    // (the cap aggregate and the join probe): referenced twice, the
    // corpus-wide hash+posexplode — this operator's dominant scan —
    // would otherwise execute twice in one job (the boilerplateRatio
    // two-consumer discipline; partial aggregation makes the two
    // exchanges non-identical, so ReuseExchange cannot dedupe them)
    val p = graft.core.Materialize.checkpoint(
      docs.select(col(idCol).as("doc_id"),
          graft.functions.WordHashes.word_hashes(col(textCol)).as("hw"))
        .select(col("doc_id"),
          posexplode(graft.functions.NgramHashes.ngram_hashes(col("hw"), n))
            .as(Seq("pos", "h"))))
    val ok = p.groupBy(col("h")).agg(count(lit(1)).as("__c"))
      .filter(col("__c") <= cap).select(col("h"))
    val occ = p.join(ok, "h")
    val a = occ.select(col("h"), col("doc_id").as("doc_a"), col("pos").as("pos_a"))
    val b = occ.select(col("h").as("hb"), col("doc_id").as("doc_b"),
      col("pos").as("pos_b"))
    val m = a.join(b, col("h") === col("hb") && col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("pos_a"),
        (col("pos_a") - col("pos_b")).as("delta"))
    val w = Window.partitionBy(col("doc_a"), col("doc_b"), col("delta"))
      .orderBy(col("pos_a"))
    m.withColumn("grp", col("pos_a") - row_number().over(w))
      .groupBy(col("doc_a"), col("doc_b"), col("delta"), col("grp"))
      .agg(min(col("pos_a")).cast("long").as("span_a_start"),
        (count(lit(1)) + lit(n - 1).cast("long")).as("span_len"))
      .select(col("doc_a"), col("doc_b"), col("span_a_start"),
        (col("span_a_start") - col("delta")).cast("long").as("span_b_start"),
        col("span_len"))
  }

  /** The shared self-span CTE chain through `g` (matched positions with
    * island keys) — [[selfSpansSql]] aggregates it to pair spans,
    * [[selfDedupCutSql]] carries it through to the cut (the
    * [[contaminationSpansCtes]] sharing discipline: one chain, two
    * consumers, so the mirrors cannot drift).
    */
  private def selfSpansCtes(n: Int, cap: Int): String = {
    val h = TextOps.charHashSql("w")
    s"""hw AS (SELECT doc_id, [$h for w in string_split(text, ' ')] AS hw
          FROM documents),
        sh AS (SELECT doc_id, (CASE WHEN len(hw) >= $n THEN
            [list_reduce(hw[j+1:j+$n], (a,b) -> (a*31+b) % $P)
             for j in range(0, len(hw)-$n+1)]
           ELSE [] END) AS sh FROM hw),
        pp AS (SELECT doc_id, UNNEST(sh) AS h, UNNEST(range(len(sh))) AS pos
               FROM sh),
        ok AS (SELECT h FROM pp GROUP BY h HAVING COUNT(*) <= $cap),
        occ AS (SELECT pp.* FROM pp JOIN ok USING (h)),
        m AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     a.pos AS pos_a, a.pos - b.pos AS delta
              FROM occ a JOIN occ b ON a.h = b.h AND a.doc_id < b.doc_id),
        g AS (SELECT *, pos_a - row_number()
                OVER (PARTITION BY doc_a, doc_b, delta ORDER BY pos_a) AS grp
              FROM m)"""
  }

  /** The shared excision tail: anti-join the `cov` covered-position set
    * onto the word-exploded corpus, re-aggregate (`docsWhere` scopes
    * which docs are emitted/cut — the decontamination form excludes the
    * bench docs).
    */
  private def exciseTailSql(docsWhere: String): String =
    s"""toks AS (SELECT doc_id, string_split(text, ' ') AS ws
                 FROM documents WHERE $docsWhere),
        w AS (SELECT doc_id, UNNEST(ws) AS w, UNNEST(range(len(ws))) AS pos
              FROM toks),
        kept AS (SELECT w.doc_id, w.w, w.pos
                 FROM w ANTI JOIN cov USING (doc_id, pos)),
        agg AS (SELECT doc_id, string_agg(w, ' ' ORDER BY pos) AS clean_text,
                       COUNT(*) AS n_kept
                FROM kept GROUP BY doc_id)
        SELECT t.doc_id, COALESCE(a.clean_text, '') AS clean_text,
               CAST(len(t.ws) - COALESCE(a.n_kept, 0) AS BIGINT) AS n_removed
        FROM toks t LEFT JOIN agg a USING (doc_id)"""

  /** DuckDB mirror of [[selfSpans]] over `documents`. */
  def selfSpansSql(n: Int, cap: Int = 64): String =
    s"""WITH ${selfSpansCtes(n, cap)}
        SELECT doc_a, doc_b,
          CAST(MIN(pos_a) AS BIGINT) AS span_a_start,
          CAST(MIN(pos_a) - delta AS BIGINT) AS span_b_start,
          CAST(COUNT(*) + $n - 1 AS BIGINT) AS span_len
        FROM g GROUP BY doc_a, doc_b, delta, grp"""

  /** Span EXCISION — the cut step completing the decontamination
    * methodology: rebuild each training doc with every token covered by
    * a [[contaminationSpans]] run removed. Output (doc_id, clean_text,
    * n_removed); an uncontaminated doc passes through whole
    * (n_removed = 0), a fully-covered doc becomes the empty string.
    *
    * Scale shape: the spans collapse to ONE contamination-sized row per
    * doc (a list of (start, len) — spans per doc are few by nature),
    * LEFT-joined onto the corpus; the removal itself is a per-row array
    * lambda (index-not-covered filter), so after the tiny join this is
    * a map-only pass — the corpus is never token-exploded and never
    * shuffles. The oracle takes the explode route instead (DuckDB has
    * no cost concern at oracle scale); both produce identical rows.
    */
  def decontaminate(docs: DataFrame, bench: DataFrame, idCol: String,
                    textCol: String, n: Int): DataFrame =
    exciseSpans(docs, idCol, textCol,
      contaminationSpans(docs, bench, idCol, textCol, n)
        .select(col("doc_id"), col("span_start"), col("span_len")))

  /** The excision half of [[decontaminate]], parameterized by the span
    * table (doc_id, span_start, span_len) so both decontamination and
    * the intra-corpus [[selfDedupCut]] share one cut implementation.
    */
  private def exciseSpans(docs: DataFrame, idCol: String, textCol: String,
                          spans: DataFrame): DataFrame = {
    val spansByDoc = spans
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("span_start").as("s"),
        col("span_len").as("l"))).as("spans"))
    val joined = docs
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("ws"))
      .join(spansByDoc, Seq("doc_id"), "left")
      // no spans → empty list, NOT null: exists(NULL, …) is NULL and a
      // null keep-predicate would silently drop every token
      .select(col("doc_id"), col("ws"),
        coalesce(col("spans"),
          array().cast("array<struct<s:bigint,l:bigint>>")).as("spans"))
    val kept = filter(
      transform(sequence(lit(0), size(col("ws")) - 1), i =>
        struct(i.as("i"), element_at(col("ws"), i + 1).as("w"))),
      p => !exists(col("spans"), s =>
        p.getField("i") >= s.getField("s") &&
          p.getField("i") < s.getField("s") + s.getField("l")))
    // staged Project: the O(words × spans) coverage filter referenced
    // from two consumers would inline (recompute) per row — the
    // shingleHashes CSE discipline
    joined.select(col("doc_id"), col("ws"), kept.as("__kept"))
      .select(col("doc_id"),
        array_join(transform(col("__kept"), p => p.getField("w")), " ")
          .as("clean_text"),
        (size(col("ws")) - size(col("__kept"))).cast("long").as("n_removed"))
  }

  /** Intra-corpus KEEP-FIRST passage excision — the cut completing the
    * Lee et al. exact-substring dedup: every [[selfSpans]] run is
    * removed from the HIGHER-id document of its pair (doc_a, the first
    * occurrence, keeps its copy for that pair). Every token therefore
    * survives in at least its lowest-id holder; when DISTINCT passages
    * overlap inside one doc, that doc can lose the overlap tokens to
    * one pair while keeping the rest — the passage then survives as
    * fragments across its first holders rather than as one contiguous
    * copy (don't assert "exactly one intact copy" over overlapping
    * spans). Output over the FULL corpus: (doc_id, clean_text,
    * n_removed); untouched docs pass through with n_removed = 0.
    * Same scale shape as [[decontaminate]]: spans collapse to one row
    * per cut doc, then a map-only per-row lambda — shared
    * [[exciseSpans]] implementation.
    */
  def selfDedupCut(docs: DataFrame, idCol: String, textCol: String, n: Int,
                   cap: Int = 64): DataFrame =
    exciseSpans(docs, idCol, textCol,
      selfSpans(docs, idCol, textCol, n, cap)
        .select(col("doc_b").as("doc_id"),
          col("span_b_start").as("span_start"), col("span_len")))

  /** DuckDB mirror of [[selfDedupCut]] over `documents`. */
  def selfDedupCutSql(n: Int, cap: Int = 64): String =
    s"""WITH ${selfSpansCtes(n, cap)},
        spans AS (SELECT doc_b AS doc_id,
            CAST(MIN(pos_a) - delta AS BIGINT) AS span_start,
            CAST(COUNT(*) + $n - 1 AS BIGINT) AS span_len
          FROM g GROUP BY doc_a, doc_b, delta, grp),
        cov AS (SELECT DISTINCT * FROM (
          SELECT doc_id, UNNEST(range(span_start, span_start + span_len)) AS pos
          FROM spans)),
        ${exciseTailSql("TRUE")}"""

  /** DuckDB mirror of [[decontaminate]] (explode + anti-join route —
    * fine at oracle scale, identical rows).
    */
  def decontaminateSql(n: Int, docsWhere: String, benchWhere: String): String =
    s"""WITH ${contaminationSpansCtes(n, docsWhere, benchWhere)},
        spans AS (SELECT doc_id,
            CAST(MIN(pos) AS BIGINT) AS span_start,
            CAST(COUNT(*) + $n - 1 AS BIGINT) AS span_len
          FROM g GROUP BY doc_id, bench_id, delta, grp),
        cov AS (SELECT DISTINCT * FROM (
          SELECT doc_id, UNNEST(range(span_start, span_start + span_len)) AS pos
          FROM spans)),
        ${exciseTailSql(docsWhere)}"""

  /** DuckDB mirror of [[contaminationSpans]] over `documents`, with the
    * train/eval split expressed as WHERE clauses.
    */
  /** The shared CTE chain through `g` (matched positions with island
    * keys) — [[contaminationSpansSql]] aggregates it to spans,
    * [[decontaminateSql]] carries it through to the cut.
    */
  private def contaminationSpansCtes(n: Int, docsWhere: String,
                                     benchWhere: String): String = {
    val h = TextOps.charHashSql("w")
    s"""hw AS (SELECT doc_id, [$h for w in string_split(text, ' ')] AS hw
          FROM documents),
        sh AS (SELECT doc_id, (CASE WHEN len(hw) >= $n THEN
            [list_reduce(hw[j+1:j+$n], (a,b) -> (a*31+b) % $P)
             for j in range(0, len(hw)-$n+1)]
           ELSE [] END) AS sh FROM hw),
        dp AS (SELECT doc_id, UNNEST(sh) AS h, UNNEST(range(len(sh))) AS pos
               FROM sh WHERE $docsWhere),
        bp AS (SELECT doc_id AS bench_id, UNNEST(sh) AS h,
                      UNNEST(range(len(sh))) AS bpos
               FROM sh WHERE $benchWhere),
        m AS (SELECT dp.doc_id, bp.bench_id, dp.pos, dp.pos - bp.bpos AS delta
              FROM dp JOIN bp USING (h)),
        g AS (SELECT *, pos - row_number()
                OVER (PARTITION BY doc_id, bench_id, delta ORDER BY pos) AS grp
              FROM m)"""
  }

  def contaminationSpansSql(n: Int, docsWhere: String,
                            benchWhere: String): String =
    s"""WITH ${contaminationSpansCtes(n, docsWhere, benchWhere)}
        SELECT doc_id, bench_id,
          CAST(MIN(pos) AS BIGINT) AS span_start,
          CAST(MIN(pos) - delta AS BIGINT) AS bench_start,
          CAST(COUNT(*) + $n - 1 AS BIGINT) AS span_len
        FROM g GROUP BY doc_id, bench_id, delta, grp"""

  /** (band, bucket-string, doc_id) — one row per band per doc. Docs with
    * NO shingles (< 3 words) are excluded: their min-hashes are all null
    * and concat_ws would silently collapse every short doc into the same
    * NumBands buckets — an O(shortDocs²) all-pairs explosion. Short docs
    * are simply not candidates for shingle-based near-dup (use exact
    * dedup / embedding near-dup for them).
    */
  def bandBuckets(sig: DataFrame): DataFrame = {
    val bands = (0 until NumBands).map { b =>
      concat_ws("|", lit(b.toString) +:
        (0 until BandSize).map(r => element_at(col("minhash"), b * BandSize + r + 1)): _*)
    }
    sig.filter(size(col("sh")) > 0)
      .select(col("doc_id"), explode(array(bands: _*)).as("bucket"))
  }

  /** Band buckets with over-populated buckets dropped (the candidate
    * index actually joined — one shuffle on the bucket key, which the
    * window count shares).
    */
  def cappedBandBuckets(sig: DataFrame, cap: Int = MaxBucket): DataFrame =
    ColOps.capBuckets(bandBuckets(sig), cap)

  /** Candidate pairs: docs sharing ≥1 surviving band bucket (a < b,
    * distinct).
    */
  def candidatePairs(sig: DataFrame, cap: Int = MaxBucket): DataFrame = {
    val bk = cappedBandBuckets(sig, cap)
    val a = bk.select(col("bucket"), col("doc_id").as("doc_a"))
    val b = bk.select(col("bucket").as("bucket_b"), col("doc_id").as("doc_b"))
    a.join(b, col("bucket") === col("bucket_b") && col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
  }

  /** Verified near-dups: candidate pairs + exact shingle-set Jaccard.
    * Intersection via filter-over-distinct-arrays (portable to DuckDB);
    * the division is exact IEEE on both engines.
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   cap: Int = MaxBucket): DataFrame = {
    // The signature pipeline feeds three consumers (bucket pass + both
    // pair sides): materialize it once — signatures are tiny relative to
    // the text (k longs + the shingle set), so this is the cheap side of
    // the trade at any scale.
    val sig = graft.core.Materialize.checkpoint(minhashSignatures(df, idCol, textCol))
    val pairs = candidatePairs(sig, cap)
    val sa = sig.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val sb = sig.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    pairs.join(sa, "doc_a").join(sb, "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
         size(array_union(col("sh_a"), col("sh_b"))).cast("double")).as("jaccard"))
  }

  /** Asymmetric CONTAINMENT over the LSH candidate pairs:
    * C(a→b) = |A∩B| / |A| (and the mirror C(b→a)) on the shingle sets —
    * the near-dup statistic symmetric Jaccard understates: a doc pasted
    * inside a 2× longer one has J ≈ 0.5 (under any dedup threshold) but
    * C(a→b) ≈ 1 (quote farms, boilerplate wrappers, doc-in-doc
    * contamination). Candidate generation, caps, and scale shape are
    * EXACTLY [[jaccardPairs]] — one signature pass, banded buckets,
    * per-bucket population caps — only the verify arithmetic differs,
    * so the all-pairs blowup analysis carries over unchanged.
    *
    * Honest recall bound: the candidates come from SYMMETRIC minhash
    * bands, whose collision probability is J^BandSize per band — so a
    * containment pair is surfaced only while J = |A|/|B| stays
    * moderate (length ratio ≲ 3× at the 4×4 default). Extreme
    * containment (a paragraph in a book, J → 0) needs an
    * asymmetric index — e.g. bucketing B's shingle WINDOWS of |A|'s
    * size, or a seeded shingle-sample inverted index — which is a
    * different candidate generator, not a different verifier; this
    * operator's verify stage composes with either unchanged.
    */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
                       cap: Int = MaxBucket): DataFrame = {
    val sig = graft.core.Materialize.checkpoint(minhashSignatures(df, idCol, textCol))
    val pairs = candidatePairs(sig, cap)
    val sa = sig.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val sb = sig.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    val inter = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
    pairs.join(sa, "doc_a").join(sb, "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (inter / size(col("sh_a")).cast("double")).as("cont_ab"),
        (inter / size(col("sh_b")).cast("double")).as("cont_ba"))
  }

  /** Character-level edit distance over the LSH candidate pairs — the
    * strictest near-dup verifier (catches small in-place edits that
    * shingle-set measures smear out, and quantifies HOW different two
    * near-dups are). Levenshtein is O(|a|·|b|) PER PAIR, which is
    * exactly why it runs on LSH candidates and never all-pairs: the
    * banded buckets + caps bound the quadratic work to genuinely
    * similar pairs, the same containment argument as [[jaccardPairs]].
    * Uses the engine's built-in codegen'd levenshtein (classic
    * single-threaded DP per pair; pairs parallelize across tasks).
    */
  def editDistancePairs(df: DataFrame, idCol: String, textCol: String,
                        cap: Int = MaxBucket): DataFrame = {
    val sig = graft.core.Materialize.checkpoint(minhashSignatures(df, idCol, textCol))
    val pairs = candidatePairs(sig, cap)
    val ta = df.select(col(idCol).as("doc_a"), col(textCol).as("text_a"))
    val tb = df.select(col(idCol).as("doc_b"), col(textCol).as("text_b"))
    pairs.join(ta, "doc_a").join(tb, "doc_b")
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("text_a"), col("text_b")).cast("long").as("edit_dist"))
  }

  /** Incremental near-dup: which INCOMING docs are near-duplicates of
    * the existing corpus — the arriving-batch flow at 100 TB. The corpus
    * side ([[minhashSignatures]] + [[cappedBandBuckets]]) is in
    * production a MAINTAINED index table updated as batches commit, so a
    * new batch never re-hashes the corpus: only the (small) incoming
    * side is signed per run, the candidate join is bucket-keyed against
    * the index, and the exact-Jaccard verify touches only candidate
    * pairs. Both sides cap viral buckets independently (the index is
    * capped at build time; capping the batch too keeps a pathological
    * batch from resurrecting the all-pairs blowup). Output: one row per
    * verified (doc_id, match_id, jaccard ≥ minJ) link.
    */
  def incrementalNearDup(incoming: DataFrame, corpus: DataFrame,
                         idCol: String, textCol: String,
                         minJ: Double = 0.5, cap: Int = MaxBucket): DataFrame = {
    val sigI = graft.core.Materialize.checkpoint(
      minhashSignatures(incoming, idCol, textCol))
    val sigC = graft.core.Materialize.checkpoint(
      minhashSignatures(corpus, idCol, textCol))
    val cand = cappedBandBuckets(sigI, cap)
      .join(cappedBandBuckets(sigC, cap)
        .select(col("bucket"), col("doc_id").as("match_id")), "bucket")
      .select(col("doc_id"), col("match_id")).distinct()
    cand
      .join(sigI.select(col("doc_id"), col("sh").as("sh_i")), "doc_id")
      .join(sigC.select(col("doc_id").as("match_id"), col("sh").as("sh_c")), "match_id")
      .select(col("doc_id"), col("match_id"),
        (size(array_intersect(col("sh_i"), col("sh_c"))).cast("double") /
         size(array_union(col("sh_i"), col("sh_c"))).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= minJ)
  }

  /** Connected components over the verified near-dup pairs: every doc
    * labeled with the SMALLEST doc id reachable through near-duplicate
    * links (jaccard ≥ threshold) — the canonical-representative step of a
    * dedup pipeline (`keep` = the doc IS its cluster's representative).
    * Output: doc_id, cluster, keep.
    *
    * Iterative synchronous min-label propagation: each round every node
    * takes min(own label, min over neighbors' labels); converges in
    * rounds = max component diameter. Near-dup components are shallow by
    * construction (bucket-capped candidate generation bounds how viral a
    * cluster can get), so the loop fails loud rather than returning
    * non-minima if `maxRounds` is ever hit. Each round: one shuffle join
    * of the edge list against the labels + one min-agg; label state is
    * persisted per round and the previous round unpersisted once the new
    * one is materialized (the RowExec persist-lifecycle pattern); only a
    * convergence COUNT crosses the driver per round.
    */
  def nearDupClusters(df: DataFrame, idCol: String, textCol: String,
                      threshold: Double = 0.5, maxRounds: Int = 50): DataFrame =
    clustersFromPairs(df, idCol,
      jaccardPairs(df, idCol, textCol).filter(col("jaccard") >= threshold),
      "doc_a", "doc_b", maxRounds)

  /** The closure step of [[nearDupClusters]] over an EXPLICIT undirected
    * pair list — separated so the propagation loop is testable on a
    * synthetic chain independent of LSH pair generation.
    */
  def clustersFromPairs(nodes: DataFrame, idCol: String, pairs: DataFrame,
                        aCol: String, bCol: String, maxRounds: Int = 50): DataFrame = {
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .persist()
    var labels = nodes.select(col(idCol).as("id"), col(idCol).as("cluster"))
    var cached: DataFrame = null
    try {
      var changed = 1L
      var round = 0
      while (changed > 0 && round < maxRounds) {
        // edge relaxation: pull the smallest label across each edge
        val nbrMin = edges.join(labels, col("src") === col("id"))
          .groupBy(col("dst")).agg(min(col("cluster")).as("nbr"))
        val prop = labels.join(nbrMin, col("id") === col("dst"), "left")
          .select(col("id"), col("cluster").as("old"),
            least(col("cluster"), coalesce(col("nbr"), col("cluster"))).as("mid"))
          .persist()
        // path-halving hop: cluster := label(cluster). Labels are
        // monotone (cluster ≤ id, only ever decreasing) and always name
        // an in-component node, so the hop stays in-component and can
        // only shrink the label — edge relaxation alone needs
        // diameter-many rounds on a chain, relaxation + halving
        // converges in O(log diameter): each round both extends by one
        // hop AND doubles the resolved pointer depth.
        val parent = prop.select(col("id").as("p_id"), col("mid").as("p_mid"))
        val hopped = least(col("mid"), coalesce(col("p_mid"), col("mid")))
        val next = prop.join(parent, col("mid") === col("p_id"), "left")
          .select(col("id"), hopped.as("cluster"), (hopped < col("old")).as("chg"))
          .persist()
        changed = next.filter(col("chg")).count() // materializes `next`
        prop.unpersist()
        if (cached != null) cached.unpersist()
        cached = next
        labels = next.select(col("id"), col("cluster"))
        round += 1
      }
      require(changed == 0,
        s"clustersFromPairs: not converged after $maxRounds rounds (component deeper than bound)")
      graft.core.Materialize.checkpoint(
        labels.select(col("id").as("doc_id"), col("cluster"),
          (col("cluster") === col("id")).as("keep")))
    } finally {
      if (cached != null) cached.unpersist()
      edges.unpersist()
    }
  }

  /** Cluster-representative selection on top of [[nearDupClusters]]:
    * keep the doc with the most regex tokens per near-dup cluster
    * (ties → smallest doc id) — real pipelines keep the best copy, not
    * the first one. The score is an integer (token count), so the rank
    * cut is engine-independent; the rank filter plans as
    * WindowGroupLimit (partial top-1 below the cluster exchange).
    * Output: cluster, best_doc, n_tokens.
    */
  def keepBest(df: DataFrame, idCol: String, textCol: String,
               threshold: Double = 0.5): DataFrame = {
    val clusters = nearDupClusters(df, idCol, textCol, threshold)
      .select(col("doc_id"), col("cluster"))
    val scored = df.select(col(idCol).as("doc_id"),
      size(TextOps.tokens(col(textCol))).cast("long").as("n_tokens"))
    clusters.join(scored, "doc_id")
      .withColumn("rk", row_number().over(Window.partitionBy(col("cluster"))
        .orderBy(col("n_tokens").desc, col("doc_id").asc)))
      .filter(col("rk") === 1)
      .select(col("cluster"), col("doc_id").as("best_doc"), col("n_tokens"))
  }

  // --- boilerplate mining: cross-doc repeated shingles as a quality signal ---

  /** Per-document boilerplate ratio — the headers/footers/licence-block
    * signal a corpus-cleaning pipeline scores before training: a shingle
    * is "boilerplate" when it appears in ≥ `minDocs` DISTINCT documents,
    * and a document's score is the fraction of its distinct shingles
    * that are boilerplate, as an exact parts-per-million integer
    * (`n_boiler * 1e6 div n_sh` — no float division, hash-stable).
    *
    * Two-pass shape over the ONE checkpointed shingle table: pass 1
    * aggregates document frequency per shingle hash (map-side combine;
    * rows are (hash, df) — vocabulary-sized, never document-sized);
    * pass 2 joins the doc's exploded shingles back to the boilerplate
    * subset (AQE broadcasts it when small) and counts per doc. Documents
    * with no shingles (< 3 words) score 0 ppm by definition. Output:
    * (doc_id, n_sh, n_boiler, boiler_ppm).
    */
  def boilerplateRatio(df: DataFrame, idCol: String, textCol: String,
                       minDocs: Long): DataFrame = {
    val sh = graft.core.Materialize.checkpoint(
      shingleHashes(df, idCol, textCol))
    val ex = sh.select(col("doc_id"), explode(col("sh")).as("s"))
    val hot = ex.groupBy(col("s")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDocs).select(col("s"))
    val boiler = ex.join(hot, "s")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_boiler"))
    sh.select(col("doc_id"), size(col("sh")).cast("long").as("n_sh"))
      .join(boiler, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_sh"),
        coalesce(col("n_boiler"), lit(0L)).as("n_boiler"),
        when(col("n_sh") > 0,
          expr("(coalesce(n_boiler, 0) * 1000000) div n_sh"))
          .otherwise(lit(0L)).as("boiler_ppm"))
  }

  /** DuckDB mirror of [[boilerplateRatio]] (same two-pass CTEs). */
  def boilerplateRatioSql(minDocs: Long): String =
    s"""WITH sh AS (SELECT doc_id, $shinglesSql AS sh FROM documents),
        ex AS (SELECT doc_id, UNNEST(sh) AS s FROM sh),
        hot AS (SELECT s FROM ex GROUP BY s HAVING COUNT(*) >= $minDocs),
        boiler AS (SELECT ex.doc_id, COUNT(*) AS n_boiler
                   FROM ex JOIN hot USING (s) GROUP BY ex.doc_id),
        tot AS (SELECT doc_id, CAST(len(sh) AS BIGINT) AS n_sh FROM sh)
        SELECT t.doc_id, t.n_sh,
               CAST(COALESCE(b.n_boiler, 0) AS BIGINT) AS n_boiler,
               CAST(CASE WHEN t.n_sh > 0
                    THEN (COALESCE(b.n_boiler, 0) * 1000000) // t.n_sh
                    ELSE 0 END AS BIGINT) AS boiler_ppm
        FROM tot t LEFT JOIN boiler b ON b.doc_id = t.doc_id"""

  // --- SimHash ---

  val SimBits = 30

  /** 30-bit SimHash over word hashes: bit b set iff the majority of words
    * have bit b set in their hash (strict majority — deterministic).
    * ONE array traversal via the native `simhash_bits` codegen
    * expression (the prior HOF form ran 30 filter lambdas per row —
    * one traversal PER BIT; values are bit-identical, spec-pinned).
    */
  def simhashDf(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
      graft.functions.SimhashBits.simhash_bits(
        graft.functions.WordHashes.word_hashes(col(textCol)), SimBits)
        .as("simhash"))

  /** SimHash bands for near-dup pairing: 3 bands of 10 bits. By the
    * pigeonhole principle, any pair at Hamming distance ≤ 2 differs in
    * at most 2 bands, so it SHARES at least one exact band — banding
    * has EXACT recall for the distance the verify step accepts (unlike
    * MinHash banding, which is probabilistic).
    */
  val SimBands = 3
  val SimBandBits: Int = SimBits / SimBands

  /** SimHash near-dup pairs: banded bucket equi-join (one bucket per
    * band — `"<band>|<band value>"`, same key shape as the MinHash
    * index), [[graft.operators.ColOps.capBuckets]] viral guard, distinct,
    * then the EXACT Hamming verify `bit_count(xor) ≤ maxHamming` on the
    * full hashes. Recall is exact for maxHamming < SimBands (pigeonhole
    * — see [[SimBands]]); never all-pairs, same scale discipline as
    * [[candidatePairs]].
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 2, cap: Int = MaxBucket): DataFrame = {
    require(maxHamming >= 0 && maxHamming < SimBands,
      s"simhashPairs: pigeonhole recall holds only for maxHamming < $SimBands")
    val sig = graft.core.Materialize.checkpoint(simhashDf(df, idCol, textCol))
    val mask = (1L << SimBandBits) - 1
    val bk = sig.select(col("doc_id"), col("simhash"),
      explode(array((0 until SimBands).map { b =>
        concat_ws("|", lit(b),
          shiftright(col("simhash"), b * SimBandBits).bitwiseAND(lit(mask)))
      }: _*)).as("bucket"))
    val capped = ColOps.capBuckets(bk, cap)
    val a = capped.select(col("bucket"), col("doc_id").as("doc_a"),
      col("simhash").as("sim_a"))
    val b = capped.select(col("bucket"), col("doc_id").as("doc_b"),
      col("simhash").as("sim_b"))
    a.join(b, Seq("bucket")).where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).cast("long").as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** DuckDB mirror of [[simhashPairs]] over the documents table. */
  def simhashPairsSql(maxHamming: Int, cap: Int = MaxBucket): String = {
    val mask = (1L << SimBandBits) - 1
    val bands = (0 until SimBands).map { b =>
      s"($b || '|' || (((sh >> ${b * SimBandBits}) & $mask)))"
    }.mkString("[", ", ", "]")
    s"""WITH sig AS (SELECT doc_id, ${simhashSql} AS sh FROM documents),
        bk0 AS (SELECT doc_id, sh, UNNEST($bands) AS bucket FROM sig),
        bk AS (SELECT * FROM bk0
               ${ColOps.capBucketsQualifySql(cap)}),
        pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                         bit_count(xor(a.sh, b.sh))::BIGINT AS hamming
                  FROM bk a JOIN bk b ON a.bucket = b.bucket
                                     AND a.doc_id < b.doc_id)
        SELECT doc_a, doc_b, hamming FROM pairs WHERE hamming <= $maxHamming"""
  }

  // --- oracle SQL builders (same constants, DuckDB dialect) ---

  /** DuckDB expression for the distinct shingle-hash list of `text`
    * (same word-hash composition as [[shingleHashes]]).
    */
  def shinglesSql: String = {
    val h = TextOps.charHashSql("w")
    val hw = s"[$h for w in string_split(text, ' ')]"
    s"""list_distinct((CASE WHEN len(string_split(text, ' ')) >= 3 THEN
          [(((hw[j+1] * 31 + hw[j+2]) % $P) * 31 + hw[j+3]) % $P
           for j in range(0, len(hw) - 2)]
         ELSE [] END))""".replace("hw", s"($hw)")
  }

  /** DuckDB expression list for the k min-hashes over a list column `sh`. */
  def minhashSql(shExpr: String): Seq[String] =
    (0 until NumHashes).map { i =>
      s"list_min([(${HashA(i)} * h + ${HashB(i)}) % $P for h in $shExpr])"
    }

  /** DuckDB expression for the SimHash of `text`. */
  def simhashSql: String = {
    val h = TextOps.charHashSql("w")
    val hw = s"[$h for w in string_split(text, ' ')]"
    val bits = (0 until SimBits).map { b =>
      s"(CASE WHEN 2 * len(list_filter($hw, x -> ((x >> $b) & 1) = 1)) > len($hw) THEN ${1L << b} ELSE 0 END)"
    }
    bits.mkString("(", " + ", ")::BIGINT")
  }
}
