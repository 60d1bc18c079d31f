package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.OrderedOut._

/** Approximate/exact nearest-neighbor search over the `embeddings`
  * table (`embedding: array<float>`, 64 dims in the fixture).
  *
  * Numeric determinism: cosine is computed over 1e6-quantized INTEGER
  * elements — integer dot products and squared norms are exact and
  * order-independent, so Spark and the DuckDB oracle agree
  * bit-for-bit (the only floating steps, sqrt and one division, are
  * IEEE-identical on identical inputs). Quantization error ~1e-6 is
  * irrelevant at ranking granularity.
  *
  * Scale design:
  *  - brute force = broadcast the (small) query set, single scan of
  *    the corpus, per-query top-k via window on qid — the correct
  *    exact-kNN shape at any corpus size (corpus never shuffles);
  *  - sign-grid LSH buckets corpus and queries by the sign pattern of
  *    the leading dims: candidate set shrinks ~2^bits×, turning the
  *    scan into an equi-join on bucket — the scale path;
  *  - the array fold (`aggregate ∘ zip_with`) is a per-row expression:
  *    no explode, no row amplification, stays in whole-stage codegen.
  */
object Similarity {

  private def $(name: String): Column = col(name)

  /** 1e6-quantized integer elements of a float-array column. */
  def quantize(emb: Column): Column =
    transform(emb, x => round(x.cast("double") * 1e6).cast("long"))

  /** Exact integer dot product of two quantized arrays. */
  def qdot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, _ * _), lit(0L), _ + _)

  /** Euclidean norm of a quantized array (double). */
  def qnorm(a: Column): Column = sqrt(qdot(a, a).cast("double"))

  /** Cosine similarity via quantized integer arithmetic. */
  def cosine(a: Column, b: Column): Column = {
    val (qa, qb) = (quantize(a), quantize(b))
    qdot(qa, qb).cast("double") / (qnorm(qa) * qnorm(qb))
  }

  /** Exact brute-force top-k: for each query vector (vec_id <
    * maxQueryId), the k most cosine-similar OTHER vectors.
    * Output: qid, cid, cos, rn — deterministic (cid tiebreak).
    */
  def bruteForceTopK(embeddings: DataFrame, maxQueryId: Long = 10,
      k: Int = 5): DataFrame = {
    // quantize + norm ONCE per row before the join — per-pair work is
    // then a single integer fold instead of re-quantizing both arrays
    val corpus = embeddings.spread().select($("vec_id").as("cid"),
      quantize($("embedding")).as("ce"))
      .withColumn("cn", qnorm($("ce")))
    val queries = broadcast(
      embeddings.filter($("vec_id") < maxQueryId)
        .select($("vec_id").as("qid"), quantize($("embedding")).as("qe"))
        .withColumn("qn", qnorm($("qe"))))
    val w = Window.partitionBy($("qid")).orderBy($("cos").desc, $("cid").asc)
    corpus.join(queries, $("qid") =!= $("cid"))
      .select($("qid"), $("cid"),
        (qdot($("qe"), $("ce")).cast("double") / ($("qn") * $("cn"))).as("cos"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter($("rn") <= k)
  }

  /** The (a, b) constants of the random-hyperplane family — fixed
    * seeds mirrored literally in the DuckDB oracle SQL
    * (TrainingEntries). Hyperplane h's coefficient for dimension i
    * (1-based) is +1 when ((a_h·i + b_h) mod p) is even, else −1 — a
    * deterministic ±1 Rademacher hyperplane both engines can compute,
    * with none of the leading-dimension skew a coordinate-sign grid
    * has (a ReLU-ish corpus living in one orthant collapses a
    * coordinate grid into a single quadratic bucket; random ±1
    * hyperplanes split any direction evenly in expectation).
    */
  val HashP: Long = 1000000007L
  val hyperplaneParams: Seq[(Long, Long)] = Seq(
    (57030342L, 71803668L), (329008307L, 960416500L),
    (812509399L, 919829078L), (685303968L, 657384281L),
    (758423267L, 449671463L), (880860748L, 896224844L),
    (626288439L, 319090455L), (258173556L, 43330048L),
    (517061524L, 195347281L), (745041494L, 728046401L),
    (498614580L, 631990256L), (384104437L, 186714490L),
    (190624910L, 642451697L), (217431296L, 48829006L),
    (317737651L, 285258657L), (761212922L, 167264882L),
    (844838617L, 501911911L), (754889951L, 588847235L),
    (192644389L, 500536021L), (643380279L, 570456233L),
    (777708137L, 737017018L), (68555598L, 512318906L),
    (663176610L, 247485412L), (365825904L, 770155171L),
    (496595699L, 444322972L), (637541950L, 162675308L),
    (679636352L, 385621567L), (355829169L, 134726352L),
    (303271563L, 966346246L), (121073081L, 584016644L),
    (15979133L, 784364408L), (719580893L, 953347974L))

  /** Signed projection of a QUANTIZED vector onto hyperplane (a, b):
    * an exact integer fold, so the sign is bit-identical across
    * engines (|v|≤1e6, 64 dims → |dot| ≤ 6.4e7, no overflow).
    */
  private def hyperplaneDot(qv: Column, a: Long, b: Long): Column =
    aggregate(
      zip_with(qv, sequence(lit(1), size(qv)), (v, i) =>
        v * when(pmod(i.cast("long") * a + b, lit(HashP)) % 2 === 0, 1L)
          .otherwise(-1L)),
      lit(0L), _ + _)

  /** Bucket key of hyperplane table `t`: the `bits` sign bits of
    * hyperplanes t·bits .. t·bits+bits−1, as a string key.
    */
  def hyperplaneBucket(qv: Column, table: Int, bits: Int): Column =
    concat((0 until bits).map { r =>
      val (a, b) = hyperplaneParams(table * bits + r)
      when(hyperplaneDot(qv, a, b) >= 0, lit("1")).otherwise(lit("0"))
    }: _*)

  /** (vec_id, qv, nrm, tbl, bucket) — one row per vector per table.
    * Multi-table banding is the recall lever (a near-dup pair missed
    * by one table's bits is caught by another); `tables`·`bits` ≤
    * hyperplaneParams.size.
    */
  private def hyperplaneBucketed(embeddings: DataFrame, tables: Int,
      bits: Int): DataFrame = {
    require(tables * bits <= hyperplaneParams.size,
      s"tables=$tables × bits=$bits exceeds the hyperplane family " +
        s"(${hyperplaneParams.size})")
    embeddings.spread()
      .select($("vec_id"), quantize($("embedding")).as("qv"))
      .withColumn("nrm", qnorm($("qv")))
      .select($("vec_id"), $("qv"), $("nrm"),
        posexplode(array((0 until tables).map(t =>
          hyperplaneBucket($("qv"), t, bits)): _*)).as(Seq("tbl", "bucket")))
  }

  /** Drop buckets holding more than `maxBucket` vectors — the same
    * bounding idea as Dedup.lshCandidates: one degenerate bucket
    * (mass-duplicated embedding, zero vectors) would otherwise make
    * the self-join quadratic; with the cap the worst case is
    * tables·N·maxBucket candidate rows — linear in corpus size.
    */
  private def capBuckets(bucketed: DataFrame, maxBucket: Int): DataFrame = {
    val ok = bucketed.groupBy("tbl", "bucket")
      .agg(count(lit(1)).as("bsz"))
      .filter($("bsz") <= maxBucket)
      .select("tbl", "bucket")
    bucketed.join(ok, Seq("tbl", "bucket"))
  }

  /** Embedding-cosine near-duplicate pairs: all (id1 < id2) pairs
    * with cosine ≥ threshold, candidate-limited to shared
    * random-hyperplane buckets. Duplicate candidates from multiple
    * tables are collapsed by dropDuplicates over the pair key (every
    * duplicate row carries identical vector payloads, so the survivor
    * is value-deterministic).
    */
  def cosineDupPairs(embeddings: DataFrame, threshold: Double = 0.95,
      tables: Int = 4, bits: Int = 8, maxBucket: Int = 256): DataFrame = {
    val bucketed = capBuckets(hyperplaneBucketed(embeddings, tables, bits), maxBucket)
    val a = bucketed.select($("tbl"), $("bucket"), $("vec_id").as("id1"),
      $("qv").as("v1"), $("nrm").as("n1"))
    val b = bucketed.select($("tbl"), $("bucket"), $("vec_id").as("id2"),
      $("qv").as("v2"), $("nrm").as("n2"))
    a.join(b, Seq("tbl", "bucket"))
      .filter($("id1") < $("id2"))
      .dropDuplicates("id1", "id2")
      .select($("id1"), $("id2"),
        (qdot($("v1"), $("v2")).cast("double") / ($("n1") * $("n2"))).as("cos"))
      .filter($("cos") >= threshold)
  }

  /** Ranked cell assignments: for every vector, its `nprobe` nearest
    * centroids by cosine (ties: higher cosine, then lower cell id).
    * `centroids` = (c_id, cv, cnrm), always tiny → broadcast; the
    * corpus never shuffles here.
    */
  private def assignCells(quant: DataFrame, centroids: DataFrame,
      nprobe: Int): DataFrame = {
    val w = Window.partitionBy($("vec_id"))
      .orderBy($("ccos").desc, $("c_id").asc)
    quant.crossJoin(broadcast(centroids))
      .select($("vec_id"), $("c_id"),
        (qdot($("qv"), $("cv")).cast("double") / ($("nrm") * $("cnrm"))).as("ccos"))
      .withColumn("arn", row_number().over(w))
      .filter($("arn") <= nprobe)
      .select($("vec_id"), $("c_id").as("cell"), $("arn"))
  }

  /** One Lloyd step: assign every vector to its nearest centroid,
    * then per-cell per-dimension mean of the quantized elements —
    * floor(sum/count), exact and engine-portable (sums stay within
    * double's exact-integer range, and a true quotient is never
    * within 1 ulp of a wrong floor) — rebuilt into an array column.
    * Cells that lose all members disappear (both engines agree).
    */
  private def centroidStep(quant: DataFrame, centroids: DataFrame): DataFrame =
    assignCells(quant, centroids, 1)
      .join(quant, Seq("vec_id"))
      .select($("cell"), posexplode($("qv")).as(Seq("i", "v")))
      .groupBy($("cell"), $("i"))
      .agg(floor(sum($("v")).cast("double") / count(lit(1))).cast("long").as("cv"))
      .groupBy($("cell"))
      .agg(transform(array_sort(collect_list(struct($("i"), $("cv")))),
        x => x("cv")).as("cv"))
      .select($("cell").as("c_id"), $("cv"))
      .withColumn("cnrm", qnorm($("cv")))

  /** Quantized (vec_id, qv, nrm) corpus, persisted — the shared input
    * of IVF training, assignment, and both join legs.
    */
  private def quantized(embeddings: DataFrame): DataFrame =
    embeddings.spread()
      .select($("vec_id"), quantize($("embedding")).as("qv"))
      .withColumn("nrm", qnorm($("qv")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** Deterministic k-means training: seed centroids are the
    * `nCentroids` vectors whose vec_ids sort FIRST under
    * (md5(vec_id), vec_id) — a deterministic pseudo-random draw that
    * needs no assumption about the id space (dense, sparse, offset,
    * or post-takedown-compacted ids all seed exactly `nCentroids`
    * centroids; the old `vec_id <= K` rule silently under-seeded any
    * store whose ids don't start near 1). The draw is a global
    * top-K (TakeOrderedAndProject — per-partition heads then one
    * K-row merge, never a single-partition sort), refined by
    * `lloydIters` Lloyd iterations.
    * Each refinement is MATERIALIZED — the K×D centroid rows are
    * collected to the driver (tiny, like MLlib k-means) and fed back
    * as a LocalRelation, so training executes exactly once per call
    * regardless of how many downstream actions consume the result.
    *
    * `trainFraction` < 1 runs the Lloyd passes over a DETERMINISTIC
    * md5-hash sample of the corpus (the same shard-order-free keying
    * as Curation.hashSplit — no `rand()`, so retries and both engines
    * see the same sample) while assignment still covers every vector.
    * This is the 100 TB shape: k-means centroid quality converges on a
    * small sample (each Lloyd pass is O(sample·K) instead of
    * O(corpus·K)), and only the single final assignment pass scans the
    * full corpus. Seeds stay the md5-first `nCentroids` vectors of the
    * FULL corpus, so fraction=1.0 is bit-identical to the unsampled
    * path and the sampled path degrades gracefully (a seed missing
    * from the sample just attracts no members in training).
    */
  private def trainCentroids(quant: DataFrame, nCentroids: Int,
      lloydIters: Int, trainFraction: Double = 1.0): DataFrame = {
    require(trainFraction > 0.0 && trainFraction <= 1.0,
      s"trainFraction=$trainFraction outside (0, 1]")
    val spark = quant.sparkSession
    import spark.implicits._
    val trainSet =
      if (trainFraction >= 1.0) quant
      else quant.filter(
        conv(substring(md5($("vec_id").cast("string")), 1, 8), 16, 10)
          .cast("long") % 10000 < (trainFraction * 10000).toLong)
    def localize(df: DataFrame): DataFrame =
      df.select($("c_id").cast("long"), $("cv"), $("cnrm"))
        .as[(Long, Seq[Long], Double)].collect().toSeq
        .toDF("c_id", "cv", "cnrm")
    val seedIds = quant.select($("vec_id"))
      .orderBy(md5($("vec_id").cast("string")).asc, $("vec_id").asc)
      .limit(nCentroids)
    var centroids = localize(quant.join(seedIds, Seq("vec_id"), "left_semi")
      .select($("vec_id").as("c_id"), $("qv").as("cv"), $("nrm").as("cnrm")))
    for (_ <- 1 to lloydIters)
      centroids = localize(centroidStep(trainSet, centroids))
    centroids
  }

  /** IVF (inverted-file) ANN: deterministic k-means training
    * ([[trainCentroids]]) — then each corpus vector lives in its
    * nearest cell and a query probes its `nprobe` nearest cells.
    * The classic IVF trade: train cost O(iters·N·C), then each query
    * scans ~nprobe·N/C vectors.
    *
    * Every step is integer-derived and tie-broken (cosine desc, cell
    * asc), so the DuckDB oracle reproduces training bit-for-bit.
    * `assigned` is persisted because it fans into both join legs.
    * At warehouse scale training runs on a sample (`trainFraction`) and
    * the centroids persist as a dimension table; the default 1.0 keeps
    * the oracle-gated contract bit-exact.
    */
  def ivfTopK(embeddings: DataFrame, maxQueryId: Long = 10, k: Int = 5,
      nCentroids: Int = 16, lloydIters: Int = 2, nprobe: Int = 2,
      trainFraction: Double = 1.0): DataFrame = {
    val quant = quantized(embeddings)
    val centroids = trainCentroids(quant, nCentroids, lloydIters, trainFraction)
    val assigned = assignCells(quant, centroids, nprobe)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val corpus = assigned.filter($("arn") === 1)
      .join(quant, Seq("vec_id"))
      .select($("cell"), $("vec_id").as("cid"), $("qv").as("ce"), $("nrm").as("cn"))
    val queries = broadcast(assigned.filter($("vec_id") < maxQueryId)
      .join(quant, Seq("vec_id"))
      .select($("cell"), $("vec_id").as("qid"), $("qv").as("qe"), $("nrm").as("qn")))
    val w = Window.partitionBy($("qid")).orderBy($("cos").desc, $("cid").asc)
    corpus.join(queries, Seq("cell"))
      .filter($("qid") =!= $("cid"))
      .select($("qid"), $("cid"),
        (qdot($("qe"), $("ce")).cast("double") / ($("qn") * $("cn"))).as("cos"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter($("rn") <= k)
  }

  /** SemDeDup-style semantic near-duplicate pairs: cluster the corpus
    * with the deterministic IVF k-means ([[trainCentroids]]), then
    * emit every same-cell pair (id1 < id2) with cosine ≥ `threshold`.
    * Clustering first makes the pair search local: only vectors that
    * landed in the same cell are compared, never the full corpus.
    *
    * Scale: per-cell pair generation is quadratic in cell size, so the
    * knobs are `nCentroids` (∝ corpus size keeps expected cell size
    * constant) and the `maxCell` cap — a degenerate cell (mass-
    * duplicated embedding) is dropped outright rather than allowed to
    * blow up the join, the same bounding idea as [[cosineDupPairs]]'s
    * bucket cap; the cap is mirrored in the DuckDB oracle. Unlike the
    * hyperplane variant each vector sits in exactly ONE cell, so no
    * cross-table dedup of candidate pairs is needed, at the cost of
    * missing pairs straddling a cell boundary (the recall trade
    * SemDeDup accepts).
    *
    * The assignment pass itself defaults to the TWO-LEVEL coarse
    * quantizer ([[twoLevelAssign]]'s shape; `coarse = -1` auto-sizes
    * G = ceil(√C)): per vector O(G + probe·C/G) centroid dots instead
    * of the flat O(C) — with cells sized ∝ corpus, flat assignment is
    * N²/maxCell and was rehearsal-measured at 17.7× cpu for 10× data.
    * `coarse = 0` restores the exact flat baseline. EXPECTED
    * DIVERGENCE: two-level may move a boundary vector to a different
    * cell, so some flat pairs are lost and others gained — never a
    * wrong cosine; TrainingOpsSpec quantifies ≥ 70% pair recall vs
    * flat at C=16 on the worst-case uniform fixture (clustered real
    * corpora do better).
    */
  def semanticDupPairs(embeddings: DataFrame, threshold: Double = 0.35,
      nCentroids: Int = 16, lloydIters: Int = 2,
      maxCell: Int = 256, trainFraction: Double = 1.0,
      coarse: Int = -1, coarseProbe: Int = 2): DataFrame =
    semanticDupPairsFromCells(
      cellAssignments(embeddings, nCentroids, lloydIters, trainFraction,
        coarse, coarseProbe),
      embeddings, threshold, maxCell)

  /** The within-cell family's shared ARTIFACT: (vec_id, cell) under
    * the deterministic IVF training + (two-level by default)
    * assignment. [[semanticDupPairs]]/[[hardNegatives]]/[[labelNoise]]
    * all pay this same training + assignment pass standalone; a
    * pipeline materializes it ONCE per corpus version and drives the
    * three consumers off the parquet via the `*FromCells` forms —
    * the ANN-family twin of the pair-graph/PQ-code artifacts
    * (PipelineDemo asserts composed == standalone; Bench's composed
    * section measures the collapse).
    */
  def cellAssignments(embeddings: DataFrame, nCentroids: Int = 16,
      lloydIters: Int = 2, trainFraction: Double = 1.0,
      coarse: Int = -1, coarseProbe: Int = 2): DataFrame = {
    val quant = quantized(embeddings)
    val centroids = trainCentroids(quant, nCentroids, lloydIters, trainFraction)
    singleCell(quant, centroids, coarse, coarseProbe, nCentroids)
  }

  /** [[semanticDupPairs]] over a PRECOMPUTED (vec_id, cell) table —
    * no training, no assignment; the embeddings are re-quantized
    * narrowly (pure projection) and only same-cell pairs are scored.
    */
  def semanticDupPairsFromCells(cells: DataFrame, embeddings: DataFrame,
      threshold: Double = 0.35, maxCell: Int = 256): DataFrame = {
    val quant = quantized(embeddings)
    val members = cells.join(quant, Seq("vec_id"))
    val ok = members.groupBy("cell").agg(count(lit(1)).as("csz"))
      .filter($("csz") <= maxCell).select("cell")
    val bounded = members.join(ok, Seq("cell"))
    val a = bounded.select($("cell"), $("vec_id").as("id1"),
      $("qv").as("v1"), $("nrm").as("n1"))
    val b = bounded.select($("cell"), $("vec_id").as("id2"),
      $("qv").as("v2"), $("nrm").as("n2"))
    a.join(b, Seq("cell"))
      .filter($("id1") < $("id2"))
      .select($("id1"), $("id2"), $("cell"),
        (qdot($("v1"), $("v2")).cast("double") / ($("n1") * $("n2"))).as("cos"))
      .filter($("cos") >= threshold)
  }

  /** Hard-negative mining for contrastive training: for every anchor
    * vector, the `k` most-similar SAME-CELL vectors whose cosine is
    * still below `posThreshold` — semantically close enough to be
    * informative, far enough to be true negatives. Random negatives
    * are trivially separable and teach a dual encoder nothing; the
    * hard ones live exactly in the anchor's IVF cell just under the
    * positive threshold, which is where [[semanticDupPairs]] stops —
    * the two operators partition the same-cell pair space at
    * `posThreshold`.
    *
    * Deterministic: same cell assignment, same exact integer dots;
    * ranking (cos desc, neg_id) is a total order. Scale: identical
    * join shape to [[semanticDupPairs]] (maxCell-bounded within-cell
    * pairs), plus one per-anchor rank window over cell-local rows.
    * SIZE `nCentroids` WITH THE CORPUS (cells ≈ N / maxCell): the cap
    * drops oversized cells outright, so a fixed cell count on a
    * grown corpus silently empties the result — ScaleRehearsal
    * measured exactly that at x10 before scaling cells with N.
    * Assignment defaults to the two-level coarse-quantizer path
    * (see [[semanticDupPairs]]); `coarse = 0` forces flat.
    */
  def hardNegatives(embeddings: DataFrame, k: Int = 5,
      posThreshold: Double = 0.35, nCentroids: Int = 16,
      lloydIters: Int = 2, maxCell: Int = 256,
      trainFraction: Double = 1.0,
      coarse: Int = -1, coarseProbe: Int = 2): DataFrame =
    hardNegativesFromCells(
      cellAssignments(embeddings, nCentroids, lloydIters, trainFraction,
        coarse, coarseProbe),
      embeddings, k, posThreshold, maxCell)

  /** [[hardNegatives]] over a PRECOMPUTED (vec_id, cell) table — see
    * [[cellAssignments]].
    */
  def hardNegativesFromCells(cells: DataFrame, embeddings: DataFrame,
      k: Int = 5, posThreshold: Double = 0.35,
      maxCell: Int = 256): DataFrame = {
    val quant = quantized(embeddings)
    val members = cells.join(quant, Seq("vec_id"))
    val ok = members.groupBy("cell").agg(count(lit(1)).as("csz"))
      .filter($("csz") <= maxCell).select("cell")
    val bounded = members.join(ok, Seq("cell"))
    val a = bounded.select($("cell"), $("vec_id").as("anchor_id"),
      $("qv").as("v1"), $("nrm").as("n1"))
    val b = bounded.select($("cell"), $("vec_id").as("neg_id"),
      $("qv").as("v2"), $("nrm").as("n2"))
    val w = Window.partitionBy($("anchor_id"))
      .orderBy($("cos").desc, $("neg_id").asc)
    a.join(b, Seq("cell"))
      .filter($("anchor_id") =!= $("neg_id"))
      .select($("anchor_id"), $("neg_id"), $("cell"),
        (qdot($("v1"), $("v2")).cast("double") / ($("n1") * $("n2")))
          .as("cos"))
      .filter($("cos") < posThreshold)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter($("rn") <= k)
  }

  /** The trained IVF centroid table as a PERSISTABLE artifact —
    * (c_id, cv, cnrm), config-sized (nCentroids rows). With
    * [[cellsFromCentroids]] this is the serve-time IVF index: train
    * once per corpus version (optionally on a `trainFraction`
    * sample), persist both, and every query batch runs
    * [[ivfTopKFrom]] with zero training — the FAISS
    * write-index/read-index shape, relationally.
    */
  def ivfCentroidsDf(embeddings: DataFrame, nCentroids: Int = 16,
      lloydIters: Int = 2, trainFraction: Double = 1.0): DataFrame =
    trainCentroids(quantized(embeddings), nCentroids, lloydIters,
      trainFraction)

  /** Flat (exact) corpus assignment against a persisted centroid
    * table — the corpus-side artifact of the serve-time IVF index
    * (one broadcast-centroid scan, no shuffle).
    */
  def cellsFromCentroids(centroids: DataFrame,
      embeddings: DataFrame): DataFrame =
    assignCells(quantized(embeddings), centroids, 1)
      .select($("vec_id"), $("cell"))

  /** Serve-time IVF top-k off PERSISTED artifacts: `centroids` shaped
    * like [[ivfCentroidsDf]], `cells` like [[cellsFromCentroids]] —
    * no training and no corpus re-assignment; queries probe their
    * `nprobe` cells against the broadcast centroid table and join the
    * cell-pruned corpus. Same output contract as [[ivfTopK]]
    * (spec-pinned equal); Bench composed mode measures the collapse.
    */
  def ivfTopKFrom(centroids: DataFrame, cells: DataFrame,
      embeddings: DataFrame, maxQueryId: Long = 10, k: Int = 5,
      nprobe: Int = 2): DataFrame = {
    val quant = quantized(embeddings)
    val corpus = cells.select($("vec_id"), $("cell"))
      .join(quant, Seq("vec_id"))
      .select($("cell"), $("vec_id").as("cid"), $("qv").as("ce"),
        $("nrm").as("cn"))
    val queries = broadcast(
      assignCells(quant.filter($("vec_id") < maxQueryId), centroids, nprobe)
        .join(quant, Seq("vec_id"))
        .select($("cell"), $("vec_id").as("qid"), $("qv").as("qe"),
          $("nrm").as("qn")))
    val w = Window.partitionBy($("qid")).orderBy($("cos").desc, $("cid").asc)
    corpus.join(queries, Seq("cell"))
      .filter($("qid") =!= $("cid"))
      .select($("qid"), $("cid"),
        (qdot($("qe"), $("ce")).cast("double") / ($("qn") * $("cn"))).as("cos"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter($("rn") <= k)
  }

  /** SEMANTIC INGEST GATE off the persisted IVF index — the vector
    * side's [[graft.operators.Dedup.incrementalNearDups]]: a delivery
    * batch probes its `nprobe` nearest cells against the broadcast
    * centroid table, scores exact quantized cosine against the
    * cell-pruned STORE vectors only, and returns each batch vector's
    * BEST store witness at or above `threshold` — (vec_id, nn_id,
    * cell, cos), one row per flagged batch vector (argmax cosine,
    * ties to the smaller store id). Batch vectors with no same-cell
    * store match above the threshold are absent: they are the
    * admitted set's complement, exactly how the ingest demo consumes
    * this (`inc_ann_gate`). Approximation contract is IVF's own:
    * recall bounded by the probe count (q82/q155 measure it), which
    * is the production trade for never scanning the store.
    *
    * Scale: one broadcast-centroid probe per batch vector (row-local
    * + the per-vec_id argmin window), then a cell-equi-join whose
    * fan-out is cell-bounded — batch-proportional, the store is
    * touched only through its cell-pruned slice; the store's raw
    * vectors stream through the join, never shuffle as a whole.
    */
  def semanticIngestGate(centroids: DataFrame, cells: DataFrame,
      store: DataFrame, batch: DataFrame, threshold: Double = 0.35,
      nprobe: Int = 2): DataFrame = {
    val corpus = cells.select($("vec_id"), $("cell"))
      .join(quantized(store), Seq("vec_id"))
      .select($("cell"), $("vec_id").as("nn_id"), $("qv").as("ce"),
        $("nrm").as("cn"))
    val batchQ = quantized(batch)
    val probes = assignCells(batchQ, centroids, nprobe)
      .join(batchQ, Seq("vec_id"))
      .select($("cell"), $("vec_id"), $("qv").as("qe"), $("nrm").as("qn"))
    val w = Window.partitionBy($("vec_id"))
      .orderBy($("cos").desc, $("nn_id").asc)
    probes.join(corpus, Seq("cell"))
      .select($("vec_id"), $("nn_id"), $("cell"),
        (qdot($("qe"), $("ce")).cast("double") / ($("qn") * $("cn")))
          .as("cos"))
      .filter($("cos") >= threshold)
      .withColumn("rn", row_number().over(w))
      .filter($("rn") === 1)
      .select($("vec_id"), $("nn_id"), $("cell"), $("cos"))
  }

  /** RECALL report for [[semanticIngestGate]] — the q82/q119
    * evaluation discipline applied to the ingest gate: for a bounded
    * query sample of the batch (`vec_id < maxQueryId`), the
    * brute-force best store cosine is the ground truth
    * (`truth_flag` = best ≥ threshold) and `gate_flag` records the
    * cell-probed gate's verdict. The gate computes EXACT cosine on
    * whatever it probes, so it has no false positives — every miss
    * is a probe miss (gate_flag ≤ truth_flag row-wise), and
    * flag-recall = Σ gate_flag / Σ truth_flag is the number an
    * operator reads before trusting the gate's nprobe at a given
    * threshold.
    *
    * Scale: ground truth is a DESIGN diagnostic — the brute-force leg
    * is query-sample × store (the small side broadcasts), run on a
    * bounded sample exactly like [[annRecall]], never per delivery.
    */
  def ingestGateRecall(centroids: DataFrame, cells: DataFrame,
      store: DataFrame, batch: DataFrame, threshold: Double = 0.35,
      nprobe: Int = 2, maxQueryId: Long = 50): DataFrame = {
    val q = batch.filter($("vec_id") < maxQueryId)
    val bq = broadcast(quantized(q)
      .select($("vec_id"), $("qv").as("qe"), $("nrm").as("qn")))
    val best = quantized(store)
      .select($("qv").as("ce"), $("nrm").as("cn"))
      .crossJoin(bq)
      .select($("vec_id"),
        (qdot($("qe"), $("ce")).cast("double") / ($("qn") * $("cn")))
          .as("cos"))
      .groupBy($("vec_id")).agg(max($("cos")).as("best_cos"))
    val flags = semanticIngestGate(centroids, cells, store, q,
        threshold, nprobe)
      .select($("vec_id"), lit(1L).as("gate_flag"))
    best.join(flags, Seq("vec_id"), "left")
      .select($("vec_id"), $("best_cos"),
        when($("best_cos") >= threshold, 1L).otherwise(0L)
          .as("truth_flag"),
        coalesce($("gate_flag"), lit(0L)).as("gate_flag"))
  }

  /** Flat (exhaustive) cell assignment — (vec_id, cell) via argmax
    * cosine over ALL centroids, the exact baseline
    * [[twoLevelAssign]] approximates (and the assignment the IVF
    * family uses internally).
    */
  def flatAssign(embeddings: DataFrame, nCentroids: Int = 16,
      lloydIters: Int = 2, trainFraction: Double = 1.0): DataFrame = {
    val quant = quantized(embeddings)
    val cents = trainCentroids(quant, nCentroids, lloydIters, trainFraction)
    assignCells(quant, cents, 1).select($("vec_id"), $("cell"))
  }

  /** Coarse-probe design curve for the two-level default: per probe
    * count 1..maxProbe, how many vectors the approximate assignment
    * agrees with the exact flat baseline on — the knob evidence for
    * choosing `coarseProbe` (the q99 banding-curve idea applied to
    * the ANN family's own approximation). Returns (probe, n_vectors,
    * n_agree, agree_micro), exact integers.
    *
    * Scale: each leg costs one two-level assignment; the flat
    * baseline is the N·C exact pass — this is a DESIGN diagnostic to
    * run on a sample, not a per-corpus production job.
    */
  def coarseProbeCurve(embeddings: DataFrame, nCentroids: Int = 16,
      lloydIters: Int = 2, coarse: Int = 4, maxProbe: Int = 4): DataFrame = {
    // train ONCE and share across the flat baseline and every probe
    // leg (the SQL twin shares one prefix the same way) — the legs
    // differ only in their probe argmax
    val quant = quantized(embeddings)
    val cents = trainCentroids(quant, nCentroids, lloydIters)
    val flat = assignCells(quant, cents, 1)
      .select($("vec_id"), $("cell").as("flat_cell"))
    (1 to maxProbe).map { p =>
      twoLevelFromCentroids(quant, cents, coarse, p)
        .join(flat, Seq("vec_id"))
        .agg(count(lit(1)).as("n_vectors"),
          sum(when($("cell") === $("flat_cell"), 1L).otherwise(0L))
            .as("n_agree"))
        .select(lit(p.toLong).as("probe"), $("n_vectors"), $("n_agree"),
          expr("n_agree * 1000000 div n_vectors").cast("long")
            .as("agree_micro"))
    }.reduce(_ unionByName _)
  }

  /** Two-level (coarse-quantizer) cell assignment — the answer to the
    * rehearsal-measured N·cells assignment bottleneck (BASELINE.md:
    * with cells sized ≈ N/maxCell, FLAT assignment is N²/cap): probe
    * `coarse` group centroids first (N·G dots), then only the fine
    * centroids of the winning group (N·C/G on average) — N·(G + C/G)
    * total, minimized at G ≈ √C. This is the FAISS coarse-quantizer
    * shape, one level deep.
    *
    * Deterministic, like everything in this family: coarse centroids
    * are the G smallest-c_id fine centroids (the trainer's own seed
    * rule), fine→group and both probe argmaxes are exact-integer
    * cosines with c_id tie-breaks — the oracle replays all three
    * steps. APPROXIMATE by design: a vector whose best fine cell
    * lives outside its winning group lands elsewhere;
    * TrainingOpsSpec pins the agreement rate with flat assignment,
    * and q148's gate pins the exact output.
    */
  def twoLevelAssign(embeddings: DataFrame, nCentroids: Int = 16,
      lloydIters: Int = 2, coarse: Int = 4, coarseProbe: Int = 2,
      trainFraction: Double = 1.0): DataFrame = {
    val quant = quantized(embeddings)
    val cents = trainCentroids(quant, nCentroids, lloydIters, trainFraction)
    twoLevelFromCentroids(quant, cents, coarse, coarseProbe)
  }

  /** [[twoLevelAssign]]'s assignment pass over already-trained
    * centroids — shared with the within-cell family so their
    * assignment is N·(G + probe·C/G) instead of N·C.
    */
  private def twoLevelFromCentroids(quant: DataFrame, cents: DataFrame,
      coarse: Int, coarseProbe: Int): DataFrame = {
    val g = cents.orderBy($("c_id").asc).limit(coarse)
      .select($("c_id").as("g_id"), $("cv").as("gv"), $("cnrm").as("gnrm"))
    val fgW = Window.partitionBy($("c_id"))
      .orderBy($("gcos").desc, $("g_id").asc)
    val f2g = cents.crossJoin(broadcast(g))
      .select($("c_id"), $("g_id"),
        (qdot($("cv"), $("gv")).cast("double") / ($("cnrm") * $("gnrm")))
          .as("gcos"))
      .withColumn("grn", row_number().over(fgW)).filter($("grn") === 1)
      .select($("c_id"), $("g_id"))
    val vgW = Window.partitionBy($("vec_id"))
      .orderBy($("gcos").desc, $("g_id").asc)
    // multi-probe at the coarse level (the FAISS nprobe pattern, one
    // level up): keeping only the top group loses too many vectors
    // whose true cell sits just across a group boundary — probing 2
    // of 4 groups restored flat-agreement from 53% to the spec bar
    // on the uniform fixture while still halving the fine probes
    val vg = quant.crossJoin(broadcast(g))
      .select($("vec_id"), $("qv"), $("nrm"), $("g_id"),
        (qdot($("qv"), $("gv")).cast("double") / ($("nrm") * $("gnrm")))
          .as("gcos"))
      .withColumn("grn", row_number().over(vgW))
      .filter($("grn") <= coarseProbe)
      .select($("vec_id"), $("qv"), $("nrm"), $("g_id"))
    val cg = cents.join(f2g, Seq("c_id"))
    val vfW = Window.partitionBy($("vec_id"))
      .orderBy($("ccos").desc, $("c_id").asc)
    vg.join(broadcast(cg), Seq("g_id"))
      .select($("vec_id"), $("c_id"),
        (qdot($("qv"), $("cv")).cast("double") / ($("nrm") * $("cnrm")))
          .as("ccos"))
      .withColumn("crn", row_number().over(vfW)).filter($("crn") === 1)
      .select($("vec_id"), $("c_id").as("cell"))
  }

  /** Single-cell assignment dispatcher for the within-cell family
    * ([[semanticDupPairs]]/[[hardNegatives]]/[[labelNoise]]):
    * `coarse < 0` (the default) auto-sizes the coarse quantizer at
    * G = ceil(√C) — the cost-minimizing group count for N·(G + C/G) —
    * so the two-level path is ON by default and scales with
    * `nCentroids`; `coarse == 0` forces the exact flat N·C baseline;
    * `coarse > 0` is an explicit group count. With G ≥ C (tiny spec
    * fixtures) every fine centroid is its own group and probing ≥ 2
    * groups of ≤ 2 degenerates to the flat assignment exactly.
    */
  private def singleCell(quant: DataFrame, cents: DataFrame,
      coarse: Int, coarseProbe: Int, nCentroids: Int): DataFrame = {
    val g = if (coarse < 0) math.ceil(math.sqrt(nCentroids.toDouble)).toInt
            else coarse
    if (g == 0) assignCells(quant, cents, 1).select($("vec_id"), $("cell"))
    else twoLevelFromCentroids(quant, cents, g, coarseProbe)
  }

  /** kNN label-noise audit (the Confident-Learning-style read): for
    * every vector, the fraction of its `k` nearest same-cell
    * neighbors carrying a DIFFERENT label — mislabeled examples sit
    * inside another class's neighborhood and score near 1.0, clean
    * ones near 0. The curation signal for dropping or re-labeling
    * noisy supervised data before it poisons a fine-tune.
    *
    * Deterministic: same cell assignment and exact integer dots as
    * [[hardNegatives]]; neighbor selection (cos desc, nb_id) is a
    * total order; the disagreement rate is exact-integer micro.
    * Scale: maxCell-bounded within-cell pairs + a per-anchor rank
    * window — [[semanticDupPairs]]' join budget, nothing more, and
    * the same sizing rule: grow `nCentroids` with the corpus
    * (cells ≈ N / maxCell) or the cap silently empties the audit
    * (see [[hardNegatives]]). Assignment defaults to the two-level
    * coarse-quantizer path (see [[semanticDupPairs]]); `coarse = 0`
    * forces flat.
    */
  def labelNoise(embeddings: DataFrame, k: Int = 5, nCentroids: Int = 16,
      lloydIters: Int = 2, maxCell: Int = 256,
      trainFraction: Double = 1.0,
      coarse: Int = -1, coarseProbe: Int = 2): DataFrame =
    labelNoiseFromCells(
      cellAssignments(embeddings, nCentroids, lloydIters, trainFraction,
        coarse, coarseProbe),
      embeddings, k, maxCell)

  /** [[labelNoise]] over a PRECOMPUTED (vec_id, cell) table — see
    * [[cellAssignments]]. `embeddings` must carry the `label` column.
    */
  def labelNoiseFromCells(cells: DataFrame, embeddings: DataFrame,
      k: Int = 5, maxCell: Int = 256): DataFrame = {
    val quant = quantized(embeddings)
    val members = cells.join(quant, Seq("vec_id"))
      .join(embeddings.select($("vec_id"), $("label")), Seq("vec_id"))
    val ok = members.groupBy("cell").agg(count(lit(1)).as("csz"))
      .filter($("csz") <= maxCell).select("cell")
    val bounded = members.join(ok, Seq("cell"))
    val a = bounded.select($("cell"), $("vec_id"), $("qv").as("v1"),
      $("nrm").as("n1"), $("label"))
    val b = bounded.select($("cell"), $("vec_id").as("nb_id"),
      $("qv").as("v2"), $("nrm").as("n2"), $("label").as("nb_label"))
    val w = Window.partitionBy($("vec_id"))
      .orderBy($("cos").desc, $("nb_id").asc)
    a.join(b, Seq("cell"))
      .filter($("vec_id") =!= $("nb_id"))
      .select($("vec_id"), $("label"), $("nb_id"), $("nb_label"),
        (qdot($("v1"), $("v2")).cast("double") / ($("n1") * $("n2")))
          .as("cos"))
      .withColumn("rn", row_number().over(w))
      .filter($("rn") <= k)
      .groupBy($("vec_id"), $("label"))
      .agg(count(lit(1)).as("n_nb"),
        sum(when($("nb_label") =!= $("label"), 1L).otherwise(0L))
          .as("n_disagree"))
      .select($("vec_id"), $("label").cast("long").as("label"), $("n_nb"),
        $("n_disagree"),
        expr("n_disagree * 1000000 div n_nb").cast("long")
          .as("disagree_micro"))
  }

  /** Per-class prototypicality scores — the dataset-pruning signal
    * (Sorscher et al., "Beyond neural scaling laws", NeurIPS'22;
    * public literature): each vector's cosine to its class (`label`)
    * centroid, plus its rank within the class (1 = most prototypical).
    * Pruning keeps the hard (low-cos) tail or drops the redundant
    * prototypical core; both read exactly this table.
    *
    * Centroids use [[centroidStep]]'s arithmetic — per-dimension
    * floor(sum/count) over the 1e6-quantized elements, exact and
    * engine-portable — so scores hash-match the DuckDB oracle
    * bit-for-bit.
    *
    * Scale: the centroid pass explodes dims NARROWLY and partially
    * aggregates to (label × dim) rows — constant-size shuffle state
    * regardless of corpus rows; the (tiny) centroid table broadcasts
    * back onto a single corpus scan where the score is one codegen'd
    * integer fold per row. Only the final per-label rank windows over
    * (vec_id, label, score) rows — never the vectors.
    */
  /** Semantic decontamination: every (train, eval) vector pair with
    * cosine ≥ `threshold` — the embedding-space complement of the
    * lexical 8-gram decontaminate (Curation.decontaminate): a
    * paraphrased eval item shares no shingles with its train-set
    * leak, but the embeddings sit together. Eval membership is
    * `vec_id < maxEvalId` (the q30 query-set convention). Returns
    * (train_id, eval_id, cos).
    *
    * Scale: the EVAL side is the small one (benchmarks are thousands
    * of items, the corpus is billions) — it broadcasts, and the train
    * side streams through ONE scan with a per-row integer fold per
    * eval vector; no shuffle at all. The crossJoin is
    * broadcast-bounded (never corpus×corpus). Quantized-integer
    * cosine ([[quantize]]/[[qdot]]) — exact cross-engine. At
    * production eval-set sizes, pre-bucket with the q31 hyperplane
    * tables and intersect buckets before scoring; this exact variant
    * is the oracle-checkable baseline of that path.
    */
  def semanticDecontaminate(embeddings: DataFrame, maxEvalId: Long = 10,
      threshold: Double = 0.3): DataFrame = {
    val train = embeddings.spread().filter($("vec_id") >= maxEvalId)
      .select($("vec_id").as("train_id"), quantize($("embedding")).as("tq"))
      .withColumn("tn", qnorm($("tq")))
    val evals = broadcast(embeddings.filter($("vec_id") < maxEvalId)
      .select($("vec_id").as("eval_id"), quantize($("embedding")).as("eq"))
      .withColumn("en", qnorm($("eq"))))
    train.crossJoin(evals)
      .select($("train_id"), $("eval_id"),
        (qdot($("tq"), $("eq")).cast("double") / ($("tn") * $("en")))
          .as("cos"))
      .filter($("cos") >= threshold)
  }

  /** [[semanticDecontaminate]]'s LSH-bucketed scale path: candidates
    * limited to (train, eval) pairs sharing a random-hyperplane
    * bucket in ANY of the `tables` banding tables, then scored with
    * the same exact integer cosine. At production scale the eval set
    * no longer broadcasts against every train vector — the bucket
    * equi-join touches only colliding slivers, with [[capBuckets]]
    * bounding any degenerate bucket (worst case tables·N·maxBucket
    * candidate rows — linear). Recall is the standard banding
    * trade-off: a leaked pair missed by all tables' bits is missed
    * (the q99-style tuning applies); the brute variant is the exact
    * oracle baseline. Multi-table duplicate candidates collapse by
    * pair key before scoring (payloads identical per vec, so the
    * survivor is value-deterministic — the [[cosineDupPairs]]
    * discipline).
    */
  def semanticDecontaminateLsh(embeddings: DataFrame, maxEvalId: Long = 10,
      threshold: Double = 0.3, tables: Int = 4, bits: Int = 8,
      maxBucket: Int = 256): DataFrame = {
    val bucketed =
      capBuckets(hyperplaneBucketed(embeddings, tables, bits), maxBucket)
    val evals = bucketed.filter($("vec_id") < maxEvalId)
      .select($("tbl"), $("bucket"), $("vec_id").as("eval_id"),
        $("qv").as("eq"), $("nrm").as("en"))
    val train = bucketed.filter($("vec_id") >= maxEvalId)
      .select($("tbl"), $("bucket"), $("vec_id").as("train_id"),
        $("qv").as("tq"), $("nrm").as("tn"))
    train.join(evals, Seq("tbl", "bucket"))
      .dropDuplicates("train_id", "eval_id")
      .select($("train_id"), $("eval_id"),
        (qdot($("tq"), $("eq")).cast("double") / ($("tn") * $("en")))
          .as("cos"))
      .filter($("cos") >= threshold)
  }

  /** Vector-health audit — the preflight a pipeline runs BEFORE
    * paying for ANN index builds or similarity sweeps: per embedding
    * dimensionality, the vector count, zero-vector count (cosine is
    * undefined on them; every downstream op here would divide by 0),
    * non-finite count (NaN/Inf elements poison quantization), and the
    * min/max/mean quantized squared norm (a collapsed-norm
    * distribution flags a broken encoder run). More than one output
    * row IS the finding: mixed dimensionalities in one corpus break
    * every zip_with. Returns (dim, n_vecs, n_zero, n_nonfinite,
    * min_nsq, max_nsq, mean_nsq); norms in exact 1e6-quantized
    * integer arithmetic ([[quantize]]), mean as integer div.
    *
    * Scale: one scan, per-row integer folds, dims-bounded aggregate
    * map-side combined — nothing vector- or corpus-proportional
    * shuffles. sum(nsq) holds to ~10^5 vecs/dim-group per 9.2e18
    * headroom at unit-norm 64-dim (~6.4e13 nsq each); beyond that,
    * pre-aggregate per bucket. Empty (len-0) arrays count as
    * zero-vectors with nsq = 0.
    */
  def vectorHealth(embeddings: DataFrame): DataFrame = {
    def nonfinite(x: Column): Column =
      isnan(x.cast("double")) ||
        abs(x.cast("double")) === lit(Double.PositiveInfinity)
    // the auditor must SURVIVE the sickness it reports: under ANSI
    // semantics a NaN/Inf element would throw in quantize's long
    // cast, so non-finite elements fold as 0 into the norm (their
    // presence is what n_nonfinite reports; a NaN-poisoned norm
    // carries no information anyway)
    val qv = quantize(transform($("embedding"),
      x => when(nonfinite(x), lit(0.0f)).otherwise(x)))
    val bad = exists($("embedding"), nonfinite)
    embeddings.spread()
      .select(size($("embedding")).cast("long").as("dim"),
        qdot(qv, qv).as("nsq"), bad.as("bad"))
      .groupBy("dim")
      .agg(count(lit(1)).as("n_vecs"),
        sum(when($("nsq") === 0L, 1L).otherwise(0L)).cast("long")
          .as("n_zero"),
        sum(when($("bad"), 1L).otherwise(0L)).cast("long")
          .as("n_nonfinite"),
        min($("nsq")).as("min_nsq"), max($("nsq")).as("max_nsq"),
        sum($("nsq")).cast("long").as("sum_nsq"))
      .select($("dim"), $("n_vecs"), $("n_zero"), $("n_nonfinite"),
        $("min_nsq"), $("max_nsq"),
        expr("sum_nsq div n_vecs").cast("long").as("mean_nsq"))
  }

  def prototypicality(embeddings: DataFrame): DataFrame = {
    val quant = embeddings.spread()
      .select($("vec_id"), $("label"), quantize($("embedding")).as("qv"))
    val centroids = quant
      .select($("label"), posexplode($("qv")).as(Seq("i", "v")))
      .groupBy($("label"), $("i"))
      .agg(floor(sum($("v")).cast("double") / count(lit(1))).cast("long").as("cv"))
      .groupBy($("label"))
      .agg(transform(array_sort(collect_list(struct($("i"), $("cv")))),
        x => x("cv")).as("cv"))
      .withColumn("cnrm", qnorm($("cv")))
    val w = Window.partitionBy($("label"))
      .orderBy($("proto_cos").desc, $("vec_id").asc)
    quant.join(broadcast(centroids), Seq("label"))
      .select($("vec_id"), $("label"),
        (qdot($("qv"), $("cv")).cast("double") / (qnorm($("qv")) * $("cnrm")))
          .as("proto_cos"))
      .withColumn("rn", row_number().over(w).cast("long"))
  }

  /** LSH-bucketed ANN: same contract as bruteForceTopK but the
    * candidate set is restricted to vectors sharing one of the
    * query's random-hyperplane buckets — an equi-join on (table,
    * bucket) instead of a full scan, with the same hot-bucket cap as
    * cosineDupPairs. Approximate: recall < 1 by design (bucket
    * boundaries). The corpus side never shuffles on vector payloads
    * beyond the bucket join; the (small) query side is broadcast.
    */
  def lshTopK(embeddings: DataFrame, maxQueryId: Long = 10, k: Int = 5,
      tables: Int = 4, bits: Int = 8, maxBucket: Int = 256): DataFrame = {
    val bucketed = capBuckets(hyperplaneBucketed(embeddings, tables, bits), maxBucket)
    val corpus = bucketed.select($("tbl"), $("bucket"), $("vec_id").as("cid"),
      $("qv").as("ce"), $("nrm").as("cn"))
    val queries = broadcast(bucketed.filter($("vec_id") < maxQueryId)
      .select($("tbl"), $("bucket"), $("vec_id").as("qid"),
        $("qv").as("qe"), $("nrm").as("qn")))
    val w = Window.partitionBy($("qid")).orderBy($("cos").desc, $("cid").asc)
    corpus.join(queries, Seq("tbl", "bucket"))
      .filter($("qid") =!= $("cid"))
      .dropDuplicates("qid", "cid")
      .select($("qid"), $("cid"),
        (qdot($("qe"), $("ce")).cast("double") / ($("qn") * $("cn"))).as("cos"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter($("rn") <= k)
  }

  /** Deterministic Rademacher random projection (Achlioptas 2003 /
    * Johnson-Lindenstrauss, public): each output dimension is the
    * signed sum of the quantized input under one ±1 hyperplane from
    * [[hyperplaneParams]] — the same seedless sign family the LSH
    * tables use, so the projection is an EXACT integer per dimension
    * (hash-gated bit-for-bit) and identical across engines, retries,
    * and shard orders. The 100-TB use: project once, run the
    * distance-heavy stages (clustering, dedup candidate generation)
    * in `m` dims instead of the raw width — JL preserves pairwise
    * structure at a fraction of the fold cost.
    *
    * Output: (vec_id, p0..p{m-1}) — wide exact-BIGINT columns.
    * Scale: one scan, zero shuffle; m folds per row inside
    * whole-stage codegen.
    */
  def randomProjection(embeddings: DataFrame, m: Int = 4): DataFrame = {
    require(m <= hyperplaneParams.length, s"at most ${hyperplaneParams.length} dims")
    val quant = embeddings.spread()
      .select($("vec_id"), quantize($("embedding")).as("qe"))
    val projCols = hyperplaneParams.take(m).zipWithIndex.map {
      case ((a, b), h) => hyperplaneDot($("qe"), a, b).as(s"p$h")
    }
    quant.select($("vec_id") +: projCols: _*)
  }

  /** ANN recall report — the evaluation harness a pipeline runs
    * before trusting an approximate index: per query, how many of the
    * exact top-k ([[bruteForceTopK]], the ground truth) the LSH index
    * ([[lshTopK]], same parameters as q31) actually returned.
    * `recall_micro = round(1e6 · n_hit / k)` from exact BIGINTs.
    *
    * Scale: ground truth over sampled queries only (`maxQueryId`
    * bounds the brute-force side — the standard recall-evaluation
    * protocol; the index side is the production path); the final join
    * is k·queries rows on both sides.
    */
  def annRecall(embeddings: DataFrame, maxQueryId: Long = 10, k: Int = 5,
      tables: Int = 4, bits: Int = 8, maxBucket: Int = 256): DataFrame = {
    val truth = bruteForceTopK(embeddings, maxQueryId, k)
      .select($("qid"), $("cid"))
    val approx = lshTopK(embeddings, maxQueryId, k, tables, bits, maxBucket)
      .select($("qid"), $("cid"), lit(1L).as("hit"))
    truth.join(approx, Seq("qid", "cid"), "left")
      .na.fill(0L, Seq("hit"))
      .groupBy("qid")
      .agg(count(lit(1)).as("n_truth"), sum($("hit")).as("n_hit"))
      .select($("qid"), $("n_truth").cast("long").as("n_truth"),
        $("n_hit").cast("long").as("n_hit"),
        round(lit(1e6) * $("n_hit") / $("n_truth")).cast("long")
          .as("recall_micro"))
  }

  /** IVF index-health report — the q82 recall check's structural
    * sibling: per cell, the member count and corpus share. A skewed
    * cell distribution is how an IVF index degrades (one hot cell ≈
    * brute force for every query probing it; empty cells waste
    * centroids), so a pipeline checks this table after (re)training,
    * BEFORE serving queries — and reads it again to pick `maxCell` /
    * `nCentroids` for [[semanticDupPairs]].
    *
    * Scale: training is [[trainCentroids]] (sample-able); the report
    * itself is one assignment scan + a K-row aggregate.
    */
  def cellBalance(embeddings: DataFrame, nCentroids: Int = 16,
      lloydIters: Int = 2, trainFraction: Double = 1.0): DataFrame = {
    val quant = quantized(embeddings)
    val centroids = trainCentroids(quant, nCentroids, lloydIters, trainFraction)
    val counts = assignCells(quant, centroids, 1)
      .groupBy("cell").agg(count(lit(1)).as("n_vecs"))
    val total = counts.agg(sum($("n_vecs")).cast("long").as("total"))
    counts.crossJoin(broadcast(total))
      .select($("cell").cast("long").as("cell"),
        $("n_vecs").cast("long").as("n_vecs"),
        round(lit(1e6) * $("n_vecs") / $("total")).cast("long")
          .as("share_micro"))
  }

  // ----------------------------------------------------------------
  // Product quantization (Jégou et al., "Product Quantization for
  // Nearest Neighbor Search", TPAMI 2011 — public literature)
  // ----------------------------------------------------------------

  /** Exact integer squared-L2 distance between two quantized arrays.
    * Elements are |v| ≤ 1e6, so a 16-dim subvector distance is
    * ≤ 16·(2e6)² = 6.4e13 — exact in BIGINT with 10^5 headroom.
    */
  def qdist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0L), _ + _)

  /** (vec_id, sub, sv): the `m` quantized `dim/m`-dim subvectors of
    * each `dim`-dim vector (vectors of any other width are dropped —
    * [[vectorHealth]] is the preflight that finds them). Narrow
    * derivation; rows = m × corpus.
    */
  private def pqSubvectors(embeddings: DataFrame, m: Int, dim: Int): DataFrame = {
    require(m > 0 && dim % m == 0, s"dim=$dim not divisible by m=$m")
    val dsub = dim / m
    embeddings.spread()
      .filter(size($("embedding")) === dim)
      .select($("vec_id"), quantize($("embedding")).as("qv"))
      .select($("vec_id"), posexplode(
        transform(sequence(lit(0), lit(m - 1)),
          s => slice($("qv"), s * dsub + 1, lit(dsub)))).as(Seq("sub", "sv")))
  }

  /** Nearest-codeword assignment: for every (vec_id, sub), the
    * codebook entry minimizing exact integer squared L2 (ties: lower
    * c_id). The codebook (m × ksub rows) broadcasts; the corpus never
    * shuffles — the window partitions by (vec_id, sub), which the
    * subvector derivation already co-locates.
    */
  private def pqAssignCodes(subs: DataFrame, codebook: DataFrame): DataFrame = {
    val w = Window.partitionBy($("vec_id"), $("sub"))
      .orderBy($("qerr").asc, $("c_id").asc)
    subs.join(broadcast(codebook), Seq("sub"))
      .select($("vec_id"), $("sub"), $("c_id"),
        qdist($("sv"), $("cv")).as("qerr"))
      .withColumn("arn", row_number().over(w))
      .filter($("arn") === 1)
      .select($("vec_id"), $("sub"), $("c_id").as("code"), $("qerr"))
  }

  /** One per-subspace Lloyd step — [[centroidStep]] with `sub` as an
    * extra grouping key and squared-L2 assignment (the PQ metric):
    * per-(sub, code, dim) floor(sum/count) of the member elements,
    * exact and engine-portable. Codewords that lose all members
    * disappear (both engines agree).
    */
  private def pqCentroidStep(subs: DataFrame, codebook: DataFrame): DataFrame =
    pqAssignCodes(subs, codebook)
      .join(subs, Seq("vec_id", "sub"))
      .select($("sub"), $("code").as("c_id"),
        posexplode($("sv")).as(Seq("j", "v")))
      .groupBy($("sub"), $("c_id"), $("j"))
      .agg(floor(sum($("v")).cast("double") / count(lit(1))).cast("long").as("cv"))
      .groupBy($("sub"), $("c_id"))
      .agg(transform(array_sort(collect_list(struct($("j"), $("cv")))),
        x => x("cv")).as("cv"))

  /** Deterministic per-subspace k-means: seeds are the subvectors of
    * the `ksub` vectors whose vec_ids sort first under
    * (md5(vec_id), vec_id) — the [[trainCentroids]] seed draw, free
    * of any dense-id assumption — refined by `iters`
    * Lloyd steps. Like [[trainCentroids]], every refinement localizes
    * the m·ksub·dsub codebook to the driver (tiny by construction —
    * the MLlib pattern) so training executes once per call and the
    * result feeds back as a LocalRelation.
    *
    * `trainFraction` < 1 runs the Lloyd passes over the SAME
    * deterministic md5 hash-sample of vec_ids as [[trainCentroids]] —
    * the 100 TB training path (FAISS trains on ~1% samples): the
    * codebook quality degrades only marginally while each pass scans
    * a fraction of the corpus. Seeds stay the full-corpus md5-first
    * rule, so fraction = 1.0 is bit-identical to the unsampled
    * trainer (the oracle contract).
    */
  private def pqTrainCodebook(subs: DataFrame, ksub: Int, iters: Int,
      trainFraction: Double = 1.0): DataFrame = {
    require(trainFraction > 0.0 && trainFraction <= 1.0,
      s"trainFraction=$trainFraction outside (0, 1]")
    val spark = subs.sparkSession
    import spark.implicits._
    val trainSet =
      if (trainFraction >= 1.0) subs
      else subs.filter(
        conv(substring(md5($("vec_id").cast("string")), 1, 8), 16, 10)
          .cast("long") % 10000 < (trainFraction * 10000).toLong)
    def localize(df: DataFrame): DataFrame =
      df.select($("sub").cast("int"), $("c_id").cast("long"), $("cv"))
        .as[(Int, Long, Seq[Long])].collect().toSeq
        .toDF("sub", "c_id", "cv")
    val seedIds = subs.select($("vec_id")).distinct()
      .orderBy(md5($("vec_id").cast("string")).asc, $("vec_id").asc)
      .limit(ksub)
    var cb = localize(subs.join(seedIds, Seq("vec_id"), "left_semi")
      .select($("sub"), $("vec_id").as("c_id"), $("sv").as("cv")))
    for (_ <- 1 to iters) cb = localize(pqCentroidStep(trainSet, cb))
    cb
  }

  /** PQ encoding: every vector compressed to `m` codewords of `ksub`
    * alternatives — m·log2(ksub) bits (default 4×4 = 2 bytes) instead
    * of dim·4 bytes, the 100-TB embedding-store story (a petabyte of
    * float32 vectors becomes single-digit TB of codes while ADC
    * search stays centroid-accurate). Returns (vec_id, sub, code,
    * qerr) — qerr is the exact integer squared-L2 quantization error
    * of that subvector, the per-vector fidelity diagnostic (Σ qerr
    * over subs = the vector's total reconstruction error).
    *
    * Determinism: quantized-integer arithmetic end to end — seeding,
    * assignment ties (qerr, then code asc), and the floor(sum/count)
    * centroid update are all exact, so the DuckDB oracle (q117)
    * reproduces training bit-for-bit.
    *
    * Scale: training cost is iters·(m·N)·ksub integer folds over
    * dsub-wide arrays — at warehouse scale set `trainFraction` < 1 so
    * the Lloyd passes run on a deterministic hash sample exactly like
    * [[trainCentroids]] (default 1.0 keeps the oracle contract
    * bit-exact; TrainingOpsSpec pins sampled-codebook recall);
    * encoding is ONE scan with a broadcast codebook; nothing
    * vector-proportional ever shuffles except the m·N (id, code)
    * rows.
    */
  def pqEncode(embeddings: DataFrame, m: Int = 4, dim: Int = 64,
      ksub: Int = 16, iters: Int = 2,
      trainFraction: Double = 1.0): DataFrame = {
    val subs = pqSubvectors(embeddings, m, dim)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cb = pqTrainCodebook(subs, ksub, iters, trainFraction)
    pqAssignCodes(subs, cb)
      .select($("vec_id"), $("sub").cast("long").as("sub"),
        $("code"), $("qerr"))
  }

  /** The trained PQ codebook as a LOCAL value: (sub, code, codeword)
    * triples — m·ksub rows of dsub BIGINTs, config-sized by
    * construction. The export a pipeline ships to its serving /
    * streaming tier (the codebook is the model; codes are the data).
    */
  def pqCodebookLocal(embeddings: DataFrame, m: Int = 4, dim: Int = 64,
      ksub: Int = 16, iters: Int = 2,
      trainFraction: Double = 1.0): Seq[(Int, Long, Seq[Long])] = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val subs = pqSubvectors(embeddings, m, dim)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cb = pqTrainCodebook(subs, ksub, iters, trainFraction)
      .as[(Int, Long, Seq[Long])].collect().toSeq
    subs.unpersist(false)
    cb
  }

  /** Expression-only PQ assignment against a local codebook: per
    * subspace, `least` over (qerr, code) structs — the argmin WITH
    * the deterministic tie-break as one codegen'd expression chain,
    * no join, no UDF, no shuffle. This is the encoder a STREAMING
    * plan can run ([[graft.streaming.EmbStreams.pqCodes]]): the
    * batch path's broadcast-join + window needs a batch plan; this
    * form is a pure per-row projection. m·ksub integer folds per row
    * (the same arithmetic the join form pays). Returns the m codes
    * as an array column; spec-pinned equal to [[pqEncode]]'s codes.
    */
  def pqAssignExpr(emb: Column, codebook: Seq[(Int, Long, Seq[Long])],
      m: Int = 4, dim: Int = 64): Column = {
    require(m > 0 && dim % m == 0, s"dim=$dim not divisible by m=$m")
    val dsub = dim / m
    val qv = quantize(emb)
    val codes = (0 until m).map { s =>
      val sv = slice(qv, s * dsub + 1, dsub)
      val entries = codebook.filter(_._1 == s).sortBy(_._2).map {
        case (_, cid, cv) =>
          struct(qdist(sv, typedlit(cv)).as("d"), lit(cid).as("code"))
      }
      require(entries.nonEmpty, s"codebook has no entries for subspace $s")
      least(entries: _*).getField("code")
    }
    array(codes: _*)
  }

  /** Asymmetric-distance (ADC) top-k over PQ codes: queries keep
    * their exact subvectors; each corpus vector is represented by its
    * `m` codewords, so the approximate squared distance is the sum of
    * m lookup-table entries. The LUT (queries × m × ksub exact
    * integer distances) broadcasts; per-query cost is one scan of the
    * code table — never of the raw vectors. Returns (qid, cid, adist,
    * rn) with rn ≤ k under (adist asc, cid asc).
    *
    * This is the compressed-domain complement of [[ivfTopK]]: IVF
    * prunes WHICH vectors are scored, PQ shrinks WHAT is stored and
    * scored; production systems compose them (IVF cells over PQ
    * codes). Both halves are oracle-gated here (q34, q118).
    */
  def pqAdcTopK(embeddings: DataFrame, maxQueryId: Long = 10, k: Int = 5,
      m: Int = 4, dim: Int = 64, ksub: Int = 16, iters: Int = 2,
      trainFraction: Double = 1.0): DataFrame = {
    val subs = pqSubvectors(embeddings, m, dim)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cb = pqTrainCodebook(subs, ksub, iters, trainFraction)
    val codes = pqAssignCodes(subs, cb)
      .select($("vec_id").as("cid"), $("sub"), $("code"))
    val lut = broadcast(subs.filter($("vec_id") < maxQueryId)
      .join(broadcast(cb), Seq("sub"))
      .select($("vec_id").as("qid"), $("sub"), $("c_id").as("code"),
        qdist($("sv"), $("cv")).as("d")))
    val w = Window.partitionBy($("qid")).orderBy($("adist").asc, $("cid").asc)
    codes.join(lut, Seq("sub", "code"))
      .filter($("qid") =!= $("cid"))
      .groupBy($("qid"), $("cid"))
      .agg(sum($("d")).cast("long").as("adist"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter($("rn") <= k)
  }

  /** The trained codebook as a (sub, c_id, cv) DataFrame — the
    * artifact form a pipeline persists next to the code table
    * ([[pqEncode]]'s output) so every downstream searcher loads both
    * instead of retraining ([[pqAdcFromCodes]]; Bench's composed mode
    * measures the collapse).
    */
  def pqCodebookDf(embeddings: DataFrame, m: Int = 4, dim: Int = 64,
      ksub: Int = 16, iters: Int = 2,
      trainFraction: Double = 1.0): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    pqCodebookLocal(embeddings, m, dim, ksub, iters, trainFraction)
      .toDF("sub", "c_id", "cv")
  }

  /** Encode under a PERSISTED codebook ([[pqCodebookDf]] shape) — no
    * training: one scan of the vectors with the broadcast codebook,
    * emitting [[pqEncode]]-shaped (vec_id, sub, code, qerr) rows.
    * Spec-pinned equal to [[pqEncode]] when the codebook came from
    * the same corpus. Because the assignment is ROW-LOCAL (per-vector
    * argmin over m·ksub codewords), it commutes with any row subset:
    * a delivery encodes against the serving codebook and APPENDS
    * (the inc_fold discipline), and a takedown's id-keyed retract of
    * the code table equals re-encoding the survivors bit-for-bit —
    * the property the tdn_ann checks and the q189 oracle gate.
    */
  def pqEncodeFrom(codebook: DataFrame, embeddings: DataFrame,
      m: Int = 4, dim: Int = 64): DataFrame =
    pqAssignCodes(pqSubvectors(embeddings, m, dim), codebook)
      .select($("vec_id"), $("sub").cast("long").as("sub"),
        $("code"), $("qerr"))

  /** ADC top-k off PERSISTED artifacts: `codes` shaped like
    * [[pqEncode]] output, `codebook` like [[pqCodebookDf]] — no
    * training, no corpus encode; the only embedding access is the
    * QUERY vectors' subvectors. This is the serve-time path: the
    * expensive artifacts are built once per corpus version, every
    * query batch pays only lookup-table construction plus one pass
    * over the code table. Same output contract as [[pqAdcTopK]]
    * (spec-pinned equal).
    */
  def pqAdcFromCodes(codes: DataFrame, codebook: DataFrame,
      embeddings: DataFrame, maxQueryId: Long = 10, k: Int = 5,
      m: Int = 4, dim: Int = 64): DataFrame = {
    val qsubs = pqSubvectors(
      embeddings.filter($("vec_id") < maxQueryId), m, dim)
    val lut = broadcast(
      broadcast(qsubs).join(broadcast(codebook), Seq("sub"))
        .select($("vec_id").as("qid"), $("sub"), $("c_id").as("code"),
          qdist($("sv"), $("cv")).as("d")))
    val w = Window.partitionBy($("qid")).orderBy($("adist").asc, $("cid").asc)
    codes.select($("vec_id").as("cid"), $("sub"), $("code"))
      .join(lut, Seq("sub", "code"))
      .filter($("qid") =!= $("cid"))
      .groupBy($("qid"), $("cid"))
      .agg(sum($("d")).cast("long").as("adist"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter($("rn") <= k)
  }

  /** PQ recall report — [[annRecall]]'s sibling for the compressed
    * index: per query, how many of the exact top-k ([[bruteForceTopK]]
    * ground truth) survive in [[pqAdcTopK]]'s top-k. The number a
    * pipeline reads before trading 128× storage for approximate
    * ranking.
    */
  def pqRecall(embeddings: DataFrame, maxQueryId: Long = 10, k: Int = 5,
      m: Int = 4, dim: Int = 64, ksub: Int = 16, iters: Int = 2): DataFrame = {
    val truth = bruteForceTopK(embeddings, maxQueryId, k)
      .select($("qid"), $("cid"))
    val approx = pqAdcTopK(embeddings, maxQueryId, k, m, dim, ksub, iters)
      .select($("qid"), $("cid"), lit(1L).as("hit"))
    truth.join(approx, Seq("qid", "cid"), "left")
      .na.fill(0L, Seq("hit"))
      .groupBy("qid")
      .agg(count(lit(1)).as("n_truth"), sum($("hit")).as("n_hit"))
      .select($("qid"), $("n_truth").cast("long").as("n_truth"),
        $("n_hit").cast("long").as("n_hit"),
        round(lit(1e6) * $("n_hit") / $("n_truth")).cast("long")
          .as("recall_micro"))
  }

  /** IVF-PQ: the production ANN composition — IVF cells prune WHICH
    * vectors are scored (each query probes its `nprobe` nearest
    * cells), PQ codes shrink WHAT is stored and scored (each
    * candidate costs m LUT lookups, never a raw-vector fold). This is
    * the public FAISS `IVFxx,PQyy` index shape as relational algebra:
    * candidates = an equi-join on cell, scoring = an equi-join on
    * (sub, code) against a broadcast LUT, top-k = a per-query window.
    *
    * Scale: the corpus contributes only (cell, id, m codes) rows —
    * at dim=1024/m=16 that is ~1/250th of the raw vector bytes — and
    * the per-query candidate set is ~nprobe/nCentroids of the corpus.
    * Both trainings sample at warehouse scale ([[trainCentroids]]'s
    * trainFraction pattern); kept exact here so the oracle replays
    * bit-for-bit (q122).
    *
    * Returns (qid, cid, adist, rn): candidates restricted to shared
    * probed cells, ranked by exact-integer ADC distance (ties: cid).
    * TrainingOpsSpec pins adist == [[pqAdcTopK]]'s for shared pairs
    * (same arithmetic, pruned candidates).
    */
  def ivfPqTopK(embeddings: DataFrame, maxQueryId: Long = 10, k: Int = 5,
      nCentroids: Int = 16, lloydIters: Int = 2, nprobe: Int = 2,
      m: Int = 4, dim: Int = 64, ksub: Int = 16, iters: Int = 2,
      trainFraction: Double = 1.0): DataFrame = {
    val quant = quantized(embeddings)
    val centroids = trainCentroids(quant, nCentroids, lloydIters, trainFraction)
    val assigned = assignCells(quant, centroids, nprobe)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val subs = pqSubvectors(embeddings, m, dim)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cb = pqTrainCodebook(subs, ksub, iters, trainFraction)
    val corpus = assigned.filter($("arn") === 1)
      .select($("vec_id"), $("cell"))
      .join(pqAssignCodes(subs, cb), Seq("vec_id"))
      .select($("cell"), $("vec_id").as("cid"), $("sub"), $("code"))
    // per query: its nprobe cells × its full LUT — queries·nprobe·m·ksub
    // rows, tiny by construction → broadcast
    val lut = subs.filter($("vec_id") < maxQueryId)
      .join(broadcast(cb), Seq("sub"))
      .select($("vec_id").as("qid"), $("sub"), $("c_id").as("code"),
        qdist($("sv"), $("cv")).as("d"))
    // the inner probed-cells ⋈ LUT join is query-sized on BOTH sides,
    // but neither side carries stats (both derive from the corpus
    // scan) — without the inner broadcast hint Spark sort-merges two
    // tiny tables through two exchanges (caught by PlanAuditSpec)
    val qside = broadcast(
      broadcast(assigned.filter($("vec_id") < maxQueryId)
        .select($("vec_id").as("qid"), $("cell")))
        .join(lut, Seq("qid")))
    val w = Window.partitionBy($("qid")).orderBy($("adist").asc, $("cid").asc)
    corpus.join(qside, Seq("cell", "sub", "code"))
      .filter($("qid") =!= $("cid"))
      .groupBy($("qid"), $("cid"))
      .agg(sum($("d")).cast("long").as("adist"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter($("rn") <= k)
  }

  /** Embedding-drift monitor: per label, how far the class centroid
    * moved between two corpus snapshots — the encoder-regression /
    * distribution-shift check a pipeline runs when a new embedding
    * batch lands (a re-trained or buggy encoder shows up as cos_shift
    * dropping from ~1, or norm_ratio leaving ~1e6, BEFORE any ANN
    * index is rebuilt on poisoned vectors). The vector sibling of
    * [[graft.operators.Curation.sourceKlDrift]] (token space) and
    * `snapshotDiff` (document identity).
    *
    * Returns (label, n_old, n_new, cos_shift, norm_ratio_micro):
    * cosine between the halves' centroids and the new/old centroid
    * norm ratio in integer micro. Labels present in both snapshots
    * only (an appearing/disappearing label is `snapshotDiff`'s
    * finding, not a drift number).
    *
    * Determinism: [[centroidStep]]'s floor(sum/count) arithmetic per
    * (label, dim) — exact BIGINTs until one final sqrt/div/round,
    * IEEE-identical across engines (q123).
    *
    * Scale: each snapshot contributes ONE narrowly-exploded pass
    * partially aggregated to (label × dim) rows — constant-size
    * shuffle state regardless of corpus rows; everything downstream
    * is centroid-sized.
    */
  def embeddingDrift(oldSnap: DataFrame, newSnap: DataFrame): DataFrame = {
    def centFlat(df: DataFrame, out: String): DataFrame =
      df.spread()
        .select($("label"), posexplode(quantize($("embedding"))).as(Seq("d", "v")))
        .groupBy($("label"), $("d"))
        .agg(floor(sum($("v")).cast("double") / count(lit(1))).cast("long").as(out))
    def cnt(df: DataFrame, out: String): DataFrame =
      df.groupBy("label").agg(count(lit(1)).cast("long").as(out))
    val j = centFlat(oldSnap, "co").join(centFlat(newSnap, "cn"), Seq("label", "d"))
      .groupBy("label")
      .agg(sum($("co") * $("cn")).as("dot"),
        sum($("co") * $("co")).as("no2"),
        sum($("cn") * $("cn")).as("nn2"))
    j.join(broadcast(cnt(oldSnap, "n_old")), Seq("label"))
      .join(broadcast(cnt(newSnap, "n_new")), Seq("label"))
      .select($("label").cast("long").as("label"), $("n_old"), $("n_new"),
        ($("dot").cast("double") /
          (sqrt($("no2").cast("double")) * sqrt($("nn2").cast("double"))))
          .as("cos_shift"),
        round(lit(1e6) * sqrt($("nn2").cast("double")) /
          sqrt($("no2").cast("double"))).cast("long").as("norm_ratio_micro"))
  }

  /** Pairwise cosine similarity between per-label embedding
    * centroids — the corpus-geometry report (which sources/classes
    * overlap in embedding space) read when choosing dedup thresholds
    * and mixture weights across sources.
    *
    * Numeric determinism: per-(label, dim) sums of quantized elements
    * are exact BIGINTs; the centroid element is floor(sum/n) — an
    * exact integer-valued double op for |sum| < 2^53 — so dots and
    * norms are again exact integer folds and the one double division
    * is order-free. Dividing before the pairwise step also bounds
    * magnitudes: |c| ≤ 1e6·max|v| regardless of corpus size, so the
    * 64-dim dot can never overflow BIGINT no matter how many rows a
    * label has (summing first would overflow at ~1e9 rows/label).
    *
    * Scale: ONE corpus pass partial-aggregating (label, dim, Σv) —
    * map-side combine makes the shuffle K·dims rows — then everything
    * downstream is centroid-sized (K·dims) with the pairwise join
    * broadcast. Labels multiply the aggregate width, not the scan.
    */
  def labelCentroidSim(embeddings: DataFrame): DataFrame = {
    val flat = embeddings.spread()
      .select($("label"), posexplode(quantize($("embedding"))).as(Seq("d", "v")))
    val n = embeddings.groupBy("label").agg(count(lit(1)).as("n"))
    val c = flat.groupBy($("label"), $("d"))
      .agg(sum($("v")).as("s"))
      .join(broadcast(n), Seq("label"))
      .select($("label"), $("d"),
        floor($("s").cast("double") / $("n")).cast("long").as("c"))
    val nrm = c.groupBy("label")
      .agg(sqrt(sum($("c") * $("c")).cast("double")).as("nrm"))
    val dots = c.select($("label").as("label1"), $("d"), $("c").as("ca"))
      .join(broadcast(c.select($("label").as("label2"), $("d"), $("c").as("cb"))),
        Seq("d"))
      .filter($("label1") < $("label2"))
      .groupBy($("label1"), $("label2"))
      .agg(sum($("ca") * $("cb")).as("dot"))
    dots
      .join(broadcast(nrm.select($("label").as("label1"), $("nrm").as("n1"))),
        Seq("label1"))
      .join(broadcast(nrm.select($("label").as("label2"), $("nrm").as("n2"))),
        Seq("label2"))
      .select($("label1").cast("long").as("label1"),
        $("label2").cast("long").as("label2"),
        ($("dot").cast("double") / ($("n1") * $("n2"))).as("cos"))
  }

  /** Supervised nearest-centroid classifier over embeddings (the
    * Rocchio shape; the embedding-space twin of
    * [[graft.operators.TextAnalysis.nbClassifierScores]]): per-label
    * centroids are trained on the md5-bucket 0-7 split of the labeled
    * vectors — floor(sum/n) per dimension, [[labelCentroidSim]]'s
    * exact-integer discipline — then EVERY vector is assigned the
    * label of its most-cosine-similar centroid. Output per vector:
    * (vec_id, label, pred_label, best_cos); cosine ties break to the
    * lower label in both engines. The cheap embedding-quality
    * classifier a pipeline runs when a labeled reference subset
    * exists (DataComp-style curation: score everything by proximity
    * to the reference classes).
    *
    * Scale: training is ONE map-side-combined (label, dim, Σv)
    * aggregate (K·dims rows shuffle, never vectors); the K-row
    * centroid-array table BROADCASTS into a crossJoin against the
    * quantized corpus, and the per-vector argmax is a max_by
    * aggregate — partial-combined map-side, so the only corpus-sized
    * exchange is N pre-reduced rows. No window sort.
    */
  def centroidClassifier(embeddings: DataFrame): DataFrame =
    centroidScored(embeddings, heldOutOnly = false)

  /** Shared trainer+scorer: centroids always train on buckets 0-7;
    * `heldOutOnly` restricts SCORING to buckets 8-9 (the eval path
    * must not pay a full-corpus materialization for a K²-row
    * confusion matrix).
    */
  /** Per-label centroid arrays (clabel, cv) from the bucket 0-7
    * train split of a (vec_id, label, qv) table — floor(sum/n) per
    * dimension, rebuilt into arrays via the [[centroidStep]] idiom.
    */
  private def labelCentroids(q: DataFrame): DataFrame =
    q.filter(Curation.hashBucket($("vec_id"), 10) <= 7)
      .select($("label"), posexplode($("qv")).as(Seq("i", "v")))
      .groupBy($("label"), $("i"))
      .agg(floor(sum($("v")).cast("double") / count(lit(1))).cast("long").as("cv"))
      .groupBy($("label"))
      .agg(transform(array_sort(collect_list(struct($("i"), $("cv")))),
        x => x("cv")).as("cv"))
      .select($("label").as("clabel"), $("cv"))

  private def centroidScored(embeddings: DataFrame,
      heldOutOnly: Boolean): DataFrame = {
    val bucket = Curation.hashBucket($("vec_id"), 10)
    val q = embeddings.spread()
      .select($("vec_id"), $("label"), quantize($("embedding")).as("qv"))
      .withColumn("nrm", qnorm($("qv")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cents = labelCentroids(q).withColumn("cnrm", qnorm($("cv")))
    val toScore = if (heldOutOnly) q.filter(bucket >= 8) else q
    val result = toScore.crossJoin(broadcast(cents))
      .select($("vec_id"), $("label"), $("clabel"),
        (qdot($("qv"), $("cv")).cast("double") / ($("nrm") * $("cnrm")))
          .as("ccos"))
      .groupBy($("vec_id"), $("label"))
      .agg(max_by(struct($("clabel"), $("ccos")),
        struct($("ccos"), (-$("clabel")).as("nl"))).as("best"))
      .select($("vec_id"), $("label").cast("long").as("label"),
        $("best.clabel").cast("long").as("pred_label"),
        $("best.ccos").as("best_cos"))
      .localCheckpoint(true)
    q.unpersist(false)
    result
  }

  /** Held-out confusion matrix for [[centroidClassifier]]: vectors in
    * md5 buckets 8-9 (never seen by centroid training) grouped by
    * (actual label, pred_label) — the accuracy read before using
    * centroid proximity as a curation signal. K² rows at most; only
    * the held-out sliver is scored.
    */
  def centroidClassifierEval(embeddings: DataFrame): DataFrame =
    centroidScored(embeddings, heldOutOnly = true)
      .groupBy($("label"), $("pred_label"))
      .agg(count(lit(1)).cast("long").as("n_vecs"))

  /** Driver-localized label centroids (label, cv) — K·dims longs,
    * the codebook-style model artifact the streaming classifier
    * ships as literals ([[pqCodebookLocal]]'s pattern; the collect
    * is K-row-bounded by construction).
    */
  def centroidModelLocal(embeddings: DataFrame): Seq[(Long, Seq[Long])] = {
    import embeddings.sparkSession.implicits._
    labelCentroids(embeddings.spread()
        .select($("vec_id"), $("label"), quantize($("embedding")).as("qv")))
      .select($("clabel").cast("long"), $("cv"))
      .as[(Long, Seq[Long])].collect().toSeq
  }

  /** Pure-expression nearest-centroid assignment against LITERAL
    * centroids — [[centroidClassifier]]'s scoring half for the
    * streaming/serving tier ([[pqAssignExpr]]'s least-over-structs
    * idiom: no join, no window, no state). Same quantized-integer
    * cosine arithmetic and the same lower-label tie-break as the
    * batch max_by rule.
    */
  // ----------------------------------------------------------------
  // Scalar quantization (SQ8) — per-dimension 8-bit codes, the public
  // FAISS `SQ8` index family: each element is coded as its cell index
  // in a per-dimension [vmin, vmax] range split into 256 cells, so a
  // vector costs dim bytes instead of 4·dim — the lighter-weight
  // sibling of product quantization (PQ trains k-means codebooks per
  // subspace; SQ needs only per-dim extrema, trains in ONE aggregate,
  // and reconstructs with no codebook join at all).
  // ----------------------------------------------------------------

  /** Per-dimension (j, vmin, vmax) extrema of the 1e6-quantized
    * elements — the whole SQ8 "model": dims rows from ONE map-side
    * combined aggregate over a single corpus scan. Vectors of the
    * wrong width are dropped ([[vectorHealth]] is the preflight that
    * reports them).
    */
  def sqStats(embeddings: DataFrame, dim: Int = 64): DataFrame =
    embeddings.spread()
      .filter(size($("embedding")) === dim)
      .select(posexplode(quantize($("embedding"))).as(Seq("j", "v")))
      .groupBy($("j"))
      .agg(min($("v")).as("vmin"), max($("v")).as("vmax"))
      .select($("j").cast("long").as("j"), $("vmin"), $("vmax"))

  /** The stats table localized to (vmin, vmax) arrays ordered by
    * dimension — 2·dims longs, the model artifact every encoder and
    * searcher ships as literals (the [[pqCodebookLocal]] discipline;
    * the collect is dims-bounded by construction).
    */
  def sqStatsLocal(stats: DataFrame, dim: Int = 64): (Seq[Long], Seq[Long]) = {
    import stats.sparkSession.implicits._
    val rows = stats
      .select($("j").cast("int"), $("vmin").cast("long"), $("vmax").cast("long"))
      .as[(Int, Long, Long)].collect().sortBy(_._1)
    // completeness, not just cardinality: a duplicate j beside a
    // missing dimension would pass a length check and silently
    // misalign every code after the gap
    require(rows.map(_._1).toSeq == (0 until dim),
      s"sq stats dims ${rows.map(_._1).mkString(",")} != 0..${dim - 1}")
    (rows.map(_._2).toSeq, rows.map(_._3).toSeq)
  }

  /** SQ8 code array of an embedding column under LITERAL extrema:
    * code_j = floor((v_j − vmin_j)·255 / (vmax_j − vmin_j)), 0 where
    * the dimension is constant, CLAMPED to [0, 255] — encoding under
    * PERSISTED extrema (a delivery vector outside the trained
    * [vmin, vmax], the FAISS SQ8 situation) must still emit one byte
    * per dimension, so out-of-range values saturate at the edge
    * cells exactly like the reference scalar quantizer. Every
    * product is ≤ 255·4e6 ≈ 1e9 — exact in double — so the floor is
    * bit-stable across engines. Pure per-row expression: zero
    * shuffle, streaming/serving-capable (the [[pqAssignExpr]] role
    * for the scalar quantizer).
    */
  def sqCodesExpr(emb: Column, vmin: Seq[Long], vmax: Seq[Long]): Column = {
    val span = vmin.zip(vmax).map { case (a, b) => b - a }
    zip_with(
      zip_with(quantize(emb), typedlit(vmin), (v, mn) => v - mn),
      typedlit(span), (d, s) =>
        when(s > lit(0L),
          greatest(lit(0L), least(lit(255L),
            floor(d.cast("double") * lit(255d) / s.cast("double"))
              .cast("long"))))
          .otherwise(lit(0L)))
  }

  /** Midpoint reconstruction of an SQ8 code array: recon_j = vmin_j +
    * floor((2·code_j + 1)·span_j / 512) — integer cell centers
    * (products ≤ 511·4e6 ≈ 2e9, exact in double), the value the
    * asymmetric search scores against.
    */
  def sqReconExpr(codes: Column, vmin: Seq[Long], vmax: Seq[Long]): Column = {
    val span = vmin.zip(vmax).map { case (a, b) => b - a }
    zip_with(
      zip_with(codes, typedlit(span), (c, s) =>
        floor((c * lit(2L) + lit(1L)).cast("double") * s.cast("double")
          / lit(512d)).cast("long")),
      typedlit(vmin), (r, mn) => r + mn)
  }

  /** SQ8 encode under PERSISTED stats ([[sqStats]] shape): one corpus
    * scan with the 2·dims extrema riding as literals — not even a
    * broadcast join — emitting (vec_id, codes, rerr) where rerr =
    * Σ_j (v_j − recon_j)² is the exact integer reconstruction error
    * (the per-vector fidelity diagnostic, [[pqEncode]]'s qerr).
    * Row-local ⇒ commutes with any row subset: a delivery encodes
    * against the serving stats and APPENDS, and a takedown's
    * id-keyed retract of the code table equals re-encoding the
    * survivors bit-for-bit (the [[pqEncodeFrom]] property).
    */
  def sqEncodeFrom(stats: DataFrame, embeddings: DataFrame,
      dim: Int = 64): DataFrame = {
    val (vmin, vmax) = sqStatsLocal(stats, dim)
    embeddings.spread()
      .filter(size($("embedding")) === dim)
      .select($("vec_id"), quantize($("embedding")).as("qv"),
        sqCodesExpr($("embedding"), vmin, vmax).as("codes"))
      .select($("vec_id"), $("codes"),
        qdist($("qv"), sqReconExpr($("codes"), vmin, vmax)).as("rerr"))
  }

  /** Train-and-encode in one call ([[pqEncode]]'s shape): extrema
    * from the corpus itself, then the row-local encode.
    */
  def sqEncode(embeddings: DataFrame, dim: Int = 64): DataFrame =
    sqEncodeFrom(sqStats(embeddings, dim), embeddings, dim)

  /** Hash-gate projection of [[sqEncode]]: per-vector (code_sum,
    * code_min, code_max, rerr) — all-integer, engine-portable (the
    * full code arrays are spec-pinned against a driver recompute;
    * the digest is what the DuckDB oracle gates, q204).
    */
  def sqDigest(embeddings: DataFrame, dim: Int = 64): DataFrame =
    sqEncode(embeddings, dim)
      .select($("vec_id"),
        aggregate($("codes"), lit(0L), _ + _).as("code_sum"),
        array_min($("codes")).cast("long").as("code_min"),
        array_max($("codes")).cast("long").as("code_max"),
        $("rerr"))

  /** Asymmetric SQ8 top-k over a PERSISTED code table: queries keep
    * their exact quantized vectors; each corpus vector is its
    * reconstructed code midpoints, so adist = Σ_j (q_j − recon_j)² —
    * exact integers, one codegen'd fold per pair (no explode, no
    * LUT join: SQ reconstruction is element-local, which is exactly
    * what makes it cheaper to serve than PQ). The query set
    * broadcasts; the corpus side scans the code table — dim bytes
    * per vector in a real store — and never the raw vectors.
    */
  def sqTopKFromCodes(codes: DataFrame, stats: DataFrame,
      embeddings: DataFrame, maxQueryId: Long = 10, k: Int = 5,
      dim: Int = 64): DataFrame = {
    val (vmin, vmax) = sqStatsLocal(stats, dim)
    val corpus = codes.select($("vec_id").as("cid"),
      sqReconExpr($("codes"), vmin, vmax).as("re"))
    val queries = broadcast(embeddings
      .filter($("vec_id") < maxQueryId)
      .filter(size($("embedding")) === dim)
      .select($("vec_id").as("qid"), quantize($("embedding")).as("qe")))
    val w = Window.partitionBy($("qid")).orderBy($("adist").asc, $("cid").asc)
    corpus.join(queries, $("qid") =!= $("cid"))
      .select($("qid"), $("cid"), qdist($("qe"), $("re")).as("adist"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter($("rn") <= k)
  }

  /** End-to-end SQ8 search (train → encode → asymmetric top-k) —
    * the oracle-contract form (q205); the serve path is
    * [[sqTopKFromCodes]] over persisted artifacts (spec-pinned
    * equal).
    */
  def sqTopK(embeddings: DataFrame, maxQueryId: Long = 10, k: Int = 5,
      dim: Int = 64): DataFrame = {
    val stats = sqStats(embeddings, dim)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sqTopKFromCodes(sqEncodeFrom(stats, embeddings, dim), stats,
      embeddings, maxQueryId, k, dim)
  }

  /** Exact rerank of an ANN candidate list — the public FAISS
    * `refine` stage and the standard two-stage search shape: the
    * compressed index over-fetches (top-R, R ≫ k), then only those
    * R·|queries| candidates are joined back to the RAW vectors and
    * re-scored with exact quantized cosine. Cost is
    * candidate-proportional — a semi-join shrinks the raw-vector
    * scan to the candidate sliver, then one integer fold per
    * candidate — never a second corpus scan. Output contract matches
    * [[bruteForceTopK]]: (qid, cid, cos, rn ≤ k), ties to lower cid.
    */
  def exactRerank(candidates: DataFrame, embeddings: DataFrame,
      k: Int = 5): DataFrame = {
    val vecs = embeddings.spread()
      .select($("vec_id"), quantize($("embedding")).as("qv"))
      .withColumn("nrm", qnorm($("qv")))
    val q = vecs
      .join(candidates.select($("qid").as("vec_id")).distinct(), Seq("vec_id"))
      .select($("vec_id").as("qid"), $("qv").as("qe"), $("nrm").as("qn"))
    val c = vecs
      .join(candidates.select($("cid").as("vec_id")).distinct(), Seq("vec_id"))
      .select($("vec_id").as("cid"), $("qv").as("ce"), $("nrm").as("cn"))
    val w = Window.partitionBy($("qid")).orderBy($("cos").desc, $("cid").asc)
    candidates.join(broadcast(q), Seq("qid")).join(c, Seq("cid"))
      .select($("qid"), $("cid"),
        (qdot($("qe"), $("ce")).cast("double") / ($("qn") * $("cn"))).as("cos"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter($("rn") <= k)
  }

  /** SQ8 two-stage search: compressed top-`rerank` by asymmetric
    * integer distance, exact-cosine refine to top-k — recall comes
    * from the cheap over-fetch, precision from the exact rerank of
    * the R-sized sliver (q206 gates the composition end to end).
    */
  def sqRefineTopK(embeddings: DataFrame, maxQueryId: Long = 10,
      k: Int = 5, rerank: Int = 20, dim: Int = 64): DataFrame =
    exactRerank(
      sqTopK(embeddings, maxQueryId, rerank, dim).select($("qid"), $("cid")),
      embeddings, k)

  /** IVF-PQ search with the exact-rerank refine stage — the full
    * production composition (`IVFxx,PQyy,Refine` in public FAISS
    * terms): the compressed index over-fetches top-`rerank`
    * candidates by ADC distance, then ONLY that sliver joins back to
    * raw vectors for exact-cosine ranking to top-k. The compressed
    * stage buys the corpus-scan economics (cells prune candidates,
    * codes shrink bytes); the refine buys back the quantization
    * error at candidate-proportional cost — [[sqRefineTopK]]'s
    * two-stage shape on the flagship index (q218 gates it end to
    * end).
    */
  def ivfPqRefineTopK(embeddings: DataFrame, maxQueryId: Long = 10,
      k: Int = 5, rerank: Int = 20, nCentroids: Int = 16,
      lloydIters: Int = 2, nprobe: Int = 2, m: Int = 4, dim: Int = 64,
      ksub: Int = 16, iters: Int = 2,
      trainFraction: Double = 1.0): DataFrame =
    exactRerank(
      ivfPqTopK(embeddings, maxQueryId, rerank, nCentroids, lloydIters,
        nprobe, m, dim, ksub, iters, trainFraction)
        .select($("qid"), $("cid")),
      embeddings, k)

  /** Margin-based parallel-pair mining — the public
    * bitext/translation-pair mining recipe (Artetxe & Schwenk,
    * "Margin-based Parallel Corpus Mining with Multilingual Sentence
    * Embeddings", ACL 2019; the CCMatrix shape): between two sides of
    * an embedding space (here two `label` groups standing in for two
    * languages), a pair qualifies when its cosine is high RELATIVE to
    * what each endpoint scores against its own k nearest neighbors on
    * the other side — the ratio margin
    * `2k·cos(a,b) / (Σ topk cos(a,·) + Σ topk cos(b,·))` — which is
    * what separates true translations from generically-central "hub"
    * sentences that score high against everything. Emitted pairs are
    * MUTUAL margin-best (a's best b AND b's best a) above
    * `thrPermille`.
    *
    * Determinism: per-pair cosine is the exact-integer division; it
    * is then FLOORED to micro units once per pair, so the k-NN sums
    * are integer sums (no order-dependent double accumulation), the
    * threshold is the exact integer inequality
    * `1000·2k·c ≥ thr·(s_a + s_b)`, and the argmax ratio compares
    * identical doubles built from exact integers (ties: lower
    * partner id). Endpoints whose neighborhood sums are not positive
    * have no meaningful margin and drop (documented guard — a
    * degenerate all-negative neighborhood on random vectors).
    *
    * Scale: the exact form scores |A|·|B| pairs in one join — the
    * fixture/oracle contract; at warehouse scale prune candidates
    * with the shared cell assignment exactly like
    * [[semanticDecontaminateLsh]] vs [[semanticDecontaminate]] (the
    * margin arithmetic is unchanged — it only ever reads the
    * candidate sliver plus each endpoint's top-k, which the cell
    * path also bounds). Returns (id_a, id_b, c_micro, margin_micro).
    */
  def marginMinePairs(embeddings: DataFrame, labelA: Int = 0,
      labelB: Int = 1, k: Int = 4, thrPermille: Long = 1000L): DataFrame = {
    require(k > 0, s"k=$k must be positive")
    def side(lbl: Int, out: String) = embeddings.spread()
      .filter($("label") === lbl)
      .select($("vec_id").as(out), quantize($("embedding")).as(s"qv_$out"))
      .withColumn(s"n_$out", qnorm($(s"qv_$out")))
    val a = side(labelA, "id_a")
    val b = side(labelB, "id_b")
    // floor-micro cosine ONCE per pair: everything downstream is
    // integer arithmetic on c
    val pairs = a.crossJoin(broadcast(b))
      .select($("id_a"), $("id_b"),
        floor(lit(1e6) * qdot($("qv_id_a"), $("qv_id_b")).cast("double") /
          ($("n_id_a") * $("n_id_b"))).cast("long").as("c"))
    marginFromScoredPairs(pairs, k, thrPermille)
  }

  /** The margin/mutual-best/threshold tail shared by
    * [[marginMinePairs]] and [[marginMinePairsFromCells]]: input is
    * the candidate pair table (id_a, id_b, c) with c the floor-micro
    * cosine; the k-NN sums are computed over exactly these
    * candidates.
    */
  private def marginFromScoredPairs(pairsIn: DataFrame, k: Int,
      thrPermille: Long): DataFrame = {
    val pairs = pairsIn.localCheckpoint(true)
    def knnSum(key: String): DataFrame = {
      val w = Window.partitionBy($(key))
        .orderBy($("c").desc, $(if (key == "id_a") "id_b" else "id_a").asc)
      pairs.withColumn("rn", row_number().over(w))
        .filter($("rn") <= k)
        .groupBy($(key))
        .agg(sum($("c")).as(s"s_$key"))
    }
    val scored = pairs
      .join(knnSum("id_a"), Seq("id_a"))
      .join(knnSum("id_b"), Seq("id_b"))
      .filter($("s_id_a") + $("s_id_b") > 0)
      .withColumn("margin",
        (lit(2L * k) * $("c")).cast("double") /
          ($("s_id_a") + $("s_id_b")).cast("double"))
    val bestA = Window.partitionBy($("id_a"))
      .orderBy($("margin").desc, $("id_b").asc)
    val bestB = Window.partitionBy($("id_b"))
      .orderBy($("margin").desc, $("id_a").asc)
    scored
      .withColumn("ra", row_number().over(bestA))
      .withColumn("rb", row_number().over(bestB))
      .filter($("ra") === 1 && $("rb") === 1)
      .filter(lit(1000L) * lit(2L * k) * $("c") >=
        lit(thrPermille) * ($("s_id_a") + $("s_id_b")))
      .select($("id_a"), $("id_b"), $("c").as("c_micro"),
        floor(lit(1e6) * (lit(2L * k) * $("c")).cast("double") /
          ($("s_id_a") + $("s_id_b")).cast("double")).cast("long")
          .as("margin_micro"))
  }

  /** [[marginMinePairs]] over a PRECOMPUTED cell assignment
    * ([[cellAssignments]] — the within-cell family's shared
    * artifact): candidates are SAME-CELL cross-side pairs with
    * over-cap cells dropped (q49's cap semantics verbatim), and the
    * k-NN margin sums run over that candidate sliver — so nothing is
    * ever |A|·|B|: pair generation, scoring, and the margin
    * statistics are all cell-local. The recall trade is boundary
    * pairs split across cells (the q49-vs-q106 split applied to
    * mining) — and a true translation pair is exactly the pair most
    * likely to share a cell. Same output contract as the exact form;
    * shared pairs carry the identical floor-micro cosine
    * (TrainingOpsSpec).
    */
  def marginMinePairsFromCells(cells: DataFrame, embeddings: DataFrame,
      labelA: Int = 0, labelB: Int = 1, k: Int = 4,
      thrPermille: Long = 1000L, maxCell: Int = 256): DataFrame = {
    require(k > 0, s"k=$k must be positive")
    val quant = quantized(embeddings)
    val ok = cells.groupBy("cell").agg(count(lit(1)).as("csz"))
      .filter($("csz") <= maxCell).select("cell")
    val members = cells.join(ok, Seq("cell"))
      .join(embeddings.select($("vec_id"), $("label")), Seq("vec_id"))
      .join(quant, Seq("vec_id"))
    def side(lbl: Int, out: String) = members.filter($("label") === lbl)
      .select($("cell"), $("vec_id").as(out),
        $("qv").as(s"qv_$out"), $("nrm").as(s"n_$out"))
    val pairs = side(labelA, "id_a").join(side(labelB, "id_b"), Seq("cell"))
      .select($("id_a"), $("id_b"),
        floor(lit(1e6) * qdot($("qv_id_a"), $("qv_id_b")).cast("double") /
          ($("n_id_a") * $("n_id_b"))).cast("long").as("c"))
    marginFromScoredPairs(pairs, k, thrPermille)
  }

  /** Dimension-truncation recall curve — the OTHER embedding-store
    * compression knob beside SQ/PQ (matryoshka-style truncation:
    * keep only the leading d dims of every vector, the storage drops
    * dim/d-fold): for each candidate width, brute-force top-k under
    * the truncated cosine is scored against the FULL-width exact
    * top-k, per query — (d, qid, n_truth, n_hit, recall_micro), the
    * [[annRecall]] protocol over widths. The table a warehouse reads
    * before deciding to store 16 of 64 dims.
    *
    * A vector whose leading-d prefix quantizes to all zeros has no
    * truncated direction — it drops from that width's candidates
    * (norm > 0 filter, mirrored in the oracle) instead of injecting
    * engine-dependent NaN ordering. The TRUTH top-k runs over the
    * same healthy base (width == dim, full norm > 0) as the
    * truncated legs: on an unhealthy corpus the full-width leg must
    * be able to reach recall 1.0 — a truth set polluted by
    * wrong-width or zero-norm vectors would cap every width below
    * 1.0 and misread codec loss as corpus dirt.
    *
    * Scale: one broadcast-query corpus scan per width (|dims| passes
    * of the [[bruteForceTopK]] shape — widths are a handful by
    * construction); the report is |dims|·|queries| rows.
    */
  def dimTruncationCurve(embeddings: DataFrame,
      dims: Seq[Int] = Seq(8, 16, 32, 64), maxQueryId: Long = 10,
      k: Int = 5, dim: Int = 64): DataFrame = {
    require(dims.nonEmpty && dims.forall(d => d > 0 && d <= dim),
      s"dims $dims outside 1..$dim")
    val healthy = embeddings.spread()
      .filter(size($("embedding")) === dim)
      .filter(qnorm(quantize($("embedding"))) > 0d)
    val truth = bruteForceTopK(healthy, maxQueryId, k)
      .select($("qid"), $("cid")).localCheckpoint(true)
    val legs = dims.map { d =>
      val base = embeddings.spread()
        .filter(size($("embedding")) === dim)
        .select($("vec_id"), slice(quantize($("embedding")), 1, d).as("tv"))
        .withColumn("tn", qnorm($("tv")))
        .filter($("tn") > 0d)
      val queries = broadcast(base.filter($("vec_id") < maxQueryId)
        .select($("vec_id").as("qid"), $("tv").as("qe"), $("tn").as("qn")))
      val w = Window.partitionBy($("qid"))
        .orderBy($("tcos").desc, $("cid").asc)
      base.select($("vec_id").as("cid"), $("tv").as("ce"), $("tn").as("cn"))
        .join(queries, $("qid") =!= $("cid"))
        .select($("qid"), $("cid"),
          (qdot($("qe"), $("ce")).cast("double") / ($("qn") * $("cn")))
            .as("tcos"))
        .withColumn("rn", row_number().over(w))
        .filter($("rn") <= k)
        .select(lit(d.toLong).as("d"), $("qid"), $("cid"))
    }
    val approx = legs.reduce(_ unionByName _).withColumn("hit", lit(1L))
    // the annRecall protocol: the denominator is the TRUTH set (a
    // width that surfaces fewer than k candidates is penalized, not
    // re-normalized)
    truth.select($("qid"), $("cid"),
        explode(typedlit(dims.map(_.toLong))).as("d"))
      .join(approx, Seq("d", "qid", "cid"), "left")
      .na.fill(0L, Seq("hit"))
      .groupBy($("d"), $("qid"))
      .agg(count(lit(1)).cast("long").as("n_truth"),
        sum($("hit")).cast("long").as("n_hit"))
      .select($("d"), $("qid"), $("n_truth"), $("n_hit"),
        expr("n_hit * 1000000 div n_truth").cast("long").as("recall_micro"))
  }

  /** IVF-SQ composed index — the public FAISS `IVFxx,SQ8` shape
    * beside [[ivfPqTopK]]'s `IVFxx,PQyy`: IVF cells prune WHICH
    * vectors are scored (each query probes its `nprobe` nearest
    * cells), SQ8 codes shrink WHAT is stored (dim bytes per corpus
    * vector). Candidates reconstruct ELEMENT-LOCALLY — no LUT join
    * at all, the serve-time advantage SQ has over PQ — and score by
    * exact integer asymmetric squared-L2 against the query's exact
    * quantized elements. Returns (qid, cid, adist, rn ≤ k) under
    * (adist asc, cid asc). TrainingOpsSpec pins adist == [[sqTopK]]'s
    * on shared pairs (same arithmetic, pruned candidates).
    *
    * Scale: the corpus contributes (cell, id, codes) rows only; the
    * per-query candidate set is ~nprobe/nCentroids of the corpus;
    * both models sample at warehouse scale (`trainFraction`). Kept
    * exact here so the oracle replays training bit-for-bit (q212).
    */
  def ivfSqTopK(embeddings: DataFrame, maxQueryId: Long = 10, k: Int = 5,
      nCentroids: Int = 16, lloydIters: Int = 2, nprobe: Int = 2,
      dim: Int = 64, trainFraction: Double = 1.0): DataFrame = {
    val quant = quantized(embeddings)
    val centroids = trainCentroids(quant, nCentroids, lloydIters,
      trainFraction)
    val assigned = assignCells(quant, centroids, nprobe)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val stats = sqStats(embeddings, dim)
    val (vmin, vmax) = sqStatsLocal(stats, dim)
    val corpus = assigned.filter($("arn") === 1)
      .join(sqEncodeFrom(stats, embeddings, dim)
        .select($("vec_id"), $("codes")), Seq("vec_id"))
      .select($("cell"), $("vec_id").as("cid"),
        sqReconExpr($("codes"), vmin, vmax).as("re"))
    val queries = broadcast(assigned.filter($("vec_id") < maxQueryId)
      .join(quant, Seq("vec_id"))
      .select($("cell"), $("vec_id").as("qid"), $("qv").as("qe")))
    val w = Window.partitionBy($("qid")).orderBy($("adist").asc, $("cid").asc)
    corpus.join(queries, Seq("cell"))
      .filter($("qid") =!= $("cid"))
      .select($("qid"), $("cid"), qdist($("qe"), $("re")).as("adist"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter($("rn") <= k)
  }

  def centroidAssignExpr(emb: Column,
      centroids: Seq[(Long, Seq[Long])]): Column = {
    require(centroids.nonEmpty, "need at least one centroid")
    // a zero-norm centroid makes every cosine NaN, and NaN ranks
    // OPPOSITE ways in batch max_by (greatest) vs least here — refuse
    // the degenerate model at ship time instead of silently diverging
    // from the batch twin
    centroids.foreach { case (label, cv) =>
      require(cv.exists(_ != 0L), s"zero-norm centroid for label $label")
    }
    val qv = quantize(emb)
    val nrm = qnorm(qv)
    val entries = centroids.sortBy(_._1).map { case (label, cv) =>
      val cnrm = math.sqrt(cv.map(x => x.toDouble * x).sum)
      struct(
        (-(qdot(qv, typedlit(cv)).cast("double") / (nrm * lit(cnrm))))
          .as("negcos"),
        lit(label).as("label"))
    }
    // least() needs >= 2 args; a single reference class assigns
    // unconditionally (K = 1 is the docstring's one-class proximity
    // use, and the batch path handles it the same way)
    if (entries.size == 1) entries.head.getField("label")
    else least(entries: _*).getField("label")
  }
}
