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

  /** Sign-grid LSH bucket key: the sign pattern of the first `bits`
    * dimensions, as a string key (portable, deterministic). Vectors
    * in the same orthant of the leading dims land together.
    */
  def signBucket(emb: Column, bits: Int = 8): Column =
    concat((1 to bits).map(j =>
      when(element_at(emb, j) >= 0f, lit("1")).otherwise(lit("0"))): _*)

  /** Embedding-cosine near-duplicate pairs: all (id1 < id2) pairs
    * with cosine ≥ threshold, candidate-limited to sign-grid buckets
    * (near-identical vectors share the full sign pattern, so recall
    * at high thresholds is ~1 while the join stays an equi-join on
    * bucket — the same LSH-bounding idea as minhash dedup, applied to
    * vectors).
    */
  def cosineDupPairs(embeddings: DataFrame, threshold: Double = 0.95,
      bits: Int = 16): DataFrame = {
    val bucketed = embeddings.spread().select(
      $("vec_id"), signBucket($("embedding"), bits).as("bucket"),
      quantize($("embedding")).as("qv"))
      .withColumn("nrm", qnorm($("qv")))
    val a = bucketed.select($("bucket"), $("vec_id").as("id1"),
      $("qv").as("v1"), $("nrm").as("n1"))
    val b = bucketed.select($("bucket"), $("vec_id").as("id2"),
      $("qv").as("v2"), $("nrm").as("n2"))
    a.join(b, Seq("bucket"))
      .filter($("id1") < $("id2"))
      .select($("id1"), $("id2"),
        (qdot($("v1"), $("v2")).cast("double") / ($("n1") * $("n2"))).as("cos"))
      .filter($("cos") >= threshold)
  }

  /** IVF (inverted-file) ANN: a deterministic "training" step picks
    * the first `nCentroids` vectors as centroids; every corpus vector
    * is assigned to its nearest centroid (one broadcast pass); a query
    * probes only its own centroid's cell. The classic IVF trade:
    * assignment cost O(N·C) once, then each query scans ~N/C vectors.
    *
    * Deterministic ties: centroid with the higher cosine wins, then
    * the lower centroid id — making the oracle reproducible.
    * Approximate: recall < 1 for vectors near cell boundaries.
    */
  def ivfTopK(embeddings: DataFrame, maxQueryId: Long = 10, k: Int = 5,
      nCentroids: Int = 16): DataFrame = {
    val quant = embeddings.select($("vec_id"), quantize($("embedding")).as("qv"))
      .withColumn("nrm", qnorm($("qv")))
    val centroids = broadcast(
      quant.filter($("vec_id") <= nCentroids)
        .select($("vec_id").as("c_id"), $("qv").as("cv"), $("nrm").as("cnrm")))
    // assignment: argmax cosine over centroids via min_by on
    // (-cos, c_id) — a hash agg, no window sort
    val assigned = quant.spread().crossJoin(centroids)
      .select($("vec_id"), $("qv"), $("nrm"),
        $("c_id"),
        (qdot($("qv"), $("cv")).cast("double") / ($("nrm") * $("cnrm"))).as("ccos"))
      .groupBy($("vec_id"))
      .agg(
        min_by(struct($("qv"), $("nrm"), $("c_id")),
          struct(-$("ccos"), $("c_id"))).as("m"))
      .select($("vec_id"), $("m.qv").as("qv"), $("m.nrm").as("nrm"),
        $("m.c_id").as("cell"))
    val corpus = assigned.select($("cell"), $("vec_id").as("cid"),
      $("qv").as("ce"), $("nrm").as("cn"))
    val queries = broadcast(assigned.filter($("vec_id") < maxQueryId)
      .select($("cell"), $("vec_id").as("qid"), $("qv").as("qe"), $("nrm").as("qn")))
    val w = Window.partitionBy($("qid")).orderBy($("cos").desc, $("cid").asc)
    corpus.join(queries, Seq("cell"))
      .filter($("qid") =!= $("cid"))
      .select($("qid"), $("cid"),
        (qdot($("qe"), $("ce")).cast("double") / ($("qn") * $("cn"))).as("cos"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter($("rn") <= k)
  }

  /** LSH-bucketed ANN: same contract as bruteForceTopK but the
    * candidate set is restricted to the query's sign bucket —
    * an equi-join on the bucket key instead of a full scan.
    * Approximate: recall < 1 by design (bucket boundaries).
    */
  def lshTopK(embeddings: DataFrame, maxQueryId: Long = 10, k: Int = 5,
      bits: Int = 8): DataFrame = {
    val bucketed = embeddings.select(
      $("vec_id"), $("embedding"), signBucket($("embedding"), bits).as("bucket"))
    val corpus = bucketed.spread().select($("bucket"), $("vec_id").as("cid"),
      quantize($("embedding")).as("ce"))
      .withColumn("cn", qnorm($("ce")))
    val queries = broadcast(
      bucketed.filter($("vec_id") < maxQueryId)
        .select($("bucket"), $("vec_id").as("qid"), quantize($("embedding")).as("qe"))
        .withColumn("qn", qnorm($("qe"))))
    val w = Window.partitionBy($("qid")).orderBy($("cos").desc, $("cid").asc)
    corpus.join(queries, Seq("bucket"))
      .filter($("qid") =!= $("cid"))
      .select($("qid"), $("cid"),
        (qdot($("qe"), $("ce")).cast("double") / ($("qn") * $("cn"))).as("cos"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter($("rn") <= k)
  }
}
