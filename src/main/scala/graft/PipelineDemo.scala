package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.operators.{Dedup, Similarity, TextAnalysis}
import graft.sources.Tables

/** The PRODUCTION entry point for the dedup/ANN family: build the
  * expensive artifact families ONCE —
  *
  *   1. minhash signature store + scored LSH candidate table
  *      (near-dup pair graph = a threshold filter view of it),
  *   2. distinct 5-gram shingle index (exact-Jaccard / containment),
  *   3. PQ codebook + code table (compressed ANN serving) and the
  *      IVF (vec_id, cell) assignment of the within-cell family,
  *   4. the NB quality-classifier model (LM + constants — scores
  *      every future delivery with zero training-corpus access),
  *
  * — persist them as parquet, and drive every downstream consumer off
  * the artifacts via the `*From` APIs. The per-query benchmark suite
  * deliberately charges each query its full standalone cost (contract
  * isolation); a real pipeline pays the corpus-proportional work once
  * per corpus version and every consumer after that is
  * pair/code-proportional — Bench's composed section measures the
  * same collapse (round 10: q147 0.25 s composed vs 7.3 s standalone,
  * q128 0.84 vs 5.3, q118 0.47 vs 1.87).
  *
  * The demo ASSERTS artifact-vs-standalone equality for the consumers
  * with collectable outputs — composition must be a cost change, never
  * a semantics change.
  *
  * `runMain graft.PipelineDemo [sfDir] [workDir]`.
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val work = args.drop(1).headOption.getOrElse(
      Files.createTempDirectory("graft-pipeline").toString)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-pipeline-demo")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val t = Tables(spark, sfDir)
    val docs = t.documents
    def rd(p: String) = spark.read.parquet(p)
    def timed[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val out = body
      println(f"[demo] $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      out
    }
    // MULTISET equality via two-sided exceptAll — distributed (no
    // driver collect, so the assert itself survives warehouse-scale
    // outputs) and duplicate-sensitive: a fan-out duplicating one row
    // while losing another must NOT pass
    def assertSame(label: String, got: DataFrame, want: DataFrame): Unit = {
      val extra = got.exceptAll(want).count()
      val missing = want.exceptAll(got).count()
      require(extra == 0 && missing == 0,
        s"$label: composed result diverged from standalone " +
          s"($extra extra, $missing missing rows)")
    }
    // ---- artifact build (once per corpus version) ----
    timed("artifacts: sigs+shingles+scored") {
      val sigs = Dedup.minhashSignatures(docs)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        sigs.write.mode("overwrite").parquet(s"$work/sigs")
        Dedup.shingles(docs).write.mode("overwrite").parquet(s"$work/shingles")
        val cands = Dedup.lshCandidates(sigs).localCheckpoint(true)
        Dedup.jaccardDetailFor(cands, rd(s"$work/shingles"))
          .write.mode("overwrite").parquet(s"$work/scored")
      } finally sigs.unpersist(false)
    }
    timed("artifacts: containment pairs") {
      Dedup.ngramContainmentFromShingles(rd(s"$work/shingles"))
        .write.mode("overwrite").parquet(s"$work/cont_pairs")
    }
    timed("artifacts: cell assignments") {
      Similarity.cellAssignments(t.embeddings)
        .write.mode("overwrite").parquet(s"$work/cells")
    }
    timed("artifacts: ivf index (centroids+cells)") {
      Similarity.ivfCentroidsDf(t.embeddings)
        .write.mode("overwrite").parquet(s"$work/ivf_centroids")
      Similarity.cellsFromCentroids(
        rd(s"$work/ivf_centroids"), t.embeddings)
        .write.mode("overwrite").parquet(s"$work/ivf_cells")
    }
    timed("artifacts: pq codebook+codes") {
      val emb = t.embeddings
      Similarity.pqCodebookDf(emb).write.mode("overwrite")
        .parquet(s"$work/pq_codebook")
      Similarity.pqEncode(emb).write.mode("overwrite")
        .parquet(s"$work/pq_codes")
    }
    timed("artifacts: nb model (lm+consts)") {
      val (lm, consts) = TextAnalysis.nbModel(docs,
        posSources = Seq("src0", "src1", "src2"),
        negSources = Seq("src3", "src4", "src5"))
      lm.write.mode("overwrite").parquet(s"$work/nb_lm")
      consts.write.mode("overwrite").parquet(s"$work/nb_consts")
    }

    // ---- consumers off the artifacts ----
    def pairs() = rd(s"$work/scored").filter(col("jaccard") >= 0.7)
      .select("id1", "id2")
    val consumers: Seq[(String, () => DataFrame, () => DataFrame)] = Seq(
      ("q51  components", () => Dedup.componentsOf(pairs()),
        () => Dedup.dupClusters(docs, threshold = 0.7)),
      ("q72  cluster keeps", () => Dedup.clusterKeepsFromPairs(pairs(), docs),
        () => Dedup.clusterKeeps(docs, threshold = 0.7)),
      ("q89  degree histogram", () => Dedup.pairDegreeHistogram(pairs()),
        () => Dedup.pairDegreeHistogram(
          Dedup.minhashDupPairs(docs, threshold = 0.7))),
      ("q128 pagerank", () => Dedup.pairPageRank(pairs()),
        () => Dedup.pairPageRank(
          Dedup.minhashDupPairs(docs, threshold = 0.7))),
      ("q133 canonical rank", () => Dedup.canonicalByRank(pairs()),
        () => Dedup.canonicalByRank(
          Dedup.minhashDupPairs(docs, threshold = 0.7))),
      ("q147 containment matrix",
        () => Dedup.sourceContainmentMatrixFromPairs(
          rd(s"$work/cont_pairs"), docs),
        () => Dedup.sourceContainmentMatrix(docs)),
      ("q118 pq adc", () => Similarity.pqAdcFromCodes(
          rd(s"$work/pq_codes"), rd(s"$work/pq_codebook"), t.embeddings),
        () => Similarity.pqAdcTopK(t.embeddings)),
      ("q49  semantic dups", () => Similarity.semanticDupPairsFromCells(
          rd(s"$work/cells"), t.embeddings),
        () => Similarity.semanticDupPairs(t.embeddings)),
      ("q141 hard negatives", () => Similarity.hardNegativesFromCells(
          rd(s"$work/cells"), t.embeddings),
        () => Similarity.hardNegatives(t.embeddings)),
      ("q146 label noise", () => Similarity.labelNoiseFromCells(
          rd(s"$work/cells"), t.embeddings),
        () => Similarity.labelNoise(t.embeddings)),
      ("q34  ivf topk", () => Similarity.ivfTopKFrom(
          rd(s"$work/ivf_centroids"), rd(s"$work/ivf_cells"), t.embeddings),
        () => Similarity.ivfTopK(t.embeddings)),
      ("q156 nb quality scores", () => TextAnalysis.nbScoreFrom(
          rd(s"$work/nb_lm"), rd(s"$work/nb_consts"), docs),
        () => TextAnalysis.nbClassifierScores(docs,
          posSources = Seq("src0", "src1", "src2"),
          negSources = Seq("src3", "src4", "src5"))))
    var composedTotal = 0.0
    for ((label, composedFn, standaloneFn) <- consumers) {
      // each side executes ONCE: the timed run materializes through an
      // eager localCheckpoint (full execution; the block-store write
      // rides both sides' timings equally, so the printed ratio stays
      // execution-vs-execution) and the equality assert then reads the
      // checkpointed results instead of re-executing both plans — the
      // old noop-then-reassert shape roughly doubled the demo's wall
      // time by running every consumer twice
      val t0 = System.nanoTime()
      val composedDf = composedFn().localCheckpoint(true)
      val sec = (System.nanoTime() - t0) / 1e9
      composedTotal += sec
      val t1 = System.nanoTime()
      val standaloneDf = standaloneFn().localCheckpoint(true)
      val standaloneSec = (System.nanoTime() - t1) / 1e9
      assertSame(label, composedDf, standaloneDf)
      println(f"[demo] $label%-34s ${sec}%7.2f s composed  " +
        f"${standaloneSec}%7.2f s standalone  (${standaloneSec / sec}%4.1fx)")
      spark.sharedState.cacheManager.clearCache()
    }
    println(f"[demo] composed consumer total         $composedTotal%7.2f s " +
      "(artifact-vs-standalone equality asserted on every consumer)")
    spark.stop()
  }
}
