package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.operators.{Dedup, Similarity, TextAnalysis}
import graft.sources.Tables

/** Session-cached pair-graph artifacts backing the COMPOSED-PATH
  * contract entries (q165-q171): the shingle index, the scored LSH
  * candidate table, and the containment pair table are built ONCE per
  * (session, sfDir) and persisted as parquet — exactly the artifacts
  * [[PipelineDemo]] materializes — and every composed query entry
  * consumes them through the `*From` APIs.
  *
  * Why this exists: the standalone contract entries charge each query
  * its full self-contained cost and the oracle gates THAT form;
  * PipelineDemo asserts composed == standalone at runtime. These
  * entries close the remaining gap by putting the production path
  * itself (persisted artifact → consumer) under the DuckDB oracle:
  * each composed twin's oracle SQL is byte-identical to its
  * standalone sibling's, so a hash match proves the artifact
  * round-trip changed nothing.
  *
  * The cache key is (session identity, sfDir); Verify/Bench run
  * queries sequentially in one session, so the build happens once and
  * each consumer pays only its pair-proportional cost — the same
  * shape a warehouse job sees.
  */
object ComposedArtifacts {
  private val dirs = scala.collection.concurrent.TrieMap.empty[String, String]

  // artifacts are session-scratch: delete them at JVM exit so
  // repeated Verify/Bench/test runs don't accumulate parquet under
  // /tmp (the sessions stop before shutdown hooks run, so no reader
  // is live). One hook, registered lazily with the first build.
  private lazy val cleanupHook: Unit = {
    sys.addShutdownHook {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      dirs.values.foreach(d => rm(new java.io.File(d)))
    }
    ()
  }

  /** The q26-family near-dup threshold shared by every pair consumer. */
  private val JaccardThreshold = 0.7

  private def build(spark: SparkSession, sfDir: String): String = {
    cleanupHook
    val work = Files.createTempDirectory("graft-composed-artifacts").toString
    val docs = Tables(spark, sfDir).documents
    def rd(p: String) = spark.read.parquet(s"$work/$p")
    val sigs = Dedup.minhashSignatures(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      sigs.write.mode("overwrite").parquet(s"$work/sigs")
      Dedup.shingles(docs).write.mode("overwrite").parquet(s"$work/shingles")
      val cands = Dedup.lshCandidates(sigs).localCheckpoint(true)
      Dedup.jaccardDetailFor(cands, rd("shingles"))
        .write.mode("overwrite").parquet(s"$work/scored")
      Dedup.ngramContainmentFromShingles(rd("shingles"))
        .write.mode("overwrite").parquet(s"$work/cont_pairs")
    } finally sigs.unpersist(false)
    work
  }

  private def dir(spark: SparkSession, sfDir: String): String =
    dirs.getOrElseUpdate(
      "pair|" + System.identityHashCode(spark) + "|" + sfDir,
      build(spark, sfDir))

  /** The ANN/model artifact family (built separately from the pair
    * graph so each composed query group pays only its own build):
    * the (vec_id, cell) assignment, the IVF serve index (centroids +
    * cells), the PQ codebook + code table, and the NB quality model
    * (LM + constants) — PipelineDemo's other five artifact stores.
    */
  private def buildAnn(spark: SparkSession, sfDir: String): String = {
    cleanupHook
    val work = Files.createTempDirectory("graft-composed-ann").toString
    val t = Tables(spark, sfDir)
    val emb = t.embeddings
    def rd(p: String) = spark.read.parquet(s"$work/$p")
    Similarity.cellAssignments(emb)
      .write.mode("overwrite").parquet(s"$work/cells")
    Similarity.ivfCentroidsDf(emb)
      .write.mode("overwrite").parquet(s"$work/ivf_centroids")
    Similarity.cellsFromCentroids(rd("ivf_centroids"), emb)
      .write.mode("overwrite").parquet(s"$work/ivf_cells")
    Similarity.pqCodebookDf(emb)
      .write.mode("overwrite").parquet(s"$work/pq_codebook")
    Similarity.pqEncode(emb)
      .write.mode("overwrite").parquet(s"$work/pq_codes")
    val (lm, consts) = TextAnalysis.nbModel(t.documents,
      posSources = Seq("src0", "src1", "src2"),
      negSources = Seq("src3", "src4", "src5"))
    lm.write.mode("overwrite").parquet(s"$work/nb_lm")
    consts.write.mode("overwrite").parquet(s"$work/nb_consts")
    work
  }

  private def annDir(spark: SparkSession, sfDir: String): String =
    dirs.getOrElseUpdate(
      "ann|" + System.identityHashCode(spark) + "|" + sfDir,
      buildAnn(spark, sfDir))

  private def annRead(spark: SparkSession, sfDir: String,
      name: String): DataFrame =
    spark.read.parquet(s"${annDir(spark, sfDir)}/$name")

  def cells(spark: SparkSession, sfDir: String): DataFrame =
    annRead(spark, sfDir, "cells")
  def ivfCentroids(spark: SparkSession, sfDir: String): DataFrame =
    annRead(spark, sfDir, "ivf_centroids")
  def ivfCells(spark: SparkSession, sfDir: String): DataFrame =
    annRead(spark, sfDir, "ivf_cells")
  def pqCodebook(spark: SparkSession, sfDir: String): DataFrame =
    annRead(spark, sfDir, "pq_codebook")
  def pqCodes(spark: SparkSession, sfDir: String): DataFrame =
    annRead(spark, sfDir, "pq_codes")
  def nbLm(spark: SparkSession, sfDir: String): DataFrame =
    annRead(spark, sfDir, "nb_lm")
  def nbConsts(spark: SparkSession, sfDir: String): DataFrame =
    annRead(spark, sfDir, "nb_consts")

  /** The near-dup pair graph — a threshold filter view of the scored
    * candidate artifact (minhashDupPairs' semantics, off parquet).
    */
  def pairs(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"${dir(spark, sfDir)}/scored")
      .filter(col("jaccard") >= JaccardThreshold)
      .select("id1", "id2")

  /** The containment pair artifact (id1, id2, common, sz1, sz2,
    * containment) — ngramContainmentPairs' output, off parquet.
    */
  def contPairs(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"${dir(spark, sfDir)}/cont_pairs")

  /** The distinct 5-gram shingle index (doc_id, shingle). */
  def shingles(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"${dir(spark, sfDir)}/shingles")

  /** The MinHash signature store (doc_id, sig00..sig15). */
  def sigs(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"${dir(spark, sfDir)}/sigs")

  /** The full scored LSH candidate table (pre-threshold). */
  def scored(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"${dir(spark, sfDir)}/scored")
}
