package graft

import java.nio.file.Files

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.operators.{Curation, Dedup, Similarity, TextAnalysis}
import graft.sources.Tables

/** VERSIONED-WAREHOUSE pair-graph/ANN/model artifacts backing the
  * COMPOSED-PATH contract entries (q165-q181): the shingle index, the
  * scored LSH candidate table, the containment pair table, and the
  * ANN/model family are built ONCE per CORPUS VERSION and persisted as
  * parquet — exactly the artifacts [[PipelineDemo]] materializes — and
  * every composed query entry consumes them through the `*From` APIs.
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
  * Warehouse layout (the production shape, not session scratch):
  * artifacts live under `$SPARK_GRAFT_WAREHOUSE` (default: the
  * PER-USER `$XDG_CACHE_HOME`-or-`~/.cache` `graft-warehouse` — never
  * a shared world-writable tmpdir, see [[warehouseRoot]]) in a
  * directory keyed by
  * `<family>-v<LayoutVersion>-<corpus fingerprint>`, where the corpus
  * fingerprint is an md5 over the input tables' file listing
  * (name, length, mtime — the Spark file-index identity). So:
  *  - Verify, Bench, the demos and `sbt test` SHARE one build across
  *    JVMs — exactly how a warehouse amortizes artifact cost across
  *    jobs — and rebuild happens ONLY when the corpus content
  *    changes (a regenerated fixture gets fresh mtimes → new key);
  *  - builds are crash-safe and concurrency-safe: a build lands in a
  *    hidden `.build-*` temp dir INSIDE the warehouse root and is
  *    PUBLISHED by an atomic same-filesystem rename; a concurrent
  *    builder that loses the race discards its own build and reads
  *    the winner's (both paid the build — acceptable, rare — but no
  *    reader ever sees a half-written store). A crashed JVM leaves
  *    only an unpublished `.build-*` dir (bounded garbage, never
  *    read);
  *  - every family carries its own INTEGRITY RECEIPT
  *    ([[Curation.artifactManifest]] over the family's tables,
  *    written as `receipt` inside the family dir before publish) —
  *    "which artifact version did this query serve from" is
  *    answerable from the warehouse itself, the IngestDemo receipt
  *    discipline applied to the composed-path stores;
  *  - `LayoutVersion` rides the key: any change to an artifact
  *    derivation must bump it, so a stale build can never serve a
  *    newer consumer (and if one ever did, the byte-identical oracle
  *    SQL of the composed twins fails the hash gate loudly).
  *
  * In-JVM, a per-key lazy holder memoizes the published path and
  * guarantees the build thunk runs at most once even under concurrent
  * first access (TrieMap.getOrElseUpdate may double-evaluate its
  * by-name argument, but constructing the cheap holder twice is
  * harmless — only the single stored holder's lazy body ever runs).
  */
object ComposedArtifacts {
  /** Bump on ANY change to an artifact derivation below — the version
    * is part of the warehouse key, so old builds become unreachable
    * rather than silently served.
    */
  // v2: k-means/PQ seed rule changed from `vec_id <= K` to the
  // md5-first-K draw (round 16) — the ANN/model family derivation
  // changed, so v1 builds must never serve these consumers
  private val LayoutVersion = 2

  /** The q26-family near-dup threshold shared by every pair consumer. */
  private val JaccardThreshold = 0.7

  /** Warehouse root: `$SPARK_GRAFT_WAREHOUSE` when set (the operator
    * owns that choice), else a PER-USER default —
    * `$XDG_CACHE_HOME/graft-warehouse` or `~/.cache/graft-warehouse`.
    * The old default under the world-writable shared tmpdir let any
    * local user pre-plant or clobber a published family dir and
    * silently poison consumers that don't run the hash gate (ADVICE
    * round-13); a per-user root closes that, and [[obtainOnce]]
    * additionally refuses to serve from a root owned by another user
    * when an explicit override points somewhere shared.
    */
  private def warehouseRoot: java.io.File = new java.io.File(
    sys.env.getOrElse("SPARK_GRAFT_WAREHOUSE",
      sys.env.filter(_._1 == "XDG_CACHE_HOME").values.headOption
        .filter(_.nonEmpty)
        .getOrElse(sys.props.getOrElse("user.home", "/tmp") + "/.cache")
        + "/graft-warehouse"))

  /** Fail loudly if `root` exists but is owned by someone else — a
    * foreign-owned warehouse can serve poisoned artifacts (and its
    * permission bits break publish renames in confusing ways later).
    * Owner lookup can be unsupported on exotic filesystems; treat
    * that as "cannot verify" and allow (the per-user default path
    * makes the shared-dir case an explicit operator override).
    */
  private def requireOwned(root: java.io.File): Unit =
    try {
      val owner = Files.getOwner(root.toPath).getName
      val me = sys.props.getOrElse("user.name", owner)
      require(owner == me,
        s"warehouse root $root is owned by '$owner', not '$me' — " +
          "refusing to trust its published artifacts; point " +
          "SPARK_GRAFT_WAREHOUSE at a directory you own")
    } catch {
      case _: UnsupportedOperationException => ()
      case _: java.io.IOException => ()
    }

  // compute-once memo: the holder's lazy val is the single point of
  // evaluation no matter how many threads race the TrieMap insert
  private final class Holder(thunk: () => String) {
    lazy val dir: String = thunk()
  }
  private val dirs = TrieMap.empty[String, Holder]

  /** md5 over the sorted (relative path, length, mtime) listing of the
    * family's input tables — the file-index identity Spark's own scan
    * planning keys on. Content-stable fixtures reuse builds across
    * JVMs and rounds; any rewrite (even byte-identical, since mtime
    * moves) re-keys conservatively.
    */
  private def corpusFp(sfDir: String, tables: Seq[String]): String = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles).toSeq.flatten.flatMap(walk)
      else Seq(f)
    val base = new java.io.File(sfDir)
    val entries = tables.flatMap(t => walk(new java.io.File(base, t)))
      .map(f => s"${base.toPath.relativize(f.toPath)}|${f.length}|${f.lastModified}")
      .sorted
    require(entries.nonEmpty, s"no input files under $sfDir for $tables")
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(entries.mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  private def rm(f: java.io.File): Unit = FsUtil.rmTree(f)

  /** How many published corpus-fingerprint versions to retain per
    * family before the sweep reclaims the oldest; generous because a
    * published dir might still be read by a long-lived concurrent JVM
    * pinned to an older fingerprint.
    */
  private[graft] val KeepPerFamily = 4
  private[graft] val SweepTtlMs = 24L * 3600 * 1000

  /** Opportunistic warehouse hygiene, once per in-JVM build key:
    * reclaim `.build-*` leftovers from crashed JVMs (unpublished, so
    * never read — but a LIVE concurrent build also lives in one, hence
    * the one-day TTL before touching it) and, per family, published
    * fingerprints beyond the [[KeepPerFamily]] most recent — those too
    * only past the TTL, so a reader that resolved an old fingerprint
    * moments ago never has the store deleted under it. Without this a
    * long-lived host accumulates one directory per corpus version
    * forever (ADVICE round-13).
    *
    * Liveness is judged by the NEWEST mtime anywhere inside a
    * `.build-*` dir, not the top dir's own mtime: nested parquet
    * writes do not refresh the parent directory, so a legitimate
    * build running past the TTL would otherwise be reclaimed
    * mid-build by a concurrent JVM (ADVICE round-13). Published dirs
    * keep the top-level-mtime rule (every [[obtain]] touches it) —
    * the corollary, documented on [[obtain]], is that resolved paths
    * are only TTL-protected at resolve time: re-obtain rather than
    * holding a path across a day-long session.
    */
  private def newestMtime(f: java.io.File): Long = {
    val children = Option(f.listFiles).toSeq.flatten
    (f.lastModified +: children.map(newestMtime)).max
  }

  private[graft] def sweep(root: java.io.File, family: String,
      resolving: String): Unit = {
    val now = System.currentTimeMillis()
    val all = Option(root.listFiles).toSeq.flatten.filter(_.isDirectory)
    all.filter(f => f.getName.startsWith(".build-") &&
        now - newestMtime(f) > SweepTtlMs)
      .foreach(rm)
    val published = all
      .filter(f => f.getName.startsWith(s"$family-v") &&
        f.getName != resolving) // never the key being obtained
      .sortBy(-_.lastModified)
    published.drop(KeepPerFamily - 1)
      .filter(now - _.lastModified > SweepTtlMs)
      .foreach(rm)
  }

  /** Resolve (building if absent) the family's published directory.
    * Every resolution TOUCHES the published dir's mtime, so a family
    * in active use never ages past [[SweepTtlMs]] in another JVM's
    * sweep; and the in-JVM memo is re-validated against the
    * filesystem — if a swept (or manually deleted) directory is
    * found behind a memoized path, the key is evicted and the family
    * rebuilt instead of failing every read until restart.
    *
    * CONTRACT: the returned path is TTL-protected from the moment of
    * this call, not indefinitely — a caller that stores the string
    * and reads it again a day later races another JVM's sweep.
    * Re-resolve through the accessors (cheap: memo + one touch)
    * instead of holding a resolved path across long sessions.
    */
  private def obtain(spark: SparkSession, family: String, sfDir: String,
      inputs: Seq[String])(build: String => Seq[(String, String)]): String = {
    val dir = obtainOnce(spark, family, sfDir, inputs)(build)
    val f = new java.io.File(dir)
    if (f.isDirectory) { f.setLastModified(System.currentTimeMillis()); dir }
    else {
      dirs.remove(s"$family-v$LayoutVersion-${corpusFp(sfDir, inputs)}")
      obtainOnce(spark, family, sfDir, inputs)(build)
    }
  }

  private def obtainOnce(spark: SparkSession, family: String, sfDir: String,
      inputs: Seq[String])(build: String => Seq[(String, String)]): String = {
    val key = s"$family-v$LayoutVersion-${corpusFp(sfDir, inputs)}"
    dirs.getOrElseUpdate(key, new Holder(() => {
      val root = warehouseRoot
      root.mkdirs()
      requireOwned(root)
      sweep(root, family, key)
      val published = new java.io.File(root, key)
      if (published.isDirectory) published.toString
      else {
        val tmp = Files.createTempDirectory(root.toPath, s".build-$family-")
        val names = build(tmp.toString)
        // the family's durable integrity receipt, hashed from the
        // just-written stores so it describes exactly what publishes
        Curation.artifactManifest(names.map { case (n, p) =>
          n -> spark.read.parquet(s"$tmp/$p") })
          .write.mode("overwrite").parquet(s"$tmp/receipt")
        if (!tmp.toFile.renameTo(published)) {
          // lost the publish race (or a stale dir appeared): keep the
          // winner's build, discard ours
          rm(tmp.toFile)
          require(published.isDirectory,
            s"warehouse publish failed for $key")
        }
        published.toString
      }
    })).dir
  }

  private def pairDir(spark: SparkSession, sfDir: String): String =
    obtain(spark, "pair", sfDir, Seq("documents.parquet")) { work =>
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
      Seq("sigs" -> "sigs", "shingles" -> "shingles",
        "scored" -> "scored", "cont_pairs" -> "cont_pairs")
    }

  /** The ANN/model artifact family (built separately from the pair
    * graph so each composed query group pays only its own build):
    * the (vec_id, cell) assignment, the IVF serve index (centroids +
    * cells), the PQ codebook + code table, and the NB quality model
    * (LM + constants) — PipelineDemo's other five artifact stores.
    */
  private def annDir(spark: SparkSession, sfDir: String): String =
    obtain(spark, "ann", sfDir,
      Seq("documents.parquet", "embeddings.parquet")) { work =>
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
      Seq("cells" -> "cells", "ivf_centroids" -> "ivf_centroids",
        "ivf_cells" -> "ivf_cells", "pq_codebook" -> "pq_codebook",
        "pq_codes" -> "pq_codes", "nb_lm" -> "nb_lm",
        "nb_consts" -> "nb_consts")
    }

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
    spark.read.parquet(s"${pairDir(spark, sfDir)}/scored")
      .filter(col("jaccard") >= JaccardThreshold)
      .select("id1", "id2")

  /** The containment pair artifact (id1, id2, common, sz1, sz2,
    * containment) — ngramContainmentPairs' output, off parquet.
    */
  def contPairs(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"${pairDir(spark, sfDir)}/cont_pairs")

  /** The distinct 5-gram shingle index (doc_id, shingle). */
  def shingles(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"${pairDir(spark, sfDir)}/shingles")

  /** The MinHash signature store (doc_id, sig00..sig15). */
  def sigs(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"${pairDir(spark, sfDir)}/sigs")

  /** The full scored LSH candidate table (pre-threshold). */
  def scored(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"${pairDir(spark, sfDir)}/scored")

  /** The family's published integrity receipt
    * ([[Curation.artifactManifest]] rows) — `family` is "pair" or
    * "ann".
    */
  def receipt(spark: SparkSession, sfDir: String,
      family: String): DataFrame = {
    val dir = family match {
      case "pair" => pairDir(spark, sfDir)
      case "ann" => annDir(spark, sfDir)
      case other => throw new IllegalArgumentException(
        s"unknown artifact family '$other' (expected pair|ann)")
    }
    spark.read.parquet(s"$dir/receipt")
  }
}
