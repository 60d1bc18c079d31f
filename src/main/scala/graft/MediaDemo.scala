package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Multimodal, Similarity}
import graft.sources.Tables

/** End-to-end drive of the multimodal ingest pipeline — the composed
  * path from raw media bytes to an ANN-searchable feature store:
  *
  *   synthesize media (stub for a binary-file source) → byte-exact
  *   media dedup → frame-level dedup (video) → batched decode +
  *   feature extraction (stub decoder, real plumbing) → vector
  *   health preflight → brute-force ANN sanity probe.
  *
  * `runMain graft.MediaDemo [sfDir]`. Each stage prints its surviving
  * count — the funnel a media-ingest run reports. Decode internals
  * are the documented STUB (no codec libs in this environment); the
  * Spark-side dataflow around them is the real, oracle-gated path
  * (q37/q38/q108/q109).
  */
object MediaDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-media-demo")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def report(stage: String, n: Long): Unit =
      println(f"[demo] $stage%-28s $n%7d rows")

    val media = Multimodal.synthesizeFromDocuments(
      Tables(spark, sfDir).documents)
    report("media assets", media.count())

    // 1. byte-exact dedup before ANY decode — the cheapest gate
    val mediaDupGroups = Multimodal.exactMediaDuplicates(media)
    report("distinct (bytes, modality)", mediaDupGroups.count())
    report("duplicate assets dropped",
      mediaDupGroups.agg(sum(col("n_copies") - 1)).head().getLong(0))

    // 2. frame-level dedup across the video corpus
    val frameGroups = Multimodal.frameDuplicates(media)
    report("distinct video frames", frameGroups.count())
    report("duplicate frames dropped",
      frameGroups.agg(sum(col("n_copies") - 1)).head().getLong(0))

    // 3. decode + features (stub decoder, batched narrow transform)
    val feats = Multimodal.extractFeatures(media)
    report("feature rows", feats.count())

    // 4. vector-health preflight on the feature store
    val emb = Multimodal.featuresAsEmbeddings(feats)
    Similarity.vectorHealth(emb).show(5, truncate = false)

    // 5. ANN sanity probe: top-5 neighbors for the first queries
    val ann = Similarity.bruteForceTopK(emb)
    report("ann result rows", ann.count())
    println("[demo] media pipeline complete")
    spark.stop()
  }
}
