package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Multimodal, Similarity}
import graft.sources.Tables

/** End-to-end drive of the multimodal ingest pipeline — the composed
  * path from raw media bytes to an ANN-searchable feature store:
  *
  *   synthesize REAL media files (WAV PCM16 / BMP24 / BMP-frame
  *   containers) → byte-exact media dedup → per-format decode audits
  *   (real MediaCodec header parse + sample/pixel extraction) →
  *   batched decode + stripe feature extraction → vector health
  *   preflight → brute-force ANN sanity probe.
  *
  * `runMain graft.MediaDemo [sfDir]`. Each stage prints its surviving
  * count — the funnel a media-ingest run reports. Decode is REAL for
  * the shipped public formats (oracle-gated q37/q38/q221-q223);
  * byte-level dedup stays codec-independent (q108/q109).
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

    val media = Multimodal.synthesizeMediaFiles(
      Tables(spark, sfDir).documents)
    report("media assets", media.count())

    // 1. byte-exact dedup before ANY decode — the cheapest gate
    val mediaDupGroups = Multimodal.exactMediaDuplicates(media)
    report("distinct (bytes, modality)", mediaDupGroups.count())
    report("duplicate assets dropped",
      mediaDupGroups.agg(sum(col("n_copies") - 1)).head().getLong(0))

    // 2. frame-level dedup across the video corpus (real container
    //    walk + decode; pixels never shuffle)
    val frameGroups = Multimodal.videoFrameDuplicates(media)
    report("distinct video frames", frameGroups.count())
    report("duplicate frames dropped",
      frameGroups.agg(sum(col("n_copies") - 1)).head().getLong(0))

    // 3. per-format REAL decode audits (codec-parsed, narrow)
    report("wav decode audits", Multimodal.wavFeatures(media).count())
    report("bmp decode audits", Multimodal.bmpFeatures(media).count())
    report("video frame decodes",
      Multimodal.videoFrameFeatures(media).count())

    // 3b. perceptual near-dup sweep: dHash every decoded image, plant
    //     2x upscaled copies (re-encoded bytes exact dedup misses),
    //     and find them via the banded hash join
    import spark.implicits._
    val upscaled = Multimodal.upscale(
        media.filter(_.modality == "image"), 2)
      .map(r => r.copy(media_id = r.media_id + 10000000L))
    val nearDups = Multimodal.imageNearDuplicates(
      Multimodal.imageDHashes(media.union(upscaled)))
    report("perceptual near-dup pairs", nearDups.count())

    // 4. decode + features (real codecs, batched narrow transform)
    val feats = Multimodal.extractFeatures(media)
    report("feature rows", feats.count())

    // 5. vector-health preflight on the feature store
    val emb = Multimodal.featuresAsEmbeddings(feats)
    Similarity.vectorHealth(emb).show(5, truncate = false)

    // 6. ANN sanity probe: top-5 neighbors for the first queries
    val ann = Similarity.bruteForceTopK(emb)
    report("ann result rows", ann.count())
    println("[demo] media pipeline complete")
    spark.stop()
  }
}
