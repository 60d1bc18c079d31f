package graft

import graft.operators.{Multimodal, Similarity}
import graft.sources.Tables

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media =
    Multimodal.synthesizeFromDocuments(
      Tables(spark, "/root/testdata/sf0.001").documents)

  test("synthesized media table has all modalities and real bytes") {
    val rows = media.collect()
    assert(rows.map(_.modality).toSet === Set("image", "audio", "video"))
    assert(rows.forall(_.bytes.nonEmpty))
    assert(rows.forall(r => r.meta.durationMs === r.bytes.length.toLong * 10L))
  }

  test("exactMediaDuplicates groups identical bytes per modality, keeps min id") {
    // ids 0 and 3 share text AND modality (both % 3 == 0 -> image):
    // one group of 2. id 6 has the same text but... also image — use
    // ids chosen so a same-bytes pair SPLITS across modalities too:
    // 1 (audio) and 2 (video) share text -> two singleton groups.
    val docs = Seq(
      (0L, "same content"), (3L, "same content"),  // image + image
      (1L, "other content"), (2L, "other content"),// audio vs video
      (4L, "unique content")                        // audio singleton
    ).toDF("doc_id", "text")
    val got = Multimodal.exactMediaDuplicates(
      Multimodal.synthesizeFromDocuments(docs))
      .as[(String, String, Long, Long)].collect()
      .map { case (_, m, keep, n) => (m, keep) -> n }.toMap
    assert(got === Map(
      ("image", 0L) -> 2L,   // 0 and 3 collapse, keeper = 0
      ("audio", 1L) -> 1L,   // same bytes as 2 but different modality
      ("video", 2L) -> 1L,
      ("audio", 4L) -> 1L))
  }

  test("frameDuplicates collapses the shared first frame across videos") {
    // ids 2 and 5 are videos (id % 3 == 2); identical first 256 bytes
    // (one shared "intro frame"), divergent tails; id 8 fully unique
    val intro = "x" * 256
    val docs = Seq(
      (2L, intro + "tail-one-" * 10),
      (5L, intro + "tail-two-" * 10),
      (8L, "y" * 300)
    ).toDF("doc_id", "text")
    val got = Multimodal.frameDuplicates(
      Multimodal.synthesizeFromDocuments(docs))
      .as[(String, Long, Long, Long)].collect()
      .map { case (_, m, f, n) => (m, f) -> n }.toMap
    // frame 0 of videos 2 and 5 is byte-identical -> keeper (2, 0), n=2;
    // video 8's frame 0 is a singleton; no other frame survives
    // sampling (chunk 1 exists but 1 % 4 != 0)
    assert(got === Map((2L, 0L) -> 2L, (8L, 0L) -> 1L))
  }

  test("feature extraction: deterministic, fixed dim, normalized, no row loss") {
    val f1 = Multimodal.extractFeatures(media, dim = 32).collect()
    val f2 = Multimodal.extractFeatures(media, dim = 32).collect()
    assert(f1.length === media.count())
    assert(f1.forall(_.features.length === 32))
    val m1 = f1.map(r => r.media_id -> r.features.toSeq).toMap
    val m2 = f2.map(r => r.media_id -> r.features.toSeq).toMap
    assert(m1 === m2) // deterministic stub
    assert(f1.forall { r =>
      val n = math.sqrt(r.features.map(x => x * x).sum)
      math.abs(n - 1.0) < 1e-3 || n == 0.0
    })
  }

  test("feature extraction preserves partitioning (narrow transform)") {
    val parts = media.repartition(7)
    assert(Multimodal.extractFeatures(parts).rdd.getNumPartitions === 7)
  }

  test("frame sampling emits every Nth chunk for video only") {
    val frames = Multimodal.sampleFrames(media, everyNth = 2, frameBytes = 64)
      .collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame_no % 2 === 0))
    val videoIds = media.filter(_.modality == "video").collect().map(_.media_id).toSet
    assert(frames.map(_.media_id).toSet.subsetOf(videoIds))
  }

  test("resize updates image metadata only") {
    val resized = Multimodal.resize(media, 224, 224).collect()
    assert(resized.filter(_.modality == "image")
      .forall(r => r.meta.width === 224 && r.meta.height === 224))
    assert(resized.filter(_.modality == "audio")
      .forall(_.meta.width !== 224))
  }

  test("features flow into Similarity ANN unchanged") {
    val emb = Multimodal.featuresAsEmbeddings(
      Multimodal.extractFeatures(media, dim = 16))
    val knn = Similarity.bruteForceTopK(emb, maxQueryId = 3, k = 2)
    assert(knn.count() > 0)
    assert(knn.columns.toSeq === Seq("qid", "cid", "cos", "rn"))
  }
}
