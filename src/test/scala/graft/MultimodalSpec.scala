package graft

import graft.operators.{MediaCodec, Multimodal, Similarity}
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

  test("chunkFrameDuplicates collapses the shared first chunk across videos") {
    // ids 2 and 5 are videos (id % 3 == 2); identical first 256 bytes
    // (one shared "intro frame"), divergent tails; id 8 fully unique
    val intro = "x" * 256
    val docs = Seq(
      (2L, intro + "tail-one-" * 10),
      (5L, intro + "tail-two-" * 10),
      (8L, "y" * 300)
    ).toDF("doc_id", "text")
    val got = Multimodal.chunkFrameDuplicates(
      Multimodal.synthesizeFromDocuments(docs))
      .as[(String, Long, Long, Long)].collect()
      .map { case (_, m, f, n) => (m, f) -> n }.toMap
    // frame 0 of videos 2 and 5 is byte-identical -> keeper (2, 0), n=2;
    // video 8's frame 0 is a singleton; no other frame survives
    // sampling (chunk 1 exists but 1 % 4 != 0)
    assert(got === Map((2L, 0L) -> 2L, (8L, 0L) -> 1L))
  }

  test("videoFrameDuplicates finds a planted duplicate frame across containers") {
    // the synthesis pixel formulas depend on (id mod 256, frame, p):
    // video ids 2 and 770 (770 − 2 = 3·256, both % 3 == 2) render
    // IDENTICAL frames f = 0, 1 (and 770 has a third frame: nf = 2 +
    // id % 3) — a real duplicate planted across two containers, found
    // only by walking + decoding real frame boundaries
    val docs = Seq((2L, "a"), (770L, "b"), (8L, "c"))
      .toDF("doc_id", "text")
    val got = Multimodal.videoFrameDuplicates(
      Multimodal.synthesizeMediaFiles(docs))
      .as[(String, Long, Long, Long)].collect()
      .map { case (_, m, f, n) => (m, f) -> n }.toMap
    // id 2: nf = 4? no — nf = 2 + 2 % 3 = 4; id 770: nf = 2 + 770 % 3
    // = 2 + 2 = 4. Frames 0..3 of both coincide pairwise; id 8:
    // nf = 2 + 8 % 3 = 4 frames, all unique (8 % 256 ≠ 2 mod 256)
    assert(got((2L, 0L)) === 2L, s"frame 0 must collapse: $got")
    assert(got((2L, 1L)) === 2L)
    assert(!got.keys.exists(_._1 == 770L),
      "770's frames must all dedup onto id 2's")
    assert(got((8L, 0L)) === 1L)
  }

  test("dHash is invariant under integer upscale; near-dups found via bands") {
    val docs = Seq((3L, "a"), (6L, "b"), (9L, "c"), (12L, "d"))
      .toDF("doc_id", "text") // all % 3 == 0 -> images
    val media = Multimodal.synthesizeMediaFiles(docs)
    val base = Multimodal.imageDHashes(media)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // halves stay within 32 bits (no sign surprises in either engine)
    base.values.foreach { case (lo, hi) =>
      assert(lo >= 0L && lo < (1L << 32) && hi >= 0L && hi < (1L << 32)) }
    for (factor <- Seq(2, 3)) {
      val up = Multimodal.imageDHashes(Multimodal.upscale(media, factor))
        .as[(Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(up === base, s"dHash must be invariant under ${factor}x upscale")
    }
    // banded near-dup: original + shifted-id upscaled copy -> a
    // hamming-0 pair per image
    val up2 = Multimodal.upscale(media, 2).map(r =>
      r.copy(media_id = r.media_id + 1000L))
    val pairs = Multimodal.imageNearDuplicates(
        Multimodal.imageDHashes(media.union(up2)))
      .as[(Long, Long, Long)].collect()
    Seq(3L, 6L, 9L, 12L).foreach { id =>
      assert(pairs.exists(p => p._1 === id && p._2 === id + 1000L &&
        p._3 === 0L), s"missing planted near-dup for $id: ${pairs.toSeq}")
    }
  }

  test("frame-granularity dHash: planted cross-container dup frames collide") {
    // ids 2 and 770 render identical frames (mod-256 congruence, see
    // the videoFrameDuplicates test): their per-frame dHashes must be
    // equal, and the near-dup sweep over frames + 2x upscales must
    // pair every frame with its own upscaled copy at hamming 0
    val docs = Seq((2L, "a"), (770L, "b")).toDF("doc_id", "text")
    val frames = Multimodal.videoFramesAsImages(
      Multimodal.synthesizeMediaFiles(docs))
    val hashes = Multimodal.imageDHashes(frames)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    (0L to 3L).foreach { f =>
      assert(hashes(2000L + f) === hashes(770000L + f),
        s"congruent frame $f must hash identically")
    }
    val up = Multimodal.upscale(frames, 2)
      .map(r => r.copy(media_id = r.media_id + 10000000L))
    val pairs = Multimodal.imageNearDuplicates(
        Multimodal.imageDHashes(frames.union(up)))
      .as[(Long, Long, Long)].collect()
    hashes.keys.foreach { fid =>
      assert(pairs.exists(p => Set(p._1, p._2).contains(fid) &&
        Set(p._1, p._2).contains(fid + 10000000L) && p._3 === 0L),
        s"frame $fid must pair with its upscaled copy")
    }
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

  test("resize really resamples: known 4x2 image to 2x1, bytes re-encoded") {
    // source pixels laid out so every nearest-neighbor read is
    // distinguishable; target (2, 1): out x reads source (x*4) div 2,
    // row 0 reads source row (0*2) div 1 = 0
    val src = Array(0x010203, 0x040506, 0x070809, 0x0a0b0c,
      0x111213, 0x141516, 0x171819, 0x1a1b1c)
    val row = Multimodal.MediaRow(1L, "image",
      MediaCodec.encodeBmp24(src, 4, 2), Multimodal.MediaMeta(4, 2, 0, 0))
    val audio = Multimodal.MediaRow(2L, "audio",
      MediaCodec.encodeWavPcm16(Array[Short](5, 6, 7), 16000),
      Multimodal.MediaMeta(0, 0, 0, 16000))
    val out = Multimodal.resize(Seq(row, audio).toDS(), 2, 1)
      .collect().map(r => r.media_id -> r).toMap
    val img = MediaCodec.decodeBmp24(out(1L).bytes)
    assert(img.width === 2 && img.height === 1)
    assert(img.pixels.toSeq === Seq(src(0), src(2)),
      "nearest-neighbor must read source pixels (0,0) and (2,0)")
    assert(out(1L).meta.width === 2 && out(1L).meta.height === 1)
    // non-image rows pass through byte-identical
    assert(out(2L).bytes.toSeq === audio.bytes.toSeq)
  }

  test("resampleWav halves 16 kHz to 8 kHz reading every other sample") {
    val samples = Array[Short](10, -20, 30, -40, 50)
    val row = Multimodal.MediaRow(1L, "audio",
      MediaCodec.encodeWavPcm16(samples, 16000),
      Multimodal.MediaMeta(0, 0, 0, 16000))
    val out = Multimodal.resampleWav(Seq(row).toDS(), 8000)
      .collect().head
    val wv = MediaCodec.decodeWavPcm16(out.bytes)
    assert(wv.sampleRate === 8000)
    assert(wv.samples.toSeq === Seq[Short](10, 30),
      "n div 2 samples, output i reads source 2i")
    assert(out.meta.sampleRate === 8000)
  }

  // --- real codec tests: files assembled BY HAND, byte for byte,
  // independent of the encoder, so decode is gated against the public
  // format layout itself, not against this repo's writer ---

  private def le16(v: Int): Seq[Byte] =
    Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Seq[Byte] =
    Seq(v & 0xff, (v >> 8) & 0xff, (v >> 16) & 0xff, (v >> 24) & 0xff)
      .map(_.toByte)

  test("decodeWavPcm16 parses a hand-built canonical file byte for byte") {
    val bytes = ("RIFF".getBytes("US-ASCII").toSeq ++ le32(36 + 6) ++
      "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(16) ++
      le16(1) ++ le16(1) ++ le32(8000) ++ le32(16000) ++ le16(2) ++ le16(16) ++
      "data".getBytes("US-ASCII") ++ le32(6) ++
      le16(1000) ++ le16(-2 & 0xffff) ++ le16(32767)).toArray
    val w = MediaCodec.decodeWavPcm16(bytes)
    assert(w.sampleRate === 8000)
    assert(w.numChannels === 1)
    assert(w.samples.toSeq === Seq[Short](1000, -2, 32767))
  }

  test("decodeWavPcm16 skips unknown odd-size chunks, rejects non-PCM") {
    // a 3-byte LIST chunk before fmt: the RIFF grammar pads odd chunk
    // sizes to even — a walker that forgets the pad byte derails here
    val good = ("RIFF".getBytes("US-ASCII").toSeq ++ le32(0) ++
      "WAVE".getBytes("US-ASCII") ++
      "LIST".getBytes("US-ASCII") ++ le32(3) ++ Seq[Byte](7, 8, 9, 0) ++
      "fmt ".getBytes("US-ASCII") ++ le32(16) ++
      le16(1) ++ le16(1) ++ le32(16000) ++ le32(32000) ++ le16(2) ++ le16(16) ++
      "data".getBytes("US-ASCII") ++ le32(2) ++ le16(-1 & 0xffff)).toArray
    assert(MediaCodec.decodeWavPcm16(good).samples.toSeq === Seq[Short](-1))
    // IEEE-float format (3) must be refused, not misread as PCM
    val nonPcm = ("RIFF".getBytes("US-ASCII").toSeq ++ le32(0) ++
      "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(16) ++
      le16(3) ++ le16(1) ++ le32(8000) ++ le32(32000) ++ le16(4) ++ le16(32) ++
      "data".getBytes("US-ASCII") ++ le32(0)).toArray
    val e = intercept[IllegalArgumentException](
      MediaCodec.decodeWavPcm16(nonPcm))
    assert(e.getMessage.contains("format 3"))
  }

  test("decodeBmp24 parses a hand-built padded bottom-up file") {
    // 3x2, rowBytes = 12 (9 data + 3 pad); file stores the BOTTOM row
    // first in BGR; expected pixels are top-down 0xRRGGBB
    val top = Seq((255, 0, 0), (0, 255, 0), (0, 0, 255))
    val bot = Seq((1, 2, 3), (4, 5, 6), (7, 8, 9))
    def row(ps: Seq[(Int, Int, Int)]): Seq[Byte] =
      ps.flatMap { case (r, g, b) =>
        Seq(b.toByte, g.toByte, r.toByte) } ++ Seq[Byte](0, 0, 0)
    val bytes = (Seq('B'.toByte, 'M'.toByte) ++ le32(54 + 24) ++ le32(0) ++
      le32(54) ++ le32(40) ++ le32(3) ++ le32(2) ++ le16(1) ++ le16(24) ++
      le32(0) ++ le32(24) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0) ++
      row(bot) ++ row(top)).toArray
    val got = MediaCodec.decodeBmp24(bytes)
    assert(got.width === 3 && got.height === 2)
    val want = (top ++ bot).map { case (r, g, b) => (r << 16) | (g << 8) | b }
    assert(got.pixels.toSeq === want)
  }

  test("wav and bmp round-trip: encode then decode is the identity") {
    val samples = Array.tabulate(257)(i =>
      (((i * 52457) % 65536) - 32768).toShort)
    val w = MediaCodec.decodeWavPcm16(
      MediaCodec.encodeWavPcm16(samples, 22050))
    assert(w.sampleRate === 22050 && w.samples.toSeq === samples.toSeq)
    // widths 3 and 5 force nonzero row padding; 4 has none
    for (wd <- Seq(3, 4, 5); ht <- Seq(1, 2, 3)) {
      val px = Array.tabulate(wd * ht)(p =>
        (((p * 7) % 256) << 16) | (((p * 11) % 256) << 8) | ((p * 13) % 256))
      val b = MediaCodec.decodeBmp24(MediaCodec.encodeBmp24(px, wd, ht))
      assert(b.width === wd && b.height === ht)
      assert(b.pixels.toSeq === px.toSeq, s"round-trip broke at ${wd}x$ht")
    }
  }

  test("splitBmpContainer walks frames by their declared header sizes") {
    val f1 = MediaCodec.encodeBmp24(Array.fill(12)(0xff0000), 4, 3)
    val f2 = MediaCodec.encodeBmp24(Array.fill(25)(0x00ff00), 5, 5)
    val frames = Multimodal.splitBmpContainer(f1 ++ f2)
    assert(frames.length === 2)
    assert(frames(0).toSeq === f1.toSeq && frames(1).toSeq === f2.toSeq)
    assert(MediaCodec.decodeBmp24(frames(1)).pixels.forall(_ === 0x00ff00))
    val e = intercept[IllegalArgumentException](
      Multimodal.splitBmpContainer(f1 ++ Array[Byte](1, 2, 3)))
    assert(e.getMessage.contains("magic"))
  }

  test("real media store decodes back to the synthesis formulas") {
    val docs = Seq.tabulate(9)(i => (i.toLong, s"doc $i"))
      .toDF("doc_id", "text")
    val rows = Multimodal.synthesizeMediaFiles(docs).collect()
    assert(rows.length === 9)
    rows.filter(_.modality == "audio").foreach { r =>
      val id = r.media_id
      val w = MediaCodec.decodeWavPcm16(r.bytes)
      assert(w.sampleRate === 16000)
      val want = Seq.tabulate((64 + id % 64).toInt)(i =>
        (((id * 1103L + i * 52457L) % 65536L) - 32768L).toShort)
      assert(w.samples.toSeq === want, s"audio $id")
    }
    rows.filter(_.modality == "image").foreach { r =>
      val id = r.media_id
      val b = MediaCodec.decodeBmp24(r.bytes)
      assert(b.width === (4 + id % 5).toInt && b.height === (3 + id % 4).toInt)
      b.pixels.zipWithIndex.foreach { case (p, i) =>
        assert((p >> 16) === ((id + 7L * i) % 256L).toInt, s"r at $id/$i")
        assert(((p >> 8) & 0xff) === ((2L * id + 11L * i) % 256L).toInt)
        assert((p & 0xff) === ((5L * id + 13L * i) % 256L).toInt)
      }
    }
    rows.filter(_.modality == "video").foreach { r =>
      val id = r.media_id
      val frames = Multimodal.splitBmpContainer(r.bytes)
      assert(frames.length === (2 + id % 3).toInt, s"frame count at $id")
      frames.zipWithIndex.foreach { case (fb, f) =>
        val b = MediaCodec.decodeBmp24(fb)
        assert(b.width === 8 && b.height === 6)
        assert((b.pixels(5) >> 16) === ((id + 17L * f + 7L * 5L) % 256L).toInt)
      }
    }
  }

  test("extractFeatures really decodes: audio stripes == formula recompute") {
    val docs = Seq((1L, "a"), (4L, "b")).toDF("doc_id", "text") // two audio
    val feats = Multimodal.extractFeatures(
        Multimodal.synthesizeMediaFiles(docs))
      .collect().map(f => f.media_id -> f.features).toMap
    for (id <- Seq(1L, 4L)) {
      val n = (64 + id % 64).toInt
      val acc = new Array[Long](64)
      for (i <- 0 until n)
        acc(i % 64) += (id * 1103L + i * 52457L) % 65536L // s + 32768
      val nrm = math.sqrt(acc.map(v => (v * v).toDouble).sum)
      val want = acc.map(v => (v / nrm).toFloat)
      assert(feats(id).toSeq === want.toSeq, s"audio features at $id")
    }
  }

  test("unknown payload formats fall back to pseudo-features, no row loss") {
    // UTF-8 text bytes are not valid WAV/BMP: every row must still
    // emit a unit-norm feature vector through the fallback
    val media = Multimodal.synthesizeFromDocuments(
      Tables(spark, "/root/testdata/sf0.001").documents)
    val f = Multimodal.extractFeatures(media, dim = 16).collect()
    assert(f.length === media.count())
    assert(f.forall { r =>
      val n = math.sqrt(r.features.map(x => x * x).sum)
      math.abs(n - 1.0) < 1e-3 || n === 0.0
    })
  }

  test("features flow into Similarity ANN unchanged") {
    val emb = Multimodal.featuresAsEmbeddings(
      Multimodal.extractFeatures(media, dim = 16))
    val knn = Similarity.bruteForceTopK(emb, maxQueryId = 3, k = 2)
    assert(knn.count() > 0)
    assert(knn.columns.toSeq === Seq("qid", "cid", "cos", "rn"))
  }
}
