package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (builder brief): image/audio/video as
  * opaque BINARY columns with typed metadata, plus the
  * decode / feature-extract / resize / frame-sample stages a training
  * pipeline runs over them.
  *
  * Decode is REAL for the public container formats this engine ships
  * codecs for ([[MediaCodec]]): RIFF/WAVE 16-bit PCM for audio, 24-bit
  * BMP for images, and BMP-frame containers (concatenated complete BMP
  * files, each self-describing via its header's file-size field) for
  * video. [[extractFeatures]] decodes those bytes end to end —
  * header parse, sample/pixel extraction, stripe aggregation — and
  * only falls back to the deterministic [[fakeDecode]] pseudo-features
  * for payloads in formats the engine has no codec for (the honest
  * fallback for codecs that would need native libraries).
  *
  * Scale: media rows are processed with `mapPartitions` in bounded
  * batches (the JVM analogue of mapInPandas' Arrow batches) so a
  * decoder can amortize model/codec init per batch, not per row; no
  * shuffle is introduced — decode is a narrow transformation, and
  * media BYTES never shuffle anywhere in this module (only ids,
  * fingerprints, and fixed-width aggregates leave the scan stage —
  * at 100 TB the bytes column dominates everything).
  */
object Multimodal {

  final case class MediaMeta(width: Int, height: Int, durationMs: Long,
      sampleRate: Int)

  final case class MediaRow(media_id: Long, modality: String,
      bytes: Array[Byte], meta: MediaMeta)

  final case class MediaFeatures(media_id: Long, modality: String,
      features: Array[Float])

  final case class MediaFrame(media_id: Long, frame_no: Int,
      frame_bytes: Array[Byte])

  /** Deterministic REAL media store derived from documents: every row
    * is a VALID file in a public container format — audio rows are
    * RIFF/WAVE 16-bit PCM mono at 16 kHz, image rows are 24-bit BMPs,
    * video rows are containers of complete concatenated BMP frames.
    * Sample/pixel values come from pure integer formulas of
    * (doc_id, position), so a DuckDB oracle can regenerate the decoded
    * content WITHOUT a codec — the hash gate then proves the engine's
    * encode∘decode round-trip is the identity on real files:
    *
    *  - audio (doc_id % 3 == 1): n = 64 + id%64 samples,
    *    s_i = ((id·1103 + i·52457) mod 65536) − 32768;
    *  - image (doc_id % 3 == 0): w = 4 + id%5, h = 3 + id%4, pixel p:
    *    r = (id + 7p) mod 256, g = (2id + 11p) mod 256,
    *    b = (5id + 13p) mod 256;
    *  - video (doc_id % 3 == 2): nf = 2 + id%3 frames of 8×6, frame f
    *    pixel p: r = (id + 17f + 7p) mod 256,
    *    g = (2id + 17f + 11p + 1) mod 256,
    *    b = (5id + 17f + 13p + 2) mod 256.
    */
  def synthesizeMediaFiles(documents: DataFrame): Dataset[MediaRow] = {
    import documents.sparkSession.implicits._
    documents.select(col("doc_id")).as[Long].map { id =>
      (id % 3) match {
        case 1 =>
          val n = (64 + id % 64).toInt
          val samples = Array.tabulate(n)(i =>
            (((id * 1103L + i.toLong * 52457L) % 65536L) - 32768L).toShort)
          MediaRow(id, "audio", MediaCodec.encodeWavPcm16(samples, 16000),
            MediaMeta(0, 0, n.toLong * 1000L / 16000L, 16000))
        case 0 =>
          val w = (4 + id % 5).toInt
          val h = (3 + id % 4).toInt
          val px = Array.tabulate(w * h) { p =>
            val r = ((id + 7L * p) % 256L).toInt
            val g = ((2L * id + 11L * p) % 256L).toInt
            val b = ((5L * id + 13L * p) % 256L).toInt
            (r << 16) | (g << 8) | b
          }
          MediaRow(id, "image", MediaCodec.encodeBmp24(px, w, h),
            MediaMeta(w, h, 0, 0))
        case _ =>
          val nf = (2 + id % 3).toInt
          val bytes = (0 until nf).map { f =>
            val px = Array.tabulate(48) { p =>
              val r = ((id + 17L * f + 7L * p) % 256L).toInt
              val g = ((2L * id + 17L * f + 11L * p + 1L) % 256L).toInt
              val b = ((5L * id + 17L * f + 13L * p + 2L) % 256L).toInt
              (r << 16) | (g << 8) | b
            }
            MediaCodec.encodeBmp24(px, 8, 6)
          }.reduce(_ ++ _)
          MediaRow(id, "video", bytes, MediaMeta(8, 6, nf * 40L, 0))
      }
    }
  }

  /** Deterministic fake media table derived from documents (the
    * format-agnostic byte-store fixture: bytes = UTF-8 of the text,
    * modality round-robins, metadata derived from lengths). Kept
    * beside [[synthesizeMediaFiles]] because the byte-level stages
    * (exact dedup, fixed-size frame chunking) are codec-independent
    * by design and their oracles gate exactly that.
    */
  def synthesizeFromDocuments(documents: DataFrame): Dataset[MediaRow] = {
    import documents.sparkSession.implicits._
    documents.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val b = text.getBytes("UTF-8")
        val modality = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        MediaRow(id, modality, b,
          MediaMeta(width = 64 + (id % 64).toInt, height = 64,
            durationMs = b.length.toLong * 10L, sampleRate = 16000))
      }
  }

  /** Exact media dedup — byte-identical duplicate detection BEFORE
    * any decode: the first, cheapest gate of a multimodal ingest
    * (decode is the expensive step; never decode the same bytes
    * twice). Groups by (content md5, modality) — identical bytes
    * under different declared modalities are different assets;
    * keeper is the smallest media_id. Returns (fp, modality,
    * keep_id, n_copies).
    *
    * Scale: the md5 computes in the scan projection, so only 32-char
    * fingerprints, modality, and ids shuffle — media BYTES never
    * move (at 100 TB the bytes column dominates everything; any plan
    * that shuffles it is wrong). Map-side combine on the (fp,
    * modality) key; same plan family as Dedup.exactDuplicates.
    */
  def exactMediaDuplicates(media: Dataset[MediaRow]): DataFrame =
    media.toDF()
      .select(col("media_id"), col("modality"), md5(col("bytes")).as("fp"))
      .groupBy(col("fp"), col("modality"))
      .agg(min(col("media_id")).as("keep_id"),
        count(lit(1)).as("n_copies"))

  /** FALLBACK decoder for formats the engine ships no codec for:
    * deterministic pseudo-features from the raw byte content
    * (per-stripe byte sums, L2-normalized). The REAL decode path is
    * [[decodeStream]]; this keeps unknown payloads flowing through
    * the same pipeline shape instead of failing the batch.
    *
    * Arithmetic is deliberately oracle-reproducible: stripe sums and
    * the squared norm are exact integers (order-independent), the
    * normalization runs in IEEE double, and the ONLY float32 step is
    * the final cast — so a DuckDB twin, which has no float32
    * accumulator, lands on bit-identical values. (L2 normalization
    * makes a uniform /255 scale a no-op, so none is applied.)
    */
  private[operators] def fakeDecode(bytes: Array[Byte], dim: Int): Array[Float] = {
    val acc = new Array[Long](dim)
    var i = 0
    while (i < bytes.length) {
      acc(i % dim) += (bytes(i) & 0xff).toLong
      i += 1
    }
    normalizeStripes(acc)
  }

  private def normalizeStripes(acc: Array[Long]): Array[Float] = {
    var ss = 0L
    acc.foreach(v => ss += v * v)
    val n = math.sqrt(ss.toDouble)
    if (n > 0) acc.map(v => (v.toDouble / n).toFloat)
    else new Array[Float](acc.length)
  }

  /** Split a BMP-frame video container into its complete BMP files by
    * REAL header parsing: each frame declares its own byte length in
    * the BITMAPFILEHEADER's file-size field (offset +2, LE), so the
    * walk needs no out-of-band index. Throws on a malformed container
    * (bad magic, size past the payload).
    */
  def splitBmpContainer(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val out = Seq.newBuilder[Array[Byte]]
    var off = 0
    while (off < bytes.length) {
      require(off + 6 <= bytes.length &&
        bytes(off) == 'B'.toByte && bytes(off + 1) == 'M'.toByte,
        s"no BM magic at container offset $off")
      val size = (bytes(off + 2) & 0xff) | ((bytes(off + 3) & 0xff) << 8) |
        ((bytes(off + 4) & 0xff) << 16) | ((bytes(off + 5) & 0xff) << 24)
      // bound check in Long: a crafted size near Int.MaxValue would
      // overflow off + size to negative and slip past an Int compare
      require(size >= 54 && off.toLong + size.toLong <= bytes.length,
        s"frame at $off declares $size bytes, ${bytes.length - off} remain")
      out += java.util.Arrays.copyOfRange(bytes, off, off + size)
      off += size
    }
    out.result()
  }

  /** Pixel channels in raster order (r, g, b per pixel) as an
    * unsigned integer stream — the canonical feature stream of a
    * decoded image.
    */
  private def channelStream(pixels: Array[Int]): Array[Long] = {
    val out = new Array[Long](pixels.length * 3)
    var p = 0
    while (p < pixels.length) {
      val v = pixels(p)
      out(3 * p) = ((v >> 16) & 0xff).toLong
      out(3 * p + 1) = ((v >> 8) & 0xff).toLong
      out(3 * p + 2) = (v & 0xff).toLong
      p += 1
    }
    out
  }

  /** REAL decode of a media payload to its canonical unsigned feature
    * stream: audio → PCM samples shifted to [0, 65535] (s + 32768),
    * image → pixel channels in raster order, video → frame channel
    * streams concatenated in container order. Throws
    * IllegalArgumentException on malformed bytes.
    */
  private[operators] def decodeStream(modality: String,
      bytes: Array[Byte]): Array[Long] = modality match {
    case "audio" => MediaCodec.decodeWavPcm16(bytes).samples
      .map(s => s.toLong + 32768L)
    case "image" => channelStream(MediaCodec.decodeBmp24(bytes).pixels)
    case "video" => splitBmpContainer(bytes)
      .flatMap(fb => channelStream(MediaCodec.decodeBmp24(fb).pixels))
      .toArray
    case m => throw new IllegalArgumentException(s"no codec for modality $m")
  }

  /** Decode + feature-extract in batches of `batchSize` rows per call
    * — the mapInPandas batch shape on the JVM. Narrow (no shuffle);
    * preserves partitioning. Payloads in the engine's REAL formats
    * (WAV PCM16 / BMP24 / BMP-frame containers) are actually decoded
    * — header parse, sample/pixel extraction — and the feature is the
    * L2-normalized per-stripe sum of the decoded stream (exact
    * integers until the final float cast, so the q37 DuckDB oracle
    * regenerates it from the [[synthesizeMediaFiles]] formulas and
    * gates the codec round-trip). Unknown formats fall back to
    * [[fakeDecode]] over the raw bytes.
    */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 64,
      batchSize: Int = 128): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch init would go here (codec/model handles)
        batch.iterator.map { r =>
          val stream =
            try decodeStream(r.modality, r.bytes)
            catch { case _: IllegalArgumentException => null }
          val feats =
            if (stream == null) fakeDecode(r.bytes, dim)
            else {
              val acc = new Array[Long](dim)
              var i = 0
              while (i < stream.length) {
                acc(i % dim) += stream(i)
                i += 1
              }
              normalizeStripes(acc)
            }
          MediaFeatures(r.media_id, r.modality, feats)
        }
      }
    }
  }

  /** Decoded-audio audit over the REAL WAV store: per media row, the
    * scalar aggregates of the actual PCM samples the codec extracted
    * — (n_samples, sample_rate, sum, abs-sum, min, max, negative
    * count). Narrow (decode in the scan stage, one row out per media
    * row); the q221 oracle regenerates the same aggregates from the
    * synthesis formulas, gating header parse + sample extraction
    * bit-for-bit.
    */
  def wavFeatures(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.modality == "audio").map { r =>
      val w = MediaCodec.decodeWavPcm16(r.bytes)
      val s = w.samples.map(_.toLong)
      // a zero-sample file is a LEGAL wav (empty data chunk): report
      // zero extrema instead of crashing the batch on an empty min
      if (s.isEmpty)
        (r.media_id, 0L, w.sampleRate.toLong, 0L, 0L, 0L, 0L, 0L)
      else
        (r.media_id, s.length.toLong, w.sampleRate.toLong, s.sum,
          s.map(math.abs).sum, s.min, s.max, s.count(_ < 0).toLong)
    }.toDF("media_id", "n_samples", "sample_rate", "s_sum", "s_abs_sum",
      "s_min", "s_max", "n_neg")
  }

  /** Decoded-image audit over the REAL BMP store: per media row, the
    * dimensions the header declared and the per-channel and
    * BT.601-integer luma sums of the actual decoded pixels
    * (luma = Σ 299r + 587g + 114b — the milli-weight integer form).
    * Gates row order, bottom-up flip, and padding handling (q222).
    */
  def bmpFeatures(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.modality == "image").map { r =>
      val b = MediaCodec.decodeBmp24(r.bytes)
      var rs = 0L; var gs = 0L; var bs = 0L; var ls = 0L
      b.pixels.foreach { p =>
        val pr = (p >> 16) & 0xff; val pg = (p >> 8) & 0xff; val pb = p & 0xff
        rs += pr; gs += pg; bs += pb
        ls += 299L * pr + 587L * pg + 114L * pb
      }
      (r.media_id, b.width.toLong, b.height.toLong, rs, gs, bs, ls)
    }.toDF("media_id", "width", "height", "r_sum", "g_sum", "b_sum",
      "luma_sum")
  }

  /** Frame sampling + decode over the REAL video containers: every
    * `everyNth` frame is located by the container walk
    * ([[splitBmpContainer]] — each frame's length read from its own
    * header), decoded, and reduced to per-channel sums. 1→N via
    * flatMap — a narrow Generator; frame BYTES never leave the scan
    * stage. q223 regenerates the sums from the synthesis formulas.
    */
  def videoFrameFeatures(media: Dataset[MediaRow],
      everyNth: Int = 2): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.modality == "video").flatMap { r =>
      splitBmpContainer(r.bytes).zipWithIndex.collect {
        case (fb, f) if f % everyNth == 0 =>
          val b = MediaCodec.decodeBmp24(fb)
          var rs = 0L; var gs = 0L; var bs = 0L
          b.pixels.foreach { p =>
            rs += (p >> 16) & 0xff; gs += (p >> 8) & 0xff; bs += p & 0xff
          }
          (r.media_id, f.toLong, b.width.toLong, b.height.toLong, rs, gs, bs)
      }
    }.toDF("media_id", "frame_no", "width", "height", "r_sum", "g_sum",
      "b_sum")
  }

  /** Frame sampling for video rows in formats the engine has NO codec
    * for: every `everyNth` fixed-size chunk of the payload stands in
    * for a frame — the codec-INDEPENDENT fallback of the real
    * container walk ([[splitBmpContainer]], which [[videoFrameDuplicates]]
    * and [[videoFrameFeatures]] use). 1→N via flatMap — a narrow
    * Generator.
    */
  def sampleFrames(media: Dataset[MediaRow], everyNth: Int = 4,
      frameBytes: Int = 256): Dataset[MediaFrame] = {
    import media.sparkSession.implicits._
    media.filter(_.modality == "video").flatMap { r =>
      r.bytes.grouped(frameBytes).zipWithIndex.collect {
        case (chunk, idx) if idx % everyNth == 0 =>
          MediaFrame(r.media_id, idx, chunk)
      }
    }
  }

  /** Frame-level exact dedup across the video corpus — static intros,
    * logo cards, and black frames repeat across titles, and every
    * duplicate frame decoded or embedded twice is wasted GPU
    * downstream. Frames come from the REAL container walk
    * ([[splitBmpContainer]] — each frame located by its own header)
    * and each is DECODED; the fingerprint is md5 over the decoded
    * frame's canonical pixel stream (`WxH:` + the r,g,b channel
    * values in raster order, comma-joined — pure integers, so the
    * q109 oracle regenerates it from the synthesis formulas without a
    * codec, and two byte-different encodings of the same pixels — e.g.
    * bottom-up vs top-down storage — correctly collapse). Keeper is
    * the smallest (media_id, frame_no). Returns (fp, keep_media_id,
    * keep_frame_no, n_copies).
    *
    * Scale: walk + decode + canonicalize + md5 all run in the scan
    * stage (flatMap then projection); only 32-char fingerprints and
    * ids cross the shuffle — frame BYTES and pixel streams never
    * move. For codec-less formats use [[chunkFrameDuplicates]].
    */
  def videoFrameDuplicates(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.modality == "video").flatMap { r =>
      splitBmpContainer(r.bytes).zipWithIndex.map { case (fb, f) =>
        val b = MediaCodec.decodeBmp24(fb)
        val canon = s"${b.width}x${b.height}:" +
          channelStream(b.pixels).mkString(",")
        (r.media_id, f.toLong, canon)
      }
    }.toDF("media_id", "frame_no", "canon")
      .select(col("media_id"), col("frame_no"), md5(col("canon")).as("fp"))
      .groupBy(col("fp"))
      .agg(min(struct(col("media_id"), col("frame_no"))).as("k"),
        count(lit(1)).as("n_copies"))
      .select(col("fp"), col("k.media_id").as("keep_media_id"),
        col("k.frame_no").as("keep_frame_no"), col("n_copies"))
  }

  /** [[videoFrameDuplicates]]' codec-INDEPENDENT fallback: exact
    * dedup over [[sampleFrames]]' fixed-size byte chunks, for video
    * formats the engine ships no container walk for. Fingerprint =
    * md5 over the chunk bytes' HEX string (byte-exact in any engine
    * whose md5 is string-typed, no text-encoding reliance). Only
    * 32-char fingerprints shuffle; chunk bytes stay in the scan
    * stage.
    */
  def chunkFrameDuplicates(media: Dataset[MediaRow], everyNth: Int = 4,
      frameBytes: Int = 256): DataFrame = {
    val frames = sampleFrames(media, everyNth, frameBytes).toDF()
    frames
      .select(col("media_id"), col("frame_no"),
        md5(hex(col("frame_bytes"))).as("fp"))
      .groupBy(col("fp"))
      .agg(min(struct(col("media_id"), col("frame_no"))).as("k"),
        count(lit(1)).as("n_copies"))
      .select(col("fp"), col("k.media_id").as("keep_media_id"),
        col("k.frame_no").cast("long").as("keep_frame_no"),
        col("n_copies"))
  }

  /** REAL image resize: decode the BMP, nearest-neighbor resample to
    * w×h (output pixel (x, y) reads source ((x·srcW) div w,
    * (y·srcH) div h) — pure integer index math, so the q233 oracle
    * regenerates the resampled pixels from the synthesis formulas),
    * re-encode, and update the metadata. Non-image rows pass through
    * untouched. Narrow per-row transform — decode/encode never leave
    * the scan stage.
    */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    require(w > 0 && h > 0, s"degenerate ${w}x$h resize target")
    import media.sparkSession.implicits._
    media.map { r =>
      if (r.modality == "image") {
        val b = MediaCodec.decodeBmp24(r.bytes)
        val px = Array.tabulate(w * h) { p =>
          val x = p % w
          val y = p / w
          b.pixels((y * b.height / h) * b.width + (x * b.width / w))
        }
        r.copy(bytes = MediaCodec.encodeBmp24(px, w, h),
          meta = r.meta.copy(width = w, height = h))
      } else r
    }
  }

  /** REAL audio resample: decode the WAV, nearest-neighbor resample
    * the PCM to `outRate` PER CHANNEL (frames nf = samples/channels;
    * output frames nf' = (nf·outRate) div srcRate, output frame i
    * reads source frame min((i·srcRate) div outRate, nf−1) — integer
    * index math, q234's oracle regenerates it on the mono store),
    * re-encode at the new rate with the SAME channel count. Indexing
    * frames, not the interleaved sample array, keeps stereo files
    * channel-correct instead of garbling the interleave. Non-audio
    * rows pass through.
    */
  def resampleWav(media: Dataset[MediaRow], outRate: Int): Dataset[MediaRow] = {
    require(outRate > 0, s"outRate=$outRate must be positive")
    import media.sparkSession.implicits._
    media.map { r =>
      if (r.modality == "audio") {
        val wv = MediaCodec.decodeWavPcm16(r.bytes)
        val ch = wv.numChannels
        val nf = wv.samples.length / ch
        val outNf = (nf.toLong * outRate / wv.sampleRate).toInt
        val out = Array.tabulate(outNf * ch) { j =>
          val frame = math.min(
            ((j / ch).toLong * wv.sampleRate / outRate).toInt, nf - 1)
          wv.samples(frame * ch + j % ch)
        }
        r.copy(bytes = MediaCodec.encodeWavPcm16(out, outRate, ch),
          meta = r.meta.copy(
            durationMs = outNf.toLong * 1000L / outRate,
            sampleRate = outRate))
      } else r
    }
  }

  /** Media features as a DataFrame compatible with Similarity's
    * operators (vec_id, embedding) — the multimodal → ANN hand-off.
    */
  def featuresAsEmbeddings(features: Dataset[MediaFeatures]): DataFrame =
    features.toDF().select(col("media_id").as("vec_id"),
      col("features").as("embedding"))

  /** Integer nearest-neighbor UPSCALE of image rows by `factor`
    * (pixel replication — the exact inverse direction of [[resize]]'s
    * index math): output pixel (x, y) reads source (x div factor,
    * y div factor). Used to synthesize re-encoded near-duplicates the
    * perceptual hash family must catch. Non-image rows pass through.
    */
  def upscale(media: Dataset[MediaRow], factor: Int): Dataset[MediaRow] = {
    require(factor >= 1, s"factor=$factor must be >= 1")
    import media.sparkSession.implicits._
    media.map { r =>
      if (r.modality == "image") {
        val b = MediaCodec.decodeBmp24(r.bytes)
        val (w, h) = (b.width * factor, b.height * factor)
        val px = Array.tabulate(w * h) { p =>
          val x = p % w
          val y = p / w
          b.pixels((y / factor) * b.width + x / factor)
        }
        r.copy(bytes = MediaCodec.encodeBmp24(px, w, h),
          meta = r.meta.copy(width = w, height = h))
      } else r
    }
  }

  /** 64-bit PERCEPTUAL difference hash (dHash — the standard public
    * aHash/dHash family) over each decoded image, split into two
    * 32-bit halves so neither engine's BIGINT shift can overflow:
    * integer BT.601 luma (299r + 587g + 114b, the [[bmpFeatures]]
    * milli-weights) sampled on a 9-wide x 8-high grid with [[resize]]'s
    * nearest-neighbor index math (sx = gx·w div 9, sy = gy·h div 8),
    * bit (gy·8 + gx) = 1 iff luma(gx+1, gy) > luma(gx, gy). Pure
    * integer end to end, so the q236 oracle regenerates every bit
    * from the synthesis formulas. Exact byte dedup misses re-encoded /
    * resized copies; dHash is invariant to them (an integer-factor
    * upscale provably preserves every sampled pixel: floor(floor(
    * gx·kw/9)/k) = floor(gx·w/9)). Returns (media_id, dhash_lo,
    * dhash_hi); image rows only. Narrow — decode and hash never leave
    * the scan stage.
    */
  def imageDHashes(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.modality == "image").map { r =>
      val b = MediaCodec.decodeBmp24(r.bytes)
      def luma(gx: Int, gy: Int): Long = {
        val p = b.pixels((gy * b.height / 8) * b.width + gx * b.width / 9)
        299L * ((p >> 16) & 0xff) + 587L * ((p >> 8) & 0xff) +
          114L * (p & 0xff)
      }
      var lo = 0L; var hi = 0L
      var gy = 0
      while (gy < 8) {
        var gx = 0
        while (gx < 8) {
          if (luma(gx + 1, gy) > luma(gx, gy)) {
            val i = gy * 8 + gx
            if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
          }
          gx += 1
        }
        gy += 1
      }
      (r.media_id, lo, hi)
    }.toDF("media_id", "dhash_lo", "dhash_hi")
  }

  /** Explode video containers into standalone IMAGE rows, one per
    * frame — each frame of a BMP-frame container is a complete BMP
    * file, so the whole image family (dedup, dHash, resize, ANN)
    * applies at FRAME granularity with zero new machinery. The frame
    * id is `media_id · idStride + frame_no` (caller guarantees
    * idStride exceeds any container's frame count). Narrow flatMap;
    * frame bytes stay in the scan stage until a consumer decodes
    * them.
    */
  def videoFramesAsImages(media: Dataset[MediaRow],
      idStride: Long = 1000L): Dataset[MediaRow] = {
    require(idStride >= 2, s"idStride=$idStride must be >= 2")
    import media.sparkSession.implicits._
    media.filter(_.modality == "video").flatMap { r =>
      splitBmpContainer(r.bytes).zipWithIndex.map { case (fb, f) =>
        val b = MediaCodec.decodeBmp24(fb)
        MediaRow(r.media_id * idStride + f, "image", fb,
          MediaMeta(b.width, b.height, 0, 0))
      }
    }
  }

  /** Perceptual NEAR-duplicate image pairs off a [[imageDHashes]]
    * table: the SimHash banding discipline — each 64-bit hash splits
    * into 4 16-bit bands, candidates share a (band, value) bucket,
    * and with `maxHamming` ≤ 3 the banding is pigeonhole-COMPLETE
    * (≤ 3 flipped bits cannot touch all 4 bands). Buckets larger than
    * `maxBucket` are dropped (hot-band cap, mirrored in the oracle —
    * the q25 LSH discipline; at corpus scale a flat-color band value
    * would otherwise go quadratic). Verification is the exact Hamming
    * distance (bit_count of xor, both halves). Returns (id1, id2,
    * hamming) with id1 < id2.
    *
    * Scale: hashes are 2 BIGINTs per image — the bucket join moves
    * (band, value, id) triples only; the verify join is candidate-
    * proportional against the hash table. No pixel ever shuffles.
    */
  def imageNearDuplicates(hashes: DataFrame, maxHamming: Int = 3,
      maxBucket: Int = 64): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"maxHamming=$maxHamming: 4x16-bit banding is complete only to 3")
    require(maxBucket >= 2, s"maxBucket=$maxBucket must be >= 2")
    val bands = hashes.select(col("media_id"),
        explode(array((0 to 3).map { b =>
          val half = if (b < 2) col("dhash_lo") else col("dhash_hi")
          struct(lit(b).as("band"),
            shiftright(half, 16 * (b % 2)).bitwiseAND(lit(65535L)).as("v"))
        }: _*)).as("bv"))
      .select(col("media_id"), col("bv.band").as("band"), col("bv.v").as("v"))
    val cool = bands.groupBy(col("band"), col("v"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") <= maxBucket)
      .select(col("band"), col("v"))
    val inCool = bands.join(cool, Seq("band", "v"))
    val cands = inCool.as("a").join(inCool.as("b"),
        col("a.band") === col("b.band") && col("a.v") === col("b.v") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id1"), col("b.media_id").as("id2"))
      .distinct()
    val h1 = hashes.select(col("media_id").as("id1"),
      col("dhash_lo").as("lo1"), col("dhash_hi").as("hi1"))
    val h2 = hashes.select(col("media_id").as("id2"),
      col("dhash_lo").as("lo2"), col("dhash_hi").as("hi2"))
    cands.join(h1, Seq("id1")).join(h2, Seq("id2"))
      .select(col("id1"), col("id2"),
        (expr("bit_count(lo1 ^ lo2)") + expr("bit_count(hi1 ^ hi2)"))
          .cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }
}
