package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (builder brief): image/audio/video as
  * opaque BINARY columns with typed metadata, plus the
  * decode / feature-extract / resize / frame-sample stages a training
  * pipeline runs over them.
  *
  * The actual codec work is STUBBED (this container ships no
  * image/audio libraries): `fakeDecode` derives a deterministic
  * feature vector from the bytes. Everything AROUND the stub — the
  * schema, the batched per-partition execution shape, partitioning
  * preservation, and the hand-off into Similarity — is real and
  * tested. Swapping `fakeDecode` for a JNI/ONNX decoder changes no
  * plumbing.
  *
  * Scale: media rows are processed with `mapPartitions` in bounded
  * batches (the JVM analogue of mapInPandas' Arrow batches) so a
  * decoder can amortize model/codec init per batch, not per row; no
  * shuffle is introduced — decode is a narrow transformation.
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

  /** Deterministic fake media table derived from documents (test/dev
    * stand-in for a real media store): bytes = UTF-8 of the text,
    * modality round-robins, metadata derived from lengths.
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

  /** STUB decoder: deterministic pseudo-features from the byte
    * content (per-stripe byte sums, L2-normalized). Replace with a
    * real decoder; signature and batching stay.
    *
    * Arithmetic is deliberately oracle-reproducible (q37/q38): stripe
    * sums and the squared norm are exact integers (order-independent),
    * the normalization runs in IEEE double, and the ONLY float32 step
    * is the final cast — so the DuckDB twin, which has no float32
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
    var ss = 0L
    acc.foreach(v => ss += v * v)
    val n = math.sqrt(ss.toDouble)
    if (n > 0) acc.map(v => (v.toDouble / n).toFloat) else new Array[Float](dim)
  }

  /** Decode + feature-extract in batches of `batchSize` rows per call
    * — the mapInPandas batch shape on the JVM. Narrow (no shuffle);
    * preserves partitioning.
    */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 64,
      batchSize: Int = 128): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch init would go here (codec/model handles)
        batch.iterator.map(r =>
          MediaFeatures(r.media_id, r.modality, fakeDecode(r.bytes, dim)))
      }
    }
  }

  /** Frame sampling for video rows: every `everyNth` fixed-size chunk
    * of the payload stands in for a decoded frame (STUB chunking; real
    * impl would seek keyframes). 1→N via flatMap — a narrow Generator.
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
    * downstream. Fingerprints [[sampleFrames]]' output; keeper is the
    * lexicographically smallest (media_id, frame_no). Returns
    * (fp, keep_media_id, keep_frame_no, n_copies).
    *
    * The fingerprint is md5 over the frame bytes' HEX string (not the
    * raw bytes): byte-exact in any engine whose md5 is string-typed,
    * with no reliance on text encodings (the oracle walks the same
    * hex expansion it already uses for q37's feature stub). Only
    * 32-char fingerprints shuffle; frame bytes stay in the scan
    * stage.
    */
  def frameDuplicates(media: Dataset[MediaRow], everyNth: Int = 4,
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

  /** Resize stub for images: metadata-only transform (real impl
    * rewrites bytes; the pipeline contract — same row count, updated
    * meta — is what downstream stages depend on).
    */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { r =>
      if (r.modality == "image") r.copy(meta = r.meta.copy(width = w, height = h))
      else r
    }
  }

  /** Media features as a DataFrame compatible with Similarity's
    * operators (vec_id, embedding) — the multimodal → ANN hand-off.
    */
  def featuresAsEmbeddings(features: Dataset[MediaFeatures]): DataFrame =
    features.toDF().select(col("media_id").as("vec_id"),
      col("features").as("embedding"))
}
