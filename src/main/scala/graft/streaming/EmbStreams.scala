package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Similarity

/** Structured Streaming over the embeddings table: the firehose side
  * of the similarity pillar. An embedding producer (encoder service)
  * streams vectors; the pipeline compresses them to PQ codes ON
  * ARRIVAL with the codebook trained offline by the batch tier —
  * codes land in the serving store, raw vectors can be archived cold.
  *
  * Same twin discipline as [[DocStreams]]: streaming output over a
  * static input equals the oracle-gated batch operator
  * (StreamingSpec pins `pqCodes` == q117's codes).
  */
object EmbStreams {

  /** The embeddings schema as readStream needs it declared. */
  val embSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  /** File-based stream source over a parquet directory. */
  def readEmbeddings(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(embSchema).parquet(dir)

  /** Streaming PQ encoding: (vec_id, codes) per arriving vector,
    * against the OFFLINE-trained codebook
    * ([[Similarity.pqCodebookLocal]] — the model artifact, shipped
    * like the bloom filter blob). STATELESS like
    * [[DocStreams.bloomFlagged]]: [[Similarity.pqAssignExpr]] is a
    * pure per-row expression chain (least-over-structs argmin, no
    * join/window/UDF), so there is no state store and a codebook
    * refresh is a stream restart with the new literal. Vectors of
    * the wrong width are dropped — [[Similarity.vectorHealth]] is
    * the batch preflight that counts them.
    */
  def pqCodes(emb: DataFrame, codebook: Seq[(Int, Long, Seq[Long])],
      m: Int = 4, dim: Int = 64): DataFrame =
    emb.filter(size(col("embedding")) === dim)
      .select(col("vec_id"),
        Similarity.pqAssignExpr(col("embedding"), codebook, m, dim)
          .as("codes"))

  /** Streaming nearest-centroid classification: a pred label per
    * arriving vector against the OFFLINE-trained label centroids
    * ([[Similarity.centroidModelLocal]] — shipped as literals like
    * the PQ codebook). STATELESS pure expression, so a model refresh
    * is a stream restart; wrong-width vectors drop. The online-
    * inference half of the q158 classifier: route/score embeddings
    * at ingest by reference-class proximity.
    *
    * Twin contract (StreamingSpec): (vec_id, pred_label) equals the
    * batch classifier's assignment for every streamed vector.
    */
  def centroidLabels(emb: DataFrame,
      centroids: Seq[(Long, Seq[Long])], dim: Int = 64): DataFrame =
    emb.filter(size(col("embedding")) === dim)
      .select(col("vec_id"),
        Similarity.centroidAssignExpr(col("embedding"), centroids)
          .as("pred_label"))
}
