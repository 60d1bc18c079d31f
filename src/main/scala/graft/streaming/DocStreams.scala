package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

import graft.operators.TextAnalysis

/** Structured Streaming over the documents table: the incremental twin
  * of the batch dedup pillar (graft.operators.Dedup), for pipelines
  * that ingest a document firehose and must emit each canonical text
  * exactly once.
  *
  * Same twin-checking scheme as [[EventStreams]]: the streaming result
  * over a static input is compared with the batch operator the DuckDB
  * oracle already arbitrates (StreamingSpec).
  *
  * Scale: state is one (fingerprint → keep_id) entry per DISTINCT
  * document ever seen — the inherent floor for exact streaming dedup
  * (you cannot forget a fingerprint without risking a re-emit). The
  * state store shards by fingerprint across executors like any keyed
  * state; for bounded-memory deployments compose with a
  * processing-time TTL upstream (accepting re-emits past the horizon)
  * or periodically compact state to a bloom-filter side input.
  */
object DocStreams extends Serializable {

  /** The documents schema as readStream needs it declared up front. */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** File-based stream source over a parquet directory. */
  def readDocs(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(docSchema).parquet(dir)

  final case class FpDoc(fp: String, doc_id: Long)
  final case class Keeper(fp: String, keep_id: Long)

  /** Streaming exact dedup: emit one [[Keeper]] per distinct content
    * fingerprint — the micro-batch's min doc_id on first sight,
    * nothing on later copies. Within a single micro-batch this equals
    * the batch `Dedup.exactDuplicates` canonical choice (min doc_id);
    * across batches the FIRST ARRIVAL wins, which is the streaming
    * semantics a firehose consumer wants (the canonical copy is
    * already downstream and must not be replaced).
    */
  def dedupedDocs(docs: DataFrame): Dataset[Keeper] = {
    import docs.sparkSession.implicits._
    docs
      .select(TextAnalysis.fingerprint(col("text")).as("fp"), col("doc_id"))
      .as[FpDoc]
      .groupByKey(_.fp)
      .flatMapGroupsWithState[Long, Keeper](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (fp: String, it: Iterator[FpDoc], state: GroupState[Long]) =>
          if (state.exists) {
            // canonical copy already emitted in an earlier batch
            Iterator.empty
          } else {
            val keepId = it.map(_.doc_id).min
            state.update(keepId)
            Iterator.single(Keeper(fp, keepId))
          }
      }
  }
}
