package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSON-lines source/sink — the interchange format training-data
  * pipelines actually exchange (one JSON object per line, splittable,
  * append-friendly), complementing the columnar warehouse
  * (`Ingest.writeWarehouse`) the same way the reference's HDFS text
  * sinks complemented its CSV inputs (R:135-136).
  *
  * Position in the architecture: JSONL is the EDGE format — ingest
  * from an external producer, export to a tokenizer — never the
  * analytical store. A pipeline reads JSONL once, writes parquet/ORC,
  * and every operator here runs columnar; the q121 contract row pins
  * that the edge round-trip is lossless for the documents schema.
  *
  * Scale: a JSONL directory splits by line like any text source (one
  * task per 128 MB split, gzip files fall back to one-task-per-file —
  * prefer zstd/uncompressed shards); the explicit-schema read skips
  * Spark's whole-dataset schema inference pass, which at 100 TB is a
  * full extra scan.
  */
object JsonLines {

  /** Write one JSON object per row. Spark's JSON writer escapes
    * control characters and preserves unicode — the round-trip is
    * byte-exact for string payloads (q121 hash-gates this).
    */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Schema'd read — never schema inference (a second full scan at
    * warehouse scale, and type-unstable on sparse fields). Malformed
    * lines drop under DROPMALFORMED like the CSV ingest (R:112's
    * cleaning rule applied to the JSON edge).
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "DROPMALFORMED").json(path)
}
