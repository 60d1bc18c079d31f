package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Serving layer (SURVEY.md §3.3): the Spark-native analogue of the
  * reference's Cassandra repositories.
  *
  * The reference designed each Cassandra table's partition key around
  * its query pattern — `((airport, unique_carrier), id)` for
  * `selectByAirport` (R:263-274) and `((request_origin, request_stop,
  * request_dest, request_date), id)` for `selectByRequest`
  * (R:596-615). The same query-shaped access pattern falls out of a
  * parquet warehouse partitioned by the lookup columns: a point lookup
  * reads ONLY the matching partition directories (partition pruning),
  * giving the "index per query" effect with no external service.
  */
object Serving {

  /** S7 (R:63-70) — keyspace DDL ≡ catalog database over a warehouse
    * dir.
    */
  def createDatabase(spark: SparkSession, name: String): Unit =
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$name`")

  def dropDatabase(spark: SparkSession, name: String): Unit =
    spark.sql(s"DROP DATABASE IF EXISTS `$name` CASCADE")

  /** S8 (R:263-270, R:596-611) — write a result table keyed for its
    * query pattern. Batch insert (R:276, R:617) ≡ the single write.
    * Scale note: partition columns must be low-to-mid cardinality
    * (airport, carrier, date) — the same constraint Cassandra's
    * partition-key design imposes.
    */
  def writeKeyed(df: DataFrame, path: String, keyCols: Seq[String],
      format: String = "parquet"): Unit =
    df.write.mode("overwrite").partitionBy(keyCols: _*)
      .format(format).save(path)

  /** S9 (R:274, R:615) — point lookup: filters on the partition columns
    * prune to the matching directories; only non-key predicates touch
    * row data. `format` must match the [[writeKeyed]] that produced
    * `path` ("parquet" default, "orc" for ORC warehouses — same
    * pruning behavior, see Ingest.writeWarehouse).
    */
  def lookup(spark: SparkSession, path: String,
      key: Map[String, Any], format: String = "parquet"): DataFrame = {
    val pred = key.map { case (k, v) => col(k) === v }
      .reduce((a: Column, b: Column) => a && b)
    spark.read.format(format).load(path).filter(pred)
  }
}
