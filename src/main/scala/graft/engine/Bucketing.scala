package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed warehouse tables: the co-located-join primitive
  * (SURVEY.md §4 / builder brief "repartition/bucketing for
  * co-located joins").
  *
  * Two tables bucketed (and sorted) on the same join key with the
  * same bucket count join with NO exchange on either side — the
  * sort-merge join reads bucket i against bucket i directly. At
  * 100 TB this removes the dominant shuffle from every fact-to-fact
  * join that repeats a key (lineitem⋈orders on orderkey being the
  * canonical case); the price is paid once at write time.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted table in the session
    * catalog's warehouse.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  def drop(spark: SparkSession, name: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
}
