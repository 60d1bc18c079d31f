package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

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

  /** Partition-aware upsert into a [[writeKeyed]] table: rows in
    * `updates` replace existing rows with the same `idCols` identity;
    * everything else stands. ONLY the partitions `updates` touches
    * are read and rewritten (dynamic partition overwrite — untouched
    * partition directories keep their very files), so per-batch cost
    * scales with the update's partition footprint, not the table —
    * the incremental-maintenance shape that pairs with
    * `Curation.snapshotDiff` / `Dedup.incrementalDedup` upstream.
    *
    * The merged result is materialized (`localCheckpoint`) before the
    * write because it reads the same path it overwrites; memory is
    * bounded by the AFFECTED partitions' size — the honest constraint
    * of any rewrite-based upsert (incremental batches touch few
    * partitions; a full-table update is [[writeKeyed]]).
    */
  def upsertKeyed(spark: SparkSession, path: String, updates: DataFrame,
      keyCols: Seq[String], idCols: Seq[String],
      format: String = "parquet"): Unit = {
    require(idCols.nonEmpty, "idCols must identify rows")
    val cols = updates.columns.toSeq
    // affected partition keys, localized: bounded by the update's
    // partition footprint (the same smallness writeKeyed's
    // low-cardinality key constraint already imposes) — an explicit
    // OR-of-ANDs predicate makes the pruning STATIC and plan-visible
    // instead of betting on dynamic partition pruning firing
    val affected = updates.select(keyCols.map(col): _*).distinct().collect()
    require(affected.nonEmpty, "updates are empty")
    val pred = affected.map { r =>
      keyCols.zipWithIndex.map { case (k, i) => col(k) === lit(r.get(i)) }
        .reduce((a: Column, b: Column) => a && b)
    }.reduce((a: Column, b: Column) => a || b)
    val existing = spark.read.format(format).load(path).filter(pred)
    val survivors = existing
      .join(updates.select(idCols.map(col): _*).distinct(), idCols,
        "left_anti")
      .select(cols.map(col): _*)
    val merged = survivors.unionByName(updates.select(cols.map(col): _*))
      .localCheckpoint(true)
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try merged.write.mode("overwrite").partitionBy(keyCols: _*)
      .format(format).save(path)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** Hard delete of specific rows from a keyed warehouse table — the
    * right-to-be-forgotten / takedown primitive ([[upsertKeyed]]'s
    * destructive sibling; a 100 TB corpus under data-governance rules
    * needs targeted deletes that do NOT rewrite the world). `tombstones`
    * must carry `keyCols` (the partition columns — used ONLY to bound
    * the rewrite to affected partitions, statically) and `idCols` (the
    * row identity to delete). Untouched partitions keep their very
    * files (dynamic partition overwrite); affected partitions are
    * rewritten minus the anti-joined ids. Idempotent: deleting already-
    * absent ids rewrites the partitions to identical content.
    */
  def deleteKeyed(spark: SparkSession, path: String, tombstones: DataFrame,
      keyCols: Seq[String], idCols: Seq[String],
      format: String = "parquet"): Unit = {
    require(idCols.nonEmpty, "idCols must identify rows")
    val affected = tombstones.select(keyCols.map(col): _*).distinct().collect()
    require(affected.nonEmpty, "tombstones are empty")
    val pred = affected.map { r =>
      keyCols.zipWithIndex.map { case (k, i) => col(k) === lit(r.get(i)) }
        .reduce((a: Column, b: Column) => a && b)
    }.reduce((a: Column, b: Column) => a || b)
    val existing = spark.read.format(format).load(path).filter(pred)
    val survivors = existing
      .join(tombstones.select(idCols.map(col): _*).distinct(), idCols,
        "left_anti")
      .localCheckpoint(true)
    // dynamic overwrite only rewrites partitions PRESENT in the
    // output — a partition whose every row died would silently keep
    // its old files. Remove fully-emptied partition dirs explicitly.
    val survivedKeys = survivors.select(keyCols.map(col): _*).distinct()
      .collect().map(_.toSeq).toSet
    val emptied = affected.map(_.toSeq).filterNot(survivedKeys.contains)
    if (survivedKeys.nonEmpty) {
      val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try survivors.write.mode("overwrite").partitionBy(keyCols: _*)
        .format(format).save(path)
      finally prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
    if (emptied.nonEmpty) {
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      emptied.foreach { vals =>
        val dir = keyCols.zip(vals).map { case (k, v) => s"$k=$v" }
          .mkString("/")
        fs.delete(new org.apache.hadoop.fs.Path(s"$path/$dir"), true)
      }
    }
  }

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
