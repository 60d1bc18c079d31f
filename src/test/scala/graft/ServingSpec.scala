package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions.col

import graft.engine.{Ingest, Serving}
import graft.sources.Tables

class ServingSpec extends SparkSpec {
  import spark.implicits._

  test("S8/S9: keyed write + point lookup round-trips and prunes") {
    val dir = Files.createTempDirectory("graft-serving").toString + "/t"
    val df = Seq(
      ("CMI", "MQ", 1L, 0.61), ("CMI", "OH", 2L, 0.97),
      ("BWI", "F9", 3L, 0.16), ("BWI", "MQ", 4L, 1.45)
    ).toDF("airport", "carrier", "id", "avg_dep_delay")
    Serving.writeKeyed(df, dir, Seq("airport", "carrier"))

    val got = Serving.lookup(spark, dir, Map("airport" -> "CMI"))
    assert(got.count() === 2)
    val one = Serving.lookup(spark, dir,
      Map("airport" -> "BWI", "carrier" -> "F9"))
      .select("id").as[Long].collect().toSeq
    assert(one === Seq(3L))
    // partition layout exists on disk (the "query-shaped key")
    assert(new java.io.File(s"$dir/airport=CMI/carrier=OH").exists())
  }

  test("S3: year filter on the warehouse prunes partitions, by scan metric") {
    val dir = Files.createTempDirectory("graft-wh").toString + "/flights"
    val flights = AirlineEntries.syntheticFlights(
      Tables(spark, "/root/testdata/sf0.001"))
    Ingest.writeWarehouse(flights, dir)

    def parquetFiles(f: java.io.File): Int =
      if (f.isDirectory) f.listFiles().map(parquetFiles).sum
      else if (f.getName.endsWith(".parquet")) 1 else 0
    val total = parquetFiles(new java.io.File(dir))
    // synthetic dates span 2008-01 .. 2009-02 → >= 14 (year, month) dirs
    assert(total >= 14, s"expected a multi-partition warehouse, got $total files")

    val pruned = Ingest.readWarehouse(spark, dir)
      .filter(col("year") === 2008 && col("month") === 1)
    assert(pruned.count() > 0)
    pruned.collect() // executes pruned's own plan → its scan metrics fill in
    val plan = pruned.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scan = plan.collect { case f: FileSourceScanExec => f }.head
    assert(scan.partitionFilters.nonEmpty,
      "year/month predicates must prune at the partition level, not post-scan")
    val scanned = scan.metrics("numFiles").value
    assert(scanned > 0 && scanned < total,
      s"pruned scan read $scanned of $total files - pruning did not happen")
  }

  test("S7: catalog database create/drop") {
    Serving.createDatabase(spark, "airline_ontime_test")
    assert(spark.catalog.databaseExists("airline_ontime_test"))
    Serving.dropDatabase(spark, "airline_ontime_test")
    assert(!spark.catalog.databaseExists("airline_ontime_test"))
  }
}
