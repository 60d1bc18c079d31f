package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every SparkEntry query at
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line.
  *
  * Methodology:
  *  - warmup pass at sf0.001 first: JIT-compiles Spark's scan/shuffle/
  *    codegen paths and populates the whole-stage-codegen cache (the
  *    generated class for a plan is data-independent, so the timed run
  *    measures execution, not Janino compilation);
  *  - timed pass materializes via the noop sink — full execution
  *    including final sorts (a bare count() lets Catalyst elide
  *    orderBys) with zero sink cost;
  *  - queries run in name order (stable timings across rounds).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)

    def run(dir: String, name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn(spark, dir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed on $dir: ${e.getMessage}")
        return -1.0
      } finally {
        // queries that persist intermediates (dedup's shingle index)
        // must not occupy the heap of every query after them
        spark.sharedState.cacheManager.clearCache()
      }
      (System.nanoTime() - t0) / 1e9
    }

    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory && warmDir != sfDir)
      ordered.foreach { case (n, f) => run(warmDir, n, f) }

    val results = ordered.map { case (name, fn) =>
      name -> run(sfDir, name, fn)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
