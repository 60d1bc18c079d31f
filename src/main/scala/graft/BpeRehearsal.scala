package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import graft.operators.Bpe
import graft.sources.Tables

/** BPE-trainer driver-loop rehearsal: train `merges` merges twice —
  * one-merge-per-round (`batchM = 1`, the round-10 shape) vs batched
  * selection (`batchM = 8`, the default) — and print wall, SPARK JOB
  * COUNT, and achieved rounds for each. The job count is the metric
  * that matters at a real tokenizer's 32k merges: each round costs a
  * fixed number of driver round-trips (collect + checkpoints), so
  * rounds ≈ jobs/constant is the driver-side bottleneck the batching
  * removes. Output equality is asserted, not assumed.
  *
  * Usage: `runMain graft.BpeRehearsal [sfDir] [merges]` — defaults
  * /root/testdata/sf0.01, 64.
  */
object BpeRehearsal {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val merges = args.lift(1).map(_.toInt).getOrElse(64)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bpe-rehearsal")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })

    val docs = Tables(spark, sfDir).documents
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    docs.count() // warm the cache so both legs pay identical input cost

    var sequential: Seq[(Long, String, String, Long)] = Nil
    for ((label, m) <- Seq(("sequential", 1), ("batched", 8))) {
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      val out = {
        import spark.implicits._
        Bpe.bpeTrain(docs, merges = merges, batchM = m)
          .orderBy("rank").as[(Long, String, String, Long)].collect().toSeq
      }
      val wall = (System.nanoTime() - t0) / 1e9
      val nJobs = jobs.get() - j0
      if (m == 1) sequential = out
      else require(out == sequential,
        s"batched output diverged from sequential at merges=$merges")
      println(f"""{"mode":"$label","batchM":$m,"merges":${out.size},""" +
        f""""wall_sec":$wall%.2f,"spark_jobs":$nJobs,""" +
        f""""jobs_per_merge":${nJobs.toDouble / out.size}%.2f}""")
    }
    spark.stop()
  }
}
