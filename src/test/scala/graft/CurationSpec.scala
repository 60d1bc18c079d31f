package graft

import org.apache.spark.sql.functions._

import graft.analytics.DistributionFit
import graft.operators.Curation

/** Pins the curation operators (Curation.scala): deterministic
  * md5-derived splits/samples, per-source quotas, planted
  * decontamination, and the run-length rank–frequency table.
  */
class CurationSpec extends SparkSpec {

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("hashSplit: complete, deterministic, buckets in range") {
    val s = Curation.hashSplit(docs).cache()
    try {
      val total = docs.count()
      assert(s.count() === total)

      val byCat = s.groupBy("split").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(byCat.keySet.subsetOf(Set("train", "val", "test")))
      assert(byCat.values.sum === total)
      // 80/10/10 target: train must dominate on any non-tiny corpus
      assert(byCat("train") > byCat.getOrElse("val", 0L))
      assert(byCat("train") > byCat.getOrElse("test", 0L))

      val range = s.agg(min("bucket"), max("bucket")).head()
      assert(range.getLong(0) >= 0 && range.getLong(1) < 100)

      // pure function of the key: a second evaluation agrees row-for-row
      val again = Curation.hashSplit(docs)
      assert(s.join(again, Seq("doc_id", "bucket", "split")).count() === total)
    } finally s.unpersist()
  }

  test("sourceCap: at most k per source, exact quota when source is larger") {
    val k = 5
    val capped = Curation.sourceCap(docs, k).cache()
    try {
      val perSource = capped.groupBy("source").count()
      assert(perSource.filter(col("count") > k).isEmpty)
      val sizes = docs.groupBy("source").count()
        .withColumnRenamed("count", "total")
      // every source with >= k docs must contribute exactly k
      val short = perSource.join(sizes, "source")
        .filter(col("total") >= k && col("count") =!= k)
      assert(short.isEmpty)
      assert(capped.agg(max("rn")).head().getLong(0) <= k)
    } finally capped.unpersist()
  }

  test("stratifiedSample: per-stratum counts bounded and complete") {
    val r = Curation.stratifiedSample(docs, permille = 200).collect()
    assert(r.map(_.getAs[Long]("n_total")).sum === docs.count())
    r.foreach { row =>
      val total = row.getAs[Long]("n_total")
      val sampled = row.getAs[Long]("n_sampled")
      assert(sampled >= 0 && sampled <= total)
    }
  }

  test("decontaminate: planted eval overlap flagged, clean doc not") {
    import spark.implicits._
    val phrase = "zygomorphic quasar flotilla unprecedented verdigris"
    val planted = Seq(
      (10L, s"held out benchmark item with $phrase inside"), // eval (10 % 10 == 0)
      (3L,  s"training document that copied $phrase verbatim"), // contaminated
      (7L,  "completely unrelated clean training text about weather patterns"))
      .toDF("doc_id", "text")
    val flagged = Curation.decontaminate(planted).collect()
    val ids = flagged.map(_.getAs[Long]("doc_id")).toSet
    assert(ids.contains(3L), "doc sharing the planted phrase must be flagged")
    assert(!ids.contains(7L), "clean doc must not be flagged")
    assert(!ids.contains(10L), "eval docs are not part of the output")
    val n3 = flagged.find(_.getAs[Long]("doc_id") == 3L).get.getAs[Long]("n_shared")
    assert(n3 >= phrase.length - 7,
      s"shared 8-gram count $n3 must cover the planted phrase")
  }

  test("rankTable: contiguous run-length ranks covering all keys") {
    import spark.implicits._
    val keyCounts = Seq(("a", 5L), ("b", 5L), ("c", 3L),
      ("d", 1L), ("e", 1L), ("f", 1L)).toDF("key", "cnt")
    val rows = DistributionFit.rankTable(keyCounts)
      .orderBy(col("cnt").desc).collect()
      .map(r => (r.getAs[Long]("cnt"), r.getAs[Long]("n_keys"),
        r.getAs[Long]("rank_start")))
    assert(rows.toSeq === Seq((5L, 2L, 1L), (3L, 1L, 3L), (1L, 3L, 4L)))
    // contiguity invariant: next rank_start = rank_start + n_keys
    rows.sliding(2).foreach { case Array((_, n, rs), (_, _, rs2)) =>
      assert(rs2 === rs + n)
    }
  }
}
