package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches

/** Pins the count-min sketch (Sketches.scala): overestimate-only
  * guarantee, constant size, and the merge property that makes it the
  * per-shard profile format.
  */
class SketchesSpec extends SparkSpec {

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("cms estimates never undercount, and are exact when unsaturated") {
    import spark.implicits._
    val hh = Sketches.cmsHeavyHitters(docs, depth = 4, width = 1024,
      topK = 20).cache()
    try {
      assert(hh.count() === 20)
      assert(hh.filter(col("est_n") < col("exact_n")).isEmpty,
        "CMS must never underestimate")
      // with width >> vocabulary, no collisions: est == exact
      val vocab = Sketches.cmsTable(docs, depth = 1, width = 1 << 20)
        .count()
      val wide = Sketches.cmsHeavyHitters(docs, depth = 4,
        width = 1 << 20, topK = 20)
      if (vocab < (1 << 18)) // sanity: fixture vocabulary is tiny
        assert(wide.filter(col("est_n") =!= col("exact_n")).isEmpty,
          "unsaturated sketch must be exact")
      // a narrow sketch must actually collide (the estimate degrades)
      val narrow = Sketches.cmsHeavyHitters(docs, depth = 1, width = 4,
        topK = 20)
      assert(narrow.filter(col("est_n") > col("exact_n")).count() > 0,
        "width=4 over a real vocabulary must collide somewhere")
    } finally hh.unpersist()
  }

  test("cms table is bounded by depth x width and merges by cell-sum") {
    import spark.implicits._
    val d = 4; val w = 64
    val whole = Sketches.cmsTable(docs, d, w)
    assert(whole.count() <= d.toLong * w)
    val rows = whole.agg(countDistinct(col("row"))).as[Long].head()
    assert(rows === d.toLong)
    // sketch(A ∪ B) == cellwise sum of sketch(A) + sketch(B)
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 === 1)
    val merged = Sketches.cmsTable(a, d, w)
      .unionByName(Sketches.cmsTable(b, d, w))
      .groupBy("row", "col").agg(sum("cnt").as("cnt"))
    assert(merged.exceptAll(whole).isEmpty &&
      whole.exceptAll(merged).isEmpty,
      "union-merge must equal the whole-corpus sketch")
  }
}
