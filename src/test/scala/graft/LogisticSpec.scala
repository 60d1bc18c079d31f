package graft

import org.apache.spark.sql.functions.when

import graft.operators.{Logistic, TextAnalysis}

/** Semantic tests of the aggregation-only logistic-regression quality
  * classifier: the q227-q229 oracles pin engine parity of the
  * gradient replay; these pin that the trainer LEARNS when signal
  * exists, and that its calibration table reads against the NB
  * reliability table (q214) on the shared held-out protocol.
  */
class LogisticSpec extends SparkSpec {
  import spark.implicits._

  private val pos = Seq("src0", "src1", "src2")
  private val neg = Seq("src3", "src4", "src5")

  test("planted separable classes: LR recovers the decision boundary") {
    // positive sources: long, repetitive documents; negative: short,
    // diverse — cleanly separable in the surface features
    val docs = (0 until 120).map { i =>
      val cls = i % 2
      val src = if (cls == 1) s"src${i % 3}" else s"src${3 + i % 3}"
      val text =
        if (cls == 1) Seq.fill(60)("data data pipeline").mkString(" ")
        else s"short note ${i} unique${i} thing${i}"
      (i.toLong, text, "en", src, text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val scored = Logistic.scores(docs, pos, neg)
      .join(docs.select($"doc_id",
        when($"source".isin(pos: _*), 1L).otherwise(0L).as("cls")), Seq("doc_id"))
      .select($"pred_pos", $"cls").as[(Long, Long)].collect()
    assert(scored.nonEmpty, "held-out bucket must be non-empty")
    val acc = scored.count(r => r._1 == r._2).toDouble / scored.length
    assert(acc >= 0.9,
      s"LR must separate the planted classes, eval accuracy $acc")
  }

  test("weights table: d rows, named features, deterministic") {
    val docs = graft.sources.Tables(spark, "/root/testdata/sf0.001").documents
    val w1 = Logistic.weightsDf(docs, pos, neg)
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(w1.map(_._2).toSeq === Logistic.FeatureNames)
    val w2 = Logistic.weightsDf(docs.repartition(7), pos, neg)
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(w1.toSeq === w2.toSeq, "training must be shard-order invariant")
  }

  test("reliability vs NB: shared protocol, well-formed calibration tables") {
    val docs = graft.sources.Tables(spark, "/root/testdata/sf0.001").documents
    val lr = Logistic.reliability(docs, pos, neg)
      .as[(Long, Long, Long, Long, Long)].collect()
    val nb = TextAnalysis.nbReliability(docs, pos, neg)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(lr.nonEmpty && nb.nonEmpty)
    // same held-out population: both tables bin the b >= 8 docs —
    // LR bins every held-out doc; NB omits zero-token docs (its
    // documented contract), so its total is bounded by LR's
    val lrN = lr.map(_._3).sum
    val nbN = nb.map(_._3).sum
    assert(lrN >= nbN && nbN > 0,
      s"population mismatch: lr=$lrN nb=$nbN")
    // well-formed: rates in [0, 1e6], n_pos <= n_docs, exact ratio
    (lr ++ nb).foreach { case (_, _, n, p, rate) =>
      assert(p >= 0 && p <= n)
      assert(rate === p * 1000000L / n, "rate must be the exact ratio")
    }
    // bins ascend with the margin/llr lower bound
    assert(lr.sortBy(_._1).map(_._2).toSeq ===
      lr.map(_._2).sorted.toSeq)
  }
}
