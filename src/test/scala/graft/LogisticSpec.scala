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

  /** Held-out accuracy of a scores table against the source labels. */
  private def accOf(scored: org.apache.spark.sql.DataFrame,
      docs: org.apache.spark.sql.DataFrame): Double = {
    val rows = scored
      .join(docs.select($"doc_id",
        when($"source".isin(pos: _*), 1L).otherwise(0L).as("cls")),
        Seq("doc_id"))
      .select($"pred_pos", $"cls").as[(Long, Long)].collect()
    assert(rows.nonEmpty, "held-out bucket must be non-empty")
    rows.count(r => r._1 == r._2).toDouble / rows.length
  }

  test("engine-signal features separate where surface features and NB cannot") {
    // both classes use the SAME 40-token vocabulary with the SAME
    // per-doc token multiset: n_tok, n_uniq, n_chars identical -> the
    // surface vector carries zero signal, and the NB token model
    // (order-blind) carries zero signal. Positives emit the tokens in
    // the canonical chain order (shared bigrams); negatives in a
    // stride-7 permutation (bigrams unseen by the LM trained on the
    // positive sources) -> only the extended vector's f5 (bigram-LM
    // NLL) separates. This is the predictive-teeth pin: the engine's
    // own signals rescue a case both baselines fail.
    val vocab = (0 until 40).map(i => f"tok$i%02d")
    val docs = (0 until 160).map { i =>
      val cls = i % 2
      val src = if (cls == 1) s"src${i % 3}" else s"src${3 + i % 3}"
      val toks =
        if (cls == 1) vocab
        else (0 until 40).map(j => vocab((j * 7) % 40))
      (i.toLong, toks.mkString(" "), "en", src, 40L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val accSurface = accOf(Logistic.scores(docs, pos, neg), docs)
    val accExtended = accOf(Logistic.scoresExtended(docs, pos, neg), docs)
    // NB under the shared protocol: held-out confusion matrix
    val nb = TextAnalysis.nbClassifierEval(docs, pos, neg)
      .as[(Long, Long, Long)].collect()
    val nbAcc = nb.filter(r => r._1 == r._2).map(_._3).sum.toDouble /
      math.max(1L, nb.map(_._3).sum)
    assert(accExtended >= 0.9,
      s"extended vector must separate the order classes: $accExtended")
    assert(accExtended >= accSurface + 0.25,
      s"extended must beat surface: ext=$accExtended surf=$accSurface")
    assert(accExtended >= nbAcc + 0.25,
      s"extended must beat order-blind NB: ext=$accExtended nb=$nbAcc")
  }

  test("extended vector never regresses the surface vector on the real fixture") {
    val docs = graft.sources.Tables(spark, "/root/testdata/sf0.001").documents
    val accSurface = accOf(Logistic.scores(docs, pos, neg), docs)
    val accExtended = accOf(Logistic.scoresExtended(docs, pos, neg), docs)
    assert(accExtended >= accSurface - 0.02,
      s"extended must not lose signal: ext=$accExtended surf=$accSurface")
    // extended reliability table: same q214 protocol shape as NB's
    val rel = Logistic.reliabilityExtended(docs, pos, neg)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rel.nonEmpty)
    rel.foreach { case (_, _, n, p, rate) =>
      assert(p >= 0 && p <= n)
      assert(rate === p * 1000000L / n)
    }
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
