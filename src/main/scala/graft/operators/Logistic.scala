package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.OrderedOut.SmallOrderOps

/** Discriminative quality classifier: logistic regression over a
  * fixed integer feature vector, trained by FULL-BATCH gradient
  * descent where every step is ONE map-side-combined aggregation and
  * a (d+1)-row driver update — the Lloyd-iteration localize pattern
  * applied to a linear model. The NB classifier
  * ([[TextAnalysis.nbScore]]) is generative; this is its
  * discriminative twin, sharing the same source supervision (class 1
  * = `posSources`, class 0 = `negSources`), the same md5 train/eval
  * buckets (b ≤ 7 train, b ≥ 8 eval), and the same reliability-table
  * protocol (q214) — so the two calibrations compare directly.
  *
  * Exactness discipline: features are small nonnegative INTEGERS
  * (capped counts and integer ratios of the normalized text), weights
  * are micro-unit BIGINTs, margins are exact integer dot products,
  * and the only transcendental per step is the sigmoid — computed as
  * `floor(1e6 / (1 + exp(−margin/1e6)))` on an exact-integer-derived
  * double, the NB/LM family's floor-through-double spelling — so the
  * DuckDB oracle (q227-q229) replays the entire fixed-step training
  * bit-for-bit.
  *
  * Scale: per step, what moves is one aggregate of d partial sums
  * (map-side combined) — never rows; the weight vector rides back as
  * literals. steps × O(corpus) scans total, corpus text read once
  * into the persisted feature table.
  */
object Logistic {

  private def $(name: String): Column = col(name)

  /** Gradient steps — fixed so the oracle can unroll them. */
  val Steps = 32

  /** Per-step learning-rate divisor: w −= floor(g / (n·LrDiv)).
    * Calibrated to the feature scale (values ≤ 100) on the held-out
    * protocol: (32 steps, 200) reaches the best eval accuracy on the
    * fixture family — the synthetic source classes carry weak
    * surface signal (NB's token model lands at the same level), so
    * the gate here is the exact training mechanism and calibration
    * table, not fixture separability.
    */
  val LrDiv = 200.0

  /** The feature names in index order (j = 0..4). */
  val FeatureNames: Seq[String] = Seq("bias", "tok_cap", "uniq_cap",
    "len_ratio", "uniq_pct")

  /** Integer quality features per labeled doc: (doc_id, cls, b,
    * f0..f4) with f0 = 1 (bias), f1 = min(n_tok, 100), f2 =
    * min(n_uniq, 100), f3 = min(n_chars div max(n_tok,1), 20) (mean
    * token length incl. separators), f4 = 100·n_uniq div
    * max(n_tok,1) (type/token percent). All from the normalized
    * text in one scan.
    */
  def features(documents: DataFrame, posSources: Seq[String],
      negSources: Seq[String]): DataFrame = {
    require(posSources.nonEmpty && negSources.nonEmpty,
      "need at least one source per class")
    val n = TextAnalysis.normText($("text"))
    val toks = when(length(n) === 0, typedlit(Seq.empty[String]))
      .otherwise(split(n, " "))
    documents.spread()
      .filter($("source").isin((posSources ++ negSources): _*))
      .select($("doc_id"),
        when($("source").isin(posSources: _*), 1L).otherwise(0L).as("cls"),
        Curation.hashBucket($("doc_id"), 10).as("b"),
        size(toks).cast("long").as("n_tok"),
        size(array_distinct(toks)).cast("long").as("n_uniq"),
        length(n).cast("long").as("n_chars"))
      .select($("doc_id"), $("cls"), $("b"),
        lit(1L).as("f0"),
        least($("n_tok"), lit(100L)).as("f1"),
        least($("n_uniq"), lit(100L)).as("f2"),
        least(expr("n_chars div greatest(n_tok, 1)"), lit(20L))
          .cast("long").as("f3"),
        expr("(100 * n_uniq) div greatest(n_tok, 1)").cast("long").as("f4"))
  }

  private def marginExpr(w: Seq[Long]): Column =
    (0 until 5).map(j => $(s"f$j") * lit(w(j))).reduce(_ + _)

  /** floor(1e6·sigmoid(margin_micro/1e6)) — the shared spelling. */
  private def pMicroExpr(w: Seq[Long]): Column =
    floor(lit(1000000.0) /
      (lit(1.0) + exp(-(marginExpr(w).cast("double") / lit(1000000.0)))))
      .cast("long")

  /** Train the weight vector on the b ≤ 7 bucket: `steps` full-batch
    * gradient steps, each one aggregation (d partial sums) + a d-row
    * driver update. Returns the micro-unit weights in feature order.
    */
  def trainWeights(feats: DataFrame, steps: Int = Steps): Seq[Long] = {
    val spark = feats.sparkSession
    import spark.implicits._
    val train = feats.filter($("b") <= 7)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = train.count()
    require(n > 0, "empty training bucket")
    var w = Seq.fill(5)(0L)
    for (_ <- 1 to steps) {
      val resid = (pMicroExpr(w) - $("cls") * lit(1000000L)).as("resid")
      val g = train.select($("doc_id"), resid.cast("long").as("resid"),
          $("f0"), $("f1"), $("f2"), $("f3"), $("f4"))
        .agg(
          sum($("resid") * $("f0")).cast("long"),
          sum($("resid") * $("f1")).cast("long"),
          sum($("resid") * $("f2")).cast("long"),
          sum($("resid") * $("f3")).cast("long"),
          sum($("resid") * $("f4")).cast("long"))
        .as[(Long, Long, Long, Long, Long)].head()
      val gs = Seq(g._1, g._2, g._3, g._4, g._5)
      w = w.zip(gs).map { case (wj, gj) =>
        wj - math.floor(gj.toDouble / (n.toDouble * LrDiv)).toLong
      }
    }
    train.unpersist(false)
    w
  }

  /** The trained model as a persistable artifact: (j, feature,
    * w_micro) — d rows.
    */
  def weightsDf(documents: DataFrame, posSources: Seq[String],
      negSources: Seq[String], steps: Int = Steps): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val w = trainWeights(features(documents, posSources, negSources), steps)
    w.zipWithIndex.map { case (wj, j) =>
      (j.toLong, FeatureNames(j), wj) }
      .toDF("j", "feature", "w_micro")
  }

  /** Held-out scoring (b ≥ 8) under weights trained on b ≤ 7:
    * (doc_id, margin_micro, p_micro, pred_pos) — the discriminative
    * twin of the q157/q214 held-out NB protocol.
    */
  def scores(documents: DataFrame, posSources: Seq[String],
      negSources: Seq[String], steps: Int = Steps): DataFrame = {
    val feats = features(documents, posSources, negSources)
      .localCheckpoint(true)
    val w = trainWeights(feats, steps)
    feats.filter($("b") >= 8)
      .select($("doc_id"), marginExpr(w).cast("long").as("margin_micro"),
        pMicroExpr(w).as("p_micro"))
      .withColumn("pred_pos",
        when($("margin_micro") > 0, 1L).otherwise(0L))
  }

  /** Reliability table over the held-out margins — q214's protocol
    * (bin = floor(margin/binWidth) through double, per-bin empirical
    * positive rate) so the LR calibration reads against the NB
    * table directly.
    */
  def reliability(documents: DataFrame, posSources: Seq[String],
      negSources: Seq[String], steps: Int = Steps,
      binWidthMicro: Long = 200000L): DataFrame = {
    require(binWidthMicro > 0, s"binWidthMicro=$binWidthMicro must be > 0")
    val feats = features(documents, posSources, negSources)
      .localCheckpoint(true)
    val w = trainWeights(feats, steps)
    feats.filter($("b") >= 8)
      .select($("doc_id"), $("cls"),
        marginExpr(w).cast("long").as("margin_micro"))
      .withColumn("bin",
        floor($("margin_micro").cast("double") /
          lit(binWidthMicro.toDouble)).cast("long"))
      .groupBy($("bin"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum($("cls")).cast("long").as("n_pos"))
      .select($("bin"), ($("bin") * binWidthMicro).as("margin_lo_micro"),
        $("n_docs"), $("n_pos"),
        expr("n_pos * 1000000 div n_docs").cast("long").as("pos_rate_micro"))
  }
}
