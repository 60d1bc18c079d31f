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
  * TWO feature vectors ship:
  *  - [[features]] — 5 surface features of the normalized text
  *    (q227-q229's original gate; the fixture's surface signal is
  *    weak, so these gate the training MECHANISM);
  *  - [[featuresExtended]] — the surface features PLUS the engine's
  *    own quality signals as integer features: the bigram-LM
  *    perplexity micro-nats (q198's signal), the Gopher rule passes
  *    (q77), and the duplicated-span token percent (q111) — the
  *    composition a real curation pipeline trains its filter on
  *    (q238-q240's gate), and the one with predictive teeth
  *    (LogisticSpec pins the held-out accuracy win over the
  *    surface-only vector under the shared protocol).
  *
  * Exactness discipline: features are small nonnegative INTEGERS
  * (capped counts and integer ratios), weights are micro-unit
  * BIGINTs, margins are exact integer dot products, and the only
  * transcendental per step is the sigmoid — computed as
  * `floor(1e6 / (1 + exp(−margin/1e6)))` on an exact-integer-derived
  * double, the NB/LM family's floor-through-double spelling — so the
  * DuckDB oracle (q227-q229, q238-q240) replays the entire fixed-step
  * training bit-for-bit.
  *
  * Scale: per step, what moves is one aggregate of d partial sums
  * (map-side combined) — never rows; the weight vector rides back as
  * literals. steps × O(corpus) scans total, corpus text read once
  * into the persisted feature table; the extended signals are three
  * more single-scan signal tables joined once on doc_id before
  * training starts.
  */
object Logistic {

  private def $(name: String): Column = col(name)

  /** Gradient steps — fixed so the oracle can unroll them. */
  val Steps = 32

  /** Per-step learning-rate divisor: w −= floor(g / (n·LrDiv)).
    * Calibrated to the feature scale (values ≤ 100) on the held-out
    * protocol: (32 steps, 200) reaches the best eval accuracy on the
    * fixture family. Both vectors keep every feature on the same
    * ≤ 100 integer scale, so one divisor serves both.
    */
  val LrDiv = 200.0

  /** The surface-feature names in index order (j = 0..4). */
  val FeatureNames: Seq[String] = Seq("bias", "tok_cap", "uniq_cap",
    "len_ratio", "uniq_pct")

  /** [[FeatureNames]] plus the engine-signal features (j = 5..7):
    * capped bigram-LM avg-NLL deci-nats, Gopher rule passes (0..4),
    * duplicated-span token percent.
    */
  val FeatureNamesExtended: Seq[String] =
    FeatureNames ++ Seq("lm_nll", "gopher_ok", "dup_pct")

  /** Number of f* feature columns in a feature table. */
  private def dimOf(feats: DataFrame): Int =
    feats.columns.count(_.matches("f\\d+"))

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

  /** [[features]] extended with the engine's own quality signals,
    * each renormalized to the shared ≤ 100 integer scale:
    *
    *  - f5 = min(avg_nll_micro div 100000, 100) — the doc's average
    *    per-bigram negative log-likelihood under the bigram LM
    *    trained on the POSITIVE sources (q198's model verbatim), in
    *    capped deci-nats; docs with no bigram score 0;
    *  - f6 = Gopher rules passed, 0..4 (q77's four booleans summed);
    *  - f7 = 100·dup_tokens div n_tokens — the duplicated-span token
    *    percent (q111's dup_fraction as an exact integer); docs too
    *    short to window score 0.
    *
    * Three single-scan signal tables left-joined on doc_id; training
    * cost is unchanged (the per-step aggregate just carries 3 more
    * partial sums).
    */
  def featuresExtended(documents: DataFrame, posSources: Seq[String],
      negSources: Seq[String]): DataFrame = {
    val base = features(documents, posSources, negSources)
    val ref = documents.filter($("source").isin(posSources: _*))
    val lm = NgramLm.lmScore(ref, documents)
      .select($("doc_id"), $("avg_nll_micro"))
    val gopher = TextAnalysis.gopherRules(documents)
      .select($("doc_id"),
        ($("ok_word_count").cast("long") + $("ok_word_len").cast("long") +
          $("ok_uniq").cast("long") + $("ok_stop").cast("long"))
          .as("gopher_ok"))
    val spans = SubstringDedup.dupSpanStats(documents)
      .select($("doc_id"),
        expr("(100 * dup_tokens) div n_tokens").cast("long").as("dup_pct"))
    base
      .join(lm, Seq("doc_id"), "left")
      .join(gopher, Seq("doc_id"), "left")
      .join(spans, Seq("doc_id"), "left")
      .select($("doc_id"), $("cls"), $("b"),
        $("f0"), $("f1"), $("f2"), $("f3"), $("f4"),
        least(expr("coalesce(avg_nll_micro, 0) div 100000"), lit(100L))
          .cast("long").as("f5"),
        coalesce($("gopher_ok"), lit(0L)).as("f6"),
        coalesce($("dup_pct"), lit(0L)).as("f7"))
  }

  private def marginExpr(w: Seq[Long]): Column =
    w.indices.map(j => $(s"f$j") * lit(w(j))).reduce(_ + _)

  /** floor(1e6·sigmoid(margin_micro/1e6)) — the shared spelling. */
  private def pMicroExpr(w: Seq[Long]): Column =
    floor(lit(1000000.0) /
      (lit(1.0) + exp(-(marginExpr(w).cast("double") / lit(1000000.0)))))
      .cast("long")

  /** Train the weight vector on the b ≤ 7 bucket: `steps` full-batch
    * gradient steps, each one aggregation (d partial sums) + a d-row
    * driver update. The dimension is read off the feature table's
    * f* columns. Returns the micro-unit weights in feature order.
    */
  def trainWeights(feats: DataFrame, steps: Int = Steps): Seq[Long] = {
    val d = dimOf(feats)
    require(d >= 1, "feature table has no f* columns")
    val train = feats.filter($("b") <= 7)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = train.count()
    require(n > 0, "empty training bucket")
    var w = Seq.fill(d)(0L)
    for (_ <- 1 to steps) {
      val resid = (pMicroExpr(w) - $("cls") * lit(1000000L))
        .cast("long").as("resid")
      val sums = (0 until d).map(j =>
        sum($("resid") * $(s"f$j")).cast("long").as(s"g$j"))
      val g = train.select((resid +: (0 until d).map(j => $(s"f$j"))): _*)
        .agg(sums.head, sums.tail: _*)
        .head()
      w = w.zipWithIndex.map { case (wj, j) =>
        wj - math.floor(g.getLong(j).toDouble / (n.toDouble * LrDiv)).toLong
      }
    }
    train.unpersist(false)
    w
  }

  /** The trained model as a persistable artifact: (j, feature,
    * w_micro) — d rows. Pass the feature table and its names
    * (surface or extended).
    */
  def weightsDfFor(feats: DataFrame, names: Seq[String],
      steps: Int = Steps): DataFrame = {
    val spark = feats.sparkSession
    import spark.implicits._
    val w = trainWeights(feats, steps)
    require(w.length == names.length,
      s"${w.length} weights for ${names.length} names")
    w.zipWithIndex.map { case (wj, j) => (j.toLong, names(j), wj) }
      .toDF("j", "feature", "w_micro")
  }

  def weightsDf(documents: DataFrame, posSources: Seq[String],
      negSources: Seq[String], steps: Int = Steps): DataFrame =
    weightsDfFor(features(documents, posSources, negSources),
      FeatureNames, steps)

  /** [[weightsDf]] on the engine-signal vector (q238). */
  def weightsDfExtended(documents: DataFrame, posSources: Seq[String],
      negSources: Seq[String], steps: Int = Steps): DataFrame =
    weightsDfFor(featuresExtended(documents, posSources, negSources),
      FeatureNamesExtended, steps)

  /** Held-out scoring (b ≥ 8) under weights trained on b ≤ 7:
    * (doc_id, margin_micro, p_micro, pred_pos) — the discriminative
    * twin of the q157/q214 held-out NB protocol.
    */
  def scoresFor(feats: DataFrame, steps: Int = Steps): DataFrame = {
    val pinned = feats.localCheckpoint(true)
    val w = trainWeights(pinned, steps)
    pinned.filter($("b") >= 8)
      .select($("doc_id"), marginExpr(w).cast("long").as("margin_micro"),
        pMicroExpr(w).as("p_micro"))
      .withColumn("pred_pos",
        when($("margin_micro") > 0, 1L).otherwise(0L))
  }

  def scores(documents: DataFrame, posSources: Seq[String],
      negSources: Seq[String], steps: Int = Steps): DataFrame =
    scoresFor(features(documents, posSources, negSources), steps)

  /** [[scores]] on the engine-signal vector (q239). */
  def scoresExtended(documents: DataFrame, posSources: Seq[String],
      negSources: Seq[String], steps: Int = Steps): DataFrame =
    scoresFor(featuresExtended(documents, posSources, negSources), steps)

  /** Reliability table over the held-out margins — q214's protocol
    * (bin = floor(margin/binWidth) through double, per-bin empirical
    * positive rate) so the LR calibration reads against the NB
    * table directly.
    */
  def reliabilityFor(feats: DataFrame, steps: Int = Steps,
      binWidthMicro: Long = 200000L): DataFrame = {
    require(binWidthMicro > 0, s"binWidthMicro=$binWidthMicro must be > 0")
    val pinned = feats.localCheckpoint(true)
    val w = trainWeights(pinned, steps)
    pinned.filter($("b") >= 8)
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

  def reliability(documents: DataFrame, posSources: Seq[String],
      negSources: Seq[String], steps: Int = Steps,
      binWidthMicro: Long = 200000L): DataFrame =
    reliabilityFor(features(documents, posSources, negSources), steps,
      binWidthMicro)

  /** [[reliability]] on the engine-signal vector (q240). */
  def reliabilityExtended(documents: DataFrame, posSources: Seq[String],
      negSources: Seq[String], steps: Int = Steps,
      binWidthMicro: Long = 200000L): DataFrame =
    reliabilityFor(featuresExtended(documents, posSources, negSources),
      steps, binWidthMicro)
}
