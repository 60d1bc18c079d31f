package graft.analytics

import org.apache.spark.sql.{DataFrame, Row}

/** Driver-side distribution fitting (R:403-430): the reference's
  * `zipf.py` fits zipf / poisson / lognormal / pareto curves to the
  * airport rank–frequency table with `scipy.optimize.curve_fit` and
  * concludes Poisson fits best (R:427).
  *
  * This is the one genuinely non-relational operator (SURVEY.md §2.10):
  * its input is the already-aggregated rank–frequency table — a few
  * thousand rows regardless of raw data size — so a driver-side
  * `.collect()` is the CORRECT scale decision, not a compromise.
  *
  * Method: for each candidate family, the curve is `a * g(r; θ)` with
  * shape θ grid-searched (then refined) and the scale `a` solved in
  * closed form per θ (linear least squares: a = Σf·g / Σg²).
  */
object DistributionFit {

  final case class Fit(distribution: String, param1: Double,
      param2: Double, scale: Double, sse: Double, best: Boolean)

  /** Fit all four families to a frequency column sorted descending
    * (rank = row index + 1). Input: one numeric column of frequencies.
    */
  def fit(sortedFreq: DataFrame): Seq[Fit] = fitArray(collectFreq(sortedFreq))

  /** The single driver-side collect: first column of the (small)
    * sorted-frequency table as doubles.
    */
  private def collectFreq(sortedFreq: DataFrame): Array[Double] = {
    val f: Array[Double] = sortedFreq.collect().map((r: Row) =>
      r.get(0) match {
        case n: java.lang.Number => n.doubleValue()
        case other => other.toString.toDouble
      })
    require(f.nonEmpty, "empty frequency table")
    f
  }

  def fitArray(f: Array[Double]): Seq[Fit] = {
    val n = f.length
    val ranks = Array.tabulate(n)(i => (i + 1).toDouble)
    // ln(r!) table via cumulative sum — exact enough for n ≤ ~1e6.
    val lnFact = new Array[Double](n + 2)
    var acc = 0.0
    var i = 1
    while (i <= n + 1) { acc += math.log(i.toDouble); lnFact(i) = acc; i += 1 }

    def sseFor(g: Array[Double]): (Double, Double) = {
      var num = 0.0; var den = 0.0
      var j = 0
      while (j < n) { num += f(j) * g(j); den += g(j) * g(j); j += 1 }
      val a = if (den == 0.0) 0.0 else num / den
      var sse = 0.0
      j = 0
      while (j < n) { val d = f(j) - a * g(j); sse += d * d; j += 1 }
      (a, sse)
    }

    def bestOver(params: Seq[(Double, Double)],
        g: (Double, Double) => Array[Double]): (Double, Double, Double, Double) =
      params.map { case (p1, p2) =>
        val (a, sse) = sseFor(g(p1, p2))
        (p1, p2, a, sse)
      }.minBy(_._4)

    def refine1(lo: Double, hi: Double, steps: Int, rounds: Int,
        g: Double => Array[Double]): (Double, Double, Double) = {
      var (l, h) = (lo, hi)
      var best = (l, 0.0, Double.MaxValue)
      for (_ <- 0 until rounds) {
        val grid = (0 to steps).map(k => l + (h - l) * k / steps)
        val (p, _, a, sse) = bestOver(grid.map((_, 0.0)), (p1, _) => g(p1))
        best = (p, a, sse)
        val w = (h - l) / steps
        l = math.max(lo, p - w); h = math.min(hi, p + w)
      }
      best
    }

    val zipfG = (s: Double) => ranks.map(r => math.pow(r, -s))
    val (zS, zA, zSse) = refine1(0.05, 6.0, 40, 4, zipfG)

    val paretoG = (al: Double) => ranks.map(r => math.pow(r, -(al + 1.0)))
    val (pAl, pA, pSse) = refine1(0.01, 5.0, 40, 4, paretoG)

    val poisG = (lam: Double) => Array.tabulate(n) { j =>
      val r = j + 1
      math.exp(r * math.log(lam) - lam - lnFact(r))
    }
    val maxLam = math.max(4.0, n.toDouble)
    val (poLam, poA, poSse) = refine1(0.1, maxLam, 60, 5, poisG)

    val logn = (mu: Double, sig: Double) => ranks.map { r =>
      val z = (math.log(r) - mu) / sig
      math.exp(-0.5 * z * z) / r
    }
    def grid(lo: Double, hi: Double, step: Double): Seq[Double] =
      Iterator.iterate(lo)(_ + step).takeWhile(_ <= hi + step / 2).toSeq
    val coarse = for (m <- grid(-2.0, 8.0, 0.5); s <- grid(0.1, 4.0, 0.2))
      yield (m, s)
    val (lMu0, lSig0, _, _) = bestOver(coarse, logn)
    val fineG = for {
      m <- grid(lMu0 - 0.5, lMu0 + 0.5, 0.05)
      s <- grid(math.max(0.05, lSig0 - 0.2), lSig0 + 0.2, 0.02)
    } yield (m, s)
    val (lMu, lSig, lA, lSse) = bestOver(fineG, logn)

    val fits = Seq(
      Fit("zipf", zS, 0.0, zA, zSse, best = false),
      Fit("pareto", pAl, 0.0, pA, pSse, best = false),
      Fit("poisson", poLam, 0.0, poA, poSse, best = false),
      Fit("lognormal", lMu, lSig, lA, lSse, best = false))
    val minSse = fits.map(_.sse).min
    fits.map(x => x.copy(best = x.sse == minSse))
  }

  /** Fitted curve values a·g(r; θ) at ranks 1..n for one family. */
  def predictAll(fit: Fit, n: Int): Array[Double] = {
    val lnFact = new Array[Double](n + 2)
    var acc = 0.0
    var i = 1
    while (i <= n + 1) { acc += math.log(i.toDouble); lnFact(i) = acc; i += 1 }
    Array.tabulate(n) { j =>
      val r = (j + 1).toDouble
      fit.distribution match {
        case "zipf"    => fit.scale * math.pow(r, -fit.param1)
        case "pareto"  => fit.scale * math.pow(r, -(fit.param1 + 1.0))
        case "poisson" => fit.scale *
          math.exp((j + 1) * math.log(fit.param1) - fit.param1 - lnFact(j + 1))
        case "lognormal" =>
          val z = (math.log(r) - fit.param1) / fit.param2
          fit.scale * math.exp(-0.5 * z * z) / r
        case other => throw new IllegalArgumentException(other)
      }
    }
  }

  /** Rank–frequency table with each family's fitted curve (the data
    * behind the reference's zipf.py log-log plot, R:409-427).
    */
  def rankFrequencyTsv(f: Array[Double], fits: Seq[Fit]): String = {
    val curves = fits.map(x => x.distribution -> predictAll(x, f.length))
    val header = (Seq("rank", "freq") ++ curves.map("fit_" + _._1)).mkString("\t")
    val rows = f.indices.map { j =>
      (Seq((j + 1).toString, f(j).toString) ++
        curves.map { case (_, c) => f"${c(j)}%.6f" }).mkString("\t")
    }
    (header +: rows).mkString("", "\n", "\n")
  }

  /** Self-contained SVG log-log plot: empirical rank–frequency points
    * plus the four fitted curves, best fit solid and labeled with its
    * parameters — the artifact analogue of zipf.py's Matplotlib
    * output (R:409-427; matplotlib is not in this environment, SVG
    * needs nothing).
    */
  def rankFrequencySvg(f: Array[Double], fits: Seq[Fit]): String = {
    val n = f.length
    val (w, h, mL, mB, mT, mR) = (640.0, 480.0, 60.0, 40.0, 30.0, 150.0)
    val xMax = math.max(math.log10(n.toDouble), 0.301)
    val pos = f.filter(_ > 0)
    val yMin = math.log10(math.max(pos.minOption.getOrElse(1.0), 1e-3))
    val yMax = math.log10(math.max(pos.maxOption.getOrElse(1.0), 1.0)) + 0.05
    def px(r: Double) = mL + (math.log10(r) / xMax) * (w - mL - mR)
    def py(v: Double) = h - mB -
      ((math.log10(v) - yMin) / (yMax - yMin)) * (h - mB - mT)
    val colors = Map("zipf" -> "#d62728", "pareto" -> "#2ca02c",
      "poisson" -> "#1f77b4", "lognormal" -> "#9467bd")
    val sb = new StringBuilder
    sb ++= s"""<svg xmlns="http://www.w3.org/2000/svg" width="${w.toInt}" height="${h.toInt}" font-family="monospace" font-size="11">
      |<rect width="100%" height="100%" fill="white"/>
      |<line x1="$mL" y1="${h - mB}" x2="${w - mR}" y2="${h - mB}" stroke="black"/>
      |<line x1="$mL" y1="$mT" x2="$mL" y2="${h - mB}" stroke="black"/>
      |<text x="${(w - mR + mL) / 2}" y="${h - 8}" text-anchor="middle">rank (log)</text>
      |<text x="14" y="${(h - mB + mT) / 2}" text-anchor="middle" transform="rotate(-90 14 ${(h - mB + mT) / 2})">frequency (log)</text>
      |""".stripMargin
    // decade ticks
    (0 to xMax.toInt).foreach { d =>
      val x = px(math.pow(10, d))
      sb ++= s"""<line x1="$x" y1="${h - mB}" x2="$x" y2="${h - mB + 4}" stroke="black"/>"""
      sb ++= s"""<text x="$x" y="${h - mB + 16}" text-anchor="middle">1e$d</text>\n"""
    }
    (math.ceil(yMin).toInt to yMax.toInt).foreach { d =>
      val y = py(math.pow(10, d))
      sb ++= s"""<line x1="${mL - 4}" y1="$y" x2="$mL" y2="$y" stroke="black"/>"""
      sb ++= s"""<text x="${mL - 8}" y="${y + 4}" text-anchor="end">1e$d</text>\n"""
    }
    // fitted curves
    fits.foreach { fit =>
      val c = predictAll(fit, n)
      val pts = (0 until n).filter(j => c(j) > 0 && math.log10(c(j)) >= yMin - 0.5)
        .map(j => f"${px(j + 1.0)}%.1f,${py(c(j))}%.1f").mkString(" ")
      val dash = if (fit.best) "" else """ stroke-dasharray="4 3""""
      sb ++= s"""<polyline points="$pts" fill="none" stroke="${colors(fit.distribution)}" stroke-width="${if (fit.best) 2 else 1}"$dash/>\n"""
    }
    // empirical points on top
    f.indices.foreach { j =>
      if (f(j) > 0)
        sb ++= s"""<circle cx="${px(j + 1.0)}" cy="${py(f(j))}" r="2" fill="black"/>"""
    }
    // legend with params + SSE, best flagged
    fits.zipWithIndex.foreach { case (fit, i) =>
      val y = mT + 14 + i * 14
      val mark = if (fit.best) " *BEST*" else ""
      val p = if (fit.distribution == "lognormal")
        f"μ=${fit.param1}%.2f σ=${fit.param2}%.2f" else f"θ=${fit.param1}%.2f"
      sb ++= s"""<line x1="${w - mR + 6}" y1="${y - 4}" x2="${w - mR + 26}" y2="${y - 4}" stroke="${colors(fit.distribution)}" stroke-width="2"/>"""
      sb ++= s"""<text x="${w - mR + 30}" y="$y">${fit.distribution} $p sse=${f"${fit.sse}%.3g"}$mark</text>\n"""
    }
    sb ++= "</svg>\n"
    sb.toString
  }

  /** Distributed rank–frequency table from a (key, cnt) count table:
    * one row per DISTINCT frequency value — (cnt, n_keys, rank_start),
    * where ranks rank_start .. rank_start+n_keys-1 all have frequency
    * cnt. This is the whole-corpus rank–frequency curve in run-length
    * form, computable without ever ranking individual keys.
    *
    * Scale: the groupBy(cnt) partial-aggregates map-side; the window
    * then runs over the AGGREGATED table, whose cardinality is the
    * number of distinct frequency values — a few thousand rows for
    * zipf-shaped data regardless of corpus size — so the unpartitioned
    * running sum is a deliberate tiny-table exchange (same argument as
    * [[collectFreq]]'s driver-side collect), not a scale funnel. A
    * per-key global row_number would be the wrong plan here: it would
    * sort all N keys through one partition.
    */
  def rankTable(keyCounts: DataFrame): DataFrame =
    rankTableBy(keyCounts, Nil)

  /** [[rankTable]] per group: ranks restart within each `groups`
    * combination (e.g. a rank table per source). The running sum's
    * window partitions on the group columns, so each group's
    * frequency spectrum is the same tiny-table exchange as the global
    * form — groups add parallelism, not funnel width.
    */
  def rankTableBy(keyCounts: DataFrame, groups: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val gcols = groups.map(col)
    val fr = keyCounts.groupBy(gcols :+ col("cnt"): _*)
      .agg(count(lit(1)).as("n_keys"))
    val w = Window.partitionBy(gcols: _*).orderBy(col("cnt").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    fr.select(gcols ++ Seq(col("cnt"), col("n_keys"),
      (coalesce(sum(col("n_keys")).over(w), lit(0L)) + lit(1L))
        .cast("long").as("rank_start")): _*)
  }

  /** The fixed (family, p1, p2) parameter grid of [[gridFitSse]] —
    * shared verbatim by the Spark plan and the DuckDB oracle SQL
    * ([[gridParamsSqlValues]] renders these same doubles, and
    * `Double.toString` round-trips, so both engines evaluate the
    * identical binary64 parameters).
    */
  val gridParams: Seq[(String, Double, Double)] = {
    val zipf    = (1 to 15).map(i => ("zipf", i * 0.2, 0.0))
    val pareto  = (1 to 15).map(i => ("pareto", i * 0.2, 0.0))
    val poisson = Seq(1L, 2L, 4L, 8L, 16L, 32L, 64L, 128L, 256L, 512L,
      1024L, 2048L).map(l => ("poisson", l.toDouble, 0.0))
    val logn = for (m <- 0 to 6; s <- 1 to 6)
      yield ("lognormal", m.toDouble, s * 0.5)
    zipf ++ pareto ++ poisson ++ logn
  }

  /** `VALUES` rows of [[gridParams]] for the oracle SQL. */
  def gridParamsSqlValues: String =
    gridParams.map { case (f, p1, p2) => s"('$f', $p1, $p2)" }.mkString(",\n    ")

  /** Oracle-gateable distributed grid fit (the §2.10 curve fit as a
    * DataFrame): for each family and each fixed grid parameter, the
    * least-squares scale has the closed form a = Σf·g/Σg², so the SSE
    * folds in ONE pass over the expanded rank table:
    * SSE = Σf² − (Σf·g)²/Σg². Per family the min-SSE row wins
    * (tiebreak p1, p2 asc).
    *
    * Engine portability: the grid doubles are bit-shared (see
    * [[gridParams]]); ln r! uses Stirling's series — a pure per-row
    * expression both engines evaluate with the same formula, instead
    * of a cumulative-sum window (which would funnel all ranks through
    * one partition) or lgamma (absent from Spark SQL); and the output
    * SSE is reported as round(ln(sse), 6) — log-space rounding
    * absorbs the sub-ulp libm (pow/exp) and summation-order drift
    * between Spark and DuckDB while still pinning the fit to one part
    * in 10⁶.
    *
    * Scale: rank expansion is a narrow per-run explode (rows =
    * distinct keys), the param grid (84 rows) is broadcast, the
    * aggregation partial-combines map-side, and nothing else shuffles
    * — the plan survives an arbitrary corpus because its input is the
    * already-aggregated rank table.
    */
  def gridFitSse(rankTable: DataFrame): DataFrame =
    gridFitSseBy(rankTable, Nil)

  /** [[gridFitSse]] per group (input from [[rankTableBy]]): one
    * argmin fit per (group × family) — the per-source distribution
    * drift report a corpus QA pass reads (a source whose token
    * spectrum stops looking zipfian is usually machine-generated or
    * truncated). Same plan shape; `groups` ride the aggregation keys
    * and the argmin window partition.
    */
  def gridFitSseBy(rankTable: DataFrame, groups: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val spark = rankTable.sparkSession
    import spark.implicits._
    val gcols = groups.map(col)

    val ranks = rankTable
      .select(gcols ++ Seq(col("cnt").cast("double").as("f"), col("rank_start"),
        explode(sequence(lit(0L), col("n_keys").cast("long") - 1L)).as("i")): _*)
      .select(gcols ++ Seq(col("f"),
        (col("rank_start") + col("i")).cast("double").as("rd")): _*)

    val params = broadcast(gridParams.toDF("family", "p1", "p2"))

    val rd = col("rd")
    // Stirling: ln r! = r·ln r − r + ln(2πr)/2 + 1/(12r) − 1/(360r³)
    val lnFact = rd * log(rd) - rd +
      lit(0.5) * log(lit(2.0) * lit(3.141592653589793) * rd) +
      lit(1.0) / (lit(12.0) * rd) -
      lit(1.0) / (lit(360.0) * rd * rd * rd)
    val g = when(col("family") === "zipf", pow(rd, -col("p1")))
      .when(col("family") === "pareto", pow(rd, -(col("p1") + lit(1.0))))
      .when(col("family") === "poisson",
        exp(rd * log(col("p1")) - col("p1") - lnFact))
      .otherwise(
        exp(lit(-0.5) * pow((log(rd) - col("p1")) / col("p2"), 2)) / rd)

    // Σf² is constant across params but folding it per group costs one
    // extra multiply-add in the same pass — far cheaper than deriving
    // the rank table a second time for a scalar crossJoin
    val agg = ranks.crossJoin(params)
      .select(gcols ++ Seq(col("family"), col("p1"), col("p2"), col("f"),
        g.as("g")): _*)
      .groupBy(gcols ++ Seq(col("family"), col("p1"), col("p2")): _*)
      .agg(sum(col("f") * col("g")).as("num"), sum(col("g") * col("g")).as("den"),
        sum(col("f") * col("f")).as("sff"))
    val w = Window.partitionBy(gcols :+ col("family"): _*)
      .orderBy(col("s").asc, col("p1").asc, col("p2").asc)
    agg
      .select(gcols ++ Seq(col("family"), col("p1"), col("p2"),
        (col("sff") - when(col("den") > 0.0, col("num") * col("num") / col("den"))
          .otherwise(lit(0.0))).as("s")): _*)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(gcols ++ Seq(col("family").as("distribution"), col("p1"), col("p2"),
        round(log(greatest(col("s"), lit(1e-12))), 6).as("log_sse")): _*)
      .orderBy(gcols :+ col("distribution"): _*)
  }

  /** Per-source token-frequency distribution fit — the corpus-drift
    * QA report: for each source, the best (family, params) over the
    * shared grid. Composes [[rankTableBy]] ∘ per-source token counts
    * ∘ [[gridFitSseBy]]; output is sources × 4 family rows.
    */
  def sourceFit(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.operators.OrderedOut._
    val kc = documents.spread()
      .select(col("source"),
        explode(split(graft.operators.TextAnalysis.normText(col("text")), " "))
          .as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("cnt"))
    gridFitSseBy(rankTableBy(kc, Seq("source")), Seq("source"))
  }

  /** Collect the (small) sorted-frequency column once, fit all
    * families, and write `rank_frequency.tsv` + `rank_frequency.svg`
    * under `dir`. Returns the fits.
    */
  def writeArtifacts(sortedFreq: DataFrame, dir: String): Seq[Fit] = {
    val f = collectFreq(sortedFreq)
    val fits = fitArray(f)
    val d = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(d)
    java.nio.file.Files.writeString(d.resolve("rank_frequency.tsv"),
      rankFrequencyTsv(f, fits))
    java.nio.file.Files.writeString(d.resolve("rank_frequency.svg"),
      rankFrequencySvg(f, fits))
    fits
  }
}
