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
  def fit(sortedFreq: DataFrame): Seq[Fit] = {
    val f: Array[Double] = sortedFreq.collect().map((r: Row) =>
      r.get(0) match {
        case n: java.lang.Number => n.doubleValue()
        case other => other.toString.toDouble
      })
    require(f.nonEmpty, "empty frequency table")
    fitArray(f)
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
}
