package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.DistributionFit

class DistributionFitSpec extends AnyFunSuite {

  test("recovers a zipf curve as best fit") {
    val f = Array.tabulate(200)(i => 1000.0 * math.pow(i + 1.0, -1.3))
    val fits = DistributionFit.fitArray(f)
    val best = fits.find(_.best).get
    // zipf and pareto are the same family (r^-s vs r^-(a+1)) — either
    // may win on exact zipf data; both must fit near-perfectly.
    assert(Set("zipf", "pareto").contains(best.distribution))
    val zipf = fits.find(_.distribution == "zipf").get
    assert(math.abs(zipf.param1 - 1.3) < 0.02)
    assert(zipf.sse < 1e-3)
  }

  test("recovers a poisson-shaped curve as best fit (R:427)") {
    val lam = 30.0
    val lnFact = Array.iterate((1, 0.0), 202) { case (i, a) =>
      (i + 1, a + math.log(i.toDouble)) }.map(_._2)
    val f = Array.tabulate(200) { i =>
      val r = i + 1
      5000.0 * math.exp(r * math.log(lam) - lam - lnFact(r))
    }
    val best = DistributionFit.fitArray(f).find(_.best).get
    assert(best.distribution === "poisson")
    assert(math.abs(best.param1 - lam) < 1.0)
  }

  test("all four families reported with finite sse") {
    val f = Array(100.0, 50.0, 30.0, 10.0, 5.0)
    val fits = DistributionFit.fitArray(f)
    assert(fits.map(_.distribution).toSet ===
      Set("zipf", "pareto", "poisson", "lognormal"))
    assert(fits.forall(x => java.lang.Double.isFinite(x.sse)))
    assert(fits.count(_.best) >= 1)
  }

  test("rank-frequency artifacts: tsv rows + svg with curves and best flag") {
    val f = Array.tabulate(100)(i => 500.0 * math.pow(i + 1.0, -1.1))
    val fits = DistributionFit.fitArray(f)
    val tsv = DistributionFit.rankFrequencyTsv(f, fits)
    val lines = tsv.trim.split("\n")
    assert(lines.length === 101) // header + one row per rank
    assert(lines.head.split("\t").toSeq ===
      Seq("rank", "freq", "fit_zipf", "fit_pareto", "fit_poisson", "fit_lognormal"))
    val svg = DistributionFit.rankFrequencySvg(f, fits)
    assert(svg.startsWith("<svg") && svg.endsWith("</svg>\n"))
    assert(Seq("zipf", "pareto", "poisson", "lognormal")
      .forall(svg.contains), "legend must name every family")
    assert(svg.contains("*BEST*"))
    assert("<polyline".r.findAllIn(svg).size === 4) // one fitted curve each
  }
}
