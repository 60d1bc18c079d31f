package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.analytics.DistributionFit
import graft.engine.{Ingest, Serving}
import graft.operators.Airline

/** End-to-end drive of the airline pipeline: synthesize a small CSV
  * corpus (reference input shape, FIXTURES.md §A), ingest to the
  * partitioned warehouse, run all eight reference queries, serve one
  * result keyed like the reference's Cassandra table, and fit the
  * traffic distribution. `runMain graft.AirlineDemo [workDir]`.
  */
object AirlineDemo {
  def main(args: Array[String]): Unit = {
    val work = args.headOption.getOrElse(
      Files.createTempDirectory("graft-airline").toString)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-airline-demo")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // --- synthesize a deterministic CSV corpus (seeded) ---------------
    val airports = Seq("ORD", "SFO", "JFK", "SEA", "LAX", "CMI", "BWI", "MIA")
    val carriers = Seq("AA", "UA", "HA", "DL", "WN", "MQ", "OH", "F9")
    val rnd = new scala.util.Random(42)
    val rows = (0 until 20000).map { i =>
      val y = if (rnd.nextInt(4) == 0) 2007 else 2008
      val m = rnd.nextInt(12) + 1
      val d = rnd.nextInt(28) + 1
      val o = airports(rnd.nextInt(airports.size))
      var dst = airports(rnd.nextInt(airports.size))
      val dep = f"${rnd.nextInt(25)}%02d${rnd.nextInt(60)}%02d" // some hour-24 malformed
      val depDelay = rnd.nextInt(120) - 15
      val arrDelay: String =
        if (rnd.nextInt(50) == 0) "" else (depDelay + rnd.nextInt(40) - 20).toString
      f"$y%04d-$m%02d-$d%02d,${carriers(rnd.nextInt(carriers.size))},${1000 + i % 500},$o,$dst,$dep,$depDelay,$arrDelay"
    }
    val csvDir = s"$work/csv"
    new java.io.File(csvDir).mkdirs()
    Files.write(java.nio.file.Paths.get(s"$csvDir/ontime.csv"),
      ("FlightDate,UniqueCarrier,FlightNum,Origin,Dest,DepTime,DepDelay,ArrDelay\n" +
        rows.mkString("\n")).getBytes)

    // --- ingest: CSV -> partitioned parquet warehouse -----------------
    val raw = Ingest.readCsv(spark, csvDir)
    Ingest.writeWarehouse(raw, s"$work/warehouse")
    val flights = Ingest.readWarehouse(spark, s"$work/warehouse")
    println(s"[demo] warehouse rows: ${flights.count()}")

    // --- the eight queries -------------------------------------------
    println("[demo] G1Q1 top10 airports:")
    Airline.top10Airports(flights).show(10, truncate = false)
    println("[demo] G1Q2 top10 airlines by on-time arrival:")
    Airline.top10AirlinesOnTime(flights).show(10, truncate = false)
    println("[demo] G2Q1 carriers per airport (CMI sample):")
    Airline.top10CarriersPerAirport(flights)
      .filter(col("Origin") === "CMI").show(10, truncate = false)
    println("[demo] G2Q2 dests per airport (sample):")
    Airline.top10DestPerAirport(flights).show(5, truncate = false)
    println("[demo] G2Q3 carriers per route (sample):")
    Airline.top10CarriersPerRoute(flights).show(5, truncate = false)

    // --- G2Q1 served keyed by (airport, carrier) like Cassandra ------
    val servingPath = s"$work/serving/airportcarrierdepdelay"
    Serving.writeKeyed(
      Airline.top10CarriersPerAirport(flights)
        .select(col("Origin").as("airport"), col("UniqueCarrier").as("carrier"),
          col("avg_dep_delay"), col("rank")),
      servingPath, Seq("airport"))
    println("[demo] serving lookup airport=CMI:")
    Serving.lookup(spark, servingPath, Map("airport" -> "CMI"))
      .show(10, truncate = false)

    // --- G3Q1: sorted frequencies + distribution fit ------------------
    val freqs = Airline.sortedFrequencies(flights)
    freqs.show(5)
    val fits = DistributionFit.writeArtifacts(freqs, s"$work/analytics")
    fits.foreach(f => println(f"[demo] fit ${f.distribution}%-10s " +
      f"p1=${f.param1}%.4f p2=${f.param2}%.4f sse=${f.sse}%.2f best=${f.best}"))
    println(s"[demo] rank-frequency artifacts: $work/analytics/rank_frequency.{tsv,svg}")

    // --- G3Q2: trip planner ------------------------------------------
    val requests = Airline.generateRequests(
      Airline.originStopDest(Airline.airports(flights)), maxRequests = 50)
    val best = Airline.bestLegs(requests, Airline.legCandidates(flights))
    println(s"[demo] bestLegs rows: ${best.count()}")
    Airline.formatBestLegs(best).show(5, truncate = false)

    println(s"[demo] done; workDir=$work")
    spark.stop()
  }
}
