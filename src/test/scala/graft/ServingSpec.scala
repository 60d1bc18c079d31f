package graft

import java.nio.file.Files

import graft.engine.Serving

class ServingSpec extends SparkSpec {
  import spark.implicits._

  test("S8/S9: keyed write + point lookup round-trips and prunes") {
    val dir = Files.createTempDirectory("graft-serving").toString + "/t"
    val df = Seq(
      ("CMI", "MQ", 1L, 0.61), ("CMI", "OH", 2L, 0.97),
      ("BWI", "F9", 3L, 0.16), ("BWI", "MQ", 4L, 1.45)
    ).toDF("airport", "carrier", "id", "avg_dep_delay")
    Serving.writeKeyed(df, dir, Seq("airport", "carrier"))

    val got = Serving.lookup(spark, dir, Map("airport" -> "CMI"))
    assert(got.count() === 2)
    val one = Serving.lookup(spark, dir,
      Map("airport" -> "BWI", "carrier" -> "F9"))
      .select("id").as[Long].collect().toSeq
    assert(one === Seq(3L))
    // partition layout exists on disk (the "query-shaped key")
    assert(new java.io.File(s"$dir/airport=CMI/carrier=OH").exists())
  }

  test("S7: catalog database create/drop") {
    Serving.createDatabase(spark, "airline_ontime_test")
    assert(spark.catalog.databaseExists("airline_ontime_test"))
    Serving.dropDatabase(spark, "airline_ontime_test")
    assert(!spark.catalog.databaseExists("airline_ontime_test"))
  }
}
