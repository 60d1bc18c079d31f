package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.functions._

import graft.functions.AirlineFunctions._

/** Pins the scalar-layer semantics where the reference README is
  * ambiguous or the data is malformed (SURVEY.md §7 "hard parts").
  */
class AirlineFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def depRepair(dep: String): (Int, Int) = {
    val r = Seq(dep).toDF("DepTime")
      .select(repairedDepTime($"DepTime").as("r"))
      .select($"r.minutes", $"r.dayCarry").head()
    (r.getInt(0), r.getInt(1))
  }

  test("F3: normal HHmm parses to minutes, no carry") {
    assert(depRepair("0005") === (5, 0))
    assert(depRepair("1337") === (13 * 60 + 37, 0))
  }

  test("F3: 2400 wraps to 00:00 next day (R:513)") {
    assert(depRepair("2400") === (0, 1))
  }

  test("F3: hour>24 malformed wraps with day carry (R:513)") {
    assert(depRepair("2515") === (75, 1))
  }

  private def sched(date: String, dep: String, delay: Double): Timestamp =
    Seq((Date.valueOf(date), dep, delay)).toDF("FlightDate", "DepTime", "DepDelay")
      .select(scheduledDeparture($"FlightDate", $"DepTime", $"DepDelay").as("s"))
      .head().getTimestamp(0)

  test("F4: scheduled = actual - delay (R:514)") {
    assert(sched("2008-08-16", "1200", 30.0) ===
      Timestamp.valueOf("2008-08-16 11:30:00"))
  }

  test("F4: negative delay (early departure) adds minutes") {
    assert(sched("2008-08-16", "1200", -14.0) ===
      Timestamp.valueOf("2008-08-16 12:14:00"))
  }

  test("F4: delay crossing midnight lands on previous day") {
    assert(sched("2008-08-16", "0010", 30.0) ===
      Timestamp.valueOf("2008-08-15 23:40:00"))
  }

  test("F4: 2400 DepTime is midnight of the NEXT day") {
    assert(sched("2008-08-16", "2400", 0.0) ===
      Timestamp.valueOf("2008-08-17 00:00:00"))
  }

  test("F7: minutesOfDay and the pinned noon boundary") {
    val df = Seq(Timestamp.valueOf("2008-01-01 11:59:00"),
      Timestamp.valueOf("2008-01-01 12:00:00")).toDF("ts")
    val m = df.select(minutesOfDay($"ts")).as[Int].collect()
    assert(m.toSeq === Seq(719, 720))
  }

  test("F5/F8: leg output formats match goldens (R:521-531)") {
    val row = Seq((Timestamp.valueOf("2008-08-16 07:10:00"), -14.0))
      .toDF("ts", "d")
      .select(legTimestampFormat($"ts"), delayFormat($"d")).head()
    assert(row.getString(0) === "07:10 16/08/2008")
    assert(row.getString(1) === "-14.00")
  }

  test("F1: composite key is space-joined (R:201-202)") {
    val r = Seq(("CMI", "OH")).toDF("a", "b")
      .select(compositeKey($"a", $"b")).head().getString(0)
    assert(r === "CMI OH")
  }
}
