package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.F1Pipeline

/** Semantics of the extract-shaped aggregations (SURVEY.md §3.1, A1–A7, W1). */
class F1PipelineSpec extends AnyFunSuite with SharedSparkSpec {

  test("telemetrySummary: one row per (Driver, Lap), gear changes match lag definition") {
    import spark.implicits._
    val tel = Seq(
      // Driver, Lap, Time, Speed, RPM, Throttle, Brake, Gear, DRS, Distance
      ("VER", 1, 1.0, 100.0, 9000.0, 50.0, 0.0, 3.0, 0, 100.0),
      ("VER", 1, 2.0, 150.0, 10000.0, 80.0, 0.0, 4.0, 10, 200.0),
      ("VER", 1, 3.0, 200.0, 11000.0, 90.0, 0.0, 4.0, 12, 300.0),
      ("VER", 1, 4.0, 180.0, 10500.0, 70.0, 1.0, 5.0, 0, 400.0),
      ("HAM", 1, 1.5, 90.0, 8500.0, 40.0, 0.5, 2.0, 0, 90.0))
      .toDF("Driver", "LapNumber", "Time", "Speed", "RPM", "Throttle", "Brake", "Gear", "DRS", "Distance")
    val out = F1Pipeline.telemetrySummary(tel)
    assert(out.count() == 2)
    val ver = out.filter(col("Driver") === "VER").head
    assert(ver.getAs[Double]("TelemetryLapStartTime_seconds") == 1.0)
    assert(ver.getAs[Double]("MaxSpeed") == 200.0)
    assert(ver.getAs[Double]("MinSpeed") == 100.0)
    assert(ver.getAs[Double]("AvgSpeed") == 157.5)
    assert(ver.getAs[Boolean]("DRSActive"))        // DRS >= 8 seen
    assert(ver.getAs[Int]("TotalGearChanges") == 2) // 3→4, 4→4 (no), 4→5
    val ham = out.filter(col("Driver") === "HAM").head
    assert(!ham.getAs[Boolean]("DRSActive"))
    assert(ham.getAs[Int]("TotalGearChanges") == 0)
  }

  test("stintSummary: the A7 multi-agg replaces the double loop") {
    import spark.implicits._
    val laps = Seq(
      ("VER", 1, 1, "SOFT"), ("VER", 2, 1, "SOFT"), ("VER", 3, 1, "SOFT"),
      ("VER", 4, 2, "HARD"), ("VER", 5, 2, "HARD"),
      ("HAM", 1, 1, "MEDIUM"))
      .toDF("Driver", "LapNumber", "Stint", "Compound")
    val out = F1Pipeline.stintSummary(laps).orderBy("Driver", "StintNumber").collect()
    assert(out.length == 3)
    val verS1 = out.find(r => r.getString(0) == "VER" && r.getInt(1) == 1).get
    assert(verS1.getAs[String]("Compound") == "SOFT")
    assert(verS1.getAs[Int]("StartLap") == 1 && verS1.getAs[Int]("EndLap") == 3)
    assert(verS1.getAs[Int]("NumLapsInStint") == 3)
  }

  test("lapTimesView: the §3.3 flagship trace filters compose correctly") {
    import spark.implicits._
    val laps = Seq(
      ("VER", 1, 92.5, 1, "SOFT", true),
      ("VER", 2, -1.0, 1, "SOFT", true),    // filtered: non-positive
      ("VER", 3, 93.1, 1, "SOFT", false),   // filtered when accurateOnly
      ("HAM", 1, 94.0, 1, "MEDIUM", true),  // filtered: not selected
      ("LEC", 1, 91.8, 1, "SOFT", true))
      .toDF("Driver", "LapNumber", "LapTimeSeconds", "Stint", "Compound", "IsAccurate")
    val out = F1Pipeline.lapTimesView(laps, Seq("VER", "LEC"), accurateOnly = true)
    val rows = F1Pipeline.withFormattedLapTime(out).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("LEC", "VER"))
    assert(rows.head.getAs[String]("LapTimeFormatted") == "01:31:800")
  }

  test("absoluteTimes: W2 timestamp shift by per-row offset") {
    import spark.implicits._
    val start = java.sql.Timestamp.from(java.time.Instant.parse("2024-12-08T13:00:00Z"))
    val df = Seq(0.0, 61.5).toDF("TimeSeconds")
    val out = F1Pipeline.absoluteTimes(df, "TimeSeconds", start)
      .orderBy("TimeSeconds").collect()
    assert(out(0).getAs[java.sql.Timestamp]("TimeSecondsAbsolute").toInstant.toString == "2024-12-08T13:00:00Z")
    assert(out(1).getAs[java.sql.Timestamp]("TimeSecondsAbsolute").toInstant.toString == "2024-12-08T13:01:01.500Z")
  }
}
