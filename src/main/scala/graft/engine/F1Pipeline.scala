package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.engine.{Durations => D}

/** The reference's three pipelines (SURVEY.md §3) as one Spark-native module:
  *
  *  §3.1 extract — the per-lap telemetry loop (f1_dataExtractor.py:250-292)
  *  and the stint double-loop (:334-353) each become ONE groupBy; the
  *  timestamp shift (:212-243) is scalar arithmetic. No driver-side loops.
  *  §3.2 transform — Canonicalize.typed/canonical over a partitioned read.
  *  §3.3 dashboard — the Lap-Times flagship trace (streamlit_app.py:76-258)
  *  as a single declarative query.
  *
  * Inputs are raw-shaped DataFrames ("the engine starts at raw tables exist",
  * SURVEY §2.1 S1). `syntheticSession` builds a deterministic session for
  * tests/demo — ~20 drivers × laps × ~600 telemetry samples/lap.
  */
object F1Pipeline {

  /** Deterministic synthetic raw tables for one session (stands in for the
    * fastf1 API source, S1). Returns (telemetrySamples, laps, weather). */
  def syntheticSession(spark: SparkSession, nDrivers: Int = 20, nLaps: Int = 10,
                       samplesPerLap: Int = 100): (DataFrame, DataFrame, DataFrame) = {
    import spark.implicits._
    val drivers = (1 to nDrivers).map(i => f"DR$i%02d")
    val telemetry = spark.range(nDrivers.toLong * nLaps * samplesPerLap)
      .select(
        element_at(typedLit(drivers), (col("id") / (nLaps * samplesPerLap)).cast("int") + 1).as("Driver"),
        ((col("id") / samplesPerLap) % nLaps + 1).cast("int").as("LapNumber"),
        (col("id") % samplesPerLap).cast("double").as("SampleIdx"))
      .withColumn("Time", col("LapNumber") * 95.0 + col("SampleIdx") * 0.95 +
        (crc32(concat(col("Driver"), col("LapNumber"), col("SampleIdx"))) % 1000) / 1000.0)
      .withColumn("Speed", lit(120.0) + (crc32(concat(col("Driver"), lit("s"), col("SampleIdx"))) % 180000L) / 1000.0)
      .withColumn("RPM", lit(9000.0) + (crc32(concat(col("Driver"), lit("r"), col("SampleIdx"))) % 3000000L) / 1000.0)
      .withColumn("Throttle", (crc32(concat(col("Driver"), lit("t"), col("SampleIdx"))) % 100000L) / 1000.0)
      .withColumn("Brake", (crc32(concat(col("Driver"), lit("b"), col("SampleIdx"))) % 100000L) / 1000.0)
      .withColumn("Gear", ((crc32(concat(col("Driver"), col("SampleIdx"))) % 8) + 1).cast("double"))
      .withColumn("DRS", (crc32(concat(col("Driver"), lit("d"), col("SampleIdx"))) % 15).cast("int"))
      .withColumn("Distance", col("SampleIdx") * 55.0)
    val laps = telemetry.groupBy("Driver", "LapNumber")
      .agg(min("Time").as("LapStartSeconds"))
      .withColumn("LapTimeSeconds", lit(90.0) + (crc32(concat(col("Driver"), col("LapNumber"))) % 12000L) / 1000.0)
      .withColumn("Stint", when(col("LapNumber") <= nLaps / 2, 1).otherwise(2).cast("int"))
      .withColumn("Compound", when(col("Stint") === 1, "SOFT").otherwise("HARD"))
      .withColumn("IsAccurate", crc32(concat(col("Driver"), lit("a"), col("LapNumber"))) % 10 =!= 0)
    val weather = spark.range(60).select(
      (col("id") * 60.0).as("TimeSeconds"),
      (lit(28.0) + (crc32(col("id").cast("string")) % 5000L) / 1000.0).as("AirTemp"),
      (lit(40.0) + (crc32(concat(lit("t"), col("id"))) % 8000L) / 1000.0).as("TrackTemp"),
      (crc32(concat(lit("r"), col("id"))) % 2 === 0).as("Rainfall"))
    (telemetry, laps, weather)
  }

  /** §3.1 hot loop → one aggregation: per-(Driver, Lap) telemetry summary
    * (A1–A6 + W1 gear-change count in a single shuffle). Replaces the
    * reference's per-lap Python loop (f1_dataExtractor.py:250-292). */
  def telemetrySummary(telemetry: DataFrame): DataFrame = {
    val byLap = Window.partitionBy("Driver", "LapNumber").orderBy("Time")
    telemetry
      .withColumn("prevGear", lag("Gear", 1).over(byLap))
      .groupBy("Driver", "LapNumber")
      .agg(
        min("Time").as("TelemetryLapStartTime_seconds"), // deterministic iloc[0]: time-ordered first
        avg("Speed").as("AvgSpeed"), max("Speed").as("MaxSpeed"), min("Speed").as("MinSpeed"),
        avg("RPM").as("AvgRPM"), max("RPM").as("MaxRPM"),
        avg("Throttle").as("AvgThrottle"), avg("Brake").as("AvgBrake"),
        max("Distance").as("MaxDistance"),
        max(col("DRS") >= 8).as("DRSActive"),
        sum(when(col("prevGear").isNotNull && col("Gear") =!= col("prevGear"), 1)
          .otherwise(0)).cast("int").as("TotalGearChanges"))
  }

  /** §3.1 stint double-loop → one aggregation (A7). */
  def stintSummary(laps: DataFrame): DataFrame =
    laps.groupBy("Driver", "Stint")
      .agg(
        min_by(col("Compound"), col("LapNumber")).as("Compound"), // deterministic iloc[0]
        min("LapNumber").as("StartLap"),
        max("LapNumber").as("EndLap"),
        count(lit(1)).cast("int").as("NumLapsInStint"))
      .withColumnRenamed("Stint", "StintNumber")

  /** §3.1 W2: absolute wall-clock from session start + offset seconds. */
  def absoluteTimes(df: DataFrame, secondsCol: String, sessionStart: java.sql.Timestamp): DataFrame =
    df.withColumn(s"${secondsCol}Absolute",
      timestamp_micros((unix_micros(lit(sessionStart)) +
        (col(secondsCol) * 1e6).cast("long"))))

  /** §3.3 flagship Lap-Times dashboard trace: derive → coerce → drop → filter
    * → semi-filter → sort (single declarative plan; at scale: scan-side
    * filters + one sort). */
  def lapTimesView(laps: DataFrame, selectedDrivers: Seq[String],
                   accurateOnly: Boolean): DataFrame = {
    var df = laps
      .withColumn("LapTimeSeconds", col("LapTimeSeconds").cast("double"))
      .withColumn("LapNumber", col("LapNumber").cast("int"))
      .na.drop(Seq("LapNumber", "LapTimeSeconds", "Driver"))
      .filter(col("LapTimeSeconds") > 0)
    if (accurateOnly) df = df.filter(col("IsAccurate"))
    if (selectedDrivers.nonEmpty) df = df.filter(col("Driver").isin(selectedDrivers: _*))
    df.select("Driver", "LapNumber", "LapTimeSeconds", "Stint", "Compound", "IsAccurate")
      .orderBy("Driver", "LapNumber")
  }

  /** Format helper for display columns (F2): seconds → MM:SS:mmm. */
  def withFormattedLapTime(df: DataFrame): DataFrame =
    df.withColumn("LapTimeFormatted", D.formatSecondsToMmSsMs(col("LapTimeSeconds")))
}
