package graft

import org.apache.spark.sql.functions._
import graft.engine._
import java.nio.file.Files

/** End-to-end demo of the reference-parity F1 pipeline (SURVEY.md §3):
  * synthetic session → extract-shaped aggregations → partitioned parquet →
  * canonicalized re-emit → dashboard trace. Run:
  *   sbt "runMain graft.F1Demo"
  */
object F1Demo {
  def main(args: Array[String]): Unit = {
    val spark = Tables.localSession("graft-f1-demo")
    spark.sparkContext.setLogLevel("WARN")
    val base = if (args.nonEmpty) args(0)
      else Files.createTempDirectory("graft-f1").toString
    println(s"[f1demo] output base: $base")

    // §3.1 extract: raw tables → six session tables, loops → aggregations.
    val (telemetry, laps, weather) = F1Pipeline.syntheticSession(spark)
    val telSummary = F1Pipeline.telemetrySummary(telemetry)
    val stints = F1Pipeline.stintSummary(laps)
    val sessionStart = java.sql.Timestamp.from(java.time.Instant.parse("2024-12-08T13:00:00Z"))
    val weatherAbs = F1Pipeline.absoluteTimes(weather, "TimeSeconds", sessionStart)

    // S3: partitioned sink (year/event/session layout).
    def keyed(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("year", lit(2024)).withColumn("event", lit("demo_gp"))
      .withColumn("session", lit("race"))
    Ingest.writePartitioned(keyed(telSummary), base, "lap_telemetry_summary")
    Ingest.writePartitioned(keyed(stints), base, "tyre_stints_summary")
    Ingest.writePartitioned(keyed(laps), base, "laps_data_raw")

    // §3.2 transform: canonicalize a raw-string table (validating re-encode).
    val rawStints = Ingest.readPartitioned(spark, base, "tyre_stints_summary")
      .select(Schemas.tyreStintsSummary.fieldNames.map(n => col(n).cast("string").as(n)).toSeq: _*)
    val typedStints = Canonicalize.typed(rawStints, "tyre_stints_summary")
    println(s"[f1demo] canonicalized stints: ${typedStints.count()} rows")

    // §3.3 dashboard: flagship Lap-Times trace with partition pruning.
    val lapsBack = Ingest.readPartitioned(spark, base, "laps_data_raw")
      .where(col("year") === 2024 && col("event") === "demo_gp" && col("session") === "race")
    val view = F1Pipeline.withFormattedLapTime(
      F1Pipeline.lapTimesView(lapsBack, Seq("DR01", "DR02", "DR03"), accurateOnly = true))
    view.show(8, truncate = false)

    val summary = telSummary.agg(count(lit(1)).as("laps"),
      round(avg("AvgSpeed"), 2).as("avg_speed"),
      sum(col("DRSActive").cast("int")).as("drs_laps")).head
    println(s"[f1demo] telemetry summary: laps=${summary.getLong(0)} " +
      s"avgSpeed=${summary.getDouble(1)} drsLaps=${summary.getLong(2)}")
    println(s"[f1demo] stint rows: ${stints.count()}, weather rows: ${weatherAbs.count()}")
    println("[f1demo] OK")
    spark.stop()
  }
}
