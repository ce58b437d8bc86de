package graft.engine

import org.apache.spark.sql.types._

/** The six reference table schemas (SURVEY.md §1.1; column contracts from
  * FIXTURES.md §A, derived from /root/reference/src/extract/f1_dataExtractor.py
  * writers and /root/reference/src/transform/f1_dataTransformer.py:100-122).
  *
  * Duration columns use the millis-as-LongType convention (SURVEY.md §1.2).
  * Raw (CSV) form is all-string; `allStrings` derives the schema-on-read
  * variant that replicates the transformer's string-first ingest.
  */
object Schemas {
  private def f(n: String, t: DataType) = StructField(n, t, nullable = true)

  val eventInfo: StructType = StructType(Seq(
    f("Year", IntegerType), f("EventName", StringType), f("Country", StringType),
    f("Location", StringType), f("SessionKey", StringType), f("SessionNameActual", StringType),
    f("EventDate", TimestampType), f("SessionStartDateLocalISO", TimestampType),
    f("SessionStartDateUTCISO", TimestampType)))

  val sessionResults: StructType = StructType(Seq(
    f("Driver", StringType), f("DriverNumber", StringType), f("TeamName", StringType),
    f("Position", IntegerType), f("Laps", IntegerType), f("Status", StringType),
    f("Time", LongType),          // duration ms, raw HH:MM:SS:mmm (signed)
    f("Q1", LongType), f("Q2", LongType), f("Q3", LongType), // raw MM:SS:mmm
    f("Interval", LongType)))     // raw float seconds

  val lapsData: StructType = StructType(Seq(
    f("Driver", StringType), f("Team", StringType), f("Compound", StringType),
    f("LapNumber", IntegerType), f("Stint", IntegerType), f("TyreLife", IntegerType),
    f("IsAccurate", BooleanType),
    f("LapTime", LongType), f("Sector1Time", LongType), f("Sector2Time", LongType),
    f("Sector3Time", LongType),   // raw MM:SS:mmm
    f("Time", LongType), f("PitInTime", LongType), f("PitOutTime", LongType), // raw HH:MM:SS:mmm
    f("Sector1SessionTime", LongType), f("Sector2SessionTime", LongType),
    f("Sector3SessionTime", LongType), f("LapStartTime", LongType))) // raw HH:MM:SS

  val lapTelemetrySummary: StructType = StructType(Seq(
    f("Driver", StringType), f("Team", StringType), f("TeamName", StringType),
    f("LapNumber", IntegerType), f("TotalGearChanges", IntegerType),
    f("TelemetryLapStartTime_seconds", LongType), // raw float seconds → ms
    f("AvgSpeed", DoubleType), f("MaxSpeed", DoubleType), f("MinSpeed", DoubleType),
    f("AvgRPM", DoubleType), f("MaxRPM", DoubleType), f("AvgThrottle", DoubleType),
    f("AvgBrake", DoubleType), f("MaxDistance", DoubleType), f("DRSActive", BooleanType)))

  val weatherData: StructType = StructType(Seq(
    f("Time", LongType),          // raw HH:MM:SS:mmm wall-clock
    f("AirTemp", DoubleType), f("TrackTemp", DoubleType), f("Humidity", DoubleType),
    f("Pressure", DoubleType), f("WindSpeed", DoubleType), f("Rainfall", BooleanType)))

  val tyreStintsSummary: StructType = StructType(Seq(
    f("Driver", StringType), f("Compound", StringType), f("StintNumber", IntegerType),
    f("StartLap", IntegerType), f("EndLap", IntegerType), f("NumLapsInStint", IntegerType)))

  val tables: Map[String, StructType] = Map(
    "event_info" -> eventInfo,
    "session_results" -> sessionResults,
    "laps_data" -> lapsData,
    "lap_telemetry_summary" -> lapTelemetrySummary,
    "weather_data" -> weatherData,
    "tyre_stints_summary" -> tyreStintsSummary)

  /** Schema-on-read raw variant: every column as nullable string
    * (f1_dataTransformer.py:132-134 reads everything as str). */
  def allStrings(s: StructType): StructType =
    StructType(s.fields.map(fld => StructField(fld.name, StringType, nullable = true)))
}
