package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{Durations => D}

/** Pins the duration codec semantics (SURVEY.md §2.8 F2–F18, §7.4 hard parts):
  * sign handling, round-vs-truncate asymmetry, totality, format round-trips. */
class DurationsSpec extends AnyFunSuite with SharedSparkSpec {

  private def fmt1(c: org.apache.spark.sql.Column => org.apache.spark.sql.Column, sec: Double): String = {
    import spark.implicits._
    Seq(sec).toDF("s").select(c(col("s")).as("r")).head.getString(0)
  }
  private def parse1(s: String): Option[Long] = {
    import spark.implicits._
    val row = Seq(s).toDF("s").select(D.parseDurationToMillis(col("s")).as("r")).head
    if (row.isNullAt(0)) None else Some(row.getLong(0))
  }

  test("F2 mm:ss:mmm — golden edges (FIXTURES.md §A)") {
    assert(fmt1(D.formatSecondsToMmSsMs, 0.0) == "00:00:000")
    assert(fmt1(D.formatSecondsToMmSsMs, -62.345) == "-01:02:345")
    assert(fmt1(D.formatSecondsToMmSsMs, 3669.999) == "61:09:999")  // minutes unbounded
    assert(fmt1(D.formatSecondsToMmSsMs, 59.9995) == "01:00:000")   // round-half-up carries
    assert(fmt1(D.formatSecondsToMmSsMs, 0.0004) == "00:00:000")
  }

  test("F3 hh:mm:ss rounds to seconds; F4 keeps millis") {
    assert(fmt1(D.formatSecondsToHhMmSs, 3661.4) == "01:01:01")
    assert(fmt1(D.formatSecondsToHhMmSs, 3661.5) == "01:01:02")
    assert(fmt1(D.formatSecondsToHhMmSs, -3661.5) == "-01:01:02")
    assert(fmt1(D.formatSecondsToHhMmSsMs, 3661.5) == "01:01:01:500")
    assert(fmt1(D.formatSecondsToHhMmSsMs, -0.001) == "-00:00:00:001")
  }

  test("F18 round-vs-truncate asymmetry is preserved") {
    // extractor flavor rounds: 1.0006 s → 001 ms; dashboard flavor truncates → 000
    assert(fmt1(D.formatSecondsToHhMmSsMs, 1.0006) == "00:00:01:001")
    assert(fmt1(D.formatSecondsToHmsMsTrunc, 1.0006) == "00:00:01:000")
    assert(fmt1(D.formatSecondsToHhMmSsMs, 1.0004) == "00:00:01:000")
  }

  test("F7 days fold into hours (no_dh invariant)") {
    import spark.implicits._
    val ms = (26L * 3600 + 90) * 1000 + 123 // 26h 1m 30.123s
    val out = Seq(ms).toDF("ms").select(D.formatMillisToHhMmSsMs(col("ms"))).head.getString(0)
    assert(out == "26:01:30:123")
    val neg = Seq(-ms).toDF("ms").select(D.formatMillisToHhMmSsMs(col("ms"))).head.getString(0)
    assert(neg == "-26:01:30:123")
  }

  test("F6 parse — golden edges: totality, dispatch, null coercion") {
    assert(parse1("-00:01:02:345").contains(-62345L))
    assert(parse1("00:00:00:000").contains(0L))
    assert(parse1("61:09:999").contains((61 * 60 + 9) * 1000L + 999))  // mm:ss:mmm
    assert(parse1("12:34:56").contains((12 * 3600 + 34 * 60 + 56) * 1000L)) // hh:mm:ss
    assert(parse1("nan").isEmpty && parse1("NaT").isEmpty && parse1("").isEmpty)
    assert(parse1("12:34").isEmpty)        // two groups → no format matches
    assert(parse1("00:00:3.5").isEmpty)    // fractional seconds → no match
    assert(parse1(" 01:02:345 ").contains(62345L)) // trimmed
  }

  test("property: parse(format(ms)) == ms across ±3 days (seeded sample + boundaries)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val boundary = Seq(0L, 1L, -1L, 999L, 1000L, 59999L, 60000L, 3599999L,
      3600000L, 86399999L, 86400000L, -86400000L)
    val sample = boundary ++ Seq.fill(500)(rnd.nextLong(86400000L * 6) - 86400000L * 3)
    val df = sample.toDF("ms")
      .withColumn("sec", col("ms").cast("double") / 1000.0)
      .select(col("ms"),
        D.parseDurationToMillis(D.formatSecondsToMmSsMs(col("sec"))).as("rt1"),
        D.parseDurationToMillis(D.formatSecondsToHhMmSsMs(col("sec"))).as("rt2"),
        D.parseDurationToMillis(D.formatMillisToHhMmSsMs(col("ms"))).as("rt3"))
    df.collect().foreach { r =>
      val ms = r.getLong(0)
      assert(r.getLong(1) == ms, s"mm:ss:mmm round-trip for $ms")
      assert(r.getLong(2) == ms, s"hh:mm:ss:mmm round-trip for $ms")
      assert(r.getLong(3) == ms, s"millis formatter round-trip for $ms")
    }
  }

  test("F13 bool coercion: tri-state with false default") {
    import spark.implicits._
    val rows = Seq("true", "1", "1.0", "TRUE", "false", "0", "0.0", "junk", "2")
      .toDF("s").select(D.boolCoerce(col("s")).as("b")).collect().map(_.getBoolean(0))
    assert(rows.toSeq == Seq(true, true, true, true, false, false, false, false, false))
  }

  test("F12/F15: seconds→millis round-half; filesystem-safe names") {
    import spark.implicits._
    val r = Seq((1.2345, "Abu Dhabi/GP 2024")).toDF("sec", "name")
      .select(D.secondsToMillis(col("sec")).as("ms"), D.fsSafeName(col("name")).as("n")).head
    assert(r.getLong(0) == 1235L)
    assert(r.getString(1) == "Abu_Dhabi_GP_2024")
    val neg = Seq(-1.2345).toDF("sec").select(D.secondsToMillis(col("sec"))).head.getLong(0)
    assert(neg == -1235L)
  }
}
