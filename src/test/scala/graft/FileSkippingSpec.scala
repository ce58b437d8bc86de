package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{FileSkipping, Tables}

/** Pins the file-stats data-skipping layer: the manifest matches the file
  * layout, a selective band reads strictly fewer files, the pruned read
  * agrees exactly with the full-scan filter, and an out-of-range band does
  * no file IO at all. */
class FileSkippingSpec extends AnyFunSuite with SharedSparkSpec {
  private val d = "/root/testdata/sf0.001"
  private lazy val path = {
    val p = "/tmp/graft_test_skip/lineitem"
    FileSkipping.writeRangedWithStats(
      Tables.load(spark, d, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice"),
      "l_extendedprice", 8, p)
    p
  }

  test("manifest: one row per data file, envelopes disjoint-ish under range clustering") {
    val stats = spark.read.parquet(FileSkipping.statsPath(path)).collect()
    assert(stats.length == 8)
    val byMin = stats.map(r => (r.getDouble(1), r.getDouble(2))).sortBy(_._1)
    byMin.sliding(2).foreach { case Array((_, hiA), (loB, _)) =>
      assert(hiA <= loB, "range clustering must order file envelopes")
    }
  }

  test("selective band prunes files and agrees with the full scan") {
    val lo = 2000.0; val hi = 15000.0
    val files = FileSkipping.survivors(spark, path, lo, hi)
    assert(files.nonEmpty && files.length < 8,
      s"band [$lo,$hi] should keep some but not all of 8 files, kept ${files.length}")
    val pruned = FileSkipping.prunedRead(spark, path, "l_extendedprice", lo, hi)
      .agg(count(lit(1)), round(sum("l_extendedprice"), 4)).head
    val full = spark.read.parquet(path)
      .filter(col("l_extendedprice") >= lo && col("l_extendedprice") <= hi)
      .agg(count(lit(1)), round(sum("l_extendedprice"), 4)).head
    assert(pruned == full)
    assert(pruned.getLong(0) > 0)
  }

  test("out-of-range band survives zero files and returns an empty frame") {
    assert(FileSkipping.survivors(spark, path, -2.0, -1.0).isEmpty)
    val empty = FileSkipping.prunedRead(spark, path, "l_extendedprice", -2.0, -1.0)
    assert(empty.count() == 0)
    assert(empty.columns.contains("l_extendedprice"))
  }
}
