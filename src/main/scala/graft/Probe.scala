package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Scratch probe main for ad-hoc plan/perf checks (not part of the API). */
object Probe {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = Tables.localSession("probe")
    spark.sparkContext.setLogLevel("ERROR")
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    for (name <- args.drop(1)) {
      if (name == "CLEAR") spark.sharedState.cacheManager.clearCache()
      else {
        val fn = SparkEntry.queries(name)
        time(name) { fn(spark, d).write.format("noop").mode("overwrite").save() }
      }
    }
    spark.stop()
  }
}
