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
      else if (name == "HASHBENCH") {
        // microbench: native vs composed token hashing over an inflated
        // corpus (documents × 40 replicas), isolating the expression cost
        // from scan/JVM overhead. sum(size) forces full evaluation.
        import graft.engine.{Tables, TextFunctions => T}
        val docs = Tables.load(spark, d, "documents")
          .crossJoin(spark.range(40)).select(col("text")).cache()
        docs.count() // materialize
        for (round <- 1 to 2) {
          time(s"hashbench composed r$round") {
            docs.select(sum(size(T.tokenHashesComposed(col("text"))))).head
          }
          time(s"hashbench native   r$round") {
            docs.select(sum(size(T.tokenHashes(col("text"))))).head
          }
        }
        docs.unpersist()
      }
      else if (name == "SIGBENCH") {
        // microbench: shingle + 16-component minhash over a STAGED token-hash
        // array (native hashing either way) — isolates the signature lambdas.
        import graft.engine.{Tables, TextFunctions => T}
        val th = Tables.load(spark, d, "documents")
          .crossJoin(spark.range(40))
          .select(T.tokenHashes(col("text")).as("th")).cache()
        th.count()
        for (round <- 1 to 2) {
          time(s"sigbench composed r$round") {
            th.select(col("th")).withColumn("sh", T.shinglesFromHashes(col("th")))
              .select(sum(size(T.minhashSigFromShingles(col("sh"))))).head
          }
          time(s"sigbench native   r$round") {
            th.select(sum(size(graft.plans.GraftExtensions.minhashSig(col("th"))))).head
          }
        }
        th.unpersist()
      }
      else {
        val fn = SparkEntry.queries(name)
        time(name) { fn(spark, d).write.format("noop").mode("overwrite").save() }
      }
    }
    spark.stop()
  }
}
