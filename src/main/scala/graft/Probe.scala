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
      else if (name == "COSBENCH") {
        // microbench: native fused cosine vs composed three-fold cosine over
        // an inflated all-pairs-vs-query frame (embeddings × 100 replicas).
        import graft.engine.{Tables, Vectors => V}
        val e = Tables.load(spark, d, "embeddings")
          .crossJoin(spark.range(100))
          .select(V.vd(col("embedding")).as("v")).cache()
        e.count()
        val q = Tables.load(spark, d, "embeddings").filter(col("vec_id") === 0)
          .select(V.vd(col("embedding")).as("qv"))
        for (round <- 1 to 2) {
          time(s"cosbench composed r$round") {
            e.crossJoin(broadcast(q)).select(sum(V.cosineComposed(col("v"), col("qv")))).head
          }
          time(s"cosbench native   r$round") {
            e.crossJoin(broadcast(q)).select(sum(V.cosine(col("v"), col("qv")))).head
          }
        }
        e.unpersist()
      }
      else if (name == "QSUMBENCH") {
        // microbench: the fixed-point determinism layer vs plain float
        // aggregation — floor + BIGINT sums vs double sums over an
        // inflated lineitem (×20). Both whole-stage codegen'd; the grid
        // quantization should cost ~nothing next to the scan.
        import graft.engine.{FixedPoint => FP}
        val l = Tables.load(spark, d, "lineitem")
          .crossJoin(spark.range(20))
          .select(col("l_returnflag"), col("l_extendedprice")).cache()
        l.count()
        for (round <- 1 to 2) {
          time(s"qsumbench plain sum   r$round") {
            l.groupBy("l_returnflag").agg(sum("l_extendedprice")).collect()
          }
          time(s"qsumbench fixed-point r$round") {
            l.groupBy("l_returnflag").agg(FP.qsum(col("l_extendedprice"), 20)).collect()
          }
        }
        l.unpersist()
      }
      else {
        val fn = SparkEntry.queries(name)
        time(name) { fn(spark, d).write.format("noop").mode("overwrite").save() }
      }
    }
    spark.stop()
  }
}
