package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Ad-hoc stage timing probe (not part of the driver contract). Times the
  * stages of a catalog query in isolation to localize plan pathologies.
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.Probe <sfDir>" */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "false"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    val sp = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_partkey").as("pk"),
        (year(col("l_shipdate")) * 100 + month(col("l_shipdate"))).as("m"),
        col("l_suppkey").as("sk")).distinct()
    time("sp distinct")(sp.count())
    val e = sp.as("a").join(sp.as("b"),
        col("a.pk") === col("b.pk") && col("a.m") === col("b.m") &&
          col("a.sk") < col("b.sk"))
      .select(col("a.sk").as("u"), col("b.sk").as("v")).distinct()
    time("edge build")(e.count())
    val ec = e.localCheckpoint()
    time("census on checkpointed")(graft.engine.Triangles.census(ec).collect()
      .foreach(r => println(s"[probe] census: $r")))
    time("census on raw plan")(graft.engine.Triangles.census(e).collect()
      .foreach(r => println(s"[probe] census: $r")))
    spark.stop()
  }
}
