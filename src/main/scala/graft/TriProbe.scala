package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Stage-level probe for the triangle census (ad-hoc tooling, not part of
  * the driver contract): times each internal stage of engine.Triangles and
  * a broadcast-adjacency variant side by side, repeated, to localize the
  * census' constant factor (VERDICT r6 item 2: 7.7 s warm on an 11.7 MB
  * input). Usage: sbt "runMain graft.TriProbe <sfDir> <reps>" */
object TriProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.local.dir", graft.engine.Scratch.localDir)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[tri] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    val sp = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_partkey").as("pk"),
        (year(col("l_shipdate")) * 100 + month(col("l_shipdate"))).as("m"),
        col("l_suppkey").as("sk")).distinct()
    val e = sp.as("a").join(sp.as("b"),
        col("a.pk") === col("b.pk") && col("a.m") === col("b.m") &&
          col("a.sk") < col("b.sk"))
      .select(col("a.sk").as("u"), col("b.sk").as("v")).distinct()
      .localCheckpoint()
    println(s"[tri] edges = ${e.count()}")

    (1 to reps).foreach { rep =>
      // --- current census shape, stage by stage
      val deg = e.select(col("u").as("n")).unionAll(e.select(col("v").as("n")))
        .groupBy("n").agg(count(lit(1)).as("dg")).cache()
      time(s"rep$rep deg agg (cached)")(deg.count())
      val ed = e
        .join(deg.select(col("n").as("u"), col("dg").as("du")), "u")
        .join(deg.select(col("n").as("v"), col("dg").as("dv")), "v")
      val lowFirst = col("du") < col("dv") ||
        (col("du") === col("dv") && col("u") < col("v"))
      val or = ed.select(
        when(lowFirst, col("u")).otherwise(col("v")).as("src"),
        when(lowFirst, col("v")).otherwise(col("u")).as("dst"))
      time(s"rep$rep orient (count)")(or.count())
      val adj = or.groupBy(col("src").as("n"))
        .agg(sort_array(collect_list(col("dst"))).as("nbrs"))
      time(s"rep$rep adj agg (count)")(adj.count())
      val tri = or
        .join(adj.select(col("n").as("src"), col("nbrs").as("srcN")), Seq("src"))
        .join(adj.select(col("n").as("dst"), col("nbrs").as("dstN")), Seq("dst"), "left")
        .select(when(col("dstN").isNull, lit(0L))
          .otherwise(size(array_intersect(col("srcN"), col("dstN"))).cast("bigint")).as("c"))
        .agg(coalesce(sum(col("c")), lit(0L)).as("n_triangles"))
      time(s"rep$rep tri join+intersect")(tri.collect().foreach(r => println(s"[tri]   -> $r")))
      deg.unpersist(blocking = true)
      spark.sharedState.cacheManager.clearCache()

      // --- variant: checkpoint oriented edges once, broadcast adjacency
      val deg2 = e.select(col("u").as("n")).unionAll(e.select(col("v").as("n")))
        .groupBy("n").agg(count(lit(1)).as("dg"))
      val ed2 = e
        .join(broadcast(deg2.select(col("n").as("u"), col("dg").as("du"))), "u")
        .join(broadcast(deg2.select(col("n").as("v"), col("dg").as("dv"))), "v")
      val or2 = time(s"rep$rep B: orient+checkpoint")(ed2.select(
        when(lowFirst, col("u")).otherwise(col("v")).as("src"),
        when(lowFirst, col("v")).otherwise(col("u")).as("dst")).localCheckpoint())
      val adj2 = or2.groupBy(col("src").as("n"))
        .agg(sort_array(collect_list(col("dst"))).as("nbrs"))
      val tri2 = or2
        .join(broadcast(adj2.select(col("n").as("src"), col("nbrs").as("srcN"))), Seq("src"))
        .join(broadcast(adj2.select(col("n").as("dst"), col("nbrs").as("dstN"))), Seq("dst"), "left")
        .select(when(col("dstN").isNull, lit(0L))
          .otherwise(size(array_intersect(col("srcN"), col("dstN"))).cast("bigint")).as("c"))
        .agg(coalesce(sum(col("c")), lit(0L)).as("n_triangles"))
      time(s"rep$rep B: tri bcast join")(tri2.collect().foreach(r => println(s"[tri]   -> $r")))
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
