package graft

import java.nio.file.{Files, Paths}

/** Round-15 optimization plan snapshots — PlanDumpR14 plus pseudo-faces
  * for plans whose interesting stages hide behind localCheckpoint
  * truncation (the per-round beam frames): `sim_index_insert_full`
  * explains `indexInsertAt(truncate = false)`, the same untruncated
  * surface PlanQualitySpec pins. Usage:
  *   sbt "runMain graft.PlanDumpR15 <sfDir> <outDir> <suffix> <query ...>"
  */
object PlanDumpR15 {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names = args.drop(3).toSeq
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
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val df = name match {
        case "sim_index_insert_full" =>
          graft.queries.Similarity.indexInsertAt(spark, sfDir,
            graft.queries.Similarity.embHintGate(sfDir), truncate = false)
        case "sim_nndescent_full" =>
          graft.queries.Similarity.nndescentAt(spark, sfDir,
            graft.queries.Similarity.embHintGate(sfDir), truncate = false)
        case "graph_lpa_full" =>
          graft.queries.Graph.lpaAt(spark, sfDir,
            broadcastState = true, truncate = false)
        case n => SparkEntry.queries(n)(spark, sfDir)
      }
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(Paths.get(outDir, s"${name}_$suffix.txt"),
        (s"== $name ($suffix, $sfDir) ==\n\n" + txt).getBytes("UTF-8"))
      println(s"[plandump] $name -> $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
