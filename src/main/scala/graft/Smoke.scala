package graft

/** t1-style smoke: run SparkEntry.entry and print its row count. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.Tables.localSession("graft-smoke")
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(10, truncate = false)
    println(s"[smoke] entry rows=$n")
    spark.stop()
  }
}
