package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.engine.Tables
import graft.streaming.Streams

/** Runnable Structured Streaming surface (readStream → transforms →
  * writeStream): drives the events table as a file stream through the
  * watermarked hourly aggregation and prints the result. Run:
  *   sbt "runMain graft.StreamDemo"
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val spark = Tables.localSession("graft-stream-demo")
    spark.sparkContext.setLogLevel("WARN")
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"

    // stage the events table as parquet files a stream can tail (the
    // TIMESTAMP(NANOS) source column is normalized through Tables.load)
    val staged = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val batch = Tables.load(spark, d, "events")
    batch.write.mode("overwrite").parquet(staged)

    val stream = spark.readStream
      .schema(batch.schema)
      .option("maxFilesPerTrigger", "8")
      .parquet(staged)

    val agg = Streams.hourlyCounts(stream, watermark = "2 hours")
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory").queryName("hourly_stream")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("hourly_stream")
    val n = streamed.count()
    streamed.orderBy("ws", "event_type").show(8, truncate = false)

    // agreement with the batch twin
    val batchAgg = batch
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .count()
    println(s"[streamdemo] streaming rows=$n batch rows=$batchAgg match=${n == batchAgg}")
    require(n == batchAgg, "streaming result must match batch twin")
    println("[streamdemo] OK")
    spark.stop()
  }
}
