package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.{BeforeAndAfterAll, Suite}

/** One Spark session shared across a suite (local[4] keeps test startup
  * cheap; production parallelism concerns are covered by Bench, not tests). */
trait SharedSparkSpec extends BeforeAndAfterAll { self: Suite =>
  lazy val spark: SparkSession = SharedSparkSpec.session

  override def afterAll(): Unit = super.afterAll()
}

object SharedSparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .appName("graft-test")
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.local.dir", graft.engine.Scratch.localDir)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
