package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed loaders for the driver's synthetic star schema (TESTDATA.md) and
  * shared session defaults.
  *
  * Scale notes (100 TB design point):
  *  - All reads are plain parquet scans: column pruning and predicate pushdown
  *    happen in `FileSourceScanExec` for free as long as queries stay
  *    declarative (SURVEY.md §4).
  *  - At cluster scale the same loaders work over a partitioned lake layout
  *    (`.../table/year=.../part-*.parquet`); `spark.read.parquet(dir)` picks up
  *    partition columns and Catalyst prunes partitions from `WHERE` clauses.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** On-disk parquet bytes of table `name` under `sfDir` (single file or
    * directory of part-files) — the no-Spark-job size probe behind the
    * scaled-table broadcast-hint gates (the Graph.nodesCountUpperBound /
    * Similarity.embRowsUpperBound recipe, generalized). 0 for a missing
    * table, which every gate treats as "small" (hint stands — the
    * test-data layout always materializes the table it reads). */
  def bytesOnDisk(sfDir: String, name: String): Long = {
    val f = new java.io.File(sfDir, s"$name.parquet")
    if (f.isFile) f.length()
    else Option(f.listFiles())
      .map(_.filter(_.getName.endsWith(".parquet")).map(_.length()).sum)
      .getOrElse(0L)
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = name match {
    case "events" =>
      // events.ts has shipped as parquet TIMESTAMP(NANOS) in some data drops
      // (which Spark's vectorized reader rejects — [PARQUET_TYPE_ILLEGAL])
      // and as plain TIMESTAMP(MICROS)/NTZ in others, so the loader branches
      // on the materialized type rather than assuming either. With
      // nanosAsLong=true a nanos column arrives as LongType: floor-div to
      // micros (integer `div` — a double division would lose precision at
      // 1.7e18 ns); DuckDB's reader truncates ns→µs identically, so oracle
      // comparisons stay exact. A micros column arrives as TIMESTAMP_NTZ:
      // cast to session-TZ TIMESTAMP (identity under the UTC session default,
      // matching the instant DuckDB reads) so downstream window/unix_micros
      // logic sees one type either way.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$sfDir/$name.parquet")
      import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case _: org.apache.spark.sql.types.TimestampNTZType =>
          raw.withColumn("ts", col("ts").cast("timestamp"))
        case _ => raw
      }
    case _ =>
      spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Session defaults used by local mains/tests. AQE stays on (runtime shuffle
    * coalescing + skew-join splitting — the local stand-in for what we'd rely
    * on at 1000-executor scale). */
  def localSession(appName: String): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    SparkSession.builder()
      .appName(appName)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.local.dir", Scratch.localDir)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // nanos tables (events) read as LongType from the start — not as a
      // hidden side effect of the first events load (see Tables.load)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }
}
