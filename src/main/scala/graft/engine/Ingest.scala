package graft.engine

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Sources & sinks (SURVEY.md §2.1 S1–S8) re-expressed Spark-native:
  *
  *  - S3/S5: the reference's `output/{Year}/{Event}/{Session}/table.csv`
  *    directory mirror becomes `write.partitionBy("year","event","session")`
  *    — one distributed job instead of a file-at-a-time os.walk; readers get
  *    partition pruning for free (S7/S8 become `WHERE year=… AND event=…`,
  *    which Catalyst turns into partition filters on the file index — no data
  *    is listed, let alone read, outside the selected session).
  *  - S4: the transformer's string-first CSV read with an explicit NA-token
  *    list → schema-on-read all-strings + nullValue/nanValue options.
  *  - S6: inferred-schema CSV + `@st.cache_data` memo → inferSchema + .cache().
  *
  * At 100 TB: parquet + partition keys (year/event/session) keeps any
  * per-session query touching only its own files; cross-session analytics
  * scan columnar data with pushed filters. CSV exists only at the ingest edge.
  */
object Ingest {
  val partitionKeys: Seq[String] = Seq("year", "event", "session")

  /** S4: raw string-schema CSV source with the reference's NA-token list
    * (f1_dataTransformer.py:132-134). */
  def readRawCsv(spark: SparkSession, path: String, table: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("nullValue", "")
      .option("mode", "PERMISSIVE")
      .schema(Schemas.allStrings(Schemas.tables(table)))
      .csv(path)

  /** S6: inferred-schema CSV source (dashboard-style). */
  def readInferredCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  /** S3: partitioned parquet sink — the engine's canonical storage layout. */
  def writePartitioned(df: DataFrame, baseDir: String, table: String): Unit =
    df.write
      .partitionBy(partitionKeys: _*)
      .mode(SaveMode.Overwrite)
      .parquet(s"$baseDir/$table")

  /** S5/S7: partition-aware read over the layout written above. Partition
    * columns (year/event/session) come back as columns; filters on them prune
    * at the file index (S8). */
  def readPartitioned(spark: SparkSession, baseDir: String, table: String): DataFrame =
    spark.read.parquet(s"$baseDir/$table")
}
