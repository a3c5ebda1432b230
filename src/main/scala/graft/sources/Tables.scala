package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/**
 * Source/sink helpers (SURVEY.md §2.1): explicit-schema reads so stage
 * chaining never re-infers types (the reference re-infers dtypes on every
 * pd.read_json round-trip — S3).
 */
object Tables {

  /** S3: JSON scan with EXPLICIT schema (never schema inference in a
    * pipeline — inference is a full extra pass and type-unstable). */
  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** S2: JSON sink (line-delimited; the reference's pretty-printed
    * array-of-records JSON does not scale past one process). */
  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Parquet with explicit schema assertion: fails fast on drift. */
  def readParquet(spark: SparkSession, path: String,
      expect: Option[StructType] = None): DataFrame = {
    val df = spark.read.parquet(path)
    expect.foreach { s =>
      require(df.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
        s.fields.map(f => (f.name, f.dataType)).toSeq,
        s"schema drift at $path: got ${df.schema.simpleString}, want ${s.simpleString}")
    }
    df
  }

  /** S1 option wiring as a pure map — the part of the JDBC path that CAN
    * be unit-tested in this zero-egress sandbox (key spelling is the
    * contract; a typo silently disables partitioned reads). */
  def jdbcOptions(url: String, table: String, partitionColumn: String,
      lowerBound: Long, upperBound: Long,
      numPartitions: Int): Map[String, String] = Map(
    "url" -> url,
    "dbtable" -> table,
    "partitionColumn" -> partitionColumn,
    "lowerBound" -> lowerBound.toString,
    "upperBound" -> upperBound.toString,
    "numPartitions" -> numPartitions.toString)

  /** S1: the production JDBC scan shape (reference: src/data/database.py:
    * 24-43 — PostgreSQL joins pushed to the source via `dbtable` subquery,
    * partitioned read on the numeric key). Executed end-to-end by
    * SourcesSpec against embedded Derby (the sandbox has no network DB):
    * partitioned range scan + the reference's 3-way join shape + filter
    * pushdown; the option wiring is pinned by the same spec. */
  def readJdbc(spark: SparkSession, url: String, table: String,
      partitionColumn: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int): DataFrame =
    spark.read.format("jdbc")
      .options(jdbcOptions(url, table, partitionColumn, lowerBound,
        upperBound, numPartitions))
      .load()
}
