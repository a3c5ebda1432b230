package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Schemas._
import graft.operators.{Decode, Detector, Triples}

/**
 * Optional Structured Streaming ingestion mode (SURVEY.md §2.10): the
 * reference's serving path is stateless request-at-a-time Flask
 * (src/prod.py:220-243); the streaming analog reads appended transcript
 * batches and runs the SAME narrow extraction core — detect -> decode ->
 * dedup -> triples are all per-row, so they lift to streaming unchanged
 * (no stateful operators required; the north rule handles resumability
 * via batch checkpoints instead).
 *
 * Late/duplicate data: watermark on `ts` + dropDuplicates on
 * (conv_id, turn_idx) — the per-turn idempotency key.
 */
object StreamingIngest {

  /** streaming turns -> streaming triples (append mode). */
  def tripleStream(spark: SparkSession, turns: Dataset[Turn],
      watermark: String = "10 minutes"): Dataset[Triple] = {
    val bc = spark.sparkContext.broadcast(Detector.buildModel())
    val deduped = turns
      .withWatermark("ts", watermark)
      .dropDuplicates("conv_id", "turn_idx")
    Triples.triples(spark,
      Decode.decode(spark, Detector.detect(spark, deduped, bc)))
  }

  /** File-source convenience: watch a directory of turn parquet files. */
  def fromParquetDir(spark: SparkSession, path: String): Dataset[Turn] = {
    import spark.implicits._
    spark.readStream
      .schema(org.apache.spark.sql.Encoders.product[Turn].schema)
      .parquet(path)
      .as[Turn]
  }

  /** Sink triples as parquet with a streaming checkpoint. */
  def startParquetSink(triples: Dataset[Triple], outPath: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    triples.writeStream
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .start()
}
