package graft

import org.apache.spark.sql.SparkSession
import graft.synth.TranscriptGen

/** Materialize the scaling-bench input once for manual BenchLeg
  * experiments (methodology work; the driver path uses Bench.main). */
object BenchPrep {
  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "/tmp/bench_turns"
    val convs = if (args.length > 1) args(1).toLong else 200000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    TranscriptGen.generate(spark, convs).repartition(128)
      .write.mode("overwrite").parquet(out)
    val n = Pipeline.extract(spark,
      spark.read.parquet(out).as[Schemas.Turn](
        org.apache.spark.sql.Encoders.product[Schemas.Turn])).count()
    println(s"BENCHPREP path=$out triples=$n")
    spark.stop()
  }
}
