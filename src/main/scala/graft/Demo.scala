package graft

import org.apache.spark.sql.SparkSession
import graft.synth.TranscriptGen

/** CLI surface: run the KG extraction pipeline end-to-end on synthetic
  * transcripts and print sample triples + counts.
  * Usage: runMain graft.Demo [nConvs] */
object Demo {
  def main(args: Array[String]): Unit = {
    val nConvs = if (args.nonEmpty) args(0).toLong else 200L
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val turns = TranscriptGen.generate(spark, nConvs)
    val triples = Pipeline.extract(spark, turns).cache()
    println(s"turns=${turns.count()} triples=${triples.count()}")
    triples.show(20, truncate = false)
    triples.groupBy("pred").count().orderBy("pred").show()
    // full checkpointed run: linking, coref, canonicalization, nodes/edges
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val (t, n, e) = Pipeline.runCheckpointed(spark, turns, ckpt)
    println(s"checkpointed: triples=${t.count()} nodes=${n.count()} edges=${e.count()} ckpt=$ckpt")
    n.orderBy(org.apache.spark.sql.functions.desc("n_mentions")).show(10, truncate = false)
    e.show(5, truncate = false)
    spark.stop()
  }
}
