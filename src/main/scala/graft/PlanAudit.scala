package graft
import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    println(s"===== entry() smoke (driver t1): rows=${SparkEntry.entry(spark).count()} =====")
    println("===== extract() object pipeline (must be fused, no Exchange) =====")
    val t = synth.TranscriptGen.generate(spark, 5L)
    println(Pipeline.extract(spark, t).queryExecution.executedPlan.toString)
    for (q <- Seq("q_ngram_jaccard", "q_embed_topk", "q_dedup_exact",
        "q_minhash_pairs", "q_embed_lsh_pairs", "q_topk_customers",
        "q_word_pairs_lev")) {
      println(s"===== $q =====")
      val df = SparkEntry.queries(q)(spark, d)
      df.collect()
      println(df.queryExecution.executedPlan.toString.take(3500))
    }
    spark.stop()
  }
}
