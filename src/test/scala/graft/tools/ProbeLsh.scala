package graft.tools
import org.apache.spark.sql.functions._
import graft.operators.Similarity
object ProbeLsh {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (4 << 20).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](tag: String)(f: => A): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[probe] $tag ${(System.nanoTime() - t0) / 1e9}%.3fs")
    }
    val d = "/root/testdata/sf0.1"
    val emb0 = spark.read.parquet(s"$d/embeddings.parquet")
    emb0.count()
    val emb = emb0.select("vec_id", "embedding")
    val planted = emb.where(col("vec_id") < 20).select(
      (col("vec_id") + 1000000L).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        when(i === 0, x + lit(0.05f)).otherwise(x)).as("embedding"))
    val all = emb.unionByName(planted)
    val planes = Similarity.hyperplanes(64, 64)
    for (rep <- 1 to 2) {
      time(s"rep$rep all.count")(all.count())
      time(s"rep$rep banded.count") {
        all.select(col("vec_id"),
          posexplode(Similarity.lshBandHashes(col("embedding"), planes, 8)))
          .count()
      }
      val banded = all.select(col("vec_id"),
        posexplode(Similarity.lshBandHashes(col("embedding"), planes, 8)))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bh")
      time(s"rep$rep joinraw.count") {
        banded.as("a").join(banded.as("b"), Seq("band", "bh"))
          .where(col("a.vec_id") < col("b.vec_id")).count()
      }
      time(s"rep$rep cands.count") {
        banded.as("a").join(banded.as("b"), Seq("band", "bh"))
          .where(col("a.vec_id") < col("b.vec_id"))
          .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
          .distinct().count()
      }
      time(s"rep$rep full.count")(
        Similarity.lshCosinePairs(all, threshold = 0.9).count())
    }
    spark.stop()
  }
}
