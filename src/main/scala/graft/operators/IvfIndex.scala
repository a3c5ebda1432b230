package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * IVF (inverted-file) approximate nearest neighbor — the clustering
 * alternative to hyperplane LSH ([[Similarity]]): partition the corpus by
 * nearest centroid, probe only the nProbe closest cells per query.
 *
 * Scale shape:
 *  - centroid training is mini k-means over the corpus: assignment is a
 *    row-local argmin against the BROADCAST centroid set; the update step
 *    is one groupBy(cell, dim) mean over exploded dimensions — both
 *    linear scans, no pairwise blowup; centroids (k x dim doubles) always
 *    fit on the driver;
 *  - the search join is an equi-join on cell id, so work scales with
 *    corpus/k * nProbe per query instead of corpus size;
 *  - deterministic: init = first k vectors by vec_id, fixed iterations,
 *    ties broken by lowest cell id.
 */
object IvfIndex {

  /** Row-local: index of the nearest centroid (ties -> lowest index). */
  private def nearestUdf(centroids: Array[Array[Double]]) =
    udf { (v: Seq[Double]) =>
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < centroids.length) {
        var d = 0.0; var j = 0
        val ctr = centroids(c)
        val n = math.min(ctr.length, v.length)
        while (j < n) { val x = v(j) - ctr(j); d += x * x; j += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }

  /** Row-local: the nProbe nearest centroid ids (ascending distance). */
  private def probesUdf(centroids: Array[Array[Double]], nProbe: Int) =
    udf { (v: Seq[Double]) =>
      centroids.indices.map { c =>
        var d = 0.0; var j = 0
        val ctr = centroids(c)
        val n = math.min(ctr.length, v.length)
        while (j < n) { val x = v(j) - ctr(j); d += x * x; j += 1 }
        (d, c)
      }.sorted.take(nProbe).map(_._2)
    }

  /** Cast the embedding column to array<double> up front: ALL IVF
    * arithmetic (k-means, probing, the final cosine) then runs in double,
    * matching a double-precision oracle bit-for-bit and removing
    * float-accumulation rank instability near ties. */
  private def asDouble(df: DataFrame): DataFrame =
    df.withColumn("embedding", col("embedding").cast("array<double>"))

  /** Mini k-means (deterministic): init = first k by vec_id, `iters`
    * assignment/update rounds. Returns k x dim centroids. */
  def train(embeddings0: DataFrame, k: Int, iters: Int = 3): Array[Array[Double]] =
    trainCasted(asDouble(embeddings0), k, iters)

  /** [[train]] over an ALREADY double-cast (and ideally materialized)
    * table — the corpus plan is evaluated once per iteration plus the
    * init collect, so [[ivfTopK]] shares one lazily-checkpointed cast
    * across training AND the final cell assignment (r06: the old shape
    * re-scanned + re-cast the parquet corpus five times per query). */
  private def trainCasted(embeddings: DataFrame, k: Int,
      iters: Int): Array[Array[Double]] = {
    var centroids: Array[Array[Double]] = embeddings.orderBy("vec_id")
      .limit(k).select("embedding").collect()
      .map(_.getSeq[Double](0).toArray)
    var it = 0
    while (it < iters) {
      val assigned = embeddings.withColumn("cell",
        nearestUdf(centroids)(col("embedding")))
      // mean per (cell, dim) over exploded dimensions: one linear pass
      val sums = assigned
        .select(col("cell"), posexplode(col("embedding")))
        .groupBy("cell", "pos").agg(avg("col").as("m"))
        .collect()
      val next = centroids.map(_.clone())
      sums.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) = r.getDouble(2)
      }
      centroids = next
      it += 1
    }
    centroids
  }

  /** ANN top-k via IVF cells; output shape matches
    * [[Similarity.bruteForceTopK]] for recall measurement. With
    * nProbe == nCentroids every cell is probed and the result equals
    * exact brute force (the driver's q_embed_ivf_topk exactness gate). */
  def ivfTopK(queries0: DataFrame, corpus0: DataFrame, k: Int,
      nCentroids: Int = 16, nProbe: Int = 4, iters: Int = 3): DataFrame = {
    val queries = asDouble(queries0)
    val corpus = asDouble(corpus0).localCheckpoint(false) // see trainCasted
    val centroids = trainCasted(corpus, nCentroids, iters)
    val cells = corpus.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("ce"),
      nearestUdf(centroids)(col("embedding")).as("cell"))
    val probes = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("qe"),
      explode(probesUdf(centroids, nProbe)(col("embedding"))).as("cell"))
    val cands = cells.join(broadcast(probes), Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(Similarity.cosine(col("qe"), col("ce")), 6))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    cands.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }
}
