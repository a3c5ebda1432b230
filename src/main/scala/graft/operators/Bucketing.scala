package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Bucketed co-located joins (SURVEY.md §4.2 / scale brief): for a join
 * that recurs across many jobs (e.g. triples ⋈ alias-map every pipeline
 * run, or fact ⋈ fact at 100 TB), pre-bucketing both sides on the join
 * key makes Spark read matching buckets pairwise — the shuffle is paid
 * ONCE at write time instead of on every join.
 *
 * This is the managed-table variant (`bucketBy` requires saveAsTable);
 * the same effect for ad-hoc data is `repartition(n, key)` on both sides
 * within one job. ScaleSpec asserts the bucketed join plan contains NO
 * Exchange.
 */
object Bucketing {

  /** Persist a DataFrame as a bucketed managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key: shuffle-free. */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
