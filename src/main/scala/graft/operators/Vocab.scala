package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Vocabulary build + encode (SURVEY.md §2.4 A1 + §2.3 J5; reference:
 * src/vectorizer/VectorizerKerasTokenizer.py:37-56, dead code there,
 * live capability here).
 *
 * Build: explode tokens -> hash-aggregate counts -> top-K via
 * limit-then-rank (TopK.ranked: TakeOrderedAndProject, never a global
 * single-partition window) with the DETERMINISTIC id rule (count desc,
 * word asc) — the reference relies on Counter.most_common insertion
 * order, which is nondeterministic across runs; the tiebreak pins it.
 * Ids start at 2 (0 = pad, 1 = OOV, keras convention the reference
 * inherits). The vocabulary is driver-bounded by construction (it is
 * collected and broadcast for encode anyway).
 *
 * Encode: broadcast-map lookup with OOV default 1 (J5) — the degenerate
 * broadcast left join, row-local at any corpus size.
 */
object Vocab {

  /** (word, id) vocabulary of the top `size` words. */
  def build(docs: DataFrame, tokensCol: String, size: Int): DataFrame = {
    val counts = docs.select(explode(col(tokensCol)).as("word"))
      .where(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    TopK.ranked(counts, size, Seq(col("cnt").desc, col("word").asc), "id")
      .select(col("word"), (col("id") + 1).as("id"))
  }

  /** Encode token arrays with the broadcast vocabulary; OOV -> 1. */
  def encode(spark: SparkSession, docs: DataFrame, tokensCol: String,
      vocab: DataFrame): DataFrame = {
    val m: Map[String, Int] = vocab.collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    val mB = spark.sparkContext.broadcast(m)
    val enc = udf((toks: Seq[String]) =>
      if (toks == null) null else toks.map(t => mB.value.getOrElse(t, 1)))
    docs.withColumn("ids", enc(col(tokensCol)))
  }
}
