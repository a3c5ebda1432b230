package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Evaluation + training-prep operators (SURVEY.md §2.4 A2/A7, §2.6 O1/O4)
 * — the reference's sklearn metric and class-weight semantics re-expressed
 * as distributed aggregations.
 */
object Metrics {

  /**
   * A7 (src/model/model.py:34-77): masked token classification metrics.
   * Input: (gold, pred) label-id pairs; rows with gold = -100 are excluded
   * (P6, model.py:107-113). All heavy lifting is ONE groupBy(gold, pred)
   * confusion-count aggregation; the per-class arithmetic happens on the
   * (numClasses^2-row) driver side — the scalable shape for any corpus.
   *
   * Returns (accuracy, f1_micro, f1_macro, f1_weighted, perClassF1).
   */
  final case class Eval(accuracy: Double, f1Micro: Double, f1Macro: Double,
      f1Weighted: Double, perClassF1: Map[Int, Double])

  def evaluate(pairs: DataFrame, numClasses: Int): Eval = {
    val conf = pairs.where(col("gold") =!= -100)
      .groupBy("gold", "pred").agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val classes = 0 until numClasses
    val support = classes.map(c => c -> conf.collect {
      case ((g, _), n) if g == c => n }.sum).toMap
    val tp = classes.map(c => c -> conf.getOrElse((c, c), 0L)).toMap
    val fp = classes.map(c => c -> conf.collect {
      case ((g, p), n) if p == c && g != c => n }.sum).toMap
    val fn = classes.map(c => c -> conf.collect {
      case ((g, p), n) if g == c && p != c => n }.sum).toMap
    def f1(c: Int): Double = {
      val (t, p0, n0) = (tp(c).toDouble, fp(c).toDouble, fn(c).toDouble)
      if (2 * t + p0 + n0 == 0) 0.0 else 2 * t / (2 * t + p0 + n0)
    }
    val total = conf.values.sum.toDouble
    val correct = tp.values.sum.toDouble
    val tpAll = tp.values.sum.toDouble
    val fpAll = fp.values.sum.toDouble
    val fnAll = fn.values.sum.toDouble
    val micro = if (2 * tpAll + fpAll + fnAll == 0) 0.0
      else 2 * tpAll / (2 * tpAll + fpAll + fnAll)
    val present = classes // sklearn averages over ALL labels passed
    val macroF1 = present.map(f1).sum / present.size
    val weighted = if (total == 0) 0.0
      else present.map(c => f1(c) * support(c)).sum / total
    Eval(if (total == 0) 0.0 else correct / total, micro, macroF1, weighted,
      classes.map(c => c -> f1(c)).toMap)
  }

  /**
   * A2 (src/model/train.py:121-135): balanced class weights
   * total / (num_classes * count(c)), zero-count -> 1.0. Computed with one
   * groupBy, collected (numClasses rows) and meant to be broadcast.
   */
  def classWeights(labels: DataFrame, numClasses: Int): Map[Int, Double] = {
    val counts = labels.where(col("label") =!= -100)
      .groupBy("label").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val total = counts.values.sum.toDouble
    (0 until numClasses).map { c =>
      val n = counts.getOrElse(c, 0L)
      c -> (if (n == 0) 1.0 else total / (numClasses * n.toDouble))
    }.toMap
  }

  /** O1 (src/data/split_dataset.py:7): random 80/20 split — seeded here
    * (the reference is unseeded; determinism gate requires the seed). */
  def trainValSplit(df: DataFrame, seed: Long = 42L): (DataFrame, DataFrame) = {
    val parts = df.randomSplit(Array(0.8, 0.2), seed)
    (parts(0), parts(1))
  }

  /** O2 (src/model/train.py:159-161): shuffle + stable length sort, the
    * uniform-work-per-batch trick; a seeded CONTENT hash replaces the
    * reference's unseeded sample(frac=1). Not `rand(seed)`: Spark seeds
    * rand per PARTITION (seed + partitionIndex), so its order changes
    * with parallelism/repartitioning — xxhash64 over the row is the same
    * pseudo-random tie-break under ANY partitioning, the determinism
    * discipline the rest of the engine keeps. Map-typed columns are left
    * out of the hash (Spark's hash expressions reject MapType — its
    * iteration order is undefined, the same reason maps can't be sort
    * keys); rows identical on every non-map column keep an arbitrary
    * relative order, which no downstream consumer can observe since the
    * rows differ at most in map columns that compare unordered anyway. */
  def lengthSortedShuffle(df: DataFrame, arrayCol: String,
      seed: Long = 42L): DataFrame = {
    def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = {
      import org.apache.spark.sql.types._
      dt match {
        case _: MapType => false
        case s: StructType => s.fields.forall(f => hashable(f.dataType))
        case a: ArrayType => hashable(a.elementType)
        case _ => true
      }
    }
    val cols = df.schema.fields.filter(f => hashable(f.dataType))
      .map(f => col(f.name))
    df.orderBy(size(col(arrayCol)), xxhash64(lit(seed) +: cols.toSeq: _*))
  }

  /** O4 (src/config/config.py:17): per-row truncation cap — a per-row
    * LIMIT, not a global one. */
  def truncateTokens(tokens: org.apache.spark.sql.Column, maxLen: Int = 512)
      : org.apache.spark.sql.Column =
    slice(tokens, 1, maxLen)
}
