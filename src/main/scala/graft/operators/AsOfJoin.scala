package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of join (brief §custom operators): for each left row, the single
 * right row with the greatest right.time <= left.time within the same
 * key — the temporal lookup Spark lacks natively.
 *
 * Implementation follows preference order (a): COMPOSE existing operators
 * instead of a custom SparkPlan — the classic union-and-carry trick:
 * tag both sides, union, then one window per key ordered by (time, side)
 * carries the latest right payload forward with last(ignoreNulls); left
 * rows then read the carried value. Cost: ONE shuffle on the key (the
 * same partitioning both inputs would need anyway), no theta join, no
 * per-row probe — survives arbitrarily large sides. Right rows at exactly
 * left.time match (<=, ASOF convention).
 */
object AsOfJoin {

  /**
   * left(key, time, ...), right(key, time, payload) ->
   * left columns + `payload` of the as-of matched right row (inner:
   * unmatched left rows dropped).
   */
  def asOf(left: DataFrame, right: DataFrame, key: String, time: String,
      payload: String): DataFrame = {
    val l = left.withColumn("__side", lit(1))
      .withColumn("__p", lit(null).cast(right.schema(payload).dataType))
    val r = right.select(col(key), col(time),
      col(payload).as("__p")).withColumn("__side", lit(0))
    val unioned = l.select((Seq(col(key), col(time), col("__side"), col("__p")) ++
      left.columns.filterNot(c => c == key || c == time)
        .map(c => left(c))): _*)
      .unionByName(r, allowMissingColumns = true)
    // right rows sort BEFORE left rows at equal time (side 0 < 1), so a
    // same-instant right row is visible to the left row (<= semantics).
    // __p breaks ties between right rows sharing (key, time): last(...)
    // then deterministically picks the MAX payload at the tied instant
    // regardless of partitioning/run (left rows carry null __p, which
    // sorts first under asc and never reorders across sides).
    val w = Window.partitionBy(col(key))
      .orderBy(col(time).asc, col("__side").asc, col("__p").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(payload, last(col("__p"), ignoreNulls = true).over(w))
      .where(col("__side") === 1 && col(payload).isNotNull)
      .drop("__side", "__p")
  }
}
