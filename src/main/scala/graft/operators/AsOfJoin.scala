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
    // the carried value is WRAPPED in a single-field struct: the struct is
    // non-null for every right row even when the payload itself is null,
    // so last(ignoreNulls) distinguishes "matched a right row whose
    // payload is null" (ASOF semantics: the match is on time) from "no
    // right row yet" — carrying the bare payload conflated the two and a
    // null-payload as-of match silently inherited an OLDER non-null one.
    // Payload types must be orderable (the tie-break below) — map-typed
    // payloads are unsupported, as they are in a plain ORDER BY.
    val pType = right.schema(payload).dataType
    val carrierType = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("v", pType)))
    val l = left.withColumn("__side", lit(1))
      .withColumn("__p", lit(null).cast(carrierType))
    val r = right.select(col(key), col(time),
      struct(col(payload).as("v")).as("__p")).withColumn("__side", lit(0))
    val unioned = l.select((Seq(col(key), col(time), col("__side"), col("__p")) ++
      left.columns.filterNot(c => c == key || c == time)
        .map(c => left(c))): _*)
      .unionByName(r, allowMissingColumns = true)
    // right rows sort BEFORE left rows at equal time (side 0 < 1), so a
    // same-instant right row is visible to the left row (<= semantics).
    // __p breaks ties between right rows sharing (key, time): last(...)
    // then deterministically picks the MAX payload at the tied instant
    // regardless of partitioning/run (left rows carry a null struct,
    // which sorts first under asc and never reorders across sides).
    val w = Window.partitionBy(col(key))
      .orderBy(col(time).asc, col("__side").asc, col("__p").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .where(col("__side") === 1 && col("__m").isNotNull)
      .withColumn(payload, col("__m").getField("v"))
      .drop("__side", "__p", "__m")
  }
}
