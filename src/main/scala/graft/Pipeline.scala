package graft

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.Schemas._
import graft.operators._

/**
 * End-to-end KG construction (north rule): mention detection → decode →
 * me-sub/dedup → triple extraction, then linking, conv-window coref,
 * corpus-level canonicalization and nodes/edges materialize.
 *
 * Shuffle budget (SURVEY.md §4.3): the extraction core (detect → decode →
 * dedup → triples) is one NARROW stage — token/entity state is nested per
 * row, so a 10^12-turn input runs it embarrassingly parallel. Wide stages
 * are only (1) conv_id repartition for coref, (2) the blocked alias
 * self-join, (3) connected-components iterations.
 */
object Pipeline {

  /** turns -> triples (pre-canonicalization). Narrow end-to-end. */
  def extract(spark: SparkSession, turns: Dataset[Turn]): Dataset[Triple] = {
    val bc = spark.sparkContext.broadcast(Detector.buildModel())
    val tagged = Detector.detect(spark, turns, bc)
    val decoded = Decode.decode(spark, tagged)
    Triples.triples(spark, decoded)
  }

  /** turns -> decoded turns (exposed for linking/coref stages). */
  def decodeTurns(spark: SparkSession, turns: Dataset[Turn]): Dataset[DecodedTurn] = {
    val bc = spark.sparkContext.broadcast(Detector.buildModel())
    Decode.decode(spark, Detector.detect(spark, turns, bc))
  }
}
