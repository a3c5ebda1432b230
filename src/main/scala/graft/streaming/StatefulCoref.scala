package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.Schemas._
import graft.operators.{Coref, Decode, Detector}

/**
 * Stateful streaming coreference: the cross-batch generalization of
 * [[graft.operators.Coref]] using `flatMapGroupsWithState` — per-conv_id
 * state holds the last `window` TITLE mentions, so an anaphor arriving in
 * a LATER micro-batch still resolves to an antecedent seen earlier (the
 * batch version can only look within one pass).
 *
 * State is bounded: O(window) (turn_idx, title) pairs per live
 * conversation — the same memory discipline as the batch state machine,
 * enforced by construction rather than by watermark eviction (conversations
 * are finite; production would add a state TTL via
 * GroupStateTimeout.ProcessingTimeTimeout).
 */
object StatefulCoref {

  final case class ConvState(recent: List[(Int, String)], lastSeen: Int)

  private val anaphor = java.util.regex.Pattern.compile(
    "(?i)\\b(it|that (song|track|tune))\\b")

  def resolveStream(spark: SparkSession, turns: Dataset[Turn],
      window: Int = 5): Dataset[Coref.CorefLink] = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(Detector.buildModel())
    val decoded = Decode.decode(spark, Detector.detect(spark, turns, bc))
    decoded.groupByKey(_.conv_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (conv: String, it: Iterator[DecodedTurn], state: GroupState[ConvState]) =>
          val prev = state.getOption.getOrElse(ConvState(Nil, -1))
          var recent = prev.recent
          var last = prev.lastSeen
          val out = scala.collection.mutable.ArrayBuffer.empty[Coref.CorefLink]
          // micro-batch iterator order is not guaranteed: sort by turn_idx
          it.toSeq.sortBy(_.turn_idx).foreach { d =>
            val titles = d.entities.filter(_.tag == "TITLE")
            if (titles.isEmpty && d.text != null &&
              anaphor.matcher(d.text).find()) {
              recent.find { case (ti, _) => d.turn_idx - ti <= window }
                .foreach { case (ti, t) =>
                  out += Coref.CorefLink(conv, d.turn_idx, t, ti)
                }
            }
            titles.foreach { e =>
              recent = ((d.turn_idx, e.text)) :: recent.take(window)
            }
            last = math.max(last, d.turn_idx)
          }
          state.update(ConvState(recent, last))
          out.iterator
      }
  }
}
