package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.Schemas._

/**
 * Window coreference within each conversation (north rule: "window-based
 * coreference within each conv_id ordered by turn_idx") — the corpus
 * generalization of the reference's first-person substitution
 * (src/prod.py:119-125; D3 already handles me/myself/i row-locally).
 *
 * Semantics: a turn that contains an anaphor token ("it" / "that" +
 * "song|track|tune") and has NO title entity of its own refers to the
 * most recent TITLE entity within the previous `window` turns of the same
 * conversation. Emits (doc_key, refers_to, title) triples.
 *
 * Physical shape — the scale-critical part: this is the pipeline's ONE
 * intentional wide stage over turns. Instead of groupByKey (which would
 * materialize whole conversations — unbounded for hot convs), we
 *   repartition(conv_id) + sortWithinPartitions(conv_id, turn_idx)
 *   + mapPartitions with a streaming per-conversation state machine
 * holding only the last `window` titles — O(window) memory per task no
 * matter how hot the conversation (SURVEY.md §4.3 skew note; W5 stable
 * turn ordering).
 */
object Coref {

  /** Shared with [[SkewSalting.corefSalted]] — ONE anaphor definition,
    * so the salted and unsalted paths cannot drift apart. */
  private[operators] val anaphor = java.util.regex.Pattern.compile(
    "(?i)\\b(it|that (song|track|tune))\\b")

  final case class CorefLink(conv_id: String, turn_idx: Int,
      antecedent: String, antecedent_turn: Int)

  def resolve(spark: SparkSession, decoded: Dataset[DecodedTurn],
      window: Int = 5): Dataset[CorefLink] = {
    import spark.implicits._
    // prune BEFORE the exchange: the anaphor regex runs on the narrow
    // side and only (conv_id, turn_idx, anaphor?, titles) is shuffled —
    // text/role/tool/non-TITLE entities never cross the wire (the same
    // boundary-pruning lesson as the fused extraction path; the salted
    // variant in SkewSalting.corefSalted does the same)
    decoded
      .map { d =>
        val titles = d.entities.collect { case e if e.tag == "TITLE" => e.text }
        (d.conv_id, d.turn_idx,
          titles.isEmpty && d.text != null && anaphor.matcher(d.text).find(),
          titles)
      }
      .toDF("conv_id", "turn_idx", "anaphor", "titles")
      .repartition(col("conv_id"))
      .sortWithinPartitions(col("conv_id"), col("turn_idx"))
      .as[(String, Int, Boolean, Seq[String])]
      .mapPartitions { it =>
        var conv: String = null
        // ring of (turn_idx, title) seen in the current conversation
        var recent = List.empty[(Int, String)]
        it.flatMap { case (convId, turnIdx, ana, titles) =>
          if (convId != conv) { conv = convId; recent = Nil }
          val out =
            if (ana) {
              recent.find { case (ti, _) => turnIdx - ti <= window }
                .map { case (ti, t) => CorefLink(convId, turnIdx, t, ti) }
                .toSeq
            } else Seq.empty
          // update state AFTER resolving (a turn can't be its own antecedent)
          titles.foreach { t =>
            recent = ((turnIdx, t)) :: recent.take(window)
          }
          out
        }
      }
  }

  /** Coref links as refers_to triples (distinct predicate — excluded from
    * the reference-parity gate by construction, FIXTURES.md §3). */
  def triples(spark: SparkSession, links: Dataset[CorefLink]): Dataset[Triple] = {
    import spark.implicits._
    links.map(l => Triple(s"${l.conv_id}#${l.turn_idx}", "refers_to",
      l.antecedent, l.conv_id, l.turn_idx, s"coref:recency@${l.antecedent_turn}"))
  }

  private def col(n: String) = org.apache.spark.sql.functions.col(n)
}
