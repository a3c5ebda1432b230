package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.Gazetteer
import graft.Schemas._
import graft.functions.PyText

/**
 * Structured-result assembly + triple emission (SURVEY.md §2.8 D4-D7,
 * FIXTURES.md §3 deterministic triple rule).
 *
 * Per turn (the analog of the reference's per-document structured result,
 * src/prod.py:127-143):
 *  1. per-tag greedy dedup, exact reference order semantics
 *     ([[GreedyDedup.filterUniqueEntities]], src/prod.py:178-213);
 *  2. MODIFIER list lemmatized (src/config/config.py:23-28) then
 *     Python-titlecased (src/prod.py:139-143, [[PyText.pyTitle]]);
 *  3. triples: ∀ TITLE t (post-dedup order):
 *       (t, performed_by, x) ∀x∈ORIGINAL_AUTHOR; (t, featuring, x)
 *       ∀x∈FEATURING; (t, vocal_by, x) ∀x∈VOCALIST∪VOCALOID;
 *       (t, on_album, x) ∀x∈ALBUM; (t, modifier, x) ∀x∈MODIFIER;
 *       (t, alt_title, x) ∀x∈ALT_TITLE;
 *     plus (doc_key, mentions_person, x) ∀x∈MISC_PERSON,
 *     doc_key = "<conv_id>#<turn_idx>".
 *
 * Everything is row-local (entity lists are tiny, per-turn) — the triple
 * stage adds NO shuffle; at 10^12 turns it pipelines inside the same
 * narrow stage as detection.
 */
object Triples {

  private val resultTags = Seq("ORIGINAL_AUTHOR", "TITLE", "FEATURING",
    "MODIFIER", "VOCALOID", "MISC_PERSON", "VOCALIST", "ALT_TITLE", "ALBUM")

  /** Per-tag dedup + modifier normalization: the reference's structured
    * result as a Map(tag -> entity list), reference order preserved.
    *
    * Hot-path note: this runs once per turn of a 10^12-turn corpus, so
    * entities are grouped in ONE pass (the reference filters the list 9
    * times, src/prod.py:128-137 — same result, per-tag order preserved
    * either way since grouping keeps encounter order). */
  private val emptyResult: Map[String, Seq[String]] =
    resultTags.map(_ -> Seq.empty[String]).toMap

  def structuredResult(entities: Seq[Entity]): Map[String, Seq[String]] = {
    // fast path: most turns of a real corpus carry no entities at all —
    // share one immutable empty result instead of rebuilding it per turn
    if (entities.isEmpty) return emptyResult
    val grouped = new java.util.HashMap[String, scala.collection.mutable.ArrayBuffer[String]]()
    entities.foreach { e =>
      var b = grouped.get(e.tag)
      if (b == null) {
        b = new scala.collection.mutable.ArrayBuffer[String](4)
        grouped.put(e.tag, b)
      }
      b += e.text
    }
    val base = resultTags.map { tag =>
      val l = grouped.get(tag)
      tag -> (if (l == null) Seq.empty[String]
              else GreedyDedup.filterUniqueEntities(l.toSeq))
    }.toMap
    val mods = base("MODIFIER")
      .map(m => Gazetteer.ModifierLemmas.getOrElse(
        m.toLowerCase(java.util.Locale.ROOT),
        m.toLowerCase(java.util.Locale.ROOT)))
      .map(PyText.pyTitle)
    base.updated("MODIFIER", mods)
  }

  /** FIXTURES.md §3 triple rule over one turn's structured result. */
  def emit(convId: String, turnIdx: Int, result: Map[String, Seq[String]],
      evidence: String): Seq[Triple] = {
    // every triple hangs off a TITLE subject or a MISC_PERSON object —
    // the (majority) turns with neither emit nothing: skip all allocation
    if (result("TITLE").isEmpty && result("MISC_PERSON").isEmpty)
      return Seq.empty
    val docKey = s"$convId#$turnIdx"
    def tr(s: String, p: String, o: String) =
      Triple(s, p, o, convId, turnIdx, evidence)
    val out = scala.collection.mutable.ArrayBuffer.empty[Triple]
    result("TITLE").foreach { t =>
      result("ORIGINAL_AUTHOR").foreach(x => out += tr(t, "performed_by", x))
      result("FEATURING").foreach(x => out += tr(t, "featuring", x))
      (result("VOCALIST") ++ result("VOCALOID"))
        .foreach(x => out += tr(t, "vocal_by", x))
      result("ALBUM").foreach(x => out += tr(t, "on_album", x))
      result("MODIFIER").foreach(x => out += tr(t, "modifier", x))
      result("ALT_TITLE").foreach(x => out += tr(t, "alt_title", x))
    }
    result("MISC_PERSON").foreach(x => out += tr(docKey, "mentions_person", x))
    out.toSeq
  }

  /** decoded turns -> triples (narrow, row-local). */
  def triples(spark: SparkSession, decoded: Dataset[DecodedTurn]): Dataset[Triple] = {
    import spark.implicits._
    decoded.flatMap { d =>
      emit(d.conv_id, d.turn_idx, structuredResult(d.entities), "gazetteer:ac")
    }
  }
}
