package graft.operators

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Dataset, SparkSession}
import graft.Gazetteer
import graft.Schemas._
import graft.functions.PyText

/**
 * Mention detection (SURVEY.md §2.8 M1): the deterministic replacement for
 * the reference's ONNX token classifier (src/model/ModelWrapper.py:128-139;
 * argmax at src/prod.py:38).
 *
 * Physical shape — the scale-critical part:
 *  - the Aho-Corasick automaton over all gazetteer surfaces is built ONCE
 *    on the driver and broadcast (the analog of per-process model load +
 *    warmup, src/prod.py:14-15);
 *  - detection runs as `mapPartitions` over `Dataset[Turn]`: per-partition
 *    the broadcast value is dereferenced once, then thousands of turns
 *    stream through with zero per-row setup — a NARROW transformation, so
 *    the whole detect→decode→dedup→triple core needs NO shuffle;
 *  - matching is case-insensitive (text lowercased with Locale.ROOT) and
 *    token-aligned: a hit must start on a token start and end on a token
 *    end (or the token's word-core end, before its `[.!]*` suffix), which
 *    reproduces "the model tags whole words";
 *  - overlaps resolve leftmost-longest, then gazetteer priority, then
 *    pattern id — fully deterministic under any partitioning.
 */
object Detector {

  /** Broadcastable detector state: automaton + per-pattern tag/priority. */
  final case class Model(ac: AhoCorasick, tags: Array[String],
      priority: Array[Int]) extends Serializable

  def buildModel(entries: Seq[Gazetteer.Entry] = Gazetteer.entries): Model = {
    // one automaton pattern per distinct lowercased surface; tag of a
    // surface = the entry with min (priority, gazetteer order) — same
    // deterministic rule as Gazetteer.linkIndex.
    val byLower = scala.collection.mutable.LinkedHashMap
      .empty[String, Gazetteer.Entry]
    entries.sortBy(_.priority).foreach { e =>
      val k = e.surface.toLowerCase(java.util.Locale.ROOT)
      if (!byLower.contains(k)) byLower(k) = e
    }
    val pats = byLower.keys.toArray
    Model(AhoCorasick.build(pats), byLower.values.map(_.tag).toArray,
      byLower.values.map(_.priority).toArray)
  }

  /** Tag one turn's tokens. Returns the per-token tag array ("O" default). */
  def tagTokens(model: Model, text: String, toks: Array[Token]): Array[String] = {
    val tags = Array.fill(toks.length)("O")
    if (toks.isEmpty) return tags
    val lower = text.toLowerCase(java.util.Locale.ROOT)
    // boundary sets for token alignment
    val starts = new java.util.HashMap[Integer, Integer]() // start -> tok idx
    val ends = new java.util.HashSet[Integer]()
    var i = 0
    while (i < toks.length) {
      starts.put(toks(i).start, i)
      ends.add(toks(i).end)
      // word-core end: strip the [.!]* suffix the tokenizer keeps attached
      var e = toks(i).end
      while (e > toks(i).start &&
          (text.charAt(e - 1) == '.' || text.charAt(e - 1) == '!')) e -= 1
      if (e > toks(i).start) ends.add(e)
      i += 1
    }
    // collect aligned candidate matches
    val raw = model.ac.findAll(lower)
    val cands = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)] // (start, end, pid)
    raw.foreach { case (pid, end) =>
      val start = end - model.ac.patterns(pid).length
      if (starts.containsKey(start) && ends.contains(end))
        cands += ((start, end, pid))
    }
    // leftmost-longest non-overlapping, priority tiebreak
    val sorted = cands.sortBy { case (s, e, pid) =>
      (s, -(e - s), model.priority(pid), pid)
    }
    var occupiedUntil = -1
    sorted.foreach { case (s, e, pid) =>
      if (s >= occupiedUntil) {
        occupiedUntil = e
        val tag = model.tags(pid)
        val first = starts.get(s)
        var k = first
        while (k < toks.length && toks(k).end <= e) {
          if (toks(k).start >= s) tags(k) = tag
          k += 1
        }
        // a token whose word-core end == e (match ends before its [.!]*
        // suffix) is still fully claimed by the match
        if (k < toks.length && toks(k).start < e) tags(k) = tag
      }
    }
    tags
  }

  /** turns -> tokenized + tagged turns (narrow; no shuffle). */
  def detect(spark: SparkSession, turns: Dataset[Turn],
      bc: Broadcast[Model]): Dataset[TaggedTurn] = {
    import spark.implicits._
    turns.mapPartitions { it =>
      val model = bc.value // dereferenced once per partition
      it.map { t =>
        val toks = PyText.tokenizeWithOffsets(t.text)
        TaggedTurn(t.conv_id, t.turn_idx, t.role, t.tool, t.text,
          toks.toIndexedSeq, tagTokens(model, t.text, toks).toIndexedSeq)
      }
    }
  }
}
