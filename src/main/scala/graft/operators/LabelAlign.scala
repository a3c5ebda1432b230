package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Gazetteer

/**
 * Training-side label alignment (SURVEY.md §2.8 D8 = J3 interval join +
 * W4 first-subtoken selection; reference: src/model/tokenize.py:13-39):
 * a token whose char span [tok_start, tok_end) is CONTAINED in an
 * annotation span [ner_start, ner_end) inherits the span's tag (first
 * matching span wins — the reference `break`s on the first hit); the
 * first subtoken of each word gets the tag id, non-first subtokens get
 * the sentinel -100.
 *
 * Physical shape: the interval containment join is keyed by `doc` FIRST
 * (equi-join on the document id) so the theta part (range containment)
 * only runs within one document's tokens x spans — never a global
 * cartesian. At 100 TB the equi-key makes this a plain shuffled hash
 * join; AQE handles skewed documents.
 */
object LabelAlign {

  /**
   * tokens(doc, pos, word_id, tok_start, tok_end) x
   * spans(doc, ner_start, ner_end, tag) -> (doc, pos, label_id).
   */
  def align(spark: SparkSession, tokens: DataFrame, spans: DataFrame): DataFrame = {
    val tagId = typedLit(Gazetteer.TagToId)
    val joined = tokens.as("t").join(spans.as("s"),
      col("t.doc") === col("s.doc") &&
        col("t.tok_start") >= col("s.ner_start") &&
        col("t.tok_end") <= col("s.ner_end"),
      "left_outer")
    // first matching span wins (reference break at tokenize.py:27-34).
    // The reference iterates the NER LIST in order — if the spans carry
    // their list position (`ner_idx`, emitted by VideoPipeline.spanRows),
    // that is the tiebreak; otherwise fall back to (ner_start, ner_end)
    // (identical whenever spans don't overlap).
    val ord =
      if (spans.columns.contains("ner_idx"))
        Seq(col("s.ner_idx").asc_nulls_last)
      else Seq(col("s.ner_start").asc_nulls_last,
        col("s.ner_end").asc_nulls_last)
    val w = Window.partitionBy(col("t.doc"), col("t.pos")).orderBy(ord: _*)
    val first = joined.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
    // W4: first subtoken of each word carries the label; non-first
    // subtokens and special tokens (word_id null = HF word_id None,
    // tokenize.py:22-23) get the -100 sentinel. `previous_word_id`
    // updates UNCONDITIONALLY in the reference (including None rows), so
    // a plain lag is the exact transcription.
    val wWord = Window.partitionBy(col("doc")).orderBy(col("pos"))
    first.select(col("t.doc").as("doc"), col("t.pos").as("pos"),
      col("t.word_id").as("word_id"), col("s.tag").as("tag"))
      .withColumn("first_subtok",
        lag("word_id", 1).over(wWord).isNull ||
          lag("word_id", 1).over(wWord) =!= col("word_id"))
      .withColumn("label_id",
        when(col("word_id").isNull, lit(-100))
          .when(!col("first_subtok"), lit(-100))
          .when(col("tag").isNull, lit(0))
          .otherwise(coalesce(tagId(col("tag")), lit(0))))
      .select("doc", "pos", "label_id")
  }
}
