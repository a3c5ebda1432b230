package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * The reference's token-level feature extractors (SURVEY.md §2.2/2.4/2.5:
 * J6, A3, A4, W1, W2, W3, F3, F6, F7), exact semantics of
 * src/model/feature_extraction.py. In the reference these are computed and
 * then literally zeroed out (feature_extraction.py:333-334 — dead on the
 * live path); here they are live detector-context signals and each is
 * pinned by the reference's own unit fixtures ported verbatim
 * (test/test_feature_extraction.py:8-48 -> FeaturesSpec).
 *
 * Two surfaces per feature:
 *  - a Scala function over one row's token array (used inside
 *    mapPartitions detectors, mirrors the reference's row-at-a-time shape);
 *  - where natural, a Column variant built from array HOFs
 *    (transform/filter/aggregate) that stays row-local and codegen'd —
 *    note NO shuffle: these are per-row projections even at 100 TB.
 */
object TextFeatures {

  /** J6 (feature_extraction.py:29-39): token is a substring of the
    * channel/speaker name AND matches the word guard. */
  def tokensContainingChannelName(tokens: Array[String], channelName: String): Array[Int] = {
    val ch = channelName.toLowerCase(java.util.Locale.ROOT)
    tokens.map { t0 =>
      val t = t0.toLowerCase(java.util.Locale.ROOT)
      if (ch.contains(t) && PyText.matchesChannelGuard(t)) 1 else 0
    }
  }

  /** A3 (feature_extraction.py:46-55): non-overlapping literal occurrence
    * count of each (lowercased) token in the (lowercased) text. */
  def countTokenOccurrences(tokens: Array[String], description: String): Array[Int] = {
    val d = description.toLowerCase(java.util.Locale.ROOT)
    tokens.map(t => PyText.countOccurrences(t.toLowerCase(java.util.Locale.ROOT), d))
  }

  /** Reference batch shape (feature_extraction.py:41-44). */
  def batch[A, B, C](f: (A, B) => C, as: Seq[A], bs: Seq[B]): Seq[C] =
    as.zip(bs).map { case (a, b) => f(a, b) }

  /** F7: token lengths. */
  def lengthOfTokens(tokens: Array[String]): Array[Int] = tokens.map(_.length)

  /** F3 (feature_extraction.py:61-68): "verbal" token flag. */
  def isTokenVerbal(tokens: Array[String]): Array[Int] =
    tokens.map(t => if (PyText.isVerbal(t.toLowerCase(java.util.Locale.ROOT))) 1 else 0)

  private val hashtagRe = "#(\\w+)".r
  private val linkRe = "(https?://[^\\s]+)".r

  /** A4 (feature_extraction.py:70-78): token appears among #hashtags. */
  def tokenAppearsInHashtags(tokens: Array[String], description: String): Array[Int] = {
    val tags = hashtagRe.findAllMatchIn(
      description.toLowerCase(java.util.Locale.ROOT)).map(_.group(1)).toSet
    tokens.map(t => if (tags.contains(t.toLowerCase(java.util.Locale.ROOT))) 1 else 0)
  }

  /** A4 (feature_extraction.py:80-87): token appears among links. */
  def tokenAppearsInLinks(tokens: Array[String], description: String): Array[Int] = {
    val links = linkRe.findAllMatchIn(
      description.toLowerCase(java.util.Locale.ROOT)).map(_.group(1)).toSet
    tokens.map(t => if (links.contains(t.toLowerCase(java.util.Locale.ROOT))) 1 else 0)
  }

  /** (feature_extraction.py:89-93): first len(title_tokens) tokens flagged. */
  def markTitleTokens(allTokens: Array[String], titleTokens: Array[String]): Array[Int] =
    allTokens.indices.map(i => if (i < titleTokens.length) 1 else 0).toArray

  /** W3: token distance from start. */
  def tokenDistanceFromStart(tokens: Array[String]): Array[Int] =
    tokens.indices.toArray

  /** F6 (feature_extraction.py:198-210): 4-way capitalization one-hot
    * class index (0=upper, 1=lower, 2=title, 3=mixed). */
  def tokenCapitalization(tokens: Array[String]): Array[Int] =
    tokens.map(PyText.capClass)

  /** W1 (feature_extraction.py:212-220): inside-quotes flag; the state
    * toggles on `"` `“` `”` BEFORE marking, so the opening quote
    * itself is marked 1 (reference quirk, FIXTURES.md §5). */
  def markTokensInsideQuotes(tokens: Array[String]): Array[Int] = {
    var inside = false
    tokens.map { t =>
      if (t == "\"" || t == "“" || t == "”") inside = !inside
      if (inside) 1 else 0
    }
  }

  private val openers = Set("(", "（", "[", "【", "〈", "《", "「", "『")
  private val closers = Set(")", "）", "]", "】", "〉", "》", "」", "』")

  /** W2 (feature_extraction.py:222-232): inside-parentheses flag —
    * NON-nesting boolean state (a single closer clears it); openers are
    * marked 1, closers 0 (state after update). */
  def markTokensInsideParentheses(tokens: Array[String]): Array[Int] = {
    var inside = false
    tokens.map { t =>
      if (openers.contains(t)) inside = true
      else if (closers.contains(t)) inside = false
      if (inside) 1 else 0
    }
  }

  /** F13 (VectorizerLanguage.py:4-15): language encoder. */
  def encodeLanguage(lang: String): Int = {
    if (lang == null) return 1
    lang.split("-")(0) match {
      case "ja" => 4; case "en" => 3; case "hu" => 2; case _ => 0
    }
  }

  /** D9 (feature_extraction.py:339-363, dead in reference): mask tokens
    * outside a keep-set as <oov>. */
  def maskTokens(tokens: Array[String], keep: Set[String]): Array[String] =
    tokens.map(t => if (keep.contains(t)) t else "<oov>")

  // ---- Column variants (row-local array HOFs; no UDF, no shuffle) ----

  /** A3 as a Column over (array<string> tokens, string text): count via
    * split-on-literal minus one (same non-overlapping semantics). */
  def countOccurrencesCol(tokens: Column, text: Column): Column =
    transform(tokens, t =>
      size(split(lower(text), regexp_replace(lower(t),
        "([\\\\^$.|?*+()\\[\\]{}])", "\\\\$1"), lit(-1))) - 1)

  /** J6 as a Column: substring containment + word guard. */
  def channelContainCol(tokens: Column, channel: Column): Column =
    transform(tokens, t =>
      when(instr(lower(channel), lower(t)) > 0 &&
        lower(t).rlike("([一-龠ぁ-ゔァ-ヴーａ-ｚＡ-Ｚ０-９々〆〤]+|[a-zA-Z0-9]+)"),
        1).otherwise(0))

  /** F14 (src/prod.py:38): argmax over a score array, 0-based; first
    * occurrence wins on ties (np.argmax semantics). */
  def argmaxCol(scores: Column): Column =
    (array_position(scores, array_max(scores)) - 1).cast("int")

  /** A4 as Columns: hashtag / link sets via regexp_extract_all. */
  def hashtagsCol(text: Column): Column =
    regexp_extract_all(lower(text), lit("(?U)#(\\w+)"), lit(1))
  def linksCol(text: Column): Column =
    regexp_extract_all(lower(text), lit("(?U)(https?://[^\\s]+)"), lit(0))
}
