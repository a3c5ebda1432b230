package graft.synth

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import graft.Gazetteer
import graft.Schemas.Turn

/**
 * Deterministic synthetic transcript generator (FIXTURES.md §1).
 *
 * Properties:
 *  - pure function of (seed, convIdx, turnIdx) — identical output under any
 *    partitioning / parallelism (determinism gate, SURVEY.md §5.2-5);
 *  - Zipf-skewed turns-per-conversation (hot-conversation skew fixture for
 *    the salting path, SURVEY.md §4.3);
 *  - a controlled fraction of turns embeds gazetteer-derived music-metadata
 *    sentences so detect/link/coref/triple stages have known signal;
 *  - CJK + Hungarian + astral-plane strings included to pin tokenizer and
 *    UTF-16 behavior (TokenizerCustom.py:9, src/prod.py:20-24);
 *  - generation is DISTRIBUTED: spark.range over conv ids, flatMap to
 *    turns — the 10^12-turn analog would generate (or read) partitions
 *    independently the same way.
 */
object TranscriptGen {

  private val epochMs = 1767225600000L // 2026-01-01T00:00:00Z, fixed

  private val fillerWords = Array(
    "anyway", "so", "the", "stream", "was", "fun", "today", "we", "talked",
    "about", "music", "and", "games", "thanks", "for", "watching", "next",
    "week", "more", "songs", "🎵", "🎸", "頑張って", "köszönöm")

  private val roles = Array("user", "assistant")

  /** Mixed-radix deterministic PRNG seeded from (genSeed, conv, turn). */
  private final class Rng(seed: Long) {
    private var s = seed * 0x9E3779B97F4A7C15L + 0xBF58476D1CE4E5B9L
    def nextLong(): Long = {
      s ^= s >>> 30; s *= 0xBF58476D1CE4E5B9L
      s ^= s >>> 27; s *= 0x94D049BB133111EBL
      s ^= s >>> 31
      s
    }
    def nextInt(n: Int): Int = {
      val v = (nextLong() >>> 1) % n
      v.toInt
    }
    def pick[T](xs: Seq[T]): T = xs(nextInt(xs.length))
  }

  /** Zipf-ish conversation length: a handful of hot conversations, long
    * tail of short ones. Deterministic in convIdx. */
  def convLength(convIdx: Long, avg: Int): Int = {
    if (convIdx % 1000 == 0) avg * 40 // hot conv: 40x the mean (skew driver)
    else {
      val r = new Rng(convIdx * 31 + 7)
      2 + r.nextInt(2 * avg - 2)
    }
  }

  /** One turn's text + tool, pure in (seed, convIdx, turnIdx). */
  def turnText(seed: Long, convIdx: Long, turnIdx: Int): (String, String) = {
    val r = new Rng(seed ^ (convIdx * 1000003L + turnIdx))
    val g = Gazetteer
    def t = r.pick(g.titles); def a = r.pick(g.authors)
    def v = r.pick(g.vocaloids); def al = r.pick(g.albums)
    def vo = r.pick(g.vocalists); def p = r.pick(g.miscPersons)
    def f = r.pick(g.featuring); def at = r.pick(g.altTitles)
    def filler(n: Int): String =
      (0 until n).map(_ => r.pick(fillerWords.toSeq)).mkString(" ")
    r.nextInt(10) match {
      case 0 => (s"Check out $t covered by $a", null)
      case 1 => (s"$t feat. $f from the album $al", null)
      case 2 => (s"Have you heard $t by $a ? vocals by $vo", null)
      case 3 => (s"$t ( also known as $at ) sung by $v", null)
      case 4 => (s"I think $p produced $t", null)
      case 5 => (s"$t was remixed by me", null)
      case 6 => (s"lookup result: $t — $a — $al", "search_music")
      case 7 => (s"${filler(4)} $t arranged by $a ${filler(3)}", null)
      case 8 => (r.pick(Seq( // anaphora turns for the coref stage
        "honestly it deserves an award",
        "I listened to that song all week",
        "it keeps looping in my head")), null)
      case 9 => r.nextInt(3) match {
        // adjacent same-tag titles: exercises the reference decode quirk
        // (adjacent same-tag spans merge into ONE entity, src/prod.py:67-69)
        case 0 => (s"$t $t medley by $a", null)
        // quoted title: quote/paren context around entities
        case 1 => (s""""$t" by $a ( official )""", null)
        case _ => (filler(6 + r.nextInt(10)), null)
      }
      case _ => (filler(6 + r.nextInt(10)), null)
    }
  }

  def turnsOfConv(seed: Long, convIdx: Long, avgLen: Int): Seq[Turn] = {
    val n = convLength(convIdx, avgLen)
    (0 until n).map { i =>
      val (text, tool) = turnText(seed, convIdx, i)
      val role = if (tool != null) "tool" else roles(i % roles.length)
      Turn(f"conv$convIdx%08d", i, role, text, tool,
        new Timestamp(epochMs + convIdx * 3600000L + i * 30000L))
    }
  }

  /** Distributed generation: one task generates a contiguous conv range. */
  def generate(spark: SparkSession, nConvs: Long, avgLen: Int = 8,
      seed: Long = 42L): Dataset[Turn] = {
    import spark.implicits._
    spark.range(0, nConvs, 1,
        math.max(spark.sparkContext.defaultParallelism, 1))
      .flatMap(c => turnsOfConv(seed, c, avgLen))
  }

  /** Scale knob keyed off the driver's sf directory name. */
  def convsForSfDir(sfDir: String): Long =
    if (sfDir.contains("sf0.1")) 20000L
    else if (sfDir.contains("sf0.01")) 2000L
    else 200L
}
