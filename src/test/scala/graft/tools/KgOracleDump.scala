package graft.tools

import graft.{Pipeline, ReferenceOracle}
import graft.functions.PyText
import graft.operators.Detector
import graft.synth.TranscriptGen
import org.apache.spark.sql.SparkSession

/**
 * TEST-ONLY generator for the driver-checkable KG gate (VERDICT r1 item
 * 9): computes the EXPECTED KG outputs at the driver's Verify scale
 * (sf0.01 = 2000 convs) from [[ReferenceOracle]] — the independent
 * transcription of src/prod.py:32-213 that shares no code with the
 * engine — and prints them as DuckDB VALUES literals for
 * SparkEntry.oracleSql, alongside the engine's own results so any
 * divergence is caught BEFORE the literals are embedded.
 *
 * Run: sbt -batch "Test/runMain graft.tools.KgOracleDump"
 */
object KgOracleDump {
  def main(args: Array[String]): Unit = {
    val nConvs = 2000L // == TranscriptGen.convsForSfDir("...sf0.01...")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // oracle path (independent transcription, single-threaded)
    val model = Detector.buildModel()
    val expected = (0L until nConvs).flatMap { c =>
      TranscriptGen.turnsOfConv(42L, c, 8).flatMap { t =>
        val toks = PyText.tokenizeWithOffsets(t.text).toIndexedSeq
        val tags = Detector.tagTokens(model, t.text, toks.toArray).toIndexedSeq
        ReferenceOracle.extract(t.conv_id, t.turn_idx, t.role, t.text, toks, tags)
          .map { case (s, p, o) => (t.conv_id, t.turn_idx, s, p, o) }
      }
    }

    // oracle path for the DECODE stage: per-tag entity counts after
    // decode + me-substitution (what Decode.mentions emits, pre-dedup)
    val oracleTagCounts: Map[String, Long] = (0L until nConvs).flatMap { c =>
      TranscriptGen.turnsOfConv(42L, c, 8).flatMap { t =>
        val toks = PyText.tokenizeWithOffsets(t.text).toIndexedSeq
        val tags = Detector.tagTokens(model, t.text, toks.toArray).toIndexedSeq
        ReferenceOracle.meSubstitute(
          ReferenceOracle.decode(t.text, toks, tags),
          if (t.role == null) "" else t.role).map(_._1)
      }
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap

    // engine path
    val turnsDs = TranscriptGen.generate(spark, nConvs)
    val engineTagCounts = graft.operators.Decode.mentions(spark,
        Pipeline.decodeTurns(spark, turnsDs)).toDF()
      .groupBy("tag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    println(s"mention tag counts MATCH: ${oracleTagCounts == engineTagCounts}")
    if (oracleTagCounts != engineTagCounts) {
      println(s"oracle: ${oracleTagCounts.toSeq.sorted}")
      println(s"engine: ${engineTagCounts.toSeq.sorted}")
    }

    val got = Pipeline.extract(spark, TranscriptGen.generate(spark, nConvs))
      .collect().map(t => (t.conv_id, t.turn_idx, t.subj, t.pred, t.obj)).toSeq

    def predCounts(ts: Seq[(String, Int, String, String, String)]) =
      ts.groupBy(_._4).view.mapValues(_.size.toLong).toMap
    val (oc, ec) = (predCounts(expected), predCounts(got))
    println(s"pred counts MATCH: ${oc == ec}")
    if (oc != ec) {
      println(s"oracle: ${oc.toSeq.sorted}")
      println(s"engine: ${ec.toSeq.sorted}")
    }

    def sample(ts: Seq[(String, Int, String, String, String)]) =
      ts.sortBy(t => (t._1, t._2, t._3, t._4, t._5)).take(50)
    val (os, es) = (sample(expected), sample(got))
    println(s"top-50 sample MATCH: ${os == es}")

    // HARD GATE before any literal is written: a diverging engine must
    // fail the mint loudly, not emit oracle literals that the operator
    // might embed without noticing the MATCH: false line in sbt noise
    require(oracleTagCounts == engineTagCounts &&
      oc == ec && os == es,
      "engine != ReferenceOracle — fix the divergence before minting")

    // write as UTF-8 files (stdout mangles non-ASCII under sbt)
    def sq(s: String) = "'" + s.replace("'", "''") + "'"
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/tmp/kg_pred_counts.sql"),
      oc.toSeq.sortBy(_._1)
        .map { case (p, n) => s"(${sq(p)}, $n)" }.mkString(",\n  "))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/tmp/kg_sample.sql"),
      os.map { case (c, ti, s, p, o) =>
        s"(${sq(c)}, $ti, ${sq(s)}, ${sq(p)}, ${sq(o)})"
      }.mkString(",\n  "))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/tmp/kg_mention_tags.sql"),
      oracleTagCounts.toSeq.sortBy(_._1)
        .map { case (t, n) => s"(${sq(t)}, $n)" }.mkString(",\n  "))

    // ---- serving-path oracle (VERDICT r2 item 7): predict() over videos
    // built from the first two turns of 500 convs — the exact
    // q_predict_videos fixture. Decode/dedup/structured-result from the
    // INDEPENDENT ReferenceOracle; tokens/tags from the engine (same
    // boundary as the KG gates, see SparkEntry comment).
    val nVid = 500L
    val predOracle: Seq[(String, String, String)] = (0L until nVid).flatMap { c =>
      val ts = TranscriptGen.turnsOfConv(42L, c, 8)
      (ts.find(_.turn_idx == 0).map(_.text),
        ts.find(_.turn_idx == 1).map(_.text)) match {
        case (Some(ti), Some(de)) =>
          val text = ti + " [SEP] " + de
          val toks = PyText.tokenizeWithOffsets(text).toIndexedSeq
          val stags = Detector.tagTokens(model, text, toks.toArray).toIndexedSeq
          val ents = ReferenceOracle.meSubstitute(
            ReferenceOracle.decode(text, toks, stags), "GraftChannel")
          ReferenceOracle.structuredResult(ents).toSeq.flatMap {
            case (tag, es) => es.map(e => (ts.head.conv_id, tag, e))
          }
        case _ => Nil
      }
    }
    val engPred = graft.SparkEntry.queries("q_predict_videos")(spark, "/unused")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    println(s"predict rows MATCH: ${predOracle.sorted == engPred.sorted} " +
      s"(oracle=${predOracle.size}, engine=${engPred.size})")
    require(predOracle.sorted == engPred.sorted,
      "predict(): engine != ReferenceOracle — fix before minting")
    val predTagCounts = predOracle.groupBy(_._2).view.mapValues(_.size.toLong)
      .toMap
    val predSample = predOracle.sorted.take(50)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/tmp/predict_tag_counts.sql"),
      predTagCounts.toSeq.sortBy(_._1)
        .map { case (t, n) => s"(${sq(t)}, $n)" }.mkString(",\n  "))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/tmp/predict_sample.sql"),
      predSample.map { case (id, t, e) => s"(${sq(id)}, ${sq(t)}, ${sq(e)})" }
        .mkString(",\n  "))
    println("wrote /tmp/kg_pred_counts.sql, /tmp/kg_sample.sql, " +
      "/tmp/kg_mention_tags.sql, /tmp/predict_tag_counts.sql, " +
      "/tmp/predict_sample.sql")
    spark.stop()
  }
}
