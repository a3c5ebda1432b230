package graft
import graft.synth.TranscriptGen
import graft.operators.{Detector, Decode, Triples}
import java.util.concurrent.{Executors, TimeUnit}
object Micro {
  def main(args: Array[String]): Unit = {
    val nThreads = args(0).toInt
    val nConvs = if (args.length > 1) args(1).toInt else 30000
    val model = Detector.buildModel()
    // pre-generate turns (excluded from timing)
    val turns = (0L until nConvs.toLong).flatMap(c => TranscriptGen.turnsOfConv(42L, c, 8)).toArray
    def work(slice: Array[graft.Schemas.Turn]): Long = {
      var triples = 0L
      slice.foreach { t =>
        val toks = graft.functions.PyText.tokenizeWithOffsets(t.text)
        val tags = Detector.tagTokens(model, t.text, toks)
        val ents = Decode.meSubstitute(Decode.decodeEntities(t.text, toks.toIndexedSeq, tags.toIndexedSeq), t.role)
        triples += Triples.emit(t.conv_id, t.turn_idx, Triples.structuredResult(ents), "x").size
      }
      triples
    }
    // warmup
    work(turns.take(50000))
    val pool = Executors.newFixedThreadPool(nThreads)
    val chunks = turns.grouped(math.max(1, turns.length / (nThreads * 8))).toArray
    val t0 = System.nanoTime()
    val futs = chunks.map(c => pool.submit(new java.util.concurrent.Callable[Long] { def call() = work(c) }))
    val total = futs.map(_.get()).sum
    val sec = (System.nanoTime() - t0) / 1e9
    pool.shutdown(); pool.awaitTermination(1, TimeUnit.SECONDS)
    println(s"MICRO threads=$nThreads turns=${turns.length} triples=$total sec=$sec tps=${(total/sec).toLong}")
  }
}
