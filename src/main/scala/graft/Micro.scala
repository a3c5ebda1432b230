package graft
import graft.synth.TranscriptGen
import graft.operators.Detector
import java.util.concurrent.{Executors, TimeUnit}
object Micro {
  def main(args: Array[String]): Unit = {
    val nThreads = args(0).toInt
    val nConvs = if (args.length > 1) args(1).toInt else 30000
    val nRuns = if (args.length > 2) args(2).toInt else 1
    val model = Detector.buildModel()
    // pre-generate turns (excluded from timing)
    val turns = (0L until nConvs.toLong).flatMap(c => TranscriptGen.turnsOfConv(42L, c, 8)).toArray
    // the control runs the ENGINE's fused per-turn hot path verbatim
    // (Pipeline.extractTurn) — the only delta vs the Spark legs is the
    // platform around it (thread pool vs Spark scan/encoder/scheduler)
    def work(slice: Array[graft.Schemas.Turn]): Long = {
      var triples = 0L
      slice.foreach { t => triples += graft.Pipeline
        .extractTurn(model, t.conv_id, t.turn_idx, t.role, t.text).size }
      triples
    }
    // warmup
    work(turns.take(50000))
    val pool = Executors.newFixedThreadPool(nThreads)
    val chunks = turns.grouped(math.max(1, turns.length / (nThreads * 8))).toArray
    def onePass(): (Long, Double) = {
      val t0 = System.nanoTime()
      val futs = chunks.map(c => pool.submit(new java.util.concurrent.Callable[Long] { def call() = work(c) }))
      val total = futs.map(_.get()).sum
      (total, (System.nanoTime() - t0) / 1e9)
    }
    val passes = (1 to math.max(1, nRuns)).map(_ => onePass())
    val total = passes.head._1
    val sec = passes.map(_._2).min // min: contention only ever adds time
    pool.shutdown(); pool.awaitTermination(1, TimeUnit.SECONDS)
    println(s"MICRO threads=$nThreads turns=${turns.length} triples=$total " +
      s"secs=${passes.map(p => f"${p._2}%.3f").mkString(",")} sec=$sec " +
      s"tps=${(total / sec).toLong}")
  }
}
