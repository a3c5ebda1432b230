package graft

import org.apache.spark.sql.SparkSession

/**
 * One scaling-bench leg, run in its OWN JVM (spawned by [[Bench]]):
 * `java -XX:ActiveProcessorCount=n -Xmx(heap∝n) ... graft.BenchLeg
 * <turnsPath> <n> <expectedTriples>` under `taskset -c 0-(n-1)`.
 *
 * Why a fresh JVM per leg: a JVM whose GC/JIT thread pools were sized
 * for 32 cores collapses when its threads are later pinned onto 2 cores
 * (round-1 evidence: the in-process 2-core leg measured 103.8s vs ~11s
 * in a correctly-sized JVM — a physically impossible implied 2->8
 * efficiency of 6.7). ActiveProcessorCount + launch-time affinity means
 * every pool is born the right size, and heap scales with cores exactly
 * as a real N-executor -> 4N-executor cluster scales memory.
 *
 * Prints one line `BENCHLEG n=<n> times=<t1,t2,t3> best=<sec>`; the
 * parent parses `best` (min of 3 timed runs after a warm-up — min is
 * the contention-robust estimator: a shared box can only ever ADD time).
 */
object BenchLeg {
  def main(args: Array[String]): Unit = {
    val (turnsPath, nStr, expectStr) = (args(0), args(1), args(2))
    val nRuns = if (args.length > 3) args(3).toInt else 5
    // diagnostic job selector (iteration only; the driver always runs
    // "full"): "scan" = pruned read+deserialize with a trivial consumer —
    // isolates the IO/deserialization component of the scaling ratio
    val jobKind = if (args.length > 4) args(4) else "full"
    val n = nStr.toInt
    val expected = expectStr.toLong
    val spark = SparkSession.builder()
      .master(s"local[$n]")
      .appName(s"graft-bench-leg-$n")
      .config("spark.sql.shuffle.partitions", n.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", (4 << 20).toString)
      .config("spark.sql.files.openCostInBytes", (1 << 20).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.Encoders
    // plan/broadcast construction is hoisted OUT of job(): a per-run
    // buildDict + broadcast would add a parallelism-independent constant
    // inside the timed window and bias the 1-vs-4 ratio pessimistically
    lazy val decodedInput = spark.read.parquet(turnsPath)
      .as[Schemas.DecodedTurn](Encoders.product[Schemas.DecodedTurn])
    lazy val dictB = spark.sparkContext.broadcast(
      graft.operators.Linker.buildDict())
    def job(): Long = jobKind match {
      case "scan" =>
        import spark.implicits._
        spark.read.parquet(turnsPath)
          .select("conv_id", "turn_idx", "role", "text")
          .as[(String, Int, String, String)]
          .mapPartitions { it =>
            var chars = 0L
            it.foreach { case (_, _, _, x) => chars += x.length }
            Iterator.single(chars)
          }.reduce(_ + _)
      case "canon" =>
        // the canonicalization WIDE stage (VERDICT r3 item 2): input is
        // PRE-DECODED turns parquet; mentions+link are the narrow feed,
        // then surfaceForms groupBy + blocked alias self-join + CC +
        // canopy refinement — the pipeline's shuffle budget
        val linked = graft.operators.Linker.link(spark,
          graft.operators.Decode.mentions(spark, decodedInput), dictB).toDF()
        graft.operators.Canonicalize.canonicalMap(spark, linked).count()
      case "coref" =>
        // the OTHER wide stage: skew-salted window coreference — hot-conv
        // pre-pass + salt + repartition(conv_id, chunk) + ordered
        // per-conversation state machine (same decoded parquet input)
        graft.operators.SkewSalting.corefSalted(spark, decodedInput,
          window = 5, chunkSize = 10000).count()
      case _ => Pipeline.extract(spark,
        spark.read.parquet(turnsPath).as[Schemas.Turn](
          Encoders.product[Schemas.Turn])).count()
    }
    // warm-ups (codegen/JIT — a fresh JVM needs two passes before timings
    // flatten), the first doubling as the determinism gate: every
    // parallelism level must produce the identical triple (or canonical
    // surface-form / salted-coref) count — the parent computes `expected`
    // at ITS parallelism for all three job kinds
    if (jobKind == "full" || jobKind == "canon" || jobKind == "coref")
      require(job() == expected, s"nondeterministic $jobKind count at local[$n]")
    else job()
    job()
    val times = (1 to nRuns).map { _ =>
      val t0 = System.nanoTime(); job(); (System.nanoTime() - t0) / 1e9
    }
    spark.stop()
    println(s"BENCHLEG n=$n times=${times.map(t => f"$t%.3f").mkString(",")}" +
      f" best=${times.min}%.3f")
  }
}
