package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Schemas._

/**
 * Corpus-level alias resolution + graph materialize (SURVEY.md §2.9
 * G1-G4) — the global generalization of the reference's per-document
 * greedy dedup (src/prod.py:178-213), using the SAME similarity
 * thresholds (levenshtein <= 3, char-TFIDF cosine > 0.5 at
 * src/prod.py:198,210) so local and global canonicalization agree.
 *
 * Stages and their shuffle cost (the only wide stages in the pipeline
 * besides coref):
 *
 *  G1 alias-edge builder: distinct (tag, surface) forms are self-joined
 *     ONLY within cheap blocking keys — normalized 2-char prefix and
 *     suffix per tag — so the theta-join never goes quadratic in the
 *     corpus; char idf is computed globally in one aggregation and
 *     broadcast, making the TF-IDF cosine per candidate pair row-local.
 *  G2 connected components over the candidate edges: iterative min-label
 *     propagation over joins ("GraphFrames-style") with per-round
 *     pointer jumping; `localCheckpoint` every round cuts lineage;
 *     convergence = no label changed. Component label = lexicographic
 *     min surface key — deterministic under any parallelism.
 *  G3 CANOPY REFINEMENT (the components are canopies, not clusters):
 *     pairwise-similar-at-threshold is not transitive — concatenated
 *     multi-entity surfaces ("Melt 夜に駆ける", a real decode output
 *     under the reference's same-tag merge quirk) are similar to BOTH
 *     constituent titles and chain otherwise-unrelated surfaces; at
 *     corpus scale transitive closure collapsed EVERY title into one
 *     component. Each component is therefore refined by greedy leader
 *     clustering in (n_mentions desc, length desc, surface asc) order:
 *     a member joins the first LEADER it matches under the tighter
 *     length-aware criterion [[aliasMatch]] (direct similarity to the
 *     canonical — no transitivity), else becomes a leader itself. The
 *     leader is the cluster's canonical. Classic canopy clustering:
 *     loose cheap criterion for candidate generation, tight criterion
 *     within the canopy.
 *  G4 nodes/edges: triples' subj/obj rewritten onto node ids with
 *     broadcast hash joins against the alias->node map.
 */
object Canonicalize {

  /** Predicate -> object tag (FIXTURES.md §3 triple rule), for rewriting
    * triple endpoints onto typed nodes. */
  val predObjTag: Map[String, String] = Map(
    "performed_by" -> "ORIGINAL_AUTHOR", "featuring" -> "FEATURING",
    "on_album" -> "ALBUM", "alt_title" -> "ALT_TITLE",
    "mentions_person" -> "MISC_PERSON", "modifier" -> "MODIFIER",
    "refers_to" -> "TITLE")
  // vocal_by spans VOCALIST|VOCALOID — resolved against both (union) below.

  private def normKey(c: org.apache.spark.sql.Column) =
    regexp_replace(lower(c), "[^\\p{L}\\p{N}]", "")

  /** Row-local char TF-IDF cosine over normalized keys (the sklearn
    * char-analyzer formula the reference's per-doc dedup uses,
    * src/prod.py:185-198, against a GLOBAL idf map). Vectors are built
    * per CODE POINT, matching [[charIdf]]'s keys (Spark `split(nk, "")`
    * yields per-codepoint strings) — a per-UTF-16-unit vector would give
    * every astral char idf 1.0 and silently diverge from the
    * independently-minted oracle on an astral-bearing corpus. */
  private[operators] def tfidfCosine(ka: String, kb: String,
      idf: Map[String, Double]): Double = {
    def vec(s: String): collection.Map[String, Double] = {
      val counts = scala.collection.mutable.HashMap.empty[String, Double]
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        val k = new String(Character.toChars(cp))
        counts.update(k, counts.getOrElse(k, 0.0) + 1.0)
        i += Character.charCount(cp)
      }
      var norm2 = 0.0
      counts.mapValuesInPlace { (c, tf) =>
        val w = tf * idf.getOrElse(c, 1.0); norm2 += w * w; w
      }
      val n = math.sqrt(norm2)
      if (n == 0) counts else counts.mapValuesInPlace((_, x) => x / n)
    }
    val (va, vb) = (vec(ka), vec(kb))
    va.iterator.map { case (c, x) => x * vb.getOrElse(c, 0.0) }.sum
  }

  /** Plain-JVM Levenshtein over CODE POINTS (for the row-local
    * refinement pass) — Spark's levenshtein() in the candidate-edge join
    * also counts code points, so an astral char (one codepoint, two
    * UTF-16 units) costs ONE edit on both stages, and the refinement cap
    * can never be stricter than the candidate criterion by a unit
    * artifact. */
  @inline private def hasSurrogate(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      if (Character.isSurrogate(s.charAt(i))) return true
      i += 1
    }
    false
  }

  private[graft] def jvmLev(a: String, b: String): Int = {
    // BMP fast path: this runs per member-leader pair in the refinement
    // inner loop (allocation rate is the measured scaling limiter);
    // surrogate-free strings — the overwhelming majority of normalized
    // keys — compare chars directly with only the dp row allocated. The
    // codepoint form below keeps astral chars at one edit each, matching
    // Spark's levenshtein() in the candidate stage.
    if (!hasSurrogate(a) && !hasSurrogate(b)) {
      val dp = Array.tabulate(b.length + 1)(identity)
      var i = 1
      while (i <= a.length) {
        var prevDiag = dp(0); dp(0) = i
        var j = 1
        while (j <= b.length) {
          val t = dp(j)
          dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
            prevDiag + (if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1))
          prevDiag = t
          j += 1
        }
        i += 1
      }
      return dp(b.length)
    }
    val ca = a.codePoints().toArray
    val cb = b.codePoints().toArray
    val dp = Array.tabulate(cb.length + 1)(identity)
    var i = 1
    while (i <= ca.length) {
      var prevDiag = dp(0); dp(0) = i
      var j = 1
      while (j <= cb.length) {
        val t = dp(j)
        dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
          prevDiag + (if (ca(i - 1) == cb(j - 1)) 0 else 1))
        prevDiag = t
        j += 1
      }
      i += 1
    }
    dp(cb.length)
  }

  /** Optimal-string-alignment distance over code points: Levenshtein
    * plus adjacent TRANSPOSITION as one edit ("senbonzakrua" is 1 from
    * "senbonzakura", not 2). Used by [[aliasMatch]]'s equal-length rule:
    * it keeps the common typo class (one substitution or one swap) at
    * distance 1 while a two-substitution different-entity pair stays 2. */
  private[graft] def jvmOsa(a: String, b: String): Int = {
    val ca = a.codePoints().toArray
    val cb = b.codePoints().toArray
    // three rolling rows (OSA needs i-2 for the transposition case)
    var prev2 = new Array[Int](cb.length + 1)
    var prev = Array.tabulate(cb.length + 1)(identity)
    var cur = new Array[Int](cb.length + 1)
    var i = 1
    while (i <= ca.length) {
      cur(0) = i
      var j = 1
      while (j <= cb.length) {
        val cost = if (ca(i - 1) == cb(j - 1)) 0 else 1
        var d = math.min(math.min(prev(j) + 1, cur(j - 1) + 1),
          prev(j - 1) + cost)
        if (i > 1 && j > 1 && ca(i - 1) == cb(j - 2) && ca(i - 2) == cb(j - 1))
          d = math.min(d, prev2(j - 2) + 1)
        cur(j) = d
        j += 1
      }
      val t = prev2; prev2 = prev; prev = cur; cur = t
      i += 1
    }
    prev(cb.length)
  }

  /** The TIGHT member-vs-leader criterion for canopy refinement (G3).
    * Looser thresholds are fine for candidate generation but are NOT
    * transitively safe: lev<=3 merges "melt" with "lemon", and char
    * cosine>0.5 holds between a concatenated two-title surface and each
    * constituent. Two rules by length shape:
    *
    *  - EQUAL codepoint length: merge only at OSA distance <= 1 (one
    *    substitution or one adjacent swap — the typo classes). The old
    *    length-relative lev cap let equal-length keys differ in up to 3
    *    positions, which conflated distinct real entities of the
    *    "Kagamine Rin" / "Kagamine Len" shape (lev 2, and their char
    *    DISTRIBUTIONS are near-identical, so the cosine rung merges them
    *    too — equal-length pairs therefore never take the cosine rung).
    *  - UNEQUAL length: lev capped relative to the shorter key (a 4-char
    *    key tolerates 1 edit, 12-char keys the reference's full 3 —
    *    src/prod.py:210's absolute 3 was tuned for near-identical
    *    surfaces WITHIN one document), OR the cosine rung: >=8 chars
    *    (enough for a char-distribution similarity to carry signal) and
    *    a tighter 0.8 threshold — ANY two longish same-language strings
    *    clear 0.5 on char unigrams ("ashesofthedawn" vs
    *    "hollowcathedral" does), which is fine for generating candidates
    *    but not for merging. */
  private[operators] def aliasMatch(nka: String, nkb: String,
      idf: Map[String, Double]): Boolean = {
    val lenA = nka.codePointCount(0, nka.length)
    val lenB = nkb.codePointCount(0, nkb.length)
    if (lenA == lenB) return jvmOsa(nka, nkb) <= 1
    val minLen = math.min(lenA, lenB)
    val levCap = math.min(3, math.max(1, minLen / 4))
    jvmLev(nka, nkb) <= levCap ||
      (minLen >= 8 && tfidfCosine(nka, nkb, idf) > 0.8)
  }

  /** UTF-8 binary string comparison — Spark's string ordering, used for
    * the deterministic refinement order so JVM-side sorts agree with any
    * engine-side orderBy on the same data. */
  private[operators] def utf8Compare(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < x.length && i < y.length) {
      val r = (x(i) & 0xff) - (y(i) & 0xff)
      if (r != 0) return r
      i += 1
    }
    x.length - y.length
  }

  /** JVM twin of the column [[normKey]] (Spark `regexp_replace(lower(c),
    * "[^\\p{L}\\p{N}]", "")`). Lowercasing DELEGATES to the exact code
    * the Lower expression runs — `CollationSupport.Lower` with the ICU
    * flag read from the session conf — because neither JDK
    * String.toLowerCase nor UTF8String.toLowerCase matches it: Spark 4's
    * ICU casing applies Unicode Final_Sigma where the JDK does not
    * ("σΣ0á" lowers to "σς0á" in Spark, "σσ0á" in the JDK; caught by
    * the ScaleSpec twin property test). java.util.regex \p{L}/\p{N} are
    * Unicode categories exactly as in Spark's regexp_replace. */
  private val nonAlnumJvm = java.util.regex.Pattern.compile("[^\\p{L}\\p{N}]")
  private[graft] def normKeyJvm(s: String): String = {
    val useICU = org.apache.spark.sql.internal.SQLConf.get.getConf(
      org.apache.spark.sql.internal.SQLConf.ICU_CASE_MAPPINGS_ENABLED)
    val lowered = org.apache.spark.sql.catalyst.util.CollationSupport.Lower
      .exec(org.apache.spark.unsafe.types.UTF8String.fromString(s),
        org.apache.spark.sql.types.StringType.collationId, useICU)
      .toString
    nonAlnumJvm.matcher(lowered).replaceAll("")
  }

  /** First n CODE POINTS (Spark `substring(c, 1, n)` semantics). */
  @inline private[graft] def substrCp(s: String, n: Int): String = {
    var i = 0; var cnt = 0
    while (i < s.length && cnt < n) {
      i += Character.charCount(s.codePointAt(i)); cnt += 1
    }
    if (i >= s.length) s else s.substring(0, i)
  }

  /** Reverse by CODE POINTS (Spark `reverse(c)` semantics). */
  @inline private[graft] def reverseCp(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = s.length
    while (i > 0) {
      val cp = s.codePointBefore(i)
      sb.appendCodePoint(cp)
      i -= Character.charCount(cp)
    }
    sb.toString
  }

  /** Greedy leader refinement of ONE canopy — shared VERBATIM by the
    * distributed `flatMapGroups` path and the driver fast path so the
    * two can never diverge. members = (tag, surface, n_mentions, nk);
    * returns (tag, surface, n_mentions, node_id, canonical). */
  private def refineCanopy(comp: String,
      membersIn: Array[(String, String, Long, String)],
      idfMap: Map[String, Double], maxCanopySize: Int)
      : Iterator[(String, String, Long, String, String)] = {
    val members = membersIn.sortWith { (a, b) =>
      if (a._3 != b._3) a._3 > b._3 // n_mentions desc
      else {
        val la = a._2.codePointCount(0, a._2.length)
        val lb = b._2.codePointCount(0, b._2.length)
        if (la != lb) la > lb // length desc
        else utf8Compare(a._2, b._2) < 0 // surface asc (UTF-8)
      }
    }
    if (members.length > maxCanopySize)
      throw new IllegalStateException(
        s"canopy $comp has ${members.length} members > " +
          s"maxCanopySize=$maxCanopySize - the O(m^2) refinement task " +
          "would dominate the stage; audit the offenders with " +
          "Canonicalize.hotCanopies and either tighten the aliasEdges " +
          "blocking guard or raise maxCanopySize deliberately")
    // leaders in founding order; a member joins its FIRST match
    val leaders = scala.collection.mutable.ArrayBuffer
      .empty[(String, String)] // (surface, nk)
    members.iterator.map { case (tag, surface, n, nk) =>
      val leader = leaders.find(l => aliasMatch(nk, l._2, idfMap))
        .map(_._1).getOrElse { leaders += ((surface, nk)); surface }
      (tag, surface, n, tag + ":" + leader, leader)
    }
  }

  /** Order-preserving map over a bounded thread pool — the driver fast
    * path's analog of executor fan-out (same rationale as the footer pool
    * in [[graft.sources.IcebergishTable.commit]]): `f` must be pure; the
    * result sequence is in input order, so determinism is the caller's
    * input order, not scheduling order. */
  private def parMap[A, B](xs: Seq[A])(f: A => B): Seq[B] = {
    if (xs.isEmpty) return Seq.empty
    val threads =
      math.max(1, math.min(Runtime.getRuntime.availableProcessors, xs.size))
    // One task per CHUNK, not per item: at 10^5 mostly-trivial items
    // (singleton canopies, two-member blocks) per-item FutureTask
    // allocation and queue contention would dominate the work itself —
    // allocation rate is this engine's measured scaling limiter.
    val chunks = xs.grouped(
      math.max(1, xs.size / (threads * 4) +
        (if (xs.size % (threads * 4) == 0) 0 else 1))).toSeq
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    try chunks.map(chunk =>
        pool.submit(new java.util.concurrent.Callable[Seq[B]] {
          def call(): Seq[B] = chunk.map(f)
        })).flatMap { fut =>
        try fut.get()
        catch { // surface f's own exception, not the wrapper
          case e: java.util.concurrent.ExecutionException => throw e.getCause
        }
      }
    finally pool.shutdown()
  }

  /** Distinct surface forms with mention counts: (tag, surface, n). */
  def surfaceForms(mentions: DataFrame): DataFrame =
    mentions.groupBy(col("tag"), col("text").as("surface"))
      .agg(count(lit(1)).as("n_mentions"))

  /** Global char idf over the normalized distinct surface forms (one
    * aggregation; the map is alphabet-sized — bounded by distinct chars,
    * not corpus size — so collecting it to the driver is safe at any
    * scale). Shared by candidate generation and canopy refinement. */
  def charIdf(spark: SparkSession, forms: DataFrame): Map[String, Double] = {
    val f = forms.select(normKey(col("surface")).as("nk"))
      .where(length(col("nk")) > 0)
    val nForms = f.count()
    f.select(explode(array_distinct(split(col("nk"), ""))).as("ch"))
      .where(col("ch") =!= "")
      .groupBy("ch").count()
      .collect()
      .map(r => r.getString(0) -> (math.log((1.0 + nForms) / (1.0 + r.getLong(1))) + 1.0))
      .toMap
  }

  /**
   * G1: candidate pairs via prefix/suffix blocking, edge iff
   * levenshtein <= 3 OR global-idf char-TFIDF cosine > 0.5.
   * Returns (src, dst) over surface keys tag+NUL+surface (U+0000 separator).
   */
  def aliasEdges(spark: SparkSession, forms: DataFrame,
      maxBlockSize: Int = 1000,
      idfOpt: Option[Map[String, Double]] = None): DataFrame = {
    import spark.implicits._
    val f = forms.select(col("tag"), col("surface"),
      normKey(col("surface")).as("nk")).where(length(col("nk")) > 0)

    val idfB = spark.sparkContext.broadcast(
      idfOpt.getOrElse(charIdf(spark, forms)))

    val blocked0 = f
      .withColumn("blk", explode(array(
        concat(lit("p:"), col("tag"), lit(":"), substring(col("nk"), 1, 2)),
        concat(lit("s:"), col("tag"), lit(":"),
          substring(reverse(col("nk")), 1, 2)))))
    // hot-block guard: a block of m surfaces costs m^2 candidate pairs —
    // at corpus scale a common prefix ("th", "mi") would go quadratic.
    // Oversized blocks are DROPPED from pairing (low-signal: a 2-char
    // prefix shared by >maxBlockSize surfaces discriminates nothing).
    // Lazy, codegen column filter (same rationale as the DocDedup df
    // guard: an eager count + take here fired extra jobs at
    // plan-construction time); the drop set is auditable via
    // [[hotAliasBlocks]] — no silent truncation.
    val blockSizes = blocked0.groupBy("blk").count()
    val blocked = blocked0.join(
      blockSizes.where(col("count") <= maxBlockSize).select("blk"), "blk")
    val a = blocked.select(col("blk"), col("tag"),
      col("surface").as("sa"), col("nk").as("ka"))
    val b = blocked.select(col("blk"),
      col("surface").as("sb"), col("nk").as("kb"))
    val simUdf = udf { (ka: String, kb: String) =>
      tfidfCosine(ka, kb, idfB.value)
    }
    a.join(b, Seq("blk"))
      .where(col("sa") < col("sb")) // canonical pair order, no self-pairs
      .where(levenshtein(col("ka"), col("kb")) <= 3 ||
        simUdf(col("ka"), col("kb")) > 0.5)
      .select(
        concat_ws("\u0000", col("tag"), col("sa")).as("src"),
        concat_ws("\u0000", col("tag"), col("sb")).as("dst"))
      .distinct()
  }

  /** Diagnostic companion to the [[aliasEdges]] hot-block guard: the
    * blocking keys (with sizes) that candidate generation DROPS at the
    * given `maxBlockSize` — run when auditing what a corpus loses. */
  def hotAliasBlocks(spark: SparkSession, forms: DataFrame,
      maxBlockSize: Int = 1000): DataFrame = {
    val f = forms.select(col("tag"), col("surface"),
      normKey(col("surface")).as("nk")).where(length(col("nk")) > 0)
    f.withColumn("blk", explode(array(
        concat(lit("p:"), col("tag"), lit(":"), substring(col("nk"), 1, 2)),
        concat(lit("s:"), col("tag"), lit(":"),
          substring(reverse(col("nk")), 1, 2)))))
      .groupBy("blk").count()
      .where(col("count") > maxBlockSize)
      .orderBy(col("count").desc)
  }

  /** Diagnostic companion to the [[canonicalMap]] canopy-size guard: the
    * connected components (with member counts) whose size exceeds
    * `maxCanopySize` — i.e. the canopies whose O(m^2) refinement the
    * guard refuses to run. Rebuilds the same forms/edges/CC chain as
    * canonicalMap, so run it with the SAME mentions input (and, if
    * changed, the same blocking guard) to see exactly what the guard saw. */
  def hotCanopies(spark: SparkSession, mentions: DataFrame,
      maxCanopySize: Int = 100000): DataFrame = {
    val forms = surfaceForms(mentions).localCheckpoint()
    val idf = charIdf(spark, forms)
    val edges = aliasEdges(spark, forms, idfOpt = Some(idf))
    val verts = forms.select(
      concat_ws("\u0000", col("tag"), col("surface")).as("id"))
    connectedComponents(spark, verts, edges)
      .groupBy("component").count()
      .where(col("count") > maxCanopySize)
      .orderBy(col("count").desc)
  }

  /**
   * G2: connected components by min-label propagation PLUS per-round
   * pointer jumping (shortcutting): after the neighbor-min step, each
   * vertex also adopts `label(label(v))` — the component label is always
   * itself a vertex id, so the previous round's map doubles the effective
   * propagation distance. Rounds needed drop from O(diameter) (a chain
   * a→b→c→… of length 40 would silently exceed a 20-round budget) to
   * O(log diameter). Convergence is DETECTED (no label changed in either
   * step) and hitting maxIter while still changing THROWS — wrong
   * components must never come back silently.
   * vertices: one column `id`; edges: (src, dst). Returns (id, component).
   */
  def connectedComponents(spark: SparkSession, vertices: DataFrame,
      edges: DataFrame, maxIter: Int = 25,
      driverMaxVertices: Long = 200000L,
      driverMaxEdges: Long = 2000000L): DataFrame = {
    // HYBRID: the alias graph's size is bounded by the DISTINCT surface
    // universe, not the corpus — usually tiny relative to the data. Below
    // the thresholds, a driver-side union-find computes the identical
    // min-label components in one collect instead of O(log d) rounds of
    // distributed joins (measured: the iterative path's ~8 small-job
    // rounds cost ~5s of pure scheduler overhead per canonicalMap at
    // local[1] — a corpus-INDEPENDENT tax on every pipeline run). Above
    // the thresholds — a truly corpus-scale surface universe — the
    // iterative pointer-jumping path below takes over unchanged.
    val e0 = edges.select(col("src"), col("dst")).localCheckpoint()
    // r06: when the caller FORCES the iterative path (driverMaxVertices=0,
    // the q_connected_components gate's contract), the hybrid decision is
    // already made — don't pay a vertices.count() job for it (&& below
    // already short-circuits the edge count)
    val nV = if (driverMaxVertices > 0) vertices.count() else Long.MaxValue
    if (nV <= driverMaxVertices && e0.count() <= driverMaxEdges) {
      import spark.implicits._
      val vs = vertices.select(col("id")).as[String].collect()
      val es = e0.as[(String, String)].collect()
      val parent = new java.util.HashMap[String, String](vs.length * 2)
      vs.foreach(v => parent.put(v, v))
      def find(x: String): String = {
        var r = x
        while (parent.get(r) != r) r = parent.get(r)
        var c = x
        while (parent.get(c) != r) { val nx = parent.get(c); parent.put(c, r); c = nx }
        r
      }
      es.foreach { case (a, b) =>
        if (parent.containsKey(a) && parent.containsKey(b)) {
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent.put(rb, ra)
        }
      }
      // component label = min member id in UTF-8 binary order — the same
      // label the min-label propagation below converges to
      val minOf = new java.util.HashMap[String, String]()
      vs.foreach { v =>
        val r = find(v)
        val cur = minOf.get(r)
        if (cur == null || utf8Compare(v, cur) < 0) minOf.put(r, v)
      }
      return vs.toSeq.map(v => (v, minOf.get(find(v))))
        .toDF("id", "component")
    }
    // localCheckpoint (here and per round below) truncates lineage so the
    // iterative plan does not grow unboundedly. Caveat for a REAL
    // multi-node cluster: localCheckpoint stores blocks on executors, so
    // an executor loss mid-iteration fails the job (acceptable: CC is a
    // short bounded stage and the checkpointed pipeline retries it from
    // the previous stage snapshot); swap for reliable checkpoint() to a
    // cluster FS if executor churn is expected.
    // r06: LAZY localCheckpoints (eager = false) throughout the loop —
    // they still truncate lineage, but materialization folds into the
    // round's convergence-check job instead of an extra eager job per
    // checkpoint; on the tiny forced-iterative gate graph this halves the
    // job count (each small job is ~0.1-0.3s of pure scheduler tax).
    val sym = e0.select(col("src").as("u"), col("dst").as("v"))
      .union(e0.select(col("dst").as("u"), col("src").as("v")))
      .localCheckpoint(false)
    var labels = vertices.select(col("id"), col("id").as("component"))
      .localCheckpoint(false)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // (a) neighbor-min propagation
      val candidates = sym
        .join(labels, sym("u") === labels("id"))
        .groupBy(col("v").as("id2"))
        .agg(min("component").as("cand"))
      val propagated = labels
        .join(candidates, labels("id") === candidates("id2"), "left")
        .select(labels("id").as("id"),
          least(col("component"), coalesce(col("cand"), col("component")))
            .as("component"),
          (col("cand").isNotNull && col("cand") < col("component"))
            .as("chg_prop"))
      // (b) shortcutting: component := min(component, prevLabel(component))
      val lookup = labels.select(col("id").as("pid"),
        col("component").as("pcomp"))
      val next = propagated
        .join(lookup, propagated("component") === lookup("pid"), "left")
        .select(propagated("id"),
          least(propagated("component"),
            coalesce(col("pcomp"), propagated("component"))).as("component"),
          (propagated("chg_prop") ||
            (col("pcomp").isNotNull && col("pcomp") < propagated("component")))
            .as("changed"))
        .localCheckpoint(false) // cut lineage every iteration (lazy: the
      // convergence check below is the job that materializes the blocks)
      converged = next.where(col("changed")).limit(1).count() == 0
      labels = next.select(col("id"), col("component"))
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds — " +
          "component labels were still changing (graph diameter beyond " +
          "the doubling budget, or a livelock bug); results would be wrong")
    labels
  }

  /** G1+G2+G3: surface forms -> (tag, surface, node_id, canonical).
    *
    * The CC output is treated as CANOPIES and refined per component by
    * greedy leader clustering (see the object Scaladoc): members are
    * visited in (n_mentions desc, codepoint-length desc, surface
    * UTF-8-asc) order; each joins the first leader it [[aliasMatch]]es,
    * else founds a cluster. One `flatMapGroups` per component - the
    * shuffle moves only the (tiny) distinct-forms table, and the
    * per-component work is row-local O(members x leaders) compute. A
    * pathological canopy (every member its own leader) degrades to
    * O(m^2) inside one task; canopies are bounded in practice by the
    * [[aliasEdges]] hot-block guard, which caps the edge fan-out that
    * could chain a huge canopy together — and EXPLICITLY by
    * `maxCanopySize`: a component larger than that THROWS (like the CC
    * maxIter guard — an m^2 task that would run for hours must fail
    * loudly, not hang a 1000-executor stage), with [[hotCanopies]] as
    * the audit companion naming the offending components. Raise the
    * bound or tighten the blocking guard deliberately, never silently. */
  def canonicalMap(spark: SparkSession, mentions: DataFrame,
      maxCanopySize: Int = 100000,
      driverMaxVertices: Long = 200000L,
      driverMaxEdges: Long = 2000000L): DataFrame =
    // lazy checkpoint (r06): still truncates lineage and caches the forms
    // for the multi-evaluation distributed path, but the driver fast
    // path's single limit-collect is now the job that materializes it —
    // the old eager form cost one extra full job per canonicalMap call
    canonicalMapFromForms(spark, surfaceForms(mentions).localCheckpoint(false),
      maxCanopySize, driverMaxVertices, driverMaxEdges)

  /** Merge two surface-form aggregates by summing mention counts.
    * `surfaceForms` is DISTRIBUTIVE over corpus partitions — this merge is
    * what makes the graph stage incrementally maintainable: an appended
    * batch contributes `surfaceForms(newMentions)` and the merged table is
    * exactly `surfaceForms(old ∪ new)`, with no rescan of old mentions
    * (KgStagesSpec pins the equality). */
  def mergeForms(oldForms: DataFrame, deltaForms: DataFrame): DataFrame =
    oldForms.unionByName(deltaForms)
      .groupBy(col("tag"), col("surface"))
      .agg(sum(col("n_mentions")).as("n_mentions"))

  /** [[canonicalMap]] over an ALREADY-AGGREGATED surface-form table
    * (tag, surface, n_mentions) — the entry point for incremental
    * maintenance, where forms arrive pre-merged via [[mergeForms]] rather
    * than re-aggregated from the full mention corpus. The driver fast
    * path evaluates the forms plan exactly once (a single limit-collect);
    * the DISTRIBUTED path evaluates it several times (idf + blocking +
    * join) — pass a materialized or checkpointed table (a lazy
    * `localCheckpoint(false)` suffices), as [[canonicalMap]] does. */
  def canonicalMapFromForms(spark: SparkSession, forms: DataFrame,
      maxCanopySize: Int = 100000,
      driverMaxVertices: Long = 200000L,
      driverMaxEdges: Long = 2000000L): DataFrame = {
    import spark.implicits._
    // WHOLE-STAGE HYBRID (the CC hybrid's argument, applied to the full
    // graph stage): everything below surfaceForms — char idf, blocked
    // candidate pairs, connected components, canopy refinement — is a
    // function of the DISTINCT-surface table, bounded by the alias
    // universe, not the corpus. Below the vertex threshold one collect
    // replaces ~10 small distributed jobs (idf count+collect, block-size
    // aggregate, candidate join, CC rounds, refinement shuffle), each of
    // which was pure corpus-independent scheduler tax on every pipeline
    // run (the canon bench leg's non-parallelizing tail). The driver
    // path reuses the SAME engine functions (jvmLev, tfidfCosine,
    // aliasMatch, utf8Compare, refineCanopy) plus JVM twins of the
    // column fns (normKeyJvm/substrCp/reverseCp), and KgStagesSpec pins
    // driver == distributed on the real alias graph.
    // r06: ONE limit-collect decides the hybrid AND fetches the rows —
    // limit(max+1) returns the whole table iff it has <= max rows, so the
    // old count() + collect() pair (two jobs over the forms table per
    // canonicalMap call) folds into a single job; an oversized table
    // ships at most max+1 rows before the distributed path takes over.
    // Row ORDER is irrelevant: the union-find edge set is order-free and
    // the refinement output is re-sorted (component asc, members by the
    // pinned (n_mentions, length, surface) order) below.
    val cap =
      if (driverMaxVertices >= Int.MaxValue - 1) Int.MaxValue
      else driverMaxVertices.toInt + 1
    val collected = forms.select(col("tag"), col("surface"), col("n_mentions"))
      .limit(cap).as[(String, String, Long)].collect()
    if (collected.length <= driverMaxVertices) {
      val rows = collected
        .map { case (tag, sf, n) => (tag, sf, n, normKeyJvm(sf)) }
      // global char idf (mirrors charIdf: nk-bearing forms only,
      // per-codepoint df, log((1+n)/(1+df))+1)
      val withNk = rows.filter(_._4.nonEmpty)
      val nNk = withNk.length
      val df = scala.collection.mutable.HashMap.empty[String, Int]
      withNk.foreach { f =>
        val seen = scala.collection.mutable.Set.empty[String]
        var i = 0
        while (i < f._4.length) {
          val cp = f._4.codePointAt(i)
          val k = new String(Character.toChars(cp))
          if (seen.add(k)) df.update(k, df.getOrElse(k, 0) + 1)
          i += Character.charCount(cp)
        }
      }
      val idf: Map[String, Double] = df.iterator
        .map { case (ch, d) => ch -> (math.log((1.0 + nNk) / (1.0 + d)) + 1.0) }
        .toMap
      // blocked candidate pairs -> union-find (mirrors aliasEdges: 2-char
      // normalized prefix/suffix blocks per tag, hot blocks dropped, pair
      // criterion lev<=3 OR global-idf cosine>0.5)
      def key(f: (String, String, Long, String)) = f._1 + "\u0000" + f._2
      val parent = new java.util.HashMap[String, String](rows.length * 2)
      rows.foreach(f => parent.put(key(f), key(f)))
      def find(x: String): String = {
        var r = x
        while (parent.get(r) != r) r = parent.get(r)
        var c = x
        while (parent.get(c) != r) { val nx = parent.get(c); parent.put(c, r); c = nx }
        r
      }
      val maxBlockSize = 1000 // aliasEdges' default hot-block guard
      val blocks = withNk.flatMap(f => Seq(
          ("p:" + f._1 + ":" + substrCp(f._4, 2)) -> f,
          ("s:" + f._1 + ":" + substrCp(reverseCp(f._4), 2)) -> f))
        .groupBy(_._1).valuesIterator
        // singleton blocks generate no pairs — don't even enqueue them
        .filter(es => es.length >= 2 && es.length <= maxBlockSize).toSeq
      // Pair DISCOVERY — the O(Σ m²) Levenshtein/cosine work and the only
      // non-trivial compute on this path — fans out per block over
      // [[parMap]]'s bounded pool; only the UNION step stays serial. The
      // same edge set yields the same components whatever the discovery
      // order, so parallelism cannot change the result (and the driver==
      // distributed equality specs pin it).
      parMap(blocks) { es =>
        val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
        var i = 0
        while (i < es.length) {
          var j = i + 1
          while (j < es.length) {
            val (a, b) = (es(i)._2, es(j)._2)
            if (a._2 != b._2 &&
              (jvmLev(a._4, b._4) <= 3 || tfidfCosine(a._4, b._4, idf) > 0.5))
              out += ((key(a), key(b)))
            j += 1
          }
          i += 1
        }
        out
      }.foreach(_.foreach { case (ka, kb) =>
        val (ra, rb) = (find(ka), find(kb))
        if (ra != rb) parent.put(rb, ra)
      })
      // component label = min member key (UTF-8 order), like CC
      val minOf = new java.util.HashMap[String, String]()
      rows.foreach { f =>
        val r = find(key(f))
        val cur = minOf.get(r)
        if (cur == null || utf8Compare(key(f), cur) < 0) minOf.put(r, key(f))
      }
      // Refinement is worst-case O(members × leaders) per canopy — same
      // fan-out treatment, order preserved by parMap so output order
      // stays the sorted-component order.
      val out = parMap(rows.groupBy(f => minOf.get(find(key(f)))).toSeq
          .sortBy(_._1)(Ordering.fromLessThan[String](utf8Compare(_, _) < 0))) {
          case (comp, members) =>
            // refineCanopy is lazy (an Iterator) — force it HERE so the
            // O(m × leaders) matching actually runs inside the pool task
            refineCanopy(comp,
              members.map(f => (f._1, f._2, f._3, f._4)), idf,
              maxCanopySize).toVector
        }.flatten
      return out.toDF("tag", "surface", "n_mentions", "node_id", "canonical")
    }
    // DISTRIBUTED path: corpus-scale surface universes
    val idf = charIdf(spark, forms)
    val idfB = spark.sparkContext.broadcast(idf)
    val edges = aliasEdges(spark, forms, idfOpt = Some(idf))
    val verts = forms.select(
      concat_ws("\u0000", col("tag"), col("surface")).as("id"))
    val cc = connectedComponents(spark, verts, edges,
      driverMaxVertices = driverMaxVertices, driverMaxEdges = driverMaxEdges)
    val labeled = forms
      .withColumn("id", concat_ws("\u0000", col("tag"), col("surface")))
      .join(cc, "id")
    labeled
      .select(col("component"), col("tag"), col("surface"),
        col("n_mentions"), normKey(col("surface")).as("nk"))
      .as[(String, String, String, Long, String)]
      .groupByKey(_._1)
      .flatMapGroups { (comp, it) =>
        refineCanopy(comp,
          it.map(m => (m._2, m._3, m._4, m._5)).toArray,
          idfB.value, maxCanopySize)
      }
      .toDF("tag", "surface", "n_mentions", "node_id", "canonical")
  }

  /** G4a: nodes table. */
  def nodes(spark: SparkSession, canonMap: DataFrame): Dataset[Node] = {
    import spark.implicits._
    canonMap.groupBy(col("node_id"), col("canonical"), col("tag").as("type"))
      .agg(sort_array(collect_set(col("surface"))).as("aliases"),
        sum(col("n_mentions")).as("n_mentions"))
      .as[Node]
  }

  /** G4b: triples rewritten onto node ids. Subjects are TITLE surfaces
    * (or doc keys for mentions_person/refers_to — kept literal). Objects
    * resolve via (objTag(pred), obj); vocal_by tries VOCALIST then
    * VOCALOID. Unresolved endpoints keep their literal surface.
    *
    * Skew note (100 TB): joining triples to the maps on raw surface
    * equality makes a viral surface ("Senbonzakura" in 10^8 turns) a
    * skewed shuffle key. The maps are DISTINCT-SURFACE — bounded by the
    * alias universe, not the corpus — so all three are `broadcast()`
    * explicitly: the triple stream never shuffles at all (three
    * BroadcastHashJoins in its narrow stage; ScaleSpec pins the plan
    * shape), and skew is moot. If an alias universe ever outgrew driver
    * memory, drop the hints and let AQE skew-split the sort-merge joins. */
  def edges(spark: SparkSession, triples: Dataset[Triple],
      canonMap: DataFrame): Dataset[Edge] = {
    import spark.implicits._
    val m = canonMap.select(col("tag"), col("surface"), col("node_id"))
    val titleMap = m.where(col("tag") === "TITLE")
      .select(col("surface").as("ts"), col("node_id").as("subj_node"))
    val vocalMap = m.where(col("tag").isin("VOCALIST", "VOCALOID"))
      .groupBy(col("surface").as("os"))
      .agg(min("node_id").as("obj_node_vocal"))
    val objMap = m.select(col("tag").as("ot"), col("surface").as("os2"),
      col("node_id").as("obj_node_tagged"))
    triples.toDF()
      .join(broadcast(titleMap), col("subj") === col("ts"), "left_outer")
      .join(broadcast(vocalMap),
        col("pred") === "vocal_by" && col("obj") === col("os"), "left_outer")
      .join(broadcast(objMap),
        col("obj") === col("os2") &&
          typedLit(predObjTag).apply(col("pred")) === col("ot"),
        "left_outer")
      .select(
        coalesce(col("subj_node"), col("subj")).as("src_id"),
        col("pred"),
        coalesce(col("obj_node_vocal"), col("obj_node_tagged"), col("obj"))
          .as("dst_id"),
        col("conv_id"), col("turn_idx"), col("evidence"))
      .as[Edge]
  }
}
