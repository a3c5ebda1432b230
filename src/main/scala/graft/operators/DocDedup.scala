package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Document deduplication family for training-data pipelines, over
 * `documents(doc_id, text, ...)`.
 *
 * Scale design notes (the point of each variant):
 *  - exact: one hash-aggregate on a fingerprint — the cheapest pass, run
 *    first so the expensive near-dup passes see a smaller corpus;
 *  - MinHash+LSH: candidate generation is a BAND-BUCKET join (equi-join on
 *    (band, bandHash)), never an all-pairs theta join; signatures are
 *    computed row-local with seeded affine hash functions (deterministic);
 *    candidates are verified with exact shingle Jaccard before reporting;
 *  - SimHash: 64-bit signature, banded into 4x16-bit chunks; two docs
 *    within Hamming distance 3 share >=1 exact chunk (pigeonhole), so the
 *    candidate join is again an equi-join;
 *  - n-gram Jaccard: the exact (quadratic-ish) baseline, joined on shared
 *    shingles so only docs with >=1 common shingle ever pair up.
 */
object DocDedup {

  /** Exact dedup: group by normalized-text fingerprint, keep min doc_id.
    * Returns (fingerprint, keep_id, dup_count). */
  def exact(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
      .groupBy("fp")
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("dup_count"))

  /** Word k-shingles as an array column (lowercased, whitespace-split). */
  def shingles(text: org.apache.spark.sql.Column, k: Int = 3)
      : org.apache.spark.sql.Column = {
    val toks = split(lower(trim(text)), "\\s+")
    array_distinct(transform(
      sequence(lit(0), greatest(size(toks) - k, lit(0))),
      i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
  }

  /** Exact pairwise n-gram Jaccard >= threshold, via shared-shingle join.
    * Returns (doc_a, doc_b, jaccard). Only pairs sharing a shingle are
    * ever materialized (inverted-index join, not cross join). */
  def ngramJaccardPairs(documents: DataFrame, k: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    val sh = documents
      .select(col("doc_id"), explode(shingles(col("text"), k)).as("sh"))
      .where(col("sh") =!= "")
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val common = sh.as("a").join(sh.as("b"), Seq("sh"))
      .where(col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("c"))
    common
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .withColumn("jaccard",
        round(col("c").cast("double") / (col("na") + col("nb") - col("c")), 6))
      .where(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  private val MinhashP = 2147483647L // 2^31 - 1

  /** Seeded affine MinHash over a PRE-MATERIALIZED shingle-hash array
    * column (hash each shingle once; the 32 permutations then reuse it —
    * without this the shingle set is recomputed per hash function and the
    * stage goes ~20x slower). */
  def minhashFromHashes(shHashes: org.apache.spark.sql.Column,
      numHashes: Int): org.apache.spark.sql.Column = {
    val hs = (0 until numHashes).map { i =>
      val a = 1L + 2L * ((i * 0x9E3779B9L + 0x85EBCA6BL) % 1000000007L % (MinhashP / 2))
      val b = (i * 0xC2B2AE35L + 0x27D4EB2FL) % MinhashP
      coalesce(
        array_min(transform(shHashes, h => pmod(h * a + b, lit(MinhashP)))),
        lit(MinhashP))
    }
    array(hs: _*)
  }

  /** Seeded affine MinHash signature: for hash i, min over shingles of
    * ((a_i * h(s) + b_i) mod p). Row-local; deterministic. */
  def minhashSignature(text: org.apache.spark.sql.Column, numHashes: Int = 32,
      k: Int = 3): org.apache.spark.sql.Column =
    minhashFromHashes(transform(shingles(text, k), s => hash(s).cast("long")),
      numHashes)

  /**
   * MinHash LSH near-dup candidates + exact-Jaccard verification.
   * bands x rowsPerBand = numHashes; two docs collide iff some band of
   * their signatures is identical. Returns verified (doc_a, doc_b,
   * jaccard >= threshold).
   */
  def minhashLshPairs(documents: DataFrame, numHashes: Int = 32,
      bands: Int = 8, k: Int = 3, threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    // two projections: materialize shingle hashes once, THEN the signature
    val sig = documents
      .select(col("doc_id"),
        transform(shingles(col("text"), k), s => hash(s).cast("long"))
          .as("shh"))
      .select(col("doc_id"), minhashFromHashes(col("shh"), numHashes).as("sig"))
    val bandCols = (0 until bands).map(b =>
      hash(slice(col("sig"), b * r + 1, r), lit(b)))
    val banded = sig.select(col("doc_id"), posexplode(array(bandCols: _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bh")
    val cands = banded.as("a").join(banded.as("b"), Seq("band", "bh"))
      .where(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    // verify candidates with exact jaccard (join back the shingle sets)
    val sh = documents.select(col("doc_id"), shingles(col("text"), k).as("sh"))
    cands
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sha")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("shb")), "doc_b")
      .withColumn("jaccard", round(
        size(array_intersect(col("sha"), col("shb"))).cast("double") /
          size(array_union(col("sha"), col("shb"))), 6))
      .where(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** 64-bit SimHash from word hashes (unweighted): bit j of the signature
    * is the sign of sum over tokens of (bit j of xxhash64(token) ? 1 : -1).
    * Row-local, built-ins only. */
  def simhash(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val toks = filter(split(lower(trim(text)), "\\s+"), t => t =!= "")
    val bits = (0 until 64).map { j =>
      val votes = aggregate(toks, lit(0),
        (acc, t) => acc + when(shiftright(xxhash64(t), j).bitwiseAND(1) === 1,
          1).otherwise(-1))
      when(votes > 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }
    bits.reduce((a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) => a.bitwiseOR(b))
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: band the 64-bit signature into 4 x 16-bit
    * chunks (pigeonhole: hamming <= 3 => >=1 identical chunk), equi-join
    * on (chunk_idx, chunk), verify hamming <= maxHamming. */
  def simhashPairs(documents: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sig = documents.select(col("doc_id"), simhash(col("text")).as("sig"))
    val chunkCols = (0 until 4).map(i =>
      shiftright(col("sig"), i * 16).bitwiseAND(lit(0xFFFFL)))
    val chunked = sig.select(col("doc_id"), col("sig"),
      posexplode(array(chunkCols: _*)))
      .withColumnRenamed("pos", "ci").withColumnRenamed("col", "chunk")
    chunked.as("a").join(chunked.as("b"), Seq("ci", "chunk"))
      .where(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        hamming(col("a.sig"), col("b.sig")).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** Embedding cosine near-dup over `embeddings(vec_id, embedding)`:
    * cosine >= threshold via the Similarity LSH candidate path, verified
    * exactly. */
  def embeddingNearDup(embeddings: DataFrame, threshold: Double = 0.95)
      : DataFrame =
    Similarity.lshCosinePairs(embeddings, threshold)
}
