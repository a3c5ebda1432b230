package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.GreedyDedup

/** Pins the sklearn TfidfVectorizer(analyzer="char") formula and the exact
  * two-pass greedy dedup order semantics (src/prod.py:178-213). Golden
  * cosines generated from an independent NumPy transcription of the
  * documented sklearn formula. */
class DedupSpec extends AnyFunSuite {

  private def cos(corpus: Seq[String], i: Int, j: Int): Double = {
    val v = GreedyDedup.tfidfVectors(corpus)
    v(i).iterator.map { case (k, x) => x * v(j).getOrElse(k, 0.0) }.sum
  }

  private val corpus =
    Seq("Senbonzakura", "Senbonzakura!", "Melt", "World is Mine", "Hatsune Miku")

  test("char TF-IDF cosine matches sklearn formula (golden, 1e-9)") {
    val expected = Map(
      (0, 1) -> 0.932843651, (0, 2) -> 0.0623621385, (0, 3) -> 0.2527546394,
      (0, 4) -> 0.5011494749, (1, 2) -> 0.058174125, (1, 3) -> 0.2357805606,
      (1, 4) -> 0.4674941058, (2, 3) -> 0.2973272153, (2, 4) -> 0.3577105883,
      (3, 4) -> 0.4678216702)
    expected.foreach { case ((i, j), e) =>
      assert(math.abs(cos(corpus, i, j) - e) < 1e-9, s"pair ($i,$j)")
    }
  }

  test("TF-IDF pass drops the LATER of a >0.5 pair; earlier wins") {
    // cosine(Senbonzakura, Senbonzakura!) = 0.93 > 0.5 -> the later dropped;
    // cosine(Senbonzakura, Hatsune Miku) = 0.5011 > 0.5 -> dropped too;
    // then greedy Levenshtein keeps Melt, World is Mine (distance > 3).
    assert(GreedyDedup.filterUniqueEntities(corpus) ==
      Seq("Senbonzakura", "Melt", "World is Mine"))
  }

  test("Levenshtein pass keeps entity iff distance > 3 from ALL kept") {
    // "Meltt" vs "Melt" distance 1 <= 3 -> dropped even though TF-IDF
    // cosine may pass; order is greedy over the tfidf survivors.
    val in = Seq("Melt", "World is Mine", "Meltt")
    val out = GreedyDedup.filterUniqueEntities(in)
    assert(!out.contains("Meltt") && out.contains("Melt"))
  }

  test("removal marks are computed on the ORIGINAL matrix (i kept even if removed)") {
    // reference: for i<j pairs, j is marked even when i itself was marked.
    // a~b (drop b), b~c but a!~c -> c must still be dropped (marked via b).
    val a = "abcdefgh"; val b = "abcdefgx"; val c = "defgxxxx"
    val vs = Seq(a, b, c)
    assert(cos(vs, 0, 1) > 0.5, "a~b must be similar for this fixture")
    assert(cos(vs, 1, 2) > 0.5, "b~c must be similar for this fixture")
    val out = GreedyDedup.filterUniqueEntities(vs)
    assert(out.head == a)
    assert(!out.contains(b)) // marked via pair (a,b)
    assert(!out.contains(c)) // marked via pair (b,c) even though b removed
  }

  test("empty entities fall back to first-occurrence distinct") {
    assert(GreedyDedup.filterUniqueEntities(Seq("", "", "")) == Seq(""))
    assert(GreedyDedup.filterUniqueEntities(Nil) == Nil)
  }
}
