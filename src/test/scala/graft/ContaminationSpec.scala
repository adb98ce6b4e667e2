package graft

import org.apache.spark.sql.functions._
import graft.operators.Contamination

class ContaminationSpec extends SparkSpec {

  test("ngrams yields ordered shingles, empty below n tokens") {
    import spark.implicits._
    val df = Seq("a b c d", "a b", "").toDF("t")
      .select(Contamination.ngrams($"t", 3).as("g"))
    val got = df.as[Seq[String]].collect()
    assert(got(0) == Seq("a b c", "b c d"))
    assert(got(1) == Seq.empty)
    assert(got(2) == Seq.empty)
  }

  test("screen counts shared distinct n-grams against the benchmark") {
    import spark.implicits._
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val train = Seq(
      // one 5-gram lifted verbatim -> 1 hit out of 3 distinct grams
      (1L, "xx quick brown fox jumps over yy"),
      // no overlap
      (2L, "alpha beta gamma delta epsilon zeta"),
      // fully contained -> every gram hits
      (3L, "quick brown fox jumps over the lazy"),
      // too short for any 5-gram -> present with zero grams
      (4L, "tiny doc")
    ).toDF("doc_id", "text")
    val got = Contamination.screen(train, bench, "doc_id", "text", n = 5)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq ==
      Seq((1L, 1L, 3L), (2L, 0L, 2L), (3L, 3L, 3L), (4L, 0L, 0L)))
  }

  test("hashed keying keeps sub-n-token docs at zero grams") {
    import spark.implicits._
    val bench = Seq((9L, "one two three four five six")).toDF("doc_id", "text")
    val train = Seq((1L, "short")).toDF("doc_id", "text")
    val got = Contamination.screen(train, bench, "doc_id", "text", 5,
        key = g => xxhash64(g))
      .select("n_hit", "n_grams").as[(Long, Long)].head()
    assert(got == ((0L, 0L)))
  }

  test("hashed keying preserves hit counts (scale path)") {
    import spark.implicits._
    val bench = Seq((9L, "one two three four five six")).toDF("doc_id", "text")
    val train = Seq((1L, "zero one two three four five seven")).toDF("doc_id", "text")
    val exact = Contamination.screen(train, bench, "doc_id", "text", 5)
      .select("n_hit", "n_grams").as[(Long, Long)].head()
    val hashed = Contamination.screen(train, bench, "doc_id", "text", 5,
        key = g => xxhash64(g))
      .select("n_hit", "n_grams").as[(Long, Long)].head()
    assert(exact == hashed)
  }

  test("semantic screen flags a planted paraphrase the n-gram screen misses") {
    import spark.implicits._
    // a 4-dim toy space: the eval question points along e1, its
    // "paraphrase" is a small rotation of it (cosine ~0.995 — no
    // shared words needed), and a clean doc points along e3.
    // Centroids split the space so paraphrase and original share a
    // cell while the clean doc lands elsewhere.
    def v(xs: Double*) = xs.map(_.toFloat).toArray
    val cen = Seq(
      (0L, v(1, 0, 0, 0)), (1L, v(0, 0, 1, 0))
    ).toDF("cid", "cv")
    val bench = Seq((100L, v(1, 0, 0, 0))).toDF("vec_id", "embedding")
    val train = Seq(
      (1L, v(0.99, 0.1, 0, 0)),  // the paraphrase — same cell, cos ~0.995
      (2L, v(0, 0.05, 1, 0)),    // clean — different cell
      (3L, v(0.3, 0, 1, 0))      // same-ish direction but lands in cell 1
    ).toDF("vec_id", "embedding")
    val got = Contamination.screenSemantic(
        train, bench, "vec_id", "embedding", cen, tau = 0.8)
      .orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 1L), (2L, 0L), (3L, 0L)),
      s"semantic screen split diverged: $got")
    // the exact n-gram screen is structurally blind here: the
    // paraphrase shares no token with the original
    val ng = Contamination.screen(
        Seq((1L, "totally reworded version of it")).toDF("doc_id", "text"),
        Seq((100L, "the original benchmark question text")).toDF("doc_id", "text"),
        "doc_id", "text", 3)
      .select("n_hit").as[Long].head()
    assert(ng == 0L)
  }
}
