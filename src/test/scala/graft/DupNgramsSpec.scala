package graft

import org.apache.spark.sql.functions._
import graft.operators.DupNgrams

class DupNgramsSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    Seq(
      // docs 1 and 2 share the 3-gram "b c d"; doc 3 is disjoint
      (1L, "a b c d e"),
      (2L, "x b c d y"),
      (3L, "p q r s t"),
      // too short for any 3-gram
      (4L, "u v")
    ).toDF("doc_id", "text")
  }

  test("per-doc shingle counts, common counts and fractions") {
    val got = DupNgrams.stats(corpus, "doc_id", "text", n = 3,
        minOtherDocs = 1)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(got.toSeq == Seq(
      (1L, 3L, 1L, 1.0 / 3.0),
      (2L, 3L, 1L, 1.0 / 3.0),
      (3L, 3L, 0L, 0.0),
      (4L, 0L, 0L, 0.0)))
  }

  test("repeats WITHIN one document do not make a shingle common") {
    import spark.implicits._
    val docs = Seq((1L, "a b a b a b"), (2L, "z z z z")).toDF("doc_id", "text")
    val got = DupNgrams.stats(docs, "doc_id", "text", n = 2, minOtherDocs = 1)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(2)))
    // "a b"/"b a" repeat inside doc 1 only; "z z" inside doc 2 only —
    // the per-(doc, shingle) distinct means neither crosses documents
    assert(got.toSeq == Seq((1L, 0L), (2L, 0L)))
  }

  test("hashed keying (scale path) produces identical statistics") {
    val exact = DupNgrams.stats(corpus, "doc_id", "text", 3, 1)
      .orderBy("doc_id").collect().toSeq
    val hashed = DupNgrams.stats(corpus, "doc_id", "text", 3, 1,
        key = g => xxhash64(g))
      .orderBy("doc_id").collect().toSeq
    assert(exact == hashed)
  }
}
