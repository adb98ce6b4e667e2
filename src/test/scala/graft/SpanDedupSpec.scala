package graft

import graft.operators.SpanDedup

class SpanDedupSpec extends SparkSpec {

  test("shared boilerplate spans vanish, unique prose survives") {
    import spark.implicits._
    val boiler = "all rights reserved by the example corporation inc"
    val docs = Seq(
      (1L, s"alpha beta gamma $boiler"),
      (2L, s"$boiler delta epsilon zeta"),
      (3L, "entirely unique text with no shared spans at all")
    ).toDF("doc_id", "text")
    val out = SpanDedup.removeDuplicateSpans(docs, "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // the 8-token boilerplate is fully covered by duplicated 5-grams
    assert(out(1L) === (("alpha beta gamma", 11L, 3L, 8L)))
    assert(out(2L) === (("delta epsilon zeta", 11L, 3L, 8L)))
    assert(out(3L)._1 === "entirely unique text with no shared spans at all")
    assert(out(3L)._4 === 0L)
  }

  test("fully-duplicated documents rebuild to empty text, short docs pass through") {
    import spark.implicits._
    val docs = Seq(
      (1L, "one two three four five six"),
      (2L, "one two three four five six"),
      (3L, "tiny doc")
    ).toDF("doc_id", "text")
    val out = SpanDedup.removeDuplicateSpans(docs, "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(4))).toMap
    assert(out(1L) === (("", 6L)))
    assert(out(2L) === (("", 6L)))
    assert(out(3L) === (("tiny doc", 0L)))
  }
}
