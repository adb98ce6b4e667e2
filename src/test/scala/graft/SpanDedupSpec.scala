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

  test("maximal-run gating removes long planted duplicates, keeps short overlap") {
    import spark.implicits._
    // a 60-token passage planted in two docs (above the 50-token
    // threshold) and an 8-token phrase planted in two others (covered
    // by duplicated 5-grams but BELOW the run threshold — the case
    // removeDuplicateSpans would wrongly cut)
    val long = (1 to 60).map(i => s"dup$i").mkString(" ")
    val short = "all rights reserved by the example corporation inc"
    val docs = Seq(
      (1L, s"alpha beta gamma $long omega"),
      (2L, s"$long delta epsilon"),
      (3L, s"first unique prose $short"),
      (4L, s"$short second unique prose"),
      (5L, "entirely unique text with no shared spans at all")
    ).toDF("doc_id", "text")
    val out = SpanDedup.removeDuplicateRuns(docs, "doc_id", "text",
        n = 5, minDocs = 2, minRun = 50)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6)))).toMap
    // the 60-token run is one maximal run >= 50: removed wholesale
    assert(out(1L) === (("alpha beta gamma omega", 64L, 4L, 60L, 1L, 60L)))
    assert(out(2L) === (("delta epsilon", 62L, 2L, 60L, 1L, 60L)))
    // the 8-token covered run is below the threshold: text UNCHANGED,
    // audit still reports the run length
    assert(out(3L)._1 === s"first unique prose $short")
    assert(out(3L)._4 === 0L)
    assert(out(3L)._6 === 8L)
    assert(out(4L)._1 === s"$short second unique prose")
    assert(out(5L) === (("entirely unique text with no shared spans at all",
      9L, 9L, 0L, 0L, 0L)))
  }

  test("a run straddling two merged covered 5-gram blocks coalesces before gating") {
    import spark.implicits._
    // two 30-token duplicated blocks ADJACENT in doc 1 (one 60-token
    // maximal run — removed) but separated in docs 2/3 (each a
    // 30-token run — kept): the gate must act on COALESCED runs, not
    // per-gram cover
    val a = (1 to 30).map(i => s"blka$i").mkString(" ")
    val b = (1 to 30).map(i => s"blkb$i").mkString(" ")
    val docs = Seq(
      (1L, s"intro words here $a $b outro words"),
      (2L, s"$a middle filler text goes here"),
      (3L, s"unrelated leading prose $b")
    ).toDF("doc_id", "text")
    val out = SpanDedup.removeDuplicateRuns(docs, "doc_id", "text",
        n = 5, minDocs = 2, minRun = 50)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(4), r.getLong(6)))).toMap
    assert(out(1L) === (("intro words here outro words", 60L, 60L)))
    // 30-token runs stay below the gate in the donor docs
    assert(out(2L)._2 === 0L)
    assert(out(2L)._3 === 30L)
    assert(out(3L)._2 === 0L)
  }

  test("line dedup keeps only the first occurrence of planted boilerplate") {
    import spark.implicits._
    val nav = "home | products | about us | contact"
    val docs = Seq(
      (1L, s"$nav\nwelcome to the first page\nunique body one"),
      (2L, s"$nav\nunique body two"),
      (3L, s"unique body three\n$nav"),
      (4L, "totally original page with no chrome")
    ).toDF("doc_id", "text")
    val out = SpanDedup.dedupLines(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // doc 1 holds the first occurrence — everything survives
    assert(out(1L) === ((s"$nav\nwelcome to the first page\nunique body one",
      3L, 3L, 0L)))
    // later occurrences drop, surviving lines keep document order
    assert(out(2L) === (("unique body two", 2L, 1L, 1L)))
    assert(out(3L) === (("unique body three", 2L, 1L, 1L)))
    assert(out(4L) === (("totally original page with no chrome", 1L, 1L, 0L)))
    GraftSession.release(spark)
  }

  test("line dedup: a doc that is all boilerplate rebuilds to empty text") {
    import spark.implicits._
    val docs = Seq(
      (1L, "repeated line"),
      (2L, "repeated line"),
      (3L, "repeated line\nrepeated line")
    ).toDF("doc_id", "text")
    val out = SpanDedup.dedupLines(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(4)))).toMap
    assert(out(1L) === (("repeated line", 0L)))
    assert(out(2L) === (("", 1L)))
    // within-doc repetition drops too (pos 0 of doc 1 is the keeper)
    assert(out(3L) === (("", 2L)))
    GraftSession.release(spark)
  }
}
