package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.Packing

class PackingSpec extends SparkSpec {

  test("packChunks equals the single-window prefix-sum reference") {
    import spark.implicits._
    val docs = Seq(
      (1L, 100L), (2L, 2048L), (3L, 1L), (4L, 0L), (5L, 5000L),
      (6L, 2047L), (7L, 1L), (8L, 3L)
    ).toDF("id", "len").repartition(4)
    val got = Packing.packChunks(docs, "len", "id", 2048L)
      .select("id", "start_tok", "chunk_first", "chunk_last", "n_chunks")
      .orderBy("id").collect().map(_.toSeq)
    // reference: the (single-task) SQL idiom the operator replaces
    val w = Window.orderBy($"id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = docs
      .withColumn("start_tok", coalesce(sum($"len").over(w), lit(0L)))
      .withColumn("chunk_first", expr("start_tok div 2048"))
      .withColumn("chunk_last",
        expr("if(len = 0, start_tok, start_tok + len - 1) div 2048"))
      .withColumn("n_chunks", $"chunk_last" - $"chunk_first" + 1)
      .select("id", "start_tok", "chunk_first", "chunk_last", "n_chunks")
      .orderBy("id").collect().map(_.toSeq)
    assert(got.toSeq == want.toSeq)
  }

  test("chunk spans tile the token stream without gaps") {
    import spark.implicits._
    val docs = (1L to 200L).map(i => (i, (i * 7) % 97)).toDF("id", "len")
    val packed = Packing.packChunks(docs, "len", "id", 64L).cache()
    try {
      // consecutive docs abut: start_tok(next) = start_tok + len
      val rows = packed.orderBy("id")
        .select("start_tok", "len").as[(Long, Long)].collect()
      rows.sliding(2).foreach {
        case Array((s1, l1), (s2, _)) => assert(s2 == s1 + l1)
        case _ =>
      }
      // totals: last doc's end == sum of lengths
      val total = rows.map(_._2).sum
      assert(rows.last._1 + rows.last._2 == total)
      // every chunk index up to the last is covered by some doc span
      val maxChunk = packed.agg(max($"chunk_last")).as[Long].head()
      assert(maxChunk == (total - 1) / 64)
    } finally packed.unpersist()
  }
}
