package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("media table has binary payload and typed metadata") {
    val media = Multimodal.fromDocuments(Tables.load(spark, sf, "documents"))
    val sch = media.schema
    assert(sch("payload").dataType.typeName == "binary")
    assert(sch("width").dataType.typeName == "integer")
    assert(media.select("kind").distinct().count() == 3)
  }

  test("stub decoder is deterministic and batch-shaped") {
    val f = Multimodal.decodeStub("aaab".getBytes("UTF-8"))
    assert(f.length == 16)
    assert(f(6) == 1.0f) // 'a','b' are 0x61,0x62 -> bin 6
    val media = Multimodal.fromDocuments(Tables.load(spark, sf, "documents"))
    val feats = Multimodal.extractFeatures(media)
    assert(feats.count() == media.count())
    assert(feats.filter(col("dom_bin") === 6).count() > 0) // lowercase text
  }

  test("frame sampling strides over video payload chunks") {
    val media = Multimodal.fromDocuments(Tables.load(spark, sf, "documents"))
    val frames = Multimodal.sampleFrames(media, frameBytes = 16, stride = 2)
    assert(frames.count() > 0)
    val one = frames.filter(col("frame_no") === 0).head()
    assert(one.getAs[Array[Byte]]("frame").length == 16)
  }

  test("resize emits a w2*h2 grid with clamped nearest-neighbor sampling") {
    val media = Multimodal.fromDocuments(Tables.load(spark, sf, "documents"))
    val resized = Multimodal.resize(media, w2 = 8, h2 = 4)
    val rows = resized.collect()
    assert(rows.length == media.count())
    assert(rows.forall(r => r.payload.length == 32 && r.width == 8 && r.height == 4))
    // deterministic: same input -> same bytes
    val again = Multimodal.resize(media, 8, 4).collect()
    assert(rows.sortBy(_.media_id).map(_.payload.toSeq).toSeq ==
      again.sortBy(_.media_id).map(_.payload.toSeq).toSeq)
    // top-left sample is the first payload byte (sx=sy=0)
    val doc = media.orderBy(col("media_id")).head()
    val out = rows.minBy(_.media_id)
    assert(out.payload(0) == doc.getAs[Array[Byte]]("payload")(0))
  }

  test("realDecode is an explicit stub") {
    intercept[NotImplementedError] { Multimodal.realDecode(Array[Byte](1)) }
  }

  test("perceptual hash: identical payloads collide, hashes are 16 hex chars") {
    import spark.implicits._
    val media = Seq(
      (1L, "image", "abcdefgh" * 16, 32, 16),
      (2L, "image", "abcdefgh" * 16, 32, 16),  // exact duplicate of 1
      (3L, "image", "zzzzyyyy" * 16, 32, 16),  // different content
      (4L, "audio", "abcdefgh" * 16, 32, 16))  // wrong kind -> excluded
      .toDF("media_id", "kind", "text", "width", "height")
      .withColumn("payload", col("text").cast("binary"))
    val got = Multimodal.perceptualHash(media).collect()
      .map(p => p.media_id -> p.phash).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got.values.forall(_.matches("[0-9a-f]{16}")))
    assert(got(1L) == got(2L), "identical images must collide")
    assert(got(1L) != got(3L), "different content must (here) differ")
  }
}
