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

  private def encodeImage(fmt: String, w: Int, h: Int)(
      rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos))
    bos.toByteArray
  }

  private def encodePng(w: Int, h: Int)(rgb: (Int, Int) => Int): Array[Byte] =
    encodeImage("png", w, h)(rgb)

  test("realDecode decodes a genuine PNG through the JRE codec") {
    // 4x4 all-black: every pixel's luma is 0 -> bin 0 holds all the mass
    val black = encodePng(4, 4)((_, _) => 0x000000)
    val fb = Multimodal.realDecode(black)
    assert(fb.length == 16 && fb(0) == 1.0f && fb.drop(1).forall(_ == 0.0f))
    // 4x4 all-white: luma 255 -> bin 15
    val white = encodePng(4, 4)((_, _) => 0xFFFFFF)
    val fw = Multimodal.realDecode(white)
    assert(fw(15) == 1.0f && fw.take(15).forall(_ == 0.0f))
    // half black / half white: 0.5 in each of bins 0 and 15
    val split = encodePng(4, 4)((x, _) => if (x < 2) 0x000000 else 0xFFFFFF)
    val fs = Multimodal.realDecode(split)
    assert(fs(0) == 0.5f && fs(15) == 0.5f)
    // pure red: BT.601 integer luma (77*255) >> 8 = 76 -> bin 4
    val red = encodePng(2, 2)((_, _) => 0xFF0000)
    assert(Multimodal.realDecode(red)(4) == 1.0f)
  }

  test("realDecode rejects non-image bytes; decode dispatches by magic number") {
    intercept[IllegalArgumentException] {
      Multimodal.realDecode("not an image".getBytes("UTF-8"))
    }
    val png = encodePng(4, 4)((_, _) => 0x000000)
    assert(Multimodal.looksEncodedImage(png))
    assert(!Multimodal.looksEncodedImage("plain text payload".getBytes("UTF-8")))
    // dispatch: PNG bytes reach the codec, text bytes reach the stub
    assert(Multimodal.decode(png)(0) == 1.0f)
    val text = "aaab".getBytes("UTF-8")
    assert(Multimodal.decode(text).toSeq == Multimodal.decodeStub(text).toSeq)
  }

  test("all four magic-number dispatch branches reach the codec") {
    // one genuine encode per format the JRE writes; all-black so the
    // expected histogram is the same across codecs (lossless for these)
    for (fmt <- Seq("png", "jpg", "gif", "bmp")) {
      val bytes = encodeImage(fmt, 4, 4)((_, _) => 0x000000)
      assert(Multimodal.looksEncodedImage(bytes), s"$fmt magic not recognized")
      val f = Multimodal.decode(bytes)
      assert(f(0) == 1.0f && f.drop(1).forall(_ == 0.0f), s"$fmt decode off")
    }
  }

  test("magic-number coincidence falls back to the stub, not a crash") {
    // UTF-8 text that HAPPENS to start with an image magic ("BMW...",
    // "GIF8...") is realistic in a mixed corpus: looksEncodedImage says
    // yes, ImageIO refuses, decode must degrade to the stub
    for (s <- Seq("BMW 3 series review", "GIF89 formatted export notes")) {
      val b = s.getBytes("UTF-8")
      assert(Multimodal.looksEncodedImage(b))
      assert(Multimodal.decode(b).toSeq == Multimodal.decodeStub(b).toSeq)
    }
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
