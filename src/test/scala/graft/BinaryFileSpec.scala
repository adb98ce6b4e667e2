package graft

import graft.pipeline.SourceSpec
import graft.sources.Sources

/** binaryFile source: the raw-bytes ingest path multimodal pipelines
  * start from (image/audio blobs arrive as whole files; Spark's
  * binaryFile datasource exposes path/length/content with pushdown on
  * the path glob).
  */
class BinaryFileSpec extends SparkSpec {

  test("binaryFile source reads blob content and feeds the multimodal kernels") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_bin").toString
    val payload = Array.tabulate[Byte](256)(i => (i * 7 % 251).toByte)
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "a.img"), payload)
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "b.txt"), "nope".getBytes)
    val df = Sources.read(spark, SourceSpec("file", Map(
      "path" -> dir, "format" -> "binaryFile", "pattern" -> "*.img")))
    val rows = df.select($"path", $"length", $"content").collect()
    assert(rows.length == 1, "glob must prune the non-matching blob")
    assert(rows.head.getLong(1) == 256L)
    assert(rows.head.getAs[Array[Byte]](2).toSeq == payload.toSeq)
    // bytes flow into the multimodal feature kernel unchanged
    val media = df.select(
      org.apache.spark.sql.functions.lit(1L).as("media_id"),
      org.apache.spark.sql.functions.lit("image").as("kind"),
      $"content".as("payload"),
      org.apache.spark.sql.functions.lit(16).as("width"),
      org.apache.spark.sql.functions.lit(16).as("height"))
    val feat = graft.multimodal.Multimodal.extractFeatures(media).collect()
    assert(feat.length == 1 && feat.head.n_bytes == 256L)
  }

  test("multimodal ingest end-to-end: binaryFile dir of real PNGs -> codec -> histograms") {
    import spark.implicits._
    import graft.multimodal.Multimodal
    // genuine PNG files on disk — the shape a real image corpus arrives
    // in — plus a text blob mixed into the same directory
    def png(w: Int, h: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", bos))
      bos.toByteArray
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_png").toString
    val blobs = Map(
      "black.png" -> png(8, 8)((_, _) => 0x000000),
      "white.png" -> png(8, 8)((_, _) => 0xFFFFFF),
      "split.png" -> png(8, 8)((x, _) => if (x < 4) 0x000000 else 0xFFFFFF),
      "notes.txt" -> "aaab".getBytes("UTF-8"))
    blobs.foreach { case (name, bytes) =>
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, name), bytes)
    }
    // the full pipeline surface: connector read (no glob — mixed corpus),
    // id + payload projection, partition-wise dispatch decode
    val df = Sources.read(spark, SourceSpec("file", Map(
      "path" -> dir, "format" -> "binaryFile")))
    val media = df.select(
      org.apache.spark.sql.functions.element_at(
        org.apache.spark.sql.functions.split($"path", "/"), -1).as("name"),
      org.apache.spark.sql.functions
        .xxhash64($"path").as("media_id"),
      $"content".as("payload"))
    val feats = Multimodal.decodeFeatures(media).collect()
      .map(h => h.media_id -> h.features).toMap
    val names = media.select("name", "media_id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(feats.size == 4)
    val black = feats(names("black.png"))
    assert(black(0) == 1.0f && black.drop(1).forall(_ == 0.0f))
    val white = feats(names("white.png"))
    assert(white(15) == 1.0f && white.take(15).forall(_ == 0.0f))
    val split = feats(names("split.png"))
    assert(split(0) == 0.5f && split(15) == 0.5f)
    // the text blob rode the SAME pipeline through the stub branch
    assert(feats(names("notes.txt")).toSeq ==
      Multimodal.decodeStub("aaab".getBytes("UTF-8")).toSeq)
  }
}
