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
}
