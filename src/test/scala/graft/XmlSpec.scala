package graft

import graft.pipeline.{SinkSpec, SourceSpec}
import graft.sinks.Sinks
import graft.sources.Sources

/** XML source/sink through the connector layer (Spark 4 ships the XML
  * datasource in core — no external jar).
  */
class XmlSpec extends SparkSpec {

  test("xml sink writes and xml source reads back the same rows") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_xml").toString
    val df = Seq((1L, "alpha", 10.5), (2L, "beta", -3.25), (3L, "gamma", 0.0))
      .toDF("id", "name", "score")
    Sinks.write(df, SinkSpec("file", Map(
      "path" -> s"$dir/out", "format" -> "xml",
      "rowTag" -> "item", "rootTag" -> "items")))
    val back = Sources.read(spark, SourceSpec("file", Map(
      "path" -> s"$dir/out", "format" -> "xml", "rowTag" -> "item")))
    val got = back.select($"id", $"name", $"score")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got === Set((1L, "alpha", 10.5), (2L, "beta", -3.25), (3L, "gamma", 0.0)))
  }

  test("nested xml elements arrive as struct columns") {
    val dir = java.nio.file.Files.createTempDirectory("graft_xml_n").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "n.xml"),
      ("<recs><rec><id>7</id><who><name>x</name><age>3</age></who></rec>" +
        "<rec><id>8</id><who><name>y</name><age>4</age></who></rec></recs>").getBytes)
    val df = Sources.read(spark, SourceSpec("file", Map(
      "path" -> dir, "format" -> "xml", "rowTag" -> "rec")))
    val got = df.selectExpr("id", "who.name", "who.age")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got === Set((7L, "x", 3L), (8L, "y", 4L)))
  }
}
