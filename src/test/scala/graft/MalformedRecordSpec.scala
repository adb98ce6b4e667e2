package graft

import graft.pipeline.SourceSpec
import graft.sources.Sources

/** Malformed-record policy through the connector layer: the three
  * standard modes over a CSV with a corrupt row.
  */
class MalformedRecordSpec extends SparkSpec {

  private def writeCsv(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_mal").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "d.csv"),
      "k,v\na,1\nbad_row_no_delim\nb,2\n".getBytes)
    dir
  }

  private def read(dir: String, mode: String) =
    Sources.read(spark, SourceSpec("file", Map(
      "path" -> dir, "format" -> "csv", "header" -> "true",
      "schemaDdl" -> "k string, v long", "mode" -> mode)))

  test("DROPMALFORMED silently drops the corrupt row") {
    // collect, not count(): the csv count() fast path skips parsing
    // (no required columns) and trips on the malformed row instead of
    // dropping it
    assert(read(writeCsv(), "DROPMALFORMED").collect().length == 2)
  }

  test("FAILFAST raises on the corrupt row") {
    val df = read(writeCsv(), "FAILFAST")
    intercept[org.apache.spark.SparkException] { df.collect() }
  }

  test("PERMISSIVE keeps the row with nulls and the mode option flows through Sources") {
    val dir = writeCsv()
    // bad row: one column -> k kept, v null under PERMISSIVE
    val rows = Sources.read(spark, SourceSpec("file", Map(
      "path" -> dir, "format" -> "csv", "header" -> "true",
      "inferSchema" -> "true", "mode" -> "PERMISSIVE"))).collect()
    assert(rows.length == 3)
  }
}
