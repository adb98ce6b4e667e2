package graft

import java.nio.file.Files
import graft.pipeline._
import graft.sources.Sources
import graft.sinks.Sinks

/** Catalog-table (hive-style) source/sink connector: managed tables in
  * the session catalog via saveAsTable / spark.table / toTable.
  */
class TableConnectorSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("graft-table").toString

  test("batch pipeline: file -> catalog table -> file round trip") {
    import spark.implicits._
    val in = tmp(); val out = tmp()
    Files.writeString(java.nio.file.Paths.get(s"$in/t.csv"),
      "id,status\n1,important\n2,normal\n3,important\n")
    val mgr = new PipelineManager(spark)
    // leg 1: csv -> managed table (filter on the way in)
    mgr.submit(PipelineSpec(
      name = "to-table",
      source = SourceSpec("file", Map("path" -> in, "format" -> "csv",
        "header" -> "true")),
      transformations = Seq(TransformSpec("filter",
        Map("column" -> "status", "condition" -> "important"))),
      sink = SinkSpec("table", Map("table" -> "graft_conn_t"))))
    assert(mgr.status("to-table").contains("COMPLETED"))
    assert(spark.table("graft_conn_t").count() == 2)
    // leg 2: managed table -> parquet
    mgr.submit(PipelineSpec(
      name = "from-table",
      source = SourceSpec("table", Map("table" -> "graft_conn_t")),
      transformations = Seq.empty,
      sink = SinkSpec("file", Map("path" -> s"$out/p", "format" -> "parquet"))))
    val got = spark.read.parquet(s"$out/p").select($"id").as[String]
      .collect().sorted.toSeq
    assert(got == Seq("1", "3"))
    spark.sql("DROP TABLE graft_conn_t")
  }

  test("streaming sink: directory source -> catalog table (toTable)") {
    val in = tmp(); val ckpt = tmp()
    Files.writeString(java.nio.file.Paths.get(s"$in/a.txt"), "x\ny\n")
    val q = Sinks.writeStream(
      Sources.readStream(spark,
        SourceSpec("directory", Map("path" -> in, "format" -> "text"))),
      SinkSpec("table", Map("table" -> "graft_conn_stream",
        "checkpointLocation" -> ckpt)),
      name = "stream-to-table")
    q.processAllAvailable(); q.stop()
    assert(spark.table("graft_conn_stream").count() == 2)
    spark.sql("DROP TABLE graft_conn_stream")
  }
}
