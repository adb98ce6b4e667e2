package graft

import java.nio.file.Files
import graft.pipeline._

/** The shipped examples/ configs are living documentation: every file
  * must PARSE against the real schema, and the curation example runs
  * end to end (paths rewritten to temp dirs) — a schema drift in the
  * YAML vocabulary fails here before a user hits it.
  */
class ExamplesSpec extends SparkSpec {

  private val dir = "examples"

  test("every shipped example parses against the real YAML schema") {
    for (f <- Seq("csv_to_parquet.yaml", "quality_gated_dedup.yaml",
      "streaming_directory_watch.yaml")) {
      val cfg = ConfigParser.parseFile(s"$dir/$f")
      assert(cfg.pipelines.nonEmpty, s"$f parsed to no pipelines")
      assert(cfg.pipelines.forall(p =>
        p.name.nonEmpty && p.source.kind.nonEmpty && p.sink.kind.nonEmpty))
    }
    val cur = ConfigParser.parseFile(s"$dir/quality_gated_dedup.yaml")
      .pipelines.head
    assert(cur.transformations.map(_.kind) == Seq("quality", "dedup", "sql"))
  }

  test("the curation example runs end to end on real data") {
    val in = Files.createTempDirectory("graft_exin").toString
    val out = Files.createTempDirectory("graft_exout").toString
    Files.writeString(java.nio.file.Paths.get(s"$in/docs.csv"),
      "doc_id,text\n1,the quick brown fox jumps\n" +
        "2,the quick brown fox jumps\n3,short\n4,another long document here\n")
    val base = ConfigParser.parseFile(s"$dir/quality_gated_dedup.yaml")
      .pipelines.head
    val spec = base.copy(
      source = base.source.copy(properties =
        base.source.properties + ("path" -> in)),
      sink = base.sink.copy(properties =
        base.sink.properties + ("path" -> out)))
    val mgr = new PipelineManager(spark)
    assert(mgr.submit(spec) == mgr.Completed)
    val back = spark.read.parquet(out).collect()
    // doc 2 deduped away (same text, doc 1 survives by orderBy),
    // doc 3 dropped by the sql stage's length filter
    assert(back.map(_.getAs[String]("doc_id")).sorted.toSeq == Seq("1", "4"))
    assert(back.forall(_.getAs[Int]("n_chars") >= 10))
    GraftSession.release(spark)
  }
}
