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
      "streaming_directory_watch.yaml", "near_dedup_curation.yaml")) {
      val cfg = ConfigParser.parseFile(s"$dir/$f")
      assert(cfg.pipelines.nonEmpty, s"$f parsed to no pipelines")
      assert(cfg.pipelines.forall(p =>
        p.name.nonEmpty && p.source.kind.nonEmpty && p.sink.kind.nonEmpty))
    }
    val cur = ConfigParser.parseFile(s"$dir/quality_gated_dedup.yaml")
      .pipelines.head
    assert(cur.transformations.map(_.kind) == Seq("quality", "dedup", "sql"))
    // neardedup round-trip: every stage property survives parsing with
    // its YAML type (the rational threshold stays a STRING — a YAML
    // engine that read 1/2 as a number would silently change semantics)
    val nd = ConfigParser.parseFile(s"$dir/near_dedup_curation.yaml")
      .pipelines.head.transformations.head
    assert(nd.kind == "neardedup")
    assert(nd.properties("id") == "doc_id" && nd.properties("text") == "text")
    assert(nd.properties("mode") == "word")
    assert(nd.properties("ngram").toString == "3")
    assert(nd.properties("threshold") == "1/2")
    assert(nd.properties("orderBy") == "length(text) DESC, doc_id")
  }

  test("the near-dedup example runs end to end and merges perturbed copies") {
    val in = Files.createTempDirectory("graft_ndin").toString
    val out = Files.createTempDirectory("graft_ndout").toString
    // docs 1/2: one word changed out of 12 (shingle Jaccard ~0.54 >= 1/2);
    // doc 2 is longer so the survivor ORDER (length desc) must pick it;
    // docs 3/4 unrelated singletons pass through
    Files.writeString(java.nio.file.Paths.get(s"$in/docs.csv"),
      "doc_id,text\n" +
        "1,alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu\n" +
        "2,alpha beta gamma delta epsilon zeta eta theta iota kappa lambda municipality\n" +
        "3,one two three four five six seven eight nine ten eleven twelve\n" +
        "4,completely different words in this document than any other here now\n")
    val base = ConfigParser.parseFile(s"$dir/near_dedup_curation.yaml")
      .pipelines.head
    val spec = base.copy(
      source = base.source.copy(properties =
        base.source.properties + ("path" -> in)),
      sink = base.sink.copy(properties =
        base.sink.properties + ("path" -> out)))
    val mgr = new PipelineManager(spark)
    assert(mgr.submit(spec) == mgr.Completed)
    val back = spark.read.parquet(out).collect()
    assert(back.map(_.getAs[String]("doc_id")).sorted.toSeq == Seq("2", "3", "4"))
    GraftSession.release(spark)
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
