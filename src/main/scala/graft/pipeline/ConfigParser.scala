package graft.pipeline

import org.yaml.snakeyaml.Yaml
import scala.jdk.CollectionConverters._

/** YAML pipeline-config parser, accepting the reference's exact schema
  * (cf. /root/reference config/ConfigurationLoader.java:1-40). snakeyaml
  * ships with Spark's jars, so no extra dependency.
  */
object ConfigParser {

  def parse(yaml: String): PipelineConfig = {
    val root = new Yaml().load[java.util.Map[String, Object]](yaml)
    val pipelines = root.asScala.getOrElse("pipelines",
      new java.util.ArrayList[Object]())
      .asInstanceOf[java.util.List[Object]].asScala.toSeq
      .map(p => parsePipeline(asMap(p)))
    PipelineConfig(pipelines)
  }

  def parseFile(path: String): PipelineConfig =
    parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8"))

  private def asMap(o: Object): Map[String, Object] = o match {
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, v) => k.toString -> v.asInstanceOf[Object] }.toMap
    case null => Map.empty
    case other => throw new IllegalArgumentException(s"Expected mapping, got $other")
  }

  private def strProps(o: Object): Map[String, String] =
    asMap(o).map { case (k, v) => k -> String.valueOf(v) }

  private def parsePipeline(m: Map[String, Object]): PipelineSpec = {
    val source = asMap(m.getOrElse("source",
      throw new IllegalArgumentException("Source configuration is required")))
    val sink = asMap(m.getOrElse("sink",
      throw new IllegalArgumentException("Sink configuration is required")))
    val transforms = m.get("transformations").map {
      _.asInstanceOf[java.util.List[Object]].asScala.toSeq.map { t =>
        val tm = asMap(t)
        // the reference's TransformationConfig carries `condition` and
        // `expression` as TOP-LEVEL fields alongside `properties`
        // (config/TransformationConfig.java) — fold them in, with any
        // same-named nested property winning
        val topLevel = Seq("condition", "expression")
          .flatMap(k => tm.get(k).map(k -> String.valueOf(_))).toMap
        TransformSpec(
          tm.getOrElse("type", "identity").toString.toLowerCase,
          topLevel ++ asMap(tm.getOrElse("properties", null))
            .map { case (k, v) => k -> anyToScala(v) })
      }
    }.getOrElse(Seq.empty)
    PipelineSpec(
      name = m.getOrElse("name", "").toString,
      source = SourceSpec(
        source.getOrElse("type", "file").toString.toLowerCase,
        strProps(source.getOrElse("properties", null))),
      transformations = transforms,
      sink = SinkSpec(
        sink.getOrElse("type", "file").toString.toLowerCase,
        strProps(sink.getOrElse("properties", null))),
      streaming = m.get("streaming").exists(v => String.valueOf(v).toBoolean))
  }

  // recursive: nested structures (the quality stage's `rules` list of
  // maps) must survive as maps — the old String.valueOf flattening
  // turned file-parsed rule maps into "{kind=not_null,...}" strings,
  // which only surfaced once an examples/ config actually RAN
  // (ExamplesSpec pins this). Scalar leaves keep their YAML types;
  // every consumer renders via .toString.
  private def anyToScala(v: Object): Any = v match {
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, x) =>
        k.toString -> anyToScala(x.asInstanceOf[Object]) }.toMap
    case l: java.util.List[_] =>
      l.asScala.map(x => anyToScala(x.asInstanceOf[Object])).toSeq
    case other => other
  }
}
