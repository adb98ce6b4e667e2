package graft.pipeline

/** Declarative pipeline model — same shape as the reference's YAML
  * (/root/reference src/main/resources/pipeline-config-example.yaml and
  * config/PipelineConfig.java): name + source + transformations + sink.
  * Re-expressed as case classes; `properties` are free-form like the
  * reference's `Map<String,Object>`.
  */
case class SourceSpec(kind: String, properties: Map[String, String])
case class TransformSpec(kind: String, properties: Map[String, Any])
case class SinkSpec(kind: String, properties: Map[String, String])

case class PipelineSpec(
    name: String,
    source: SourceSpec,
    transformations: Seq[TransformSpec],
    sink: SinkSpec,
    streaming: Boolean = false) {
  require(name.nonEmpty, "Pipeline name is required")
}

case class PipelineConfig(pipelines: Seq[PipelineSpec])
