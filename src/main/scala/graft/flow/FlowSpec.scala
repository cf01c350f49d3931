package graft.flow

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory

import scala.jdk.CollectionConverters._

/** Declarative pipeline spec — schema-compatible with the reference's
  * serialized flow graphs (`/root/reference/static/flow/flow.json`,
  * `flow.yml`, `flow/graph.rs:16-226`): a list of pipes, each one
  * source segment + N stream segments + an optional sink, wired
  * together by named stream/artifact channels (senders AND receivers,
  * `flow/segment.rs:35-102`).
  *
  * Attribute values use the reference's typed-wrapper encoding:
  * `{"path": {"String": "…"}, "ratio": {"Float": 0.1}}`. YAML specs
  * parse through the same node tree (jackson-dataformat-yaml ships
  * with Spark), so `flow.yml` and `flow.json` are interchangeable.
  */
object FlowSpec {

  case class Segment(
    name: String,
    attributes: Map[String, Any] = Map.empty,
    artifactSender: Seq[String] = Nil,
    artifactReceiver: Seq[String] = Nil,
    streamSender: Seq[String] = Nil,
    streamReceiver: Seq[String] = Nil)

  case class Pipe(
    name: String,
    source: Segment,
    streams: Seq[Segment] = Nil,
    sink: Option[Segment] = None)

  case class Flow(pipes: Seq[Pipe])

  def parseJson(json: String): Flow =
    fromTree(new ObjectMapper().readTree(json))

  def parseYaml(yaml: String): Flow =
    fromTree(new ObjectMapper(new YAMLFactory()).readTree(yaml))

  /** Parses a spec file, dispatching on extension (.yml/.yaml vs json). */
  def parseFile(path: String): Flow = {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8)
    if (path.endsWith(".yml") || path.endsWith(".yaml")) parseYaml(text)
    else parseJson(text)
  }

  private def fromTree(root: JsonNode): Flow =
    Flow(opt(root, "pipes").map(_.elements().asScala.map(parsePipe).toSeq)
      .getOrElse(Nil))

  private def opt(n: JsonNode, field: String): Option[JsonNode] =
    Option(n.get(field)).filterNot(_.isNull)

  private def parsePipe(n: JsonNode): Pipe = Pipe(
    name = opt(n, "name").map(_.asText).getOrElse("pipe"),
    source = parseSegment(n.get("source")),
    streams = opt(n, "streams").map(_.elements().asScala.map(parseSegment).toSeq)
      .getOrElse(Nil),
    sink = opt(n, "sink").map(parseSegment))

  private def parseSegment(n: JsonNode): Segment = Segment(
    name = n.get("name").asText,
    attributes = opt(n, "attributes").map(parseAttributes).getOrElse(Map.empty),
    artifactSender = strings(n, "artifact_sender"),
    artifactReceiver = strings(n, "artifact_receiver"),
    streamSender = strings(n, "stream_sender"),
    streamReceiver = strings(n, "stream_receiver"))

  private def strings(n: JsonNode, field: String): Seq[String] =
    opt(n, field).map(_.elements().asScala.map(_.asText).toSeq).getOrElse(Nil)

  /** Unwraps `{"String": x} | {"Int": x} | {"Float": x} | {"Boolean":
    * x}` typed values (plugin.rs Parameters encoding). Bare scalars
    * are accepted too. */
  private def parseAttributes(n: JsonNode): Map[String, Any] =
    n.properties().iterator().asScala.map { e =>
      val v = e.getValue
      val value: Any =
        if (v.isObject) {
          val (t, inner) = v.properties().iterator().asScala
            .map(f => f.getKey -> f.getValue).toSeq.head
          t match {
            case "String" => inner.asText
            case "Int" => inner.asLong
            case "Float" => inner.asDouble
            case "Boolean" => inner.asBoolean
            case other => inner.asText
          }
        } else if (v.isTextual) v.asText
        else if (v.isIntegralNumber) v.asLong
        else if (v.isFloatingPointNumber) v.asDouble
        else if (v.isBoolean) v.asBoolean
        else v.asText
      e.getKey -> value
    }.toMap
}
