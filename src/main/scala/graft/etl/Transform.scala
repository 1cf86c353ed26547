package graft.etl

import org.yaml.snakeyaml.Yaml
import scala.jdk.CollectionConverters._

/** The ETL transform spec — same YAML shape as the reference
  * (ref: etl/yaml.go:9-45, demo/invoices.yaml).
  */
final case class TopicPool(topic: String, pool: String)

final case class Rule(
    ruleType: String,            // "stateless" | "denorm"
    where: String,               // predicate (Zed-ish expression, may be "")
    in: String,                  // stateless input topic
    left: String, right: String, // denorm input topics
    joinOn: String,              // "left.path=right.path"
    out: String,                 // output topic
    zed: String)                 // "out := { ... }" record construction

final case class Transform(
    inputs: Seq[TopicPool],
    output: TopicPool,
    rules: Seq[Rule])

object Transform {

  def fromYaml(text: String): Transform = {
    val y = new Yaml().load[java.util.Map[String, Object]](text)
    def str(m: java.util.Map[String, Object], k: String): String =
      Option(m.get(k)).map(_.toString).getOrElse("")
    val inputs = y.get("inputs").asInstanceOf[java.util.List[java.util.Map[String, Object]]]
      .asScala.toSeq.map(m => TopicPool(str(m, "topic"), str(m, "pool")))
    val outM = y.get("output").asInstanceOf[java.util.Map[String, Object]]
    val output = TopicPool(str(outM, "topic"), str(outM, "pool"))
    val rules = y.get("transforms").asInstanceOf[java.util.List[java.util.Map[String, Object]]]
      .asScala.toSeq.map { m =>
        Rule(str(m, "type"), str(m, "where"), str(m, "in"),
          str(m, "left"), str(m, "right"), str(m, "join-on"),
          str(m, "out"), str(m, "zed"))
      }
    Transform(inputs, output, rules)
  }

  /** Route validation mirroring etl/routes.go:53-73 + build.go:29-57:
    * every rule's topics are declared inputs, and all outputs of any input
    * land in a single pool.
    */
  def validate(t: Transform): Unit = {
    val declared = t.inputs.map(_.topic).toSet
    t.rules.foreach { r =>
      r.ruleType match {
        case "stateless" =>
          require(r.in.nonEmpty, "'in' topic must be specified for stateless ETL")
          require(r.left.isEmpty && r.right.isEmpty,
            "'left' or 'right' topic cannot be specified for stateless ETL")
          require(declared(r.in), s"undeclared input topic: ${r.in}")
        case "denorm" =>
          require(r.left.nonEmpty && r.right.nonEmpty,
            "both 'left' and 'right' topics must be specified for denorm ETL")
          require(r.in.isEmpty, "'in' topic cannot be specified for denorm ETL")
          require(declared(r.left), s"undeclared input topic: ${r.left}")
          require(declared(r.right), s"undeclared input topic: ${r.right}")
        case other => throw new IllegalArgumentException(s"unknown ETL type: $other")
      }
      require(r.out.nonEmpty, "rule missing 'out' topic")
    }
  }
}
