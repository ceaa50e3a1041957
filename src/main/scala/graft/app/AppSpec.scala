package graft.app

import com.fasterxml.jackson.databind.ObjectMapper

/** The reference's application spec shape: a list of source table DDLs, a
  * list of sink table DDLs, and one INSERT INTO ... SELECT statement
  * (reference: flink-applications JSON files — fields `sources`, `sinks`,
  * `statement`). The engine consumes the same JSON shape.
  */
case class SourceDef(createTable: String, integrationId: Option[String])
case class SinkDef(createTable: String, integrationId: Option[String])
case class AppSpec(sources: Seq[SourceDef], sinks: Seq[SinkDef], statement: String)

object AppSpec {
  private val mapper = new ObjectMapper()

  def fromJson(json: String): AppSpec = {
    val root = mapper.readTree(json)
    def defs(field: String): Seq[(String, Option[String])] = {
      val node = root.get(field)
      if (node == null || !node.isArray) Seq.empty
      else (0 until node.size()).map { i =>
        val el = node.get(i)
        (el.get("create_table").asText(),
          Option(el.get("integration_id")).map(_.asText()))
      }
    }
    AppSpec(
      defs("sources").map { case (c, i) => SourceDef(c, i) },
      defs("sinks").map { case (c, i) => SinkDef(c, i) },
      Option(root.get("statement")).map(_.asText()).getOrElse(""))
  }
}
