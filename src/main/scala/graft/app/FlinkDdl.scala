package graft.app

import org.apache.spark.sql.types.{DataType, StructType}

/** Parser for the Flink `CREATE TABLE` DDL dialect the reference uses
  * (plain columns, computed columns, METADATA columns, WATERMARK clause,
  * PRIMARY KEY, WITH-options) — the subset exercised across the eight
  * app specs (flink-applications JSON files). Produces a [[TableDef]] the
  * runner resolves to a DataFrame.
  */
object FlinkDdl {

  case class ColumnDef(name: String, sparkType: String)
  /** `name AS expr` computed column (e.g. `proctime as proctime()`,
    * `order_timestamp as TO_TIMESTAMP_LTZ(order_time/1000, 3)`). */
  case class ComputedCol(name: String, flinkExpr: String)
  /** `name type METADATA FROM 'key' VIRTUAL` (e.g. the Debezium source
    * timestamp, 06-flink-cdc-temporal-join.json:4). */
  case class MetadataCol(name: String, sparkType: String, key: String)
  /** `WATERMARK FOR col AS <expr>`; delay extracted ("5 seconds", or
    * "0 seconds" for a strict ascending watermark). */
  case class WatermarkDef(col: String, delay: String)

  case class TableDef(
      name: String,
      cols: Seq[ColumnDef],
      computed: Seq[ComputedCol],
      metadata: Seq[MetadataCol],
      primaryKey: Seq[String],
      watermark: Option[WatermarkDef],
      options: Map[String, String]) {
    def connector: String = options.getOrElse("connector", "")
    def schema: StructType =
      StructType.fromDDL(cols.map(c => s"${c.name} ${c.sparkType}").mkString(", "))
  }

  /** Type constructors whose `<` opens a type-parameter list. */
  private val AngleTypes = Set("array", "row", "map", "multiset")

  /** Split on commas at paren/bracket/type-angle depth 0 (ROW(...) and
    * ARRAY<...> carry commas). Angle brackets count as nesting ONLY when
    * the `<` directly follows a type-constructor identifier (ARRAY, ROW,
    * MAP, MULTISET) — a comparison operator inside a computed-column
    * expression (`flag AS price > 5`) must not corrupt the depth. */
  private def splitTop(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var depth = 0 // ( ) [ ]
    var angle = 0 // < > opened by a type constructor
    val cur = new StringBuilder
    s.foreach {
      case c @ ('(' | '[') => depth += 1; cur += c
      case c @ (')' | ']') => depth -= 1; cur += c
      case '<' =>
        val word = cur.reverseIterator.takeWhile(ch => ch.isLetterOrDigit || ch == '_')
          .mkString.reverse.toLowerCase
        if (AngleTypes.contains(word)) angle += 1
        cur += '<'
      case '>' =>
        if (angle > 0) angle -= 1
        cur += '>'
      case ',' if depth == 0 && angle == 0 => out += cur.toString; cur.clear()
      case c => cur += c
    }
    if (cur.nonEmpty) out += cur.toString
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  /** Flink type → Spark DDL type string. */
  private[app] def mapType(t: String): String = {
    val s = t.trim
    val lower = s.toLowerCase
    if (lower.startsWith("array<")) {
      "ARRAY<" + mapType(s.substring(6, s.length - 1)) + ">"
    } else if (lower.startsWith("row(") || lower.startsWith("row<")) {
      val inner = s.substring(4, s.length - 1)
      val fields = splitTop(inner).map { f =>
        val (n, ft) = splitNameType(f)
        s"${n.stripPrefix("`").stripSuffix("`")}: ${mapType(ft)}"
      }
      "STRUCT<" + fields.mkString(", ") + ">"
    } else lower.replaceAll("\\(\\d+\\)", "") match {
      case "int" | "integer" | "serial" => "INT"
      case "bigint" => "BIGINT"
      case "string" | "text" => "STRING"
      case v if v.startsWith("varchar") => "STRING"
      case "timestamp" => "TIMESTAMP"
      case "timestamp_ltz" => "TIMESTAMP"
      case "boolean" => "BOOLEAN"
      case "double" => "DOUBLE"
      case "float" => "FLOAT"
      case "date" => "DATE"
      case other => other.toUpperCase
    }
  }

  private def splitNameType(s: String): (String, String) = {
    val t = s.trim
    val idx = t.indexWhere(_.isWhitespace)
    (t.substring(0, idx), t.substring(idx + 1).trim)
  }

  private val CreateRe =
    raw"(?is)\s*CREATE\s+TABLE\s+(\w+)\s*\((.*)\)\s*WITH\s*\((.*)\)\s*".r
  private val OptionRe = raw"'([^']*)'\s*=\s*'([^']*)'".r
  private val WatermarkRe =
    raw"(?is)WATERMARK\s+FOR\s+(\w+)\s+AS\s+(.*)".r
  private val PkRe = raw"(?is)PRIMARY\s+KEY\s*\(([^)]*)\)\s*NOT\s+ENFORCED".r
  private val MetadataRe =
    raw"(?is)(\w+)\s+(.*?)\s+METADATA\s+FROM\s+'([^']*)'\s*(VIRTUAL)?".r
  private val DelayRe = raw"(?is)\w+\s*-\s*INTERVAL\s+'(\d+)'\s+(\w+)".r

  def parse(ddl: String): TableDef = {
    val m = CreateRe.findFirstMatchIn(ddl).getOrElse(
      throw new IllegalArgumentException(s"unparseable CREATE TABLE: $ddl"))
    val name = m.group(1)
    val body = m.group(2)
    val optStr = m.group(3)
    val options = OptionRe.findAllMatchIn(optStr)
      .map(o => o.group(1) -> o.group(2)).toMap

    var cols = Vector[ColumnDef]()
    var computed = Vector[ComputedCol]()
    var metadata = Vector[MetadataCol]()
    var pk = Seq[String]()
    var wm: Option[WatermarkDef] = None

    splitTop(body).foreach {
      case PkRe(keys) => pk = keys.split(",").map(_.trim).toSeq
      case WatermarkRe(c, e) =>
        val delay = e.trim match {
          case DelayRe(n, unit) => s"$n ${unit.toLowerCase}s"
          case col if col.equalsIgnoreCase(c) => "0 seconds"
          case other => throw new IllegalArgumentException(s"watermark expr: $other")
        }
        wm = Some(WatermarkDef(c, delay))
      case MetadataRe(n, t, key, _) => metadata :+= MetadataCol(n, mapType(t), key)
      case entry =>
        val (n, rest) = splitNameType(entry)
        if (rest.toLowerCase.startsWith("as "))
          computed :+= ComputedCol(n, rest.substring(3).trim)
        else cols :+= ColumnDef(n, mapType(rest))
    }
    TableDef(name, cols, computed, metadata, pk, wm, options)
  }
}
