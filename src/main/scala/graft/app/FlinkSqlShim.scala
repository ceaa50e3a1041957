package graft.app

/** Textual dialect shim: rewrites the Flink SQL constructs the reference
  * exercises into Spark SQL (+ the SqlMacros functions). Scoped to the
  * reference's statement surface — this is a dialect adapter for the
  * eight app specs, not a general Flink SQL frontend.
  *
  * Rewrites:
  *  - `INSERT INTO <sink>` prefix stripped (sink handled by the runner)
  *  - known erratum: `JSON_ARRAYAGG JSON_OBJECT(` missing its open paren
  *    (01-basic-jdbc.json:30; intended form README.md:121-126)
  *  - `JSON_OBJECT('k' VALUE v, …)` → `named_struct('k', v, …)` (stays a
  *    struct: json_arrayagg serializes once at the end)
  *  - `CEIL(x TO HOUR)` → `ceil_to_hour(x)`
  *  - `LOCALTIMESTAMP` → injected evaluation clock (determinism,
  *    SURVEY.md §7.4 risk 4)
  *  - `a CROSS JOIN UNNEST(a.arr) AS t(c)` → derived table with
  *    `explode` aliased back to `a`, `t.c` refs rewritten
  *  - `JSON_VALUE(x, 'p' RETURNING T)` → `cast(json_value(x, 'p') as T)`
  *  - `JSON_QUERY(x, '$.p[*]')` → `json_query(x, '$.p')`
  *  - `FOR SYSTEM_TIME AS OF <t>` stripped: against a batch/static right
  *    side the plain join IS the processing-time lookup (stream-static
  *    re-read per micro-batch, README.md:256-266); the event-time form
  *    over versioned CDC streams routes to graft.streaming.AsOfJoin
  *    instead (SURVEY.md §7.3).
  */
object FlinkSqlShim {

  case class Shimmed(sinkTable: Option[String], selectSql: String)

  def rewrite(statement: String, evalTime: Option[String] = None): Shimmed = {
    var s = statement.trim.stripSuffix(";").trim

    // INSERT INTO <sink>
    val insertRe = raw"(?is)^\s*INSERT\s+INTO\s+(\w+)\s+".r
    val sink = insertRe.findFirstMatchIn(s).map(_.group(1))
    s = insertRe.replaceFirstIn(s, "")

    // erratum: JSON_ARRAYAGG directly followed by JSON_OBJECT
    s = s.replaceAll(raw"(?is)JSON_ARRAYAGG\s+JSON_OBJECT\s*\(", "JSON_ARRAYAGG( JSON_OBJECT(")

    // JSON_OBJECT('k' VALUE v, ...) -> named_struct('k', v, ...)
    s = s.replaceAll(raw"(?is)JSON_OBJECT\s*\(", "named_struct(")
    s = s.replaceAll(raw"(?is)('[^']*')\s+VALUE\s+", "$1, ")

    // CEIL(x TO HOUR) -> ceil_to_hour(x)
    s = s.replaceAll(raw"(?is)CEIL\s*\(\s*(.+?)\s+to\s+hour\s*\)", "ceil_to_hour($1)")

    // LOCALTIMESTAMP -> injected clock
    evalTime.foreach { t =>
      s = s.replaceAll(raw"(?i)\bLOCALTIMESTAMP\b", s"timestamp'$t'")
    }

    // a CROSS JOIN UNNEST(expr) AS t(c): explode inside a derived table
    // aliased back to the left table, then rewrite t.c -> a.c
    val unnestRe =
      raw"(?is)(\w+)\s+cross\s+join\s+unnest\s*\(\s*(?:\w+\.)?(\w+)\s*\)\s+as\s+(\w+)\s*\(\s*(\w+)\s*\)".r
    var m = unnestRe.findFirstMatchIn(s)
    while (m.isDefined) {
      val (tbl, arr, alias, c) = (m.get.group(1), m.get.group(2), m.get.group(3), m.get.group(4))
      s = s.substring(0, m.get.start) +
        s"(select *, explode($arr) as $c from $tbl) $tbl" +
        s.substring(m.get.end)
      s = s.replaceAll(raw"(?i)\b$alias\.$c\b", s"$tbl.$c")
      m = unnestRe.findFirstMatchIn(s)
    }

    // JSON_VALUE(x, 'p' RETURNING T) -> cast(json_value(x, 'p') as T)
    s = s.replaceAll(
      raw"(?is)JSON_VALUE\s*\(\s*(.+?),\s*('[^']*')\s+RETURNING\s+(\w+)\s*\)",
      "cast(json_value($1, $2) as $3)")

    // JSON_QUERY '[*]' wildcard normalization
    s = s.replaceAll(raw"\[\*\]'", "'")

    // FOR SYSTEM_TIME AS OF <timeref>
    s = s.replaceAll(raw"(?is)\s+FOR\s+SYSTEM_TIME\s+AS\s+of\s+[\w.()]+", "")

    Shimmed(sink, s)
  }

  /** Shim a single scalar expression (computed-column DDL exprs). */
  def rewriteExpression(e: String, evalTime: Option[String] = None): String =
    rewrite("SELECT " + e, evalTime).selectSql.stripPrefix("SELECT").trim
}
