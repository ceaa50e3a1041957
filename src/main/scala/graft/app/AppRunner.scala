package graft.app

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Executes an [[AppSpec]]: resolve each source DDL to a DataFrame,
  * register temp views, shim the statement, run it through spark.sql,
  * and hand the result + parsed sink DDL back (the caller writes it via
  * graft.streaming.UpsertSink for upsert-kafka sinks, or any batch
  * writer).
  *
  * Source resolution is pluggable: the offline harness maps
  * `'table-name'` to parquet/seed DataFrames; a deployment maps
  * `'connector'='jdbc'` to spark.read.jdbc and the kafka connectors to
  * readStream — the spec shape stays identical (SURVEY.md §3.1).
  */
object AppRunner {

  /** Resolve a parsed source table to its raw DataFrame (before computed/
    * metadata columns). */
  type SourceResolver = FlinkDdl.TableDef => DataFrame

  case class AppResult(sink: Option[FlinkDdl.TableDef], df: DataFrame)

  /** Apply DDL-derived columns: computed columns (through the dialect
    * macros), metadata columns (expects the resolver to expose Debezium
    * metadata as `_source_ts`, as graft.streaming.Debezium.decode does),
    * and the watermark for streaming inputs. */
  private[app] def applyDerived(df0: DataFrame, td: FlinkDdl.TableDef,
      evalTime: Option[String] = None): DataFrame = {
    var df = df0
    td.computed.foreach { c =>
      df = df.withColumn(c.name,
        expr(FlinkSqlShim.rewriteExpression(c.flinkExpr, evalTime)))
    }
    td.metadata.foreach { mc =>
      if (df.columns.contains("_source_ts"))
        df = df.withColumn(mc.name, col("_source_ts").cast(mc.sparkType.toLowerCase))
      // else: resolver already provided the column (batch fixtures)
    }
    td.watermark.foreach { wm =>
      if (df.isStreaming) df = df.withWatermark(wm.col, wm.delay)
    }
    df
  }

  def run(spark: SparkSession, spec: AppSpec, resolve: SourceResolver,
      evalTime: Option[String] = None): AppResult = {
    SqlMacros.register(spark)
    spec.sources.foreach { src =>
      val td = FlinkDdl.parse(src.createTable)
      // evalTime pins LOCALTIMESTAMP in computed columns too, not just the
      // statement — determinism must cover the whole app.
      val derived = applyDerived(resolve(td), td, evalTime)
      // the view exposes exactly the DDL-declared surface (data +
      // computed + metadata columns, in declaration order) — Flink's
      // SELECT * semantics. A CDC-decoded resolver carries transport
      // columns (_op, _source_ts, _tx_id) that must not leak into a
      // star expansion; declared columns a batch fixture legitimately
      // lacks (e.g. unmapped metadata) are skipped rather than failing.
      // case-insensitive resolution (a jdbc database may uppercase
      // identifiers — Derby does), normalized back to the DDL's names.
      // Declared DATA and computed columns must all resolve — a silently
      // narrowed view would misalign the positional sink mapping and
      // "succeed" with the wrong output surface; only metadata columns
      // may be legitimately absent (batch fixtures without a changelog
      // transport have nothing to map them from).
      val byLower = derived.columns.map(c => c.toLowerCase -> c).toMap
      val required = td.cols.map(_.name) ++ td.computed.map(_.name)
      val missing = required.filterNot(n => byLower.contains(n.toLowerCase))
      require(missing.isEmpty,
        s"source ${td.name}: resolver did not provide declared column(s) " +
          s"${missing.mkString(", ")} (resolved columns: ${derived.columns.mkString(", ")})")
      val declared = (required ++ td.metadata.map(_.name))
        .flatMap(n => byLower.get(n.toLowerCase).map(actual => col(actual).as(n)))
      derived.select(declared: _*).createOrReplaceTempView(td.name)
    }
    val sink = spec.sinks.headOption.map(s => FlinkDdl.parse(s.createTable))
    val shimmed = FlinkSqlShim.rewrite(spec.statement, evalTime)
    var df = spark.sql(shimmed.selectSql)
    // INSERT INTO maps SELECT columns to the sink positionally (Flink
    // semantics); adopt the sink DDL's column names.
    sink.filter(_.cols.length == df.columns.length).foreach { t =>
      df = df.toDF(t.cols.map(_.name): _*)
    }
    AppResult(sink, df)
  }
}
