package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Struct ⇄ binary codec built on Spark's own UnsafeRow format — the
  * typed-payload path for the as-of join (and any operator that must
  * carry whole rows through a schema-generic stateful op).
  *
  * Why custom: the schema-generic alternative is to_json/from_json, which
  * formats and re-parses TEXT for every row at every hop — the scenario-6
  * chain (flink-applications/06-flink-cdc-temporal-join.json:30) pays
  * that four times per record. UnsafeRow encoding is the format Spark
  * already uses for shuffle and state, so encode is one projection and
  * decode is pointer assignment over the byte array — no parsing, no
  * text, and types (timestamps, decimals, nested arrays) round-trip
  * exactly. CodegenFallback costs one virtual call per row, same as the
  * JSON expressions it replaces.
  */
case class StructToBinary(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "struct_to_binary"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StructType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"struct_to_binary requires a struct input, got $other")
  }

  @transient private lazy val proj =
    UnsafeProjection.create(child.dataType.asInstanceOf[StructType])

  override def nullSafeEval(input: Any): Any = {
    // The projection reuses its buffer across calls, and getBytes SKIPS
    // the defensive copy whenever sizeInBytes == buffer length — same-size
    // rows would then alias one array and the last row's bytes would win.
    // Copy explicitly so every payload owns its memory.
    val row = proj(input.asInstanceOf[InternalRow])
    val out = new Array[Byte](row.getSizeInBytes)
    row.writeToMemory(out, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET)
    out
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Inverse of [[StructToBinary]]: wrap the bytes as an UnsafeRow of the
  * given schema. Zero-copy — the row points into the input array. */
case class BinaryToStruct(child: Expression, schema: StructType)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = schema
  override def prettyName: String = "binary_to_struct"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"binary_to_struct requires a binary input, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val row = new UnsafeRow(schema.length)
    row.pointTo(bytes, bytes.length)
    row
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RowCodec {
  /** Register both as SQL functions; binary_to_struct takes the schema as
    * a DDL string literal (StructType.fromDDL). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "struct_to_binary", exprs => StructToBinary(exprs(0)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "binary_to_struct",
      exprs => BinaryToStruct(exprs(0), StructType.fromDDL(
        exprs(1).eval(null).asInstanceOf[UTF8String].toString)),
      "built-in")
  }
}
