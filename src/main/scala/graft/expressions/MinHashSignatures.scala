package graft.expressions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All k MinHash signatures of a shingle set in ONE pass per row:
  * sig_i = min over shingles of md5(shingle ++ "#i") as a lowercase hex
  * string — byte-identical to the declarative
  * `min(md5(concat(sh, '#i')))` aggregation and to the DuckDB oracle's
  * `min(md5(sh || '#i'))` (hex strings compare identically as ASCII in
  * all three).
  *
  * Why custom: the declarative form explodes every (doc, shingle) row and
  * shuffles them all through a 9-aggregate groupBy just to re-collapse to
  * one row per document. Computed per row over the shingle ARRAY, the
  * signature needs NO exchange at all — signatures (and the LSH band keys
  * derived from them) become a pure scan+map, and the only shuffle left
  * in MinHash-LSH is the candidate band join itself. CodegenFallback is
  * fine: one virtual call per row; the md5 work dominates.
  */
case class MinHashSignatures(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1, "need at least one hash")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_sigs"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sigs requires array<string>, got $other")
  }

  private val seeds: Array[Array[Byte]] =
    (0 until k).map(i => s"#$i".getBytes(StandardCharsets.US_ASCII)).toArray

  private val HexDigits = "0123456789abcdef".toCharArray

  private def hex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(2 * i) = HexDigits((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = HexDigits(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val md = MessageDigest.getInstance("MD5")
    val mins = new Array[String](k)
    var j = 0
    while (j < arr.numElements()) {
      val sh = arr.getUTF8String(j).getBytes
      var i = 0
      while (i < k) {
        md.reset()
        md.update(sh)
        md.update(seeds(i))
        val h = hex(md.digest())
        if (mins(i) == null || h.compareTo(mins(i)) < 0) mins(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins.map(m =>
      UTF8String.fromString(if (m == null) "" else m)))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignatures {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sigs",
      exprs => MinHashSignatures(exprs(0),
        exprs(1).eval(null).asInstanceOf[Int]),
      "built-in")
  }
}
