package graft.expressions

import java.security.MessageDigest
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** The 64-bit SimHash fingerprint of a token set in ONE pass per row,
  * returned as [fp_hi, fp_lo] — two sign-free unsigned-32 longs (fp_hi =
  * bits 0..31 MSB-first of the majority vote, fp_lo = bits 32..63), the
  * same packed representation the pigeonhole block index and the
  * hamming-distance bit_count(xor) checks consume.
  *
  * Bit b of a token is bit b of the first 8 bytes of md5(token)
  * (MSB-first); fingerprint bit b is set iff 2·Σ_tokens bit_b > n_tokens
  * — byte-identical to the declarative explode → 64×sum(shiftright&1)
  * aggregation this replaces, and to the DuckDB oracle's hex-nibble
  * arithmetic (FunctionsSpec pins the equivalence).
  *
  * Why custom: the aggregation form explodes every (doc, token) row and
  * shuffles a 65-column partial aggregate per document just to
  * re-collapse; computed over the token ARRAY the fingerprint is a pure
  * scan+map — at corpus scale the whole simhash family's only exchange
  * is its candidate join. CodegenFallback is fine: one virtual call per
  * row, md5 dominates.
  */
case class SimHashFingerprint(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "simhash_fp"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_fp requires array<string>, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val md = MessageDigest.getInstance("MD5")
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      // null tokens (possible through the open SQL surface, never from
      // text_shingles) count toward n but set no bits — the same effect
      // a null has in the aggregation form (sum skips it, count doesn't)
      val tok = arr.getUTF8String(j)
      if (tok != null) {
        md.reset()
        val digest = md.digest(tok.getBytes)
        var b = 0
        while (b < 64) {
          counts(b) += (digest(b >> 3) >> (7 - (b & 7))) & 1
          b += 1
        }
      }
      j += 1
    }
    var hi = 0L
    var lo = 0L
    var b = 0
    while (b < 32) {
      if (2 * counts(b) > n) hi |= 1L << (31 - b)
      if (2 * counts(b + 32) > n) lo |= 1L << (31 - b)
      b += 1
    }
    new GenericArrayData(Array[Any](hi, lo))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashFingerprint {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash_fp", exprs => SimHashFingerprint(exprs(0)), "built-in")
  }
}
