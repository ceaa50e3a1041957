package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String
import graft.expressions._

/** Deployment-grade registration of every graft custom expression via
  * `SparkSessionExtensions` — the idiomatic hook for a library of
  * Catalyst expressions:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   // or programmatically:
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  * }}}
  *
  * Unlike the per-object `register(spark)` helpers (temp functions on
  * one session, used by the operators themselves so they stay
  * self-contained), extension-injected functions exist in EVERY session
  * of the application — pure-SQL deployments, `newSession()` clones,
  * thrift/Connect servers — with catalog-visible descriptions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("text_shingles"),
      info("text_shingles", "text_shingles(text, n) - distinct word n-gram shingles, one pass"),
      (exprs: Seq[Expression]) =>
        TextShingles(exprs(0), exprs(1).eval(null).asInstanceOf[Int])))
    ext.injectFunction((FunctionIdentifier("minhash_sigs"),
      info("minhash_sigs", "minhash_sigs(shingles, k) - k seeded-md5 minhash signatures"),
      (exprs: Seq[Expression]) =>
        MinHashSignatures(exprs(0), exprs(1).eval(null).asInstanceOf[Int])))
    ext.injectFunction((FunctionIdentifier("simhash_fp"),
      info("simhash_fp", "simhash_fp(tokens) - 64-bit simhash as [fp_hi, fp_lo] unsigned-32 longs"),
      (exprs: Seq[Expression]) => SimHashFingerprint(exprs(0))))
    ext.injectFunction((FunctionIdentifier("float_dot"),
      info("float_dot", "float_dot(a, b) - strict left-to-right double dot product of float arrays"),
      (exprs: Seq[Expression]) => FloatDotProduct(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("int_dot"),
      info("int_dot", "int_dot(a, b) - exact integer dot product of int8 code arrays"),
      (exprs: Seq[Expression]) => IntDotProduct(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("struct_to_binary"),
      info("struct_to_binary", "struct_to_binary(struct) - schema-generic UnsafeRow bytes"),
      (exprs: Seq[Expression]) => StructToBinary(exprs(0))))
    ext.injectFunction((FunctionIdentifier("binary_to_struct"),
      info("binary_to_struct", "binary_to_struct(bytes, ddl) - decode UnsafeRow bytes by DDL schema"),
      (exprs: Seq[Expression]) => BinaryToStruct(exprs(0), StructType.fromDDL(
        exprs(1).eval(null).asInstanceOf[UTF8String].toString))))
  }
}
