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

  // analysis-time argument validation: a wrong arity or a non-literal
  // parameter must produce a readable error, not an IndexOutOfBounds /
  // ClassCast internal stack trace from the builder
  private def arity(fn: String, exprs: Seq[Expression], n: Int): Unit =
    if (exprs.length != n) throw new IllegalArgumentException(
      s"$fn expects $n argument(s), got ${exprs.length}")

  private def intLit(fn: String, arg: String, e: Expression): Int = {
    if (!e.foldable) throw new IllegalArgumentException(
      s"$fn: $arg must be a literal integer, got non-foldable ${e.sql}")
    e.eval(null) match {
      case i: Int => i
      case other => throw new IllegalArgumentException(
        s"$fn: $arg must be a literal INT, got $other")
    }
  }

  private def strLit(fn: String, arg: String, e: Expression): String = {
    if (!e.foldable) throw new IllegalArgumentException(
      s"$fn: $arg must be a literal string, got non-foldable ${e.sql}")
    e.eval(null) match {
      case s: UTF8String => s.toString
      case other => throw new IllegalArgumentException(
        s"$fn: $arg must be a literal STRING, got $other")
    }
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("text_shingles"),
      info("text_shingles", "text_shingles(text, n) - distinct word n-gram shingles, one pass"),
      (exprs: Seq[Expression]) => {
        arity("text_shingles", exprs, 2)
        TextShingles(exprs(0), intLit("text_shingles", "n", exprs(1)))
      }))
    ext.injectFunction((FunctionIdentifier("minhash_sigs"),
      info("minhash_sigs", "minhash_sigs(shingles, k) - k seeded-md5 minhash signatures"),
      (exprs: Seq[Expression]) => {
        arity("minhash_sigs", exprs, 2)
        MinHashSignatures(exprs(0), intLit("minhash_sigs", "k", exprs(1)))
      }))
    ext.injectFunction((FunctionIdentifier("simhash_fp"),
      info("simhash_fp", "simhash_fp(tokens) - 64-bit simhash as [fp_hi, fp_lo] unsigned-32 longs"),
      (exprs: Seq[Expression]) => {
        arity("simhash_fp", exprs, 1); SimHashFingerprint(exprs(0))
      }))
    ext.injectFunction((FunctionIdentifier("float_dot"),
      info("float_dot", "float_dot(a, b) - strict left-to-right double dot product of float arrays"),
      (exprs: Seq[Expression]) => {
        arity("float_dot", exprs, 2); FloatDotProduct(exprs(0), exprs(1))
      }))
    ext.injectFunction((FunctionIdentifier("int_dot"),
      info("int_dot", "int_dot(a, b) - exact integer dot product of int8 code arrays"),
      (exprs: Seq[Expression]) => {
        arity("int_dot", exprs, 2); IntDotProduct(exprs(0), exprs(1))
      }))
    ext.injectFunction((FunctionIdentifier("struct_to_binary"),
      info("struct_to_binary", "struct_to_binary(struct) - schema-generic UnsafeRow bytes"),
      (exprs: Seq[Expression]) => {
        arity("struct_to_binary", exprs, 1); StructToBinary(exprs(0))
      }))
    ext.injectFunction((FunctionIdentifier("binary_to_struct"),
      info("binary_to_struct", "binary_to_struct(bytes, ddl) - decode UnsafeRow bytes by DDL schema"),
      (exprs: Seq[Expression]) => {
        arity("binary_to_struct", exprs, 2)
        BinaryToStruct(exprs(0),
          StructType.fromDDL(strLit("binary_to_struct", "ddl", exprs(1))))
      }))
  }
}
