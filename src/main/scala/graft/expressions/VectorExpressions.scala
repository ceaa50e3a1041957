package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType, StructType}

/** Codegen'd dot product over two `array<float>` columns, accumulating
  * strictly left-to-right in double.
  *
  * Why a custom Catalyst `Expression`: the declarative equivalent
  * (`aggregate(zip_with(a, b, _*_), 0d, _+_)`) builds a lambda-function
  * chain that Spark evaluates interpreted per element — ~50× slower on a
  * 64-dim embedding and it blocks whole-stage codegen for the enclosing
  * operator. This expression emits a tight Java loop inside the generated
  * code, preserving the exact accumulation order (so results stay
  * bit-identical to the interpreted form and to the DuckDB oracle).
  */
case class FloatDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // (ExpectsInputTypes is private[sql]; callers guarantee array<float>.
  // containsNull is not constrained: a false-typed input — e.g. a SQL
  // array literal — is strictly safer than the true-typed parquet shape.)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(e =>
      e.dataType.isInstanceOf[ArrayType] &&
        e.dataType.asInstanceOf[ArrayType].elementType == FloatType)
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"float_dot requires array<float> inputs, got ${left.dataType}, ${right.dataType}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int ${ev.value}_n = Math.min($a.numElements(), $b.numElements());
         |double ${ev.value}_acc = 0.0;
         |for (int ${ev.value}_i = 0; ${ev.value}_i < ${ev.value}_n; ${ev.value}_i++) {
         |  ${ev.value}_acc += ((double) $a.getFloat(${ev.value}_i))
         |      * ((double) $b.getFloat(${ev.value}_i));
         |}
         |${ev.value} = ${ev.value}_acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd integer dot product over two `array<int>` columns (the int8
  * quantization codes), accumulating in long — EXACT, so unlike the
  * float form there is no accumulation-order caveat at all. Same
  * rationale as [[FloatDotProduct]]: the declarative
  * aggregate(zip_with(...)) chain is interpreted per element and blocks
  * whole-stage codegen in the scoring operator. */
case class IntDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(e =>
      e.dataType.isInstanceOf[ArrayType] &&
        e.dataType.asInstanceOf[ArrayType].elementType == IntegerType)
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"int_dot requires array<int> inputs, got ${left.dataType}, ${right.dataType}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "int_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += x.getInt(i).toLong * y.getInt(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int ${ev.value}_n = Math.min($a.numElements(), $b.numElements());
         |long ${ev.value}_acc = 0L;
         |for (int ${ev.value}_i = 0; ${ev.value}_i < ${ev.value}_n; ${ev.value}_i++) {
         |  ${ev.value}_acc += ((long) $a.getInt(${ev.value}_i))
         |      * ((long) $b.getInt(${ev.value}_i));
         |}
         |${ev.value} = ${ev.value}_acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd squared L2 distance over two `array<double>` columns,
  * accumulating strictly left-to-right in double — bit-identical to the
  * declarative `aggregate(sequence(0, n-1), 0d, (acc, i) ->
  * acc + (a[i]-b[i])*(a[i]-b[i]))` it replaces (same IEEE ops in the
  * same order), minus the per-element interpreted-lambda cost (r13: the
  * RP shortlist scores n×|Q| candidate rows through this form — the
  * same rationale as [[FloatDotProduct]]). */
case class DoubleL2Sq(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(e =>
      e.dataType.isInstanceOf[ArrayType] &&
        e.dataType.asInstanceOf[ArrayType].elementType == DoubleType)
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"l2_sq requires array<double> inputs, got ${left.dataType}, ${right.dataType}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "l2_sq"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val dd = x.getDouble(i) - y.getDouble(i)
      acc += dd * dd
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int ${ev.value}_n = Math.min($a.numElements(), $b.numElements());
         |double ${ev.value}_acc = 0.0;
         |for (int ${ev.value}_i = 0; ${ev.value}_i < ${ev.value}_n; ${ev.value}_i++) {
         |  double ${ev.value}_d = $a.getDouble(${ev.value}_i) - $b.getDouble(${ev.value}_i);
         |  ${ev.value}_acc += ${ev.value}_d * ${ev.value}_d;
         |}
         |${ev.value} = ${ev.value}_acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** The RP sign matrix shared by [[RpProject]] (Spark side) and
  * SimOps.rpExpr (the DuckDB oracle's inlined ± chains): ±1 from the
  * first md5 byte's parity per (out-dim, in-dim), precomputed once —
  * the single source of truth, so the codegen'd projection and the
  * oracle SQL can never drift apart. */
object RpProjectSigns {
  val K = 16
  val Dim = 64
  lazy val matrix: Array[Array[Int]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(K, Dim) { (j, i) =>
      md.reset()
      if ((md.digest(s"rp:$j:$i".getBytes("UTF-8"))(0) & 1) == 0) 1 else -1
    }
  }
  lazy val flat: Array[Int] = matrix.flatten
}

/** Codegen'd 64→16 random-sign projection over an `array<float>`
  * embedding, returning `array<double>` — bit-identical to the 16
  * inlined literal ± chains it replaces: each output dim accumulates
  * `(0.0 ± (double) e(0) ± … ± (double) e(63)) / 4.0` strictly left to
  * right in double (sign flips are adds/subtracts of exactly-widened
  * floats; /4 is an exact binary scale).
  *
  * Why an Expression when the arithmetic is cheap: the inlined form is
  * 16 × 64-term Add/Subtract TREES — ~95 KB of plan when it appears on
  * both sides of the rp_topk join, and plan analysis + whole-stage
  * codegen compilation of that tree dominates the key's wall time
  * (measured r13: the projection itself is microseconds per row). One
  * named expression keeps the plan O(1) and the inner loop compiled.
  * Callers gate inputs to exactly [[RpProjectSigns.Dim]] dims
  * (SimOps.gatedVecs); a shorter array yields NULL, mirroring the
  * inline form's out-of-range subscript → NULL propagation. */
case class RpProject(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = child.dataType.isInstanceOf[ArrayType] &&
      child.dataType.asInstanceOf[ArrayType].elementType == FloatType
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"rp_project requires an array<float> input, got ${child.dataType}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "rp_project"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (x.numElements() < RpProjectSigns.Dim) return null
    val signs = RpProjectSigns.flat
    val out = new Array[Double](RpProjectSigns.K)
    var j = 0
    while (j < RpProjectSigns.K) {
      var acc = 0.0
      val base = j * RpProjectSigns.Dim
      var i = 0
      while (i < RpProjectSigns.Dim) {
        val v = x.getFloat(i).toDouble
        if (signs(base + i) > 0) acc += v else acc -= v
        i += 1
      }
      out(j) = acc / 4.0
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val signs = ctx.addReferenceObj("rpSigns", RpProjectSigns.flat, "int[]")
      val k = RpProjectSigns.K
      val dim = RpProjectSigns.Dim
      s"""
         |if ($a.numElements() < $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  double[] ${ev.value}_out = new double[$k];
         |  for (int ${ev.value}_j = 0; ${ev.value}_j < $k; ${ev.value}_j++) {
         |    double ${ev.value}_acc = 0.0;
         |    int ${ev.value}_base = ${ev.value}_j * $dim;
         |    for (int ${ev.value}_i = 0; ${ev.value}_i < $dim; ${ev.value}_i++) {
         |      double ${ev.value}_v = (double) $a.getFloat(${ev.value}_i);
         |      if ($signs[${ev.value}_base + ${ev.value}_i] > 0) {
         |        ${ev.value}_acc += ${ev.value}_v;
         |      } else {
         |        ${ev.value}_acc -= ${ev.value}_v;
         |      }
         |    }
         |    ${ev.value}_out[${ev.value}_j] = ${ev.value}_acc / 4.0;
         |  }
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData(${ev.value}_out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd classifier margin over a per-doc sparse feature array
  * `fv: array<struct<fid:int, x:double>>` and a micro-weight vector
  * `wm: array<bigint>` — bit-identical to the interpreted
  * `aggregate(fv, 0d, (acc, t) -> acc + t.x *
  * (CAST(element_at(wm, t.fid + 1) AS DOUBLE) / 1000000))` it replaces:
  * same IEEE ops in the same fv order; an out-of-range fid yields NULL
  * exactly as element_at does (never reached — fids are bounded by
  * QcWidth at construction).
  *
  * Why: the margin runs once per document per GD round (16 rounds per
  * training) plus once per scoring pass, and the higher-order-function
  * form is evaluated interpreted per ELEMENT while blocking whole-stage
  * codegen for the enclosing operator — the [[FloatDotProduct]]
  * rationale applied to the classifier family's hot loop. */
case class QcMargin(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val fvOk = left.dataType match {
      case ArrayType(st: StructType, _) =>
        st.length == 2 && st(0).dataType == IntegerType && st(1).dataType == DoubleType
      case _ => false
    }
    val wmOk = right.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (fvOk && wmOk) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"qc_margin requires (array<struct<fid:int,x:double>>, array<bigint>), " +
        s"got ${left.dataType}, ${right.dataType}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "qc_margin"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val fv = a.asInstanceOf[ArrayData]
    val wm = b.asInstanceOf[ArrayData]
    val n = fv.numElements()
    val w = wm.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val t = fv.getStruct(i, 2)
      val fid = t.getInt(0)
      if (fid < 0 || fid >= w) return null
      acc += t.getDouble(1) * (wm.getLong(fid).toDouble / 1000000.0)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int ${ev.value}_n = $a.numElements();
         |int ${ev.value}_w = $b.numElements();
         |double ${ev.value}_acc = 0.0;
         |boolean ${ev.value}_oob = false;
         |for (int ${ev.value}_i = 0; ${ev.value}_i < ${ev.value}_n; ${ev.value}_i++) {
         |  InternalRow ${ev.value}_t = $a.getStruct(${ev.value}_i, 2);
         |  int ${ev.value}_fid = ${ev.value}_t.getInt(0);
         |  if (${ev.value}_fid < 0 || ${ev.value}_fid >= ${ev.value}_w) {
         |    ${ev.value}_oob = true;
         |    break;
         |  }
         |  ${ev.value}_acc += ${ev.value}_t.getDouble(1)
         |      * (((double) $b.getLong(${ev.value}_fid)) / 1000000.0);
         |}
         |if (${ev.value}_oob) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Register SQL-callable vector functions on a session. Idempotent —
    * and skip-if-present, so per-query re-registration neither rebuilds
    * the entries nor emits the "replaced a previously registered
    * function" WARN per call (the builders are stateless; replacing
    * them could never change behavior). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def ensure(name: String, builder: Seq[Expression] => Expression): Unit =
      if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(name)))
        reg.createOrReplaceTempFunction(name, builder, "built-in")
    ensure("float_dot", exprs => FloatDotProduct(exprs(0), exprs(1)))
    ensure("int_dot", exprs => IntDotProduct(exprs(0), exprs(1)))
    ensure("l2_sq", exprs => DoubleL2Sq(exprs(0), exprs(1)))
    ensure("rp_project", exprs => RpProject(exprs(0)))
    ensure("qc_margin", exprs => QcMargin(exprs(0), exprs(1)))
  }
}
