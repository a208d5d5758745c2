package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native cosine similarity over two float- or double-array columns.
  *
  * Why an Expression and not the zip_with/aggregate HOF composition
  * (q43/x49's original form): higher-order functions are CodegenFallback —
  * every element evaluation walks an interpreted lambda, and the
  * cast-to-double transform materializes a boxed intermediate array per
  * row. This expression generates a tight primitive loop inside
  * whole-stage codegen: no allocation, no boxing, one pass.
  *
  * Each side independently accepts array<float> or array<double>
  * (floats widen per element — exact, so float/double mixing is
  * byte-for-byte the HOF behavior of casting the float side first).
  * This is what lets the Ann consumers that compute on pre-cast double
  * arrays (query literals, bucketed `e` columns) migrate off the HOF
  * cosine without re-plumbing their pipelines (VERDICT r16 #4).
  *
  * Arithmetic is IDENTICAL to the HOF form (per-element widen to double,
  * double accumulate, dot/(sqrt(na)*sqrt(nb))), so swapping it into the
  * oracle-checked queries cannot move a hash — INCLUDING the edges:
  * zip_with pads the shorter array with NULL and aggregate propagates
  * it, so unequal lengths or a NULL element yield NULL here too (a
  * min-length truncation would instead return a finite wrong
  * similarity, the exact hash-moving divergence this claim rules out).
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  // NULL is produced for unequal lengths / null elements even when both
  // input arrays are non-null, so nullability cannot be inherited
  override def nullable: Boolean = true

  private def elemOk(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }
  private def isFloat(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects (array<float|double>, array<float|double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lf = isFloat(left.dataType)
    val rf = isFloat(right.dataType)
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xv * yv; na += xv * xv; nb += yv * yv; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      def read(src: String, idx: String, float: Boolean): String =
        if (float) s"(double) $src.getFloat($idx)" else s"$src.getDouble($idx)"
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $xv = ${read(a, i, isFloat(left.dataType))};
         |    double $yv = ${read(b, i, isFloat(right.dataType))};
         |    $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  /** Column-DSL form — resolves through the registry, so call
    * [[register]] on the session first. */
  def apply(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("cosine_sim", a, b)

  /** Register as a SQL function on the session (idempotent). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSim(exprs(0), exprs(1)), "scala_udf")
}
