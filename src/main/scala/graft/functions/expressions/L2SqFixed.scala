package graft.functions.expressions

import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native fixed-point squared L2 distance over two array<double> columns:
  * Σ_i (long) round((a_i − b_i)² · 10¹²) — the engine-portable integer
  * distance the PQ / k-center paths rank on.
  *
  * The `zip_with` + `aggregate` composition (graft.functions.vectors'
  * former l2SqFixed, kept as `l2SqFixedHof` for the spec cross-check)
  * is semantically identical but runs interpreted: higher-order
  * functions don't participate in whole-stage codegen, each lambda
  * invocation walks an expression tree, and the zipped intermediate
  * array allocates per row. This expression generates one tight loop
  * (r13 optimization, guide §4: eliminate non-codegen expressions in
  * the hot path; the DotProduct precedent).
  *
  * Bit-exactness with the HOF form, term by term:
  *  - (x−y)·(x−y)·1e12 is the same IEEE expression;
  *  - rounding replicates Spark's own Round codegen for DoubleType —
  *    java.math.BigDecimal.valueOf(t).setScale(0, HALF_UP) with the
  *    NaN/Infinity passthrough guard;
  *  - the long narrowing is Java's (long) cast, identical to Cast's
  *    double→long on finite in-range values (the only values real
  *    embeddings produce — both forms agree wherever both are defined);
  *  - accumulation is an index-ascending long sum (order-free).
  *
  * Null contract matches DotProduct (and the HOF form): mismatched
  * lengths or a null element on either side yield NULL, so a truncated
  * embedding surfaces as null instead of silently scoring on a prefix.
  */
case class L2SqFixed(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def inputTypes: Seq[GraftBridge.AbstractDT] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = LongType
  override def prettyName: String = "l2_sq_fixed"

  private def roundTerm(t: Double): Double =
    if (java.lang.Double.isNaN(t) || java.lang.Double.isInfinite(t)) t
    else java.math.BigDecimal.valueOf(t)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getDouble(i) - y.getDouble(i)
      acc += roundTerm(d * d * 1.0e12).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      s"""
         |int $n = $x.numElements();
         |long $acc = 0L;
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $d = $x.getDouble($i) - $y.getDouble($i);
         |    double $t = $d * $d * 1.0E12;
         |    if (!Double.isNaN($t) && !Double.isInfinite($t)) {
         |      $t = java.math.BigDecimal.valueOf($t)
         |        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue();
         |    }
         |    $acc += (long) $t;
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2SqFixed =
    copy(left = newLeft, right = newRight)
}
