package graft.functions.expressions

import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dot product over two array<double> columns.
  *
  * The `zip_with` + `aggregate` composition (graft.functions.vectors.dot)
  * is semantically identical but runs interpreted — Spark's higher-order
  * functions don't participate in whole-stage codegen, and each lambda
  * invocation allocates. This expression generates a tight primitive
  * loop instead; accumulation order (index-ascending left fold) matches
  * the HOF version bit for bit, so swapping it in cannot change results.
  *
  * SURVEY §2.15 policy: custom Catalyst Expressions are reserved for the
  * §7.4 extension surface where built-ins genuinely can't deliver — this
  * is that case (vector similarity over 10^9+ pair evaluations).
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def nullIntolerant: Boolean = true
  // nullable even for non-null inputs: mismatched lengths / null ELEMENTS
  // produce NULL (without this the codegen isNull slot is a literal false
  // and the null result would be silently dropped)
  override def nullable: Boolean = true
  override def inputTypes: Seq[GraftBridge.AbstractDT] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  // Mismatched lengths or null elements yield NULL — matching the HOF
  // composition (zip_with pads with null, null poisons the fold), so a
  // truncated/corrupt embedding surfaces as null instead of silently
  // scoring on a prefix.
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $x.numElements();
         |double $acc = 0.0;
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $x.getDouble($i) * $y.getDouble($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
