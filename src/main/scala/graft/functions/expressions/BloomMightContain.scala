package graft.functions.expressions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain(filter, xxhash64(key))` — membership probe
  * against a serialized `org.apache.spark.util.sketch.BloomFilter`.
  *
  * Why it exists (SURVEY §2.15 policy — built-ins genuinely can't):
  * Spark's own runtime bloom pruning (`InjectRuntimeFilter`) only fires
  * on equi-join keys the optimizer chooses; an explicit probe lets an
  * operator prune a 100 TB scan against a *precomputed* small set (the
  * eval-split shingles in decontamination) before any shuffle, with the
  * filter built once via `df.stat.bloomFilter` and shipped to tasks in
  * the plan's reference array — no join in the plan at all for the
  * non-matching (overwhelming) majority of rows.
  *
  * Contract: no false negatives — a key that was `put` always probes
  * true, so an exact verify join over the survivors reproduces the
  * un-pruned result bit for bit. False positives (rate `fpp`) only cost
  * extra verify work. The filter child must be foldable (a literal of
  * the serialized sketch): it is deserialized once per task via the
  * codegen reference array, never per row.
  */
case class BloomMightContain(bloomExpr: Expression, valueExpr: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def left: Expression = bloomExpr
  override def right: Expression = valueExpr
  override def inputTypes: Seq[GraftBridge.AbstractDT] = Seq(BinaryType, LongType)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "bloom_might_contain"
  // Not foldable even with literal children: constant folding would call
  // eval during analysis, which is fine, but keeping it unfoldable makes
  // the probe visible in explain() output for plan audits.
  override def foldable: Boolean = false

  @transient private lazy val bloom: BloomFilter = {
    val bytes = bloomExpr.eval(null).asInstanceOf[Array[Byte]]
    if (bytes == null) null
    else BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  override def eval(input: InternalRow): Any = {
    if (bloom == null) return null
    val v = valueExpr.eval(input)
    if (v == null) null else bloom.mightContainLong(v.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    if (bloom == null) {
      ev.copy(code =
        code"""
              |boolean ${ev.isNull} = true;
              |boolean ${ev.value} = false;
            """.stripMargin)
    } else {
      val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
      val vc = valueExpr.genCode(ctx)
      ev.copy(code =
        code"""
              |${vc.code}
              |boolean ${ev.isNull} = ${vc.isNull};
              |boolean ${ev.value} = false;
              |if (!${ev.isNull}) {
              |  ${ev.value} = $ref.mightContainLong(${vc.value});
              |}
            """.stripMargin)
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(bloomExpr = newLeft, valueExpr = newRight)
}
