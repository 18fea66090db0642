package graft.functions.expressions

import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** `z_order_key(d0, d1, …)` — Morton (Z-order) bit interleave of 2-3
  * non-negative long dimensions into one long sort key.
  *
  * Why it exists: [[graft.warehouse.Layout.compact]]'s lexicographic
  * clustering gives tight per-file min/max on the FIRST sort column
  * only — a range predicate on the second column prunes nothing. Sorting
  * by the interleaved key bounds every file in EVERY interleaved
  * dimension at once (each file owns a contiguous Z-curve segment ≈ a
  * hyper-rectangle), so parquet row-group/file skipping fires for
  * predicates on any dimension — the standard multi-dimensional layout
  * trick of warehouse OPTIMIZE implementations, expressed here as a
  * codegen'd Catalyst expression (SURVEY §2.15: built-ins cannot express
  * bit interleave without per-row HOF interpretation).
  *
  * Semantics: child `i` contributes its low [[bitsPerDim]] bits; bit `b`
  * of child `i` lands at result bit `b * numChildren + i` (child 0 owns
  * the least-significant lane). Values are masked to the lane width, so
  * callers normalize each dimension into [0, 2^bits) first — see
  * `Layout.zOrderCompact`, which range-scales via per-column min/max.
  * Any null dimension yields null.
  */
case class ZOrderKey(children: Seq[Expression])
  extends Expression with ExpectsInputTypes {

  require(children.size >= 2 && children.size <= 3,
    s"z_order_key takes 2-3 dimensions, got ${children.size}")

  /** Lane width: 16 bits for 2 dims (32-bit keys), 16 for 3 (48-bit). */
  val bitsPerDim: Int = math.min(16, 63 / children.size)
  private def mask: Long = (1L << bitsPerDim) - 1

  override def inputTypes: Seq[GraftBridge.AbstractDT] =
    Seq.fill(children.size)(LongType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "z_order_key"

  override def eval(input: InternalRow): Any = {
    val n = children.size
    var acc = 0L
    var i = 0
    while (i < n) {
      val v = children(i).eval(input)
      if (v == null) return null
      val d = v.asInstanceOf[Long] & mask
      var b = 0
      while (b < bitsPerDim) {
        acc |= ((d >> b) & 1L) << (b * n + i)
        b += 1
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val n = children.size
    val childGen = children.map(_.genCode(ctx))
    val acc = ctx.freshName("zacc")
    val lanes = childGen.zipWithIndex.map { case (cg, i) =>
      val d = ctx.freshName("zd")
      val b = ctx.freshName("zb")
      s"""
         |if (!${ev.isNull}) {
         |  ${cg.code}
         |  if (${cg.isNull}) {
         |    ${ev.isNull} = true;
         |  } else {
         |    long $d = ${cg.value} & ${mask}L;
         |    for (int $b = 0; $b < $bitsPerDim; $b++) {
         |      $acc |= (($d >> $b) & 1L) << ($b * $n + $i);
         |    }
         |  }
         |}
       """.stripMargin
    }.mkString("\n")
    ev.copy(code =
      code"""
            |boolean ${ev.isNull} = false;
            |long $acc = 0L;
            |$lanes
            |long ${ev.value} = $acc;
          """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZOrderKey =
    copy(children = newChildren)
}
