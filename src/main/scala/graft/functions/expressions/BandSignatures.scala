package graft.functions.expressions

import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** All nBands sign-LSH band signatures of one vector in ONE tight loop:
  * `sigs[b] = Σ_k (dot(v, plane[b·r+k]) > 0 ? 1 << k : 0)`.
  *
  * Why an expression (r13, guide §4): the previous form inlined
  * nBands·r separate [[DotProduct]] loops into one whole-stage-codegen
  * method — past the JVM's huge-method bytecode limit, so HotSpot never
  * JIT-compiled it and the band projection ran interpreted (~27
  * CPU-seconds for 2 000 × 96 dot-64s at sf0.1; measured noop 1.2 s →
  * this form). CodegenFallback is deliberate: the per-row cost is one
  * virtual call into [[eval]], whose hand-written while-loops JIT like
  * any JVM method — unlike a giant generated method, which never
  * compiles, and unlike higher-order functions, which dispatch an
  * interpreted lambda per element. Every arithmetic term is evaluated
  * in the identical order as the inline form (index-ascending dot,
  * `> 0` on the same IEEE double), so band signatures are bit-identical.
  *
  * Null contract matches the inline `when(dot(v, plane) > 0, …)`
  * composition term by term: a NULL dot — null input vector, null
  * element, or a length ≠ dim — contributed a 0 bit there (when's
  * otherwise-branch), so here too; the output array is never null.
  */
case class BandSignatures(child: Expression, planes: Array[Array[Double]],
                          planesPerBand: Int)
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  private def nBands = planes.length / planesPerBand

  override def nullable: Boolean = false
  override def inputTypes: Seq[GraftBridge.AbstractDT] =
    Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "band_signatures"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input).asInstanceOf[ArrayData]
    val dim = planes(0).length
    val out = new Array[Int](nBands)
    if (v != null && v.numElements() == dim) {
      var b = 0
      while (b < nBands) {
        var sig = 0
        var k = 0
        while (k < planesPerBand) {
          val p = planes(b * planesPerBand + k)
          var acc = 0.0
          var i = 0
          var isNull = false
          while (i < dim && !isNull) {
            if (v.isNullAt(i)) isNull = true
            else { acc += v.getDouble(i) * p(i); i += 1 }
          }
          if (!isNull && acc > 0) sig |= 1 << k
          k += 1
        }
        out(b) = sig
        b += 1
      }
    }
    new GenericArrayData(out)
  }

  // Structural equality over the plane CONTENTS (r14, ADVICE): Scala
  // arrays compare by reference, so the default case-class equals made
  // two semantically identical BandSignatures expressions never equal —
  // Catalyst canonicalization, semanticEquals and common-subexpression
  // elimination silently failed to dedup them. Arrays stay the storage
  // (eval's hot loop indexes them unboxed); equality goes element-wise.
  override def equals(other: Any): Boolean = other match {
    case o: BandSignatures =>
      planesPerBand == o.planesPerBand && child == o.child &&
        java.util.Arrays.deepEquals(
          planes.asInstanceOf[Array[AnyRef]], o.planes.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Int.box(planesPerBand),
      Int.box(java.util.Arrays.deepHashCode(planes.asInstanceOf[Array[AnyRef]])))

  override protected def withNewChildInternal(newChild: Expression): BandSignatures =
    copy(child = newChild)
}
