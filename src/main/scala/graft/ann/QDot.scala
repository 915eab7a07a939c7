package graft.ann

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused integer dot product of two array<long> vectors — the hot kernel of
  * the brute-force cosine path. Semantically identical to
  * `aggregate(zip_with(a, b, (x,y) => x*y), 0L, _+_)` but one tight loop
  * over the unsafe array data with no per-pair closure/array allocation
  * (the combinator form allocates a zipped array per evaluated pair — at
  * n² pairs that dominates the join).
  */
case class QDotLong(left: Expression, right: Expression)
    extends BinaryExpression with graft.fingerprint.BoxedKernelCodegen {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"qdot expects (array<bigint>, array<bigint>), got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // match the combinator form exactly: zip_with null-pads a LENGTH
    // MISMATCH into null products and aggregate's sum propagates them, so
    // the result is NULL — a truncated/empty vector from an upstream bug
    // must surface as NULL, not read as a partial (or zero = "orthogonal")
    // similarity that silently misses near-dup pairs. Same for a null
    // element inside either array.
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QDotLong =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "qdot"
}
