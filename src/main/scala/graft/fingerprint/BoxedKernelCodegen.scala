package graft.fingerprint

import org.apache.spark.sql.catalyst.expressions.BinaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}

/** Shared codegen for binary kernel expressions whose evaluation lives in
  * interpreted `nullSafeEval` (suffix-array LCS/threshold, qdot): one
  * boxed call into the expression reference with a null-propagating unbox,
  * so the cast/unbox/null template cannot diverge across the expressions
  * that use it. The kernel call itself dominates each of these (an SA
  * build or a vector loop per row), so the boxed indirection is noise —
  * what matters is staying INSIDE whole-stage codegen rather than forcing
  * the fallback interpreter on the surrounding stage.
  *
  * A `null` return from `nullSafeEval` becomes SQL NULL; implementors are
  * forced nullable so the generated null branch always compiles.
  */
private[graft] trait BoxedKernelCodegen extends BinaryExpression {

  // the kernel may return null for non-null inputs (e.g. a dimension
  // mismatch); without this, non-nullable children would make codegen pin
  // isNull to a literal and the null branch below could not compile
  override def nullable: Boolean = true

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("kernelExpr", this, getClass.getName)
    val res = ctx.freshName("kernelRes")
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"""Object $res = $ref.nullSafeEval($l, $r);
         |if ($res == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = (${CodeGenerator.boxedType(dataType)}) $res;
         |}
         |""".stripMargin)
  }
}
