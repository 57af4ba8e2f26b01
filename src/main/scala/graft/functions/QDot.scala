package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native integer dot product of two `array<bigint>` columns — the exact
  * semantics of the higher-order spelling it replaces
  * (`aggregate(zip_with(a, b, (x, y) => x * y), 0L, (acc, x) => acc + x)`,
  * `graft.pipeline.Hashing.qdot`): `zip_with` pads the shorter array with
  * nulls and `x * y` of a null is null, so a length mismatch or any null
  * element yields a null sum. The HOF form allocates a zipped array and runs
  * two interpreted lambda passes PER PAIR; this is one fused loop inside
  * whole-stage codegen. Per-pair dot products dominate the blocked embedding
  * near-dup join (`pipeline/Dedup.scala`) and the ANN candidate ranking
  * (`pipeline/Similarity.scala`).
  */
case class QDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "qdot"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"qdot expects (array<bigint>, array<bigint>), got $other")
    }

  // A valid (equal-length, no-null-element) input still produces a non-null
  // sum, but mismatch/null-element inputs return null — so the expression is
  // nullable even over non-null children.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    QDot.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ev2 = nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("boxedDot")
      s"""
         |java.lang.Long $boxed = graft.functions.QDot.compute($a, $b);
         |if ($boxed == null) { ${ev.isNull} = true; } else { ${ev.value} = $boxed; }
       """.stripMargin
    })
    ev2
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QDot =
    copy(left = newLeft, right = newRight)
}

object QDot {

  /** Fused dot-product loop; boxed return so null can signal the HOF form's
    * mismatch/null-element semantics. Called from generated code — must stay
    * static-shaped. */
  def compute(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }

  import org.apache.spark.sql.graft.ColumnBridge

  /** Column form. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(QDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
