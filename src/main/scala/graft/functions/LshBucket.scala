package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native random-hyperplane LSH bucket id for a quantized vector: bit `p`
  * of the result is the sign of the dot product with deterministic plane
  * `p`, whose component for dimension `d` is ±1 by bit 16 of the LCG mix
  * `1103515245·d + 12345·p` — semantically identical to
  * `graft.pipeline.Similarity.bucket`'s higher-order spelling (and its
  * DuckDB mirror), which re-walks the vector once per plane through
  * interpreted `zip_with`/`aggregate` lambdas. One fused pass here.
  *
  * Null elements contribute nothing to a plane sum in the HOF form
  * (`x * s` with null x → null; aggregate's `s + null` → null → `> 0`
  * false, zeroing EVERY plane bit) — mirrored by returning 0 on any null.
  */
case class LshBucket(child: Expression, planes: Int) extends UnaryExpression {

  require(planes >= 1 && planes <= 62, "planes ∈ [1, 62]")

  override def dataType: DataType = LongType
  override def prettyName: String = "lsh_bucket"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lsh_bucket expects array<bigint>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    LshBucket.compute(input.asInstanceOf[ArrayData], planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.LshBucket.compute($c, $planes);")

  override protected def withNewChildInternal(newChild: Expression): LshBucket =
    copy(child = newChild)
}

object LshBucket {

  /** Called from generated code — must stay static-shaped (no closures). */
  def compute(arr: ArrayData, planes: Int): Long = {
    val n = arr.numElements()
    val sums = new Array[Long](planes)
    var d = 0
    while (d < n) {
      if (arr.isNullAt(d)) return 0L // null poisons every plane sum
      val x = arr.getLong(d)
      val base = 1103515245L * d
      var p = 0
      while (p < planes) {
        // sign = bit 16 of the LCG mix, mapped to ±1
        val s = (((base + 12345L * p) >>> 16) & 1L) * 2L - 1L
        sums(p) += x * s
        p += 1
      }
      d += 1
    }
    var bkt = 0L
    var p = 0
    while (p < planes) {
      if (sums(p) > 0) bkt |= 1L << p
      p += 1
    }
    bkt
  }

  import org.apache.spark.sql.graft.ColumnBridge

  /** Column form. */
  def apply(q: Column, planes: Int): Column =
    ColumnBridge.column(LshBucket(ColumnBridge.expression(q), planes))
}
