package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native SimHash over an array of token hashes: bit `j` of the result is
  * set iff the sum over tokens of `±1` (sign = bit `j` of the token's hash)
  * is positive — semantically identical to `Hashing.simhash` (and its DuckDB
  * mirror), which spells it as `bits` separate interpreted `aggregate` folds
  * over the array (32 passes per document on the dedup hot path). This
  * expression makes ONE pass, accumulating all bit counters simultaneously.
  *
  * Matching the fold's null semantics: a null element poisons every per-bit
  * sum (`s + null = null`, `null > 0` = false), so any null ⇒ fingerprint 0;
  * an empty array ⇒ 0.
  */
case class SimHashBits(child: Expression, bits: Int) extends UnaryExpression {

  require(bits >= 1 && bits <= 63, "bits ∈ [1, 63]")

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_bits"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash_bits expects array<bigint>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    SimHashBits.compute(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHashBits.compute($c, $bits);")

  override protected def withNewChildInternal(newChild: Expression): SimHashBits =
    copy(child = newChild)
}

object SimHashBits {

  /** Called from generated code — must stay static-shaped (no closures). */
  def compute(arr: ArrayData, bits: Int): Long = {
    val n = arr.numElements()
    val counts = new Array[Int](bits)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return 0L // null poisons the fold (see Scaladoc)
      val h = arr.getLong(i)
      var j = 0
      while (j < bits) {
        counts(j) += (((h >>> j) & 1L).toInt << 1) - 1
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < bits) {
      if (counts(j) > 0) fp |= 1L << j
      j += 1
    }
    fp
  }

  import org.apache.spark.sql.graft.ColumnBridge

  /** Column form. */
  def apply(hashes: Column, bits: Int): Column =
    ColumnBridge.column(SimHashBits(ColumnBridge.expression(hashes), bits))
}
