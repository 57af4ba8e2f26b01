package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused word-n-gram shingles: from a token array straight to the
  * space-joined shingle strings — semantically identical to the built-in
  * spelling `Hashing.shingles3` uses
  * (`transform(sequence(1, size-2), i => concat_ws(" ", slice(w, i, n)))`
  * guarded by `size >= n`): fewer than `n` tokens → empty array; a null
  * token contributes nothing and no separator (`concat_ws` semantics).
  *
  * The built-in spelling is a nest of higher-order functions — `sequence`,
  * `transform`-with-lambda, `slice`, `concat_ws` — none of which
  * participate in whole-stage codegen, so every shingle costs interpreted
  * lambda dispatch plus a sliced temporary array. Measured on the sf0.1
  * corpus (~240k shingles) the HOF spelling needs ~3 s warm and ~11 s of
  * first-run codegen; this expression is one static-shaped loop over the
  * token bytes (one `UTF8String.concat`-free output allocation per
  * shingle), the same fusion trick as [[ShingleMd5]] minus the digest.
  */
case class ShingleStrings(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_strings"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingle_strings expects array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    ShingleStrings.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleStrings.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): ShingleStrings =
    copy(child = newChild)
}

object ShingleStrings {

  private val Space = Array(' '.toByte)

  /** Called from generated code — must stay static-shaped (no closures). */
  def compute(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[Array[Byte]](len)
    var j = 0
    while (j < len) {
      toks(j) = if (arr.isNullAt(j)) null else arr.getUTF8String(j).getBytes
      j += 1
    }
    val out = new Array[Any](len - n + 1)
    var i = 0
    while (i <= len - n) {
      // exact concat_ws(" ", slice(...)) byte layout: null tokens add
      // neither bytes nor a separator
      var size = 0
      var parts = 0
      var k = 0
      while (k < n) {
        val t = toks(i + k)
        if (t != null) { size += t.length; parts += 1 }
        k += 1
      }
      if (parts > 1) size += parts - 1
      val bytes = new Array[Byte](size)
      var pos = 0
      var first = true
      k = 0
      while (k < n) {
        val t = toks(i + k)
        if (t != null) {
          if (!first) { System.arraycopy(Space, 0, bytes, pos, 1); pos += 1 }
          System.arraycopy(t, 0, bytes, pos, t.length)
          pos += t.length
          first = false
        }
        k += 1
      }
      out(i) = UTF8String.fromBytes(bytes)
      i += 1
    }
    new GenericArrayData(out)
  }

  import org.apache.spark.sql.graft.ColumnBridge

  /** Column form. */
  def apply(words: Column, n: Int): Column =
    ColumnBridge.column(ShingleStrings(ColumnBridge.expression(words), n))
}
