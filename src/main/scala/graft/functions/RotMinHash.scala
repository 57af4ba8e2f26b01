package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature from per-shingle base hashes: position `i` of
  * the result is the element of the input array that is minimal under
  * "rotate left by 4·i characters" lexicographic order, materialized in its
  * rotated form — semantically identical to
  * `graft.pipeline.Hashing.minhashSigRot` (and its DuckDB mirror), which
  * computes `array_min(transform(base, b => substring(b,4i+1,32) ||
  * substring(b,1,4i)))` per position.
  *
  * The HOF form allocates two substrings + one concat PER ELEMENT PER
  * POSITION (k passes over the array); this expression walks the array once,
  * compares rotations by index arithmetic with zero allocations, and
  * allocates only the k winning strings. This is the dominant per-row cost
  * of the MinHash/LSH dedup queries (`pipeline/Dedup.scala`).
  *
  * Null elements are skipped (array_min semantics); an empty or all-null
  * input yields an array of k nulls, matching `array_min(transform([]))`.
  */
case class RotMinHash(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "rot_minhash"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"rot_minhash expects array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    RotMinHash.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RotMinHash.compute($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): RotMinHash =
    copy(child = newChild)
}

object RotMinHash {

  /** Compare `a` and `b`, each viewed as rotated left by `r` chars (an
    * offset that exceeds the length degrades to the identity rotation —
    * exactly what the substring/concat spelling produces). Lexicographic,
    * then shorter-first: UTF8String binary order on ASCII hex. */
  private def rotCompare(a: Array[Byte], b: Array[Byte], r: Int): Int = {
    val la = a.length
    val lb = b.length
    val ra = if (r >= la) 0 else r
    val rb = if (r >= lb) 0 else r
    val n = math.min(la, lb)
    var i = 0
    while (i < n) {
      var ia = ra + i; if (ia >= la) ia -= la
      var ib = rb + i; if (ib >= lb) ib -= lb
      val d = (a(ia) & 0xff) - (b(ib) & 0xff)
      if (d != 0) return d
      i += 1
    }
    la - lb
  }

  private def rotate(a: Array[Byte], r: Int): Array[Byte] = {
    val la = a.length
    if (r >= la || r == 0) return a
    val out = new Array[Byte](la)
    System.arraycopy(a, r, out, 0, la - r)
    System.arraycopy(a, 0, out, la - r, r)
    out
  }

  /** One pass over the base-hash array; k rotated minima out. Called from
    * generated code — must stay static-shaped (no closures). */
  def compute(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    // gather non-null elements' bytes once
    var cnt = 0
    val elems = new Array[Array[Byte]](n)
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        elems(cnt) = arr.getUTF8String(j).getBytes
        cnt += 1
      }
      j += 1
    }
    val out = new Array[UTF8String](k)
    if (cnt > 0) {
      var i = 0
      while (i < k) {
        val r = 4 * i
        var best = 0
        var m = 1
        while (m < cnt) {
          if (rotCompare(elems(m), elems(best), r) < 0) best = m
          m += 1
        }
        out(i) = UTF8String.fromBytes(rotate(elems(best), r))
        i += 1
      }
    }
    new GenericArrayData(out.asInstanceOf[Array[Any]])
  }

  import org.apache.spark.sql.graft.ColumnBridge

  /** Column form. */
  def apply(base: Column, k: Int): Column =
    ColumnBridge.column(RotMinHash(ColumnBridge.expression(base), k))
}
