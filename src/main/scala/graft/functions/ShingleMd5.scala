package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused word-n-gram MD5: from a token array straight to the per-shingle
  * base hashes — semantically identical to
  * `Hashing.minhashBase(Hashing.shingles3(words))`, i.e. position `i` is
  * `md5('|' + words[i] + ' ' + words[i+1] + ' ' + words[i+2])` in lowercase
  * hex (fewer than `n` tokens → empty array; null tokens are skipped inside
  * a shingle, matching `concat_ws`).
  *
  * The built-in spelling materializes every shingle string (transform +
  * slice + concat_ws) and then calls Spark's `md5`, which allocates a fresh
  * digest per value — the dominant per-row cost of the MinHash and n-gram
  * dedup queries. This expression feeds one thread-local digest directly
  * from the token bytes: no shingle strings, no per-shingle digest
  * instances, one output allocation per hash.
  */
case class ShingleMd5(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_md5"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingle_md5 expects array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    ShingleMd5.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleMd5.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): ShingleMd5 =
    copy(child = newChild)
}

object ShingleMd5 {

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
  private val hex = "0123456789abcdef".getBytes
  private val Pipe = Array('|'.toByte)
  private val Space = Array(' '.toByte)

  /** Called from generated code — must stay static-shaped (no closures). */
  def compute(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    // token bytes gathered once; a null token contributes nothing and no
    // separator (concat_ws semantics)
    val toks = new Array[Array[Byte]](len)
    var j = 0
    while (j < len) {
      toks(j) = if (arr.isNullAt(j)) null else arr.getUTF8String(j).getBytes
      j += 1
    }
    val md = digests.get()
    val out = new Array[Any](len - n + 1)
    var i = 0
    while (i <= len - n) {
      md.reset()
      md.update(Pipe)
      var k = 0
      var first = true
      while (k < n) {
        val t = toks(i + k)
        if (t != null) {
          if (!first) md.update(Space)
          md.update(t)
          first = false
        }
        k += 1
      }
      val d = md.digest()
      val h = new Array[Byte](32)
      var b = 0
      while (b < 16) {
        h(2 * b) = hex((d(b) >> 4) & 0xf)
        h(2 * b + 1) = hex(d(b) & 0xf)
        b += 1
      }
      out(i) = UTF8String.fromBytes(h)
      i += 1
    }
    new GenericArrayData(out)
  }

  import org.apache.spark.sql.graft.ColumnBridge

  /** Column form. */
  def apply(words: Column, n: Int): Column =
    ColumnBridge.column(ShingleMd5(ColumnBridge.expression(words), n))
}
