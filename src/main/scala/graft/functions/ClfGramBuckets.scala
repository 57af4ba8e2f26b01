package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused classifier feature buckets of one token: the char-fold hash of the
  * word itself plus the hashes of every boundary-marked char 3- and 4-gram
  * of `<token>`, each reduced mod `buckets` — bit-identical to the
  * built-in spelling `TextAnalysis.clfFeatureBuckets` replaces
  * (`transform(sequence(...), i => charFoldHash(g.substr(i, n)) % B)` over
  * `g = concat("<", t, ">")`, with the `length ≥ 4` guard for the 4-gram
  * arm), including on multibyte input: windows advance by CODE POINT
  * (Spark's `substr` semantics) while each window folds its UTF-8 BYTES
  * (what [[CharFoldHash]] folds for the substring).
  *
  * Why native (the [[ShingleStrings]] rationale): the HOF spelling
  * allocates a substring per gram and interprets the fold lambdas outside
  * whole-stage codegen — measured +1.2 s each on q_text_classifier_fit /
  * _eval at sf0.1 when the r12 subword features landed. This expression is
  * one pass over the marked token's bytes with zero per-gram allocation:
  * output = `[fold(t)] ++ fold3(g) ++ fold4(g)`, all `% buckets`.
  */
case class ClfGramBuckets(child: Expression, buckets: Long)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "clf_gram_buckets"

  override def nullSafeEval(input: Any): Any =
    ClfGramBuckets.compute(input.asInstanceOf[UTF8String], buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ClfGramBuckets.compute($c, ${buckets}L);")

  override protected def withNewChildInternal(newChild: Expression): ClfGramBuckets =
    copy(child = newChild)
}

object ClfGramBuckets {

  private val M = CharFoldHash.M

  /** Called from generated code — static-shaped, no closures. */
  def compute(t: UTF8String, buckets: Long): ArrayData = {
    val tb = t.getBytes
    // g = '<' ++ tb ++ '>'
    val g = new Array[Byte](tb.length + 2)
    g(0) = '<'.toByte
    System.arraycopy(tb, 0, g, 1, tb.length)
    g(tb.length + 1) = '>'.toByte
    // code-point start offsets within g (UTF-8 lead bytes), plus the end
    // sentinel — windows advance per code point, folds run over the bytes
    var nChars = 0
    var b = 0
    while (b < g.length) {
      if ((g(b) & 0xc0) != 0x80) nChars += 1
      b += 1
    }
    val off = new Array[Int](nChars + 1)
    var ci = 0
    b = 0
    while (b < g.length) {
      if ((g(b) & 0xc0) != 0x80) { off(ci) = b; ci += 1 }
      b += 1
    }
    off(nChars) = g.length

    def fold(bytes: Array[Byte], from: Int, until: Int): Long = {
      var h = 0L
      var i = from
      while (i < until) {
        h = (h * 31 + (bytes(i) & 0xff)) % M
        i += 1
      }
      h % buckets
    }

    val n3 = math.max(nChars - 2, 0)
    val n4 = if (nChars >= 4) nChars - 3 else 0
    val out = new Array[Any](1 + n3 + n4)
    out(0) = java.lang.Long.valueOf(fold(tb, 0, tb.length))
    var j = 0
    while (j < n3) {
      out(1 + j) = java.lang.Long.valueOf(fold(g, off(j), off(j + 3)))
      j += 1
    }
    j = 0
    while (j < n4) {
      out(1 + n3 + j) = java.lang.Long.valueOf(fold(g, off(j), off(j + 4)))
      j += 1
    }
    new GenericArrayData(out)
  }

  import org.apache.spark.sql.graft.ColumnBridge

  /** Column form. */
  def apply(token: Column, buckets: Long): Column =
    ColumnBridge.column(ClfGramBuckets(ColumnBridge.expression(token), buckets))
}
