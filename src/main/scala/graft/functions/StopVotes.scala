package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native stopword-vote counter: for each of `lists`, the number of
  * whitespace tokens of the input equal to any word in that list — the hot
  * loop of language ID ([[graft.pipeline.TextAnalysis.langId]] /
  * `langIdEval`), returned as ONE `array<long>` per row.
  *
  * Why native and why one array: the higher-order spelling
  * (`size(filter(split(text,' '), t -> t.isInCollection(...)))` × 4 lists)
  * contains lambda variables, and Catalyst's subexpression elimination
  * SKIPS lambda-bearing subtrees (SPARK-37466) — so after projection
  * collapse, a langid query that references the scores in `greatest` + a
  * 5-way CASE re-evaluates the tokenize+filter ~28 times per row AND emits
  * ~28 copies of it into generated code (the r5 bench measured that
  * first-compile at minutes on a slow host; the sibling query reusing the
  * warm shape ran 0.3 s). This expression has no lambdas, so the whole
  * `stop_votes(lower(text))` subtree is CSE-eligible: evaluated ONCE per
  * row, one tight byte-walk (token boundaries at 0x20 — safe in UTF-8:
  * continuation bytes are ≥ 0x80, so a space byte is always a real space),
  * one short word-compare loop per token.
  *
  * Custom-Expression ladder (SURVEY.md §2.3 UDF row): preference (b), same
  * as [[CharFoldHash]].
  */
case class StopVotes(child: Expression, lists: Seq[Seq[String]])
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "stop_votes"

  @transient private lazy val words: Array[Array[Array[Byte]]] =
    lists.map(_.map(_.getBytes("UTF-8")).toArray).toArray

  /** Count matches per list over the tokens of `s`. */
  def votes(s: UTF8String): Array[Long] = {
    val bytes = s.getBytes
    val counts = new Array[Long](words.length)
    var i = 0
    val n = bytes.length
    while (i < n) {
      while (i < n && bytes(i) == ' ') i += 1
      val start = i
      while (i < n && bytes(i) != ' ') i += 1
      val len = i - start
      if (len > 0) {
        var l = 0
        while (l < words.length) {
          val ws = words(l)
          var w = 0
          var hit = false
          while (!hit && w < ws.length) {
            val cand = ws(w)
            if (cand.length == len) {
              var j = 0
              while (j < len && cand(j) == bytes(start + j)) j += 1
              hit = j == len
            }
            w += 1
          }
          if (hit) counts(l) += 1
          l += 1
        }
      }
    }
    counts
  }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(votes(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stopVotes", this, classOf[StopVotes].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = new ${classOf[GenericArrayData].getName}($ref.votes($c));")
  }

  override protected def withNewChildInternal(newChild: Expression): StopVotes =
    copy(child = newChild)
}

object StopVotes {
  import org.apache.spark.sql.graft.ColumnBridge

  /** Column form. */
  def apply(text: Column, lists: Seq[Seq[String]]): Column =
    ColumnBridge.column(StopVotes(ColumnBridge.expression(text), lists))
}
