package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd char-fold hash: `h = (h * 31 + byte) % M` over the
  * UTF-8 bytes of the input, `M` the largest prime < 2^53 (so `h*31 + b`
  * never overflows a signed 64-bit intermediate).
  *
  * This is the hot inner loop of the text-pipeline operators (fingerprints,
  * SimHash token hashes — `graft.pipeline.Hashing`): the equivalent
  * `aggregate(split(s, ''), ...)` higher-order fold allocates a string per
  * character and interprets two lambdas per step, while this expression
  * compiles to a tight per-byte Java loop inside whole-stage codegen. For
  * ASCII text (the oracle corpus) byte-fold == char-fold, so results stay
  * DuckDB-reproducible (`list_reduce` over `ord()`); production data would
  * use this native form on both sides of any comparison.
  *
  * Custom-Expression ladder (SURVEY.md §2.3 UDF row): this is preference (b)
  * — a scalar `Expression` with `doGenCode` — chosen over a Scala UDF
  * because it stays inside codegen with no serialization boundary.
  */
case class CharFoldHash(child: Expression, seed: Long)
  extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "char_fold_hash"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = seed
    var i = 0
    while (i < bytes.length) {
      h = (h * 31 + (bytes(i) & 0xff)) % CharFoldHash.M
      i += 1
    }
    java.lang.Long.valueOf(h)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = ${seed}L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = ($h * 31L + ($bytes[$i] & 0xff)) % ${CharFoldHash.M}L;
         |}
         |${ev.value} = $h;
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CharFoldHash =
    copy(child = newChild)
}

object CharFoldHash {
  /** Largest prime below 2^53 (same modulus as graft.pipeline.Hashing.M). */
  val M: Long = 9007199254740881L

  import org.apache.spark.sql.graft.ColumnBridge

  /** Column form. */
  def apply(c: Column, seed: Long = 0L): Column =
    ColumnBridge.column(CharFoldHash(ColumnBridge.expression(c), seed))

  /** Register `char_fold_hash(str[, seed])` for SQL use. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "char_fold_hash",
      exprs => exprs match {
        case Seq(e) => CharFoldHash(e, 0L)
        case Seq(e, s) => CharFoldHash(e, s.eval(null).toString.toLong)
        case _ => throw new IllegalArgumentException("char_fold_hash(str[, seed])")
      },
      "scala_udf")
}
