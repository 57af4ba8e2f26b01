package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, JavaCode, TrueLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Native probe for a serialized `CountMinSketch`: estimated occurrence
  * count of a string key against a sketch built by Spark's own
  * `count_min_sketch(...)` aggregate (which feeds string values in as their
  * UTF-8 bytes — this probe hashes the same bytes, so estimates line up).
  *
  * The sketch side must be a constant for the whole query — a literal or an
  * uncorrelated scalar subquery (the same contract as Spark's
  * `BloomFilterMightContain`, whose lazy-deserialize-once design this
  * mirrors): the sketch is evaluated and deserialized ONE time per
  * plan instance, then every row probe is a handful of array reads inside
  * whole-stage codegen — no per-row deserialization, no UDF boundary.
  *
  * This is the probe half of the sketch-prefiltered heavy-hitters plan
  * ([[graft.pipeline.HeavyHitters]]): CMS estimates only ever OVERCOUNT, so
  * `cms_estimate(sk, key) >= T` is a conservative candidate gate — every
  * truly-heavy key survives, and an exact recount of the survivors makes
  * the final answer sketch-independent.
  */
case class CmsEstimate(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (left.dataType != BinaryType) {
      TypeCheckFailure(s"sketch side must be BINARY, got ${left.dataType}")
    } else if (right.dataType != StringType) {
      TypeCheckFailure(s"key side must be STRING, got ${right.dataType}")
    } else TypeCheckSuccess
  }

  /** Deserialized once per plan instance (the sketch expression is constant
    * for the query — literal or executed scalar subquery). */
  @transient private lazy val sketch: CountMinSketch = {
    val bytes = left.eval(null).asInstanceOf[Array[Byte]]
    if (bytes == null) null
    else CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
  }

  override def eval(input: InternalRow): Any = {
    if (sketch == null) null
    else {
      val key = right.eval(input)
      if (key == null) null
      else sketch.estimateCount(key.asInstanceOf[UTF8String].getBytes)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    if (sketch == null) {
      ev.copy(value = JavaCode.defaultLiteral(dataType), isNull = TrueLiteral)
    } else {
      val sk = ctx.addReferenceObj("cms", sketch, classOf[CountMinSketch].getName)
      val keyGen = right.genCode(ctx)
      val code =
        code"""
          ${keyGen.code}
          boolean ${ev.isNull} = ${keyGen.isNull};
          long ${ev.value} = -1L;
          if (!${ev.isNull}) {
            ${ev.value} = $sk.estimateCount((Object) ${keyGen.value}.getBytes());
          }
          """
      ev.copy(code = code)
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}

object CmsEstimate {
  import org.apache.spark.sql.graft.ColumnBridge

  /** Column form: `estimate(sketchCol, keyCol)` — sketchCol must be a
    * literal or [[ColumnBridge.scalarSubquery]]. */
  def apply(sketch: Column, key: Column): Column =
    ColumnBridge.column(
      CmsEstimate(ColumnBridge.expression(sketch), ColumnBridge.expression(key)))
}
