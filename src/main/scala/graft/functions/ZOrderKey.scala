package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native codegen'd Z-order (Morton) key: interleaves the low
  * [[ZOrderKey.Bits]] bits of two non-negative longs — `a`'s bit i lands at
  * output bit 2i, `b`'s at 2i+1 — so sorting by the key gives a
  * space-filling-curve layout over BOTH dimensions at once.
  *
  * The 100 TB use: a table range-partitioned and sorted by `z(a, b)` gets
  * per-file min/max footer stats that are NARROW in `a` AND `b`
  * simultaneously, so a predicate on EITHER column prunes files at planning
  * time — single-column sorting gives that for one dimension and leaves the
  * other spanning the full range in every file (`LayoutSpec` measures
  * exactly this on real parquet footers). Same mechanism as
  * Delta/Iceberg `ZORDER BY` clustering, expressed as a plain deterministic
  * expression any `repartitionByRange` can consume.
  *
  * Values must fit [[ZOrderKey.Bits]] unsigned bits (range-normalize wider
  * domains first); out-of-range inputs raise rather than silently fold,
  * because two distant rows mapping to one key would corrupt the layout
  * invisibly.
  */
case class ZOrderKey(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "zorder_key"

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.valueOf(ZOrderKey.interleave(
      a.asInstanceOf[Long], b.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cls = ZOrderKey.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.interleave($a, $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderKey =
    copy(left = newLeft, right = newRight)
}

object ZOrderKey {
  /** Bits kept per dimension (2×31 = 62 output bits, sign bit untouched). */
  val Bits = 31

  /** Bit-interleave two non-negative longs (a even positions, b odd). */
  def interleave(a: Long, b: Long): Long = {
    if (a < 0 || a >= (1L << Bits) || b < 0 || b >= (1L << Bits)) {
      throw new IllegalArgumentException(
        s"zorder_key inputs must be in [0, 2^$Bits): got ($a, $b)")
    }
    spread(a) | (spread(b) << 1)
  }

  /** Spread the low 31 bits of `v` to even bit positions (0,2,4,…) —
    * the standard Morton mask cascade. */
  def spread(v: Long): Long = {
    var x = v & 0x7fffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  import org.apache.spark.sql.graft.ColumnBridge

  /** Column form. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(
      ZOrderKey(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
