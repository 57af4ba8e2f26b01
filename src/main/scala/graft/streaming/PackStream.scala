package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Streaming sequence packing — the continuous-ingest counterpart of
  * [[graft.pipeline.Curation.pack]]: chunks arrive on a stream and are laid
  * end-to-end into fixed token-budget training sequences, one running
  * offset per stratum key (batch packing uses a global offset — a stream
  * has no global order, so streaming packs PER KEY, each key's offset
  * carried in a ValueState across micro-batches).
  *
  * Rows within one micro-batch are packed in (doc_id, chunk_id) order so a
  * replay of the same batches reproduces the same pack ids; across batches
  * order is arrival order, which is what continuous packing means.
  */
object PackStream {

  case class Chunk(key: String, doc_id: Long, chunk_id: Int, n_tok: Int)
  case class Packed(key: String, doc_id: Long, chunk_id: Int, pack_id: Long, n_tok: Int)

  def pack(ds: Dataset[Chunk], budget: Int): Dataset[Packed] = {
    implicit val pe = Encoders.product[Packed]
    implicit val se = Encoders.STRING
    ds.groupByKey(_.key)
      .transformWithState(
        new PackProcessor(budget),
        TimeMode.None(),
        OutputMode.Append())
  }
}

/** Per-key running token offset; the only state is one long. */
final class PackProcessor(budget: Int)
  extends StatefulProcessor[String, PackStream.Chunk, PackStream.Packed] {

  @transient private var offset: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    offset = getHandle.getValueState[Long]("off", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[PackStream.Chunk],
      timerValues: TimerValues): Iterator[PackStream.Packed] = {
    var off = if (offset.exists()) offset.get() else 0L
    val out = rows.toArray.sortBy(c => (c.doc_id, c.chunk_id)).map { c =>
      val pid = off / budget
      off += c.n_tok
      PackStream.Packed(key, c.doc_id, c.chunk_id, pid, c.n_tok)
    }
    offset.update(off)
    out.iterator
  }
}
