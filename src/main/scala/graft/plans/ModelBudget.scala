package graft.plans

import java.io.{ObjectOutputStream, OutputStream}

/** Budget guard for the FROZEN-MODEL pattern — collecting a small trained
  * model into a plan literal (IVF centroid arrays in
  * [[graft.pipeline.Similarity]], the DSIR scorer in
  * [[graft.pipeline.Sampling]], BPE merge lists in
  * [[graft.functions.BpeApply]]) so scoring/assignment runs row-locally
  * inside codegen with zero join or shuffle.
  *
  * The trade the pattern makes: the literal rides the serialized task
  * binary to EVERY task of every stage that references it. That is the
  * right trade while the model is broadcast-sized (KBs–MBs), and a silent
  * scheduler tax once a retrain grows it (the r8 bench already logs a
  * 10.8 MiB task binary). This guard makes the boundary explicit: a frozen
  * model past [[MaxModelBytes]] fails LOUDLY at the freeze point with the
  * remediation in the message — persist the model and serve it through the
  * join path ([[graft.pipeline.Similarity.writeIvfIndex]] /
  * `annIvfProbeFromIndex` is the worked example) instead of silently
  * shipping it per task.
  */
object ModelBudget {

  /** Cap on one frozen literal's Java-serialized size: 16 MiB. Generous vs
    * every model shipped today (centroid arrays ~8 KiB at K=16·d=64; the
    * DSIR scorer 64 longs; BPE merge lists ≤ a few hundred KiB at real
    * vocab caps) and still far below where per-stage task-binary broadcast
    * time would dominate scheduling. */
  val MaxModelBytes: Long = 16L << 20

  /** Serialized footprint of a would-be plan literal — measured through a
    * counting stream, nothing buffered. */
  def sizeOf(model: AnyRef): Long = {
    var n = 0L
    val out = new ObjectOutputStream(new OutputStream {
      override def write(b: Int): Unit = n += 1
      override def write(b: Array[Byte], off: Int, len: Int): Unit = n += len
    })
    out.writeObject(model)
    out.flush()
    n
  }

  /** Fail loudly if freezing `model` into a plan literal would exceed
    * [[MaxModelBytes]]. Call at every freeze point, BEFORE `typedLit`. */
  def assertWithinBudget(what: String, model: AnyRef): Unit = {
    val bytes = sizeOf(model)
    require(bytes <= MaxModelBytes,
      s"frozen model '$what' serializes to $bytes bytes, over the " +
        s"$MaxModelBytes-byte plan-literal budget: a literal this large " +
        "taxes every task of every stage via the task binary. Persist the " +
        "model (e.g. Similarity.writeIvfIndex) and serve it through the " +
        "broadcast-join path instead of freezing it into the plan.")
  }
}
