package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ScaleProbe.Ev
import graft.pattern.{AfterMatchSkip, NFA, NfaRunner, Pattern}

/** Spec-scale twin of `StreamProbe`'s quiesced/pipelined schedule pair —
  * the match-count divergence made EXECUTABLE (r12 verdict #5).
  *
  * Measured mechanism (this spec pins it; the first cut of the probe's
  * comment guessed "late-row filtering", which is wrong in detail): no
  * Spark-side late-row drop exists on this operator at all — the
  * event-time column is projected away before `transformWithState`, so
  * `numRowsDroppedByWatermark` stays 0 and every late row REACHES the
  * processor (asserted below). What differs is WHEN the within-horizon
  * retirement runs relative to a borderline-late event's arrival:
  *
  *  - QUIESCED (processAllAvailable per group): each group's batch is
  *    followed by a dedicated empty trigger in which the armed event-time
  *    timer fires and `onWatermark(wm)` retires expired partials — BEFORE
  *    the next group's data is read. A late completion arriving one group
  *    behind finds its partial gone.
  *  - PIPELINED (back-to-back data triggers): the same wm is in force,
  *    but input rows are processed BEFORE expired timers within the
  *    trigger, and `onEvent` only advances the NFA clock to the EVENT's
  *    own time — so the borderline-late completion still finds the
  *    partial alive (its horizon sits between the event's ts and the
  *    trigger wm) and emits a match the quiesced schedule cannot.
  *
  * Both are valid event-time behavior (timer firing order vs late data is
  * schedule-dependent in any engine); what this spec makes LOUD is the
  * divergence CLASS: the match-set diff must be exactly the matches whose
  * bindings contain a borderline-late event, and each stream output must
  * equal an `NfaRunner` replay of its schedule's event/watermark
  * interleaving. Any NFA/timer change that shifts semantics now fails
  * here instead of reading as probe noise.
  */
class ScheduleDivergenceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def sec(s: Long): Long = s * 1000000L // event ts is micros
  private def ms(e: Ev): Long = e.ts / 1000L

  private val WithinMs = 600L * 1000L // 600 s horizon

  // A(kind 0) then C(kind 7), per user, within 600 s
  private val pattern = Pattern.begin[Ev]("A", AfterMatchSkip.SkipPastLastEvent)
    .where(_.kind == 0)
    .next("C").where(_.kind == 7)
    .within(WithinMs)

  /** Four staged groups. User 99 is the watermark clock; user 2's match
    * completes inside group 0 (schedule-independent); user 1's C lands in
    * group 1 at ts 1500 s — BEHIND the wm 2000 s that already passed its
    * partial's 1600 s horizon: the borderline-late class. */
  private val groups: Seq[Seq[Ev]] = Seq(
    Seq(Ev(1L, 1L, sec(1000), 0),                         // user 1: A
      Ev(2L, 2L, sec(1000), 0), Ev(3L, 2L, sec(1100), 7), // user 2: match
      Ev(4L, 99L, sec(2000), 3)),                         // clock
    Seq(Ev(5L, 1L, sec(1500), 7),                         // user 1: late C
      Ev(6L, 99L, sec(3000), 3)),
    Seq(Ev(7L, 99L, sec(4000), 3)),
    Seq(Ev(8L, 99L, sec(5000), 3)))
  private def lateC: Ev = groups(1).head

  private def stage(): String = {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("sched_div").toString
    groups.zipWithIndex.foreach { case (g, i) =>
      spark.createDataset(g).coalesce(1).write.parquet(s"$root/g$i")
    }
    (0 to 1).foreach(n =>
      spark.emptyDataset[Ev].coalesce(1).write.parquet(s"$root/nudge$n"))
    root
  }

  /** Runs the CEP stream over the staged groups under one schedule;
    * returns (matches as (user, startMs), Σ numRowsDroppedByWatermark). */
  private def run(staged: String, name: String,
      pipelined: Boolean): (Seq[(Long, Long)], Long) = {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory(s"sched_run_$name").toString
    val inDir = s"$root/in"
    new java.io.File(inDir).mkdirs()
    def linkGroup(d: String, i: Int): Unit =
      new java.io.File(d).listFiles()
        .filter(_.getName.startsWith("part-")).foreach { f =>
          val dst = java.nio.file.Paths.get(inDir, s"b$i-${f.getName}")
          java.nio.file.Files.createLink(dst, f.toPath)
          java.nio.file.Files.setLastModifiedTime(dst,
            java.nio.file.attribute.FileTime.fromMillis(1000000L + i * 60000L)): Unit
        }
    val reader = spark.readStream.schema(spark.emptyDataset[Ev].schema)
    if (pipelined) reader.option("maxFilesPerTrigger", "1"): Unit
    val timed = reader.parquet(inDir)
      .as[Ev]
      .withColumn("ets", timestamp_micros($"ts"))
      .withWatermark("ets", "0 seconds")
      .drop("ets").as[Ev]
    val out = CepStream.matchPattern[Long, Ev, (Long, Long)](
      timed, _.user_id, _.ts / 1000L, pattern,
      (k, m) => Some((k, m.startTs)), (_, _) => None)
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      if (pipelined) {
        groups.indices.foreach(i => linkGroup(s"$staged/g$i", i))
        q.processAllAvailable()
        (0 to 1).foreach { n =>
          linkGroup(s"$staged/nudge$n", 100 + n); q.processAllAvailable()
        }
      } else {
        groups.indices.foreach { i =>
          linkGroup(s"$staged/g$i", i); q.processAllAvailable()
        }
      }
      val dropped = q.recentProgress
        .flatMap(_.stateOperators).map(_.numRowsDroppedByWatermark).sum
      (spark.table(name).as[(Long, Long)].collect().toSeq.sorted, dropped)
    } finally {
      q.stop()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    }
  }

  /** NfaRunner replay of one key's event/watermark interleaving — the
    * executable definition of a schedule's semantics. `steps` is the
    * per-trigger sequence as the schedule delivers it: Left(wm advance
    * BEFORE this trigger's data — the quiesced empty-trigger timer sweep),
    * Right(events fed in this trigger). */
  private def replay(steps: Seq[Either[Long, Seq[Ev]]]): Seq[NFA.PatternMatch[Ev]] = {
    val runner = new NfaRunner[Ev](pattern, ms)
    val out = Seq.newBuilder[NFA.PatternMatch[Ev]]
    steps.foreach {
      case Left(w) => out ++= runner.onWatermark(w)._1
      case Right(evs) => evs.sortBy(ms).foreach(e => out ++= runner.onEvent(e)._1)
    }
    out.result()
  }

  test("pipelined vs quiesced match diff is exactly the borderline-late " +
    "class, pinned by NfaRunner replay of each schedule's interleaving") {
    val staged = stage()
    try {
      val (mQ, dropQ) = run(staged, "sched_q", pipelined = false)
      val (mP, dropP) = run(staged, "sched_p", pipelined = true)
      info(s"quiesced matches=$mQ  pipelined matches=$mP")
      // no Spark-side late filter exists on this operator (the event-time
      // column is projected away): every late row reaches the processor
      assert(dropQ == 0L && dropP == 0L,
        s"numRowsDroppedByWatermark must be 0/0, got $dropQ/$dropP — a " +
          "nonzero value means the plan grew a late-row filter and the " +
          "divergence mechanism documented here changed")
      // user 1's events, replayed under each schedule's interleaving:
      // quiesced — the empty trigger after group 0 fires the timer sweep
      // at wm 2000 (past the 1600 horizon) BEFORE group 1's C is read
      val u1 = groups.flatten.filter(_.user_id == 1L)
      val quiesced = replay(Seq(
        Right(u1.filter(_.event_id == 1L)), Left(sec(2000) / 1000),
        Right(u1.filter(_.event_id == 5L)), Left(sec(5000) / 1000)))
      // pipelined — group 1's data (the late C) is processed before the
      // trigger's expired-timer sweep at the same wm
      val pipelined = replay(Seq(
        Right(u1), Left(sec(2000) / 1000), Left(sec(5000) / 1000)))
      assert(quiesced.isEmpty,
        s"quiesced replay: the retired partial must not match: $quiesced")
      assert(pipelined.map(m => (1L, m.startTs)) == Seq((1L, sec(1000) / 1000)),
        s"pipelined replay must complete the late match: $pipelined")
      // the streams agree with their replays (plus user 2's invariant match)
      val base = Seq((2L, sec(1000) / 1000))
      assert(mQ == base, s"quiesced stream must equal its replay + base: $mQ")
      assert(mP == (base ++ pipelined.map(m => (1L, m.startTs))).sorted,
        s"pipelined stream must equal its replay + base: $mP")
      // and the diff class itself: every differing match BINDS the
      // borderline-late event — nothing else may diverge
      val diff = mP.toSet -- mQ.toSet
      val lateMatches = pipelined.filter(_.apply("C").contains(lateC))
        .map(m => (lateC.user_id, m.startTs)).toSet
      assert(diff == lateMatches,
        s"match diff $diff must be exactly the late-bound matches $lateMatches")
      assert((mQ.toSet -- mP.toSet).isEmpty,
        "the quiesced schedule must not produce matches pipelined lacks")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(staged))
    }
  }
}
