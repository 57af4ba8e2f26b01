package graft.operators

import org.apache.spark.sql.{Column, Dataset, Encoder}

import graft.pattern.{NFA, Pattern}

/** Batch execution of a [[graft.pattern.Pattern]] over a keyed `Dataset` —
  * the engine's equivalent of the reference's `CEP.pattern(keyedStream, pattern)`
  * operator (`/root/reference/src/main/scala/kosmag/FlinkCEPExample.scala:76`)
  * plus the timed-out-partial-match side channel
  * (`FlinkCEPAbsenceOfEventExample.scala:78-106`).
  *
  * Execution shape (scale contract):
  *   - `groupByKey(keyFn)` plans one hash `Exchange` on the key — the same
  *     shuffle boundary as the reference's `keyBy("id")`.
  *   - `flatMapSortedGroups(sortCols)` rides the shuffle's sort: each key's
  *     events arrive as an ALREADY-SORTED iterator, so no per-key in-memory
  *     sort or buffer is needed. [[NFA.run]] is single-pass; per-key memory is
  *     O(live partial matches), bounded by the pattern's `within` horizon.
  *   - Spark has no side outputs: matches and timeouts are emitted into ONE
  *     output dataset as a tagged ADT (a `kind` discriminator column),
  *     split downstream with `filter` (SURVEY.md §7.4).
  */
object Cep {

  /** Run `pattern` per key, emitting user-projected rows for matches and
    * timed-out partial matches. `sortCols` must totally order each key's
    * events by event time (add a tiebreak column for determinism).
    */
  def matchPattern[K, T, O](
      ds: Dataset[T],
      keyFn: T => K,
      tsFn: T => Long,
      pattern: Pattern[T],
      sortCols: Seq[Column])(
      emitMatch: (K, NFA.PatternMatch[T]) => IterableOnce[O],
      emitTimeout: (K, NFA.PatternTimeout[T]) => IterableOnce[O])(
      implicit ke: Encoder[K], oe: Encoder[O]): Dataset[O] =
    ds.groupByKey(keyFn)
      .flatMapSortedGroups(sortCols: _*) { (k, events) =>
        val (matches, timeouts) = NFA.run(events, tsFn, pattern)
        matches.iterator.flatMap(m => emitMatch(k, m).iterator) ++
          timeouts.iterator.flatMap(to => emitTimeout(k, to).iterator)
      }
}
