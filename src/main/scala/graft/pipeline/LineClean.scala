package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import Hashing._

/** C4/Gopher LINE-LEVEL cleaning — the standard web-corpus curation stage
  * between raw ingest and document-level dedup (Raffel et al. 2020 "C4";
  * Rae et al. 2021 "Gopher" repetition rules; Penedo et al. 2023
  * "RefinedWeb"): per LINE, drop bullet lines, ellipsis-ended lines, lines
  * without terminal punctuation, and under-length lines; dedup repeated
  * lines within a document (keep-first); then gate the DOCUMENT on its
  * duplicate-line fraction and on having enough surviving lines.
  *
  * The synthetic corpus has no newlines, so the declared query first lays
  * the token stream out into deterministic lines with hash-decided
  * decoration (terminal '.', ellipsis, bullet prefix, and an injected
  * duplicate line for ~1/3 of docs) — the [[DataQuality]] dirty-replay
  * precedent: the construction is replayed in the oracle, and the CLEANING
  * operator itself ([[LineClean.cleanLinesOf]]) takes any real
  * newline-delimited text column unchanged.
  *
  * Shape at scale: everything is per-row array lambdas over the line list
  * (the `q_text_entropy` narrow shape) — no shuffle, no UDF, stream-safe
  * (a live ingest maps the same projection; `LineCleanSpec` pins streaming
  * ≡ batch). The within-doc dedup is `array_position == index`, O(lines²)
  * per row but bounded by document line count, never by the corpus.
  */
object LineClean {

  /** Tokens per synthesized line. */
  val LineW = 6
  /** Minimum words for a line to survive (C4 uses 5 on real web text;
    * the synthetic corpus's 6-token lines need 3). */
  val MinLineWords = 3
  /** Minimum surviving lines for the document to survive (C4: 3
    * sentences; scaled to this corpus's short docs). */
  val MinKeptLines = 2
  /** Gopher duplicate-line-fraction gate, in tenths (3 = 30%). */
  val MaxDupTenths = 3

  /** Deterministic line synthesis from a whitespace corpus: [[LineW]]-token
    * lines; per line `h = charFoldHash(line)` decides decoration — h%5 ∈
    * {0,1,2} terminal '.', h%5 = 3 bare (no punctuation), h%5 = 4 ellipsis;
    * h%11 = 0 additionally prefixes a bullet. Docs with
    * `charFoldHash("dup:" + doc_id) % 3 = 0` get their first line repeated
    * at the end (the within-doc dup the cleaner must catch). */
  private[graft] def synthLinedText(docId: Column, text: Column): Column = {
    // Higher-order-function trees are CSE-EXEMPT, so every plain reuse of
    // a Column here re-evaluates its whole upstream per row (the r1/r10
    // hazard — measured ~0.7 s on q_pipeline_full at sf0.1 when the r11
    // empty-doc guard added one more `size(tokens)` reference): bind the
    // token array and then the decorated line list ONCE each as lambda
    // variables (`transform(array(x), v -> ...)` — v is a true variable,
    // not a copied tree), h once per line as a struct field.
    def bind(x: Column)(f: Column => Column): Column =
      element_at(transform(array(x), f), 1)
    bind(tokens(text)) { w =>
      // zero-token guard (r10 ADVICE): Spark's sequence(1, 0, 6) throws
      // "Illegal sequence boundaries" while DuckDB's generate_series(1, 0,
      // 6) yields [] — an empty/whitespace-only document must produce an
      // empty line list in BOTH engines, not a crash in one.
      val raw = when(size(w) > 0,
        transform(sequence(lit(1), size(w), lit(LineW)),
          st => concat_ws(" ", slice(w, st, lit(LineW)))))
        .otherwise(array().cast("array<string>"))
      val withH = transform(raw, l => struct(l.as("l"), charFoldHash(l).as("h")))
      bind(transform(withH, x => {
        val l = x.getField("l")
        val h = x.getField("h")
        val punct = when(h % 5 <= 2, concat(l, lit(".")))
          .when(h % 5 === 3, l)
          .otherwise(concat(l, lit("...")))
        when(h % 11 === 0, concat(lit("- "), punct)).otherwise(punct)
      })) { deco =>
        val lines = when(
          charFoldHash(concat(lit("dup:"), docId.cast("string"))) % 3 === 0 &&
            size(deco) >= 2,
          concat(deco, slice(deco, 1, 1))).otherwise(deco)
        array_join(lines, "\n")
      }
    }
  }

  /** Per-line first-drop reason over a newline-delimited `line list`
    * column, in rule order: dup (an identical EARLIER line exists) →
    * bullet → ellipsis → no terminal punctuation → under-length → kept. */
  private def lineReasons(lines: Column): Column =
    transform(lines, (l, i) =>
      when(array_position(lines, l) =!= i + 1, "dup")
        .when(l.startsWith("- ") || l.startsWith("* "), "bullet")
        .when(l.endsWith("..."), "ellipsis")
        .when(!(l.endsWith(".") || l.endsWith("!") || l.endsWith("?") ||
          l.endsWith("\"")), "no_punct")
        .when(size(filter(split(l, " "), t => t =!= "")) < MinLineWords,
          "short")
        .otherwise("kept"))

  /** The cleaning report over any `(doc_id, text)` table whose text is
    * newline-delimited: per-line drop counts by reason, the document
    * verdict (Gopher dup-fraction gate, then the min-kept-lines gate), and
    * the md5 digest of the cleaned (kept-lines) text. Unsorted,
    * stream-safe. */
  def cleanLinesOf(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    def cnt(cls: Column, r: String): Column =
      size(filter(cls, c => c === r)).cast("long")
    docs
      // empty text = ZERO lines (split("", "\n") would yield [""] — one
      // phantom line the oracle's empty line list doesn't have; r10 ADVICE)
      .withColumn("lines",
        when(length($"text") === 0, array().cast("array<string>"))
          .otherwise(split($"text", "\n")))
      .withColumn("cls", lineReasons($"lines"))
      .withColumn("kept_lines",
        filter(zip_with($"lines", $"cls", (l, c) => when(c === "kept", l)),
          x => x.isNotNull))
      .select($"doc_id",
        size($"lines").cast("long").as("n_lines"),
        cnt($"cls", "kept").as("n_kept"),
        cnt($"cls", "dup").as("n_dup"),
        cnt($"cls", "bullet").as("n_bullet"),
        cnt($"cls", "ellipsis").as("n_ellipsis"),
        cnt($"cls", "no_punct").as("n_nopunct"),
        cnt($"cls", "short").as("n_short"),
        md5(array_join($"kept_lines", "\n")).as("clean_digest"))
      .withColumn("verdict",
        when($"n_dup" * 10 > $"n_lines" * MaxDupTenths, "drop_dup_lines")
          .when($"n_kept" < MinKeptLines, "drop_few_lines")
          .otherwise("keep"))
  }

  /** The declared query: synthesize lines, clean, report per document. */
  def cleanLines(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    cleanLinesOf(
      Tables.table(s, dir, "documents")
        .select($"doc_id", synthLinedText($"doc_id", $"text").as("text")))
      .orderBy($"doc_id")
  }

  /** The doc_ids FAILING the document-level line gate
    * ([[Curation.pipelineFull]]'s `2_line_gate` stage: dup-line fraction
    * over [[MaxDupTenths]]/10, or fewer than [[MinKeptLines]] surviving
    * lines) — as a TABLE, not a predicate Column, deliberately: an inline
    * predicate re-evaluates the whole synthesize→classify expression tree
    * in EVERY plan branch that re-derives the gated corpus, and internal
    * Column-lambda duplication multiplies that per row (~40 synthesis
    * evaluations/row — measured 61 s on q_pipeline_full at sf0.1, r10).
    * Here the gate runs through the stepwise-bound [[cleanLinesOf]]
    * (projection per intermediate → one evaluation per row) and the
    * per-doc verdict table is CACHED *below* the fail filter
    * ([[graft.Caches]]) — caching above it would let
    * PushPredicateThroughProject inline the verdict's whole expression
    * chain back into one giant scan predicate (measured: the "one"
    * evaluation re-inflated to ~20 s). Consumers pay one anti/left join
    * against the filtered cache read. Same shape as pipelineFull's
    * `dirty` contamination map. */
  private[pipeline] def lineGateFailIds(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    graft.Caches.cached(
        cleanLinesOf(docs.select($"doc_id",
            synthLinedText($"doc_id", $"text").as("text")))
          .select($"doc_id", $"verdict"))
      .filter($"verdict" =!= "keep")
      .select($"doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_text_clean_lines" -> cleanLines _,
  )

  // ---- DuckDB mirror ------------------------------------------------------

  /** DuckDB: the synthesized decorated line list from token list `w` and
    * doc id `id` — byte-identical to [[synthLinedText]]'s construction
    * (≥ 2 decorated lines ⇔ more than [[LineW]] tokens). */
  private[pipeline] def duckSynthLines(w: String, id: String): String = {
    val dupFold = duckCharFold(s"'dup:' || CAST($id AS VARCHAR)")
    s"""(CASE WHEN $dupFold % 3 = 0 AND len($w) > $LineW
       |THEN list_append(${duckDeco(w)}, (${duckDeco(w)})[1])
       |ELSE ${duckDeco(w)} END)""".stripMargin
  }

  /** DuckDB: decorated (pre-dup-injection) lines from token list `w`. */
  private def duckDeco(w: String): String =
    s"""list_transform(
       |  list_transform(
       |    list_transform(generate_series(1, len($w), $LineW),
       |      st -> array_to_string(list_slice($w, st, st + ${LineW - 1}), ' ')),
       |    l -> struct_pack(l := l, h := ${duckCharFold("l")})),
       |  x -> CASE WHEN x.h % 11 = 0 THEN '- ' ELSE '' END ||
       |    CASE WHEN x.h % 5 <= 2 THEN x.l || '.'
       |         WHEN x.h % 5 = 3 THEN x.l
       |         ELSE x.l || '...' END)""".stripMargin

  /** DuckDB: per-line reasons over a line-list column `lines` — identical
    * rule order to [[lineReasons]]. */
  private[pipeline] def duckReasons(lines: String): String =
    s"""list_transform(generate_series(1, len($lines)), i ->
       |  CASE WHEN list_position($lines, $lines[i]) <> i THEN 'dup'
       |       WHEN $lines[i] LIKE '- %' OR $lines[i] LIKE '* %' THEN 'bullet'
       |       WHEN $lines[i] LIKE '%...' THEN 'ellipsis'
       |       WHEN right($lines[i], 1) NOT IN ('.', '!', '?', '"')
       |         THEN 'no_punct'
       |       WHEN len(list_filter(string_split($lines[i], ' '), t -> t <> ''))
       |         < $MinLineWords THEN 'short'
       |       ELSE 'kept' END)""".stripMargin

  /** DuckDB CTEs ending in `lcm(doc_id, n_lines, n_dup, n_kept)` — the
    * line-gate populations [[Curation]]'s pipeline oracles reuse. */
  private[pipeline] def duckLineGateCte(docsFrom: String): String =
    s"""lcw AS (SELECT doc_id, ${duckTokens("text")} AS w FROM $docsFrom),
       |lcl AS (SELECT doc_id, ${duckSynthLines("w", "doc_id")} AS lines FROM lcw),
       |lcc AS (SELECT doc_id, lines, ${duckReasons("lines")} AS cls FROM lcl),
       |lcm AS (SELECT doc_id, CAST(len(lines) AS BIGINT) AS n_lines,
       |    CAST(len(list_filter(cls, c -> c = 'dup')) AS BIGINT) AS n_dup,
       |    CAST(len(list_filter(cls, c -> c = 'kept')) AS BIGINT) AS n_kept
       |  FROM lcc)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_text_clean_lines" ->
      s"""WITH d AS (SELECT doc_id, ${duckTokens("text")} AS w FROM documents),
         |ln AS (SELECT doc_id, ${duckSynthLines("w", "doc_id")} AS lines FROM d),
         |cl AS (SELECT doc_id, lines, ${duckReasons("lines")} AS cls FROM ln),
         |r AS (SELECT doc_id,
         |    CAST(len(lines) AS BIGINT) AS n_lines,
         |    CAST(len(list_filter(cls, c -> c = 'kept')) AS BIGINT) AS n_kept,
         |    CAST(len(list_filter(cls, c -> c = 'dup')) AS BIGINT) AS n_dup,
         |    CAST(len(list_filter(cls, c -> c = 'bullet')) AS BIGINT) AS n_bullet,
         |    CAST(len(list_filter(cls, c -> c = 'ellipsis')) AS BIGINT) AS n_ellipsis,
         |    CAST(len(list_filter(cls, c -> c = 'no_punct')) AS BIGINT) AS n_nopunct,
         |    CAST(len(list_filter(cls, c -> c = 'short')) AS BIGINT) AS n_short,
         |    md5(coalesce(array_to_string(
         |      list_transform(
         |        list_filter(generate_series(1, len(lines)), i -> cls[i] = 'kept'),
         |        i -> lines[i]), chr(10)), '')) AS clean_digest
         |  FROM cl)
         |SELECT doc_id, n_lines, n_kept, n_dup, n_bullet, n_ellipsis,
         |  n_nopunct, n_short, clean_digest,
         |  CASE WHEN n_dup * 10 > n_lines * $MaxDupTenths THEN 'drop_dup_lines'
         |       WHEN n_kept < $MinKeptLines THEN 'drop_few_lines'
         |       ELSE 'keep' END AS verdict
         |FROM r ORDER BY doc_id""".stripMargin,
  )
}
