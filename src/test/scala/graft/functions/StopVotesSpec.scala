package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** StopVotes ≡ the built-in higher-order spelling (filter + isInCollection
  * per list), on edge cases and the real corpus. */
class StopVotesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val lists = Seq(
    Seq("the", "a", "of", "and", "to"),
    Seq("der", "und", "die", "das", "ein"),
    Seq("le", "et", "les", "la", "un"),
    Seq("el", "y", "los", "en", "un"))

  private def hof(text: org.apache.spark.sql.Column) = {
    val w = filter(split(text, " "), t => t =!= "")
    array(lists.map(l => size(filter(w, t => t.isInCollection(l))).cast("long")): _*)
  }

  test("edge cases: empties, repeated spaces, shared words across lists") {
    val rows = Seq(
      "", " ", "the the the", "  the   und  ",
      "un", // in BOTH fr and es lists
      "a to of and the der und die das ein le et les la un el y los en",
      "notaword the notaword", "THE the The").toDF("text")
    val out = rows.select(
      StopVotes($"text", lists).as("native"), hof($"text").as("ref"))
    out.collect().foreach { r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1), r.toString)
    }
  }

  test("matches the HOF spelling on the real corpus") {
    val docs = graft.sources.Tables
      .table(spark, "/root/testdata/sf0.001", "documents")
    val out = docs.select(
      StopVotes(lower($"text"), lists).as("native"),
      hof(lower($"text")).as("ref"))
    out.collect().foreach { r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1))
    }
  }

  test("null text yields null votes") {
    val out = Seq(Option.empty[String], Some("the")).toDF("text")
      .select(StopVotes($"text", lists).as("v")).collect()
    assert(out(0).isNullAt(0))
    assert(out(1).getSeq[Long](0) === Seq(1L, 0L, 0L, 0L))
  }
}
