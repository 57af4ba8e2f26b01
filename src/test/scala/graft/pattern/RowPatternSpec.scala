package graft.pattern

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** The graph compiler ([[RowPattern]]) + graph-mode NFA against a
  * brute-force SQL:2016 row-pattern matcher implemented straight from the
  * spec: anchored backtracking enumeration in lexicographic preference order
  * (leftmost alternation branch, greedy = more repetitions first), sequential
  * earliest-start scan with SKIP PAST LAST ROW. Covers PERMUTE, quantified
  * groups `(A B)+`, sequence alternation `(A B | C)`, nesting, and bounded
  * group quantifiers — randomized patterns × randomized row label sets.
  */
class RowPatternSpec extends AnyFunSuite {
  import RowPattern._

  // ---------------------------------------------------------------- harness

  /** rows(i) = set of variables whose DEFINE holds on row i. */
  private type Rows = IndexedSeq[Set[String]]

  /** Brute force: all matches of `a` anchored at `pos`, lazily, in SQL
    * preference order; each result = (end-exclusive, (var, row) list).
    * `untilVars`: loop variables carrying a stop condition (label "U") —
    * a U-row is never taken into that variable's repetition run (Flink
    * `until`: the stop event is not accepted into the loop; graph mode is
    * all-strict, so no ignore path exists and the run simply truncates). */
  private def enum(a: Ast, rows: Rows, pos: Int,
      untilVars: Set[String] = Set.empty): LazyList[(Int, List[(String, Int)])] =
    a match {
      case AVar(nm, mn, mx, greedy) =>
        val stopped = untilVars(nm) && mx > 1
        var c = 0
        while (pos + c < rows.length && c < mx && rows(pos + c)(nm) &&
            !(stopped && rows(pos + c)("U"))) c += 1
        val counts = if (greedy) c to mn by -1 else mn to c
        LazyList.from(counts).map(k =>
          (pos + k, (0 until k).map(j => nm -> (pos + j)).toList))
      case ASeq(items) =>
        def go(its: List[Ast], p: Int): LazyList[(Int, List[(String, Int)])] =
          its match {
            case Nil => LazyList((p, Nil))
            case h :: t => enum(h, rows, p, untilVars).flatMap { case (p2, as1) =>
              go(t, p2).map { case (p3, as2) => (p3, as1 ::: as2) }
            }
          }
        go(items, pos)
      case AAlt(bs) => LazyList.from(bs).flatMap(enum(_, rows, pos, untilVars))
      case APermute(items) =>
        LazyList.from(items.permutations.toList)
          .flatMap(p => enum(ASeq(p), rows, pos, untilVars))
      case AExcl(b) => enum(b, rows, pos, untilVars)
      case AQuant(b, mn, mx, greedy) =>
        def go(done: Int, p: Int): LazyList[(Int, List[(String, Int)])] = {
          val stop = if (done >= mn) LazyList((p, List.empty[(String, Int)])) else LazyList.empty
          val more =
            if (done >= mx) LazyList.empty
            else enum(b, rows, p, untilVars).flatMap { case (p2, as1) =>
              if (p2 > p) go(done + 1, p2).map { case (p3, as2) => (p3, as1 ::: as2) }
              // regex empty-iteration rule: a zero-width body match ends the
              // loop AT ITS OWN preference position (it still counts as an
              // iteration) — filtering it out would mis-rank alternations
              // whose preferred branch matches empty, e.g. (D* | B?)?
              else if (done + 1 >= mn) LazyList((p, as1))
              else LazyList.empty
            }
          if (greedy) more #::: stop else stop #::: more
        }
        go(0, pos)
    }

  /** Sequential scan with any after-match skip strategy (the SQL semantics,
    * literally): emit the preferred match anchored at the earliest viable
    * start, resume at the strategy's skip point. SQL:2016 degenerate skips
    * (TO FIRST/LAST of an unbound variable; a skip landing on the match's
    * own first row) are runtime errors. */
  private def bruteMatchesSkip(
      a: Ast, rows: Rows, skip: AfterMatchSkip): List[(Int, List[(String, Int)])] = {
    def target(s: Int, as: List[(String, Int)], v: String, first: Boolean): Int = {
      val which = if (first) "FIRST" else "LAST"
      val idxs = as.collect { case (`v`, r) => r }
      if (idxs.isEmpty)
        throw new IllegalStateException(s"SKIP TO $which $v: variable unbound")
      val r = if (first) idxs.min else idxs.max
      if (r == s)
        throw new IllegalStateException(s"SKIP TO $which $v: no progress")
      r
    }
    val out = List.newBuilder[(Int, List[(String, Int)])]
    var s = 0
    while (s < rows.length) {
      enum(a, rows, s).headOption match {
        case Some((end, as)) if end > s =>
          out += ((s, as))
          s = skip match {
            case AfterMatchSkip.SkipPastLastEvent => end
            case AfterMatchSkip.SkipToNext => s + 1
            case AfterMatchSkip.SkipToFirst(v) => target(s, as, v, first = true)
            case AfterMatchSkip.SkipToLast(v) => target(s, as, v, first = false)
            case AfterMatchSkip.NoSkip => s + 1
          }
        case _ => s += 1
      }
    }
    out.result()
  }

  private def bruteMatches(a: Ast, rows: Rows): List[(Int, List[(String, Int)])] =
    bruteMatchesSkip(a, rows, AfterMatchSkip.SkipPastLastEvent)

  /** The engine: compile to a graph pattern over row indices and run. */
  private def nfaMatchesSkip(
      a: Ast, rows: Rows, skip: AfterMatchSkip): List[(Int, List[(String, Int)])] = {
    val Compiled(leaves, graph) = compile(a)
    val stages = leaves.map { lf =>
      Stage[Int](lf.name, (r, _) => rows(r)(lf.name), lf.min, lf.max,
        Contiguity.Strict, Contiguity.Strict, lf.greedy)
    }
    val pattern = Pattern[Int](stages, None, skip, graph = Some(graph))
    val (matches, _) = NFA.run(rows.indices.iterator, (r: Int) => r.toLong, pattern)
    matches.toList.map(m => (m.startTs.toInt, m.events.toList.map { case (v, r) => (v, r) }))
  }

  private def nfaMatches(a: Ast, rows: Rows): List[(Int, List[(String, Int)])] =
    nfaMatchesSkip(a, rows, AfterMatchSkip.SkipPastLastEvent)

  private def check(a: Ast, rows: Rows): Unit = {
    val expected = bruteMatches(a, rows)
    val actual = nfaMatches(a, rows)
    assert(actual == expected,
      s"\npattern: $a\nrows: ${rows.zipWithIndex.map { case (s, i) => s"$i:${s.mkString("")}" }.mkString(" ")}" +
        s"\nexpected: $expected\nactual:   $actual")
  }

  private def forSamples[A](gen: Gen[A], n: Int)(f: A => Unit): Unit = {
    var seed = Seed(20260812L)
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }

  // --------------------------------------------------------- directed cases

  private def rowsOf(labels: String*): Rows =
    labels.toIndexedSeq.map(_.split("").filter(_.nonEmpty).toSet)

  test("PERMUTE(A, B, C) matches every ordering, lexicographic preference") {
    val ast = parse("PERMUTE(A, B, C)")
    // rows usable as exactly one variable each: any ordering matches
    check(ast, rowsOf("B", "A", "C"))
    check(ast, rowsOf("C", "B", "A"))
    check(ast, rowsOf("A", "B", "C", "B", "C", "A"))
    // ambiguous rows: every row could be any variable — lexicographically
    // first ordering (A B C) must win
    val all = rowsOf("ABC", "ABC", "ABC")
    assert(nfaMatches(ast, all).head._2.map(_._1) == List("A", "B", "C"))
    check(ast, all)
  }

  test("(A B)+ greedy group loop binds the maximal even run") {
    val ast = parse("(A B)+")
    check(ast, rowsOf("A", "B", "A", "B", "A"))
    check(ast, rowsOf("A", "B", "B", "A", "B"))
    val m = nfaMatches(ast, rowsOf("A", "B", "A", "B"))
    assert(m == List((0, List("A" -> 0, "B" -> 1, "A" -> 2, "B" -> 3))))
  }

  test("sequence alternation (A B | C) prefers the leftmost branch") {
    val ast = parse("(A B | C)")
    // row 0 satisfies both C and A, row 1 satisfies B: A B preferred
    check(ast, rowsOf("AC", "B"))
    assert(nfaMatches(ast, rowsOf("AC", "B")).head._2.map(_._1) == List("A", "B"))
    // row 1 fails B: C (shorter, less preferred branch) must match instead
    check(ast, rowsOf("AC", "X"))
    assert(nfaMatches(ast, rowsOf("AC", "X")).head._2.map(_._1) == List("C"))
  }

  test("leftmost branch wins even when it completes LATER (B B B | A A)") {
    val ast = parse("(B B B | A A)")
    // rows satisfy both variables everywhere: B B B (leftmost) must win even
    // though A A completes a row earlier
    val rows = rowsOf("AB", "AB", "AB")
    check(ast, rows)
    assert(nfaMatches(ast, rows).head._2.map(_._1) == List("B", "B", "B"))
  }

  test("bounded group quantifier (A B){1,2} and {2}") {
    check(parse("(A B){1,2}"), rowsOf("A", "B", "A", "B", "A", "B"))
    check(parse("(A B){2}"), rowsOf("A", "B", "A", "B", "A", "B"))
    check(parse("(A B){2}"), rowsOf("A", "B", "A", "X"))
  }

  test("nested groups ((A B)+ C)+ and optional group (A B)? C") {
    check(parse("((A B)+ C)+"), rowsOf("A", "B", "C", "A", "B", "A", "B", "C"))
    check(parse("(A B)? C"), rowsOf("A", "B", "C", "C"))
    check(parse("(A B)? C"), rowsOf("C", "A", "B", "C"))
  }

  private def checkSkip(a: Ast, rows: Rows, skip: AfterMatchSkip): Unit = {
    val expected = scala.util.Try(bruteMatchesSkip(a, rows, skip))
    val actual = scala.util.Try(nfaMatchesSkip(a, rows, skip))
    (expected, actual) match {
      case (scala.util.Success(e), scala.util.Success(g)) =>
        assert(g == e,
          s"\npattern: $a skip: $skip" +
            s"\nrows: ${rows.zipWithIndex.map { case (s, i) => s"$i:${s.mkString("")}" }.mkString(" ")}" +
            s"\nexpected: $e\nactual:   $g")
      case (scala.util.Failure(_: IllegalStateException),
            scala.util.Failure(_: IllegalStateException)) => () // both degenerate
      case (e, g) => fail(s"\npattern: $a skip: $skip rows: $rows\nbrute: $e\nnfa:   $g")
    }
  }

  test("graph pattern + SKIP TO NEXT ROW emits the preferred match at every start") {
    val ast = parse("(A B | C)")
    // overlapping: matches anchored at 0 (A B), 1 (C? no...), directed rows
    checkSkip(ast, rowsOf("AC", "ABC", "B"), AfterMatchSkip.SkipToNext)
    checkSkip(ast, rowsOf("A", "AB", "B"), AfterMatchSkip.SkipToNext)
    checkSkip(parse("(A B)+"), rowsOf("A", "AB", "AB", "B"), AfterMatchSkip.SkipToNext)
    checkSkip(parse("PERMUTE(A, B)"), rowsOf("AB", "AB", "AB"), AfterMatchSkip.SkipToNext)
  }

  test("graph pattern + SKIP TO LAST var resumes AT that row (overlap legal)") {
    // A B+ C with TO LAST B: next search starts at the last B row
    val ast = parse("A B{1,4} C")
    checkSkip(ast, rowsOf("A", "AB", "B", "C", "B", "C"), AfterMatchSkip.SkipToLast("B"))
    checkSkip(ast, rowsOf("A", "B", "AB", "C", "B", "C"), AfterMatchSkip.SkipToLast("B"))
    checkSkip(parse("(A | B) C"), rowsOf("AB", "C", "AC", "C"), AfterMatchSkip.SkipToLast("C"))
  }

  test("graph pattern + SKIP TO FIRST var") {
    val ast = parse("A (B | C) D?")
    checkSkip(ast, rowsOf("A", "BA", "B", "D"), AfterMatchSkip.SkipToFirst("B"))
    checkSkip(parse("A B C"), rowsOf("A", "AB", "BC", "C"), AfterMatchSkip.SkipToFirst("B"))
  }

  test("degenerate skips are runtime errors on both sides") {
    // TO FIRST A: A binds the match's first row → infinite loop → error
    checkSkip(parse("A B"), rowsOf("A", "B"), AfterMatchSkip.SkipToFirst("A"))
    // TO LAST D: D optional and unmatched → unbound-variable error
    checkSkip(parse("A B D?"), rowsOf("A", "B", "X"), AfterMatchSkip.SkipToLast("D"))
    // sanity: the brute side really does throw for these
    intercept[IllegalStateException](
      bruteMatchesSkip(parse("A B"), rowsOf("A", "B"), AfterMatchSkip.SkipToFirst("A")))
    intercept[IllegalStateException](
      bruteMatchesSkip(parse("A B D?"), rowsOf("A", "B", "X"), AfterMatchSkip.SkipToLast("D")))
  }

  test("empty-matchable patterns are rejected") {
    intercept[IllegalArgumentException](compile(parse("A*")))
    intercept[IllegalArgumentException](compile(parse("(A B)*")))
    intercept[IllegalArgumentException](compile(parse("A? B?")))
    // but a mandatory variable anywhere makes them legal
    compile(parse("A* B"))
    compile(parse("(A B)* C"))
  }

  test("parser rejects malformed patterns") {
    intercept[IllegalArgumentException](parse("A (B"))
    intercept[IllegalArgumentException](parse("A |"))
    intercept[IllegalArgumentException](parse("PERMUTE(A)"))
    intercept[IllegalArgumentException](parse("A {-"))
    intercept[IllegalArgumentException](parse("A{3,2}"))
  }

  // ------------------------------------------------------------- properties

  private val varPool = Vector("A", "B", "C", "D")

  private def genLeaf: Gen[Ast] = for {
    v <- Gen.oneOf(varPool)
    q <- Gen.frequency(
      6 -> Gen.const((1, 1)),
      1 -> Gen.const((0, 1)),
      1 -> Gen.const((1, Int.MaxValue)),
      1 -> Gen.const((0, Int.MaxValue)),
      1 -> Gen.choose(1, 3).map(n => (n, n)))
  } yield AVar(v, q._1, q._2, greedy = true)

  private def genAst(depth: Int): Gen[Ast] =
    if (depth == 0) genLeaf
    else Gen.frequency(
      3 -> genLeaf,
      3 -> Gen.choose(2, 3).flatMap(n =>
        Gen.listOfN(n, genAst(depth - 1)).map(ASeq(_))),
      2 -> Gen.choose(2, 3).flatMap(n =>
        Gen.listOfN(n, genAst(depth - 1)).map(AAlt(_))),
      1 -> Gen.choose(2, 3).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf(varPool).map(AVar(_))).map(APermute(_))),
      1 -> genAst(depth - 1).flatMap(b => Gen.oneOf(
        AQuant(b, 1, Int.MaxValue, greedy = true),
        AQuant(b, 0, 1, greedy = true),
        AQuant(b, 1, 2, greedy = true))))

  private val genRows: Gen[Rows] = for {
    n <- Gen.choose(0, 14)
    rows <- Gen.listOfN(n, Gen.listOf(Gen.oneOf(varPool)).map(_.toSet))
  } yield rows.toIndexedSeq

  test("property: random graph patterns match the brute-force SQL matcher") {
    var tested = 0
    forSamples(Gen.zip(genAst(2), genRows), 600) { case (ast, rows) =>
      val ok = try { compile(ast); true } catch {
        case _: IllegalArgumentException => false // empty-matchable: skipped
      }
      if (ok) { check(ast, rows); tested += 1 }
    }
    assert(tested > 300, s"only $tested viable random patterns")
  }

  test("property: random PERMUTE patterns with prefixes/suffixes") {
    val gen = for {
      k <- Gen.choose(2, 4)
      vs <- Gen.pick(k, varPool).map(_.toList)
      pre <- Gen.option(genLeaf)
      post <- Gen.option(genLeaf)
      rows <- genRows
    } yield (ASeq(pre.toList ::: List(APermute(vs.map(AVar(_)))) ::: post.toList), rows)
    var tested = 0
    forSamples(gen, 300) { case (ast, rows) =>
      val ok = try { compile(ast); true } catch {
        case _: IllegalArgumentException => false
      }
      if (ok) { check(ast, rows); tested += 1 }
    }
    assert(tested > 200, s"only $tested viable random patterns")
  }

  test("property: PERMUTE of compound terms (sequences / quantified leaves)") {
    val genTerm: Gen[Ast] = Gen.frequency(
      2 -> genLeaf,
      1 -> Gen.listOfN(2, genLeaf).map(ASeq(_)))
    val gen = for {
      k <- Gen.choose(2, 3)
      terms <- Gen.listOfN(k, genTerm)
      rows <- genRows
    } yield (APermute(terms), rows)
    var tested = 0
    forSamples(gen, 300) { case (ast, rows) =>
      val ok = try { compile(ast); true } catch {
        case _: IllegalArgumentException => false
      }
      if (ok) { check(ast, rows); tested += 1 }
    }
    assert(tested > 200, s"only $tested viable random patterns")
  }

  test("property: deep nesting (depth 3) matches the brute-force matcher") {
    var tested = 0
    forSamples(Gen.zip(genAst(3), genRows), 300) { case (ast, rows) =>
      val ok = try { compile(ast); true } catch {
        case _: IllegalArgumentException => false
      }
      if (ok) { check(ast, rows); tested += 1 }
    }
    assert(tested > 150, s"only $tested viable random patterns")
  }

  test("property: random graph patterns × random skip modes match the brute matcher") {
    val genSkip: Gen[AfterMatchSkip] = Gen.frequency(
      2 -> Gen.const(AfterMatchSkip.SkipPastLastEvent),
      2 -> Gen.const(AfterMatchSkip.SkipToNext),
      2 -> Gen.oneOf(varPool).map(AfterMatchSkip.SkipToFirst(_)),
      2 -> Gen.oneOf(varPool).map(AfterMatchSkip.SkipToLast(_)))
    var tested = 0
    forSamples(Gen.zip(genAst(2), genRows, genSkip), 600) { case (ast, rows, skip) =>
      val ok = try { compile(ast); true } catch {
        case _: IllegalArgumentException => false
      }
      if (ok) { checkSkip(ast, rows, skip); tested += 1 }
    }
    assert(tested > 300, s"only $tested viable random patterns")
  }

  test("property: until (loop stop) in graph mode matches the brute matcher") {
    // loop variables in `untilVars` stop at label "U": the engine sets
    // Stage.until on those leaves; the brute matcher truncates their
    // repetition runs at the first U-row. Directed base cases first.
    def nfaUntil(a: Ast, rows: Rows, untilVars: Set[String]) = {
      val Compiled(leaves, graph) = compile(a)
      val stages = leaves.map { lf =>
        Stage[Int](lf.name, (r, _) => rows(r)(lf.name), lf.min, lf.max,
          Contiguity.Strict, Contiguity.Strict, lf.greedy,
          until = if (untilVars(lf.name) && lf.max > 1)
            Some((r: Int, _: PatternContext[Int]) => rows(r)("U")) else None)
      }
      val pattern = Pattern[Int](stages, None, AfterMatchSkip.SkipPastLastEvent,
        graph = Some(graph))
      val (ms, _) = NFA.run(rows.indices.iterator, (r: Int) => r.toLong, pattern)
      ms.toList.map(m => (m.startTs.toInt, m.events.toList))
    }
    def bruteUntil(a: Ast, rows: Rows, untilVars: Set[String]) = {
      val out = List.newBuilder[(Int, List[(String, Int)])]
      var s = 0
      while (s < rows.length) {
        enum(a, rows, s, untilVars).headOption match {
          case Some((end, as)) if end > s => out += ((s, as)); s = end
          case _ => s += 1
        }
      }
      out.result()
    }
    def checkUntil(a: Ast, rows: Rows, untilVars: Set[String]): Unit = {
      val expected = bruteUntil(a, rows, untilVars)
      val actual = nfaUntil(a, rows, untilVars)
      assert(actual == expected,
        s"\npattern: $a until: $untilVars" +
          s"\nrows: ${rows.zipWithIndex.map { case (r, i) => s"$i:${r.mkString("")}" }.mkString(" ")}" +
          s"\nexpected: $expected\nactual:   $actual")
    }
    // directed: B+ with until stops at the BU row even though B matches it
    val abu = ASeq(List(AVar("A"), AVar("B", 1, Int.MaxValue), AVar("C")))
    checkUntil(abu, rowsOf("A", "B", "BU", "C"), Set("B"))
    assert(nfaUntil(abu, rowsOf("A", "B", "BU", "C"), Set("B")).isEmpty,
      "strict graph mode: the frozen loop cannot bridge the stop row")
    checkUntil(abu, rowsOf("A", "B", "B", "CU"), Set("B")) // stop row IS the exit's
    checkUntil(abu, rowsOf("A", "BU", "B", "C"), Set("B")) // first take blocked
    // group loop (A B)+ with until on one member
    checkUntil(AQuant(ASeq(List(AVar("A"), AVar("B"))), 1, Int.MaxValue, greedy = true),
      rowsOf("A", "B", "AU", "B"), Set("A"))
    // randomized sweep
    val genUntilVars = Gen.someOf(varPool).map(_.toSet)
    val genRowsU: Gen[Rows] = for {
      n <- Gen.choose(0, 14)
      rows <- Gen.listOfN(n,
        Gen.listOf(Gen.frequency(5 -> Gen.oneOf(varPool), 2 -> Gen.const("U")))
          .map(_.toSet))
    } yield rows.toIndexedSeq
    var tested = 0
    forSamples(Gen.zip(genAst(2), genRowsU, genUntilVars), 600) {
      case (ast, rows, uv) =>
        val ok = try { compile(ast); true } catch {
          case _: IllegalArgumentException => false
        }
        if (ok) { checkUntil(ast, rows, uv); tested += 1 }
    }
    assert(tested > 300, s"only $tested viable random patterns")
  }

  test("property: within horizon truncates graph matches like the spec says") {
    // ts = row index; a match spanning rows s..e-1 is legal iff e-1-s < W
    // (an event at ts >= start + within cannot extend a partial match)
    def nfaWithin(a: Ast, rows: Rows, w: Long): List[(Int, List[(String, Int)])] = {
      val Compiled(leaves, graph) = compile(a)
      val stages = leaves.map { lf =>
        Stage[Int](lf.name, (r, _) => rows(r)(lf.name), lf.min, lf.max,
          Contiguity.Strict, Contiguity.Strict, lf.greedy)
      }
      val pattern = Pattern[Int](stages, Some(w), AfterMatchSkip.SkipPastLastEvent,
        graph = Some(graph))
      val (ms, _) = NFA.run(rows.indices.iterator, (r: Int) => r.toLong, pattern)
      ms.toList.map(m => (m.startTs.toInt, m.events.toList))
    }
    def bruteWithin(a: Ast, rows: Rows, w: Long): List[(Int, List[(String, Int)])] = {
      val out = List.newBuilder[(Int, List[(String, Int)])]
      var s = 0
      while (s < rows.length) {
        enum(a, rows, s).filter(c => c._1 - s <= w).headOption match {
          case Some((end, as)) if end > s => out += ((s, as)); s = end
          case _ => s += 1
        }
      }
      out.result()
    }
    var tested = 0
    forSamples(Gen.zip(genAst(2), genRows, Gen.choose(1L, 6L)), 400) {
      case (ast, rows, w) =>
        val ok = try { compile(ast); true } catch {
          case _: IllegalArgumentException => false
        }
        if (ok) {
          val got = nfaWithin(ast, rows, w)
          val want = bruteWithin(ast, rows, w)
          assert(got == want,
            s"\npattern: $ast within=$w\nrows: ${rows.mkString(" ")}\nexpected: $want\nactual:   $got")
          tested += 1
        }
    }
    assert(tested > 200, s"only $tested viable random patterns")
  }

  test("property: parse(render) round-trips through the compiler") {
    // spot the parser against hand-rendered strings of random ASTs
    def render(a: Ast): String = a match {
      case AVar(nm, 1, 1, _) => nm
      case AVar(nm, 0, 1, _) => s"$nm?"
      case AVar(nm, 1, Int.MaxValue, g) => s"$nm+${if (g) "" else "?"}"
      case AVar(nm, 0, Int.MaxValue, g) => s"$nm*${if (g) "" else "?"}"
      case AVar(nm, mn, mx, _) if mn == mx => s"$nm{$mn}"
      case AVar(nm, mn, mx, _) if mx == Int.MaxValue => s"$nm{$mn,}"
      case AVar(nm, mn, mx, _) => s"$nm{$mn,$mx}"
      case ASeq(items) => items.map(render).mkString(" ")
      case AAlt(bs) => "(" + bs.map(render).mkString(" | ") + ")"
      case AQuant(b, 0, 1, _) => s"(${render(b)})?"
      case AQuant(b, 1, Int.MaxValue, _) => s"(${render(b)})+"
      case AQuant(b, 0, Int.MaxValue, _) => s"(${render(b)})*"
      case AQuant(b, mn, mx, _) if mn == mx => s"(${render(b)}){$mn}"
      case AQuant(b, mn, mx, _) if mx == Int.MaxValue => s"(${render(b)}){$mn,}"
      case AQuant(b, mn, mx, _) => s"(${render(b)}){$mn,$mx}"
      case APermute(items) => "PERMUTE(" + items.map(render).mkString(", ") + ")"
      case AExcl(b) => s"{- ${render(b)} -}"
    }
    forSamples(Gen.zip(genAst(2), genRows), 150) { case (ast, rows) =>
      val reparsed = parse(render(ast))
      val ok = try { compile(reparsed); true } catch {
        case _: IllegalArgumentException => false
      }
      // the reparsed AST must behave identically (not necessarily be
      // structurally identical — `(A)` parses to A)
      if (ok) assert(nfaMatches(reparsed, rows) == bruteMatches(ast, rows),
        s"render/parse divergence for ${render(ast)}")
    }
  }
}
