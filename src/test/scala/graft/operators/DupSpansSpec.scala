package graft.operators

import graft.SparkSpec

/** DupSpans.census: hand-computed span extraction (embedded shared
  * passage, touching-window merge vs gap split, exact-copy 1e6
  * fraction), the distinct-DOC df semantics (within-doc repetition
  * alone is not corpus duplication), the short-doc guard, and the
  * d18 entry's no-cartesian plan + full-corpus row count.
  */
class DupSpansSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, Seq[String])]) =
    DupSpans.census(rows.toDF("doc_id", "tk"))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap

  private def toks(prefix: String, n: Int): Seq[String] =
    (1 to n).map(i => s"$prefix$i")

  test("census: an embedded shared passage becomes one maximal span in each doc") {
    val shared = toks("a", 30).slice(10, 20) // a11..a20, 10 tokens
    val out = run(Seq(
      (1L, toks("a", 30)), // passage at positions 11..20
      (2L, toks("b", 5) ++ shared ++ toks("c", 10)), // at positions 6..15
      (3L, toks("z", 5)))) // < Width tokens: no windows at all
    // doc 1: shared windows start at 11,12,13 -> island [11,21) = 10 tokens
    assert(out(1L) === ((30L, 1L, 10L, 10L * 1000000L / 30L)))
    // doc 2: shared windows start at 6,7,8 -> island [6,16) = 10 tokens
    assert(out(2L) === ((25L, 1L, 10L, 400000L)))
    assert(out(3L) === ((5L, 0L, 0L, 0L)))
  }

  test("census: touching window coverage merges; a one-token gap splits") {
    val (x, y) = (toks("x", 8), toks("y", 8))
    val out = run(Seq(
      // doc 1: x-block then y-block adjacent -> dup windows at 1 and 9,
      // intervals [1,9) [9,17) touch -> ONE 16-token span. The windows
      // straddling the block boundary exist only here, so df=1.
      (1L, x ++ y ++ toks("u", 4)),
      // doc 2: same blocks separated by one alien token -> dup windows
      // at 1 and 10, [1,9) [10,18) gap -> TWO spans, still 16 tokens.
      (2L, x ++ Seq("zz") ++ y ++ toks("v", 4))))
    assert(out(1L) === ((20L, 1L, 16L, 16L * 1000000L / 20L)))
    assert(out(2L) === ((21L, 2L, 16L, 16L * 1000000L / 21L)))
  }

  test("census: an exact-copy pair reports dup_frac_micro of exactly 1e6") {
    val t = toks("c", 12)
    val out = run(Seq((1L, t), (2L, t)))
    // windows 1..5 all shared -> island [1,13) covers all 12 tokens
    assert(out(1L) === ((12L, 1L, 12L, 1000000L)))
    assert(out(2L) === ((12L, 1L, 12L, 1000000L)))
  }

  test("census: within-doc repetition alone is not corpus duplication") {
    val block = toks("r", 8)
    // the repeated block hashes identically at positions 1 and 9, but
    // the distinct-DOC frequency of that window is 1 -> no spans
    val out = run(Seq(
      (1L, block ++ block),
      (2L, toks("q", 16))))
    assert(out(1L) === ((16L, 0L, 0L, 0L)))
    assert(out(2L) === ((16L, 0L, 0L, 0L)))
  }

  private def runScrub(rows: Seq[(Long, Seq[String])]) =
    DupSpans.scrub(rows.toDF("doc_id", "tk"))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getSeq[String](2))))
      .toMap

  test("scrub: cuts exactly the merged spans, keeps unique prose in order") {
    val shared = toks("a", 30).slice(10, 20) // a11..a20
    val out = runScrub(Seq(
      (1L, toks("a", 30)), // span [11,21) -> keep a1..a10 ++ a21..a30
      (2L, toks("b", 5) ++ shared ++ toks("c", 10)), // span [6,16)
      (3L, toks("z", 5)))) // no windows: untouched
    assert(out(1L) === ((30L, toks("a", 30).take(10) ++ toks("a", 30).drop(20))))
    assert(out(2L) === ((25L, toks("b", 5) ++ toks("c", 10))))
    assert(out(3L) === ((5L, toks("z", 5))))
  }

  test("scrub: an exact-copy pair scrubs to empty; census and scrub agree") {
    val t = toks("c", 12)
    val out = runScrub(Seq((1L, t), (2L, t)))
    assert(out(1L) === ((12L, Seq.empty[String])))
    assert(out(2L) === ((12L, Seq.empty[String])))
  }

  test("scrub: kept count complements census dup_tokens on every doc") {
    val shared = toks("s", 9)
    val rows = Seq(
      (1L, toks("p", 7) ++ shared ++ toks("q", 3)),
      (2L, shared ++ toks("r", 11)),
      (3L, toks("w", 10)))
    val census = run(rows)
    val scrub = runScrub(rows)
    def isSubseq(sub: Seq[String], of: Seq[String]): Boolean = {
      var rest = of
      sub.forall { t =>
        val i = rest.indexOf(t)
        if (i >= 0) { rest = rest.drop(i + 1); true } else false
      }
    }
    rows.foreach { case (id, tk) =>
      val (nTok, _, dupTokens, _) = census(id)
      assert(scrub(id)._2.length.toLong === nTok - dupTokens, s"doc $id")
      assert(isSubseq(scrub(id)._2, tk), s"doc $id keeps an ordered subsequence")
    }
  }

  test("d18 entry: full-corpus row count, zero-signal floor, no cartesian") {
    val df = PipelineQueries.d18DupSpans(spark, sf0)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoop"))
    val rows = df.collect()
    val nDocs = graft.GraftSession.table(spark, sf0, "documents").count()
    assert(rows.length.toLong === nDocs)
    // the decade-head plant guarantees every decade shares windows, so
    // dup coverage is non-vacuous corpus-wide
    assert(rows.forall(_.getLong(3) >= 0L))
    assert(rows.count(_.getLong(2) > 0L) > rows.length / 2)
  }
}
