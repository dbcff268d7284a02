package graft.operators

import graft.{GraftSession, SparkSpec}
import org.apache.spark.sql.functions._

/** Planted-behavior checks for the round-3 pipeline operators — the
  * oracles pin engine parity; these pin semantics on known inputs.
  */
class PipelineQueriesSpec extends SparkSpec {
  import spark.implicits._

  test("quantize census drops degenerate vectors (empty, all-zero) on both engines' terms") {
    val dir = tmpDir("s4_degenerate")
    Seq(
      (1L, Array(0.5f, -1.0f, 0.25f), 0),
      (2L, Array.empty[Float], 0), // posexplode would drop; SQL would emit
      (3L, Array(0.0f, 0.0f, 0.0f), 0) // scale 0 -> 0/0 NaN
    ).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(dir + "/embeddings.parquet")
    val out = LlmQueries.s4Quantize(spark, dir).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L),
      "only the quantizable vector may survive")
    val r = out.head
    assert(r.getAs[Long]("n_dims") == 3L)
    assert(r.getAs[Double]("scale6") > 0)
    assert(!r.getAs[Double]("mse6").isNaN)
  }

  test("t26 block dedup: hand-computed census, scrub hash, and short-doc drop") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val dir = tmpDir("t26_fixture")
    Seq(
      // 9 tokens: blocks [abc][def][ghi] + planted [abc][def] -> 5 blocks, 3 kept
      (1L, "a b c d e f g h i", "en", "A", 17L),
      // self-repeating doc: [x y z] x4 (2 organic + 2 planted) -> 1 kept
      (2L, "x y z x y z", "en", "A", 11L),
      // 2 tokens: zero whole blocks -> no output row
      (3L, "a b", "en", "A", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(dir + "/documents.parquet")
    val out = PipelineQueries.t26BlockDedup(spark, dir)
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out === Seq(
      (1L, 5L, 3L, md5hex("a b c d e f g h i")),
      (2L, 4L, 1L, md5hex("x y z"))))
  }

  test("t26 block dedup: corpus — every doc planted, kept <= blocks, order preserved") {
    val out = PipelineQueries.t26BlockDedup(spark, sf0)
      .as[(Long, Long, Long, String)].collect()
    assert(out.nonEmpty)
    // the aligned plant guarantees ≥ 2 duplicate blocks for docs
    // with ≥ 6 tokens and ≥ 1 for 3-5-token docs (the appended slice
    // IS the single block) — kept < blocks is the universal
    // invariant; the stronger −2 form is checked against actual
    // token counts so a future corpus with short docs can't break it
    val nTok = graft.GraftSession.table(spark, sf0, "documents")
      .select($"doc_id", size(graft.functions.TextFunctions.wsTokens($"text")).as("n"))
      .as[(Long, Int)].collect().toMap
    out.foreach { case (id, blocks, kept, h) =>
      assert(kept < blocks, s"doc $id: plant must always drop")
      if (nTok(id) >= 6) assert(kept <= blocks - 2, s"doc $id")
      assert(kept >= 1 && h.length === 32, s"doc $id")
    }
  }

  test("mixture epochs_micro: guarded BIGINT form is exact where the naive multiply wraps") {
    val cap = PipelineQueries.MixtureEpochCapMicro
    val cases = Seq[(Long, Long)](
      (0L, 7L),                                  // nothing to place
      (1L, 3L),                                  // 0.333333 epochs
      (7L, 2L),                                  // 3.5 epochs, under cap
      (8L, 2L),                                  // exactly at cap
      (5L, 0L),                                  // n_tok = 0: pins to cap
      (9300000000000L, 2400000000000L),          // naive tgt·10⁶ wraps 2⁶³
      (9299999999999L, 2400000000001L),          // wraps, nonzero remainder
      (9223372036854L, 9223372036854L / 3)       // ratio ≈ 3, at the wrap edge
    )
    val expected = cases.map { case (t, n) =>
      if (n == 0L) cap
      else math.min(cap, (BigInt(t) * 1000000 / n).toLong)
    }
    val got = cases.toDF("tgt_tok", "n_tok")
      .select(PipelineQueries.epochsMicroExpr.as("em"))
      .collect().map(_.getLong(0)).toSeq
    assert(got === expected)
    // and the naive form really does break on the planted operands —
    // ANSI Spark (the 4.x default) raises ARITHMETIC_OVERFLOW where
    // legacy mode silently wraps; either way it diverges from the
    // exact value the guard computes
    val boom = intercept[Exception] {
      cases.drop(5).toDF("tgt_tok", "n_tok")
        .select(expr("tgt_tok * 1000000 div n_tok").as("em"))
        .collect()
    }
    assert(boom.getMessage.toUpperCase.contains("OVERFLOW"),
      s"planted operands must exercise the wrap, got: ${boom.getMessage}")
  }

  test("pii scrub redacts emails, phones and IPs and nothing else") {
    val out = PipelineQueries.t6PiiScrub(spark, sf0)
    assert(out.count() === 500)
    // every doc gets exactly one planted instance of each kind
    assert(out.filter($"n_email" =!= 1 || $"n_phone" =!= 1 || $"n_ip" =!= 1).count() === 0)
    // scrubbed text no longer matches any pattern: scrub twice = fixpoint
    val planted = concat(col("text"),
      lit(" contact user"), col("doc_id").cast("string"), lit("@example.org tel +1-555-"),
      lpad(col("doc_id").cast("string"), 4, "0"),
      lit(" ip 10."), (col("doc_id") % 256).cast("string"), lit(".0.1"))
    val once = regexp_replace(regexp_replace(regexp_replace(planted,
      "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}", "[EMAIL]"),
      "\\+\\d[\\d-]{7,}\\d", "[PHONE]"),
      "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "[IP]")
    val redacted = GraftSession.table(spark, sf0, "documents").select(once.as("s"))
    assert(redacted.filter($"s".rlike("@|\\+\\d|\\d+\\.\\d+\\.\\d+\\.\\d+")).count() === 0)
  }

  test("contamination: a doc copying benchmark text is the top-shared pair") {
    val docs = GraftSession.table(spark, sf0, "documents")
      .select($"doc_id", $"text")
    // plant: doc 9999 copies benchmark doc 100's text verbatim
    val benchText = docs.filter($"doc_id" === 100L).select($"text").head().getString(0)
    val planted = docs.unionByName(Seq((9999L, benchText)).toDF("doc_id", "text"))
    val tmp = tmpDir("contam") + "/documents.parquet"
    planted.coalesce(1).write.mode("overwrite").parquet(tmp + ".dir")
    // d8 reads a table dir layout — stage as <dir>/documents.parquet
    val stage = tmpDir(s"contam_stage_${System.nanoTime()}")
    val part = new java.io.File(tmp + ".dir").listFiles()
      .filter(f => f.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(stage, "documents.parquet"))
    val res = PipelineQueries.d8Contamination(spark, stage)
      .as[(Long, Long, Long)].collect()
    val top = res.maxBy(_._3)
    assert((top._1, top._2) === (9999L, 100L),
      s"verbatim copy must dominate, got $top")
    assert(top._3 > 10, "a full copy shares nearly all trigrams")
  }

  test("d23 decontam: planted benchmark copies dropped, clean docs kept, per source") {
    // bench = doc_id % 50 == 0; doc 1 copies bench doc 50's text
    // (shares all its trigrams → flagged), docs 2/3 are clean
    val stage = tmpDir(s"d23_stage_${System.nanoTime()}")
    val benchText = "alpha beta gamma delta epsilon zeta eta theta"
    val df = Seq(
      (50L, benchText, "en", "bench", 8L),
      (1L, benchText, "en", "web", 8L),                          // leak → dropped
      (2L, "one two three four five six seven", "en", "web", 7L), // clean → kept
      (3L, "lorem ipsum dolor sit amet consectetur", "en", "books", 6L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    df.coalesce(1).write.mode("overwrite").parquet(stage + "/raw")
    val part = new java.io.File(stage + "/raw").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(stage, "documents.parquet"))
    val out = PipelineQueries.d23TrigramDecontam(spark, stage)
      .as[(String, Long, Long, Long, Option[Long], Option[Long])]
      .collect().map(r => r._1 -> r).toMap
    assert(out.keySet === Set("web", "books"), "bench docs are not corpus rows")
    assert(out("web") === (("web", 2L, 1L, 1L, Some(2L), Some(2L))),
      s"web must drop the leak and keep doc 2: ${out("web")}")
    assert(out("books") === (("books", 1L, 0L, 1L, Some(3L), Some(3L))),
      s"books is untouched: ${out("books")}")
    // conservation against the report: total dropped = d8's distinct
    // flagged train docs (the action removes exactly what the report
    // lists, nothing else)
    val flagged = PipelineQueries.d8Contamination(spark, stage)
      .select($"doc_id").distinct().as[Long].collect().toSet
    assert(flagged === Set(1L))
    assert(out.values.map(_._3).sum === flagged.size.toLong)
  }

  test("d23 decontam plan: the corpus drop decision is a broadcast left join") {
    val plan = PipelineQueries.d23TrigramDecontam(spark, sf0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
    // the drop join is the plan's only outer join — documents must
    // reach it without exchanging (flagged ids broadcast), so at
    // 100 TB the corpus is scanned once and never shuffled for the
    // drop or the per-source census (partial agg on source)
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftOuter"),
      s"flagged-id drop must be a broadcast outer join:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"no sort-merge anywhere — every join side is shingle/flag-bounded:\n$plan")
  }

  test("repetition: a doc of one repeated token has dup_ratio ~1, distinct doc ~0") {
    val df = Seq(
      (1L, Seq.fill(30)("spam").mkString(" ")),
      (2L, (1 to 30).map(i => s"tok$i").mkString(" "))).toDF("doc_id", "text")
    val stage = tmpDir(s"rep_stage_${System.nanoTime()}")
    df.coalesce(1).write.mode("overwrite").parquet(stage + "/raw")
    val part = new java.io.File(stage + "/raw").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(stage, "documents.parquet"))
    val res = PipelineQueries.t8Repetition(spark, stage)
      .select($"doc_id", $"dup_ratio").as[(Long, Double)].collect().toMap
    assert(res(1L) > 0.9, s"all-same trigrams: ${res(1L)}")
    assert(res(2L) === 0.0, s"all-distinct trigrams: ${res(2L)}")
  }

  test("c4 filters: every planted rule fires on exactly its doc subset; kept = no flag") {
    val out = PipelineQueries.t17C4Filters(spark, sf0)
      .select($"doc_id", $"f_lorem", $"f_brace", $"f_js", $"f_short", $"kept")
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    // the corpus text itself contains none of the planted markers, so
    // the marker flags fire EXACTLY on the planted id classes
    out.foreach { case (id, (lorem, brace, js, short0, kept)) =>
      assert(lorem === (if (id % 13 == 0) 1L else 0L), s"doc $id lorem")
      assert(brace === (if (id % 17 == 0) 1L else 0L), s"doc $id brace")
      assert(js === (if (id % 19 == 0) 1L else 0L), s"doc $id js")
      // truncated docs are short UNLESS planted junk re-inflates the
      // word count (doc 0 hits all four classes at once)
      if (id % 23 == 0 && id % 13 != 0 && id % 17 != 0 && id % 19 != 0)
        assert(short0 === 1L, s"doc $id truncated to 40 chars must be short")
      assert(kept === (if (lorem + brace + js + short0 == 0) 1L else 0L),
        s"doc $id kept")
    }
    // the short rule must also fire naturally (untruncated short docs)
    assert(out.exists { case (id, (_, _, _, s, _)) => id % 23 != 0 && s == 1L },
      "corpus word counts span the threshold — natural shorts expected")
    assert(out.values.exists(_._5 == 1L), "some docs must survive")
  }

  test("c4 filters: a clean long doc passes, each junk marker alone rejects") {
    // ids chosen so no planted id-class fires (13, 17, 19, 23 do not
    // divide them) — the flags then reflect the TEXT alone
    val longText = (1 to 60).map(i => s"w$i").mkString(" ")
    val df = Seq(
      (1L, longText),
      (2L, longText + " some lorem ipsum filler"),
      (3L, longText + " if (x) { return; }"),
      (4L, longText + " enable JavaScript to view"),
      (5L, "too short")).toDF("doc_id", "text")
    val stage = tmpDir(s"c4_stage_${System.nanoTime()}")
    df.coalesce(1).write.mode("overwrite").parquet(stage + "/raw")
    val part = new java.io.File(stage + "/raw").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(stage, "documents.parquet"))
    val out = PipelineQueries.t17C4Filters(spark, stage)
      .select($"doc_id", $"kept").as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 1L, 2L -> 0L, 3L -> 0L, 4L -> 0L, 5L -> 0L))
  }

  test("d20: source overlap conserves d11's pair table exactly") {
    val pairs = PipelineQueries.d11PassageDedup(spark, sf0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val rollup = PipelineQueries.d20SourceOverlap(spark, sf0).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rollup.nonEmpty)
    // every doc pair lands in exactly one source cell → counts conserve
    assert(rollup.map(_._3).sum === pairs.length.toLong)
    assert(rollup.map(_._4).sum === pairs.map(_._3).sum)
    // cells are canonical: source_a <= source_b, no duplicate cells
    rollup.foreach { case (a, b, _, _) => assert(a <= b) }
    assert(rollup.map(r => (r._1, r._2)).distinct.length === rollup.length)
  }

  test("cusum: changepoint lands on a planted level shift") {
    // user 1: flat 0 then flat 10.00 — CUSUM must peak at the last
    // pre-shift row (i=4 of 8: |n*cum - i*T| = |0 - 4*4000| = 16000)
    val dir = tmpDir(s"cusum_plant_${System.nanoTime()}")
    def t(h: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    val rows = (0 until 8).map { i =>
      (i.toLong, t(i), 1L, "e", if (i < 4) 0.0 else 10.0, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(dir + "/events.parquet")
    val out = Extended.qCusum(spark, dir).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getLong(1) === 8L)
    assert(r.getString(2) === "2024-01-01 03:00:00", "peak at last pre-shift row")
    assert(r.getLong(3) === 16000L)
  }

  test("dwell: planted gaps yield the exact lower median and max") {
    // gaps of 10, 20, 30, 40 s → n=4, lower median = 2nd smallest = 20
    val dir = tmpDir(s"dwell_plant_${System.nanoTime()}")
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val offs = Seq(0L, 10L, 30L, 60L, 100L) // cumulative: gaps 10/20/30/40
    val rows = offs.zipWithIndex.map { case (o, i) =>
      (i.toLong, new java.sql.Timestamp(ts0 + o * 1000), 7L, "e", 1.0, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(dir + "/events.parquet")
    val out = Extended.qDwell(spark, dir).collect()
    assert(out.length === 1)
    val r = out.head
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) === ((4L, 20L, 40L)))
  }

  test("p10: largest-remainder allocation sums exactly to the budget, within 1 of proportional") {
    val out = PipelineQueries.p10EvalAlloc(spark, sf0)
      .select($"n_docs", $"alloc").as[(Long, Long)].collect()
    val k = PipelineQueries.EvalSlots
    val n = out.map(_._1).sum
    assert(out.map(_._2).sum === k, "allocations must sum exactly to the budget")
    out.foreach { case (nd, alloc) =>
      val exact = k.toDouble * nd / n
      assert(math.abs(alloc - exact) < 1.0,
        s"alloc $alloc vs exact share $exact must differ by < 1")
    }
  }

  test("p10: hand-computed plant — remainders break the tie in order") {
    // 3 sources with 5/3/2 docs, K=100: shares 50/30/20 exactly — no
    // leftover; then 4/3/3 docs: base 40/30/30, no leftover either;
    // use 5/4/1 → base 50/40/10, exact again... force remainders with
    // 7 docs: 3/3/1 → base 42/42/14, rem 600%7=… compute directly
    val dir = tmpDir(s"p10_plant_${System.nanoTime()}")
    (Seq.fill(3)("a") ++ Seq.fill(3)("b") ++ Seq("c")).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "source")
      .write.mode("overwrite").parquet(dir + "/documents.parquet")
    // N=7, K=100: a,b: 300/7=42 rem 6; c: 100/7=14 rem 2 → sum base
    // 98, leftover 2 → both 'a' and 'b' (larger remainder) get +1
    val out = PipelineQueries.p10EvalAlloc(spark, dir)
      .select($"source", $"alloc").as[(String, Long)].collect().toMap
    assert(out === Map("a" -> 43L, "b" -> 43L, "c" -> 14L))
  }

  test("dsir: disjoint-vocab plant — target-vocab docs score positive, rest negative") {
    // target (en) docs use one vocabulary, non-target another; the
    // importance weight must then separate the classes by sign:
    // target tokens are over-represented in the target model
    // (p_t > p_r) and absent tokens under-represented (p_t add-one
    // floor vs a real raw count)
    val dir = tmpDir(s"dsir_plant_${System.nanoTime()}")
    val docs = (0 until 20).map { i =>
      if (i % 2 == 0) (i.toLong, "alpha beta gamma delta", "en")
      else (i.toLong, "uno dos tres cuatro", "de")
    }
    docs.toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(dir + "/documents.parquet")
    val w = PipelineQueries.t20Dsir(spark, dir)
      .select($"doc_id", $"dsir_w").as[(Long, Double)].collect().toMap
    assert(w.size === 20)
    (0 until 20).foreach { i =>
      if (i % 2 == 0) assert(w(i.toLong) > 0, s"target doc $i must score > 0")
      else assert(w(i.toLong) < 0, s"non-target doc $i must score < 0")
    }
  }
}
