package graft.operators

import graft.{GraftSession, SparkSpec}
import org.apache.spark.sql.functions._

/** Planted-behavior checks for the round-5 corpus operators — the
  * oracles pin engine parity; these pin semantics on known inputs.
  */
class CorpusQueriesSpec extends SparkSpec {
  import spark.implicits._

  test("triangles: degree-oriented count equals unordered brute-force enumeration") {
    // independent brute force over the same planted graph: enumerate
    // undirected edges a<b and count closures (a<b<c) directly —
    // no orientation, no dedup subtleties shared with the operator
    val sf = sf0
    val docs = graft.GraftSession.table(spark, sf, "documents")
    val n = docs.count()
    val ids = docs.select($"doc_id").as[Long].collect()
    def pm(x: Long): Long = ((x % n) + n) % n
    val und = ids.flatMap { id =>
      val ds = Seq(pm(id * id + 13), id % 97) ++
        (if (id % 3 == 0) Seq(pm(id * 5 + 41)) else Nil)
      ds.filter(_ != id).map(d => (math.min(id, d), math.max(id, d)))
    }.toSet
    val adj = und.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val expected = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for ((a, b) <- und; c <- adj.getOrElse(b, Set.empty[Long]) if und.contains((a, c))) {
      expected(a) += 1; expected(b) += 1; expected(c) += 1
    }
    val got = CorpusQueries.qTriangles(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected.toMap)
    assert(got.nonEmpty, "planted graph must contain triangles")
  }

  test("chunking windows overlap by chunk-stride and cover every token") {
    val dir = tmpDir("t11_fixture")
    // 100 tokens -> starts 0, 48, 96 -> sizes 64, 52, 4
    val words = (0 until 100).map(i => s"w$i").mkString(" ")
    Seq((1L, words, "en", "s", 100L), (2L, "solo", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(dir + "/documents.parquet")
    val out = CorpusQueries.t11Chunk(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 0, 64L), (1L, 1, 52L), (1L, 2, 4L), (2L, 0, 1L)))
    // overlap: chunk 1 starts at token 48, inside chunk 0's [0, 64)
    assert(CorpusQueries.ChunkStride < CorpusQueries.ChunkSize)
  }

  test("canonicalUrl collapses scheme/case/www/port/query/fragment variants") {
    val variants = Seq(
      "https://example3.com/p/17",
      "http://www.example3.com/p/17/",
      "HTTPS://EXAMPLE3.COM/P/17?UTM_SOURCE=FEED",
      "https://example3.com:443/p/17#top")
    val out = variants.toDF("url")
      .select(CorpusQueries.canonicalUrl($"url").as("c"))
      .as[String].collect().toSet
    assert(out == Set("example3.com/p/17"), s"got $out")
    // distinct pages stay distinct
    val two = Seq("https://a.com/x", "https://a.com/y").toDF("url")
      .select(CorpusQueries.canonicalUrl($"url")).as[String].collect().toSet
    assert(two.size == 2)
  }

  test("unigram logprob ranks a rare-token doc below a common-token doc") {
    val dir = tmpDir("t12_fixture")
    // "the" appears in every doc; "zyzzyva" once in the whole corpus
    val docs = (1L to 9L).map(i => (i, "the the the the", "en", "s", 15L)) :+
      ((10L, "zyzzyva the", "en", "s", 11L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(dir + "/documents.parquet")
    val out = CorpusQueries.t12UnigramLogprob(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(10L) < out(1L),
      s"rare-token doc must score lower (less typical): ${out(10L)} vs ${out(1L)}")
    // all-common docs share the same score
    assert((1L to 9L).map(out).toSet.size == 1)
  }

  test("resample: grid is dense per user, gap hours carry the last value forward") {
    val out = Extended.qResampleFfill(spark, sf0)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) Long.MinValue else r.getLong(3)))
    val byUser = out.groupBy(_._1)
    byUser.foreach { case (u, rows) =>
      // dense hourly grid: consecutive timestamps are exactly 1h apart
      val hours = rows.map(_._2).sorted
      val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
      val ts = hours.map(h => java.time.LocalDateTime.parse(h, fmt))
      ts.sliding(2).foreach { case Array(a, b) =>
        assert(java.time.Duration.between(a, b).toHours == 1,
          s"user $u grid not hourly: $a -> $b")
      }
      // first grid hour is observed (grid starts at the user's first event)
      assert(rows.minBy(_._2)._3 > 0)
      // forward fill: a gap hour (n_obs = 0) repeats the previous fill
      val ordered = rows.sortBy(_._2)
      ordered.sliding(2).foreach { case Array(prev, cur) =>
        if (cur._3 == 0) assert(cur._4 == prev._4,
          s"user $u gap hour ${cur._2} must carry ${prev._4}, got ${cur._4}")
      }
    }
    // non-vacuous: most grid hours are gaps at this density
    val gaps = out.count(_._3 == 0)
    assert(gaps > out.length / 2, s"expected a sparse grid, gaps=$gaps/${out.length}")
  }

  test("pagerank: authority concentrates on hub nodes, mass is conserved") {
    val out = CorpusQueries.qPagerank(spark, sf0)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val n = out.size
    // damped mass conservation: sum stays ~n (leaks only via rounding)
    assert(math.abs(out.values.sum - n) < n * 0.01)
    // every node links to node % 97: the hub block must hold more
    // authority per node than the rest
    val (hubs, rest) = out.partition(_._1 < 97)
    val hubAvg = hubs.values.sum / hubs.size
    val restAvg = rest.values.sum / rest.size
    assert(hubAvg > 2 * restAvg,
      s"hub avg $hubAvg must dominate non-hub avg $restAvg")
    // deterministic run to run
    val again = CorpusQueries.qPagerank(spark, sf0)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(again == out)
  }

  test("vocab drift: planted two-source corpus matches hand-computed KL") {
    val dir = tmpDir("t15_fixture")
    // source A: tokens {a:2, b:1}; source B: {a:1, b:3}
    Seq((1L, "a a b", "en", "A", 5L), (2L, "a b b b", "en", "B", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(dir + "/documents.parquet")
    // JVM replay of the same formula: KL_s = Σ (c_st/n_s)·ln(c_st·N_c/(n_s·c_ct))
    def kl(tf: Map[String, Long], corpus: Map[String, Long]): Double = {
      val nS = tf.values.sum.toDouble
      val nC = corpus.values.sum.toDouble
      val raw = tf.map { case (t, c) =>
        c / nS * math.log(c * nC / (nS * corpus(t))) }.sum
      math.rint(raw * 1e6) / 1e6
    }
    val corpus = Map("a" -> 3L, "b" -> 4L)
    val out = CorpusQueries.t15VocabDrift(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out("A") === ((3L, 2L, kl(Map("a" -> 2L, "b" -> 1L), corpus))))
    assert(out("B") === ((4L, 2L, kl(Map("a" -> 1L, "b" -> 3L), corpus))))
    // the source that deviates more from the mixture scores higher
    assert(out("A")._3 > 0 && out("B")._3 > 0)
  }

  test("vocab drift: a source identical to the corpus mixture scores zero") {
    val dir = tmpDir("t15_fixture")
    // both sources carry the identical distribution → corpus mixture
    // equals each source → every ln term is ln(1) = 0 exactly
    Seq((1L, "x x y", "en", "A", 5L), (2L, "x x y", "en", "B", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(dir + "/documents.parquet")
    val out = CorpusQueries.t15VocabDrift(spark, dir)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(out === Map("A" -> 0.0, "B" -> 0.0))
  }

  test("outlier MAD: planted lengths give hand-computed median/MAD/flags") {
    val dir = tmpDir("t16_fixture")
    val docs =
      // A: med 3, adev {2,1,0,1,97} → mad 1 → only 97 > 3·1
      Seq(("A", 1L), ("A", 2L), ("A", 3L), ("A", 4L), ("A", 100L)) ++
      // B: constant lengths + one spike → mad 0, spike flagged (adev > 0)
      Seq(("B", 10L), ("B", 10L), ("B", 10L), ("B", 10L), ("B", 1000L)) ++
      // C: even count interpolates med to 2.0; no outliers
      Seq(("C", 1L), ("C", 3L))
    docs.zipWithIndex.map { case ((s, n), i) => (i.toLong, "x", "en", s, n) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(dir + "/documents.parquet")
    val out = PipelineQueries.t16OutlierMad(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))).toMap
    assert(out("A") === ((5L, 3.0, 1.0, 1L)))
    assert(out("B") === ((5L, 10.0, 0.0, 1L)), "MAD 0: any deviation flags")
    assert(out("C") === ((2L, 2.0, 1.0, 0L)), "even count interpolates the median")
  }

  test("hierarchy traversal reaches every customer exactly once from the root") {
    val out = Extended.qHierarchy(spark, sf0).collect()
    val total = out.map(_.getLong(1)).sum
    val customers = GraftSession.table(spark, sf0, "customer").count()
    assert(total === customers, "BFS must visit every node exactly once")
    // rooted at 0 (0's only child is 1), so level sizes run
    // 1, 1, 2, 4, 8, ... while the tree is full (contiguous keys 0..N-1)
    assert(out.head.getInt(0) === 0 && out.head.getLong(1) === 1L)
    assert(out(1).getLong(1) === 1L, "depth 1 holds only node 1")
    assert(out(4).getLong(1) === 8L, "depth 4 of the full tree has 8 nodes")
  }

  test("t23 vocab growth: monotone curves ending at exact corpus totals") {
    val out = CorpusQueries.t23VocabGrowth(spark, sf0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty && out.length <= CorpusQueries.GrowthBuckets)
    out.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._2 <= b._2 && a._3 <= b._3, "cumulative curves never decrease")
      case _ =>
    }
    import graft.functions.TextFunctions.wsTokens
    val docs = GraftSession.table(spark, sf0, "documents")
    val occ = docs.select(explode(wsTokens(col("text"))).as("term"))
    assert(out.last._2 === occ.count(), "final cum_tokens = corpus tokens")
    assert(out.last._3 === occ.distinct().count(), "final cum_vocab = corpus vocabulary")
  }

  test("t23 vocab growth: a duplicated corpus flattens after the first checkpoint") {
    val dir = tmpDir(s"t23_plant_${System.nanoTime()}")
    (0 until 200).map(i => (i.toLong, "same five tokens every doc"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(dir + "/documents.parquet")
    val out = CorpusQueries.t23VocabGrowth(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(out.head._2 === 5L, "vocabulary minted entirely at checkpoint 0")
    assert(out.forall(_._2 === 5L), "curve must stay flat — no new vocabulary")
  }
}
