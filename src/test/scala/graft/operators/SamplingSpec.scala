package graft.operators

import graft.{GraftSession, SparkSpec}
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = GraftSession.table(spark, sf0, "documents")

  test("hash sample is deterministic and ~fraction sized") {
    val a = Sampling.hashSample(docs, "doc_id", 0.25).select($"doc_id")
      .as[Long].collect().toSet
    val b = Sampling.hashSample(docs, "doc_id", 0.25).select($"doc_id")
      .as[Long].collect().toSet
    assert(a === b, "same rows every run")
    val frac = a.size.toDouble / docs.count()
    assert(frac > 0.15 && frac < 0.35, s"got $frac")
    // monotone: a smaller fraction is a subset of a larger one
    val small = Sampling.hashSample(docs, "doc_id", 0.1).select($"doc_id")
      .as[Long].collect().toSet
    assert(small.subsetOf(a))
  }

  test("split assignment is disjoint, exhaustive, and roughly weighted") {
    val splits = Sampling.assignSplit(docs, "doc_id")
    assert(splits.count() === docs.count())
    val byrow = splits.groupBy($"doc_id").agg(countDistinct($"split").as("n"))
      .filter($"n" > 1).count()
    assert(byrow === 0)
    val counts = splits.groupBy($"split").count().as[(String, Long)].collect().toMap
    val total = counts.values.sum.toDouble
    assert(counts("train") / total > 0.7)
    assert(counts.keySet === Set("train", "val", "test"))
  }

  test("temperature rates: T=1 is proportional, higher T upweights small strata") {
    // skewed strata: 400 'en', 80 'zh', 20 'ko'
    val df = ((1 to 400).map(i => (i.toLong, "en")) ++
      (401 to 480).map(i => (i.toLong, "zh")) ++
      (481 to 500).map(i => (i.toLong, "ko"))).toDF("doc_id", "lang")
    val t1 = Sampling.temperatureRates(df, "lang", temperature = 1.0, targetRows = 100)
    // natural proportions: every stratum keeps the same fraction
    assert(math.abs(t1("en") - t1("zh")) < 1e-9 && math.abs(t1("zh") - t1("ko")) < 1e-9)
    val t3 = Sampling.temperatureRates(df, "lang", temperature = 3.0, targetRows = 100)
    assert(t3("ko") > t3("zh") && t3("zh") > t3("en"),
      s"higher T must upweight small strata: $t3")
    // rates actually deliver ~target when applied
    val kept = Sampling.stratifiedSample(df, "doc_id", "lang", t3, defaultRate = 0.0).count()
    assert(kept > 60 && kept < 140, s"kept $kept of target 100")
  }

  test("train order: every row placed once, positions contiguous per shard, order reproducible") {
    val out = Sampling.trainOrder(docs.select($"doc_id"), "doc_id", shardChars = 1)
    assert(out.count() === docs.count(), "a permutation loses nothing")
    // per-shard positions are exactly 1..n
    val bad = out.groupBy($"shard")
      .agg(count(lit(1)).as("n"), max($"pos").as("mx"), min($"pos").as("mn"),
        countDistinct($"pos").as("d"))
      .filter($"mx" =!= $"n" || $"mn" =!= 1 || $"d" =!= $"n")
    assert(bad.count() === 0, "positions must be a contiguous 1..n per shard")
    // reproducible across runs AND input partitionings (the property
    // rand()-based shuffling cannot give)
    val a = out.select($"doc_id", $"shard", $"pos")
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    val b = Sampling.trainOrder(
        docs.select($"doc_id").repartition(13), "doc_id", shardChars = 1)
      .select($"doc_id", $"shard", $"pos")
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(a === b)
    // the order is actually shuffled: within a shard, consecutive
    // positions are not consecutive doc_ids (md5 decorrelates)
    val byShard = a.groupBy(_._2).mapValues(_.sortBy(_._3).map(_._1))
    val monotoneShards = byShard.values.count(ids => ids == ids.sorted)
    assert(monotoneShards < byShard.size,
      "at least one shard must not be in doc_id order")
  }
}
