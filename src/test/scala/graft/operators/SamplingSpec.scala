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
}
