package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns (SURVEY.md §2.4),
  * as codegen-friendly expression folds — no UDFs, no collect.
  * Accumulation is sequential left-to-right in double precision,
  * matching DuckDB's list arithmetic for oracle parity of orderings.
  */
object VectorFunctions {

  /** Cast array<float> → array<double> (exact widening). The native
    * array cast, not `transform(v, _.cast("double"))` (r20): the
    * transform form is an interpreted higher-order function that
    * rebuilt the array per row on EVERY vector path — and rebuilt it
    * even when the input was already array<double>, where the native
    * cast is the identity and the optimizer removes it.
    */
  def toDouble(v: Column): Column = v.cast("array<double>")

  def dot(a: Column, b: Column): Column = ArrayDotProduct(a, b)

  def norm2(a: Column): Column = ArrayDotProduct(a, a)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))

  /** Deterministic ±1 sign-random-projection hyperplanes: component
    * (bit, i) is the parity of md5("bit|i"), computed ONCE at
    * plan-build time. The planes are plain literal arrays — every
    * executor, every run, and every ENGINE derives the same buckets
    * (the s2 DuckDB oracle embeds these very constants), and the
    * runtime projection is a codegen'd dot product with zero hashing
    * (the previous per-element xxhash64 variant hashed nBits×dims
    * times per vector).
    */
  def srpPlanes(nBits: Int, dims: Int): Seq[Seq[Double]] =
    (0 until nBits).map { b =>
      (0 until dims).map { i =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val h = md.digest(s"$b|$i".getBytes("UTF-8"))
        if ((h(0) & 1) == 0) 1.0 else -1.0
      }
    }

  /** SRP bucket id: bit-string of projection signs against the fixed
    * planes. This is the ANN scale path: shuffling on the bucket id
    * groups near vectors without any pairwise work.
    */
  def srpBucket(v: Column, nBits: Int, dims: Int): Column =
    concat_ws("", srpPlanes(nBits, dims).map { plane =>
      val proj = ArrayDotProduct(v, array(plane.map(lit): _*))
      when(proj >= 0, lit("1")).otherwise(lit("0"))
    }: _*)
}
