package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns (SURVEY.md §2.4),
  * as codegen-friendly expression folds — no UDFs, no collect.
  * Accumulation is sequential left-to-right in double precision,
  * matching DuckDB's list arithmetic for oracle parity of orderings.
  */
object VectorFunctions {

  /** Cast array<float> → array<double> (exact). */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column = ArrayDotProduct(a, b)

  def norm2(a: Column): Column = ArrayDotProduct(a, a)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))

  /** Sign-random-projection bucket id: `nBits` deterministic
    * pseudo-random hyperplanes with ±1 components derived from
    * xxhash64(bit, dim) parity — no RNG state, so every executor and
    * every run derives the same planes. Bucket = bit-string of the
    * projection signs. This is the ANN scale path: shuffling on the
    * bucket id groups near vectors without any pairwise work.
    */
  def srpBucket(v: Column, nBits: Int): Column =
    concat_ws("", (0 until nBits).map { bit =>
      val proj = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1), (x, i) => {
          val sign = when(pmod(xxhash64(lit(bit), i), lit(2)) === 0, lit(1.0)).otherwise(lit(-1.0))
          x * sign
        }),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit("1")).otherwise(lit("0"))
    }: _*)
}
