package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual form of the hot-key
  * playbook (AQE's skew-join split handles sort-merge joins at
  * runtime; salting is the static technique that also works for hash
  * aggregations and pre-AQE engines).
  *
  * Left rows scatter across `salts` sub-keys; the (smaller) right side
  * replicates `salts`×, and the join runs on `(key, salt)` — one hot
  * key's reducer becomes `salts` reducers. The RESULT is identical to
  * the unsalted join for any salt assignment (each left row meets
  * exactly the right replica carrying its salt), which is what makes
  * the operator oracle-checkable against a plain SQL join.
  */
object SkewJoin {

  def saltedJoin(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    // any deterministic-per-row spread works — the result is
    // salt-invariant, so hashing the whole left row is fine
    val l = left.withColumn("__lsalt",
      pmod(xxhash64(left.columns.map(col).toIndexedSeq: _*), lit(salts)))
    val r = right.withColumn("__rsalt",
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    l.join(r, col(leftKey) === col(rightKey) && col("__lsalt") === col("__rsalt"))
      .drop("__lsalt", "__rsalt")
  }
}
