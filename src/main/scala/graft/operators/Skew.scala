package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hot-key mitigation for shuffles AQE can't fix alone.
  *
  * A skewed equi-join key sends one reducer 1000× the median partition.
  * Salting splits each hot key into `saltBuckets` sub-keys: the large
  * side picks a deterministic salt per row, the small side is replicated
  * once per salt value, and the join runs on (key, salt) — same result,
  * bounded partition sizes. Use when the small side is too big to
  * broadcast but small enough to replicate `saltBuckets`×.
  */
object Skew {

  /** Equi-join `large ⋈ small` on `key`, salted. `uniqueCol` names any
    * column on the large side that varies per row (drives deterministic
    * salt assignment — no RNG, so retried tasks pick identical salts). */
  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      uniqueCol: String,
      saltBuckets: Int = 8,
      joinType: String = "inner"): DataFrame = {
    val saltedLarge = large.withColumn("_salt", pmod(hash(col(key), col(uniqueCol)), lit(saltBuckets)))
    val saltedSmall = small
      .withColumn("_salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedLarge.join(saltedSmall, Seq(key, "_salt"), joinType).drop("_salt")
  }
}
