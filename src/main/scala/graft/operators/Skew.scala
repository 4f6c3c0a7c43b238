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

  /** Deterministic per-key set cap — the maxBucket discipline for
    * quadratic per-key expansions (q349's customer×parts self-join, or
    * any `a ⋈ a ON key` whose per-key group size is not naturally
    * bounded). Keys with ≤ `cap` rows pass through BIT-IDENTICAL on the
    * plan they already had; a key exceeding the cap (a "whale" — a B2B
    * customer owning 50k popular parts would otherwise expand to ~1.25B
    * pairs inside ONE shuffle partition) keeps the `cap` rows ranked
    * first by xxhash64(key, item) — deterministic across retries and
    * cluster sizes, no RNG — so downstream Θ(Σ per-key n²) is bounded
    * by Θ(keys·cap²). The cap is an explicit exact/approximate
    * boundary: choose it above the data's real max degree (measure with
    * [[skewAudit]]) and the result is exact; a binding cap is a
    * documented approximation of whale keys only.
    *
    * Plan shape: one per-key count aggregate, a broadcast of the
    * (rare-by-definition) whale keys, and a window sort over ONLY the
    * whale rows — the non-whale path is an anti-join passthrough, no
    * window, no extra sort. */
  def capPerKey(df: DataFrame, key: String, item: String, cap: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val whales = df.groupBy(col(key)).agg(count(lit(1)).as("__deg"))
      .filter(col("__deg") > cap)
      .select(col(key))
    val pass = df.join(broadcast(whales), Seq(key), "left_anti")
    val w = Window.partitionBy(col(key))
      .orderBy(xxhash64(col(key), col(item)), col(item))
    val whaleRows = df.join(broadcast(whales), Seq(key), "left_semi")
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= cap)
      .drop("__rk")
    pass.unionByName(whaleRows)
  }

  /** q154: join-key skew audit — the pre-flight diagnostic that decides
    * between a plain shuffle join, AQE skew splitting, and [[saltedJoin]]
    * (and, fed a `saltBuckets`, sizes it).
    *
    * One map-side-combinable pass collapses the fact table to per-key
    * counts (distinct-key cardinality, the same shuffle the audited join
    * would pay); key counts then bucket by ⌊log₂(count)⌋ — computed as
    * `length(bin(count))-1`, integer-exact on both engines, never a
    * float log — into a ≤64-row histogram. Global figures (row total,
    * the hottest key's share, the salt factor that caps a reducer at
    * `targetRowsPerTask`) attach via the 1-row broadcast scalar idiom
    * (q14/q114 — no unpartitioned window). Reading the result: hot-key
    * share ≈ 1/parallelism in the top bucket means one straggler reducer
    * per join — salt by `rec_salt`. */
  def skewAudit(
      fact: DataFrame,
      key: String,
      targetRowsPerTask: Long = 4000000L): DataFrame = {
    val perKey = fact.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
    val global = perKey.agg(
      sum("cnt").as("total_rows"),
      count(lit(1)).as("total_keys"),
      max("cnt").as("max_cnt"))
    perKey
      .withColumn("bucket", (length(bin(col("cnt"))) - 1).cast("int"))
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n_keys"),
        sum("cnt").as("n_rows"),
        max("cnt").as("max_count"))
      .join(broadcast(global))
      .select(
        col("bucket"), col("n_keys"), col("n_rows"), col("max_count"),
        graft.functions.PortableRound.round(
          col("n_rows") / col("total_rows") * 100, 4).as("rows_pct"),
        graft.functions.PortableRound.round(
          col("max_cnt") / col("total_rows") * 100, 4).as("hot_key_pct"),
        ceil(col("max_cnt") / lit(targetRowsPerTask)).cast("long").as("rec_salt"))
      .orderBy("bucket")
  }
}
