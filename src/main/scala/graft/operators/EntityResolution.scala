package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.PortableRound.round

/** Blocked entity resolution with field-weighted match scoring and
  * golden-record survivorship (SURVEY.md §2 dedup/linkage family — the
  * RECORD-linkage counterpart to the document near-dup stack: q107 finds
  * typo-equal strings, q40/q120 similar token sets; this resolves
  * structured records that agree on SOME fields into one entity).
  *
  * The Fellegi–Sunter shape, Spark-first:
  *
  *   1. **Blocking** bounds the quadratic: candidate pairs form only
  *      inside a block (equi-join on the block key — never a cross
  *      join). Hot blocks are the classic failure (a block of b rows
  *      costs b²); blocks above `maxBlock` get a finer key appended
  *      (sub-blocking), decided by a broadcast block-count join, so
  *      pair cost stays bounded as the table grows — recall inside a
  *      split block is what survivorship trades for scale, the
  *      standard ER dial.
  *   2. **Scoring** is integer agreement points per comparison field
  *      (type match, size within tolerance, price within tolerance).
  *      Integer points, not float weights: a float threshold like
  *      0.5+0.2 ≥ 0.7 is representation-dependent and can flip between
  *      engines; integer points compare exactly everywhere (the
  *      portable-rounding lesson applied to classification).
  *   3. **Matching** keeps pairs with points ≥ `tau`.
  *   4. **Clustering + survivorship** ([[goldenRecords]]): matched
  *      pairs → connected components (min-label propagation, shared
  *      with q47/q65) → one golden record per entity with explicit
  *      survivorship rules (min key as canonical id, alphabetic-min
  *      brand, modal-free max price, member count) — deterministic,
  *      auditable field provenance. */
object EntityResolution {

  /** Match points: type agreement is the strong signal (5), size within
    * ±1 (3), retail price within ±50 (2); matched ⇔ points ≥ 7 — type
    * must agree, plus at least one corroborating numeric field. */
  val TypePoints = 5
  val SizePoints = 3
  val PricePoints = 2
  val DefaultTau = 7

  /** Blocked candidate pairs with agreement points. One row per
    * in-block pair (a < b). Block key is p_name, sub-blocked by brand
    * when the name block exceeds `maxBlock` records. */
  def linkagePairs(part: DataFrame, maxBlock: Long = 64, tau: Int = DefaultTau): DataFrame = {
    val recs = part.select(
      col("p_partkey"), col("p_name"), col("p_brand"),
      col("p_type"), col("p_size"), col("p_retailprice"))
    val blockCounts = recs.groupBy("p_name").agg(count(lit(1)).as("blk_n"))
    val blocked = recs
      .join(broadcast(blockCounts), Seq("p_name"))
      .withColumn("blk",
        when(col("blk_n") > maxBlock, concat(col("p_name"), lit("|"), col("p_brand")))
          .otherwise(col("p_name")))
    val a = blocked.select(
      col("blk"), col("p_name"),
      col("p_partkey").as("key_a"), col("p_brand").as("brand_a"),
      col("p_type").as("type_a"), col("p_size").as("size_a"),
      col("p_retailprice").as("price_a"))
    val b = blocked.select(
      col("blk"),
      col("p_partkey").as("key_b"), col("p_brand").as("brand_b"),
      col("p_type").as("type_b"), col("p_size").as("size_b"),
      col("p_retailprice").as("price_b"))
    a.join(b, Seq("blk"))
      .filter(col("key_a") < col("key_b"))
      .withColumn("points",
        when(col("type_a") === col("type_b"), lit(TypePoints)).otherwise(lit(0)) +
          when(abs(col("size_a") - col("size_b")) <= 1, lit(SizePoints)).otherwise(lit(0)) +
          when(abs(col("price_a") - col("price_b")) <= 50.0, lit(PricePoints)).otherwise(lit(0)))
      .withColumn("matched", (col("points") >= tau).cast("int"))
  }

  /** q271: per-name linkage report — records, sub-blocks, candidate
    * pairs, matches, match rate. The blocking audit an ER pipeline
    * watches: a name whose n_pairs explodes needs a finer block key;
    * a match_rate near 1.0 inside blocks says the threshold is lax.
    * DuckDB-oracled (integer points make the classification exact). */
  def linkageReport(part: DataFrame, maxBlock: Long = 64, tau: Int = DefaultTau): DataFrame =
    linkagePairs(part, maxBlock, tau)
      .groupBy("p_name")
      .agg(
        countDistinct(col("blk")).as("n_blocks"),
        count(lit(1)).as("n_pairs"),
        sum(col("matched")).cast("long").as("n_matched"),
        round(sum(col("matched")) / count(lit(1)).cast("double"), 4).as("match_rate"))
      .orderBy("p_name")

  /** q272: golden records — matched pairs clustered into entities, one
    * survivor row per multi-member entity. Survivorship is explicit:
    * canonical key = min member key (stable, join-friendly), brand =
    * alphabetic min (deterministic tie-free), price = max (the
    * "most recently repriced wins" stand-in), size span kept as a
    * data-quality signal. Components run on the matched-pair graph
    * only — entity clusters are tiny and dense, so the propagation
    * loop converges in ≤ maxRounds at any corpus size. */
  def goldenRecords(part: DataFrame, maxBlock: Long = 64, tau: Int = DefaultTau): DataFrame = {
    val matched = linkagePairs(part, maxBlock, tau).filter(col("matched") === 1)
    val clusters = Dedup.connectedComponents(matched, "key_a", "key_b")
      .select(col("node_id").as("p_partkey"), col("cluster_id").as("entity_id"))
    part
      .join(clusters, Seq("p_partkey"))
      .groupBy("entity_id")
      .agg(
        count(lit(1)).as("n_members"),
        min(col("p_name")).as("name"),
        min(col("p_brand")).as("brand"),
        round(max(col("p_retailprice")), 2).as("price"),
        min(col("p_size")).as("size_min"),
        max(col("p_size")).as("size_max"))
      .orderBy("entity_id")
  }
}
