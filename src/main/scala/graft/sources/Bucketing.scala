package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed table writes — the co-located-join layout.
  *
  * A fact table bucketed (and sorted) on its join key joins another table
  * bucketed the same way with NO Exchange and no sort in the plan: the
  * shuffle was paid once at write time and amortized over every
  * subsequent join. At 100 TB this turns the nightly fact⋈fact join from
  * the dominant shuffle into a local merge. The sealed warehouse table
  * from [[graft.streaming.HiveBatchSink]] is the natural place to apply
  * this (bucket by the downstream join key when sealing).
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, bucketCol: String, buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)
}
