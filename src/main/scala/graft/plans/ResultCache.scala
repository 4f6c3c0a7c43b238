package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, OneRowRelation, Range}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Plan-fingerprint RESULT CACHE — the engine-side memo a dashboard
  * front door needs: the same report re-requested between data loads
  * should cost one parquet read, not a recompute, and a cache entry
  * must die the moment any INPUT changes (staleness is worse than
  * recompute).
  *
  * Fingerprint = SHA-256 over
  *   1. the CANONICALIZED analyzed plan (Catalyst's own
  *      alias/expr-id-normalized form — two syntactically different
  *      but plan-identical queries share an entry, while any predicate
  *      or column change forks it), and
  *   2. an input SNAPSHOT: for every file-backed leaf relation, the
  *      root paths plus per-root (file count, total bytes, max mtime)
  *      from the driver-side file listing — appending, overwriting or
  *      compacting an input flips the snapshot and invalidates.
  *
  * Scale anatomy: the snapshot is METADATA-ONLY (one FileSystem
  * listing per root — the same listing the scan itself plans with);
  * results land as parquet under `cacheDir/<fp>/` via write-then-
  * rename so a crashed writer never leaves a half-entry that reads as
  * a hit; a hit is one parquet read. The cache is for REPORT-sized
  * results (the registry's query outputs are bounded frames) — a
  * data-sized result would make the cache write the dominant cost,
  * which the caller controls by what it caches.
  *
  * Concurrency: two writers racing the same fingerprint both compute;
  * the rename loser deletes its staging and reads the winner's entry —
  * correctness is unaffected (both computed the same plan over the
  * same snapshot). */
object ResultCache {

  /** Fingerprint of (canonicalized plan, input snapshot).
    *
    * FAIL-CLOSED: every leaf of the analyzed plan must be one the cache
    * can prove unchanged — a file-backed relation (snapshot = per-root
    * file count / bytes / max mtime), literal in-memory data (snapshot =
    * a hash of the rows — the canonicalized plan string elides
    * LocalRelation data, so two different literal frames would otherwise
    * collide), or a Range/OneRow leaf (fully described by the plan
    * string). ANY other leaf — a Hive catalog table, an RDD-backed
    * frame, a DSv2 relation — is REFUSED with an error instead of
    * silently fingerprinting without its snapshot: a cache that can't
    * see an input change would serve stale rows after an INSERT, and
    * staleness is the one failure a result cache must not have. */
  def fingerprint(df: DataFrame): String = {
    val spark = df.sparkSession
    val analyzed = df.queryExecution.analyzed
    val plan = analyzed.canonicalized.toString
    val conf = spark.sparkContext.hadoopConfiguration
    val snapshot: Seq[String] = analyzed.collectLeaves().flatMap {
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        fs.location.rootPaths.map(_.toString).sorted.map { r =>
          val p = new Path(r)
          val f = p.getFileSystem(conf)
          if (!f.exists(p)) s"$r:absent"
          else {
            val it = f.listFiles(p, true)
            var n = 0L; var bytes = 0L; var maxM = 0L
            while (it.hasNext) {
              val st = it.next()
              n += 1; bytes += st.getLen; maxM = math.max(maxM, st.getModificationTime)
            }
            s"$r:$n:$bytes:$maxM"
          }
        }
      case l: LocalRelation =>
        // literal rows are immutable for a given frame, but distinct
        // literal frames share a canonicalized plan string — hash the
        // data (UnsafeRow/InternalRow hashCodes are content hashes)
        Seq(s"local:${l.schema.catalogString}:${l.data.map(_.hashCode()).hashCode()}")
      case r: Range =>
        Seq(s"range:${r.start}:${r.end}:${r.step}:${r.numSlices.getOrElse(-1)}")
      case _: OneRowRelation => Seq("onerow")
      case other => throw new IllegalArgumentException(
        s"result cache refuses a non-snapshotable input leaf: ${other.nodeName}. " +
          "Only file-backed relations, literal local data, and range/one-row leaves " +
          "can be proven unchanged; caching anything else could serve stale results.")
    }
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest((plan + "\n" + snapshot.mkString("\n")).getBytes("UTF-8"))
    digest.map(b => f"$b%02x").mkString.take(32)
  }

  /** Serve `df` through the cache: hit → read the entry; miss →
    * compute, land atomically, read back. Returns (result, hit?). */
  def cachedWithStatus(df: DataFrame, cacheDir: String): (DataFrame, Boolean) = {
    val spark = df.sparkSession
    val fp = fingerprint(df)
    val conf = spark.sparkContext.hadoopConfiguration
    val entry = new Path(s"$cacheDir/$fp")
    val f = entry.getFileSystem(conf)
    if (f.exists(entry)) (spark.read.parquet(entry.toString), true)
    else {
      val staging = new Path(s"$cacheDir/_staging_${fp}_${java.util.UUID.randomUUID().toString.take(8)}")
      df.write.mode("overwrite").parquet(staging.toString)
      if (!f.rename(staging, entry)) {
        // rename loser: a concurrent writer landed the same fingerprint
        f.delete(staging, true)
        require(f.exists(entry), s"result-cache rename failed with no winner at $entry")
      }
      (spark.read.parquet(entry.toString), false)
    }
  }

  def cached(df: DataFrame, cacheDir: String): DataFrame =
    cachedWithStatus(df, cacheDir)._1

  /** Drop entries whose fingerprints are no longer live (simple GC:
    * the caller passes the fingerprints it still wants). */
  def evictExcept(spark: SparkSession, cacheDir: String, keep: Set[String]): Long = {
    val root = new Path(cacheDir)
    val f = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(root)) return 0L
    f.listStatus(root).count { st =>
      val name = st.getPath.getName
      val drop = !name.startsWith("_staging_") && !keep.contains(name)
      if (drop) f.delete(st.getPath, true)
      drop
    }.toLong
  }
}
