package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: write `.explain("formatted")` of named SparkEntry queries to
  * files (`runMain graft.PlanDump <outDir> <suffix> q1,q2,...`) — the
  * optimization rounds' plan-evidence artifacts (plans/rNN/<q>_before.txt /
  * _after.txt). Uses the same session shape as Bench so the dumped plan is
  * the one the bench actually executes (shuffle.partitions = cpus). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    // WORK plans of operators whose registered surface is an eager
    // checkpoint (the registered plan is just a checkpoint scan — the
    // r11 "Exchange 26→0" plan-evidence lesson): dump the lazy builder
    // so the operator's real stages are auditable.
    val workPlans: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
      "q201_containment_workplan" -> ((s, d) =>
        graft.operators.Dedup.containmentJoinWorkPlan(graft.sources.Tables(s, d).documents)),
      "q412_containment_budgeted_workplan" -> ((s, d) => {
        val docs = graft.sources.Tables(s, d).documents
        graft.operators.Dedup.containmentJoinWorkPlan(
          docs, pairBudget = Some(graft.operators.Dedup.scaledPairBudget(docs)))
      }))
    names.foreach { name =>
      val df = workPlans.getOrElse(name, SparkEntry.queries(name))(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
        plan.getBytes("UTF-8"))
      println(s"[plandump] wrote $outDir/${name}_$suffix.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
