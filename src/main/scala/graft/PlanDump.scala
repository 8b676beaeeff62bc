package graft

/** Writes `.explain("formatted")` for named queries to files — the
  * committed plan evidence for optimization rounds:
  * `runMain graft.PlanDump <sfDir> <outDir> <label> <query> [query...]`
  * produces `<outDir>/<query>_<label>.txt`. Same session shape as Bench
  * (local[$SPARK_GRAFT_CPUS], shuffle.partitions=cpus) so the dumped
  * plan is the plan the bench actually runs.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: PlanDump <sfDir> <outDir> <label> <query> [query...]")
    val Array(sfDir, outDir, label) = args.take(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    args.drop(3).foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      val df = fn(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val w = new java.io.PrintWriter(s"$outDir/${name}_$label.txt")
      try w.println(txt) finally w.close()
      println(s"[plandump] wrote $outDir/${name}_$label.txt")
    }
    spark.stop()
  }
}
