package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Plan-inspection utility: prints the formatted physical plan for the
  * named queries (or a summary line for all) so shuffle/broadcast/pushdown
  * regressions are visible. `runMain graft.Explain [sfDir] [query...]`.
  *
  * [[counters]] is the reusable core — ExtensionsSpec pins the counts for
  * the most expensive queries, so an accidentally added exchange fails CI
  * instead of surfacing as a bench regression two rounds later.
  */
object Explain {

  /** Physical-plan operator counts for a query. Cached subtrees print
    * their whole child plan at EVERY InMemoryTableScan reference, so a
    * raw substring count multiplies shared subplans; plan_ids are stable
    * across those reprints — count distinct ids (execution runs each
    * once). Keys: shuffles (hash-partitioning exchanges), broadcasts,
    * sortMergeJoins, codegenSpans, pushedFilterScans.
    */
  def counters(df: DataFrame): Map[String, Int] = {
    val plan = df.queryExecution.executedPlan.toString
    def distinctIds(kind: String): Int =
      (kind + "[^\\n]*?\\[plan_id=(\\d+)\\]").r
        .findAllMatchIn(plan).map(_.group(1)).toSet.size
    // Nested-loop/cartesian joins are counted on the plan TREE, not the
    // string: a cached subtree's plan reprints at every InMemoryTableScan
    // reference, and BNLJ lines carry no plan_id to dedupe on — a raw
    // substring count therefore depends on which shared frames happen to
    // be cached when the query plans (suite flakiness, r9). The walk
    // descends through AQE's wrapper and subquery plans but stops at
    // cached scans, so a warm cache can only LOWER the count (the cached
    // subtree does not re-execute); whitelists calibrate the fresh max.
    def nestedLoops(p: org.apache.spark.sql.execution.SparkPlan): Int = {
      val self =
        if (p.nodeName.startsWith("BroadcastNestedLoopJoin") ||
          p.nodeName.startsWith("CartesianProduct")) 1 else 0
      val kids = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          Seq(a.inputPlan)
        case _ if p.nodeName.startsWith("InMemoryTableScan") => Nil
        case _ => p.children
      }
      self + (kids ++ p.subqueries).map(nestedLoops).sum
    }
    Map(
      "shuffles" -> distinctIds("Exchange hashpartitioning"),
      "broadcasts" -> distinctIds("BroadcastExchange"),
      "sortMergeJoins" -> "SortMergeJoin".r.findAllIn(plan).size,
      // the two non-equi scale-killers: O(N·M) row-compare joins
      "nestedLoopJoins" -> nestedLoops(df.queryExecution.executedPlan),
      // toString marks codegen stages as "*(n)" prefixes, not the word
      // "WholeStageCodegen"; distinct ids = number of codegen spans.
      "codegenSpans" -> "\\*\\((\\d+)\\)".r.findAllMatchIn(plan)
        .map(_.group(1)).toSet.size,
      "pushedFilterScans" -> "PushedFilters: \\[[^\\]]".r
        .findAllIn(plan).size)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      SparkEntry.queries.get(n).foreach { fn =>
        try {
          val df = fn(spark, sfDir)
          val c = counters(df)
          println(f"PLAN $n%-28s shuffles=${c("shuffles")} " +
            f"bcastJoin=${c("broadcasts")} sortMergeJoin=${c("sortMergeJoins")} " +
            f"nestedLoop=${c("nestedLoopJoins")} " +
            f"codegenSpans=${c("codegenSpans")} pushedFilterScans=${c("pushedFilterScans")}")
          if (args.length > 1) println(df.queryExecution.executedPlan.toString)
        } catch { case e: Throwable => println(s"PLAN $n ERROR: ${e.getMessage}") }
      }
    }
    spark.stop()
  }
}
