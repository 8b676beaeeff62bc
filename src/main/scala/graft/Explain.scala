package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection utility: prints the formatted physical plan for the
  * named queries (or a summary line for all) so shuffle/broadcast/pushdown
  * regressions are visible. `runMain graft.Explain [sfDir] [query...]`.
  */
object Explain {
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
        val plan = try fn(spark, sfDir).queryExecution.executedPlan.toString
        catch { case e: Throwable => s"ERROR: ${e.getMessage}" }
        // Cached subtrees print their whole child plan at EVERY
        // InMemoryTableScan reference, so a raw substring count
        // multiplies shared subplans. plan_ids are stable across those
        // reprints — count distinct ids (execution runs each once).
        def distinctIds(kind: String): Int =
          (kind + "[^\\n]*?\\[plan_id=(\\d+)\\]").r
            .findAllMatchIn(plan).map(_.group(1)).toSet.size
        val shuffles = distinctIds("Exchange hashpartitioning")
        val bcast = distinctIds("BroadcastExchange")
        val smj = "SortMergeJoin".r.findAllIn(plan).size
        // toString marks codegen stages as "*(n)" prefixes, not the word
        // "WholeStageCodegen"; distinct ids = number of codegen spans.
        val wsc = "\\*\\((\\d+)\\)".r.findAllMatchIn(plan)
          .map(_.group(1)).toSet.size
        val pushed = "PushedFilters: \\[[^\\]]".r.findAllIn(plan).size
        println(f"PLAN $n%-28s shuffles=$shuffles bcastJoin=$bcast " +
          f"sortMergeJoin=$smj codegenSpans=$wsc pushedFilterScans=$pushed")
        if (args.length > 1) println(plan)
      }
    }
    spark.stop()
  }
}
