package graft.ops

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-(session, sfDir) DataFrame memoizer.
  *
  * Spark's cache manager matches *canonicalized plans*, which works for
  * pure-DataFrame pipelines but not for plans containing an RDD scan
  * (e.g. the zipWithIndex surrogate-key stage): every build yields a new
  * `LogicalRDD`, so a second `Stage.build` would recompute the world.
  * Returning the same DataFrame instance makes every downstream query
  * share one plan — and therefore one cache entry.
  */
object Memo {
  private val store = new ConcurrentHashMap[String, DataFrame]()

  def of(s: SparkSession, dir: String, tag: String)(
      build: => DataFrame): DataFrame =
    store.computeIfAbsent(
      s"${System.identityHashCode(s)}|$dir|$tag", _ => build)
}
