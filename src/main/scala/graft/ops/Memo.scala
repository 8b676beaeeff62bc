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

  /** Memoized builds nest (e.g. the band table builds the shingle table),
    * so this must NOT use computeIfAbsent: a recursive update of the same
    * map throws IllegalStateException whenever the two keys share a hash
    * bin. get + putIfAbsent is reentrant; a concurrent duplicate build is
    * harmless (identical plans share one cache entry anyway).
    */
  def of(s: SparkSession, dir: String, tag: String)(
      build: => DataFrame): DataFrame = {
    val key = s"${System.identityHashCode(s)}|$dir|$tag"
    val existing = store.get(key)
    if (existing != null) existing
    else {
      val built = build
      val prev = store.putIfAbsent(key, built)
      if (prev != null) prev else built
    }
  }
}
