package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Scalable deterministic surrogate keys (SURVEY.md §7.4.1).
  *
  * `ROW_NUMBER() OVER (ORDER BY …)` with no partition moves every row to
  * ONE partition — fine for dimension tables, fatal for a 100 TB fact.
  * This assigns the identical numbering with a range-repartitioned sort
  * (each partition holds a contiguous key range) + `zipWithIndex` (which
  * runs one lightweight count job over the first N-1 partitions to
  * compute offsets). Rows that tie on the full sort key are bit-identical
  * rows in our fact (the key includes every distinguishing column), so
  * their relative numbering is immaterial.
  */
object SurrogateKeys {

  def withGlobalRowNumber(df: DataFrame, keyName: String,
      order: Seq[Column]): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(order: _*).sortWithinPartitions(order: _*)
    val schema = sorted.schema.add(keyName, LongType, nullable = false)
    // zipWithIndex launches an offset-count job over partitions 0..N-2
    // before the real pass — without a persist the range sort executes
    // twice. Rows must be copied before caching (the scan reuses one
    // UnsafeRow per partition).
    val sortedRdd = sorted.queryExecution.toRdd.map(_.copy())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Stay on InternalRow — boxing 800k+ wide rows through the public Row
    // API costs more than the numbering itself. JoinedRow reuse follows
    // the standard per-partition iterator contract (consumers copy when
    // they buffer).
    val internal = sortedRdd.zipWithIndex()
      .mapPartitions { it =>
        val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
        val idxRow = new org.apache.spark.sql.catalyst.expressions
          .GenericInternalRow(1)
        it.map { case (row, idx) =>
          idxRow.setLong(0, idx + 1L)
          joined(row, idxRow)
            : org.apache.spark.sql.catalyst.InternalRow
        }
      }
    org.apache.spark.sql.GraftSqlBridge
      .internalCreateDataFrame(spark, internal, schema)
  }
}
