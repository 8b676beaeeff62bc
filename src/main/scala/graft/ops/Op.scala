package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator from SURVEY.md §2: a DataFrame implementation
  * plus (where SQL-expressible) an equivalent DuckDB oracle SQL over the
  * same parquet tables. The driver hash-compares the two at sf0.01.
  *
  * Determinism contract (SURVEY.md §7.4): no `monotonically_increasing_id`,
  * surrogate keys via `row_number` over an explicit natural-key total order
  * mirrored in the oracle, explicit NULLS FIRST/LAST on every window order
  * (Spark defaults NULLS FIRST for ASC, DuckDB defaults NULLS LAST).
  */
final case class Op(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

trait OpGroup {
  def ops: Seq[Op]
}
