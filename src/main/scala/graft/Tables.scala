package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the harness parquet tables (TESTDATA.md / FIXTURES.md §B).
  *
  * All operator queries read from a scale-factor directory passed by the
  * driver (`/root/testdata/sf{0.001,0.01,0.1}`); nothing is hard-coded to a
  * single scale. Reads are plain parquet scans so Catalyst pushes filters
  * and prunes columns down to the file source.
  */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.parquet carries TIMESTAMP(NANOS) which Spark 4 only reads as
    // LongType behind this legacy flag; DuckDB truncates the same value to
    // micros, so we mirror that with integer division (no double rounding).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else df
  }

  /** Register every table as a temp view (SURVEY.md §2.1 S1/S2: the
    * reference's `CREATE DATABASE`/`USE` namespaces map to catalog views).
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
