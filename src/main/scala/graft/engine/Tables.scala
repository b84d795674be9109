package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}

/** Readers for the driver's parquet fixture tables (TESTDATA.md).
  *
  * Every engine query is a declarative DataFrame plan over these scans, so
  * Catalyst applies column pruning and predicate pushdown into the vectorized
  * parquet reader automatically (visible as `ReadSchema`/`PushedFilters` in
  * `.explain("formatted")`). Nothing here assumes local mode: on a cluster the
  * same reader handles a multi-file partitioned table, and
  * `spark.sql.files.maxPartitionBytes` governs split sizing.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's schema converter
    * rejects (SPARK-40819). The session must be built with
    * `spark.sql.legacy.parquet.nanosAsLong=true` (see [[Sessions.local]]) so
    * the scan yields a raw nanosecond long, converted to microsecond
    * precision here — downstream plans see a normal `TimestampType` column.
    * Integer `div` avoids the double-precision loss a plain `/` would
    * introduce on ~1.7e18 nanosecond epochs. */
  def events(s: SparkSession, d: String): DataFrame =
    table(s, d, "events").withColumn("ts", timestamp_micros(expr("ts div 1000")))
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
