package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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
  /** The fixture's `events.ts` column has shipped in two physical shapes:
    * parquet TIMESTAMP(NANOS), which Spark's schema converter rejects
    * (SPARK-40819) and — under `spark.sql.legacy.parquet.nanosAsLong=true`
    * (see [[Sessions.local]]) — scans as a raw nanosecond long; and plain
    * TIMESTAMP(MICROS), which scans as `TIMESTAMP_NTZ`. Branching on the
    * *scanned* schema makes every downstream plan see one canonical
    * session-TZ `TimestampType` column regardless of which fixture
    * generation wrote the file, so a driver-side regeneration can't break
    * the event queries again. The session timezone is pinned to UTC
    * ([[Sessions.local]]), so the NTZ→TZ cast is a pure type relabel that
    * matches how the DuckDB oracle reads the same naive microsecond values.
    * Integer `div` (not `/`) avoids double-precision loss on ~1.7e18
    * nanosecond epochs in the long branch. */
  def normalizeEventTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType =>
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    case TimestampNTZType | TimestampType =>
      df.withColumn("ts", col("ts").cast(TimestampType))
    case other =>
      throw new IllegalStateException(
        s"events.ts has unsupported physical type $other — expected a raw " +
          "nanosecond LONG (legacy nanos fixture) or TIMESTAMP/TIMESTAMP_NTZ")
  }

  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventTs(table(s, d, "events"))
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
