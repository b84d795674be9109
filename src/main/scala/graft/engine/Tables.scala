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
  /** Schema memo for the immutable fixture tables, keyed by (path, dir
    * mtime, dir length) so a regenerated fixture re-infers. Plain
    * `spark.read.parquet` re-reads footers for schema inference on every
    * DataFrame CONSTRUCTION — ~30 ms of driver-side metadata work per
    * table per query build, which a production deployment gets from the
    * catalog instead (guide §5: the driver should do almost no data
    * work). Caching the schema only skips that inference; every
    * execution still scans the parquet data itself (r20 OPT). */
  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.types.StructType]()

  /** `spark.read.parquet(path)` with the schema-inference memo above —
    * shared by [[table]] and the committed-store readers (indexes,
    * centroids, graph edges), whose write-once dirs make the (path,
    * mtime, len) key rotate exactly when the data does. The inferred
    * schema INCLUDES discovered partition columns, so pinned reads of
    * partitioned stores resolve identically; appends inside partition
    * subdirs don't move the base-dir mtime, but store writers pin their
    * schemas (format-versioned paths rotate on evolution), so reuse
    * stays sound. */
  def parquetCached(spark: SparkSession, path: String): DataFrame = {
    val key = try {
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
      val st = fs.getFileStatus(new org.apache.hadoop.fs.Path(path))
      s"$path@${st.getModificationTime}:${st.getLen}"
    } catch { case _: java.io.IOException | _: java.net.URISyntaxException |
                   _: IllegalArgumentException =>
      null // missing/odd path: fall through to the plain reader's error
    }
    if (key == null) spark.read.parquet(path)
    else {
      // run-scoped paths (durable stage dirs) mint fresh keys forever —
      // bound the memo so a long-lived session cannot leak
      if (schemaCache.size() > 4096) schemaCache.clear()
      spark.read.schema(
        schemaCache.computeIfAbsent(key, _ => spark.read.parquet(path).schema))
        .parquet(path)
    }
  }

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    parquetCached(spark, s"$sfDir/$name.parquet")

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
