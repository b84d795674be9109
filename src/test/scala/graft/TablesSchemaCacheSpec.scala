package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.engine.Tables.parquetCached]] — the schema-inference memo must
  * (a) return exactly the inferred schema and the same rows as a plain
  * read, (b) re-infer when the directory is REWRITTEN with a different
  * schema (the (path, mtime, len) key rotates), and (c) fall through to
  * the plain reader's error on a missing path. */
class TablesSchemaCacheSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmpDir(): java.io.File = {
    val f = java.nio.file.Files.createTempDirectory("graft_schema_cache").toFile
    f.deleteOnExit(); f
  }

  test("cached read matches plain read (schema and rows)") {
    val dir = new java.io.File(tmpDir(), "t.parquet").getAbsolutePath
    Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .write.mode("overwrite").parquet(dir)
    val plain = spark.read.parquet(dir)
    val cached = graft.engine.Tables.parquetCached(spark, dir)
    assert(cached.schema === plain.schema)
    assert(cached.orderBy("id").collect().toSeq ===
      plain.orderBy("id").collect().toSeq)
  }

  test("rewriting the path with a different schema re-infers") {
    val dir = new java.io.File(tmpDir(), "t.parquet").getAbsolutePath
    Seq((1L, "a")).toDF("id", "s").write.mode("overwrite").parquet(dir)
    assert(graft.engine.Tables.parquetCached(spark, dir)
      .schema.fieldNames.toSeq === Seq("id", "s"))
    Thread.sleep(5) // ensure the dir mtime moves past ms granularity
    Seq((1L, 2.5, true)).toDF("id", "x", "flag")
      .write.mode("overwrite").parquet(dir)
    val after = graft.engine.Tables.parquetCached(spark, dir)
    assert(after.schema.fieldNames.toSeq === Seq("id", "x", "flag"),
      "memo served a stale schema after the directory was rewritten")
    assert(after.select(sum(when(col("flag"), 1).otherwise(0)))
      .head().getLong(0) === 1L)
  }

  test("missing path fails like the plain reader") {
    val dir = new java.io.File(tmpDir(), "absent.parquet").getAbsolutePath
    intercept[org.apache.spark.sql.AnalysisException] {
      graft.engine.Tables.parquetCached(spark, dir).count()
    }
  }
}
