package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bucketing = pre-shuffling at write time: two tables bucketed by the same
  * key into the same bucket count join WITHOUT any runtime Exchange — the
  * 100 TB recipe for repeated fact-fact joins (shuffle once on write, never
  * again on read). */
class BucketingSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  test("bucketed-by-key tables join with zero exchanges") {
    val docs = graft.engine.Tables.documents(spark, "/root/testdata/sf0.001")
    docs.select("doc_id", "lang").write
      .bucketBy(8, "doc_id").sortBy("doc_id")
      .mode("overwrite").saveAsTable("bkt_a")
    docs.select("doc_id", "n_chars").write
      .bucketBy(8, "doc_id").sortBy("doc_id")
      .mode("overwrite").saveAsTable("bkt_b")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // Disable broadcast so the join would NEED a shuffle — unless
      // bucketing already co-located it.
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("bkt_a").join(spark.table("bkt_b"), "doc_id")
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      assert(plan.contains("Bucketed: true"))
      assert(j.count() == docs.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }
}
