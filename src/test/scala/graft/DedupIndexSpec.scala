package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Dedup, Indexes}

/** Indexed text-dedup paths must be output-identical to the inline
  * operators they replace — candidates, refined pairs, and simhash
  * near-dups all served from the materialized derived tables. */
class DedupIndexSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"
  private def docs = graft.engine.Tables.documents(spark, sf)

  test("indexed MinHash candidates == inline lshCandidatePairs") {
    val (_, bands) = Indexes.ensureMinhashIndex(spark, docs, sf)
    val indexed = Indexes.minhashCandidatePairsIndexed(spark, bands)
      .as[(Long, Long)].collect().toSet
    val inline = Dedup.lshCandidatePairs(docs)
      .as[(Long, Long)].collect().toSet
    assert(indexed === inline)
    assert(inline.nonEmpty)
  }

  test("indexed near-dups == inline nearDupPairs, jaccard-exact") {
    val (sets, bands) = Indexes.ensureMinhashIndex(spark, docs, sf)
    val indexed = Indexes.minhashNearDupsIndexed(spark, sets, bands, 0.3)
      .as[(Long, Long, Double)].collect().toSet
    val inline = Dedup.nearDupPairs(docs, 0.3)
      .as[(Long, Long, Double)].collect().toSet
    assert(indexed === inline)
  }

  test("indexed containment pairs == inline; tombstoned == rebuild-on-survivors") {
    import org.apache.spark.sql.functions.col
    val (sets, _) = Indexes.ensureMinhashIndex(spark, docs, sf)
    val indexed = Indexes.containmentPairsIndexed(spark, sets)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val inline = Dedup.containmentPairs(docs)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(indexed === inline)
    assert(inline.nonEmpty, "fixture must contain containment pairs")
    // the delete lifecycle, inherited: tombstone one paired doc on a
    // MANAGED copy of the store; the indexed result must equal a rebuild
    // over the survivors (write-once fixture generations are never
    // tombstoned — the family contract)
    val dead = inline.head._1
    val managed = java.nio.file.Files
      .createTempDirectory("cont_del").toString + "/idx"
    spark.read.parquet(sets).write.parquet(s"$managed/sets")
    Indexes.tombstoneMinhashIndex(spark, s"$managed/sets",
      Seq(dead).toDF("doc_id"))
    val got = Indexes.containmentPairsIndexed(spark, s"$managed/sets")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val want = Dedup.containmentPairs(docs.where(col("doc_id") =!= dead))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got === want)
    assert(!got.exists(p => p._1 == dead || p._2 == dead))
  }

  test("incremental containment: cloned batch finds its originals from the store") {
    import org.apache.spark.sql.functions.col
    val (sets, _) = Indexes.ensureMinhashIndex(spark, docs, sf)
    val newBatch = docs.where(col("source") === "src0")
      .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
    val got = Indexes.containmentIncremental(spark, newBatch, sets)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got.nonEmpty, "clones must surface containment pairs")
    assert(got.forall(p => p._1 >= 100000L && p._2 < 100000L),
      "pairs are strictly cross (new x corpus)")
    // an exact clone pair has full bidirectional containment
    val selfPairs = got.filter(p => p._1 - 100000L == p._2)
    assert(selfPairs.nonEmpty)
    assert(selfPairs.forall(p => p._4 == 1000000L && p._5 == 1000000L))
  }

  test("indexed simhash near-dups == inline simhashNearDups") {
    val idx = Indexes.ensureSimhashIndex(spark, docs, sf)
    val indexed = Indexes.simhashNearDupsIndexed(spark, idx)
      .as[(Long, Long, Int)].collect().toSet
    val inline = Dedup.simhashNearDups(docs)
      .as[(Long, Long, Int)].collect().toSet
    assert(indexed === inline)
  }

  test("incremental near-dups == inline near-dups over the union (crossing pairs)") {
    import org.apache.spark.sql.functions._
    val (sets, bands) = Indexes.ensureMinhashIndex(spark, docs, sf)
    val newBatch = docs.where(col("source") === "src0")
      .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
    val inc = Indexes.minhashNearDupsIncremental(spark, newBatch, sets, bands, 0.3)
      .as[(Long, Long, Double)].collect().toSet
    // ground truth: inline near-dups over corpus ∪ batch, batch-vs-corpus
    // pairs only (new ids sort above every corpus id)
    val union = docs.select(col("doc_id"), col("text")).unionByName(newBatch)
    val inline = graft.ops.Dedup.nearDupPairs(union, 0.3)
      .where(col("doc_b") >= 100000L && col("doc_a") < 100000L)
      .select(col("doc_b"), col("doc_a"), col("jaccard"))
      .as[(Long, Long, Double)].collect().toSet
    assert(inc === inline)
    assert(inc.nonEmpty, "every re-ingested doc must at least match its original")
  }

  test("indexed simhash signature table == inline Dedup.simhash") {
    val idx = Indexes.ensureSimhashIndex(spark, docs, sf)
    val indexed = spark.read.parquet(idx)
      .select("doc_id", "simhash").as[(Long, Long)].collect().toSet
    val inline = Dedup.simhash(docs)
      .select("doc_id", "simhash").as[(Long, Long)].collect().toSet
    assert(indexed === inline)
    assert(inline.nonEmpty)
  }
}
