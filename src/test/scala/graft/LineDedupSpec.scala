package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Decontamination, LineDedup}

/** Round-7 operators: cross-document line dedup (boilerplate removal) and
  * windowed min-overlap decontamination. */
class LineDedupSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  // "cookie notice" repeats in 3 of 4 docs; every doc keeps its own body.
  private lazy val docs = Seq(
    (1L, "cookie notice\nunique body one\nmore text one"),
    (2L, "cookie notice\nunique body two"),
    (3L, "cookie notice\nunique body three"),
    (4L, "only original content here")
  ).toDF("doc_id", "text")

  test("boilerplate = lines in more than maxDocFreq distinct docs") {
    val boiler = LineDedup.boilerplateLines(docs, maxDocFreq = 2)
      .as[String].collect().toSet
    assert(boiler === Set(
      org.apache.commons.codec.digest.DigestUtils.md5Hex("cookie notice")))
    // threshold is strict: at maxDocFreq = 3 nothing is boilerplate
    assert(LineDedup.boilerplateLines(docs, maxDocFreq = 3).count() === 0L)
  }

  test("audit counts and fingerprint, incl. the all-boilerplate doc") {
    val all = docs.union(Seq((5L, "cookie notice")).toDF("doc_id", "text"))
    val a = LineDedup.audit(all, maxDocFreq = 2)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(a(1L)._1 === 3L && a(1L)._2 === 2L)
    assert(a(4L) === ((1L, 1L,
      org.apache.commons.codec.digest.DigestUtils.md5Hex(
        org.apache.commons.codec.digest.DigestUtils.md5Hex(
          "only original content here")))))
    // fully-boilerplate doc stays in the audit with the md5('') fixed point
    assert(a(5L) === ((1L, 0L,
      org.apache.commons.codec.digest.DigestUtils.md5Hex(""))))
    // fingerprint is position-ordered surviving hashes, comma-joined
    val md5 = org.apache.commons.codec.digest.DigestUtils.md5Hex(_: String)
    assert(a(1L)._3 === md5(Seq("unique body one", "more text one")
      .map(md5).mkString(",")))
  }

  test("cleanDocs drops boilerplate, keeps order, and agrees with audit") {
    val all = docs.union(Seq((5L, "cookie notice")).toDF("doc_id", "text"))
    val clean = LineDedup.cleanDocs(all, maxDocFreq = 2)
      .as[(Long, String)].collect().toMap
    assert(clean(1L) === "unique body one\nmore text one")
    assert(clean(4L) === "only original content here")
    assert(clean(5L) === "")
    val audited = LineDedup.audit(all, maxDocFreq = 2)
      .select(col("doc_id"), col("n_kept")).as[(Long, Long)].collect().toMap
    clean.foreach { case (id, t) =>
      val kept = if (t.isEmpty) 0L else t.split("\n", -1).length.toLong
      assert(kept === audited(id), s"doc $id")
    }
  }

  test("decision path shuffles hashes only; AQE promotes the boilerplate join") {
    // The boilerplate join carries no broadcast HINT (a small-maxDocFreq run
    // over a big corpus makes the set corpus-scale — see LineDedup scaladoc);
    // at test scale AQE must still promote the runtime-small frame to a
    // broadcast hash join. Execute first: the promotion only exists in the
    // FINAL adaptive plan.
    val q = graft.queries.PipelineQueries
      .lineDedup(spark, "/root/testdata/sf0.001")
    q.collect()
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"AQE did not promote the small boilerplate frame to a broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), p)
  }

  // ---- windowed decontamination --------------------------------------------

  test("windowed decontamination: 5 consecutive shared tokens flag, 4 do not") {
    val train = Seq(
      (1L, "aa bb cc dd ee ff gg"),    // shares the 5-run "bb cc dd ee ff"
      (2L, "xx bb cc dd ee yy zz"),    // shares only a 4-run "bb cc dd ee"
      (3L, "unrelated words entirely different here")
    ).toDF("doc_id", "text")
    val ev = Seq((100L, "bb cc dd ee ff qq rr")).toDF("doc_id", "text")
    val hits = Decontamination.contaminatedDocsWindowed(train, ev, windowN = 5)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(hits.keySet === Set(1L))
    assert(hits(1L) === 1L, "exactly one shared 5-token window")
  }

  test("windowed hits equal the exact 5-gram overlap join on real data") {
    val d = "/root/testdata/sf0.001"
    val docs = graft.engine.Tables.documents(spark, d)
    val exact = Decontamination.contaminatedDocs(
        docs.where(col("source") =!= "src0"),
        docs.where(col("source") === "src0"), shingleN = 5)
      .as[(Long, Long, Long)].collect().toSet
    val windowed = graft.queries.PipelineQueries.windowDecontaminate(spark, d)
      .as[(Long, Long, Long)].collect().toSet
    assert(windowed === exact,
      "bloom prefilter + exact confirm must be transparent")
    assert(windowed.nonEmpty, "fixture must exercise the operator")
  }

  test("windowed decontamination: the bloom bitset is the ONLY broadcast") {
    val p = graft.queries.PipelineQueries
      .windowDecontaminate(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(p.contains("xxhash64"), "bloom bit test missing from the plan")
    assert(!p.contains("BroadcastExchange"),
      s"confirm join must stay shuffle_hash — eval side does not broadcast at scale:\n$p")
    assert(p.contains("ShuffledHashJoin"), p)
    // train side serves from the materialized shingle table: the scan reads
    // the index, and no tokenization (regex split) touches the train path
    assert(p.contains("shingles_n5"),
      s"train windows must come from the materialized shingle index:\n$p")
  }
}
