package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the round-7 corpus operators: the invariants must
  * hold for ARBITRARY small corpora, not just the planted unit fixtures.
  * Same fixed-seed convention as BloomPropertySpec (no
  * scalatest-scalacheck bridge in the offline cache), so failures are
  * reproducible. */
class CorpusPropertySpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  // small vocab so lines and windows repeat across documents naturally
  private val word = Gen.oneOf("aa", "bb", "cc", "dd", "ee")
  private val line: Gen[String] =
    Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
  private val doc: Gen[String] =
    Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, line)).map(_.mkString("\n"))
  private def corpus(seed: Long): Seq[(Long, String)] = {
    val n = sample(Gen.choose(3, 12), seed)
    (0L until n.toLong).map(i => i -> sample(doc, seed * 1000 + i))
  }

  test("line dedup: audit/cleanDocs agree; boilerplate shrinks as the bar rises") {
    for (seed <- 1L to 5L) {
      val docs = corpus(seed).toDF("doc_id", "text")
      for (maxDf <- Seq(1L, 2L)) {
        val audit = graft.ops.LineDedup.audit(docs, maxDf)
          .as[(Long, Long, Long, String)].collect()
          .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
        val clean = graft.ops.LineDedup.cleanDocs(docs, maxDf)
          .as[(Long, String)].collect().toMap
        assert(audit.keySet === clean.keySet)
        audit.foreach { case (id, (nLines, nKept, fp)) =>
          assert(nKept <= nLines, s"seed=$seed doc=$id")
          val cleanLines =
            if (clean(id).isEmpty) 0L else clean(id).split("\n", -1).length.toLong
          assert(cleanLines === nKept, s"seed=$seed doc=$id")
          if (nKept == 0L)
            assert(fp === org.apache.commons.codec.digest.DigestUtils.md5Hex(""))
        }
      }
      val loose = graft.ops.LineDedup.boilerplateLines(docs, 1L)
        .as[String].collect().toSet
      val strict = graft.ops.LineDedup.boilerplateLines(docs, 2L)
        .as[String].collect().toSet
      assert(strict.subsetOf(loose),
        s"seed=$seed: raising maxDocFreq must only shrink the boilerplate set")
    }
  }

  test("duplicated spans: disjoint, in-bounds, >= k tokens, dup-doc coverage") {
    for (seed <- 10L to 14L) {
      // force at least one exact duplicate pair so spans exist
      val base = corpus(seed).map { case (i, t) => (i, t.replace("\n", " ")) }
      val docs = (base :+ (900L, base.head._2)).toDF("doc_id", "text")
      val k = 3
      val spans = graft.ops.Dedup.duplicatedSpans(docs, k)
        .as[(Long, Long, Long, Long)].collect()
      val tokens = base.map { case (i, t) =>
        i -> t.split("\\s+").length.toLong }.toMap + (900L ->
        base.head._2.split("\\s+").length.toLong)
      spans.foreach { case (id, st, en, nw) =>
        assert(st >= 0 && en < tokens(id), s"seed=$seed doc=$id span [$st,$en]")
        assert(en - st + 1 >= k, s"seed=$seed doc=$id span shorter than a window")
        // a span holds between 1 and (len - k + 1) duplicated windows:
        // gapped merges keep coverage but not every interior window
        assert(nw >= 1 && nw <= en - st + 1 - (k - 1),
          s"seed=$seed doc=$id window count $nw out of range")
      }
      spans.groupBy(_._1).foreach { case (id, ss) =>
        val sorted = ss.sortBy(_._2)
        sorted.sliding(2).foreach {
          case Array((_, _, e1, _), (_, s2, _, _)) =>
            assert(e1 + 1 < s2,
              s"seed=$seed doc=$id spans must be separated by >= 1 token")
          case _ =>
        }
      }
      // the duplicated pair is fully covered iff it has >= k tokens
      if (tokens(900L) >= k) {
        val cover = spans.filter(_._1 == 900L).map(s => s._3 - s._2 + 1).sum
        assert(cover === tokens(900L),
          s"seed=$seed: an exact dup doc must be wholly duplicated")
      }
    }
  }

  test("survivor election: one winner per component, max (priority, -id)") {
    for (seed <- 30L to 33L) {
      // flatten newlines so near-dup pairs arise from shared 2-word lines
      val docs = corpus(seed).map { case (i, t) => (i, t.replace("\n", " ")) }
        .toDF("doc_id", "text")
      val pairs = graft.ops.Dedup.nearDupPairs(docs, 0.5).select("doc_a", "doc_b")
      val kept = graft.ops.Dedup.survivorsBy(docs, pairs,
          org.apache.spark.sql.functions.length(col("text")))
        .select("doc_id").as[Long].collect().toSet
      val comp = graft.ops.Dedup.connectedComponents(pairs)
        .as[(Long, Long)].collect()
      val lens = docs.select(col("doc_id"),
          org.apache.spark.sql.functions.length(col("text")))
        .as[(Long, Int)].collect().toMap
      val clustered = comp.map(_._1).toSet
      // singletons always survive
      val singles = lens.keySet -- clustered
      assert(singles.subsetOf(kept), s"seed=$seed: singletons must survive")
      // exactly one survivor per component: the (maxLen, minId) member
      comp.groupBy(_._2).foreach { case (rep, members) =>
        val ids = members.map(_._1)
        val winner = ids.maxBy(id => (lens(id), -id))
        assert(ids.toSet.intersect(kept) === Set(winner),
          s"seed=$seed rep=$rep: expected winner $winner of ${ids.toSeq}")
      }
    }
  }

  test("pack spans: chained offsets, bin order, whole-stream conservation") {
    for (seed <- 20L to 23L) {
      val docs = corpus(seed)
        .map { case (i, t) => (i, if (i % 2 == 0) "s0" else "s1", t.replace("\n", " ")) }
        .toDF("doc_id", "source", "text")
      val cap = 7
      val spans = graft.ops.Curation.packSpans(docs, cap)
        .orderBy(col("source"), col("doc_id"))
        .as[(String, Long, Long, Long, Long, Long)].collect()
      spans.groupBy(_._1).foreach { case (src, ss) =>
        var cum = 0L
        ss.foreach { case (_, _, id, toks, startBin, endBin) =>
          assert(startBin === cum / cap, s"seed=$seed $src doc=$id start bin")
          assert(endBin === (cum + toks - 1) / cap, s"seed=$seed $src doc=$id end bin")
          assert(startBin <= endBin)
          cum += toks
        }
      }
    }
  }
}
