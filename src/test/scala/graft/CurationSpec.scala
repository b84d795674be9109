package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Curation

class CurationSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("hash split: deterministic, exhaustive, roughly proportional") {
    val ids = (0L until 1000L).toDF("doc_id")
    val w = Seq("train" -> 90, "val" -> 5, "test" -> 5)
    val got = ids.select(col("doc_id"), Curation.splitLabel(col("doc_id"), w).as("s"))
      .as[(Long, String)].collect().toMap
    assert(got.size === 1000)
    val counts = got.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts.keySet === Set("train", "val", "test"))
    assert(counts("train") > 800 && counts("train") < 950) // md5 is uniform-ish
    // stable: recomputing yields the identical assignment
    val again = ids.select(col("doc_id"), Curation.splitLabel(col("doc_id"), w).as("s"))
      .as[(Long, String)].collect().toMap
    assert(again === got)
    // growth never reshuffles: the first 1000 keep their labels in a bigger set
    val grown = (0L until 2000L).toDF("doc_id")
      .select(col("doc_id"), Curation.splitLabel(col("doc_id"), w).as("s"))
      .as[(Long, String)].collect().toMap
    assert(got.forall { case (id, s) => grown(id) == s })
  }

  test("hash split: weights must sum to 100") {
    intercept[IllegalArgumentException] {
      Curation.splitLabel(col("doc_id"), Seq("a" -> 50, "b" -> 40))
    }
  }

  test("PII scrub: plants are redacted, clean text untouched, NULL safe") {
    val docs = Seq(
      (0L, "s1", "contact me at jan.kowalski+spam@example.co.uk for details"),
      (1L, "s1", "call +48 123 456-789 or 22 555 1234 today"),
      (2L, "s1", "no pii here at all"),
      (3L, "s2", null.asInstanceOf[String]),
      (4L, "s2", "two mails: a@b.io and c.d@e-f.org")
    ).toDF("doc_id", "source", "text")
    val scrubbed = docs.select(col("doc_id"), Curation.scrubPii(col("text")).as("s"))
      .as[(Long, String)].collect().toMap
    assert(scrubbed(0L) === "contact me at <EMAIL> for details")
    assert(scrubbed(1L).contains("<PHONE>"))
    assert(scrubbed(2L) === "no pii here at all")
    assert(scrubbed(3L) === "")
    assert(scrubbed(4L) === "two mails: <EMAIL> and <EMAIL>")
    val audit = Curation.piiAudit(docs).orderBy("source").collect()
    val s1 = audit(0)
    assert(s1.getAs[Long]("docs_with_email") === 1L)
    assert(s1.getAs[Long]("docs_with_phone") === 1L)
    val s2 = audit(1)
    assert(s2.getAs[Long]("docs_with_email") === 1L)
  }

  test("packing: bins fill in doc_id order per source, counts add up") {
    // 10-token docs, capacity 25 → first-token bins: 0,0,0 (cum 0,10,20),
    // then 1,1 (cum 30,40), then 2 (cum 50)...
    val docs = (0L until 6L).map(i => (i, "s", ("w " * 10).trim)).toDF("doc_id", "source", "text")
    val bins = Curation.packBins(docs, capacity = 25)
      .orderBy("bin_id").as[(String, Long, Long, Long, Long)].collect()
    assert(bins.toSeq === Seq(("s", 0L, 0L, 3L, 30L), ("s", 0L, 1L, 2L, 20L), ("s", 0L, 2L, 1L, 10L)))
    // total docs/tokens conserved
    assert(bins.map(_._4).sum === 6L)
    assert(bins.map(_._5).sum === 60L)
  }

  test("packing: independent per source (window never crosses sources)") {
    val docs = Seq((0L, "a", "x y z"), (1L, "b", "x y z"), (2L, "a", "x y z"))
      .toDF("doc_id", "source", "text")
    val bins = Curation.packBins(docs, capacity = 4)
      .orderBy("source", "bin_id").as[(String, Long, Long, Long, Long)].collect().toSeq
    // each source restarts at bin 0: a has docs at cum 0 and 3 (both bin 0), b at cum 0
    assert(bins === Seq(("a", 0L, 0L, 2L, 6L), ("b", 0L, 0L, 1L, 3L)))
  }

  test("reservoir: exactly k per source, deterministic, rank-stable under growth") {
    val docs = (0L until 40L).map(i => (i, s"src${i % 2}", s"doc $i")).toDF("doc_id", "source", "text")
    val s1 = Curation.reservoirPerSource(docs, k = 5)
      .as[(String, Long, String)].collect().toSeq.sorted
    // exactly k per group, and a rerun picks the identical rows (no RNG)
    assert(s1.groupBy(_._1).view.mapValues(_.size).toMap === Map("src0" -> 5, "src1" -> 5))
    val s2 = Curation.reservoirPerSource(docs, k = 5)
      .as[(String, Long, String)].collect().toSeq.sorted
    assert(s2 === s1)
    // a group smaller than k is kept whole
    val tiny = Seq((1L, "only", "x"), (2L, "only", "y")).toDF("doc_id", "source", "text")
    assert(Curation.reservoirPerSource(tiny, k = 5).count() === 2)
    // growing the corpus only evicts at the rank boundary: survivors of the
    // grown sample that existed before must be a subset of the old sample
    val grown = (0L until 80L).map(i => (i, s"src${i % 2}", s"doc $i")).toDF("doc_id", "source", "text")
    val s3 = Curation.reservoirPerSource(grown, k = 5)
      .as[(String, Long, String)].collect().toSeq
    val oldIds = s1.map(_._2).toSet
    val surviving = s3.filter(_._2 < 40L).map(_._2).toSet
    assert(surviving.subsetOf(oldIds),
      s"grown sample re-ranked pre-existing docs: ${surviving -- oldIds}")
  }

  test("chunking: window/stride coverage, trailing short chunk, one tokenize") {
    // 10 tokens, window 4, stride 3 → starts 0,3,6,9; last chunk 1 token
    val docs = Seq((1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"), (2L, "solo"))
      .toDF("doc_id", "text")
    val got = Curation.chunkDocuments(docs, window = 4, stride = 3)
      .orderBy(col("doc_id"), col("chunk_id"))
      .as[(Long, Long, Int, String)].collect()
    val d1 = got.filter(_._1 == 1L)
    assert(d1.map(_._2).toSeq === Seq(0L, 1L, 2L, 3L))
    assert(d1.map(_._3).toSeq === Seq(4, 4, 4, 1))
    def h(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(d1.head._4 === h("t0 t1 t2 t3"))
    assert(d1.last._4 === h("t9"))
    assert(got.filter(_._1 == 2L).toSeq === Seq((2L, 0L, 1, h("solo"))))
    // the third-Generate-trap guard: tokenization must run ONCE per doc,
    // below the Generate — a hoisted projection would re-split per chunk.
    // Parquet-backed frame: a local Seq constant-folds split() away
    // (ConvertToLocalRelation) and leaves nothing to assert on.
    val real = graft.engine.Tables.documents(spark, "/root/testdata/sf0.001")
    val plan = Curation.chunkDocuments(real, 4, 3)
      .queryExecution.executedPlan.toString
    assert("split\\(".r.findAllIn(plan).size === 1, plan.take(1500))
    val genIdx = plan.indexOf("Generate")
    val splitIdx = plan.indexOf("split(")
    assert(genIdx >= 0 && splitIdx > genIdx,
      "split() must appear in the child (printed below/after Generate)")
  }

  test("training-shard writer: split dirs, record caps, clustered, lossless") {
    val docs = (0L until 500L).map(i => (i, s"doc $i text")).toDF("doc_id", "text")
    val w = Seq("train" -> 80, "val" -> 20)
    val out = java.nio.file.Files.createTempDirectory("graft_shards").toString
    try {
      Curation.writeTrainingShards(docs, out, w, maxRecordsPerFile = 50L)
      val back = spark.read.parquet(out)
      // lossless and split-faithful: read-back equals input + its label
      val expected = docs.select(col("doc_id"),
        Curation.splitLabel(col("doc_id"), w).as("split")).as[(Long, String)].collect().toSet
      assert(back.select(col("doc_id"), col("split").cast("string"))
        .as[(Long, String)].collect().toSet === expected)
      // one directory per split, every data file within the record cap and
      // sorted by doc_id (the scan-locality contract)
      val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).sorted
      assert(dirs.toSeq === Seq("split=train", "split=val"))
      for (d <- dirs; f <- new java.io.File(s"$out/$d").listFiles()
           if f.getName.endsWith(".parquet")) {
        val ids = spark.read.parquet(f.getAbsolutePath)
          .select(col("doc_id")).as[Long].collect()
        assert(ids.length <= 50, s"${f.getName} exceeds the record cap")
        assert(ids.toSeq === ids.sorted.toSeq, s"${f.getName} not clustered")
      }
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(new java.io.File(out))
    }
  }

  test("token budget mix: fills in rank order, includes the boundary doc") {
    // every doc is 4 tokens; budget 10 → kept docs are the first 3 in rank
    // order (cum 4, 8, 12 — the 12 crosses the boundary and is included)
    val docs = (0L until 10L).map(i => (i, "a b c d", "srcX")).toDF("doc_id", "text", "source")
    val got = Curation.tokenBudgetMix(docs, Seq.empty, defaultBudget = 10L)
      .orderBy(col("cum_tokens"))
      .as[(String, Long, Long, Long)].collect()
    assert(got.length === 3)
    assert(got.map(_._4).toSeq === Seq(4L, 8L, 12L))
    // the kept set is the rank-order prefix: re-running the reservoir rank
    // over the same ids yields the same leading docs
    val rankOrder = docs.select(col("doc_id"),
        md5(concat_ws(":", col("source"), col("doc_id"))).as("rnk"))
      .orderBy(col("rnk")).as[(Long, String)].collect().map(_._1).take(3).toSet
    assert(got.map(_._2).toSet === rankOrder)
    // zero budget keeps nothing; a giant budget keeps everything
    assert(Curation.tokenBudgetMix(docs, Seq.empty, 0L).count() === 0)
    assert(Curation.tokenBudgetMix(docs, Seq.empty, 1000L).count() === 10)
    // per-source budgets apply independently
    val two = docs.union((100L until 110L).map(i => (i, "a b c d", "srcY"))
      .toDF("doc_id", "text", "source"))
    val bySource = Curation.tokenBudgetMix(two, Seq("srcY" -> 4L), 10L)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(bySource === Map("srcX" -> 3L, "srcY" -> 1L))
  }

  test("packing: bounded shards pack independently, bin ids restart per shard") {
    // 4 docs of 10 tokens in one source; shardDocs = 2 -> shards {0,1},
    // each packing its own 2 docs from cum 0 (cum 0 and 10 both land in
    // bin 0 at capacity 15) — bin ids restart per shard
    val docs = (0L until 4L).map(i => (i, "s", ("w " * 10).trim)).toDF("doc_id", "source", "text")
    val bins = Curation.packBins(docs, capacity = 15, shardDocs = 2L)
      .orderBy("shard_id", "bin_id").as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(bins === Seq(
      ("s", 0L, 0L, 2L, 20L), ("s", 1L, 0L, 2L, 20L)))
  }

  test("quality gate: sample-derived threshold is stable and actually cuts") {
    val docs = graft.engine.Tables.documents(spark, "/root/testdata/sf0.001")
    val t1 = Curation.qualityThreshold(docs)
    // determinism must hold across INDEPENDENT derivations — the memoized
    // entry point would make a repeat call tautologically equal
    val t2 = Curation.qualityThresholdUnmemoized(docs, 0.25, 200)
    assert(t1 === t2, "threshold must be deterministic (md5 sample, no RNG)")
    assert(t1 > 0.0 && t1 < 1.0)
    val total = docs.count()
    val kept = Curation.qualityGate(docs).count()
    assert(kept < total, "a p25 cut must drop something")
    assert(kept > total / 2, "a p25 cut must keep well over half")
    // every survivor clears the threshold
    val below = Curation.qualityGate(docs)
      .where(graft.ops.TextAnalysis.qualityScore(col("text")) < t1).count()
    assert(below === 0L)
  }

  test("packSpans: exact split-across-boundary ranges, agrees with packBins") {
    // 3 docs of 10 tokens at capacity 8: doc0 spans bins 0-1 (tokens 0-9),
    // doc1 bins 1-2 (10-19), doc2 bins 2-3 (20-29)
    val docs = (0L until 3L).map(i => (i, "s", ("w " * 10).trim)).toDF("doc_id", "source", "text")
    val spans = Curation.packSpans(docs, capacity = 8)
      .orderBy("doc_id").as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(spans === Seq(
      ("s", 0L, 0L, 10L, 0L, 1L),
      ("s", 0L, 1L, 10L, 1L, 2L),
      ("s", 0L, 2L, 10L, 2L, 3L)))
    // start_bin always equals packBins' whole-doc bin ownership
    val fixture = graft.engine.Tables.documents(spark, "/root/testdata/sf0.001")
    val own = Curation.packBins(fixture, capacity = 512, shardDocs = 100L)
    val sp = Curation.packSpans(fixture, capacity = 512, shardDocs = 100L)
    val ownTotal = own.agg(sum("bin_tokens")).as[Long].head()
    val spTotal = sp.agg(sum("tokens")).as[Long].head()
    assert(ownTotal === spTotal, "token conservation across the two layouts")
    val badSpan = sp.where(col("end_bin") < col("start_bin")).count()
    assert(badSpan === 0L)
    // every doc's starting bin matches the ownership layout's assignment:
    // both derive from the same cumsum, so the min start_bin per
    // (source, shard, bin) group must equal the group's bin id
    val joined = sp.join(own,
        sp("source") === own("source") && sp("shard_id") === own("shard_id") &&
          sp("start_bin") === own("bin_id"))
      .count()
    assert(joined === sp.count(), "every span's start bin exists in packBins")
  }

  test("weighted sample: deterministic, k per source, degenerates to identity") {
    val docs = (0L until 20L).map { i =>
      (i, ("w " * (i.toInt % 7 + 1)).trim, if (i < 10) "sA" else "sB")
    }.toDF("doc_id", "text", "source")
    val s1 = Curation.weightedSample(docs, k = 3).collect().toSet
    val s2 = Curation.weightedSample(docs, k = 3).collect().toSet
    assert(s1 === s2, "pure function of doc_id — identical across runs")
    val perSrc = s1.groupBy(_.getString(0)).map { case (k, v) => k -> v.size }
    assert(perSrc === Map("sA" -> 3, "sB" -> 3))
    // k ≥ stratum size returns the whole stratum
    assert(Curation.weightedSample(docs, k = 50).count() === 20L)
    // sampled ids come from the input
    assert(s1.map(_.getLong(1)).subsetOf((0L until 20L).toSet))
  }

  test("weighted sample: growing the corpus never flips surviving keys") {
    val mk = (n: Long) => (0L until n).map(i =>
      (i, "w w w", "s")).toDF("doc_id", "text", "source")
    val small = Curation.weightedSample(mk(10), k = 5)
      .collect().map(r => (r.getLong(1), r.getDouble(3))).toMap
    val big = Curation.weightedSample(mk(30), k = 5)
      .collect().map(r => (r.getLong(1), r.getDouble(3))).toMap
    // every doc surviving in BOTH samples kept its exact key
    big.keySet.intersect(small.keySet).foreach { id =>
      assert(small(id) === big(id), s"doc $id key changed with corpus growth")
    }
  }

  test("length outliers: zero-IQR uniform core flags exactly the tails") {
    val docs = (Seq.fill(8)(10) ++ Seq(1, 100)).zipWithIndex.map {
      case (toks, i) => (i.toLong, ("w " * toks).trim, "s")
    }.toDF("doc_id", "text", "source")
    // Q1 = Q3 = 10 → lo = hi = 10 at any fence: only 1 and 100 escape
    val out = Curation.lengthOutliers(docs)
      .collect().map(r => r.getLong(2)).sorted
    assert(out.toSeq === Seq(1L, 100L))
  }

  test("corpus diff: added/removed/changed/unchanged all classified") {
    val cur = Seq((1L, "same", "s"), (2L, "new text", "s"), (4L, "added", "s"))
      .toDF("doc_id", "text", "source")
    val prev = Seq((1L, "same", "s"), (2L, "old text", "s"), (3L, "gone", "s"))
      .toDF("doc_id", "text", "source")
    val got = Curation.corpusDiff(cur, prev)
      .collect().map(r => (r.getString(1), r.getLong(2))).toMap
    assert(got === Map("unchanged" -> 1L, "changed" -> 1L,
      "added" -> 1L, "removed" -> 1L))
  }

  test("length batching: sorted fill, hand-computed padding, conservation") {
    // lengths 1,2,3,4,5 in one source, batches of 2 (sorted order):
    // [1,2] pad 1, [3,4] pad 1, [5] pad 0
    val docs = (1 to 5).map(n => (n.toLong, ("w " * n).trim, "s"))
      .toDF("doc_id", "text", "source")
    val got = Curation.lengthBatches(docs, batchSize = 2)
      .orderBy("batch_id")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq === Seq((0L, 2L, 2L, 3L, 1L), (1L, 2L, 4L, 7L, 1L),
      (2L, 1L, 5L, 5L, 0L)))
    // token conservation: batches partition the corpus
    val totals = Curation.lengthBatches(docs, batchSize = 2)
      .agg(sum("sum_tokens"), sum("n_docs")).collect().head
    assert(totals.getLong(0) === 15L && totals.getLong(1) === 5L)
  }

  test("ntile stats: equal-count buckets with standard remainder split") {
    val df = (1 to 11).map(i => (i.toLong, i.toLong, "s"))
      .toDF("id", "v", "source")
    val got = Curation.ntileStats(df, "source", "v", "id", n = 5)
      .orderBy("bucket")
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // 11 rows into 5 buckets: the first 11 mod 5 = 1 bucket gets 3 rows
    assert(got.toSeq === Seq((1, 3L, 1L, 3L), (2, 2L, 4L, 5L),
      (3, 2L, 6L, 7L), (4, 2L, 8L, 9L), (5, 2L, 10L, 11L)))
  }

  test("soft-dedup sample: cluster mass split across members, no pairs == weightedSample") {
    val docs = (0L until 20L).map { i =>
      (i, ("w " * 10).trim, if (i < 10) "sA" else "sB")
    }.toDF("doc_id", "text", "source")
    // docs 0..4 form one 5-member near-dup cluster in sA
    val pairs = (0L until 4L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = Curation.softDedupSample(docs, pairs, k = 50)
      .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getDouble(3))).toMap
    // clustered members carry size 5 and 1/5 the weight of singletons
    (0L until 5L).foreach { i =>
      assert(got(i)._1 === 5L && math.abs(got(i)._2 - 2.0) < 1e-9)
    }
    (5L until 20L).foreach { i =>
      assert(got(i)._1 === 1L && math.abs(got(i)._2 - 10.0) < 1e-9)
    }
    // with NO pairs every cluster is a singleton: the cut must equal the
    // plain A-ES sampler's selection exactly
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val soft = Curation.softDedupSample(docs, empty, k = 3)
      .select(col("source"), col("doc_id")).collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val plain = Curation.weightedSample(docs, k = 3)
      .select(col("source"), col("doc_id")).collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(soft === plain)
    // a deduped cluster member can still be sampled — soft, not hard dedup
    assert((0L until 5L).exists(got.contains))
  }

  test("calibration: same global cut keeps the same fraction of every group") {
    // two sources with WILDLY different raw score distributions: a raw
    // global threshold would empty the low-scoring source entirely
    val docs = ((0L until 20L).map(i => ("hi", i, 0.8 + 0.01 * i)) ++
      (100L until 120L).map(i => ("lo", i, 0.01 * (i - 100))) ++ // 0.00..0.19
      Seq(("solo", 200L, 0.02))) // a singleton niche source
      .toDF("source", "doc_id", "q")
    val cal = graft.ops.Curation.calibrateByGroup(docs,
        col("source"), col("q"), col("doc_id"))
      .where(col("cal") > 0.5)
      .groupBy(col("source")).agg(count(lit(1)).as("n"),
        min(col("q")).as("thr"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // each source keeps ~half — the calibrated cut is fair by construction
    assert(cal("hi")._1 === 10L && cal("lo")._1 === 10L)
    // a single-doc source SURVIVES the global cut (cume_dist gives it 1;
    // percent_rank would zero it out and silently empty the domain)
    assert(cal("solo")._1 === 1L)
    // while the implied RAW thresholds differ by an order of magnitude
    assert(cal("hi")._2 > 0.85 && cal("lo")._2 < 0.15)
    // the raw cut that keeps hi's upper half would keep NOTHING of lo
    assert(docs.where(col("source") === "lo" && col("q") >= cal("hi")._2)
      .count() === 0L)
  }

  test("cluster split: near-dups never straddle; no pairs degrades to the hash split") {
    val ids = (0L until 200L)
    val docs = ids.map(i => (i, "text " + i, "s")).toDF("doc_id", "text", "source")
    val weights = Seq("train" -> 90, "val" -> 5, "test" -> 5)
    // find two ids the PLAIN per-doc split separates, then pair them: the
    // cluster split must put both in the representative's split
    val plain = docs.select(col("doc_id"),
        graft.ops.Curation.splitLabel(col("doc_id"), weights).as("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val trainId = ids.find(plain(_) == "train").get
    val testId = ids.find(plain(_) == "test").get
    assert(plain(trainId) !== plain(testId)) // the leak the op exists to stop
    val pairs = Seq((math.min(trainId, testId), math.max(trainId, testId)))
      .toDF("doc_a", "doc_b")
    val clustered = graft.ops.Curation.clusterSplit(docs, pairs, weights)
      .select(col("doc_id"), col("split"), col("split_key"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(clustered(trainId)._1 === clustered(testId)._1,
      "paired near-dups must land in ONE split")
    val rep = math.min(trainId, testId)
    assert(clustered(trainId)._2 === rep && clustered(testId)._2 === rep)
    assert(clustered(trainId)._1 === plain(rep),
      "the cluster takes its representative's split")
    // every unpaired doc splits exactly as the plain hash split would
    ids.filterNot(i => i == trainId || i == testId).foreach { i =>
      assert(clustered(i)._1 === plain(i) && clustered(i)._2 === i)
    }
    // no pairs at all == the plain split, doc for doc
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    graft.ops.Curation.clusterSplit(docs, empty, weights)
      .select(col("doc_id"), col("split")).collect()
      .foreach(r => assert(r.getString(1) === plain(r.getLong(0))))
  }
}
