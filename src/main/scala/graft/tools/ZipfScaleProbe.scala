package graft.tools

import java.io.File

import org.apache.spark.sql.SparkSession

/** Cross-scale probe for the VOCABULARY-SHAPED text families on the
  * realistic corpus (r15/r16 carried ask #5's second half): the
  * fuzzy-variant index, TextRank keywords, source-entropy QA, and BPE
  * token counting were 10×-probed in r12–r15 on the driver fixture's
  * 31-word vocabulary — a degenerate type/token curve. This re-measures
  * them on Zipf(1.1) corpora with a ~26k–30k-word realized vocabulary.
  *
  * `ZipfScaleProbe [smallDocs=3000] [factor=10]` generates
  * `documents.parquet` corpora at both scales under /tmp via the SAME
  * deterministic formula as the committed fixture
  * ([[GenZipfCorpus.docText]]), then drives the REGISTERED query bodies
  * (`q_fuzzy_terms`, `q_textrank_keywords`, `q_source_entropy`, and the
  * zipf-model BPE tokenize) against each — min-of-3 after an untimed
  * warm pass; the fuzzy index build timed cold separately (it runs once
  * per corpus fingerprint by design). Dev/probe tool: /tmp corpora,
  * never committed; only the ratio table lands in SCALE_RATIOS. */
object ZipfScaleProbe {

  private def genCorpus(spark: SparkSession, nDocs: Int): String = {
    val dir = s"/tmp/zipf_probe/sf_$nDocs"
    if (!new File(s"$dir/documents.parquet/_SUCCESS").exists()) {
      import spark.implicits._
      spark.range(nDocs.toLong).map { id =>
        val text = GenZipfCorpus.docText(id)
        (id, text, "zz", s"zipf_${id % 8}", text.length.toLong)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    }
    dir
  }

  private def time3(body: () => Unit): Double = {
    body()
    (0 until 3).map { _ =>
      val t0 = System.nanoTime(); body(); (System.nanoTime() - t0) / 1e9
    }.min
  }

  def main(args: Array[String]): Unit = {
    val smallDocs = args.headOption.map(_.toInt).getOrElse(3000)
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = graft.engine.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "graft-zipf-probe")
    val q = graft.queries.PipelineQueries
    val results = scala.collection.mutable.ArrayBuffer[(String, Int, Double)]()

    // JVM/codegen warmup on the committed fixture scale
    q.textrankKeywords(spark, genCorpus(spark, 500)).collect()

    for (n <- Seq(smallDocs, smallDocs * factor)) {
      val dir = genCorpus(spark, n)
      // fuzzy index build: cold, once per corpus fingerprint by design
      val t0 = System.nanoTime()
      q.fuzzyTerms(spark, dir).collect()
      results += (("fuzzy_index_build+probe", n, (System.nanoTime() - t0) / 1e9))
      results += (("fuzzy_terms_serve", n,
        time3(() => q.fuzzyTerms(spark, dir).collect())))
      results += (("textrank_keywords", n,
        time3(() => q.textrankKeywords(spark, dir).collect())))
      results += (("source_entropy", n,
        time3(() => q.sourceEntropy(spark, dir).collect())))
      val zipfModel = graft.ops.Bpe.model(spark, graft.ops.Bpe.ZipfVocabPath)
      // sum(n_tokens), not count(): a bare count() lets Catalyst prune
      // the encode expressions and times an empty scan
      results += (("bpe_tokenize_zipf8k", n,
        time3(() => q.bpeTokenizeForProbe(spark, dir, zipfModel)
          .agg(org.apache.spark.sql.functions.sum("n_tokens")).collect())))
      println(s"  done n=$n")
    }

    println("\n| op | small s | big s | ratio |")
    println("|---|---|---|---|")
    results.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (label, rs) =>
      val small = rs.find(_._2 == smallDocs).get._3
      val big = rs.find(_._2 == smallDocs * factor).get._3
      println(f"| $label | $small%.3f | $big%.3f | ${big / small}%.2f× |")
    }
    spark.stop()
  }
}
