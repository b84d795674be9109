package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline: language ID,
  * quality scoring, token counting, document fingerprinting. All pure
  * expression chains (codegen'd, oracle-portable).
  */
object TextAnalysis {

  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Occurrences of a marker substring via length differencing —
    * portable, no regex engine differences. */
  private def occurrences(t: Column, marker: String): Column =
    (length(t) - length(regexp_replace(t, java.util.regex.Pattern.quote(marker), "")))
      ./(lit(marker.length))

  /** N-gram-heuristic language ID: stopword-marker votes per language,
    * argmax with a fixed tie order (en > de > fr > es > other). */
  def langId(text: Column): Column = {
    val t = concat(lit(" "), lower(text), lit(" "))
    def votes(ms: Seq[String]): Column = ms.map(occurrences(t, _)).reduce(_ + _)
    val en = votes(Seq(" the ", " and ", " of "))
    val de = votes(Seq(" der ", " und ", " die "))
    val fr = votes(Seq(" le ", " la ", " et "))
    val es = votes(Seq(" el ", " los ", " y "))
    val g = greatest(en, de, fr, es)
    when(g <= 0, lit("other"))
      .when(en === g, lit("en"))
      .when(de === g, lit("de"))
      .when(fr === g, lit("fr"))
      .otherwise(lit("es"))
  }

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(TextOps.words(text))

  /** BPE-ish subword count: alpha runs, single digits, punctuation marks. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]|[^a-z0-9\\s]"), lit(0)))

  /** Ratio of non-alphanumeric, non-space chars. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[^a-zA-Z0-9\\s]", "")))
      .cast("double") / greatest(length(text), lit(1)).cast("double")

  /** Share of tokens that are common-English stopwords. */
  def stopwordRatio(text: Column): Column = {
    val w = TextOps.words(text)
    size(filter(w, x => x.isInCollection(stopwords))).cast("double") /
      greatest(size(w), lit(1)).cast("double")
  }

  /** Composite quality score in [0,1]: length saturation + stopword signal
    * − punctuation noise (deterministic, documented formula). */
  def qualityScore(text: Column): Column = {
    val lenScore = least(tokenCount(text).cast("double") / lit(100.0), lit(1.0))
    greatest(lit(0.0), least(lit(1.0),
      lenScore * 0.4 + stopwordRatio(text) * 2.0 * 0.4 + (lit(1.0) - punctRatio(text)) * 0.2))
  }

  /** Content fingerprint: md5 of whitespace-normalized lowercase text —
    * the grouping key for exact near-normalization dedup. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "\\s+", " "))

  /** Per-document repetition metrics (the Gopher-style repetition filters,
    * adapted to one-line documents): duplicate word-2-gram fraction and
    * most-frequent-word fraction. High values mean boilerplate / degenerate
    * text a training pipeline drops.
    *
    * Scale shape: the 2-gram duplicate fraction is ARRAY-ONLY (distinct vs
    * total 2-gram counts inside one projection — zero shuffle); the top-word
    * fraction is one explode + two hash aggregates keyed by doc_id, then a
    * doc_id equi-join back — everything shuffles (doc_id, word, count)
    * triples, never document bodies. The words array materializes in its own
    * projection before any lambda touches it (see
    * [[TextOps.shingleSetFromWords]] for the O(words²) trap). */
  def repetitionMetrics(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"), col("source"),
      TextOps.wordsSafe(col("text")).as("w"))
    val dup = base
      .select(col("doc_id"), col("source"), TextOps.shingles(col("w"), 2).as("g"))
      .select(col("doc_id"), col("source"),
        // a <2-word doc has NO 2-grams and therefore no repetition — the
        // bare 1 - 0/1 formula would score it 1.0 (maximally repetitive)
        when(size(col("g")) === 0, lit(0.0))
          .otherwise(lit(1.0) - size(array_distinct(col("g"))).cast("double") /
            size(col("g")).cast("double")).as("dup_2gram_frac"))
    val topw = base.select(col("doc_id"), explode(col("w")).as("word"))
      .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg((max(col("c")).cast("double") / sum(col("c")).cast("double"))
        .as("top_word_frac"))
    dup.join(topw, Seq("doc_id"))
  }

  /** Corpus n-gram document frequency: the `k` word n-grams appearing in the
    * most documents, with total occurrence counts — the corpus-statistics
    * pass behind stopword lists, boilerplate detection, and contamination
    * triage. One explode + one hash aggregate (partial map-side) + a
    * TakeOrderedAndProject top-k; the shuffle carries (ngram, doc_id). */
  def ngramDocFreq(docs: DataFrame, n: Int = 2, k: Int = 15): DataFrame =
    docs.select(col("doc_id"), TextOps.wordsSafe(col("text")).as("w"))
      .select(col("doc_id"), explode(TextOps.shingles(col("w"), n)).as("ngram"))
      .groupBy(col("ngram"), col("doc_id")).agg(count(lit(1)).as("c"))
      .groupBy(col("ngram"))
      .agg(sum(col("c")).as("occurrences"), count(lit(1)).as("doc_freq"))
      .orderBy(col("doc_freq").desc, col("ngram").asc)
      .limit(k)

  /** Per-document top-`k` characteristic terms by TF-IDF — the term-weighting
    * pass behind keyword extraction, topic labeling, and quality triage.
    *
    * IDF variant: `score = tf · N / df` (raw inverse document frequency,
    * no logarithm) — deliberate determinism choice: multiplication of
    * longs is exact and one IEEE division is correctly rounded, so Spark
    * and the DuckDB oracle produce BIT-IDENTICAL doubles, whereas `ln` is
    * a libm call with engine-specific last-ulp rounding that would make
    * hash verification flaky. The ranking this produces per document is
    * tf-weighted rarity, the same shape the log variant orders.
    *
    * Scale shape: one explode + two hash aggregates (tf keyed by
    * (doc_id, term), df keyed by term — both map-side combined), the
    * corpus-size scalar rides a broadcast of a 1-row aggregate, the
    * tf⋈df join shuffles (term, counts) pairs only (vocabulary-sized,
    * never document bodies), and the per-doc cut is the bounded-heap
    * [[graft.plans.GroupedTopK]] operator — O(n log k), k·|docs| shuffle,
    * no full window sort. */
  def tfidfTopTerms(docs: DataFrame, k: Int = 3): DataFrame = {
    val tf = docs
      .select(col("doc_id"),
        explode(TextOps.wordsSafe(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(df, Seq("term"))
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        ((col("tf") * col("n_docs")).cast("double") / col("df").cast("double"))
          .as("score"))
    graft.plans.GroupedTopK.topK(scored, Seq("doc_id"),
      Seq("score" -> true, "term" -> false), k)
  }

  /** BM25 retrieval: top-`k` documents for a FIXED literal query-term set
    * (Okapi BM25, `k1`/`b` defaults 1.2/0.75; idf = ln((N − df + ½)/(df + ½)
    * + 1), the Lucene non-negative variant).
    *
    * Determinism: per-document term frequencies are array-filter counts
    * inside ONE projection (no explode), the per-doc score is a FIXED
    * left-to-right sum over the query terms (no nondeterministic float
    * merge order), document length enters as `dl·N/Σdl` — a ratio of exact
    * integer aggregates, so "avgdl" never exists as an order-dependent
    * float — and the one libm call (`ln`) is absorbed by the documented
    * round-to-6 (same contract as [[graft.ops.LmScore]]'s `nll`).
    *
    * Scale shape: pass 1 is a single 1-ROW aggregate over the corpus
    * (N, Σdl, df per query term — map-side combined, ~|terms| counters);
    * pass 2 re-scans, scores narrowly against that broadcast row, and cuts
    * with `orderBy(...).limit(k)` = TakeOrderedAndProject (per-partition
    * bounded heap + driver merge of k·|partitions| rows — no global sort).
    * The shuffle carries nothing but the 1-row stats and the k winners. */
  def bm25TopK(docs: DataFrame, terms: Seq[String], k: Int = 20,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty && terms.distinct == terms,
      "bm25TopK expects a non-empty, duplicate-free query-term list")
    // words array materialized in its own projection: referenced |terms|+1
    // times below, and an inlined split would re-run per reference (the
    // [[TextOps.shingleSetFromWords]] O(words²) trap).
    val base = docs
      .select(col("doc_id"),
        TextOps.wordsSafe(col("text")).as("w"))
      .select(
        col("doc_id") +: size(col("w")).as("dl") +:
          terms.zipWithIndex.map { case (t, i) =>
            size(filter(col("w"), w => w === lit(t))).as(s"tf_$i")
          }: _*)
    val stats = base.agg(
      count(lit(1)).as("n_docs"),
      sum(col("dl")).cast("long").as("total_dl") +:
        terms.indices.map(i =>
          sum(when(col(s"tf_$i") > 0, 1L).otherwise(0L)).as(s"df_$i")): _*)
    val norm = lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") *
      col("n_docs").cast("double") / col("total_dl").cast("double"))
    val contribs = terms.indices.map { i =>
      val tf = col(s"tf_$i").cast("double")
      val idf = log((col("n_docs").cast("double") - col(s"df_$i").cast("double") +
        lit(0.5)) / (col(s"df_$i").cast("double") + lit(0.5)) + lit(1.0))
      idf * (tf * lit(k1 + 1.0)) / (tf + norm)
    }
    val matched = terms.indices.map(i => col(s"tf_$i")).reduceLeft(_ + _)
    base.crossJoin(broadcast(stats))
      .where(matched > 0)
      .select(col("doc_id"), col("dl").cast("long").as("dl"),
        round(contribs.reduceLeft(_ + _), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** BATCHED BM25 — [[bm25TopK]]'s many-queries twin (the retrieval
    * analogue of the ANN family's batch-over-one-scan pattern): N queries
    * cost the SAME two corpus passes as one query, not N.
    *
    * `queries` is a FRAME of (query_id, terms array) — no driver
    * round-trip anywhere: the corpus token stream is restricted to the
    * union query vocabulary by a broadcast semi-join (hash containment
    * per token, O(1) regardless of vocabulary size), per-(doc, term)
    * frequencies aggregate once, per-term document frequency rides a
    * vocabulary-partitioned window COUNT over that tf table (no second
    * corpus pass, no tf re-execution), the (N, Σdl) scalars broadcast
    * from a 1-row aggregate, and the per-query cut is the bounded-heap
    * [[graft.plans.GroupedTopK]] — k·|queries| shuffle rows, no window
    * sort. Corpus scans: exactly 2 (tf pass + stats pass), independent of
    * |queries| — plan-audited.
    *
    * Determinism under distribution: the per-(query, doc) score is a SUM
    * over matched terms, which under Spark's partial-aggregate merge
    * would be an order-dependent float fold — so each (query, doc, term)
    * contribution is quantized to a 1e-6 fixed-point BIGINT first and the
    * reduction is an exact integer sum (the [[sourceEntropy]] contract;
    * ≤ 5·10⁻⁷ absolute per term, stated not hidden). Scoring constants
    * must be BIT-identical across engines: the oracle interpolates the
    * same Scala-computed doubles ([[graft.queries.PipelineQueries]]
    * builds its SQL from `(k1 + 1.0).toString` etc., which DuckDB parses
    * back to the identical bits — `1.2 + 1.0` is NOT the double the
    * literal `2.2` parses to, a last-ulp trap the single-query op's
    * round-to-6 silently absorbed).
    *
    * Semantics per query match [[bm25TopK]]: duplicate terms in a query's
    * array are collapsed (`array_distinct`), terms absent from the corpus
    * contribute exactly 0 (they simply have no tf rows — the idf·0 branch
    * made explicit), and only documents matching ≥ 1 query term score. */
  def bm25TopKBatch(docs: DataFrame, queries: DataFrame, k: Int = 20,
                    k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val qterms = queries.select(col("query_id"),
      explode(array_distinct(col("terms"))).as("term"))
    val vocab = qterms.select(col("term")).distinct()
    val tf = docs
      .select(col("doc_id"), TextOps.wordsSafe(col("text")).as("w"))
      .select(col("doc_id"), size(col("w")).cast("long").as("dl"),
        explode(col("w")).as("term"))
      .join(broadcast(vocab), Seq("term"), "left_semi")
      .groupBy(col("doc_id"), col("term"))
      .agg(max(col("dl")).as("dl"), count(lit(1)).as("tf"))
    // df per term WITHOUT re-executing the tf subplan (a plain
    // tf.groupBy(term) reference would re-run the corpus scan+explode):
    // an unordered window COUNT over the term partition counts exactly
    // the docs containing the term, in one extra vocabulary-keyed
    // exchange over the already-aggregated tf rows
    val tfd = tf.withColumn("df",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("term"))))
    val stats = docs
      .select(size(TextOps.wordsSafe(col("text"))).cast("long").as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).cast("long").as("total_dl"))
    val contribFp = bm25ContribFp(k1, b)
    val scored = qterms.join(tfd, Seq("term"))
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("doc_id"), contribFp.as("fp"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(round(sum(col("fp")).cast("double") / lit(1e6), 6).as("score"))
    graft.plans.GroupedTopK.topK(scored, Seq("query_id"),
      Seq("score" -> true, "doc_id" -> false), k)
  }

  // ---- maintained inverted retrieval index ---------------------------------

  /** Term-bucket fan-out of the inverted index (partition dirs per
    * batch). 64 dirs bound filesystem metadata while a query's handful
    * of terms prunes to ≤ |terms| of them. */
  val TermBuckets = 64

  private def termBucket(term: Column): Column =
    TextOps.shingleHash(term) % TermBuckets

  /** Driver-side replica of [[TextOps.shingleHash]] (48-bit md5-hex
    * prefix) — bit-identical to the executor expression and to DuckDB's
    * `('0x' || substr(md5(s),1,12))::BIGINT`, so driver-computed keys
    * are PLAN-TIME literals (the [[graft.ops.Indexes]] bucketKeyLocal
    * pattern). */
  private[graft] def md5Prefix48(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(12), 16)
  }

  /** Driver-side replica of [[termBucket]]. */
  private[graft] def termBucketLocal(term: String): Long =
    md5Prefix48(term) % TermBuckets

  /** EXACT-PHRASE SEARCH served from the positioned-window index
    * ([[graft.ops.Indexes.ensurePositionedWindows]] — the decontamination
    * family's state, reused as a retrieval structure): the phrase's
    * windowN-word windows hash on the DRIVER, the index scan filters to
    * those literal keys (pushdown), and a phrase occurrence is an ANCHOR
    * position where every window matches at its offset —
    * `pos − offset` groups, `countDistinct(offset) == |windows|` filters —
    * so multi-window phrases resolve in ONE pass over the matching rows,
    * no self-join chain, no re-tokenization, no corpus scan. Output:
    * (doc_id, n_hits, first_pos). Same 48-bit-collision caveat as every
    * consumer of the window hashes (±2⁻⁴⁸ per pair, documented there);
    * docs shorter than windowN cannot contain a ≥ windowN-word phrase and
    * produce no rows on either engine. */
  def phraseSearch(spark: SparkSession, posWinPath: String,
                   phrase: Seq[String], windowN: Int): DataFrame = {
    require(phrase.size >= windowN,
      s"phrase must span at least windowN=$windowN words")
    val wins = phrase.map(_.toLowerCase.trim)
      .sliding(windowN).map(_.mkString(" ")).toSeq
    val hs = wins.map(md5Prefix48)
    import spark.implicits._
    val lookup = hs.zipWithIndex.toDF("s", "off")
    spark.read.parquet(posWinPath)
      .where(col("s").isin(hs.distinct: _*))
      .join(broadcast(lookup), Seq("s"))
      .select(col("doc_id"), (col("pos") - col("off")).as("anchor"), col("off"))
      .groupBy(col("doc_id"), col("anchor"))
      .agg(countDistinct(col("off")).as("n_off"))
      .where(col("n_off") === wins.size)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"), min(col("anchor")).as("first_pos"))
      .orderBy(col("doc_id"))
  }

  /** MAINTAINED INVERTED INDEX — the retrieval structure that takes BM25
    * from two-corpus-scans-per-query ([[bm25TopK]]/[[bm25TopKBatch]]) to
    * ZERO: postings (term, doc_id, tf, dl) live partitioned by a 64-way
    * term bucket, so a query's terms prune statically to ≤ |terms| dirs;
    * per-term df is a count over the probed postings themselves (postings
    * ARE one row per containing doc); and the corpus scalars (N, Σdl)
    * ride a store of 1-row per-build partials summed at probe time —
    * tokenization happens once per document ever, at ingest, exactly the
    * minhash index family's 100 TB property, applied to retrieval.
    *
    * Two write modes, one schema: the batch build (`writeInvertedIndex`)
    * overwrites canonically; the streaming append
    * ([[appendInvertedIndexIdempotent]]) lands each micro-batch in
    * (batch_id, tb) partitions via dynamic overwrite — replays rewrite
    * their own partitions (docs are batch-disjoint, so postings from
    * different batches never merge rows; df/scalars derive at read).
    * Deletes: not folded here — retrieval stats tolerate staleness until
    * the next rebuild/compaction (stated, not hidden; the dedup/ANN
    * families carry the strict tombstone lifecycle instead). */
  def writeInvertedIndex(docs: DataFrame, path: String): Unit =
    writeInvertedRows(docs, path, None)

  def appendInvertedIndexIdempotent(docs: DataFrame, batchId: Long,
                                    path: String): Unit =
    writeInvertedRows(docs, path, Some(batchId))

  /** (N, Σdl) from a POSTINGS frame — every doc has ≥ 1 posting row
    * ([[TextOps.wordsSafe]] yields [""] even for null text) with its dl
    * carried on each row, so the scalars derive from postings without a
    * second tokenization pass (review catch: the old shape re-tokenized
    * the corpus for the scalar aggregate — 2× ingest cost at scale). */
  private def scalarsFromPostings(post: DataFrame): DataFrame =
    post.groupBy(col("doc_id")).agg(max(col("dl")).as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).cast("long").as("total_dl"))

  /** ONE on-disk layout for both write modes (review catch: a tb-only
    * batch build next to (batch_id, tb) streaming appends made partition
    * discovery throw at the first probe): every store is
    * (batch_id, tb)-partitioned — the batch build IS batch 0, written
    * with a plain overwrite (which commits a root _SUCCESS for the
    * ensure gate); streaming appends land via dynamic overwrite. */
  private def writeInvertedRows(docs: DataFrame, path: String,
                                batch: Option[Long]): Unit = {
    val post = docs
      .select(col("doc_id"), TextOps.wordsSafe(col("text")).as("w"))
      .select(col("doc_id"), size(col("w")).cast("long").as("dl"),
        explode(col("w")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(max(col("dl")).as("dl"), count(lit(1)).as("tf"))
      .withColumn("tb", termBucket(col("term")))
      .withColumn("batch_id", lit(batch.getOrElse(0L)))
    val spark = docs.sparkSession
    batch match {
      case None =>
        post.repartition(col("tb"))
          .sortWithinPartitions(col("term"), col("doc_id"))
          .write.mode("overwrite").partitionBy("batch_id", "tb")
          .parquet(s"$path/postings")
        scalarsFromPostings(spark.read.parquet(s"$path/postings"))
          .withColumn("batch_id", lit(0L)).coalesce(1)
          .write.mode("overwrite").partitionBy("batch_id")
          .parquet(s"$path/scalars")
      case Some(b) =>
        post.repartition(col("tb"))
          .sortWithinPartitions(col("term"), col("doc_id"))
          .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id", "tb").parquet(s"$path/postings")
        // an EMPTY first batch on a fresh path writes no postings files —
        // skip the scalar read-back rather than fail schema inference
        val fs = org.apache.hadoop.fs.FileSystem.get(
          new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
        if (fs.globStatus(new org.apache.hadoop.fs.Path(
            s"$path/postings", "*/*/*.parquet")).nonEmpty)
          scalarsFromPostings(
              spark.read.parquet(s"$path/postings").where(col("batch_id") === b))
            .withColumn("batch_id", lit(b)).coalesce(1)
            .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id").parquet(s"$path/scalars")
    }
  }

  /** Write-once build-if-missing for the registered query path — the
    * [[graft.ops.Indexes.ensureMinhashIndex]] lifecycle (fingerprint-
    * keyed, tmp build + atomic commit, sibling GC). */
  def ensureInvertedIndex(spark: SparkSession, docs: DataFrame,
                          sfDir: String): String = {
    val tag = sfDir.replaceAll("[^A-Za-z0-9._-]", "_")
    val base = s"${graft.ops.Indexes.indexRoot}/$tag/" +
      s"inverted_b${TermBuckets}_${graft.ops.Indexes.corpusFingerprint(docs)}"
    if (!graft.ops.Indexes.successExists(spark, s"$base/postings")) {
      val tmp = graft.ops.Indexes.tmpBuildPath(base)
      writeInvertedIndex(docs, tmp)
      graft.ops.Indexes.commitIndexDir(spark, tmp, base)
      graft.ops.Indexes.gcSiblings(spark, base, s"inverted_b${TermBuckets}_")
    }
    base
  }

  /** The ONE fixed-point BM25 contribution expression all scoring paths
    * share (review catch: three verbatim copies enforced the bit-identity
    * contract by hand): reads tf/df/dl/n_docs/total_dl columns, yields
    * the 1e-6-quantized BIGINT contribution. Constants fold from the
    * SAME Scala doubles the oracles interpolate. */
  private def bm25ContribFp(k1: Double, b: Double): Column = {
    val nD = col("n_docs").cast("double")
    val dfD = col("df").cast("double")
    val tfD = col("tf").cast("double")
    val norm = lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") *
      nD / col("total_dl").cast("double"))
    val idf = log((nD - dfD + lit(0.5)) / (dfD + lit(0.5)) + lit(1.0))
    round(idf * (tfD * lit(k1 + 1.0)) / (tfD + norm) * lit(1e6), 0).cast("long")
  }

  /** Fold an append-grown (batch_id-partitioned) inverted index into a
    * fresh canonical generation — the [[graft.ops.Indexes.compactLshIndex]]
    * lifecycle verb for the retrieval store: one sorted file per term
    * bucket, batch lineage dropped, scalars re-summed to one row. Pure
    * shuffle-and-rewrite of postings rows (never re-tokenizes); probes
    * answer identically pre/post (spec-asserted). Write-once: `dest` is
    * a new generation committed atomically. */
  def compactInvertedIndex(spark: SparkSession, src: String,
                           dest: String): Unit = {
    val tmp = graft.ops.Indexes.tmpBuildPath(dest)
    // output keeps the ONE unified (batch_id, tb) layout — everything
    // folds into generation batch 0, so a compacted store accepts
    // further streaming appends without a layout conflict
    spark.read.parquet(s"$src/postings")
      .select(col("doc_id"), col("term"), col("dl"), col("tf"), col("tb"))
      .withColumn("batch_id", lit(0L))
      .repartition(col("tb"))
      .sortWithinPartitions(col("term"), col("doc_id"))
      .write.mode("overwrite").partitionBy("batch_id", "tb")
      .parquet(s"$tmp/postings")
    spark.read.parquet(s"$src/scalars")
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("total_dl")).cast("long").as("total_dl"))
      .withColumn("batch_id", lit(0L))
      .coalesce(1).write.mode("overwrite").partitionBy("batch_id")
      .parquet(s"$tmp/scalars")
    graft.ops.Indexes.commitIndexDir(spark, tmp, dest)
  }

  /** BM25 top-`k` served from the inverted index — ZERO corpus scans:
    * the probe reads ≤ |terms| postings partitions (static pruning on
    * the driver-computed term buckets), df is a term-partition window
    * count over the probed rows, the corpus scalars sum a store of
    * 1-row partials, and candidates are exactly the probed postings
    * (only docs containing ≥ 1 query term score — [[bm25TopK]]'s
    * semantics). Scoring matches [[bm25TopKBatch]]'s fixed-point
    * contract: per-(doc, term) contributions quantize to 1e-6 BIGINTs,
    * the per-doc reduction is an exact integer sum, constants must be
    * interpolated into the oracle from the same Scala doubles. */
  def bm25TopKIndexed(spark: SparkSession, indexPath: String,
                      terms: Seq[String], k: Int = 20,
                      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty && terms.distinct == terms,
      "bm25TopKIndexed expects a non-empty, duplicate-free query-term list")
    val tbs = terms.map(termBucketLocal).distinct
    val post = spark.read.parquet(s"$indexPath/postings")
      .where(col("tb").isin(tbs: _*))
      .where(col("term").isin(terms: _*))
    val stats = spark.read.parquet(s"$indexPath/scalars")
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("total_dl")).as("total_dl"))
    val tfd = post.withColumn("df",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("term"))))
    val contribFp = bm25ContribFp(k1, b)
    tfd.crossJoin(broadcast(stats))
      .select(col("doc_id"), contribFp.as("fp"))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("fp")).cast("double") / lit(1e6), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** [[bm25TopKIndexed]]'s many-queries twin — N queries, still zero
    * corpus scans: ONE probe of the union query vocabulary's buckets
    * serves every query (df per term computed once over the probed
    * postings), scoring joins the (query_id, term) pairs, and the
    * per-query cut is the bounded-heap [[graft.plans.GroupedTopK]]. The
    * full family is now closed under {single, batch} × {scan, index}. */
  def bm25TopKIndexedBatch(spark: SparkSession, indexPath: String,
                           queries: DataFrame, k: Int = 20,
                           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val qterms = queries.select(col("query_id"),
      explode(array_distinct(col("terms"))).as("term"))
    val vocab = qterms.select(col("term")).distinct()
    // buckets of the union vocabulary as plan-time literals — a driver
    // round-trip bounded by the vocabulary (take + require, the batch
    // family's loud-collect pattern)
    import spark.implicits._
    // null terms are dropped like the scan twin's equi-join drops them
    // (review catch: termBucketLocal(null) NPE'd where bm25TopKBatch
    // tolerated the same frame)
    val termList = vocab.as[String].take(graft.ops.Indexes.MaxBatchProbeRows + 1)
      .filter(_ != null)
    require(termList.length <= graft.ops.Indexes.MaxBatchProbeRows,
      "bm25TopKIndexedBatch union vocabulary exceeds MaxBatchProbeRows — split")
    val tbs = termList.map(termBucketLocal).distinct.toSeq
    // term filter as LITERALS, not a semi-join (review catch): the
    // postings files are term-sorted precisely so the isin pushes to the
    // scan and footer stats prune — the join read every probed bucket
    val post = spark.read.parquet(s"$indexPath/postings")
      .where(col("tb").isin(tbs: _*))
      .where(col("term").isin(termList.toSeq: _*))
    val stats = spark.read.parquet(s"$indexPath/scalars")
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("total_dl")).as("total_dl"))
    val tfd = post.withColumn("df",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("term"))))
    val contribFp = bm25ContribFp(k1, b)
    val scored = qterms.join(tfd, Seq("term"))
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("doc_id"), contribFp.as("fp"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(round(sum(col("fp")).cast("double") / lit(1e6), 6).as("score"))
    graft.plans.GroupedTopK.topK(scored, Seq("query_id"),
      Seq("score" -> true, "doc_id" -> false), k)
  }

  /** Per-source unigram-distribution health: Shannon entropy and KL
    * divergence from the corpus distribution — the mixing-QA pass that
    * tells a pipeline which source is degenerate (low entropy ⇒
    * boilerplate) or off-distribution (high KL ⇒ reweight before
    * training).
    *
    * Determinism under distribution: a float Σ p·ln p over an unbounded
    * vocabulary would inherit Spark's nondeterministic partial-agg merge
    * order, so each TERM's contribution is quantized to a 1e-6 fixed-point
    * BIGINT first (`round(c·ln(...)·1e6)`) and the per-source reduction is
    * an EXACT integer sum — order-free, overflow-safe to ~9·10^12 nats.
    * The entropy identity used is H = ln(T) − (Σ c·ln c)/T and
    * KL(s‖corpus) = (Σ c·ln(c·C /(T·Cₜ)))/T, so every ln argument is a
    * ratio of exact integers (same value in any engine); quantization and
    * final round-to-6 absorb the libm last-ulp. Precision trade: ≤ 5·10⁻⁷
    * nats per distinct term, stated here rather than hidden.
    *
    * Scale shape: one explode + a (source, term) hash aggregate (map-side
    * combined), a vocabulary-keyed equi-join of per-source counts against
    * corpus counts (shuffles (term, count) pairs — never text), per-source
    * totals and the corpus total ride broadcasts of bounded aggregates
    * (|sources| rows and 1 row). Nothing driver-side. */
  def sourceEntropy(docs: DataFrame): DataFrame = {
    // The (source, term) count table feeds FOUR downstream consumers
    // (per-source totals, corpus counts, corpus total, and the scored
    // join); Spark re-executes an unmaterialized subplan per reference —
    // four full corpus scans + explodes (plan-audited). The table is
    // pinned for ONE corpus pass and RELEASED before returning (ADVICE
    // r11: the old localCheckpoint leaked a pinned RDD per invocation,
    // delegating cleanup to the Bench/Verify blanket unpersist that a
    // library caller never runs): the result is |sources| rows, so it is
    // materialized eagerly and returned as a local frame, with the pinned
    // tf table unpersisted in the finally. Consequence, stated: calling
    // this runs the Spark job at construction time. Callers who need the
    // lazy plan (or already hold a materialized tf) use
    // [[sourceEntropyFromTf]] and own the tf lifecycle themselves.
    val spark = docs.sparkSession
    val tf = termFrequencies(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val plan = sourceEntropyFromTf(tf)
      val rows = plan.collect() // |sources| rows — bounded
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), plan.schema)
    } finally tf.unpersist(blocking = false)
  }

  /** The (source, term, c) unigram count table [[sourceEntropy]] pins —
    * exposed so callers maintaining their own materialized term counts
    * (a production stats store) can feed [[sourceEntropyFromTf]]
    * directly and skip the corpus pass. */
  def termFrequencies(docs: DataFrame): DataFrame =
    docs
      .select(col("source"),
        explode(TextOps.wordsSafe(col("text"))).as("term"))
      .groupBy(col("source"), col("term")).agg(count(lit(1)).as("c"))

  /** Lazy scoring plan over a caller-owned (source, term, c) table. The
    * caller MUST pass a materialized/cached `tf` (the plan references it
    * four times; unmaterialized, that is four corpus scans) and owns its
    * release. */
  def sourceEntropyFromTf(tf: DataFrame): DataFrame = {
    val srcTot = tf.groupBy(col("source")).agg(sum(col("c")).as("t"))
    val corpus = tf.groupBy(col("term")).agg(sum(col("c")).as("ct"))
    val corpusTot = corpus.agg(sum(col("ct")).as("ctot"))
    val entTerm = round(col("c").cast("double") *
      log(col("c").cast("double")) * lit(1e6)).cast("long")
    // casts BEFORE the products: c·C and T·Cₜ overflow a long at corpus
    // scale (c ~ 1e9 × C ~ 1e13 tokens); IEEE double multiply is correctly
    // rounded, so the double-domain products are engine-identical.
    val klTerm = round(col("c").cast("double") *
      log(col("c").cast("double") * col("ctot").cast("double") /
        (col("t").cast("double") * col("ct").cast("double"))) * lit(1e6))
      .cast("long")
    tf.join(corpus, Seq("term"))
      .join(broadcast(srcTot), Seq("source"))
      .crossJoin(broadcast(corpusTot))
      .select(col("source"), col("t"), entTerm.as("eq"), klTerm.as("kq"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_terms"), max(col("t")).as("tokens"),
        sum(col("eq")).as("s_ent"), sum(col("kq")).as("s_kl"))
      .select(col("source"), col("n_terms"), col("tokens"),
        round(log(col("tokens").cast("double")) -
          col("s_ent").cast("double") / lit(1e6) / col("tokens").cast("double"), 6)
          .as("entropy"),
        round(col("s_kl").cast("double") / lit(1e6) / col("tokens").cast("double"), 6)
          .as("kl_vs_corpus"))
      .orderBy(col("source"))
  }

  /** Collocation extraction: top-`k` adjacent word pairs by pointwise
    * mutual information, `pmi = ln(P(ab) / (P(a)·P(b)))` with bigram and
    * unigram probabilities from their own totals — the phrase-detection
    * pass (word2vec-style "new_york" merging) and a boilerplate smell
    * (high-PMI high-count pairs are templates). `minCount` suppresses the
    * low-support noise PMI is notorious for.
    *
    * Determinism: one `ln` per surviving pair (no float accumulation),
    * arguments are products of exact integer counts cast to double BEFORE
    * multiplying (overflow-safe, correctly-rounded, engine-identical),
    * output rounded to 6 with a (pmi, w1, w2) total order.
    *
    * Scale shape: two explode + hash-aggregate passes (bigrams, unigrams —
    * both map-side combined, shuffling (gram, count) pairs only), the two
    * scalar totals ride broadcast 1-row aggregates, the bigram⟕unigram
    * joins shuffle vocabulary-sized count tables, and the cut is
    * `orderBy(...).limit(k)` = TakeOrderedAndProject. */
  def pmiTopPairs(docs: DataFrame, k: Int = 20, minCount: Long = 5): DataFrame = {
    val w = docs.select(TextOps.wordsSafe(col("text")).as("w"))
    val bi = w.select(explode(TextOps.shingles(col("w"), 2)).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("c_ab"))
      .select(substring_index(col("g"), " ", 1).as("w1"),
        substring_index(col("g"), " ", -1).as("w2"), col("c_ab"))
    val uni = w.select(explode(col("w")).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
    val nu = uni.agg(sum(col("c")).as("nu"))
    val nb = bi.agg(sum(col("c_ab")).as("nb"))
    val ua = uni.select(col("t").as("w1"), col("c").as("ca"))
    val ub = uni.select(col("t").as("w2"), col("c").as("cb"))
    bi.where(col("c_ab") >= minCount)
      .join(ua, Seq("w1")).join(ub, Seq("w2"))
      .crossJoin(broadcast(nu)).crossJoin(broadcast(nb))
      .select(col("w1"), col("w2"), col("c_ab"),
        round(log(col("c_ab").cast("double") * col("nu").cast("double") *
          col("nu").cast("double") /
          (col("nb").cast("double") * col("ca").cast("double") *
            col("cb").cast("double"))), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("w1").asc, col("w2").asc)
      .limit(k)
  }

  /** Per-language token statistics over a documents table. */
  def tokenStats(docs: DataFrame): DataFrame =
    docs.select(col("lang"), tokenCount(col("text")).as("tokens"),
        bpeTokenCount(col("text")).as("bpe_tokens"), length(col("text")).as("chars"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("tokens")), 4).as("avg_tokens"),
        round(avg(col("bpe_tokens")), 4).as("avg_bpe_tokens"),
        round(avg(col("chars")), 4).as("avg_chars"))
      .orderBy(col("lang"))
}
