package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
      TextOps.words(coalesce(col("text"), lit(""))).as("w"))
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
    docs.select(col("doc_id"), TextOps.words(coalesce(col("text"), lit(""))).as("w"))
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
        explode(TextOps.words(coalesce(col("text"), lit("")))).as("term"))
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
