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
