package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-document LINE/PARAGRAPH deduplication — boilerplate removal, the
  * RefinedWeb/Gopher-style curation pass the whole-document near-dup
  * machinery ([[Dedup]]) does not cover: navigation chrome, cookie banners,
  * and license footers repeat VERBATIM across thousands of pages, so the
  * unit of deduplication is the line, and the signal is cross-document
  * frequency ("this exact line appears in more than `maxDocFreq` distinct
  * documents"), not within-pair similarity.
  *
  * Scale shape (reference semantics from `main_otodom.py:118-129`-style
  * set() dedup, generalized to sub-document granularity):
  *  - the dedup DECISION path never moves line text: lines hash to md5
  *    immediately after the per-row split, the document-frequency aggregate
  *    shuffles (line_hash, doc_id) pairs — 40 bytes/line regardless of line
  *    length — and partial aggregation collapses each partition's repeats
  *    map-side;
  *  - the boilerplate set (lines with df > maxDocFreq) is small at
  *    PRODUCTION thresholds — each member appears in many documents, so
  *    |boilerplate| ≤ total_lines / maxDocFreq — but that bound is itself
  *    corpus-scale when maxDocFreq is small relative to the corpus (a
  *    trillion lines at df > 100 still admits 10B boilerplate hashes), so
  *    the join strategy is left to AQE, mirroring [[Dedup.survivors]]: a
  *    small runtime frame promotes to a broadcast hash join (asserted at
  *    test scale in LineDedupSpec), a pathological one stays a shuffle
  *    join instead of OOMing a forced broadcast;
  *  - document reconstruction is deterministic: surviving lines keep their
  *    original position order, and the audit fingerprints each cleaned
  *    document as md5 over the position-ordered surviving line HASHES — so
  *    content equality is verifiable cross-engine without ever aggregating
  *    line text. [[cleanDocs]] materializes the actual cleaned text; its
  *    reassembly aggregate is the one place line text enters a shuffle,
  *    and it is output-sized (you pay it exactly once, to write the
  *    cleaned corpus).
  *
  * Input contract: `docs(doc_id, text)` with '\n'-delimited lines. Blank
  * text yields one empty line (coalesce to ''), so every document appears
  * in the audit — the [[Dedup.shingleSets]] NULL-parity convention.
  */
object LineDedup {

  /** (doc_id, pos, lh): every line's 0-based position and md5. The split
    * happens once per row in its own projection; only hashes leave it. */
  private[graft] def lineHashes(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        posexplode(split(coalesce(col("text"), lit("")), "\n"))
          .as(Seq("pos", "line")))
      .select(col("doc_id"), col("pos"), md5(col("line")).as("lh"))

  /** Cross-document line frequency: (lh, df) with df = DISTINCT documents
    * containing the line (repeats within one doc count once — a page
    * repeating its own header is repetition, not cross-doc boilerplate;
    * [[TextAnalysis]] owns within-doc repetition). */
  def lineDocFreq(docs: DataFrame): DataFrame =
    lineHashes(docs).groupBy(col("lh"))
      .agg(countDistinct(col("doc_id")).as("df"))

  /** The boilerplate line-hash set: lines appearing in MORE than
    * `maxDocFreq` distinct documents. */
  def boilerplateLines(docs: DataFrame, maxDocFreq: Long): DataFrame =
    lineDocFreq(docs).where(col("df") > maxDocFreq).select(col("lh"))

  /** Per-document line-dedup audit: total lines, surviving lines, and the
    * cleaned document's deterministic fingerprint — md5 over the
    * position-ordered surviving line hashes, comma-joined. The whole
    * computation is hash-only: the boilerplate set joins back AQE-adjudicated
    * (left join marks rather than drops, so fully-boilerplate docs still
    * report n_kept = 0 instead of vanishing), and `collect_list` of
    * (pos, lh) structs sorts by position inside the aggregate — positions
    * are unique per document, so the order (and the fingerprint) is total.
    * An empty survivor set fingerprints md5('') — the cross-engine fixed
    * point. */
  def audit(docs: DataFrame, maxDocFreq: Long): DataFrame = {
    val boiler = boilerplateLines(docs, maxDocFreq).withColumn("bp", lit(1))
    lineHashes(docs)
      .join(boiler, Seq("lh"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("bp").isNull, 1L).otherwise(0L)).as("n_kept"),
        md5(concat_ws(",", transform(
          array_sort(collect_list(when(col("bp").isNull,
            struct(col("pos"), col("lh"))))),
          x => x.getField("lh")))).as("clean_md5"))
  }

  /** The cleaned corpus: (doc_id, clean_text) with boilerplate lines
    * removed and survivors rejoined by '\n' in original order. Decision
    * path identical to [[audit]] (hash-only, AQE-adjudicated boilerplate
    * join); the
    * survivor positions aggregate as an int array per doc and the final
    * doc_id join slices the original line array — so the only shuffles are
    * the (doc_id, pos) position aggregate and the doc_id join itself, and
    * the only stage carrying text is the one producing the output (at
    * scale, co-partition both sides on doc_id — bucketed corpus tables
    * make the join zero-shuffle). */
  def cleanDocs(docs: DataFrame, maxDocFreq: Long): DataFrame =
    cleanDocsAgainst(docs, boilerplateLines(docs, maxDocFreq))

  /** [[cleanDocs]] against an EXTERNALLY-supplied boilerplate line-hash
    * frame (one `lh` column) — corpus-derived state a batch
    * [[lineDocFreq]] pass produces offline. This is the continuous-ingest
    * decomposition: boilerplate is corpus-frequency state (a per-batch
    * count would miss cross-batch repeats), so the streaming path
    * ([[graft.streaming.EventStreams.lineDedupStream]]) pins it static
    * and cleans each micro-batch against it. */
  def cleanDocsAgainst(docs: DataFrame, boilerplate: DataFrame): DataFrame = {
    val boiler = boilerplate.select(col("lh"))
    val keep = lineHashes(docs)
      .join(boiler, Seq("lh"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_list(col("pos"))).as("keep"))
    docs.select(col("doc_id"),
        split(coalesce(col("text"), lit("")), "\n").as("lines"))
      .join(keep, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("keep").isNull, lit(""))
          .otherwise(concat_ws("\n",
            transform(col("keep"), p => element_at(col("lines"), p + 1))))
          .as("clean_text"))
  }
}
