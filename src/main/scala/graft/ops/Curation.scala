package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-data curation operators: deterministic corpus splits, PII
  * scrubbing, and context-window sequence packing — the steps between
  * "deduped corpus" and "training shards" in an LLM data pipeline.
  *
  * Everything is a pure Column chain over md5/regex/window primitives with
  * exact DuckDB equivalents, so each registered query is hash-verified, and
  * everything is deterministic in the DATA (no RNG state, no
  * `monotonically_increasing_id`), so results are reproducible across runs,
  * retries, and engines.
  */
object Curation {

  /** Deterministic hash bucket in [0, 100): the 48-bit md5 prefix of the
    * stringified id, mod 100. The standard alternative to `randomSplit` for
    * corpus splits — membership is a pure function of the id, so a document
    * lands in the same split on every run, on any engine, at any scale, and
    * adding data never reshuffles existing assignments (DuckDB mirror:
    * `('0x' || substr(md5(id::VARCHAR), 1, 12))::BIGINT % 100`). */
  def hashBucket(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 12), 16, 10).cast("long") % 100

  /** Split label from cumulative percentage weights, e.g.
    * `Seq("train" -> 90, "val" -> 5, "test" -> 5)`. Weights must sum to
    * 100; assignment is a narrow map (no shuffle, no sampling pass). */
  def splitLabel(id: Column, weights: Seq[(String, Int)]): Column = {
    require(weights.map(_._2).sum == 100, "split weights must sum to 100")
    val b = hashBucket(id)
    val cuts = weights.scanLeft(0)(_ + _._2).tail
    weights.zip(cuts).init.foldRight(lit(weights.last._1): Column) {
      case (((name, _), cut), rest) => when(b < cut, lit(name)).otherwise(rest)
    }
  }

  /** Per-group score CALIBRATION: each row's raw score mapped to its
    * within-group cume_dist (ties total-ordered by `id` so the rank —
    * and everything cut on it — is engine-portable). The fairness pass
    * before any GLOBAL quality cut: raw heuristic scores are not
    * comparable across sources (a forum's median "quality" is not a
    * textbook's), so one global raw threshold silently empties some
    * domains and waves others through; calibrated, the same global cut
    * keeps the same FRACTION of every domain, and the per-domain raw
    * threshold it implies becomes an observable. One window per group —
    * parallel across groups, spill-backed within one.
    *
    * `cal` is cume_dist (rank/n, INCLUSIVE), not percent_rank
    * ((rank−1)/(n−1)): percent_rank assigns 0 to every member of a
    * single-row group, so a `cal > 0.5` cut would silently EMPTY each
    * singleton source — the exact failure the op exists to prevent
    * (self-review r18 catch). Under cume_dist a singleton scores 1 and
    * survives any sub-1 cut, and a `> 0.5` cut keeps exactly
    * n − ⌊n/2⌋ = ⌈n/2⌉ of an n-doc group (the upper half, ties resolved
    * by the id order — the arithmetic the threshold-only twin
    * [[graft.engine.Medians.exactRankSelect]] replays). */
  def calibrateByGroup(df: DataFrame, group: Column, score: Column,
                       id: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(group).orderBy(score, id)
    df.withColumn("cal", cume_dist().over(w))
  }

  /** LEAKAGE-SAFE train/val/test split: the assignment hashes the
    * near-dup cluster REPRESENTATIVE, not the document, so
    * near-duplicates can never straddle splits — the membership-leakage
    * channel a per-doc hash split leaves open (a training doc's
    * paraphrase landing in test silently evaluates the model on its own
    * training data; token-level decontamination then "finds" nothing
    * because the eval side IS the leak). Unpaired documents key on their
    * own id, so with no pairs this degrades to [[splitLabel]] exactly.
    * Same determinism contract: pure function of ids and the pair set,
    * stable across runs, engines, and corpus growth.
    *
    * Scale: one components pass (the dedup family's own fixpoint) + a
    * doc-keyed left join + the narrow split map — no sampling pass, no
    * new shuffle shapes. */
  def clusterSplit(docs: DataFrame, pairs: DataFrame,
                   weights: Seq[(String, Int)]): DataFrame = {
    val cc = graft.ops.Dedup.connectedComponents(pairs)
    docs.join(cc, Seq("doc_id"), "left")
      .withColumn("split_key", coalesce(col("rep"), col("doc_id")))
      .withColumn("split", splitLabel(col("split_key"), weights))
      .drop("rep")
  }

  /** Email/phone patterns kept to syntax with identical semantics in Java
    * regex and DuckDB's RE2: character classes, bounded quantifiers,
    * alternation — no backreferences, no lookaround. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+?[0-9]{2,3}[ -][0-9]{3}[ -][0-9]{3,4}"

  /** PII-scrubbed text: emails then phones replaced by typed placeholders.
    * Pure per-row `regexp_replace` — codegen'd, no shuffle; at corpus scale
    * this runs in the same stage as the scan. */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(coalesce(text, lit("")), EmailRe, "<EMAIL>"),
      PhoneRe, "<PHONE>")

  /** Per-source PII audit: document counts, how many matched each pattern,
    * and the net character delta from scrubbing (placeholders can be longer
    * than short matches, so the delta may be negative). */
  def piiAudit(docs: DataFrame): DataFrame = {
    val t = coalesce(col("text"), lit(""))
    docs.select(col("source"), t.as("t"), scrubPii(col("text")).as("s"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("s").contains("<EMAIL>"), 1L).otherwise(0L)).as("docs_with_email"),
        sum(when(col("s").contains("<PHONE>"), 1L).otherwise(0L)).as("docs_with_phone"),
        sum(length(col("t")) - length(col("s"))).as("chars_removed"))
  }

  /** Per-source sampling rate in [0, 100] from a (source → pct) table with a
    * default — the mixture-weights column for [[sampleByDomain]]. */
  /** Deterministic per-source reservoir sample: keep exactly `k` documents
    * per source, ranked by a content-derived md5 of (source, doc_id) — the
    * downsampling step for over-represented sources in a corpus mixture
    * when [[domainMixAudit]]'s RATE-based thinning isn't enough and a hard
    * per-source COUNT is the contract (e.g. "at most k docs of src0 per
    * shard"). No RNG, no sampling pass: membership is a pure function of
    * the ids, so the sample is identical across runs, retries, and engines,
    * and growing the corpus only evicts rows at the rank boundary instead
    * of reshuffling the whole sample. The per-group cut runs through the
    * bounded-heap [[graft.plans.GroupedTopK]] operator — O(n log k) heap
    * memory and a k·|sources| shuffle, never a full per-group window sort
    * (the shape that survives one source being 90% of a 100 TB corpus). */
  def reservoirPerSource(docs: DataFrame, k: Int): DataFrame =
    graft.plans.GroupedTopK.topK(
      docs.select(col("source"), col("doc_id"),
        md5(concat_ws(":", col("source"), col("doc_id"))).as("rnk")),
      Seq("source"), Seq("rnk" -> false, "doc_id" -> false), k)

  /** Exact long floor-division (DuckDB `//` semantics for ALL longs):
    * `floor(a / n)` in doubles loses exactness above 2^53 and Spark's `div`
    * truncates toward zero (a negative `doc_id` would shard differently
    * from the oracle) — subtracting the positive `pmod` first makes the
    * dividend an exact multiple of `n`, so integral `div` IS the floor. */
  private def floorDivLong(a: Column, n: Long): Column =
    call_function("div", a - pmod(a, lit(n)), lit(n))

  private def rateFor(rates: Seq[(String, Int)], default: Int): Column = {
    require((default +: rates.map(_._2)).forall(r => r >= 0 && r <= 100),
      "sampling rates are percentages in [0, 100]")
    rates.foldRight(lit(default): Column) { case ((src, r), rest) =>
      when(col("source") === src, lit(r)).otherwise(rest)
    }
  }

  /** Deterministic domain-mixture downsampling: keep a document iff its
    * [[hashBucket]] falls under its source's target rate — how a training
    * mix ("keep 100% of wiki, 25% of crawl") is applied at corpus scale.
    * Membership is a pure function of doc_id, so the sample is stable
    * across runs/engines, composes with [[splitLabel]] (same bucket ⇒ a
    * kept doc keeps its split), and needs no sampling pass, RNG state, or
    * shuffle — the filter runs inside the scan stage. */
  def sampleByDomain(docs: DataFrame, rates: Seq[(String, Int)],
                     default: Int = 100): DataFrame =
    docs.where(hashBucket(col("doc_id")) < rateFor(rates, default))

  /** Mixture audit in ONE corpus scan (no join against the sampled frame):
    * per source, total docs, kept docs under the target rates, and the
    * realized rate. Bucket membership is re-derived per row, so this agrees
    * exactly with [[sampleByDomain]]'s filter by construction. */
  def domainMixAudit(docs: DataFrame, rates: Seq[(String, Int)],
                     default: Int = 100): DataFrame = {
    val kept = when(hashBucket(col("doc_id")) < rateFor(rates, default), 1L).otherwise(0L)
    docs.select(col("source"), kept.as("kept"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("kept")).as("n_kept"),
        round(sum(col("kept")).cast("double") / count(lit(1)), 6).as("realized_rate"))
  }

  /** Context-window document CHUNKING — the pass that turns documents into
    * fixed-size token windows for embedding or training: chunk c of a doc
    * covers tokens [c·stride, c·stride + window); starts run 0, stride, …
    * while they remain inside the document, so trailing chunks may be
    * short (min 1 token) and every document yields ≥ 1 chunk. Output is
    * (doc_id, chunk_id, chunk_tokens, chunk_md5) — the md5 of the
    * space-joined window proves content equality against the oracle
    * without materializing chunk text in the result.
    *
    * Scale shape: tokenize ONCE per document in a projection BELOW the
    * Generate (plan-asserted — the repo's third-Generate-trap note: a
    * hoisted projection would re-split the document per chunk), explode
    * only the start offsets, and slice the carried token array per chunk.
    * Narrow per-row work, zero shuffles. */
  def chunkDocuments(docs: DataFrame, window: Int, stride: Int,
                     tokenArray: Option[Column] = None): DataFrame = {
    require(window >= 1 && stride >= 1 && stride <= window,
      s"need 1 <= stride <= window, got window=$window stride=$stride")
    // default: whitespace words (never empty — wordsSafe yields ['']);
    // a subword tokenArray (BPE pieces) CAN be empty, so the start
    // sequence is guarded for n = 0 → zero chunks
    docs.select(col("doc_id"),
        tokenArray.getOrElse(TextOps.wordsSafe(col("text"))).as("w"))
      .select(col("doc_id"), col("w"), size(col("w")).as("n"))
      .select(col("doc_id"), col("w"), col("n"),
        explode(when(col("n") > 0, sequence(lit(0), col("n") - 1, lit(stride)))
          .otherwise(array().cast("array<int>"))).as("start"))
      .select(col("doc_id"),
        call_function("div", col("start"), lit(stride)).as("chunk_id"),
        least(lit(window), col("n") - col("start")).as("chunk_tokens"),
        md5(concat_ws(" ", slice(col("w"), col("start") + 1, lit(window)))).as("chunk_md5"))
  }

  /** Materialize TRAINING SHARDS — the sink side of the curation pipeline:
    * the corpus written as parquet partitioned by deterministic split label
    * ([[splitLabel]] over doc_id, so assignment is reproducible and a doc
    * never migrates between splits on rewrite), clustered by doc_id within
    * each file, with a hard per-file record cap. `maxRecordsPerFile` is the
    * writer-level knob that bounds shard size no matter how skewed the
    * split partitioning is — the property that matters when "train" is 90%
    * of a 100 TB corpus and one task's partition would otherwise emit one
    * giant file. One shuffle (the split repartition), one sort per task,
    * no driver involvement. */
  def writeTrainingShards(docs: DataFrame, path: String,
                          weights: Seq[(String, Int)],
                          maxRecordsPerFile: Long): Unit =
    docs.withColumn("split", splitLabel(col("doc_id"), weights))
      .repartition(col("split"))
      .sortWithinPartitions(col("doc_id"))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("split").parquet(path)

  /** Data MIXING to per-source token budgets — the sampling pass that turns
    * a curated corpus into a training mixture ("5 000 tokens of src0,
    * 2 000 of src1, 1 000 of everything else"): per source, documents are
    * taken in deterministic md5-rank order (the [[reservoirPerSource]]
    * rank, so the mixture composes with the reservoir and is stable under
    * corpus growth — new docs only displace at the rank boundary) until
    * the running token total reaches the source's budget. The document
    * that CROSSES the boundary is included — its preceding total is still
    * under budget — so every positive budget yields at least one doc.
    *
    * Scale shape: one window cumsum per source over (rank, doc_id) — the
    * shuffle carries (source, doc_id, rank, tokens), never text; the sort
    * unit is a source (compose with [[packBins]]'s shard key for a
    * pathologically dominant source). Output rows are budget-bounded
    * regardless of corpus size. */
  def tokenBudgetMix(docs: DataFrame, budgets: Seq[(String, Long)],
                     defaultBudget: Long,
                     tokens: Option[Column] = None): DataFrame = {
    require((defaultBudget +: budgets.map(_._2)).forall(_ >= 0),
      "token budgets must be non-negative")
    val budget = budgets.foldRight(lit(defaultBudget): Column) {
      case ((src, b), rest) => when(col("source") === src, lit(b)).otherwise(rest)
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("rnk"), col("doc_id"))
    docs.select(col("source"), col("doc_id"),
        md5(concat_ws(":", col("source"), col("doc_id"))).as("rnk"),
        tokens.getOrElse(size(TextOps.wordsSafe(col("text"))))
          .cast("long").as("tokens"))
      .withColumn("cum_tokens", sum(col("tokens")).over(w))
      .where(col("cum_tokens") - col("tokens") < budget)
      .select(col("source"), col("doc_id"), col("tokens"), col("cum_tokens"))
  }

  /** SKETCH-DRIVEN quality threshold: the quality score below which the
    * lowest `frac` of the corpus falls, estimated from the deterministic
    * bottom-k hash sample ([[Sketches.bottomKSample]]) instead of a
    * full-column percentile sort — the 100 TB way to answer "cut the worst
    * quartile". The scalar is a MODEL (one bounded driver value from a
    * k-row sample, like the IVF centroids), and because the sample
    * membership is a pure md5 function of doc_id, both engines — and any
    * two runs — derive the identical threshold. */
  def qualityThreshold(docs: DataFrame, frac: Double = 0.25,
                       sampleK: Int = 200): Double =
    // memoized per (plan, corpus fingerprint) like the other session
    // models: without this every caller pays the sample's corpus scan +
    // top-k cut per invocation (the registered query would re-derive the
    // identical scalar 4× per bench run)
    Indexes.memoModel(docs, s"qthr_${frac}_$sampleK") {
      Double.box(qualityThresholdUnmemoized(docs, frac, sampleK))
    }.doubleValue()

  /** The raw derivation (no memo) — exposed for the determinism spec,
    * which must prove two independent derivations agree (the memo would
    * make that assertion tautological). Sample MEMBERSHIP is decided on
    * doc_id alone, then only the k sampled docs are scored — scoring is
    * three regex passes per doc, and evaluating it corpus-wide just to
    * keep k rows would put the expensive half of the full-column
    * percentile right back. */
  private[graft] def qualityThresholdUnmemoized(docs: DataFrame, frac: Double,
                                                sampleK: Int): Double = {
    val ids = graft.ops.Sketches.bottomKSample(
      docs.select(col("doc_id")), "doc_id", sampleK).select(col("doc_id"))
    val row = docs.join(broadcast(ids), Seq("doc_id"), "left_semi")
      .select(TextAnalysis.qualityScore(col("text")).as("q"))
      .agg(percentile(col("q"), lit(frac)).as("t"))
      .head()
    require(!row.isNullAt(0),
      "quality threshold undefined: empty corpus slice or all-null text")
    row.getDouble(0)
  }

  /** The corpus with its lowest-quality `frac` dropped, per the
    * sample-estimated [[qualityThreshold]] — one narrow filter over the
    * scan (the score is a pure expression chain), zero shuffles beyond
    * the k-row sample cut. */
  def qualityGate(docs: DataFrame, frac: Double = 0.25,
                  sampleK: Int = 200): DataFrame =
    docs.where(TextAnalysis.qualityScore(col("text")) >=
      qualityThreshold(docs, frac, sampleK))

  /** Token-PROVENANCE spans for the concat-then-chunk training layout: per
    * document, the exact range of `capacity`-token bins its tokens occupy
    * after concatenation in doc_id order within its (source, shard) stream.
    * [[packBins]] assigns whole-doc ownership by starting bin; this is the
    * split-across-boundary accounting — a doc whose tokens straddle bin
    * edges reports every bin it touches — i.e. the attribution map a
    * training pipeline needs to trace a context window back to its source
    * documents (and the only way to answer "which docs fed window #k" when
    * packing splits documents). Same window shape and scale contract as
    * [[packBins]]: one cumsum per bounded (source, shard) sort unit, the
    * shuffle carries ids and token counts only, never text. Every doc has
    * ≥ 1 token ([[TextOps.words]] of '' is ['']), so end_bin ≥ start_bin
    * always holds. */
  def packSpans(docs: DataFrame, capacity: Int,
                shardDocs: Long = Long.MaxValue): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"), col("shard_id")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val toks = size(TextOps.wordsSafe(col("text"))).cast("long")
    docs.select(col("source"),
        floorDivLong(col("doc_id"), shardDocs).as("shard_id"),
        col("doc_id"), toks.as("tokens"))
      .withColumn("start_off", coalesce(sum(col("tokens")).over(w), lit(0L)))
      .select(col("source"), col("shard_id"), col("doc_id"), col("tokens"),
        floorDivLong(col("start_off"), capacity).as("start_bin"),
        floorDivLong(col("start_off") + col("tokens") - 1, capacity).as("end_bin"))
  }

  /** Context-window sequence packing: concatenate each shard's documents
    * in doc_id order and assign every document to the `capacity`-token bin
    * its FIRST token falls in (the GPT-style concat-then-chunk shard
    * layout; a document whose tokens straddle a boundary is owned by its
    * starting bin).
    *
    * bin = (running token count BEFORE this doc) div capacity, from ONE
    * window cumsum partitioned by (source, shard) where
    * shard = doc_id div `shardDocs` — the window's sort unit is a BOUNDED
    * shard, so one giant source (the realistic 100 TB case: "crawl" is 90%
    * of the corpus) splits into doc-count-bounded streams instead of
    * serializing into a single sort partition. Each shard packs
    * independently (bin ids restart per shard), which is exactly how
    * training shards are laid out — packing never needs cross-shard order.
    * The default `shardDocs = Long.MaxValue` keeps the per-source layout
    * (shard_id 0 everywhere) for corpora whose sources ARE the shards.
    * Output: one row per (source, shard, bin) with its doc/token load. */
  def packBins(docs: DataFrame, capacity: Int,
               shardDocs: Long = Long.MaxValue,
               tokens: Option[Column] = None): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"), col("shard_id")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    // default: whitespace words; callers budgeting like a real training
    // pipeline pass the committed-model subword count ([[Bpe.tokenCount]])
    val toks = tokens.getOrElse(size(TextOps.wordsSafe(col("text"))))
      .cast("long")
    docs.select(col("source"),
        floorDivLong(col("doc_id"), shardDocs).as("shard_id"),
        col("doc_id"), toks.as("tokens"))
      .withColumn("bin_id",
        floorDivLong(coalesce(sum(col("tokens")).over(w), lit(0L)), capacity))
      .groupBy(col("source"), col("shard_id"), col("bin_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tokens")).as("bin_tokens"))
  }

  /** Deterministic weighted sampling WITHOUT replacement, `k` docs per
    * source, inclusion probability ∝ weight (token count): the
    * Efraimidis–Spirakis A-ES scheme with the RNG replaced by the corpus's
    * standard md5-derived uniform — u = (h48(doc_id)+1)/2⁴⁸ ∈ (0, 1],
    * sample = top-k by ln(u)/w. Because u is a pure function of doc_id,
    * the sample is reproducible across runs, engines, and retries, and
    * adding documents never flips existing keys (only the top-k cut).
    * ln(u)/w is the standard numerically-safe monotone transform of
    * u^(1/w); w is floored at 1 token so empty docs stay sample-able.
    *
    * Scale shape: the key is a narrow per-row expression in the scan
    * stage; the per-source cut is the bounded-heap
    * [[graft.plans.GroupedTopK]] operator — map-side partials reduce each
    * input partition to ≤ k rows per source before the shuffle, so the
    * exchange carries ≤ k·|sources| rows total regardless of corpus size.
    * The reported key is rounded to 6 (ln is libm; same contract as
    * [[graft.ops.LmScore]]'s `nll`) — the CUT itself compares unrounded
    * doubles, where a last-ulp flip would need two 48-bit-hash-derived
    * keys within 1 ulp of each other. */
  /** The A-ES (weight, key) scoring columns — shared by [[weightedSample]]
    * and the streaming twin ([[graft.streaming.EventStreams
    * .weightedSampleStream]]), so both paths score a row identically by
    * construction. */
  /** The md5-prefix uniform u ∈ (0, 1] keyed on the row id — THE A-ES
    * randomness source; one definition so every sampler (and its DuckDB
    * replay) derives the identical value. */
  private[graft] def aesUniform(docId: Column): Column = {
    val h48 = conv(substring(md5(docId.cast("string")), 1, 12), 16, 10)
      .cast("long")
    (h48.cast("double") + lit(1.0)) / lit(281474976710656.0) // 2^48
  }

  /** The A-ES token-count weight floor (empty docs stay sample-able). */
  private[graft] def aesTokens(text: Column): Column =
    greatest(size(TextOps.wordsSafe(text)), lit(1)).cast("double")

  private[graft] def aesScore(docId: Column, text: Column): (Column, Column) = {
    val wgt = aesTokens(text)
    (wgt, log(aesUniform(docId)) / wgt)
  }

  def weightedSample(docs: DataFrame, k: Int): DataFrame = {
    val (wgt, skey) = aesScore(col("doc_id"), col("text"))
    val scored = docs.select(col("source"), col("doc_id"),
      wgt.as("weight"), skey.as("skey"))
    graft.plans.GroupedTopK.topK(scored, Seq("source"),
        Seq("skey" -> true, "doc_id" -> false), k)
      .select(col("source"), col("doc_id"), col("weight").cast("long").as("weight"),
        round(col("skey"), 6).as("skey"))
  }

  /** DEDUP-AWARE ("soft dedup") A-ES sampling: each document's sampling
    * weight is its token count divided by its near-dup CLUSTER size, so a
    * content unit duplicated n times contributes the same expected mass
    * as a unique one — the middle ground between keeping all duplicates
    * (over-sampling boilerplate) and hard dedup (discarding every copy's
    * provenance), the pass a pipeline runs when duplicates carry signal
    * (popularity, cross-source confirmation) but must not dominate the
    * mixture. Unpaired documents have cluster size 1 and sample exactly
    * as [[weightedSample]] would.
    *
    * Determinism: the cluster sizes come from the same connected
    * components the dedup family registers ([[Dedup.connectedComponents]]
    * — min-label fixpoint, engine-replayable via the recursive-CTE
    * oracle); weight and key are the A-ES columns with ONE extra exact
    * division (`toks / cluster_size` — identical IEEE op order both
    * engines). Scale: the components/size join is doc-keyed; the cut is
    * the bounded-heap [[graft.plans.GroupedTopK]], so the exchange
    * carries ≤ k·|sources| rows regardless of corpus size. */
  def softDedupSample(docs: DataFrame, pairs: DataFrame, k: Int): DataFrame = {
    val cc = graft.ops.Dedup.connectedComponents(pairs)
    val sizes = cc.groupBy(col("rep")).agg(count(lit(1)).as("csz"))
    val withC = docs.select(col("source"), col("doc_id"), col("text"))
      .join(cc, Seq("doc_id"), "left")
      .join(sizes, Seq("rep"), "left")
      .select(col("source"), col("doc_id"), col("text"),
        coalesce(col("csz"), lit(1L)).as("cluster_size"))
    // the SHARED A-ES primitives (one oracle-bound formula, one place —
    // self-review r18 catch), with the single soft-dedup delta: the
    // weight divides by cluster size before keying
    val scored = withC.select(col("source"), col("doc_id"), col("cluster_size"),
        (aesTokens(col("text")) / col("cluster_size").cast("double")).as("w"))
      .select(col("source"), col("doc_id"), col("cluster_size"), col("w"),
        (log(aesUniform(col("doc_id"))) / col("w")).as("skey"))
    graft.plans.GroupedTopK.topK(scored, Seq("source"),
        Seq("skey" -> true, "doc_id" -> false), k)
      .select(col("source"), col("doc_id"), col("cluster_size"),
        round(col("w"), 6).as("weight"), round(col("skey"), 6).as("skey"))
  }

  /** Per-group quantile-bucket (ntile) profile: assign every row to one of
    * `n` equal-count buckets of `valueCol` within its `partCol` group
    * (ties broken by `idCol` for a total, engine-portable order), then
    * profile each bucket (count, min/max/avg of the value). The
    * percentile-bucketed-feature pass: length deciles per source, quality
    * quartiles per domain, …
    *
    * Scale shape: ONE window over `partitionBy(partCol)` — parallel across
    * groups, and Spark's WindowExec buffers spill to disk, so a giant
    * group degrades to out-of-core sort rather than OOM. For the
    * pathological single-monster-group corpus, derive cut points with the
    * exact-percentile aggregate and assign by comparison instead (the
    * [[lengthOutliers]] shape) — different tie semantics (ties land in one
    * bucket instead of splitting by position), which is why this operator
    * keeps the standard ntile definition and leaves that rewrite to the
    * caller. The bucket aggregate is map-side combined; the shuffle
    * carries (group, value) pairs, never payloads. */
  def ntileStats(df: DataFrame, partCol: String, valueCol: String,
                 idCol: String, n: Int = 10): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(partCol)).orderBy(col(valueCol), col(idCol))
    df.select(col(partCol), col(idCol), col(valueCol))
      .withColumn("bucket", ntile(n).over(w))
      .groupBy(col(partCol), col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(valueCol)).as("min_v"), max(col(valueCol)).as("max_v"),
        round(avg(col(valueCol)), 6).as("avg_v"))
  }

  /** Corpus snapshot diff — the ingest-monitoring pass between two corpus
    * versions: per source, how many documents were ADDED (id only in
    * current), REMOVED (id only in previous), CHANGED (same id, different
    * content fingerprint), or UNCHANGED. The sanity gate before a
    * retraining run: an unexpected `removed` or `changed` spike names a
    * broken upstream ingest before it poisons a training corpus.
    *
    * Scale shape: both sides reduce to (doc_id, source, md5) in their
    * scan stage — the full-outer join shuffles 3 narrow columns, never
    * text — and the status aggregate is map-side combined. At 100 TB
    * this is the cheapest possible two-corpus comparison: one shuffle of
    * fingerprints. */
  def corpusDiff(current: DataFrame, previous: DataFrame): DataFrame = {
    def fingerprints(df: DataFrame, tag: String) =
      df.select(col("doc_id"), col("source").as(s"src_$tag"),
        md5(coalesce(col("text"), lit(""))).as(s"fp_$tag"))
    fingerprints(current, "c")
      .join(fingerprints(previous, "p"), Seq("doc_id"), "full_outer")
      .select(coalesce(col("src_c"), col("src_p")).as("source"),
        when(col("fp_p").isNull, "added")
          .when(col("fp_c").isNull, "removed")
          .when(col("fp_c") === col("fp_p"), "unchanged")
          .otherwise("changed").as("status"))
      .groupBy(col("source"), col("status"))
      .agg(count(lit(1)).as("n"))
  }

  /** Length-grouped batching — the padding-minimization pass before
    * batched inference or training: within each source, documents sort by
    * (token count, doc_id) and fill fixed-size batches of `batchSize` in
    * that order, so each batch holds near-equal-length documents and the
    * padded waste `max_len·n − Σlen` stays small (random batching pads
    * every short doc up to the batch's longest). Output is the per-batch
    * audit: sizes, token load, padding waste absolute and as a fraction
    * of the padded volume.
    *
    * Scale shape: ONE window (row_number over the per-source length sort
    * — parallel across sources, spilling WindowExec within one), then a
    * map-side-combined aggregate; the shuffle carries (source, tokens)
    * pairs. Same single-monster-source caveat as [[ntileStats]], same
    * answer (shard first). */
  def lengthBatches(docs: DataFrame, batchSize: Int): DataFrame = {
    require(batchSize >= 1, s"batchSize must be positive, got $batchSize")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("tokens"), col("doc_id"))
    val padded = col("max_tokens") * col("n_docs")
    docs.select(col("source"), col("doc_id"),
        size(TextOps.wordsSafe(col("text"))).cast("long").as("tokens"))
      .withColumn("batch_id", call_function("div",
        (row_number().over(w) - 1).cast("long"), lit(batchSize.toLong)))
      .groupBy(col("source"), col("batch_id"))
      .agg(count(lit(1)).as("n_docs"), max(col("tokens")).as("max_tokens"),
        sum(col("tokens")).as("sum_tokens"))
      .select(col("source"), col("batch_id"), col("n_docs"), col("max_tokens"),
        col("sum_tokens"), (padded - col("sum_tokens")).as("pad_tokens"),
        round((padded - col("sum_tokens")).cast("double") /
          padded.cast("double"), 6).as("pad_frac"))
  }

  /** Per-source token-length outlier extraction (Tukey fences): exact Q1/Q3
    * of the per-doc token count per source, flag docs outside
    * [Q1 − fence·IQR, Q3 + fence·IQR]. The classic `fence = 1.5` suits
    * heavy-tailed real corpora; near-uniform length distributions (like the
    * fixture's) put the 1.5 fences outside min/max, so callers probing such
    * data pass a tighter fence — the parameter is the operator.
    *
    * Scale shape: pass 1 is a per-source exact `percentile` aggregate —
    * |sources| rows, riding the same bounded-group contract as the exact
    * medians (one group per source; the fences broadcast back). Pass 2
    * re-scans and filters narrowly — no sort, no window, and the join adds
    * no shuffle on the big side (broadcast hash join against |sources|
    * rows). Output rows are the outliers only. */
  def lengthOutliers(docs: DataFrame, fence: Double = 1.5): DataFrame = {
    val base = docs.select(col("source"), col("doc_id"),
      size(TextOps.wordsSafe(col("text"))).cast("long").as("tokens"))
    val bounds = base.groupBy(col("source"))
      .agg(percentile(col("tokens"), array(lit(0.25), lit(0.75))).as("q"))
      .select(col("source"), col("q").getItem(0).as("q1"),
        col("q").getItem(1).as("q3"))
      .select(col("source"),
        (col("q1") - (col("q3") - col("q1")) * lit(fence)).as("lo"),
        (col("q3") + (col("q3") - col("q1")) * lit(fence)).as("hi"))
    base.join(broadcast(bounds), Seq("source"))
      .where(col("tokens") < col("lo") || col("tokens") > col("hi"))
      .select(col("source"), col("doc_id"), col("tokens"),
        round(col("lo"), 6).as("lo"), round(col("hi"), 6).as("hi"))
  }
}
