package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Seed-classifier quality scoring — the other standard curation signal
  * next to LM perplexity ([[LmScore]]): train a multinomial Naive Bayes
  * log-odds model from a POSITIVE seed slice (curated/trusted docs) and a
  * NEGATIVE seed slice (random crawl), then score every corpus document
  * by Σ per-token log-odds + class prior. Production pipelines run
  * exactly this shape (a linear bag-of-words classifier over hashed
  * features) to rank crawl pages by "reads like the seed"; NB is its
  * closed-form-trainable instance — training is ONE grouped count per
  * class, no gradient loop, so the whole trainer is two map-side-combined
  * aggregates.
  *
  * 100 TB design, mirroring the LM scorer:
  *  - features are HASHED buckets (the hashing trick): the model is
  *    `2 * buckets` longs + four scalars REGARDLESS of vocabulary size —
  *    a real crawl vocabulary is billions of terms and cannot broadcast;
  *    the bucket table always can. Collisions merge terms identically on
  *    both engines (48-bit md5 base, the corpus-wide hash convention);
  *  - the trainer consumes only the two SEED slices (small by
  *    construction); the corpus is never touched at train time. Counts
  *    are memoized per (params, seed plan, content fingerprint);
  *  - scoring embeds the count tables as plan literals and runs as a
  *    codegen'd scan-stage fold — no join, no shuffle, no UDF on the
  *    corpus path (same machine-asserted contract as [[LmScore]]);
  *  - ln() evaluates IN-PLAN on integer-exact literal counts in both
  *    engines (the [[LmScore]] cross-engine parity precedent); `q2_odds`
  *    — the floor-log2 bit-length form — is integer-exact and anchors
  *    the hash check.
  */
object TextClassifier {

  /** Fixed-size NB state: per-bucket token-occurrence counts for each
    * class, class token totals (the multinomial denominators), and class
    * doc counts (the prior). Empty-string tokens (the `words("")` → [""]
    * NULL-parity artifact) are excluded from counts AND scoring — a blank
    * doc carries no evidence ([[LmScore.trainNgramLm]]'s vocab lesson). */
  final case class NbModel(pos: Array[Long], neg: Array[Long],
                           posTokens: Long, negTokens: Long,
                           posDocs: Long, negDocs: Long, buckets: Int) {
    require(buckets >= 2 && pos.length == buckets && neg.length == buckets,
      s"bucket tables must be exactly $buckets long")
    require(posDocs >= 1 && negDocs >= 1,
      "both seed classes need at least one document")
  }

  private def bucketOf(w: Column, buckets: Int): Column =
    TextOps.shingleHash(w) % buckets // 48-bit hash is non-negative

  /** One grouped count per class over the seed slices, collected into the
    * bounded bucket arrays (2·buckets longs — driver model state, like
    * the CMS/IVF/PQ collects). Memoized on the UNION of the seeds so a
    * changed seed slice retrains. */
  def trainNaiveBayes(pos: DataFrame, neg: DataFrame, buckets: Int = 1024,
                      textCol: String = "text"): NbModel = {
    val tagged = pos.select(lit(1).as("__graft_cls"), col(textCol))
      .unionByName(neg.select(lit(0).as("__graft_cls"), col(textCol)))
    Indexes.memoModel(tagged, s"nb_${textCol}_b$buckets") {
      val toks = tagged
        .select(col("__graft_cls"),
          TextOps.wordsSafe(col(textCol)).as("__graft_w"))
        .select(col("__graft_cls"), explode(col("__graft_w")).as("w"))
        .where(col("w") =!= "")
      val cells = toks
        .groupBy(col("__graft_cls"), bucketOf(col("w"), buckets).as("b"))
        .agg(count(lit(1)).as("c"))
        .collect() // ≤ 2·buckets rows by construction
      val (p, n) = (Array.fill(buckets)(0L), Array.fill(buckets)(0L))
      cells.foreach { r =>
        val t = if (r.getInt(0) == 1) p else n
        t(r.getLong(1).toInt) = r.getLong(2)
      }
      val docs = tagged.groupBy(col("__graft_cls")).count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      NbModel(p, n, p.sum, n.sum, docs.getOrElse(1, 0L), docs.getOrElse(0, 0L),
        buckets)
    }
  }

  /** Hashed char-ngram multiclass NB language-ID model (VERDICT r19 #3 —
    * the n-way upgrade over the marker-vote heuristic
    * [[TextAnalysis.langId]], which can only answer for languages whose
    * stopword markers it hard-codes and mislabels marker-free text):
    * per-class 1e-6-quantized log-likelihood tables over hashed char
    * n-gram buckets plus quantized log-priors. All state is
    * `|labels| · buckets` longs — broadcastable regardless of corpus
    * size, the [[NbModel]] discipline. `labels` is sorted ascending; the
    * argmax tie-break is "smallest label wins", replayed by the oracle
    * as `row_number() OVER (ORDER BY s DESC, cls ASC)`. Scores are exact
    * integer sums of driver-precomputed quantized terms, so cross-engine
    * comparison is exact (the [[LmScore]]/DSIR fixed-point convention —
    * the one `ln` per (class, bucket) cell runs on identical rational
    * inputs in both engines and the 1e-6 rounding absorbs ulp). */
  final case class NbLangModel(labels: Seq[String], lr: Array[Array[Long]],
                               prior: Array[Long], buckets: Int, n: Int) {
    // >= 1, not >= 2: a monolingual corpus is a normal curation input
    // and its argmax is trivially the one class — the registered
    // queries must degrade to that, not crash (session-close review).
    // The 4096 ceiling is a sanity bound on the broadcast tables
    // (|labels|·buckets longs: 4096·256·8 B = 8 MB), far above any
    // real language inventory, not a capability limit at 64.
    require(labels.size >= 1 && labels.size <= 4096,
      s"multiclass langid needs 1..4096 labels, got ${labels.size}")
    require(labels == labels.sorted && labels.distinct == labels,
      "labels must be sorted and distinct")
    require(lr.length == labels.size && lr.forall(_.length == buckets) &&
      prior.length == labels.size, "model tables must be |labels| x buckets")
  }

  /** All length-`n` substrings of `lower(coalesce(text, ''))` — the
    * char-ngram feature both engines replay (DuckDB:
    * `list_transform(range(1, length(t)-(n-2)), i -> substr(t, i, n))`;
    * DuckDB's range() yields [] when stop <= start, Spark's sequence()
    * REVERSES, hence the explicit short-text guard). */
  def charGrams(text: Column, n: Int): Column = {
    val t = lower(coalesce(text, lit("")))
    when(length(t) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), length(t) - (n - 1)),
        i => t.substr(i, lit(n))))
  }

  /** Train the multiclass langid from a LABELED seed slice: one grouped
    * count per (class, bucket) — map-side combined, `|labels| · buckets`
    * rows collected — plus the class doc counts. Null labels are the
    * caller's problem (filter first); memoized on the seed's content
    * fingerprint like every driver model. */
  def trainLangId(seed: DataFrame, labelCol: String = "lang",
                  buckets: Int = 256, n: Int = 3,
                  textCol: String = "text"): NbLangModel = {
    val tagged = seed.select(col(labelCol).cast("string").as("__graft_cls"),
      col(textCol))
    Indexes.memoModel(tagged, s"nblang_${labelCol}_${textCol}_b${buckets}_n$n") {
      val cells = tagged
        .select(col("__graft_cls"), explode(charGrams(col(textCol), n)).as("g"))
        .groupBy(col("__graft_cls"),
          (TextOps.shingleHash(col("g")) % buckets).as("b"))
        .agg(count(lit(1)).as("c"))
        .collect() // ≤ |labels|·buckets rows by construction
      val docsByCls = tagged.groupBy(col("__graft_cls")).count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      require(!docsByCls.contains(null),
        s"trainLangId: null label in '$labelCol' — filter the seed first")
      val labels = docsByCls.keys.toSeq.sorted
      val idx = labels.zipWithIndex.toMap
      val counts = Array.fill(labels.size, buckets)(0L)
      cells.foreach(r =>
        counts(idx(r.getString(0)))(r.getLong(1).toInt) = r.getLong(2))
      val totDocs = docsByCls.values.sum
      val lr = labels.indices.map { i =>
        val tok = counts(i).sum
        counts(i).map(c =>
          math.round(math.log((c + 1).toDouble / (tok + buckets).toDouble) * 1e6))
      }.toArray
      val prior = labels.map(l =>
        math.round(math.log(docsByCls(l).toDouble / totDocs.toDouble) * 1e6))
        .toArray
      NbLangModel(labels, lr, prior, buckets, n)
    }
  }

  /** Predict a language per document through the NATIVE kernel
    * ([[graft.functions.LangIdScore]] — one codegen'd call per row, one
    * md5 per gram shared across classes; the Column HOF derivation
    * below ran interpreted per element, the [[graft.functions.DsirScore]]
    * lesson). Appends `predicted` to the input's columns. Identity with
    * [[langIdPredictColumns]] is spec-pinned; the oracle replays the
    * exploded derivation. */
  def langIdPredict(docs: DataFrame, model: NbLangModel,
                    textCol: String = "text"): DataFrame =
    docs.withColumn("predicted", graft.functions.LangIdScore.predictCol(
      col(textCol), model.labels, model.lr, model.prior, model.n))

  /** The COLUMN-form derivation of [[langIdPredict]] — grams hashed
    * once, one fold per class over its literal table (exact long sums),
    * argmax with the smallest label winning ties. Kept as the
    * spec cross-check of the native kernel: this is the expression
    * chain the DuckDB oracle replays step by step. */
  private[graft] def langIdPredictColumns(docs: DataFrame, model: NbLangModel,
                                          textCol: String = "text"): DataFrame = {
    val reserved = docs.columns.filter(_.startsWith("__graft_"))
    require(reserved.isEmpty,
      s"input already has reserved column(s) ${reserved.mkString(", ")}; rename them first")
    val keep = docs.columns.map(col).toSeq
    val scoreOf = model.labels.indices.map { i =>
      val tbl = typedlit(model.lr(i).toSeq)
      aggregate(transform(col("__graft_b"),
          b => element_at(tbl, b + 1)),
        lit(model.prior(i)), _ + _).as(s"__graft_s$i")
    }
    val scored = docs
      .withColumn("__graft_b",
        transform(charGrams(col(textCol), model.n),
          g => (TextOps.shingleHash(g) % model.buckets).cast("int")))
      .select(keep ++ scoreOf: _*)
    val g = greatest(model.labels.indices.map(i => col(s"__graft_s$i")): _*)
    val pred = model.labels.indices.dropRight(1)
      .foldRight(lit(model.labels.last): Column) { (i, acc) =>
        when(col(s"__graft_s$i") === g, lit(model.labels(i))).otherwise(acc)
      }
    scored.select(keep :+ pred.as("predicted"): _*)
  }

  /** Per-source LANGUAGE-MIX drift QA — the composition that turns
    * [[langIdPredict]]'s per-document labels into an actionable
    * data-mixing signal (the unigram [[TextAnalysis.sourceEntropy]]
    * panel's twin over the PREDICTED-LANGUAGE distribution): for each
    * source, KL(source mix ‖ corpus mix) = Σ_lang p·ln(p/q) with
    * p = n_sl/n_s and q = n_l/n, each class term 1e-6 fixed-point
    * quantized so the per-source reduction is an exact integer sum
    * (the corpus-wide discipline), plus the majority language
    * (ties break on the smallest label — the argmax rule again).
    *
    * Scale: ONE pass over `pred` builds the |sources|·|langs| mix
    * aggregate (map-side combined); every total — per-source, per-class,
    * corpus — is a window sum over that bounded frame, so there is no
    * join and no second corpus scan. The empty-partition window is a
    * single-partition sort of ≤ |sources|·|langs| rows (bounded by
    * construction, the model-sized exemption to the global-window
    * rule). KL(p‖q) here is always finite: q ≥ p·n_s/n > 0 whenever a
    * (source, lang) cell exists. */
  def langMixDrift(pred: DataFrame, sourceCol: String = "source",
                   predCol: String = "predicted"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val mix = pred
      .select(col(sourceCol).as("source"), col(predCol).as("predicted"))
      .groupBy(col("source"), col("predicted"))
      .agg(count(lit(1)).as("n"))
    val bySrc = Window.partitionBy(col("source"))
    val byLang = Window.partitionBy(col("predicted"))
    val whole = Window.partitionBy()
    val rank = Window.partitionBy(col("source"))
      .orderBy(col("n").desc, col("predicted").asc)
    val p = col("n").cast("double") / col("t").cast("double")
    val q = col("cn").cast("double") / col("ctot").cast("double")
    mix
      .select(col("source"), col("predicted"), col("n"),
        sum(col("n")).over(bySrc).as("t"),
        sum(col("n")).over(byLang).as("cn"),
        sum(col("n")).over(whole).as("ctot"),
        row_number().over(rank).as("rn"))
      .select(col("source"), col("predicted"), col("t"), col("rn"),
        round(p * log(p / q) * lit(1e6)).cast("long").as("kq"))
      .groupBy(col("source"))
      .agg(max(col("t")).as("n_docs"),
        max(when(col("rn") === 1, col("predicted"))).as("majority_lang"),
        round(sum(col("kq")).cast("double") / lit(1e6), 6).as("kl_mix"))
      .orderBy(col("source"))
  }

  /** Score `docs`: one row per document —
    *  - `n_tokens`: non-empty tokens scored;
    *  - `q2_odds`: Σ per-token (bitlen(pos[b]+1) − bitlen(neg[b]+1)) —
    *    the floor-log2 anchor, integer-exact across engines;
    *  - `nb_logodds`: ln(posDocs/negDocs) + Σ per-token
    *    [ln((pos[b]+1)/(posTokens+B)) − ln((neg[b]+1)/(negTokens+B))],
    *    add-one smoothed, left-to-right fold, rounded to 6.
    * The model rides as two literal arrays; each projection stage
    * materializes once (the Generate/CSE discipline). */
  def nbScores(docs: DataFrame, model: NbModel,
               textCol: String = "text"): DataFrame = {
    val reserved = docs.columns.filter(_.startsWith("__graft_"))
    require(reserved.isEmpty,
      s"input already has reserved column(s) ${reserved.mkString(", ")}; rename them first")
    // r20 OPT: scored by the native [[graft.functions.NbDocScore]]
    // kernel — one codegen call per row instead of five interpreted
    // higher-order functions (the DsirScore/LmDocScore lesson).
    // Value-identical by construction; TextClassifierSpec pins kernel ==
    // exploded ([[nbScoresExploded]]), and the registered oracles replay
    // the exploded derivation in DuckDB.
    docs
      .withColumn("__graft_sc",
        graft.functions.NbDocScore.scoreCol(col(textCol), model))
      .select(col("doc_id"),
        col("__graft_sc.n_tokens").as("n_tokens"),
        col("__graft_sc.q2_odds").as("q2_odds"),
        col("__graft_sc.nb_logodds").as("nb_logodds"))
  }

  /** The pre-kernel exploded Column derivation — retained ONLY as the
    * spec's cross-implementation identity anchor (never a query path). */
  private[graft] def nbScoresExploded(docs: DataFrame, model: NbModel,
               textCol: String = "text"): DataFrame = {
    val reserved = docs.columns.filter(_.startsWith("__graft_"))
    require(reserved.isEmpty,
      s"input already has reserved column(s) ${reserved.mkString(", ")}; rename them first")
    val (pArr, nArr) = (typedlit(model.pos.toSeq), typedlit(model.neg.toSeq))
    val prior = log(lit(model.posDocs.toDouble) / lit(model.negDocs.toDouble))
    docs
      .withColumn("__graft_w",
        filter(TextOps.wordsSafe(col(textCol)), _ =!= ""))
      .withColumn("__graft_b",
        transform(col("__graft_w"), w => bucketOf(w, model.buckets).cast("int")))
      .withColumn("__graft_pc",
        transform(col("__graft_b"), b => element_at(pArr, b + 1)))
      .withColumn("__graft_nc",
        transform(col("__graft_b"), b => element_at(nArr, b + 1)))
      .select(col("doc_id"),
        size(col("__graft_b")).cast("long").as("n_tokens"),
        aggregate(zip_with(col("__graft_pc"), col("__graft_nc"), (p, n) =>
            (length(bin(p + 1L)) - length(bin(n + 1L))).cast("long")),
          lit(0L), _ + _).as("q2_odds"),
        round(aggregate(zip_with(col("__graft_pc"), col("__graft_nc"), (p, n) =>
            log((p + 1L).cast("double") /
              lit((model.posTokens + model.buckets).toDouble)) -
            log((n + 1L).cast("double") /
              lit((model.negTokens + model.buckets).toDouble))),
          prior, _ + _), 6).as("nb_logodds"))
  }
}
