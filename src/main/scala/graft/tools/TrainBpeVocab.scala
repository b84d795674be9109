package graft.tools

import org.apache.spark.sql.functions._

/** One-shot offline BPE vocabulary trainer (run via
  * `sbt "runMain graft.tools.TrainBpeVocab [sfDir] [nMerges] [out]"`;
  * output is committed — the IVF/PQ committed-model precedent).
  *
  * Classic byte-pair encoding over the corpus's word-frequency table
  * (Sennrich et al. 2016, as publicly described): start from single
  * characters, repeatedly merge the most frequent adjacent symbol pair,
  * record each merged piece. Pieces longer than
  * [[graft.functions.BpeEncode.MaxPieceLen]] are never formed — the
  * serving encode (and its DuckDB oracle replay) bounds its longest-match
  * window to that length, so an unservable piece must not exist.
  *
  * Determinism (the reason the model is committed rather than retrained
  * per run): word frequencies are exact integer counts; the merge choice
  * orders by (frequency DESC, pair lexicographic ASC) — no RNG, no float,
  * no partition-order dependence — so retraining on the same corpus
  * reproduces the same vocabulary byte for byte, and the frozen artifact
  * keeps every verified path immune to corpus drift.
  *
  * Output schema: (piece STRING, rank BIGINT) — rank is the merge index,
  * the conventional BPE priority (unused by the greedy longest-match
  * encode, kept for auditability and future merge-order encoders). */
object TrainBpeVocab {
  def main(args: Array[String]): Unit = {
    // `--corpus <parquet>` trains from any (doc_id, text) parquet (the
    // zipf fixture path); otherwise arg0 is an sfDir of driver tables.
    // With --corpus, the remaining positionals are (nMerges, out) — the
    // corpus path REPLACES the sfDir slot (self-review catch: keeping
    // sfDir-first forced a dummy positional and sent the out path into
    // nMerges.toInt).
    val corpus = args.indexOf("--corpus") match {
      case -1 => None
      case i  => Some(args(i + 1))
    }
    val pos0 = args.filterNot(a => a.startsWith("--") ||
      corpus.contains(a))
    val (sfDir, pos) = corpus match {
      case Some(_) => ("", pos0.toSeq)
      case None    => (pos0.headOption.getOrElse("/root/testdata/sf0.01"),
                       pos0.drop(1).toSeq)
    }
    val nMerges = pos.headOption.map(_.toInt).getOrElse(64)
    val out = pos.lift(1).getOrElse("fixtures/bpe_vocab.parquet")
    val spark = graft.engine.Sessions.local("8", "graft-train-bpe")
    import spark.implicits._

    val docs = corpus.map(spark.read.parquet(_))
      .getOrElse(graft.engine.Tables.documents(spark, sfDir))
    val wordFreq: Seq[(String, Long)] = docs
      .select(explode(graft.ops.TextOps.wordsSafe(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toSeq.sortBy(_._1)

    val vocab = trainFast(wordFreq, nMerges)
    vocab.toDF("piece", "rank").coalesce(1)
      .write.mode("overwrite").parquet(out)
    println(s"trained ${vocab.size} BPE pieces from " +
      s"${corpus.getOrElse(sfDir)} -> $out")
    if (vocab.size <= 128)
      vocab.foreach { case (p, r) => println(f"  $r%3d  $p") }
    spark.stop()
  }

  /** [[train]] with INCREMENTAL pair-count maintenance — required for
    * thousands of merges over a realistic vocabulary (the naive loop
    * recounts every pair every round: O(merges × corpus symbols), which
    * is hours at 8192 merges × 26k words; this is
    * O(corpus symbols + touched words) per merge). Semantics are
    * IDENTICAL by construction — same admission rule (a pair is counted
    * only if the merged piece fits MaxPieceLen), same selection order
    * (frequency DESC, pair lexicographic ASC), same left-to-right
    * non-overlapping merge application, same frequency ≥ 2 stop — and
    * BpeSpec asserts trainFast == train merge for merge on real word
    * tables. */
  def trainFast(wordFreq: Seq[(String, Long)], nMerges: Int): Seq[(String, Long)] = {
    import scala.collection.mutable
    val maxLen = graft.functions.BpeEncode.MaxPieceLen
    val words: Array[Array[String]] =
      wordFreq.map(_._1.map(_.toString).toArray).toArray
    val freq: Array[Long] = wordFreq.map(_._2).toArray
    val counts = mutable.HashMap.empty[(String, String), Long]
    val occ = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    // selection order: frequency DESC, then pair lexicographic ASC
    val sorted = new java.util.TreeSet[(Long, String, String)](
      Ordering.by[(Long, String, String), (Long, String, String)](t =>
        (-t._1, t._2, t._3)))

    def pairsOf(syms: Array[String]): Iterator[(String, String)] =
      (0 until syms.length - 1).iterator
        .map(i => (syms(i), syms(i + 1)))
        .filter { case (a, b) => a.length + b.length <= maxLen }
    def add(p: (String, String), n: Long): Unit = {
      val old = counts.getOrElse(p, 0L)
      if (old > 0) sorted.remove((old, p._1, p._2))
      val nw = old + n
      if (nw > 0) { counts(p) = nw; sorted.add((nw, p._1, p._2)) }
      else counts.remove(p)
    }

    words.indices.foreach { w =>
      pairsOf(words(w)).foreach { p =>
        add(p, freq(w))
        occ.getOrElseUpdate(p, mutable.Set.empty) += w
      }
    }

    val pieces = Seq.newBuilder[(String, Long)]
    var rank = 0L
    var continue = true
    while (continue && rank < nMerges) {
      if (sorted.isEmpty || sorted.first()._1 < 2) continue = false
      else {
        val (_, a, b) = sorted.first()
        val merged = a + b
        val touched = occ.getOrElse((a, b), mutable.Set.empty).toArray
        touched.foreach { w =>
          val old = words(w)
          // retract the word's contributions (occurrence-weighted counts,
          // distinct-pair membership)
          pairsOf(old).foreach(p => add(p, -freq(w)))
          pairsOf(old).toSeq.distinct.foreach(p =>
            occ.get(p).foreach(_ -= w))
          // left-to-right non-overlapping merge (identical to train())
          val out = Array.newBuilder[String]
          var i = 0
          while (i < old.length) {
            if (i + 1 < old.length && old(i) == a && old(i + 1) == b) {
              out += merged; i += 2
            } else { out += old(i); i += 1 }
          }
          val nw = out.result()
          words(w) = nw
          pairsOf(nw).foreach(p => add(p, freq(w)))
          pairsOf(nw).toSeq.distinct.foreach(p =>
            occ.getOrElseUpdate(p, mutable.Set.empty) += w)
        }
        pieces += ((merged, rank))
        rank += 1
      }
    }
    pieces.result()
  }

  /** Pure BPE merge loop over (word, freq) — host-side, deterministic. */
  def train(wordFreq: Seq[(String, Long)], nMerges: Int): Seq[(String, Long)] = {
    val maxLen = graft.functions.BpeEncode.MaxPieceLen
    var words: Seq[(Vector[String], Long)] =
      wordFreq.map { case (w, n) => (w.map(_.toString).toVector, n) }
    val pieces = Seq.newBuilder[(String, Long)]
    var rank = 0L
    var continue = true
    while (continue && rank < nMerges) {
      val pairFreq = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        syms.sliding(2).foreach {
          case Vector(a, b) if (a + b).length <= maxLen =>
            pairFreq((a, b)) = pairFreq.getOrElse((a, b), 0L) + n
          case _ =>
        }
      }
      val best = pairFreq.toSeq
        .sortBy { case ((a, b), n) => (-n, a, b) }.headOption
      best match {
        case Some(((a, b), n)) if n >= 2 =>
          val merged = a + b
          words = words.map { case (syms, f) =>
            val out = Vector.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
                out += merged; i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.result(), f)
          }
          pieces += ((merged, rank))
          rank += 1
        case _ => continue = false
      }
    }
    pieces.result()
  }
}
