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
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val nMerges = args.lift(1).map(_.toInt).getOrElse(64)
    val out = args.lift(2).getOrElse("fixtures/bpe_vocab.parquet")
    val spark = graft.engine.Sessions.local("8", "graft-train-bpe")
    import spark.implicits._

    val wordFreq: Seq[(String, Long)] = graft.engine.Tables
      .documents(spark, sfDir)
      .select(explode(graft.ops.TextOps.wordsSafe(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toSeq.sortBy(_._1)

    val vocab = train(wordFreq, nMerges)
    vocab.toDF("piece", "rank").coalesce(1)
      .write.mode("overwrite").parquet(out)
    println(s"trained ${vocab.size} BPE pieces from $sfDir -> $out")
    vocab.foreach { case (p, r) => println(f"  $r%3d  $p") }
    spark.stop()
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
