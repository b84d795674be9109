package graft.tools

/** One-shot generator for the VOCABULARY-REALISTIC text fixture
  * (`fixtures/zipf_corpus.parquet`, committed — run via
  * `sbt "runMain graft.tools.GenZipfCorpus [nDocs] [out] [clonesOut]"`;
  * clonesOut defaults to `<out minus .parquet>_clones.parquet`).
  *
  * WHY THIS EXISTS (r15 VERDICT #5, carried through r16): the driver's
  * synthetic documents table has 31 distinct words, so the trained BPE
  * model exhausts at 89 pieces and every vocabulary-shaped claim
  * (Heaps-law growth, fuzzy-variant blocking, token-distribution
  * entropy) rests on a degenerate vocabulary. This corpus has a
  * LINGUISTICALLY SHAPED vocabulary — 30,000 distinct words under a
  * Zipf(s=1.1) frequency law — big enough to train a real ≥8k-piece
  * BPE model FROM TEXT ([[TrainBpeVocab]] with `--corpus`) and to give
  * the text-analysis families a realistic type/token curve.
  *
  * Construction (deterministic end to end — no RNG object, no
  * timestamps; regenerating reproduces the fixture byte for byte):
  *  - word(r) for rank r ∈ [1, 30000]: bijective base-40 numeration of
  *    r over a fixed syllable alphabet (consonant+vowel pairs), so
  *    every rank maps to a UNIQUE word and frequent words are SHORT
  *    (ranks ≤ 40 are one syllable, ≤ 1640 two, else three — Zipf's
  *    law of abbreviation falls out of the numeration for free); max
  *    word length 6 < BpeEncode.MaxPieceLen, so every word is
  *    reachable as a single trained piece;
  *  - token stream: each position draws a rank from the Zipf CDF via a
  *    splitmix64-mixed (docId, position) key — doc lengths 80..319
  *    words, mean ≈ 200.
  *
  * At the default 3000 docs (~600k tokens) the realized vocabulary is
  * ~20k+ distinct words — the committed corpus stays a few MB while
  * the type/token ratio is corpus-like rather than fixture-like. */
object GenZipfCorpus {

  val VocabSize = 30000
  val ZipfS = 1.1

  private val vowels = Array("a", "e", "i", "o", "u")
  private val consonants =
    Array("b", "c", "d", "f", "g", "h", "j", "k", "l", "m", "n", "p",
      "r", "s", "t", "v", "w", "z")
  /** 40 fixed syllables: first 40 of the consonant-major C+V grid. */
  private val syllables: Array[String] =
    (for (c <- consonants; v <- vowels) yield c + v).take(40)

  /** Bijective base-40 word for rank r ≥ 1 (unique by numeration). */
  def word(r0: Int): String = {
    var r = r0
    val sb = new StringBuilder
    while (r > 0) {
      val d = (r - 1) % 40
      sb.insert(0, syllables(d))
      r = (r - 1) / 40
    }
    sb.toString
  }

  private def mix(z0: Long): Long = graft.ops.TextOps.mix64(z0)

  /** Cumulative Zipf weights (index r-1 holds CDF through rank r). */
  private lazy val cdf: Array[Double] = {
    val w = Array.tabulate(VocabSize)(i => 1.0 / math.pow(i + 1.0, ZipfS))
    val c = new Array[Double](VocabSize)
    var acc = 0.0
    var i = 0
    while (i < VocabSize) { acc += w(i); c(i) = acc; i += 1 }
    val tot = c(VocabSize - 1)
    i = 0
    while (i < VocabSize) { c(i) /= tot; i += 1 }
    c
  }

  /** Rank for a uniform u ∈ [0, 1) — binary search over the CDF. */
  def rankOf(u: Double): Int = {
    var lo = 0
    var hi = VocabSize - 1
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cdf(mid) < u) lo = mid + 1 else hi = mid
    }
    lo + 1
  }

  /** ONE generator serves originals and clones (self-review: two copied
    * loops would let an edit to one silently destroy the engineered
    * overlap the clone fixture verifies): `redraw(t)` = Some(u) swaps
    * position t's Zipf draw for u; None keeps the original draw. */
  private def genText(docId: Long, redraw: Int => Option[Double]): String = {
    val nWords = 80 + (mix(docId * 31 + 7) & 0x7fffffffL).toInt % 240
    val sb = new StringBuilder
    var t = 0
    while (t < nWords) {
      if (t > 0) sb.append(' ')
      val u = redraw(t).getOrElse(
        (mix(docId * 1000003L + t) >>> 11).toDouble / (1L << 53).toDouble)
      sb.append(word(rankOf(u)))
      t += 1
    }
    sb.toString
  }

  /** The document text for `docId` — shared with any analytic replay. */
  def docText(docId: Long): String = genText(docId, _ => None)

  /** Engineered near-dup CLONE of `docText(srcId)`: every 10th word
    * (positions t ≡ 5 mod 10) replaced by a fresh Zipf draw — ~90%
    * token overlap, so 3-shingle Jaccard lands well above the dedup
    * family's 0.3 cut while every byte hash differs. */
  def cloneText(srcId: Long): String = genText(srcId, t =>
    if (t % 10 == 5)
      Some((mix(srcId * 7919 + t + 999331L) >>> 11).toDouble / (1L << 53).toDouble)
    else None)

  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(3000)
    val out = args.lift(1).getOrElse("fixtures/zipf_corpus.parquet")
    val spark = graft.engine.Sessions.local("8", "graft-gen-zipf")
    import spark.implicits._
    // 8 sources so per-source panels (entropy, manifests) are real tables
    val docs = (0L until nDocs.toLong).map { id =>
      val text = docText(id)
      (id, text, "zz", s"zipf_${id % 8}", text.length.toLong)
    }
    val df = docs.toDF("doc_id", "text", "lang", "source", "n_chars")
    df.coalesce(1).write.mode("overwrite").parquet(out)
    val nDistinct = docs.iterator.flatMap(_._2.split(" ")).toSet.size
    val nTokens = docs.iterator.map(_._2.count(_ == ' ') + 1).sum
    println(s"wrote $nDocs docs, $nTokens tokens, $nDistinct distinct words -> $out")

    // near-dup clones as a SEPARATE fixture (the corpus — and the BPE
    // model trained from it — stays frozen): 60 sources spread across
    // the ACTUAL corpus (self-review: hardcoded ids 0,50..2950 and a
    // hardcoded output path would clobber the committed fixture with
    // clones of nonexistent sources on any non-default run)
    require(nDocs >= 60, s"need >= 60 docs to engineer 60 clones, got $nDocs")
    val clonesOut = args.lift(2).getOrElse(
      out.replaceAll("\\.parquet$", "") + "_clones.parquet")
    val stride = nDocs.toLong / 60
    // clone ids offset by nDocs, NOT a constant: a fixed 100000 offset
    // collided with source ids once nDocs exceeded it, merging a clone's
    // shingles with an unrelated document's in any by-doc_id union
    val clones = (0 until 60).map { j =>
      val src = j * stride
      val text = cloneText(src)
      (nDocs.toLong + src, src, text, "zz", "zipf_clone", text.length.toLong)
    }
    clones.toDF("doc_id", "src_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(clonesOut)
    println(s"wrote ${clones.size} clones -> $clonesOut")
    spark.stop()
  }
}
