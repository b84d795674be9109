package graft.tools

import org.apache.spark.sql.functions._

/** One-shot generator for the PRODUCTION-SCALE stress vocabulary
  * (`fixtures/bpe_vocab_32k.parquet`, committed — run via
  * `sbt "runMain graft.tools.GenStressVocab [out] [size]"`).
  *
  * WHY THIS EXISTS (r14 VERDICT #1): the committed serving vocabulary is
  * TRAINED TO EXHAUSTION on the sf0.1 corpus — and that corpus contains
  * only 31 distinct words (75 across every text column, max 9 chars), so
  * the BPE merge loop runs out of pairs with frequency ≥ 2 at 89 pieces.
  * A 32k–100k LINGUISTIC vocabulary is unattainable from this synthetic
  * data; what IS provable at production size is the SERVING DESIGN —
  * plan-size independence, broadcast shipping, probe-set build cost,
  * encode throughput — and that is exactly what this fixture exercises.
  *
  * Content: the trained corpus vocabulary first (ranks preserved, so
  * corpus words still segment through their real merges), then a
  * DETERMINISTIC lexicographic fill — every [a-z] 2-gram, every 3-gram,
  * then 4-grams until `size` — no RNG, no timestamps; regenerating
  * reproduces the fixture byte for byte. The fill makes nearly every
  * short window a vocabulary hit, which is the WORST CASE for greedy
  * longest-match (maximal probe counts per position), so throughput
  * measured on it lower-bounds a real tokenizer's. */
object GenStressVocab {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("fixtures/bpe_vocab_32k.parquet")
    val size = args.lift(1).map(_.toInt).getOrElse(32768)
    val spark = graft.engine.Sessions.local("8", "graft-gen-stress-vocab")
    import spark.implicits._

    val trained: Seq[String] = spark.read.parquet(graft.ops.Bpe.VocabPath)
      .orderBy(col("rank")).select(col("piece")).as[String].collect().toSeq
    val pieces = build(trained, size)
    pieces.zipWithIndex.map { case (p, r) => (p, r.toLong) }
      .toDF("piece", "rank").coalesce(1)
      .write.mode("overwrite").parquet(out)
    println(s"generated ${pieces.size} stress pieces " +
      s"(${trained.size} trained + ${pieces.size - trained.size} fill) -> $out")
    spark.stop()
  }

  /** Trained core + deterministic n-gram fill, exactly `size` pieces. */
  def build(trained: Seq[String], size: Int): Seq[String] = {
    require(size >= trained.size, s"size $size below trained ${trained.size}")
    val seen = scala.collection.mutable.LinkedHashSet[String](trained: _*)
    val alpha = 'a' to 'z'
    // lexicographic n-grams of length k over [a-z]
    def grams(k: Int): Iterator[String] =
      if (k == 0) Iterator("")
      else grams(k - 1).flatMap(p => alpha.iterator.map(c => p + c))
    val fill = (2 to graft.functions.BpeEncode.MaxPieceLen).iterator
      .flatMap(grams)
    fill.takeWhile(_ => seen.size < size).foreach(seen.add)
    require(seen.size == size,
      s"fill exhausted at ${seen.size} pieces before reaching $size")
    seen.toSeq
  }
}
