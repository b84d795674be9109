package graft.tools

import java.io.{DataOutputStream, File, FileOutputStream}

import org.apache.spark.sql.SparkSession

/** One-shot fixture generator for the real audio-decode path (run via
  * `sbt "runMain graft.tools.GenAudioFixture"`; output is committed).
  *
  * Writes two artifacts under `fixtures/`:
  *  - `audio/&lt;name&gt;.wav` — deterministic 16-bit PCM WAVs whose sample values
  *    follow closed-form formulas, serialized as RAW RIFF bytes (no
  *    javax.sound writer involved — the file bytes cannot depend on the
  *    library under test);
  *  - `audio_manifest.parquet` — ground truth (name, channels, sample_rate,
  *    bits, n_samples, duration_us, abs_sum, ehash_hex) computed directly
  *    from the formula while writing; `ehash_hex` runs LITERALLY
  *    [[graft.ops.Multimodal.energyHash64]]'s loop over the formula's
  *    |sample| values — the decoder under test must reproduce it from the
  *    file bytes or the fingerprint math is wrong.
  *
  * The corpus is engineered so the audio near-dup family has true
  * positives to find (the image fixture's genv_* convention, for sound):
  *  - `gen_00..11.wav` — 12 independent full-range recordings (the
  *    pseudo-random formula makes unrelated fingerprints far apart:
  *    expected pairwise Hamming ≈ 32, so nothing here pairs within 6);
  *  - `genq_00..03.wav` — QUIET recordings (formula / 8);
  *  - `genv_00..03.wav` — each genq re-mastered 3× LOUDER (every sample
  *    × 3, clamp-free by construction) — different bytes, identical
  *    energy envelope: the generator REQUIRES ehash(genv) == ehash(genq),
  *    pinning exact volume invariance on real WAV payloads;
  *  - `genr_00..01.wav` — byte-identical RENAMED copies of gen_00/01
  *    (the re-uploaded-file dup case);
  *  - `gene_00.wav` — genq_00 with its loudest and quietest time blocks
  *    transposed (a "same track, segments re-ordered" near-dup): the
  *    generator REQUIRES its fingerprint within Hamming 1..6 of
  *    genq_00's — close enough to pair, far enough to prove the banding
  *    finds non-exact matches;
  *  - `gens_00.wav` — a STEREO file (interleaved formula) exercising the
  *    multi-channel decode + channel-agnostic envelope contract;
  *  - `gend_00..01.wav` — RESAMPLED copies (factor-2 frame decimation to
  *    rate/2) of gen_00/gen_01: the generator REQUIRES the plain energy
  *    hash to miss them (Hamming ≥ 7) and the canonical-rate hash
  *    (`cehash_hex`) to match exactly — the resample-robust dedup's
  *    engineered true positives.
  */
object GenAudioFixture {

  /** The synthetic sample formula (shared with the analytic sums). */
  def sample(i: Int, t: Int): Short =
    ((((t.toLong * (7 + i) + i.toLong * 131) * 2654435761L) % 65536L) - 32768L).toShort

  /** Quiet variant: |values| ≤ 4096, so the 3× re-master never clamps. */
  def sampleQ(i: Int, t: Int): Short = (sample(i, t) / 8).toShort

  private def writeLE16(o: DataOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >> 8) & 0xff)
  }
  private def writeLE32(o: DataOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >> 8) & 0xff)
    o.write((v >> 16) & 0xff); o.write((v >> 24) & 0xff)
  }

  /** Write one RIFF WAV + return its analytic manifest row. `samples`
    * is the full interleaved 16-bit stream (`n_samples` = its length;
    * frames = length / channels). The dec2_* columns are the
    * factor-2 FRAME-decimation ground truth ([[graft.ops.Multimodal
    * .decimateAudio]]): kept frames f % 2 == 0, rate_out = rate / 2
    * (integer division — 11025 → 5512), duration replayed with the
    * operator's own integer formula. `cehash_hex` runs LITERALLY
    * [[graft.ops.Multimodal.energyHash64Canonical]] over the formula's
    * |sample| values — the resample-robust fingerprint's analytic ground
    * truth. */
  private def writeWav(dir: File, name: String, channels: Int, rate: Int,
                       samples: Array[Short]): (String, Int, Int, Int, Long, Long, Long, String, Long, Long, Long, String, String, String) = {
    val o = new DataOutputStream(new FileOutputStream(new File(dir, name)))
    try {
      val dataBytes = samples.length * 2
      o.writeBytes("RIFF"); writeLE32(o, 36 + dataBytes); o.writeBytes("WAVE")
      o.writeBytes("fmt "); writeLE32(o, 16)
      writeLE16(o, 1) // PCM
      writeLE16(o, channels)
      writeLE32(o, rate)
      writeLE32(o, rate * 2 * channels) // byte rate
      writeLE16(o, 2 * channels)        // block align
      writeLE16(o, 16)                  // bits
      o.writeBytes("data"); writeLE32(o, dataBytes)
      var absSum = 0L
      var t = 0
      while (t < samples.length) {
        writeLE16(o, samples(t) & 0xffff)
        absSum += math.abs(samples(t).toLong)
        t += 1
      }
      val n = samples.length.toLong
      val ehash = graft.ops.Multimodal.energyHash64(n,
        i => math.abs(samples(i.toInt).toLong))
      // factor-2 frame decimation ground truth
      val nFrames = samples.length / channels
      var dAbs = 0L
      var kept = 0L
      var f = 0
      while (f < nFrames) {
        if (f % 2 == 0) {
          var c = 0
          while (c < channels) {
            dAbs += math.abs(samples(f * channels + c).toLong); c += 1
          }
          kept += 1
        }
        f += 1
      }
      val rateOut = rate / 2
      val cehash = graft.ops.Multimodal.energyHash64Canonical(
        channels, rate, n, i => math.abs(samples(i.toInt).toLong))
      // fixed-rate ground truth: LITERALLY the serving sweep's xrateHex
      // (energyHash64AtRate + the comparability floor) over the
      // formula's |sample| values (the cross-rate family's contract)
      val Seq(x4, x6) = graft.ops.Multimodal.xrateTargets.map(t =>
        graft.ops.Multimodal.xrateHex(channels, rate, n, t,
          i => math.abs(samples(i.toInt).toLong)))
      (name, channels, rate, 16, n, (n / channels) * 1000000L / rate, absSum,
        f"$ehash%016x", kept * channels, kept * 1000000L / rateOut, dAbs,
        f"$cehash%016x", x4, x6)
    } finally o.close()
  }

  private def hamming(aHex: String, bHex: String): Int =
    java.lang.Long.bitCount(
      java.lang.Long.parseUnsignedLong(aHex, 16) ^
        java.lang.Long.parseUnsignedLong(bHex, 16))

  def main(args: Array[String]): Unit = {
    val dir = new File("fixtures/audio")
    dir.mkdirs()

    // 12 independent full-range recordings (the original committed set —
    // same formula, same bytes)
    val base = (0 until 12).map { i =>
      val rate = 8000 + 800 * i
      val n = 500 + 137 * i
      writeWav(dir, f"gen_$i%02d.wav", 1, rate,
        Array.tabulate(n)(t => sample(i, t)))
    }

    // quiet + 3×-louder re-masters: exact volume invariance on real bytes
    val quietLoud = (0 until 4).flatMap { i =>
      val rate = 8000 + 800 * i
      val n = 500 + 137 * i
      val q = Array.tabulate(n)(t => sampleQ(i, t))
      val v = q.map(s => (s * 3).toShort)
      val rq = writeWav(dir, f"genq_$i%02d.wav", 1, rate, q)
      val rv = writeWav(dir, f"genv_$i%02d.wav", 1, rate, v)
      require(rq._8 == rv._8,
        s"volume invariance broke: genq_$i ${rq._8} != genv_$i ${rv._8}")
      require(rq._12 == rv._12,
        s"canonical volume invariance broke: genq_$i ${rq._12} != genv_$i ${rv._12}")
      Seq(rq, rv)
    }

    // byte-identical renamed copies of gen_00/gen_01
    val renamed = (0 until 2).map { i =>
      val rate = 8000 + 800 * i
      val n = 500 + 137 * i
      val r = writeWav(dir, f"genr_$i%02d.wav", 1, rate,
        Array.tabulate(n)(t => sample(i, t)))
      require(r._8 == base(i)._8, s"renamed copy drifted: genr_$i")
      r
    }

    // edited near-dup of genq_00: transpose the loudest and quietest time
    // blocks (swap their sample values pairwise). The global |amplitude|
    // sum is EXACTLY unchanged — no other block's threshold moves — so
    // only the two transposed blocks' bits flip: a guaranteed small,
    // nonzero Hamming distance (the "same track, segments re-ordered"
    // edit case).
    val edited = {
      val n = 500
      val q = Array.tabulate(n)(t => sampleQ(0, t))
      def blockOf(t: Int) = (t.toLong * 64 / n).toInt
      val sums = new Array[Long](64)
      val cnts = new Array[Long](64)
      q.indices.foreach { t =>
        sums(blockOf(t)) += math.abs(q(t).toLong); cnts(blockOf(t)) += 1
      }
      val means = (0 until 64).map(b => sums(b).toDouble / cnts(b))
      val bHigh = means.indices.maxBy(means)
      val bLow = means.indices.minBy(means)
      val hiIdx = q.indices.filter(blockOf(_) == bHigh)
      val loIdx = q.indices.filter(blockOf(_) == bLow)
      val e = q.clone()
      (0 until math.min(hiIdx.size, loIdx.size)).foreach { k =>
        val tmp = e(hiIdx(k)); e(hiIdx(k)) = e(loIdx(k)); e(loIdx(k)) = tmp
      }
      val re = writeWav(dir, "gene_00.wav", 1, 8000, e)
      val d = hamming(re._8, quietLoud.head._8)
      require(d >= 1 && d <= 6,
        s"gene_00 must sit within Hamming 1..6 of genq_00, got $d")
      Seq(re)
    }

    // stereo: 600 frames × 2 channels of a fresh formula seed
    val stereo = Seq(writeWav(dir, "gens_00.wav", 2, 11025,
      Array.tabulate(1200)(k => sample(20, k))))

    // RESAMPLED copies (r17 VERDICT #4 — the commonest real-world audio
    // dup): gen_00/gen_01 factor-2 frame-decimated to rate/2, different
    // n and every block boundary moved. The generator REQUIRES the
    // rate-sensitive plain hash to MISS the pair (Hamming ≥ 7 — outside
    // the distance-6 cut) while the canonical-rate hash matches EXACTLY
    // (both normalize into the [4000, 8000) band onto the identical
    // sample stream) — the before/after the resample-robust family is
    // built on.
    val resampled = (0 until 2).map { i =>
      val rate = 8000 + 800 * i
      val n = 500 + 137 * i
      val full = Array.tabulate(n)(t => sample(i, t))
      val dec = full.indices.collect { case t if t % 2 == 0 => full(t) }.toArray
      val r = writeWav(dir, f"gend_$i%02d.wav", 1, rate / 2, dec)
      val dPlain = hamming(r._8, base(i)._8)
      require(dPlain >= 7,
        s"gend_$i must be INVISIBLE to the rate-sensitive hash, got Hamming $dPlain")
      require(r._12 == base(i)._12,
        s"canonical-rate invariance broke: gend_$i ${r._12} != gen_$i ${base(i)._12}")
      r
    }

    // CROSS-RATE + edit composite (r19 VERDICT #4 — the arbitrary-rate
    // dup the power-of-2 canonical provably misses): genx_00 is a
    // 44.1 kHz master; genx_01 is its 16 kHz re-encode by exact
    // nearest-frame selection (the zero-order-hold resampler
    // energyHash64AtRate replays) PLUS a gene_00-style block-transpose
    // edit applied to the 4 kHz-SELECTED substream (indices 4j — 16000 =
    // 4·4000, so the x4k projection sees exactly those samples).
    // Canonical rates land at 5512 vs 4000 — DIFFERENT streams, so the
    // canonical family cannot compare them at all; the generator
    // REQUIRES the canonical distance ≥ 7 (and the plain ≥ 7), while the
    // x4k fixed-rate distance sits in 1..6: rate change contributes
    // EXACTLY zero (selection composition collapses — REQUIRED equal
    // before the edit), the edit contributes the small nonzero distance.
    val xrate = {
      val n = 2000
      val master = Array.tabulate(n)(t => sample(30, t))
      val rx = writeWav(dir, "genx_00.wav", 1, 44100, master)
      // 16 kHz re-encode: frame u reads master frame u*44100/16000
      val nV = n * 16000 / 44100
      val variant = Array.tabulate(nV)(u =>
        master((u.toLong * 44100 / 16000).toInt))
      // un-edited re-encode: the x4k projections must agree EXACTLY
      val x4Master = graft.ops.Multimodal.energyHash64AtRate(
        1, 44100, n.toLong, 4000, i => math.abs(master(i.toInt).toLong))
      val x4Clean = graft.ops.Multimodal.energyHash64AtRate(
        1, 16000, nV.toLong, 4000, i => math.abs(variant(i.toInt).toLong))
      require(x4Clean == x4Master,
        f"x4k selection composition must collapse exactly: $x4Clean%016x != $x4Master%016x")
      // edit the 4kHz-selected substream (indices 4j): transpose its
      // loudest and quietest 64-block segments, the gene_00 trick — the
      // selected stream's global |amplitude| sum is unchanged, so only
      // the two transposed blocks' bits can flip
      // exactly the frames energyHash64AtRate reads: keptFrames =
      // floor(nV·4000/16000), frame j → source frame j·16000/4000 = 4j
      val kept = Array.tabulate(nV * 4000 / 16000)(j => 4 * j)
      def blockOf(j: Int) = (j.toLong * 64 / kept.length).toInt
      val sums = new Array[Long](64)
      val cnts = new Array[Long](64)
      kept.indices.foreach { j =>
        sums(blockOf(j)) += math.abs(variant(kept(j)).toLong)
        cnts(blockOf(j)) += 1
      }
      val means = (0 until 64).map(b =>
        if (cnts(b) == 0) 0.0 else sums(b).toDouble / cnts(b))
      val bHigh = means.indices.maxBy(means)
      val bLow = means.indices.minBy(means)
      val hiIdx = kept.indices.filter(blockOf(_) == bHigh).map(kept)
      val loIdx = kept.indices.filter(blockOf(_) == bLow).map(kept)
      val e = variant.clone()
      (0 until math.min(hiIdx.size, loIdx.size)).foreach { k =>
        val tmp = e(hiIdx(k)); e(hiIdx(k)) = e(loIdx(k)); e(loIdx(k)) = tmp
      }
      val rv = writeWav(dir, "genx_01.wav", 1, 16000, e)
      val dPlain = hamming(rv._8, rx._8)
      require(dPlain >= 7,
        s"genx_01 must be invisible to the rate-sensitive hash, got $dPlain")
      val dCanon = hamming(rv._12, rx._12)
      require(dCanon >= 7,
        s"genx_01 must be MISSED by the power-of-2 canonical (different " +
          s"canonical rates ${44100 / 8} vs ${16000 / 4}), got $dCanon")
      val dX4 = hamming(rv._13, rx._13)
      require(dX4 >= 1 && dX4 <= 6,
        s"genx_01 must sit within x4k Hamming 1..6 of genx_00, got $dX4")
      Seq(rx, rv)
    }

    // MIXED-SENTINEL pair (self-review r20 third pass: the ANY-channel
    // contract — sentinel on one fixed-rate channel, comparable on the
    // other — had no fixture row, so the oracle's CASE/OR branches and
    // the least()-skips-NULL assumption never ran cross-engine): a clip
    // long enough for the 6 kHz projection (75 kept frames) but below
    // the 64-frame comparability floor at 4 kHz (50 kept), plus its 3×
    // re-master — the pair must be found via the x6k channel alone.
    val xshort = {
      val n = 100
      val q = Array.tabulate(n)(t => sampleQ(40, t))
      val v = q.map(s => (s * 3).toShort)
      val rq = writeWav(dir, "genxs_00.wav", 1, 8000, q)
      val rv = writeWav(dir, "genxs_01.wav", 1, 8000, v)
      require(rq._13 == "" && rv._13 == "",
        s"x4k must be the too-short sentinel, got '${rq._13}'/'${rv._13}'")
      require(rq._14.length == 16 && rq._14 == rv._14,
        s"x6k must be valid and volume-invariant: ${rq._14} vs ${rv._14}")
      Seq(rq, rv)
    }

    val rows = base ++ quietLoud ++ renamed ++ edited ++ stereo ++
      resampled ++ xrate ++ xshort
    val spark = graft.engine.Sessions.local("4", "graft-gen-audio")
    import spark.implicits._
    rows.toDF("name", "channels", "sample_rate", "bits", "n_samples",
        "duration_us", "abs_sum", "ehash_hex",
        "dec2_n_samples", "dec2_duration_us", "dec2_abs_sum", "cehash_hex",
        "xr4k_hex", "xr6k_hex")
      .coalesce(1).write.mode("overwrite")
      .parquet("fixtures/audio_manifest.parquet")
    println(s"wrote ${rows.size} wavs + manifest")
    spark.stop()
  }
}
