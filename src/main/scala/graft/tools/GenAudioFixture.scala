package graft.tools

import java.io.{DataOutputStream, File, FileOutputStream}

import org.apache.spark.sql.SparkSession

/** One-shot fixture generator for the real audio-decode path (run via
  * `sbt "runMain graft.tools.GenAudioFixture"`; output is committed).
  *
  * Writes two artifacts under `fixtures/`:
  *  - `audio/gen_NN.wav` — deterministic 16-bit mono PCM WAVs whose sample
  *    values follow a closed-form formula, serialized as RAW RIFF bytes
  *    (no javax.sound writer involved — the file bytes cannot depend on
  *    the library under test);
  *  - `audio_manifest.parquet` — ground truth (name, channels, sample_rate,
  *    bits, n_samples, duration_us, abs_sum) computed directly from the
  *    formula while writing.
  *
  * PCM is lossless, so `Multimodal.decodeAudio` (javax.sound.sampled) must
  * reproduce the formula's |amplitude| sums exactly or the decode is
  * wrong — the same decoder-independence contract as GenImageFixture. */
object GenAudioFixture {

  /** The synthetic sample formula (shared with the analytic sums). */
  def sample(i: Int, t: Int): Short =
    ((((t.toLong * (7 + i) + i.toLong * 131) * 2654435761L) % 65536L) - 32768L).toShort

  private def writeLE16(o: DataOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >> 8) & 0xff)
  }
  private def writeLE32(o: DataOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >> 8) & 0xff)
    o.write((v >> 16) & 0xff); o.write((v >> 24) & 0xff)
  }

  def main(args: Array[String]): Unit = {
    val dir = new File("fixtures/audio")
    dir.mkdirs()
    val rows = (0 until 12).map { i =>
      val rate = 8000 + 800 * i
      val n = 500 + 137 * i
      val name = f"gen_$i%02d.wav"
      val o = new DataOutputStream(new FileOutputStream(new File(dir, name)))
      try {
        val dataBytes = n * 2
        o.writeBytes("RIFF"); writeLE32(o, 36 + dataBytes); o.writeBytes("WAVE")
        o.writeBytes("fmt "); writeLE32(o, 16)
        writeLE16(o, 1) // PCM
        writeLE16(o, 1) // mono
        writeLE32(o, rate)
        writeLE32(o, rate * 2) // byte rate
        writeLE16(o, 2)        // block align
        writeLE16(o, 16)       // bits
        o.writeBytes("data"); writeLE32(o, dataBytes)
        var absSum = 0L
        var t = 0
        while (t < n) {
          val s = sample(i, t)
          writeLE16(o, s & 0xffff)
          absSum += math.abs(s.toLong)
          t += 1
        }
        (name, 1, rate, 16, n.toLong, n.toLong * 1000000L / rate, absSum)
      } finally o.close()
    }
    val spark = graft.engine.Sessions.local("4", "graft-gen-audio")
    import spark.implicits._
    rows.toDF("name", "channels", "sample_rate", "bits", "n_samples",
        "duration_us", "abs_sum")
      .coalesce(1).write.mode("overwrite")
      .parquet("fixtures/audio_manifest.parquet")
    println(s"wrote ${rows.size} wavs + manifest")
    spark.stop()
  }
}
