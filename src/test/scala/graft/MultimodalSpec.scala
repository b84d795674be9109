package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Multimodal

class MultimodalSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("payload attach + stub feature extraction round-trips deterministically") {
    val docs = Seq((1L, "abc", "en", "srcX", 3L), (2L, "", "en", "srcX", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val media = Multimodal.attachPayload(docs)
    assert(media.schema("payload").dataType.typeName === "binary")
    assert(media.select("meta.n_bytes").as[Long].collect().sorted === Array(0L, 3L))

    val feats = Multimodal.extractFeatures(media).collect().sortBy(_.doc_id)
    assert(feats(0).n_bytes === 3L)
    assert(feats(0).byte_sum === ('a' + 'b' + 'c').toLong)
    assert(feats(0).head_hex === "616263")
    assert(feats(1).n_bytes === 0L && feats(1).head_hex === "")
    // deterministic: same input → same features
    val again = Multimodal.extractFeatures(media).collect().sortBy(_.doc_id)
    assert(feats.toSeq === again.toSeq)
  }

  test("NULL text coalesces to an empty payload (no NPE in decode closures)") {
    val docs = Seq((9L, null.asInstanceOf[String], "en", "srcX", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val media = Multimodal.attachPayload(docs)
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.map(f => (f.doc_id, f.n_bytes, f.head_hex)).toSeq === Seq((9L, 0L, "")))
    // empty payload → zero frames, not a crash
    assert(Multimodal.sampleFrames(media).collect().isEmpty)
  }

  test("frame sampling: stride-2 frames, exact boundaries, last frame short") {
    import spark.implicits._
    // 600 chars → 600 bytes → frames of 256B: idx 0 (256B), 1 (256B), 2 (88B);
    // stride 2 keeps idx 0 and 2.
    val docs = Seq((7L, "ab" * 300)).toDF("doc_id", "text")
    val got = graft.ops.Multimodal
      .sampleFrames(graft.ops.Multimodal.attachPayload(docs))
      .collect().sortBy(_.frame_idx)
    assert(got.map(f => (f.frame_idx, f.n_bytes)).toSeq === Seq((0L, 256L), (2L, 88L)))
    // fingerprint = md5 over the lowercase-hex slice (the oracle's domain)
    val hx = ("ab" * 300).getBytes("UTF-8").map(b => f"$b%02x").mkString
    val exp0 = java.security.MessageDigest.getInstance("MD5")
      .digest(hx.substring(0, 512).getBytes("UTF-8")).map(b => f"$b%02x").mkString
    assert(got.head.frame_md5 === exp0)
  }

  test("metadata-only query does not need payload decode (column pruning)") {
    val docs = graft.engine.Tables.documents(spark, "/root/testdata/sf0.001")
    val plan = Multimodal.attachPayload(docs).select("doc_id", "source")
      .queryExecution.executedPlan.toString
    // the parquet scan must not read `text` (payload source) for a
    // doc_id/source projection
    assert(plan.contains("ReadSchema") && !plan.contains("text"))
  }
}
