package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.SparkSession

/** A committed BPE vocabulary as a MODEL-FINGERPRINT-KEYED reference
  * object (r14 VERDICT #1): the expression tree carries only this handle
  * — identity, equality, plan-string rendering, and canonicalization all
  * reduce to the content fingerprint `id` — while the pieces travel to
  * executors ONCE per executor through a Spark broadcast, not once per
  * task closure and never as a plan literal. At a production vocabulary
  * size (32k–100k pieces) the r13 plan-literal design made every plan
  * canonicalization walk the full piece list and every task closure
  * re-ship it; with the handle, plan text is O(1) ("bpe_model:<id>") and
  * the per-task cost is a broadcast-block lookup.
  *
  * Two backings share the one serving type:
  *  - [[BpeVocabRef.broadcastRef]] — the production path (committed
  *    model, broadcast pieces; the task serializes the broadcast STUB).
  *  - [[BpeVocabRef.inline]] — spec fixtures and tiny ad-hoc vocabs: the
  *    pieces ride the serialized ref itself (the pre-r15 behavior,
  *    acceptable exactly when the vocab is small).
  *
  * The probe set (the HashSet greedy longest-match tests membership
  * against) builds lazily once per JVM per MODEL FINGERPRINT (a shared
  * companion-object cache — task-deserialized ref instances all hit the
  * same set) and is never serialized. Equality by `id` only: two refs with one fingerprint are
  * interchangeable by construction (the fingerprint covers the model
  * file bytes), which keeps Catalyst's semanticEquals/canonicalized
  * plan-cache behavior exact without hashing 32k strings per compare. */
final class BpeVocabRef private (val id: String,
                                 private val localPieces: Array[String],
                                 private val bcast: Broadcast[Array[String]])
    extends Serializable {

  def pieces: Array[String] =
    if (bcast ne null) bcast.value else localPieces

  def size: Int = pieces.length

  @transient @volatile private var set: java.util.HashSet[String] = _

  /** The membership set the encode probes — cached JVM-WIDE keyed by the
    * content fingerprint `id`, not per ref instance: codegen references
    * deserialize one ref per task, so an instance-only cache rebuilt the
    * 32k-entry set for every task on the executor (ADVICE r15). The
    * instance field is just a fast path over the shared map. Keying by
    * `id` is safe across SparkContexts — the fingerprint covers the
    * model bytes, so one id always names one piece set — and the map is
    * bounded by the number of distinct models the JVM ever serves. */
  def probe(): java.util.HashSet[String] = {
    var s = set
    if (s == null) {
      val mine = pieces
      val entry = BpeVocabRef.probeSets.computeIfAbsent(
        id, _ => (BpeVocabRef.buildSet(mine), BpeVocabRef.contentFp(mine)))
      // poison detector (ADVICE r16): inline() accepts caller-supplied
      // ids, so an id reused with DIFFERENT pieces would silently serve
      // the first binding's set process-wide. The check is an
      // order-independent CONTENT fingerprint, not just size — models
      // trained to the same merge count (the common case: 64 / 8192 /
      // 32768) collide on length while disagreeing on every piece
      // (self-review catch on the first, size-only detector).
      require(entry._2 == BpeVocabRef.contentFp(mine),
        s"BPE probe-set cache poisoned: id '$id' is already bound to a " +
          s"different ${entry._1.size}-piece vocabulary than this ref's " +
          s"${mine.length} pieces — two models share one id")
      s = entry._1
      set = s
    }
    s
  }

  override def equals(o: Any): Boolean = o match {
    case r: BpeVocabRef => r.id == id
    case _              => false
  }
  override def hashCode: Int = id.hashCode
  /** Appears verbatim in plan strings (explain, canonicalized text) —
    * MUST stay O(1) in the vocabulary size. */
  override def toString: String = s"bpe_model:$id"
}

object BpeVocabRef {

  /** JVM-wide probe-set cache (see [[BpeVocabRef.probe]]): one built
    * HashSet per model fingerprint, shared by every task-deserialized
    * ref on the executor, carrying the binding's content fingerprint
    * for the poison check. */
  private val probeSets = new java.util.concurrent.ConcurrentHashMap[
    String, (java.util.HashSet[String], Long)]()

  /** Order-independent content fingerprint: the WRAPPING SUM (not XOR —
    * a duplicated piece pair would XOR-cancel to nothing) of a mixed
    * 64-bit term per piece, seeded by the piece count. O(n) per task,
    * no allocation. Residual blindness: a substituted piece whose
    * (hashCode, length) pair collides with the original's — ~2⁻³² for
    * accidental id reuse, which is this detector's threat model (the
    * cryptographic id already guards the production path). */
  private def contentFp(pieces: Array[String]): Long = {
    var fp = pieces.length.toLong * 0x9E3779B97F4A7C15L
    var i = 0
    while (i < pieces.length) {
      val p = pieces(i)
      fp += graft.ops.TextOps.mix64(p.hashCode.toLong * 1000003L + p.length)
      i += 1
    }
    fp
  }

  /** Production backing: validate once on the driver, broadcast once per
    * session (callers memoize the ref — [[graft.ops.Bpe.model]]). */
  def broadcastRef(spark: SparkSession, id: String,
                   pieces: Array[String]): BpeVocabRef = {
    validate(pieces)
    new BpeVocabRef(id, null, spark.sparkContext.broadcast(pieces))
  }

  /** Spec/ad-hoc backing: pieces serialize with the ref (small vocabs
    * only — the plan-literal cost profile this type exists to avoid). */
  def inline(id: String, pieces: Seq[String]): BpeVocabRef = {
    val arr = pieces.toArray
    validate(arr)
    new BpeVocabRef(id, arr, null)
  }

  private def validate(pieces: Array[String]): Unit =
    pieces.foreach { p =>
      require(p.length >= 2 && p.length <= BpeEncode.MaxPieceLen,
        s"vocabulary piece '$p' outside [2, ${BpeEncode.MaxPieceLen}] chars — " +
          "single chars are implicit; longer pieces are unservable by the " +
          "bounded longest-match window")
    }

  private def buildSet(pieces: Array[String]): java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](math.max(16, pieces.length * 2))
    pieces.foreach(s.add)
    s
  }
}
