package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native multiclass langid argmax of one document: char n-grams of
  * `lower(text)` → 48-bit md5 bucket → per-class exact long score
  * (prior + Σ table[bucket]) → the ascending-label-first argmax — the
  * whole per-row pipeline of
  * [[graft.ops.TextClassifier.langIdPredict]]'s Column derivation as ONE
  * codegen'd call.
  *
  * Replaces the higher-order-function form (transform → md5 →
  * per-class aggregate folds): HOF lambdas are interpreted per element
  * — the [[DsirScore]] lesson verbatim, measured there at 5.4 s
  * interpreted vs 0.43 s native over the same sf0.1 corpus — where this
  * expression is a single compiled method fused into whole-stage
  * codegen, with one md5 per gram shared across all classes.
  *
  * VALUE-IDENTICAL to the Column derivation by construction — each step
  * reuses the exact primitive Catalyst evaluates:
  *   - lowercase: `UTF8String.toLowerCase()` (what `lower(text)` lowers
  *     to); NO trim — [[graft.ops.TextClassifier.charGrams]] does not
  *     trim;
  *   - grams: `substringSQL(i, n)` for i = 1 .. numChars−(n−1) — the
  *     CHARACTER (codepoint) slicing `Column.substr` evaluates, so
  *     multi-byte text grams agree;
  *   - bucket: first 48 bits of md5 over the gram's bytes
  *     ([[graft.ops.TextOps.shingleHash]]'s value) mod `buckets`;
  *   - score: exact long sums of the DRIVER-precomputed quantized
  *     tables — no per-row libm, no rounding at eval time;
  *   - tie-break: labels are sorted ascending and the argmax takes the
  *     FIRST maximal label (strict `>` update), the
  *     `row_number() OVER (ORDER BY s DESC, cls ASC)` rule the oracle
  *     replays.
  * The identity is pinned by TextClassifierSpec (native == Column form
  * on the fixture corpus and on hand-built multilingual seeds) and by
  * q_lang_id_multi's oracle (DuckDB replays the exploded derivation). */
case class LangIdScore(child: Expression, labels: Array[String],
                       lr: Array[Array[Long]], prior: Array[Long], n: Int)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_langid requires a string argument, got " +
        child.dataType.catalogString)

  override def nullSafeEval(input: Any): Any =
    LangIdScore.predict(input.asInstanceOf[UTF8String], labels, lr, prior, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val labelsRef = ctx.addReferenceObj("langidLabels", labels, "java.lang.String[]")
    val lrRef = ctx.addReferenceObj("langidLr", lr, "long[][]")
    val priorRef = ctx.addReferenceObj("langidPrior", prior, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.LangIdScore.predict(" +
        s"$c, $labelsRef, $lrRef, $priorRef, $n);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_langid"
}

object LangIdScore {

  /** The per-row kernel the generated code calls. Returns the predicted
    * label as UTF8String.
    *
    * LINEAR in the document's bytes (self-review r20 third pass: the
    * first form called `substringSQL(i, n)` per gram, which re-walks
    * the string from byte 0 to locate codepoint i — O(numChars²) on
    * long documents): one forward walk over the UTF-8 bytes keeps a
    * ring of the last n+1 codepoint BOUNDARY offsets, and each gram
    * digests the byte slice between the boundary n codepoints back and
    * the current one — the identical bytes `substringSQL(i, n).getBytes`
    * copies (both clamp a malformed trailing codepoint's overshoot to
    * the buffer end; boundaries advance by `numBytesForFirstByte`, the
    * same step `numChars()`/`substringSQL` take). */
  def predict(text: UTF8String, labels: Array[String],
              lr: Array[Array[Long]], prior: Array[Long], n: Int): UTF8String = {
    val buckets = lr(0).length
    val bytes = text.toLowerCase().getBytes
    val md = Md5Bucket.md()
    val scores = java.util.Arrays.copyOf(prior, prior.length)
    val ring = new Array[Int](n + 1)
    var off = 0
    var idx = 0
    var done = false
    while (!done) {
      ring(idx % (n + 1)) = off
      if (idx >= n) {
        val start = ring((idx - n) % (n + 1))
        val end = math.min(off, bytes.length)
        val b = (Md5Bucket.h48(md, bytes, start, end - start) % buckets).toInt
        var c = 0
        while (c < scores.length) { scores(c) += lr(c)(b); c += 1 }
      }
      if (off >= bytes.length) done = true
      else {
        off += UTF8String.numBytesForFirstByte(bytes(off))
        idx += 1
      }
    }
    var best = 0
    var c = 1
    while (c < scores.length) {
      if (scores(c) > scores(best)) best = c // strict: first max wins ties
      c += 1
    }
    UTF8String.fromString(labels(best))
  }

  /** Column form; NULL text predicts like '' (the charGrams coalesce). */
  def predictCol(text: Column, labels: Seq[String], lr: Array[Array[Long]],
                 prior: Array[Long], n: Int): Column = {
    import org.apache.spark.sql.functions.{coalesce, lit}
    ColumnBridge.column(LangIdScore(
      ColumnBridge.expression(coalesce(text, lit(""))),
      labels.toArray, lr, prior, n))
  }
}
