package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Naive-Bayes document score — the whole per-row pipeline of
  * [[graft.ops.TextClassifier.nbScores]] (tokenize, drop empty tokens,
  * md5-48 bucket per token, pos/neg table lookups, integer bit-length
  * odds, left-to-right float log-odds fold from the prior, HALF_UP
  * rounding) as ONE codegen'd call returning a
  * (n_tokens, q2_odds, nb_logodds) struct.
  *
  * r20 OPT (guide §1.2 "per-task work" / §4): the Column form chained
  * five higher-order functions per row (filter, transform → md5,
  * transform ×2 table lookups, zip_with + aggregate ×2) — all
  * interpreted per element, the [[DsirScore]]/[[LmDocScore]] lesson.
  *
  * VALUE-IDENTICAL to the Column derivation by construction: the same
  * UTF8String trim/lower/split tokenization, the same
  * [[Md5Bucket.h48]] % buckets bucket, `length(bin(x))` = 64 − nlz for
  * the positive bit-length terms, `Math.log` on the same double ratios
  * in the same fold order (seeded with ln(posDocs/negDocs), one
  * two-log term added per token left to right), and Catalyst Round's
  * BigDecimal HALF_UP path at scale 6. TextClassifierSpec pins this
  * kernel against the exploded Column derivation. */
case class NbDocScore(child: Expression, pos: Array[Long], neg: Array[Long],
                      posTokens: Long, negTokens: Long,
                      posDocs: Long, negDocs: Long, buckets: Int)
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("q2_odds", LongType, nullable = false),
    StructField("nb_logodds", DoubleType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_nb_doc_score requires a string argument, got " +
        child.dataType.catalogString)

  override def nullSafeEval(input: Any): Any =
    NbDocScore.score(input.asInstanceOf[UTF8String], pos, neg,
      posTokens, negTokens, posDocs, negDocs, buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val posRef = ctx.addReferenceObj("nbPos", pos, "long[]")
    val negRef = ctx.addReferenceObj("nbNeg", neg, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NbDocScore.score($c, $posRef, " +
        s"$negRef, ${posTokens}L, ${negTokens}L, ${posDocs}L, " +
        s"${negDocs}L, $buckets);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_nb_doc_score"
}

object NbDocScore {
  private val WsPattern = UTF8String.fromString("\\s+")

  private def bitLen(x: Long): Long =
    64L - java.lang.Long.numberOfLeadingZeros(x)

  /** The per-row kernel the generated code calls. */
  def score(text: UTF8String, pos: Array[Long], neg: Array[Long],
            posTokens: Long, negTokens: Long, posDocs: Long,
            negDocs: Long, buckets: Int): InternalRow = {
    val w = text.trim().toLowerCase().split(WsPattern, -1)
    val md = Md5Bucket.md()
    val pt = (posTokens + buckets).toDouble
    val nt = (negTokens + buckets).toDouble
    var n = 0L
    var q2 = 0L
    var acc = java.lang.Math.log(posDocs.toDouble / negDocs.toDouble)
    var i = 0
    while (i < w.length) {
      if (w(i).numBytes() > 0) { // the filter(_ =!= "") step
        n += 1L
        val b = (Md5Bucket.h48(md, w(i).getBytes) % buckets).toInt
        val p = pos(b)
        val ng = neg(b)
        q2 += bitLen(p + 1L) - bitLen(ng + 1L)
        acc += java.lang.Math.log((p + 1L).toDouble / pt) -
          java.lang.Math.log((ng + 1L).toDouble / nt)
      }
      i += 1
    }
    // Catalyst Round's double path, verbatim (HALF_UP at scale 6)
    val odds = java.math.BigDecimal.valueOf(acc)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    new GenericInternalRow(Array[Any](n, q2, odds))
  }

  /** Column form over a trained [[graft.ops.TextClassifier.NbModel]];
    * NULL text scores like '' (the wordsSafe convention). */
  def scoreCol(text: Column, m: graft.ops.TextClassifier.NbModel): Column = {
    import org.apache.spark.sql.functions.{coalesce, lit}
    ColumnBridge.column(
      NbDocScore(ColumnBridge.expression(coalesce(text, lit(""))),
        m.pos, m.neg, m.posTokens, m.negTokens, m.posDocs, m.negDocs,
        m.buckets))
  }
}
