package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** 2-D Hilbert-curve index of two pre-normalized coordinates — the
  * better-locality sibling of [[graft.ops.Layout.interleaveBits]]
  * (Morton): consecutive Hilbert positions are ALWAYS grid neighbours
  * (no Morton "seams" where the curve jumps across the key space), so a
  * contiguous index range bounds every dimension at least as tightly —
  * the layout trade lakehouse engines expose as ZORDER vs Hilbert
  * clustering.
  *
  * The classic bitwise xy→d walk (per-level quadrant + rotate/reflect,
  * full-size `n−1−v` inversion), one codegen'd kernel call per row.
  * Inputs MUST already be in [0, 2^bits) ([[graft.ops.Layout
  * .normalizeToBits]]); output is in [0, 4^bits). The DuckDB oracle
  * replays the identical walk as a generated chain of per-level CTE
  * columns ([[graft.queries.CoreQueries.hilbertLocalitySql]]), and
  * LayoutSpec pins the two curve axioms exhaustively on a full grid:
  * bijectivity onto [0, 4^bits) and unit-step adjacency — the property
  * Morton lacks and the reason this expression exists. */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  require(bits >= 1 && bits <= 31, s"1 <= bits <= 31, got $bits")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_hilbert requires two long arguments, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def nullSafeEval(x: Any, y: Any): Any =
    HilbertIndex.xy2d(1L << bits, x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.HilbertIndex.xy2d(${1L << bits}L, $x, $y);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_hilbert"
}

object HilbertIndex {
  /** The classic xy→d walk; `n` = 2^bits. Kept loop-literal (not
    * table-driven) so the oracle's per-level CTE replay maps to it line
    * by line. */
  def xy2d(n: Long, x0: Long, y0: Long): Long = {
    var x = x0; var y = y0; var d = 0L
    var s = n / 2
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Column form over pre-normalized long coordinates. */
  def hilbert(x: Column, y: Column, bits: Int): Column =
    ColumnBridge.column(HilbertIndex(ColumnBridge.expression(x),
      ColumnBridge.expression(y), bits))

  /** The SAME walk as generated DuckDB SQL: one CTE per bit level carrying
    * (hx, hy, hd) forward by NAME — no expression-tree blowup — built from
    * the identical rotate/reflect cases as [[xy2d]]. `from` must provide
    * long columns `x` and `y` already normalized to [0, 2^bits), plus any
    * carry columns listed in `carry`. Returns (cteSql, finalCteName); the
    * Hilbert value is column `hd$bits` of that CTE. */
  def hilbertSqlCtes(from: String, bits: Int, carry: Seq[String]): (String, String) = {
    val n1 = (1L << bits) - 1
    val keep = carry.mkString(", ")
    val init = s"h0 AS (SELECT $keep, x AS hx0, y AS hy0, 0::BIGINT AS hd0 FROM $from)"
    val steps = (1 to bits).map { i =>
      val s = 1L << (bits - i)
      val (px, py, pd) = (s"hx${i - 1}", s"hy${i - 1}", s"hd${i - 1}")
      // the quadrant-bit aliases are LEVEL-SUFFIXED: a bare `rx` carried
      // out of the previous CTE would win DuckDB's name resolution over
      // this SELECT's lateral alias, silently feeding every level after
      // the first with level-1's quadrant bits (caught by the full-grid
      // kernel diff: 65532/65536 positions wrong)
      s"""h$i AS (SELECT $keep,
         |  CASE WHEN ($px & $s) > 0 THEN 1 ELSE 0 END AS rx$i,
         |  CASE WHEN ($py & $s) > 0 THEN 1 ELSE 0 END AS ry$i,
         |  $pd + $s * $s * xor(3 * rx$i, ry$i) AS hd$i,
         |  CASE WHEN ry$i = 1 THEN $px WHEN rx$i = 1 THEN $n1 - $py ELSE $py END AS hx$i,
         |  CASE WHEN ry$i = 1 THEN $py WHEN rx$i = 1 THEN $n1 - $px ELSE $px END AS hy$i
         |FROM h${i - 1})""".stripMargin
    }
    ((init +: steps).mkString(",\n"), s"h$bits")
  }
}
