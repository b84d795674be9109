package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, IntegerLiteral, LessThan, LessThanOrEqual, PredicateHelper, RowNumber, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule — rung (d) of the extension ladder: rewrite the
  * ubiquitous window-rank-filter idiom
  *
  * {{{ df.withColumn("rn", row_number().over(partitionBy(p).orderBy(o)))
  *       .where($"rn" <= k).drop("rn") }}}
  *
  * into the bounded-heap [[GroupedTopKNode]] operator, automatically.
  * Users (and the SQL `QUALIFY row_number() ... <= k` pattern) get the
  * O(n log k) / k·|keys|-shuffle physical plan without knowing the custom
  * operator exists; the built-in alternative physically SORTS every group
  * in full (Spark 3.5+'s own `InferWindowGroupLimit` only bounds the
  * per-group BUFFER — the exchange and sort of all n rows remain).
  *
  * Fires ONLY when the rewrite is airtight:
  *  - the Window computes exactly ONE expression, a `row_number()` (rank
  *    ties behave differently — `rank()`/`dense_rank()` can emit more
  *    than k rows — so they are left alone);
  *  - the rank attribute appears in a single `rn <= k`-shaped conjunct
  *    (`<=`, `<`, `= 1`, and their reversed forms) with 1 ≤ k ≤ 10000
  *    (the operator's heap bound), and NOWHERE else — not in the
  *    project list above, not in the other filter conjuncts: the rank
  *    column must be dropped, because GroupedTopK emits survivors, not
  *    rank numbers;
  *  - the partition spec is non-empty (the global case is
  *    `orderBy(...).limit(k)` — Spark already plans TakeOrderedAndProject
  *    for it).
  *
  * Semantics preserved exactly: GroupedTopK implements `row_number`
  * selection (≤ k rows per key); with a non-total order both forms pick
  * arbitrarily among order-equal boundary rows — the same class of
  * nondeterminism, RankLimitRewriteSpec pins the total-order case to
  * byte-equality against the unrewritten plan. Remaining filter conjuncts
  * re-apply ABOVE the top-k (they reference pass-through columns only, so
  * filtering before or after the cut is NOT equivalent — the original
  * plan filters after ranking, and so does the rewrite). */
object RankLimitRewrite extends Rule[LogicalPlan] with PredicateHelper {

  /** `Some(k)` when `cond` is a supported rank-limit comparison on `rn`. */
  private def limitOf(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) if a.exprId == rn.exprId => Some(k)
    case LessThan(a: Attribute, IntegerLiteral(k)) if a.exprId == rn.exprId => Some(k - 1)
    case EqualTo(a: Attribute, IntegerLiteral(1)) if a.exprId == rn.exprId => Some(1)
    case EqualTo(IntegerLiteral(1), a: Attribute) if a.exprId == rn.exprId => Some(1)
    case GreaterThanOrEqual(IntegerLiteral(k), a: Attribute) if a.exprId == rn.exprId => Some(k)
    case GreaterThan(IntegerLiteral(k), a: Attribute) if a.exprId == rn.exprId => Some(k - 1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case p @ Project(projList, Filter(cond,
        Window(Seq(al @ Alias(
          WindowExpression(RowNumber(), WindowSpecDefinition(part, order, _)), _)),
        _, _, child, _))) if part.nonEmpty =>
      val rn = al.toAttribute
      val conjuncts = splitConjunctivePredicates(cond)
      val (rankPreds, rest) = conjuncts.partition(c => limitOf(c, rn).isDefined)
      val rnUnusedElsewhere =
        !projList.exists(_.references.exists(_.exprId == rn.exprId)) &&
          !rest.exists(_.references.exists(_.exprId == rn.exprId))
      rankPreds match {
        case Seq(one) if rnUnusedElsewhere =>
          val k = limitOf(one, rn).get
          if (k >= 1 && k <= 10000) {
            val topk = GroupedTopKNode(part, order, k, child)
            val filtered =
              if (rest.isEmpty) topk else Filter(rest.reduce(And), topk)
            Project(projList, filtered)
          } else p
        case _ => p
      }
  }
}
