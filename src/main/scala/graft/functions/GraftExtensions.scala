package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** `spark.sql.extensions=graft.functions.GraftExtensions` registers the
  * engine's native expressions with the SQL function registry, so
  * `spark.sql("SELECT graft_dot(a, b) ...")` and `expr("graft_dot(...)")`
  * resolve. DataFrame callers don't need the registry —
  * [[DotProduct.dot]] builds the Column directly. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // custom operator planning: GroupedTopKNode → partial/final bounded-heap
    // execs (see graft.plans.GroupedTopK)
    ext.injectPlannerStrategy(_ => graft.plans.GroupedTopKStrategy)
    // optimizer rule: the row_number()<=k window-filter idiom becomes a
    // GroupedTopKNode automatically (see graft.plans.RankLimitRewrite)
    ext.injectOptimizerRule(_ => graft.plans.RankLimitRewrite)
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        if (children.length != 2) {
          throw new IllegalArgumentException(
            s"graft_dot requires exactly 2 arguments, got ${children.length}")
        }
        DotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_cos"),
      new ExpressionInfo(classOf[CosineSim].getName, "graft_cos"),
      (children: Seq[Expression]) => {
        if (children.length != 2) {
          throw new IllegalArgumentException(
            s"graft_cos requires exactly 2 arguments, got ${children.length}")
        }
        CosineSim(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
      (children: Seq[Expression]) => {
        if (children.length != 1) {
          throw new IllegalArgumentException(
            s"graft_nfc requires exactly 1 argument, got ${children.length}")
        }
        NfcNormalize(children.head)
      }))
  }
}
