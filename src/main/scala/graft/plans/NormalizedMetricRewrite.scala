package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Sort}
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.expressions.{DotF32, L2SqF32}

/** Catalyst optimizer rule for the reference's metric-substitution
  * rewrite: on L2-normalized vectors, ascending-L2 ranking is identical
  * to descending-dot ranking (`/root/reference/apps/nvdb_gt_build.cpp:
  * 27-29`, `include/nvdb/gtbin_format.h:11-15`) — and the dot kernel does
  * ~2/3 of the flops of the L2 kernel (no subtraction, no square).
  *
  * The rewrite fires ONLY on sort keys — an ordering expression is
  * consumed by the sort and never projected, so substituting a
  * rank-equivalent expression cannot change any output value. Null
  * placement is pinned (`NullsFirst` preserved from the ascending
  * default) so rows with null vectors keep their position.
  *
  * Opt-in twice over: the session must register [[GraftExtensions]]
  * (`spark.sql.extensions=graft.plans.GraftExtensions` or
  * `builder.withExtensions`) AND set `spark.graft.normalizedRewrite=true`
  * — the caller asserts normalization, exactly like the reference's
  * convention that its gtbin metric is "DotEquivalentL2".
  */
case class NormalizedMetricRewrite() extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    if (conf.getConfString("spark.graft.normalizedRewrite", "false") != "true") plan
    else plan.transform {
      case s @ Sort(orders, _, _, _) =>
        val rewritten = orders.map {
          case so @ SortOrder(L2SqF32(a, b), Ascending, nullOrdering, _) =>
            SortOrder(DotF32(a, b), Descending, nullOrdering, so.sameOrderExpressions)
          case other => other
        }
        if (rewritten == orders) s else s.copy(order = rewritten)
    }
}

/** `spark.sql.extensions` entry point registering graft's optimizer
  * rules (and a place for future strategies).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => NormalizedMetricRewrite())
}
