package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, LocalLimit, LogicalPlan, Project, Sort}
import org.apache.spark.sql.catalyst.rules.Rule

/** Defers an expensive projection past a top-k.
  *
  * `SELECT f(x) FROM t ORDER BY key LIMIT n` parses to
  * `Limit(Sort(Project(f(x), scan)))`: the projection sits BELOW the sort,
  * so every input row pays `f` while only `n` rows survive the top-k. At
  * 100 TB that is billions of discarded evaluations per retained row.
  * Spark's `TakeOrderedAndProject` already evaluates a projection AFTER
  * the top-k — but only when the logical shape is
  * `Limit(Project(Sort(child)))`, and no built-in rule hoists a project
  * above a sort (`PushProjectionThroughLimitAndOffset` moves projects the
  * other way, and only through limits).
  *
  * This rule performs that hoist when it is safe:
  *   - every sort key references only `child` output attributes
  *     (passthrough columns — an ORDER BY on a projected alias must stay
  *     below);
  *   - the projection is deterministic (a deferred rand() would sample a
  *     different row set than the user observed);
  *   - at least one projected expression does real work — pure column /
  *     literal reshuffles gain nothing, so plan churn is avoided.
  *
  * Runs AFTER the operator-optimization fixed point — via the
  * post-optimizer `extraOptimizations` batch (`GraftExtensions.register`)
  * or the pre-CBO once-batch (the `GraftExtensions` session-extensions
  * class); both injection points see the fixed point (column pruning,
  * limit pushdown) already settled, and the output shape does not
  * re-match the rule, so the rewrite is stable. The planner then folds
  * `Limit(Project(Sort(child)))` into `TakeOrderedAndProject`, which keeps
  * only the top-k rows in a bounded per-partition heap and projects those.
  *
  * Reference behavior note: the reference sorts materialized result
  * buffers, so its equivalent queries also project before sorting
  * (mapd-core/QueryEngine/RelAlgExecutor.cpp:1201-1277 executes RelSort on
  * the projected result set); deferring the projection is strictly better
  * than parity.
  */
object DeferProjectPastTopK extends Rule[LogicalPlan] {

  private def doesRealWork(e: NamedExpression): Boolean = e match {
    case _: AttributeReference => false
    case a: Alias => a.child match {
      case _: AttributeReference | _: Literal => false
      case _ => true
    }
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case gl @ GlobalLimit(_,
        ll @ LocalLimit(_, s @ Sort(order, true, p @ Project(list, child), _)))
        if list.exists(doesRealWork) &&
          list.forall(_.deterministic) &&
          order.forall(_.references.subsetOf(child.outputSet)) =>
      gl.copy(child = ll.copy(child = p.copy(child = s.copy(child = child))))
  }
}
