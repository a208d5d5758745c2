package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Defers expensive deterministic projections past a top-k (Sort + Limit).
  *
  * Catalyst plans `SELECT f(x) ... ORDER BY k LIMIT n` as
  * `TakeOrderedAndProject(Project(f(x), scan))` — computing f over EVERY
  * input row before the limit. When the sort keys reference only the
  * projection's input, the projection can run after the limit instead:
  * `Project(f(x), Limit(Sort(k, scan)))` — f over ≤ n rows.
  *
  * Measured effect: q38 (4× BigDecimal `round` + sqrt/ln/power over 600k
  * rows, top-500) drops from ~740ms to scan+sort cost only.
  *
  * Safety: requires (a) every sort key resolves against the projection's
  * child, (b) all projections deterministic, (c) no window/agg in between
  * (pattern only matches Project directly under global Sort under Limit).
  */
object DeferProjectionPastTopK extends Rule[LogicalPlan] {
  private def isCheap(e: Expression): Boolean = e match {
    case _: Attribute | _: Literal => true
    case a: Alias                  => isCheap(a.child)
    case _                         => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    // SELECT f(x) ... ORDER BY k LIMIT n  ⇒  optimizer shape:
    //   GlobalLimit(LocalLimit(Project[out](Sort(Project[f(x)+sortcols](c)))))
    case GlobalLimit(gle,
           LocalLimit(lle,
             Project(outer,
               Sort(order, true, Project(projList, child), hint))))
        if outer.forall(isCheap) &&
           projList.exists(e => !isCheap(e)) &&
           projList.forall(_.deterministic) &&
           order.forall(_.references.subsetOf(child.outputSet)) =>
      // Keep column pruning: scan only what the projection + sort need.
      val needed = AttributeSet(projList.flatMap(_.references)) ++
        AttributeSet(order.flatMap(_.references))
      Project(outer,
        Project(projList,
          GlobalLimit(gle,
            LocalLimit(lle,
              Sort(order, global = true,
                Project(child.output.filter(needed.contains), child), hint)))))

    // Same, without the column-pruning Project above the Sort.
    case GlobalLimit(gle,
           LocalLimit(lle,
             Sort(order, true, Project(projList, child), hint)))
        if projList.exists(e => !isCheap(e)) &&
           projList.forall(_.deterministic) &&
           order.forall(_.references.subsetOf(child.outputSet)) =>
      Project(projList,
        GlobalLimit(gle,
          LocalLimit(lle, Sort(order, global = true, child, hint))))
  }
}
