package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Defers expensive deterministic projections past a top-k (Sort + Limit).
  *
  * Catalyst plans `SELECT f(x) ... ORDER BY k LIMIT n` as
  * `TakeOrderedAndProject(Project(f(x), scan))` — computing f over EVERY
  * input row before the limit. When the sort keys reference only the
  * projection's input, the projection can run after the limit instead —
  * f over ≤ n rows.
  *
  * Emitted shape (round 9): `Limit(Project(f(x), Sort(k, scan)))` — the
  * projection INSIDE the limit, directly above the sort. That is exactly
  * the pattern `SpecialLimits` plans as ONE terminal
  * `TakeOrderedAndProjectExec(limit, order, projectList, scan)`, whose
  * `executeCollect` runs per-partition top-k heaps, merges on the driver,
  * and only then applies the projection to the ≤ n survivors — a single
  * stage. (The round-4 shape hoisted the projection ABOVE the limit,
  * which forced TakeOrderedAndProject through `doExecute` — a
  * single-partition shuffle plus a second scheduling wave per query, one
  * whole task-launch floor of pure overhead at bench scale; measured via
  * QProbe, SCALE.md §25.)
  *
  * Measured effect: q38 (4× BigDecimal `round` + sqrt/ln/power over 600k
  * rows, top-500) drops from ~950ms to scan+sort cost (~90ms, QProbe
  * no-defer A/B at sf0.1).
  *
  * Safety: requires (a) every sort key resolves against the projection's
  * child, (b) all projections deterministic, (c) no window/agg in between
  * (pattern only matches Project directly under global Sort under Limit).
  * Idempotent: the rewritten shape re-matches arm 1 but its inner
  * projection is no longer cheap-only, so the guard blocks a second fire.
  */
object DeferProjectionPastTopK extends Rule[LogicalPlan] {
  private def isCheap(e: Expression): Boolean = e match {
    case _: Attribute | _: Literal => true
    case a: Alias                  => isCheap(a.child)
    case _                         => false
  }

  /** Compose `outer ∘ projList`: outer is cheap (attributes / aliases of
    * attributes / literals), so composition is exprId substitution that
    * PRESERVES each output's name and exprId. */
  private def compose(outer: Seq[NamedExpression],
                      projList: Seq[NamedExpression]): Seq[NamedExpression] = {
    val byId = projList.map(ne => ne.exprId -> ne).toMap
    outer.map {
      case attr: Attribute => byId.getOrElse(attr.exprId, attr)
      case al @ Alias(attr: Attribute, name) =>
        byId.get(attr.exprId) match {
          case Some(inner: Alias) => Alias(inner.child, name)(al.exprId, al.qualifier)
          case Some(other)        => Alias(other.toAttribute, name)(al.exprId, al.qualifier)
          case None               => al
        }
      case other => other // literal aliases and the like — already self-contained
    }
  }

  private def defer(gle: Expression, lle: Expression,
                    finalProj: Seq[NamedExpression], order: Seq[SortOrder],
                    child: LogicalPlan, hint: Option[SortHint]): LogicalPlan = {
    // Keep column pruning: scan only what the projection + sort need.
    val needed = AttributeSet(finalProj.flatMap(_.references)) ++
      AttributeSet(order.flatMap(_.references))
    GlobalLimit(gle,
      LocalLimit(lle,
        Project(finalProj,
          Sort(order, global = true,
            Project(child.output.filter(needed.contains), child), hint))))
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
      defer(gle, lle, compose(outer, projList), order, child, hint)

    // Same, without the outer column-selection Project above the Sort.
    case GlobalLimit(gle,
           LocalLimit(lle,
             Sort(order, true, Project(projList, child), hint)))
        if projList.exists(e => !isCheap(e)) &&
           projList.forall(_.deterministic) &&
           order.forall(_.references.subsetOf(child.outputSet)) =>
      defer(gle, lle, projList, order, child, hint)
  }
}
