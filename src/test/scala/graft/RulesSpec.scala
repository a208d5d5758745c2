package graft

import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, Project}

/** The DeferProjectionPastTopK rule must fire on expensive-projection
  * top-k plans and must not change results. */
class RulesSpec extends SparkSpec {

  test("rule defers q38's math past the limit") {
    val df = SparkEntry.queries("q38_math_funcs")(spark, sf0001)
    val plan = df.queryExecution.optimizedPlan
    // After the rewrite the outermost operators are projections above the
    // GlobalLimit, not a limit above a sort-over-projection.
    val fired = plan.collectFirst {
      case Project(_, Project(_, _: GlobalLimit)) => true
      case Project(_, _: GlobalLimit)             => true
    }.getOrElse(false)
    assert(fired, s"rule did not fire:\n${plan.treeString}")
  }

  test("rule does not fire when projections are cheap (q32)") {
    val plan = SparkEntry.queries("q32_sort_limit_offset")(spark, sf0001)
      .queryExecution.optimizedPlan
    val fired = plan.collectFirst {
      case Project(_, Project(_, _: GlobalLimit)) => true
    }.getOrElse(false)
    assert(!fired, s"rule fired unexpectedly:\n${plan.treeString}")
  }

  test("rewritten q38 equals the un-rewritten result") {
    import org.apache.spark.sql.functions.expr
    // Same query through the DataFrame API without the rule's SQL path:
    // compute on all rows, then sort+limit (the naive plan).
    val li = Catalog.load(spark, sf0001, "lineitem")
    val naive = li.select(
        expr("l_orderkey"), expr("l_linenumber"),
        expr("round(abs(l_discount-0.05),4) AS a"),
        expr("cast(ceil(l_quantity) AS BIGINT) AS c"),
        expr("cast(floor(l_quantity) AS BIGINT) AS f"),
        expr("round(sqrt(l_extendedprice),4) AS sq"),
        expr("round(ln(l_extendedprice+1),4) AS lg"),
        expr("round(power(l_discount+1,2),4) AS pw"),
        expr("mod(l_orderkey,7) AS md"),
        expr("l_extendedprice"), expr("l_quantity"), expr("l_discount"))
      .orderBy("l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity", "l_discount")
      .limit(500)
      .drop("l_extendedprice", "l_quantity", "l_discount")
    val viaRule = SparkEntry.queries("q38_math_funcs")(spark, sf0001)
    assert(naive.collect().toSeq == viaRule.collect().toSeq)
  }
}
