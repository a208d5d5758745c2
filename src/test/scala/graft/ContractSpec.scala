package graft

import org.apache.spark.sql.functions._

/** Guards the driver contract itself: the declared inventory is complete
  * and the core plan shapes hold (pushdown, pruning, broadcast). */
class ContractSpec extends SparkSpec {

  test("inventory: q01-q46 all declared with oracles") {
    val core = (1 to 46).map(i => f"q$i%02d")
    core.foreach { prefix =>
      assert(SparkEntry.queries.keys.exists(_.startsWith(prefix)),
        s"missing core query $prefix")
      assert(SparkEntry.oracleSql.keys.exists(_.startsWith(prefix)),
        s"missing oracle for $prefix")
    }
  }

  test("inventory: extension queries x47-x51 oracle-checked, x52+ rows-only") {
    ((47 to 51).map(i => s"x$i") ++ Seq("x58", "x60", "x61", "x62", "x63")).foreach { p =>
      assert(SparkEntry.oracleSql.keys.exists(_.startsWith(p)), s"$p needs an oracle")
    }
    (52 to 57).map(i => s"x$i").:+("x59").foreach { p =>
      assert(SparkEntry.queries.keys.exists(_.startsWith(p)), s"$p missing")
    }
  }

  test("every oracle key has a queries twin") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("q02 pushes its filter into the parquet scan") {
    val plan = SparkEntry.queries("q02_project_filter")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)]"), plan)
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double>"), plan)
  }

  test("q16 broadcasts all three dimension sides") {
    val plan = SparkEntry.queries("q16_multiway_join")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).size == 3, plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("q10 top-k compiles to TakeOrderedAndProject, not a global sort") {
    val plan = SparkEntry.queries("q10_topk_users")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("observe metrics: parse counters without a second pass") {
    val events = Catalog.load(spark, sf0001, "events")
    val (parsed, obs) = graft.sources.LogLines.parseWithMetrics(
      graft.sources.LogLines.renderEvents(events))
    parsed.write.mode("overwrite").format("noop").save()
    val m = obs.get
    assert(m("lines") == events.count())
    assert(m("parsed") == events.count())
  }
}
