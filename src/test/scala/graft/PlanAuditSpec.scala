package graft

/** Pins the physical-plan shapes the 100 TB design depends on — the
  * properties `.explain` audits found, frozen as assertions so a future
  * change that silently reintroduces a shuffle, drops a broadcast, or
  * loses scan pushdown fails CI instead of a production run.
  *
  * Assertions read the pre-execution plan (AQE's initial plan): hinted
  * broadcasts, pushed filters, and TakeOrderedAndProject are all decided
  * at planning time, so they are stable to assert on.
  */
class PlanAuditSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"
  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("q_star_join broadcasts all three dimension tables") {
    val p = plan("q_star_join")
    assert("BroadcastHashJoin".r.findAllMatchIn(p).length == 3,
      "expected every dim join to be a broadcast")
    assert(!p.contains("SortMergeJoin"))
  }

  test("q_filter_pred pushes its predicate into the parquet scan") {
    val p = plan("q_filter_pred")
    assert(p.contains("PushedFilters: ["))
    assert(!p.contains("PushedFilters: []"),
      "scan should carry at least one pushed filter")
  }

  test("q1_agg prunes the scan to the referenced columns") {
    val p = plan("q1_agg")
    // ReadSchema must not include unreferenced wide columns
    assert(p.contains("ReadSchema"))
    assert(!p.contains("l_comment") && !p.contains("l_shipdate"))
  }

  test("q_topk is TakeOrderedAndProject, not a global sort + limit") {
    assert(plan("q_topk").contains("TakeOrderedAndProject"))
  }

  test("sim_topk broadcasts the bounded query side") {
    val p = plan("sim_topk")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"))
  }

  test("sim_topk_ivf keeps the probe join broadcast (no corpus shuffle)") {
    val p = plan("sim_topk_ivf")
    assert(!p.contains("SortMergeJoin"),
      "probe-to-lists join must not sort-merge the corpus side")
  }

  test("partial aggregation runs map-side for the flagship agg") {
    val p = plan("q1_agg")
    // two HashAggregate levels: partial then final
    assert("HashAggregate".r.findAllMatchIn(p).length >= 2)
  }

  test("txt_tokens is a pure narrow scan (no exchange except the sort)") {
    val p = plan("txt_tokens")
    assert("Exchange".r.findAllMatchIn(p).length <= 1,
      "per-row text analysis must not shuffle (one range exchange for " +
        "the final orderBy is expected)")
  }
}
