package graft.examples

import graft.SparkEntry
import graft.core.Sessions

/** Prints formatted physical plans for headline queries — the operator
  * author's checklist: PushedFilters reaching the scan, pruned ReadSchema,
  * broadcast joins on dim tables, partial aggregation, WholeStageCodegen
  * spans. `sbt "runMain graft.examples.ExplainPlans [query...]"`. */
object ExplainPlans {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("graft-explain")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q1_agg", "q_filter_pred", "q_star_join", "q_topk",
        "dd_ngram_pairs", "sim_topk")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
