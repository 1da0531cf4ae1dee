package graft

/** WHOLE-QUERY layout invariance over the real testdata, complementing
  * [[PartitionInvarianceSpec]]'s operator-level grid on synthetic
  * frames: each sampled CONTRACT query runs twice at sf0.001 — once
  * under the suite's session (4 shuffle partitions, default scan
  * splits) and once under a sibling session with a PRIME shuffle width
  * and scan splits forced tiny (`files.maxPartitionBytes` = 64 KB, so
  * even the small parquet inputs fan out to many tasks). Row multisets
  * must be identical: the property that lets the same code ship the
  * same bytes from local[4] and a 1,000-executor cluster.
  *
  * The sample targets partition-SENSITIVE machinery end-to-end:
  * synthetic keys (q_add_pk), seeded sampling/shuffling/splitting
  * (x_sample, ds_shuffle, ds_split, ds_group_sample, ds_mix), iterative
  * fixpoints whose join/agg order moves with partitioning (dd_clusters,
  * txt_bpe), window-over-everything ranks (q_window), hash-bucketed LSH
  * pair generation (dd_minhash_pairs), and the 4dp-ranked PQ cut
  * (sim_topk_pq). All are deterministic BY CONSTRUCTION (md5-derived
  * randomness, integer/floor arithmetic, explicit tie-breaks) — this
  * spec checks none of them leaked a dependence on task layout.
  * Float-mean trajectories (sim_kmeans and friends) are deterministic
  * only up to aggregation-order ulps absorbed by their 6dp rounding;
  * they are certified cross-engine by the oracle instead and
  * deliberately not sampled here.
  */
class ContractLayoutInvarianceSpec extends SparkTestBase {

  private val SfDir = "/root/testdata/sf0.001"

  private val Sampled = Seq(
    "q_add_pk", "q_round_robin", "q_window", "q_salted_join",
    "x_sample", "x_sample_scalable",
    "ds_shuffle", "ds_split", "ds_group_sample", "ds_mix", "ds_pack",
    "dd_exact", "dd_minhash_pairs", "dd_clusters", "dd_spans_cut",
    "txt_bpe", "txt_bpe_tokens", "txt_heavy_hitters",
    "ev_sessionize", "sim_topk_pq", "sim_topk_ivfpq", "x_zorder")

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("sampled contract queries are invariant to shuffle width and scan splits") {
    val wide = spark.newSession()
    wide.conf.set("spark.sql.shuffle.partitions", "7")
    wide.conf.set("spark.sql.files.maxPartitionBytes", (64 * 1024).toString)
    val failures = Sampled.flatMap { name =>
      val q = SparkEntry.queries(name)
      val base = rows(q(spark, SfDir))
      val alt = rows(q(wide, SfDir))
      if (base == alt) None
      else Some(s"$name: ${base.size} vs ${alt.size} rows, first diff: " +
        base.zipAll(alt, "<missing>", "<missing>")
          .find { case (a, b) => a != b }
          .map { case (a, b) => s"$a != $b" }.getOrElse("size only"))
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
