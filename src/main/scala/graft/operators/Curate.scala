package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end training-corpus curation: the standard pre-training data
  * pass — quality gate, language gate, exact dedup, near-dup dedup,
  * benchmark decontamination, train/val/test split — composed as ONE
  * declarative decision table over the corpus. Every stage reuses the
  * already-oracled building block ([[TextAnalysis.qualityScore]],
  * [[TextAnalysis.langId]], [[Dedup.ngramJaccardPairs]],
  * [[Dedup.contaminationPairs]], [[Prep.hashSplit]]'s bucket rule), so
  * the composition inherits each stage's cross-engine verification.
  *
  * Stages run in the conventional (and cheapest) order: the narrow
  * per-row gates first, so the join-bearing dedup stages only see docs
  * that survived them; each later stage's flag is NULL for docs dropped
  * earlier (the stage never evaluated them) — the decision table is an
  * audit log, not just a filter.
  *
  * Scale shape: quality/langid/split are narrow per-row expressions
  * (zero shuffle); exact dedup is one window over md5(content) (one
  * shuffle, no join-back); near-dup is the inverted-index equi-join of
  * [[Dedup.ngramJaccardPairs]]; decontamination broadcasts the (small
  * by construction) benchmark side. Flag join-backs carry only the
  * DROPPED-id set per stage — small relative to the corpus by the
  * nature of dedup, so AQE broadcasts them when they fit and the
  * corpus side never shuffles for a flag; a per-doc flag frame would
  * instead force a corpus-vs-corpus shuffle join per stage.
  *
  * Deliberately UNCACHED, measured: each gated frame has two consumers
  * (next stage + decision join-back), but caching them LOST at sf0.1
  * (4.1 s uncached vs 5.0 s all three gated frames cached vs 4.4 s
  * window-frame only, measured on the earlier per-doc-flag-frame shape;
  * the dropped-id join restructure then cut the query itself to
  * ~2.9 s) — the gates are cheap codegen'd projections, and
  * Tungsten cache materialization of corpus-sized text costs more than
  * re-running them over the columnar scan. The one genuinely expensive
  * shared subtree — the shingle explosion — is already cached inside
  * [[Dedup.ngramJaccardPairs]]. (Contrast dd_spans, where the cached
  * frame is the 10x-blowup gram EXPLOSION, not a per-row projection.)
  */
object Curate {

  /** Near-dup survivor policy for the dedup stage of [[decisionTable]].
    */
  sealed trait KeepPolicy
  object KeepPolicy {
    /** Keep the smallest id ([[Dedup.keepFirst]] semantics): a doc is a
      * near_dup when it is the larger id of any passing pair. One
      * anti-join-shaped flag, no iteration — the default. */
    case object First extends KeepPolicy
    /** Keep the `score`-maximising copy per CONNECTED component
      * ([[Dedup.keepBest]] — min id on ties): the
      * keep-the-best-extraction policy. Adds the adaptive
      * connected-components rounds to the plan. */
    final case class Best(score: Column) extends KeepPolicy
  }

  /** Per-document curation decision table. Output columns:
    * (idCol, quality, lang_pred, q_ok, lang_ok, exact_dup, near_dup,
    * contaminated, kept, bucket, split). Flags are int 1/0, NULL when
    * the doc never reached that stage; bucket/split only for kept docs.
    */
  def decisionTable(corpus: DataFrame, bench: DataFrame, idCol: String,
                    textCol: String, minQuality: Double = 0.5,
                    keepLangs: Seq[String] = Seq("en"),
                    jaccardThreshold: Double = 0.8, n: Int = 3,
                    contamThreshold: Double = 0.8,
                    trainPct: Int = 90, valPct: Int = 5,
                    keepPolicy: KeepPolicy = KeepPolicy.First): DataFrame = {
    val id = col(idCol)
    val scored = corpus.select(id, col(textCol),
        TextAnalysis.qualityScore(col(textCol)).as("quality"),
        TextAnalysis.langId(col(textCol)).as("lang_pred"))
      .withColumn("q_ok", (col("quality") >= minQuality).cast("int"))
      .withColumn("lang_ok",
        col("lang_pred").isInCollection(keepLangs).cast("int"))

    val g1 = scored.filter(col("q_ok") === 1 && col("lang_ok") === 1)
      .select(id, col(textCol))
    // exact stage: survivor = min id per identical content — one window
    // over the content hash ([[Dedup.exactByContent]] semantics without
    // the join-back)
    val exWin = Window.partitionBy(md5(col(textCol).cast("binary")))
    val exFlagged = g1.withColumn("exact_dup",
      (id =!= min(id).over(exWin)).cast("int"))
    // the flag joins below carry only the DROPPED ids per stage — dup
    // sets are small relative to the corpus (AQE broadcasts them when
    // they fit), where a full per-doc flag frame would force a
    // corpus-vs-corpus shuffle join per stage. Presence in the set +
    // "did the doc reach this stage" reconstructs the three-valued flag
    val exDupIds = exFlagged.filter(col("exact_dup") === 1)
      .select(id).withColumn("__ex", lit(1))
    val exDocs = exFlagged.filter(col("exact_dup") === 0)
      .select(id, col(textCol))

    // near-dup stage among exact survivors: dropped = not a survivor of
    // the keepPolicy
    val pairs = Dedup.ngramJaccardPairs(exDocs, idCol, textCol,
      jaccardThreshold, n)
    val ndDupIds = (keepPolicy match {
      case KeepPolicy.First =>
        pairs.select(col("id_b").as(idCol)).distinct()
      case KeepPolicy.Best(score) =>
        exDocs.join(Dedup.keepBest(exDocs, idCol, pairs, score).select(id),
          Seq(idCol), "left_anti").select(id)
    }).withColumn("__nd", lit(1))
    val ndDocs = exDocs.join(ndDupIds.select(id), Seq(idCol), "left_anti")

    // decontamination among near-dup survivors: n-gram containment of
    // any benchmark doc
    val contamIds = Dedup.contaminationPairs(ndDocs, bench, idCol, textCol,
        n, contamThreshold)
      .select(col("corpus_id").as(idCol)).distinct()
      .withColumn("__ct", lit(1))

    val gate1 = col("q_ok") === 1 && col("lang_ok") === 1
    val dec = scored.drop(textCol)
      .join(exDupIds, Seq(idCol), "left")
      .join(ndDupIds, Seq(idCol), "left")
      .join(contamIds, Seq(idCol), "left")
      .withColumn("exact_dup",
        when(gate1, coalesce(col("__ex"), lit(0))))
      .withColumn("near_dup",
        when(gate1 && col("exact_dup") === 0, coalesce(col("__nd"), lit(0))))
      .withColumn("contaminated",
        when(gate1 && col("exact_dup") === 0 && col("near_dup") === 0,
          coalesce(col("__ct"), lit(0))))
      .withColumn("kept",
        (gate1 &&
          coalesce(col("exact_dup"), lit(1)) === 0 &&
          coalesce(col("near_dup"), lit(1)) === 0 &&
          coalesce(col("contaminated"), lit(1)) === 0).cast("int"))
      .drop("__ex", "__nd", "__ct")
    // deterministic split for the kept docs — Prep.hashSplit's exact
    // bucket rule so a doc lands in the same split here and there
    dec.withColumn("bucket",
        when(col("kept") === 1, Prep.md5Bucket(id, 100, "split:")))
      .withColumn("split",
        when(col("kept") === 1,
          when(col("bucket") < trainPct, "train")
            .when(col("bucket") < trainPct + valPct, "val")
            .otherwise("test")))
  }

  /** The curated corpus: original columns of the kept docs plus their
    * (bucket, split) assignment — [[decisionTable]] applied as a filter.
    */
  def curate(corpus: DataFrame, bench: DataFrame, idCol: String,
             textCol: String, minQuality: Double = 0.5,
             keepLangs: Seq[String] = Seq("en"),
             jaccardThreshold: Double = 0.8, n: Int = 3,
             contamThreshold: Double = 0.8,
             trainPct: Int = 90, valPct: Int = 5,
             keepPolicy: KeepPolicy = KeepPolicy.First): DataFrame = {
    val kept = decisionTable(corpus, bench, idCol, textCol, minQuality,
        keepLangs, jaccardThreshold, n, contamThreshold, trainPct, valPct,
        keepPolicy)
      .filter(col("kept") === 1)
      .select(col(idCol), col("bucket"), col("split"))
    corpus.join(kept, Seq(idCol))
  }

  /** [[curate]] with STAGED MATERIALIZATION: each stage writes its
    * survivors to `stageDir/<stage>` as parquet and the next stage reads
    * that — the shape a 100 TB curation run actually takes. The
    * single-plan [[curate]] re-derives the gated corpus per consumer,
    * which is the right trade when the scan is RAM/page-cache-speed
    * (measured — see the class doc) but wrong against cold object
    * storage, where each stage's input should be read ONCE; staging also
    * makes the pass restartable at stage granularity and leaves each
    * intermediate auditable (the same write-once/probe-per-batch
    * argument as `writeMinhashIndex`). Same result as [[curate]]
    * (spec-pinned), minus the audit flags — the dropped docs are gone
    * from the survivor files, not annotated.
    *
    * `resume = true` makes the restartability REAL rather than
    * structural: a stage whose output is already complete (Spark's
    * `_SUCCESS` marker) AND was produced under the SAME parameters is
    * read back instead of recomputed — so a run that died after the
    * near-dup stage redoes only decontamination + split. The parameter
    * fingerprint is stamped into a `_graft_params` sidecar at write
    * time and demanded back on resume (same provenance rule as the
    * minhash index): a stage left by a run with different thresholds,
    * or a torn write, is rewritten, never trusted. Default false —
    * certification runs must always exercise the full write path.
    *
    * Returns the kept docs (id, text + bucket, split), read back from
    * the final stage file.
    */
  def curateStaged(corpus: DataFrame, bench: DataFrame, idCol: String,
                   textCol: String, stageDir: String,
                   minQuality: Double = 0.5,
                   keepLangs: Seq[String] = Seq("en"),
                   jaccardThreshold: Double = 0.8, n: Int = 3,
                   contamThreshold: Double = 0.8,
                   trainPct: Int = 90, valPct: Int = 5,
                   keepPolicy: KeepPolicy = KeepPolicy.First,
                   resume: Boolean = false): DataFrame = {
    val spark = corpus.sparkSession
    val id = col(idCol)
    // the full parameter vector: any change invalidates every stage
    // (downstream stages depend on upstream params transitively, so a
    // per-stage split would buy little and risk mixing regimes)
    val fingerprint = Seq("v1", idCol, textCol, minQuality,
      keepLangs.mkString("|"), jaccardThreshold, n, contamThreshold,
      trainPct, valPct, keepPolicy.toString).mkString(";")
    def stage(name: String, df: => DataFrame): DataFrame = {
      val path = s"$stageDir/$name"
      val marker = java.nio.file.Paths.get(path, "_graft_params")
      val complete = resume &&
        java.nio.file.Files.exists(
          java.nio.file.Paths.get(path, "_SUCCESS")) &&
        java.nio.file.Files.exists(marker) &&
        java.nio.file.Files.readString(marker) == fingerprint
      if (!complete) {
        df.write.mode("overwrite").parquet(path)
        java.nio.file.Files.writeString(marker, fingerprint)
      }
      spark.read.parquet(path)
    }
    val gated = stage("gated", corpus
      .filter(TextAnalysis.qualityScore(col(textCol)) >= minQuality &&
        TextAnalysis.langId(col(textCol)).isInCollection(keepLangs))
      .select(id, col(textCol)))
    val exWin = Window.partitionBy(md5(col(textCol).cast("binary")))
    val exDocs = stage("exact", gated
      .withColumn("__min", min(id).over(exWin))
      .filter(id === col("__min")).drop("__min"))
    val pairs = Dedup.ngramJaccardPairs(exDocs, idCol, textCol,
      jaccardThreshold, n)
    val ndDocs = stage("neardup", keepPolicy match {
      case KeepPolicy.First =>
        Dedup.keepFirst(exDocs, idCol, pairs)
      case KeepPolicy.Best(score) =>
        Dedup.keepBest(exDocs, idCol, pairs, score)
    })
    val contamIds = Dedup.contaminationPairs(ndDocs, bench, idCol, textCol,
      n, contamThreshold).select(col("corpus_id").as(idCol)).distinct()
    val clean = stage("clean",
      Prep.hashSplit(ndDocs.join(contamIds, Seq(idCol), "left_anti"),
        idCol, trainPct, valPct))
    clean
  }
}
