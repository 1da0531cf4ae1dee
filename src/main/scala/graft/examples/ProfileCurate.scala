package graft.examples

import graft.operators.{Curate, Prep, TextAnalysis}
import graft.core.Sessions
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Where do ds_curate_capped's seconds go — the decision table, the
  * corpus join-back, or the cap window? Each leg twice (JIT vs steady),
  * noop sink so the sink never pollutes the timing. */
object ProfileCurate {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("profile-curate", Some("local[32]"), Some(32))
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val d = Tables.load(spark, dir, "documents")
    d.count()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // warm-cache regime (what the bench measures: the untimed warmup
    // populates the shingle cache, timed runs reuse it)
    val corpus = d.filter(col("doc_id") >= 50)
    val bench = d.filter(col("doc_id") < 50)
    for (i <- 1 to 3)
      t(s"warm$i decisionTable") {
        noop(Curate.decisionTable(corpus, bench, "doc_id", "text"))
      }
    for (i <- 1 to 3)
      t(s"warm$i kept-only") {
        noop(Curate.decisionTable(corpus, bench, "doc_id", "text")
          .filter(col("kept") === 1)
          .select(col("doc_id"), col("bucket"), col("split")))
      }
    for (i <- 1 to 3)
      t(s"warm$i curate (join-back)") {
        noop(Curate.curate(corpus, bench, "doc_id", "text"))
      }
    for (i <- 1 to 3)
      t(s"warm$i capped full") {
        val curated = Curate.curate(corpus, bench, "doc_id", "text")
        val scored = curated.withColumn("quality",
          TextAnalysis.qualityScore(col("text")))
        noop(Prep.capPerGroup(scored, "source", 10,
            Seq(col("quality").desc, col("doc_id").asc))
          .select("doc_id", "source", "quality", "split")
          .orderBy("doc_id"))
      }
    // per-stage subtrees, warm (mirrors decisionTable's internals)
    locally {
      import graft.operators.Dedup
      import org.apache.spark.sql.expressions.Window
      val id = col("doc_id")
      val scored = corpus.select(id, col("text"),
          TextAnalysis.qualityScore(col("text")).as("quality"),
          TextAnalysis.langId(col("text")).as("lang_pred"))
        .withColumn("q_ok", (col("quality") >= 0.5).cast("int"))
        .withColumn("lang_ok",
          col("lang_pred").isInCollection(Seq("en")).cast("int"))
      val g1 = scored.filter(col("q_ok") === 1 && col("lang_ok") === 1)
        .select(id, col("text"))
      val exWin = Window.partitionBy(md5(col("text").cast("binary")))
      val exFlagged = g1.withColumn("exact_dup",
        (id =!= min(id).over(exWin)).cast("int"))
      val exDocs = exFlagged.filter(col("exact_dup") === 0)
        .select(id, col("text"))
      val pairs = Dedup.ngramJaccardPairs(exDocs, "doc_id", "text", 0.8, 3)
      val ndDupIds = pairs.select(col("id_b").as("doc_id")).distinct()
      val ndDocs = exDocs.join(ndDupIds, Seq("doc_id"), "left_anti")
      val contamIds = Dedup.contaminationPairs(ndDocs, bench, "doc_id",
          "text", 3, 0.8)
        .select(col("corpus_id").as("doc_id")).distinct()
      for (i <- 1 to 2) {
        t(s"stage$i scan only")   { noop(corpus) }
        t(s"stage$i quality only"){ noop(corpus.select(id,
          TextAnalysis.qualityScore(col("text")).as("q"))) }
        t(s"stage$i langid only") { noop(corpus.select(id,
          TextAnalysis.langId(col("text")).as("l"))) }
        t(s"stage$i quality wide"){ noop(corpus.repartition(32).select(id,
          TextAnalysis.qualityScore(col("text")).as("q"))) }
        t(s"stage$i langid wide") { noop(corpus.repartition(32).select(id,
          TextAnalysis.langId(col("text")).as("l"))) }
        t(s"stage$i scored")   { noop(scored) }
        t(s"stage$i exDocs")   { noop(exDocs) }
        t(s"stage$i pairs")    { noop(pairs) }
        t(s"stage$i ndDocs")   { noop(ndDocs) }
        t(s"stage$i contamIds"){ noop(contamIds) }
      }
    }
    // split planning from execution for the capped plan
    for (i <- 1 to 3) {
      val capped = {
        val curated = Curate.curate(corpus, bench, "doc_id", "text")
        val scored = curated.withColumn("quality",
          TextAnalysis.qualityScore(col("text")))
        Prep.capPerGroup(scored, "source", 10,
            Seq(col("quality").desc, col("doc_id").asc))
          .select("doc_id", "source", "quality", "split")
          .orderBy("doc_id")
      }
      t(s"plan$i capped planning") { capped.queryExecution.executedPlan }
      t(s"plan$i capped execution") { noop(capped) }
    }
    spark.stop()
  }
}
