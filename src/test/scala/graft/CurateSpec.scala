package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.Curate

class CurateSpec extends SparkTestBase {
  import spark.implicits._

  // one doc per curation fate, each engineered to trip exactly one gate:
  //   1 good unique english            -> kept
  //   2 exact copy of 1                -> exact_dup
  //   3 german                         -> lang gate (quality passes)
  //   4 three low-quality tokens       -> quality gate (langid 'und' too)
  //   5 one-token edit of 1 (j=9/11)   -> near_dup
  //   6 contains the bench doc's grams -> contaminated
  //   7 good unique english            -> kept
  private val a = "the cat and the dog went to the park in the morning"
  private def corpus = Seq(
    (1L, a),
    (2L, a),
    (3L, "der hund ist nicht mit der katze und das haus ist gross"),
    (4L, "x y z"),
    (5L, a.replace("morning", "evening")),
    (6L, "the results show alpha beta gamma delta epsilon and the method is sound here"),
    (7L, "a quick brown fox jumps over the lazy dog while the sun is shining today"))
    .toDF("doc_id", "text")
  private def bench = Seq((100L, "alpha beta gamma delta epsilon"))
    .toDF("doc_id", "text")

  private def table() =
    Curate.decisionTable(corpus, bench, "doc_id", "text")

  test("decisionTable gates docs in sequence, NULL flags past the drop") {
    val rows = table().collect()
      .map(r => r.getLong(0) -> r).toMap
    def flags(id: Long): (Any, Any, Any, Any, Any, Int) = {
      val r = rows(id)
      def g(c: String): Any = r.get(r.fieldIndex(c))
      (g("q_ok"), g("lang_ok"), g("exact_dup"), g("near_dup"),
        g("contaminated"), r.getInt(r.fieldIndex("kept")))
    }
    assert(flags(1L) == ((1, 1, 0, 0, 0, 1)))
    assert(flags(2L) == ((1, 1, 1, null, null, 0)))   // dropped at exact
    assert(flags(3L) == ((1, 0, null, null, null, 0))) // dropped at lang
    assert(flags(4L)._1 == 0)                          // dropped at quality
    assert(flags(4L)._6 == 0)
    assert(flags(5L) == ((1, 1, 0, 1, null, 0)))      // dropped at near-dup
    assert(flags(6L) == ((1, 1, 0, 0, 1, 0)))         // dropped at contam
    assert(flags(7L) == ((1, 1, 0, 0, 0, 1)))
    // split only for kept docs, and a valid value when present
    assert(rows.values.forall { r =>
      val kept = r.getInt(r.fieldIndex("kept")) == 1
      val split = r.get(r.fieldIndex("split"))
      if (kept) Set[Any]("train", "val", "test").contains(split)
      else split == null
    })
  }

  test("curate returns the kept docs with original columns + assignment") {
    val out = Curate.curate(corpus, bench, "doc_id", "text")
    assert(out.columns.toSeq == Seq("doc_id", "text", "bucket", "split"))
    assert(out.select("doc_id").as[Long].collect().toSet == Set(1L, 7L))
  }

  test("KeepPolicy.Best keeps the max-score copy instead of the first") {
    // score = doc_id: the {1,5} near-dup component now keeps 5, not 1 —
    // and 5 (not 1) flows on to the decontamination stage
    val t = Curate.decisionTable(corpus, bench, "doc_id", "text",
      keepPolicy = Curate.KeepPolicy.Best(col("doc_id")))
    val kept = t.filter(col("kept") === 1)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(5L, 7L))
    val nd = t.filter(col("doc_id") === 1L)
      .select("near_dup").as[Int].head()
    assert(nd == 1)
  }

  test("curateStaged produces exactly curate's survivors and splits") {
    val dir = java.nio.file.Files.createTempDirectory("curate_staged")
      .toString
    val staged = Curate.curateStaged(corpus, bench, "doc_id", "text", dir)
      .select("doc_id", "split").as[(Long, String)].collect().toSet
    val single = Curate.curate(corpus, bench, "doc_id", "text")
      .select("doc_id", "split").as[(Long, String)].collect().toSet
    assert(staged == single)
    // every stage left an auditable parquet behind
    for (s <- Seq("gated", "exact", "neardup", "clean"))
      assert(new java.io.File(s"$dir/$s").exists(), s)
    // the equality holds under the Best policy too
    val bp = Curate.KeepPolicy.Best(col("doc_id"))
    val stagedBest = Curate.curateStaged(corpus, bench, "doc_id", "text",
        dir + "_best", keepPolicy = bp)
      .select("doc_id", "split").as[(Long, String)].collect().toSet
    val singleBest = Curate.curate(corpus, bench, "doc_id", "text",
        keepPolicy = bp)
      .select("doc_id", "split").as[(Long, String)].collect().toSet
    assert(stagedBest == singleBest)
  }

  test("decisionTable is layout-independent") {
    val one = table().orderBy("doc_id").collect().toSeq
    val other = Curate.decisionTable(corpus.repartition(7), bench,
      "doc_id", "text").orderBy("doc_id").collect().toSeq
    assert(one == other)
  }

  test("curateStaged resume: completed stages are reused, not recomputed") {
    val dir = java.nio.file.Files.createTempDirectory("curate_resume")
      .toString
    def result() = Curate.curateStaged(corpus, bench, "doc_id", "text",
        dir, resume = true)
      .select("doc_id", "split").as[(Long, String)].collect().toSet
    val fresh = result()
    def mtimes(stage: String): Map[String, Long] = {
      val d = new java.io.File(s"$dir/$stage")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    val (g0, e0) = (mtimes("gated"), mtimes("exact"))
    // simulate a run that died mid-pass: the last stage is torn (its
    // _SUCCESS marker is gone), earlier stages are complete
    assert(new java.io.File(s"$dir/clean/_SUCCESS").delete())
    val resumed = result()
    assert(resumed == fresh, "resume must reproduce the full-run result")
    // completed upstream stages were read back, not rewritten
    assert(mtimes("gated") == g0 && mtimes("exact") == e0,
      "resume recomputed stages whose output was already complete")
    // a parameter change invalidates the fingerprint: every stage is
    // rewritten even under resume, never silently mixed across regimes
    val changed = Curate.curateStaged(corpus, bench, "doc_id", "text",
        dir, minQuality = 0.9, resume = true)
      .select("doc_id", "split").as[(Long, String)].collect().toSet
    assert(mtimes("gated") != g0,
      "resume trusted a stage produced under different parameters")
    val changedSingle = Curate.curate(corpus, bench, "doc_id", "text",
        minQuality = 0.9)
      .select("doc_id", "split").as[(Long, String)].collect().toSet
    assert(changed == changedSingle)
  }
}
