package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches

class SketchesSpec extends SparkTestBase {
  import spark.implicits._

  private val stream = Seq("a", "a", "a", "b", "b", "c", "d", "d", "d", "d")
    .toDF("k")

  test("count-min never under-counts; min-over-rows bounds collisions") {
    val sketch = Sketches.countMin(stream, "k", width = 4, depth = 3)
    val exact = stream.groupBy("k").agg(count(lit(1)).as("exact"))
    val est = Sketches.countMinEstimate(sketch, exact.select("k"), "k",
        width = 4, depth = 3)
      .join(exact, "k").as[(String, Long, Long)].collect()
    assert(est.nonEmpty)
    est.foreach { case (k, e, x) =>
      assert(e >= x, s"$k under-counted: $e < $x")
    }
    // total sketch mass = depth * stream size (each row increments depth cells)
    val mass = sketch.agg(sum("cnt")).head().getLong(0)
    assert(mass == 3L * 10)
  }

  test("count-min estimates 0 for keys whose buckets were never touched") {
    val sketch = Sketches.countMin(Seq("onlykey").toDF("k"), "k",
      width = 1024, depth = 3)
    val est = Sketches.countMinEstimate(sketch,
        Seq("neverseen-xyz").toDF("k"), "k", width = 1024, depth = 3)
      .as[(String, Long)].head()
    assert(est._2 == 0L)
  }

  test("bloom filter has no false negatives and a sane filter size") {
    val members = (0 until 50).map(i => s"m$i").toDF("k")
    val bf = Sketches.bloomBuild(members, "k", bits = 1024, k = 4)
    assert(bf.count() <= 1024 / 32)
    val probes = ((0 until 50).map(i => s"m$i") ++
      (0 until 200).map(i => s"x$i")).toDF("k")
    val out = Sketches.bloomMightContain(bf, probes, "k",
        bits = 1024, k = 4)
      .as[(String, Boolean)].collect().toMap
    (0 until 50).foreach(i =>
      assert(out(s"m$i"), s"false negative on m$i"))
    // false positives allowed but must be the minority at this sizing
    val fp = (0 until 200).count(i => out(s"x$i"))
    assert(fp < 50, s"implausible FP count $fp/200")
  }

  test("bloom membership is deterministic across rebuilds") {
    val members = (0 until 30).map(i => s"m$i").toDF("k")
    val probes = (0 until 100).map(i => s"p$i").toDF("k")
    def run() = Sketches.bloomMightContain(
      Sketches.bloomBuild(members, "k", bits = 256, k = 3),
      probes, "k", bits = 256, k = 3)
      .as[(String, Boolean)].collect().toMap
    assert(run() == run())
  }
}
