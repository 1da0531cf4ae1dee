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

  // --- parameter binding: a sketch travels with the params that built it

  test("probe params default to the values stamped by the build") {
    val sketch = Sketches.countMin(stream, "k", width = 4, depth = 3)
    val exact = stream.groupBy("k").agg(count(lit(1)).as("exact"))
    // no width/depth passed — must come from the stamp and match the
    // explicit-parameter path exactly
    val fromStamp = Sketches.countMinEstimate(sketch, exact.select("k"), "k")
      .as[(String, Long)].collect().toMap
    val explicit = Sketches.countMinEstimate(sketch, exact.select("k"), "k",
        width = 4, depth = 3)
      .as[(String, Long)].collect().toMap
    assert(fromStamp == explicit)

    val bf = Sketches.bloomBuild(stream, "k", bits = 256, k = 3)
    val stamped = Sketches.bloomMightContain(bf, stream, "k")
      .as[(String, Boolean)].collect().toMap
    assert(stamped.keySet == Set("a", "b", "c", "d"))
    assert(stamped.values.forall(identity)) // members: no false negatives
  }

  test("mismatched probe params throw instead of silently corrupting") {
    val sketch = Sketches.countMin(stream, "k", width = 64, depth = 3)
    val e1 = intercept[IllegalArgumentException] {
      Sketches.countMinEstimate(sketch, stream, "k", width = 256, depth = 3)
    }
    assert(e1.getMessage.contains("width"))
    val e2 = intercept[IllegalArgumentException] {
      Sketches.countMinEstimate(sketch, stream, "k", width = 64, depth = 2)
    }
    assert(e2.getMessage.contains("depth"))

    // Bloom: the wrong bits/k is the one way to manufacture a false
    // negative — the documented contract this binding protects
    val bf = Sketches.bloomBuild(stream, "k", bits = 512, k = 3)
    val e3 = intercept[IllegalArgumentException] {
      Sketches.bloomMightContain(bf, stream, "k", bits = 4096, k = 3)
    }
    assert(e3.getMessage.contains("bits"))
    val e4 = intercept[IllegalArgumentException] {
      Sketches.bloomMightContain(bf, stream, "k", bits = 512, k = 4)
    }
    assert(e4.getMessage.contains("k="))
  }

  test("a sketch frame stripped of metadata requires explicit params") {
    val sketch = Sketches.countMin(stream, "k", width = 4, depth = 3)
    // selectExpr rebuilds attributes without the stamp
    val stripped = sketch.selectExpr("d", "bucket", "cnt + 0 AS cnt")
    val e = intercept[IllegalArgumentException] {
      Sketches.countMinEstimate(stripped, stream, "k")
    }
    assert(e.getMessage.contains("no width metadata"))
    // ...but works when the caller states them
    val est = Sketches.countMinEstimate(stripped, stream.select("k"), "k",
        width = 4, depth = 3)
      .as[(String, Long)].collect().toMap
    assert(est("a") >= 3L)
  }

  test("the stamp survives a parquet round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("bfstamp").toString
    Sketches.bloomBuild(stream, "k", bits = 256, k = 3)
      .write.mode("overwrite").parquet(dir)
    val reread = spark.read.parquet(dir)
    // no explicit params: only possible if (bits, k) rode the schema
    val out = Sketches.bloomMightContain(reread, stream, "k")
      .as[(String, Boolean)].collect().toMap
    assert(out.values.forall(identity))
  }
}
