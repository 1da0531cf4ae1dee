package graft

import graft.functions.VectorFunctions
import graft.plans.VectorExpressions

class VectorDotSpec extends SparkTestBase {
  import spark.implicits._

  test("VectorDot matches interpreted fold bit-for-bit on float arrays") {
    val df = Seq(
      (Array(0.1f, -0.2f, 0.3f), Array(0.4f, 0.5f, -0.6f)),
      (Array(1.5f, 2.5f), Array(-1.0f, 4.0f))).toDF("a", "b")
    import org.apache.spark.sql.functions._
    val interpreted = df.select(
      aggregate(zip_with(transform($"a", _.cast("double")),
          transform($"b", _.cast("double")), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x)).as[Double].collect()
    val codegen = df.select(VectorExpressions.vectorDot($"a", $"b"))
      .as[Double].collect()
    assert(codegen.toSeq == interpreted.toSeq) // exact, not approximate
  }

  test("VectorDot: null array -> null; null elements contribute 0") {
    val df = Seq(
      (Some(Seq(Some(1.0), None, Some(3.0))), Some(Seq(Some(2.0), Some(5.0), Some(4.0)))),
      (None, Some(Seq(Some(1.0))))).toDF("a", "b")
    val out = df.select(VectorExpressions.vectorDot($"a", $"b")).collect()
    assert(out(0).getDouble(0) == 14.0) // 1*2 + skip + 3*4
    assert(out(0.toInt + 1).isNullAt(0))
  }

  test("VectorDot length mismatch uses min length (defensive)") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(10.0f))).toDF("a", "b")
    assert(df.select(VectorExpressions.vectorDot($"a", $"b"))
      .collect()(0).getDouble(0) == 10.0)
  }

  test("vector_dot registered for SQL callers") {
    VectorExpressions.register(spark)
    Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
      .createOrReplaceTempView("vecs")
    assert(spark.sql("select vector_dot(a, b) from vecs")
      .collect()(0).getDouble(0) == 11.0)
    assert(spark.sql(
      "select vector_eq_count(array(1L,2L), array(1L,3L)) c")
      .collect()(0).getInt(0) == 1)
  }

  test("cosine built on VectorDot stays exact for unit cases") {
    val df = Seq((Array(1.0f, 0.0f), Array(0.0f, 1.0f))).toDF("a", "b")
    assert(df.select(VectorFunctions.cosine($"a", $"b"))
      .collect()(0).getDouble(0) == 0.0)
  }

  test("VectorProject equals a per-row scala reference computation") {
    val planes = Seq(Seq(1.0, 0.0, 0.0), Seq(0.5, -0.5, 2.0))
    val rows = Seq(Array(1.0f, 2.0f, 3.0f), Array(-1.0f, 0.0f, 4.0f))
    val out = rows.map(r => Tuple1(r)).toDF("v")
      .select(VectorExpressions.vectorProject($"v", planes, 0.5))
      .collect().map(_.getSeq[Double](0).toSeq)
    val expected = rows.map { r =>
      planes.map(p => 0.5 * p.zip(r.map(_.toDouble)).map {
        case (a, b) => a * b }.sum).toSeq
    }
    assert(out.toSeq == expected)
  }

  test("randomProject: deterministic, right shape, replays across calls") {
    import org.apache.spark.sql.functions._
    val df = (0 until 20).map(i =>
      (i.toLong, Array.tabulate(8)(d => ((i * 7 + d) % 5 - 2).toFloat)))
      .toDF("vec_id", "embedding")
    val p1 = graft.operators.Similarity
      .randomProject(df, "embedding", outDim = 4)
      .select($"vec_id", $"projection").as[(Long, Seq[Double])]
      .collect().toMap
    assert(p1.values.forall(_.length == 4))
    val p2 = graft.operators.Similarity
      .randomProject(df, "embedding", outDim = 4)
      .select($"vec_id", $"projection").as[(Long, Seq[Double])]
      .collect().toMap
    assert(p1 == p2)
    // matches the md5 planes applied by hand (scale 1/sqrt(4) = 0.5)
    val planes = graft.operators.Dedup.md5Planes(1, 4, 8, "rp:").head
    val vec0 = Array.tabulate(8)(d => ((d % 5) - 2).toDouble)
    val exp0 = planes.map(p => 0.5 * p.zip(vec0).map {
      case (a, b) => a * b }.sum)
    assert(p1(0L) == exp0)
  }

  test("VectorEqCount matches the zip_with/aggregate HOF form exactly") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      (Seq(1L, 2L, 3L, 4L), Seq(1L, 9L, 3L, 4L)),   // 3 agree
      (Seq(5L, 5L), Seq(5L, 5L)),                   // all agree
      (Seq(1L, 2L, 3L), Seq(1L)),                   // length mismatch: 1
      (Seq.empty[Long], Seq(7L)))                   // empty side: 0
      .toDF("a", "b")
    val hof = df.select(aggregate(zip_with(col("a"), col("b"),
        (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, x) => acc + x).as("c")).as[Int].collect().toSeq
    val fast = df.select(graft.plans.VectorExpressions
      .vectorEqCount(col("a"), col("b")).as("c")).as[Int].collect().toSeq
    assert(fast == hof)
    assert(fast == Seq(3, 2, 1, 0))
    // null input array -> null, mirroring the HOF
    val withNull = Seq((Some(Seq(1L)), Option.empty[Seq[Long]]))
      .toDF("a", "b")
      .select(graft.plans.VectorExpressions.vectorEqCount(col("a"), col("b")))
      .collect()
    assert(withNull.head.isNullAt(0))
  }
}
