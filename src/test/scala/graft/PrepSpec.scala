package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Prep

class PrepSpec extends SparkTestBase {
  import spark.implicits._

  test("chunk windows tokens with overlap; trailing chunk is short") {
    val df = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Prep.chunk(df, "doc_id", "text", chunkTokens = 4, overlap = 1)
      .orderBy("chunk_idx")
      .select("chunk_idx", "chunk_tokens", "chunk_text")
      .as[(Int, Long, String)].collect().toSeq
    // stride 3: starts 0,3,6,9 -> [t1..t4], [t4..t7], [t7..t10], [t10]
    assert(out == Seq(
      (0, 4L, "t1 t2 t3 t4"),
      (1, 4L, "t4 t5 t6 t7"),
      (2, 4L, "t7 t8 t9 t10"),
      (3, 1L, "t10")))
  }

  test("deterministicShuffle is a replayable permutation matching the hash order") {
    val n = 300
    val df = (0L until n).toDF("doc_id")
    val out = Prep.deterministicShuffle(df, "doc_id")
      .select("doc_id", "shuffle_pos")
      .as[(Long, Long)].collect()
    // a permutation of 1..n
    assert(out.map(_._2).sorted.toSeq == (1L to n).toSeq)
    // equal to the reference single-partition global ordering
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(id: Long) = md.digest(s"shuffle:$id".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val expected = (0L until n).sortBy(id => (h(id), id))
      .zipWithIndex.map { case (id, i) => id -> (i + 1L) }.toMap
    assert(out.toMap == expected)
    // replay: second invocation identical; different salt permutes differently
    val again = Prep.deterministicShuffle(df, "doc_id")
      .select("doc_id", "shuffle_pos").as[(Long, Long)].collect().toMap
    assert(again == expected)
    val epoch2 = Prep.deterministicShuffle(df, "doc_id", salt = "shuffle2:")
      .select("doc_id", "shuffle_pos").as[(Long, Long)].collect().toMap
    assert(epoch2 != expected)
  }

  test("chunk of a short doc is a single chunk") {
    val df = Seq((1L, "a b")).toDF("doc_id", "text")
    val out = Prep.chunk(df, "doc_id", "text", 512, 64).collect()
    assert(out.length == 1 && out(0).getLong(2) == 2L)
  }

  test("hashSplit is deterministic, covers all rows, respects percentages") {
    val df = (0L until 1000L).toDF("doc_id")
    val s1 = Prep.hashSplit(df, "doc_id", trainPct = 80, valPct = 10)
    val s2 = Prep.hashSplit(df, "doc_id", trainPct = 80, valPct = 10)
    val counts = s1.groupBy("split").count().as[(String, Long)]
      .collect().toMap
    assert(counts.values.sum == 1000L)
    // md5 buckets are uniform: 80/10/10 within a loose tolerance
    assert(counts("train") > 700 && counts("train") < 900)
    assert(counts("val") > 50 && counts("val") < 160)
    // same assignment on recompute
    assert(s1.orderBy("doc_id").select("split").collect().toSeq ==
      s2.orderBy("doc_id").select("split").collect().toSeq)
  }

  test("groupSample takes exactly perGroup rows per group, deterministically") {
    val df = (0L until 100L).map(i => (i, s"g${i % 4}")).toDF("id", "grp")
    val s1 = Prep.groupSample(df, "id", "grp", perGroup = 5)
      .orderBy("grp", "id").select("id").as[Long].collect().toSeq
    val s2 = Prep.groupSample(df, "id", "grp", perGroup = 5)
      .orderBy("grp", "id").select("id").as[Long].collect().toSeq
    assert(s1 == s2)
    val counts = Prep.groupSample(df, "id", "grp", 5)
      .groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(counts.values.toSet == Set(5L))
    // a different salt draws a different sample
    val s3 = Prep.groupSample(df, "id", "grp", 5, salt = "other:")
      .orderBy("grp", "id").select("id").as[Long].collect().toSeq
    assert(s1 != s3)
  }

  test("capPerGroup keeps the best n per group under the given order, " +
      "short groups intact") {
    // score descends with id inside each group, so the cap must keep the
    // LOWEST ids; group g9 has only 2 rows (< cap)
    val df = ((0L until 40L).map(i => (i, s"g${i % 4}", 100.0 - i)) ++
      Seq((100L, "g9", 1.0), (101L, "g9", 2.0))).toDF("id", "grp", "score")
    val out = Prep.capPerGroup(df, "grp", 5,
        Seq(col("score").desc, col("id").asc))
      .orderBy("grp", "id").as[(Long, String, Double)].collect().toSeq
    assert(out.count(_._2 == "g9") == 2) // under-cap group survives whole
    val byGrp = out.filter(_._2 != "g9").groupBy(_._2)
    assert(byGrp.values.forall(_.size == 5))
    // best-by-score = lowest ids per group here
    assert(byGrp("g0").map(_._1) == Seq(0L, 4L, 8L, 12L, 16L))
    // tie-break determinism: equal scores fall to the lower id
    val ties = Seq((1L, "t", 7.0), (2L, "t", 7.0), (3L, "t", 7.0))
      .toDF("id", "grp", "score")
    val kept = Prep.capPerGroup(ties, "grp", 2,
        Seq(col("score").desc, col("id").asc))
      .select("id").as[Long].collect().toSeq.sorted
    assert(kept == Seq(1L, 2L))
  }

  test("upsert: batch replaces same-key rows, new keys append, " +
      "untouched corpus rows survive verbatim") {
    val corpus = Seq((1L, "one", "en"), (2L, "two", "en"),
      (3L, "three", "de")).toDF("id", "text", "lang")
    val batch = Seq((2L, "two v2", "en"), (9L, "nine", "zh"))
      .toDF("id", "text", "lang")
    val out = Prep.upsert(corpus, batch, "id")
      .orderBy("id").as[(Long, String, String)].collect().toSeq
    assert(out == Seq((1L, "one", "en"), (2L, "two v2", "en"),
      (3L, "three", "de"), (9L, "nine", "zh")))
    // schema mismatch is an error, not silent column loss
    val bad = Seq((5L, "x")).toDF("id", "text")
    intercept[org.apache.spark.sql.AnalysisException] {
      Prep.upsert(corpus, bad, "id")
    }
  }

  test("weightedSample keeps ~weight per group, deterministically") {
    val df = (0L until 3000L).map(i => (i, s"g${i % 3}")).toDF("id", "grp")
    val w = Map("g0" -> 1.0, "g1" -> 0.3, "g2" -> 0.0)
    val kept = Prep.weightedSample(df, "id", "grp", w)
      .groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(kept("g0") == 1000L)                      // weight 1 keeps all
    assert(!kept.contains("g2"))                     // weight 0 drops all
    assert(kept("g1") > 200 && kept("g1") < 400)     // ~30% of 1000
    // deterministic replay
    val a = Prep.weightedSample(df, "id", "grp", w)
      .select("id").as[Long].collect().toSeq.sorted
    val b = Prep.weightedSample(df, "id", "grp", w)
      .select("id").as[Long].collect().toSeq.sorted
    assert(a == b)
    // unknown group takes defaultWeight
    val d2 = Seq((1L, "other")).toDF("id", "grp")
    assert(Prep.weightedSample(d2, "id", "grp", w, defaultWeight = 1.0)
      .count() == 1L)
    assert(Prep.weightedSample(d2, "id", "grp", w, defaultWeight = 0.0)
      .count() == 0L)
  }

  test("weightedSample at 2000 groups: flat map lookup, no " +
      "expression-depth ceiling") {
    // a real crawl mixture weights thousands of source domains; the
    // pre-fix nested when-chain grew ~3 expression nodes per entry and
    // would blow Catalyst's recursive Column conversion (the BPE-encode
    // failure class). The map-literal form is ONE node at any size —
    // this must build, run, and still honor per-group weights.
    val w = (0 until 2000).map(i =>
      s"g$i" -> (if (i % 2 == 0) 1.0 else 0.0)).toMap
    val df = (0L until 4000L).map(i => (i, s"g${i % 2000}"))
      .toDF("id", "grp")
    val kept = Prep.weightedSample(df, "id", "grp", w, defaultWeight = 0.5)
    assert(kept.count() == 2000L, "even groups keep all, odd drop all")
    assert(kept.filter(expr("cast(substring(grp, 2) AS int) % 2 = 1"))
      .count() == 0L)
  }

  test("packSequences: bins respect budget except the straddling doc") {
    val df = (0L until 100L).map(i => (i, 100L)).toDF("doc_id", "n_tok")
    val out = Prep.packSequences(df, "doc_id", "n_tok",
        maxTokens = 250, shards = 4)
      .groupBy("shard", "bin").agg(sum("n_tokens").as("tot"),
        count(lit(1)).as("n"))
      .collect()
    // each bin holds docs whose exclusive cumsum < 250·(bin+1): with
    // uniform 100-token docs that is 3 docs (300 tokens — one doc over
    // budget, per start-offset semantics), except each shard's last bin
    assert(out.forall(_.getAs[Long]("tot") <= 350))
    assert(out.forall(_.getAs[Long]("n") <= 3))
  }

  test("GraftExtensions registers vector_dot for config-driven sessions") {
    withExtensionsSession { s =>
      val v = s.sql(
        "SELECT vector_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
        .collect()(0).getDouble(0)
      assert(v == 11.0)
      val c = s.sql(
        "SELECT vector_eq_count(array(1L, 2L, 3L), array(1L, 9L, 3L)) AS c")
        .collect()(0).getInt(0)
      assert(c == 2)
    }
  }

  test("RewriteVectorDot turns the HOF dot pattern into VectorDot") {
    withExtensionsSession { s =>
      import s.implicits._
      // parquet-backed source: a local Seq would be folded to a
      // LocalRelation by ConvertToLocalRelation before the plan is
      // observable
      val dir = java.nio.file.Files.createTempDirectory("graft_rvd_").toString
      Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
        .write.mode("overwrite").parquet(dir)
      s.read.parquet(dir).createOrReplaceTempView("vecs")
      val q = s.sql(
        """SELECT aggregate(zip_with(a, b, (x, y) -> x * y),
          |  CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) AS d FROM vecs"""
          .stripMargin)
      val rewritten = q.queryExecution.optimizedPlan.expressions.exists(
        _.exists(_.isInstanceOf[graft.plans.VectorDot]))
      assert(rewritten, "expected VectorDot in the optimized plan")
      assert(q.collect()(0).getDouble(0) == 11.0)

      // strict mode preserves HOF null semantics: an actual null element
      // yields NULL through the rewritten expression too
      val qn = s.sql(
        """SELECT aggregate(zip_with(
          |    transform(a, e -> IF(e > 1.5D, CAST(NULL AS DOUBLE), e)),
          |    b, (x, y) -> x * y),
          |  CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) AS d FROM vecs"""
          .stripMargin)
      val firedOnNullable = qn.queryExecution.optimizedPlan.expressions
        .exists(_.exists {
          case vd: graft.plans.VectorDot => vd.strict
          case _ => false
        })
      assert(firedOnNullable)
      assert(qn.collect()(0).isNullAt(0)) // a=[1.0, NULL] -> NULL, like the HOF

      // opt-out flag respected
      s.conf.set("spark.graft.rewriteVectorDot", "false")
      try {
        val qoff = s.sql(
          """SELECT aggregate(zip_with(a, b, (x, y) -> x * y),
            |  CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) AS d FROM vecs"""
            .stripMargin)
        assert(!qoff.queryExecution.optimizedPlan.expressions.exists(
          _.exists(_.isInstanceOf[graft.plans.VectorDot])))
      } finally s.conf.set("spark.graft.rewriteVectorDot", "true")
    }
  }

  /** Run a body against a fresh session built through the
    * spark.sql.extensions path, restoring the shared test session after. */
  private def withExtensionsSession(body: SparkSession => Unit): Unit = {
    val prior = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext-test")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      body(s)
    } finally {
      SparkSession.setDefaultSession(prior)
      SparkSession.setActiveSession(prior)
    }
  }
}
