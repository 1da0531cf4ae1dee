package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths, per the standard scale playbook:
  *  - [[bruteForceTopK]]: exact cosine top-k. The *query* side is
  *    broadcast (queries are few), the corpus is scanned once partition-
  *    parallel, and per-query top-k is a TakeOrdered-style window — the
  *    correct exhaustive baseline even at 100 TB when the query set is
  *    bounded.
  *  - [[lshTopK]]: sign-random-projection bucketed search (IVF-style
  *    probe): corpus is pre-bucketed (shuffle once, reusable), each query
  *    probes only matching buckets across tables, then exact cosine ranks
  *    the candidates. Recall is tunable via tables x bits.
  */
object Similarity {

  /** Exact brute-force cosine top-k for each query vector.
    * Output: (query id, neighbor id, cosine), k rows per query. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int = 10,
                     excludeSelf: Boolean = true): DataFrame = {
    // norms computed once per vector, not once per pair
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      normSq(col(vecCol)).as("q_nsq"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"),
      normSq(col(vecCol)).as("c_nsq"))
    val scored = c.crossJoin(broadcast(q))
      .filter(if (excludeSelf) col("neighbor_id") =!= col("query_id") else lit(true))
      .withColumn("cosine", cosineFromParts(dot(col("q_vec"), col("c_vec")),
        col("q_nsq"), col("c_nsq")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select("query_id", "neighbor_id", "cosine")
  }

  /** LSH-bucketed approximate top-k: probe only buckets the query lands
    * in. Same output shape as [[bruteForceTopK]]; neighbors the LSH tables
    * miss are absent (recall < 1 by design).
    *
    * Recall is MEASURED, not asserted: the `sim_recall` query joins this
    * against [[bruteForceTopK]] — recall@5 = 0.85 at sf0.01 (500 isotropic
    * vectors) with tables=16, bits=4, vs 0.175 at tables=8, bits=6. More
    * tables raises recall (union of probes), more bits narrows buckets
    * (fewer candidates, lower recall); size `bits` with corpus growth to
    * keep per-bucket candidate counts roughly constant (buckets ~ 2^bits
    * per table). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int = 10, tables: Int = 8, bits: Int = 10,
              dim: Int = 64, seed: Long = 42L,
              excludeSelf: Boolean = true,
              mode: Dedup.HashMode = Dedup.HashMode.Xx): DataFrame = {
    val cb = Dedup.embeddingBuckets(corpus, idCol, vecCol, tables, bits, dim,
        seed, mode)
      .withColumnRenamed(idCol, "neighbor_id")
    val qb = Dedup.embeddingBuckets(queries, idCol, vecCol, tables, bits, dim,
        seed, mode)
      .withColumnRenamed(idCol, "query_id")
    // query buckets are queries x tables rows — broadcast them so the
    // corpus bucket index never shuffles for the probe join
    val cand = cb.join(broadcast(qb), Seq("table", "bucket"))
      .filter(if (excludeSelf) col("neighbor_id") =!= col("query_id") else lit(true))
      .select("query_id", "neighbor_id").distinct()
    val qv = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      normSq(col(vecCol)).as("q_nsq"))
    val cv = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"),
      normSq(col(vecCol)).as("c_nsq"))
    val scored = cand.join(broadcast(qv), "query_id").join(cv, "neighbor_id")
      .withColumn("cosine", cosineFromParts(dot(col("q_vec"), col("c_vec")),
        col("q_nsq"), col("c_nsq")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select("query_id", "neighbor_id", "cosine")
  }

  /** IVF coarse assignment: each vector joins its nearest centroid by
    * cosine (ties broken by centroid id). Centroids are broadcast (k is
    * small); one narrow pass over the corpus — the "build inverted lists"
    * half of IVF. Output: (idCol, cid). */
  def ivfAssign(df: DataFrame, idCol: String, vecCol: String,
                centroids: DataFrame, cidCol: String = "cid",
                centCol: String = "centroid",
                nProbe: Int = 1): DataFrame = {
    val scored = df.crossJoin(broadcast(
        centroids.select(col(cidCol), col(centCol))))
      .withColumn("c_cos", cosineFromParts(
        dot(col(vecCol), col(centCol)),
        normSq(col(vecCol)), normSq(col(centCol))))
    if (nProbe == 1) {
      // the corpus-side hot path: argmax as a hash aggregate (map-side
      // partials, no sort) instead of a window — min over the struct
      // (-cos, cid) is lexicographically "max cosine, tie -> min cid",
      // identical semantics to the window form below
      scored.groupBy(col(idCol)).agg(
        min_by(col(cidCol), struct(negate(col("c_cos")), col(cidCol)))
          .as(cidCol))
    } else {
      val w = Window.partitionBy(idCol)
        .orderBy(col("c_cos").desc, col(cidCol).asc)
      scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= nProbe)
        .select(col(idCol), col(cidCol))
    }
  }

  /** IVF-style approximate top-k: corpus vectors are inverted-listed under
    * their nearest centroid, each query probes only its `nProbe` nearest
    * lists, and exact cosine ranks the candidates — the classic
    * coarse-quantizer ANN, complementing the hyperplane-LSH path in
    * [[lshTopK]].
    *
    * The centroid set is an input (any (cid, centroid) frame): here it
    * comes from [[labelCentroids]]; production would train unsupervised
    * k-means — itself expressible as iterated [[ivfAssign]] +
    * posexplode-mean (the [[labelCentroids]] aggregation shape), one
    * shuffle per iteration. Recall is governed by nProbe/k (probing all k
    * lists degenerates to exact search restricted by quantization).
    * Corpus-side cost at scale: one broadcast-join pass to build lists
    * (no shuffle of the corpus), then each query touches only its probed
    * lists. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, centroids: DataFrame, k: Int = 10,
              nProbe: Int = 3, cidCol: String = "cid",
              centCol: String = "centroid",
              excludeSelf: Boolean = true): DataFrame = {
    val lists = ivfAssign(corpus, idCol, vecCol, centroids, cidCol, centCol)
      .withColumnRenamed(idCol, "neighbor_id")
    val probes = ivfAssign(queries, idCol, vecCol, centroids, cidCol,
        centCol, nProbe)
      .withColumnRenamed(idCol, "query_id")
    // probes is queries x nProbe rows — broadcast it so the inverted
    // lists (corpus-sized) never shuffle
    val cand = broadcast(probes).join(lists, cidCol)
      .filter(if (excludeSelf) col("neighbor_id") =!= col("query_id")
              else lit(true))
      .select("query_id", "neighbor_id").distinct()
    val qv = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      normSq(col(vecCol)).as("q_nsq"))
    val cv = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"),
      normSq(col(vecCol)).as("c_nsq"))
    val scored = cand.join(broadcast(qv), "query_id").join(cv, "neighbor_id")
      .withColumn("cosine", cosineFromParts(dot(col("q_vec"), col("c_vec")),
        col("q_nsq"), col("c_nsq")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select("query_id", "neighbor_id", "cosine")
  }

  /** Deterministic k-means over an embedding column — the unsupervised
    * coarse-quantizer trainer for [[ivfTopK]]. Init is the k lowest-id
    * vectors (deterministic and engine-portable, unlike random init);
    * each iteration is one broadcast assignment pass ([[ivfAssign]]) plus
    * one posexplode-mean aggregation (the [[labelCentroids]] shape) — a
    * bounded number of shuffles per iteration, never a pair-space blowup,
    * so iterations scale exactly like a window aggregate. Centroid
    * components round to 6dp per iteration so independent runs — and
    * independent ENGINES — walk bit-identical trajectories (the
    * `sim_kmeans` query is value-verified against a DuckDB unrolling of
    * the same iterations). Per-iteration `localCheckpoint` truncates the
    * growing lineage. A cluster left empty by an iteration drops out
    * (standard k-means behavior; k shrinks). */
  def kmeans(df: DataFrame, idCol: String, vecCol: String, k: Int,
             iters: Int = 5): DataFrame = {
    var cents = df.orderBy(col(idCol)).limit(k)
      .select(col(idCol), toDouble(col(vecCol)).as("centroid"))
      .withColumn("cid",
        row_number().over(Window.orderBy(col(idCol))) - 1)
      .select(col("cid"),
        transform(col("centroid"), x => round(x, 6)).as("centroid"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val assigned = ivfAssign(df, idCol, vecCol, cents)
      val members = df.join(assigned, idCol)
      val sums = members
        .select(col("cid"), posexplode(toDouble(col(vecCol))))
        .groupBy(col("cid"), col("pos"))
        .agg(sum(col("col")).as("s"), count(lit(1)).as("n"))
      cents = sums.groupBy(col("cid")).agg(
        transform(array_sort(collect_list(struct(col("pos"),
            round(col("s") / col("n"), 6).as("m")))),
          x => x.getField("m")).as("centroid"))
        .localCheckpoint()
    }
    cents
  }

  /** Label centroids: average embedding per label — a representative
    * "analytics over vectors" op (group agg over array columns, no UDF).
    *
    * Shape: posexplode -> aggregate on (label, pos) -> re-assemble the
    * vector ordered by pos. The earlier formulation built `dim` separate
    * `sum(element_at(...))` aggregate columns, which means `dim` slots of
    * hash-agg state per group — fine at dim=64, pathological at dim=4096.
    * Here agg state is one sum per (label, pos) key with map-side partials,
    * so the op scales in `dim` the same way it scales in row count. The
    * `dim` parameter is gone: the vector length is read from the data. */
  def labelCentroids(df: DataFrame, labelCol: String,
                     vecCol: String): DataFrame = {
    val sums = df.select(col(labelCol), posexplode(toDouble(col(vecCol))))
      .groupBy(col(labelCol), col("pos")).agg(sum(col("col")).as("s"))
    // array_sort on array<struct<pos,s>> orders by pos (first field) —
    // re-assembling each centroid in component order
    val vecs = sums.groupBy(col(labelCol)).agg(
      transform(array_sort(collect_list(struct(col("pos"), col("s")))),
        x => x.getField("s")).as("sum_vec"))
    val counts = df.groupBy(col(labelCol)).agg(count(lit(1)).as("n"))
    vecs.join(counts, labelCol)
      .select(col(labelCol),
        transform(col("sum_vec"), x => x / col("n")).as("centroid"), col("n"))
  }
}
