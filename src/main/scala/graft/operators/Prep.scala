package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-preparation operators for training pipelines: chunking long
  * documents into model-window pieces, deterministic train/val/test
  * splitting, and sequence packing.
  *
  * All three are deliberately hash/window-deterministic (md5-derived
  * buckets, id-ordered windows) so results are reproducible across runs,
  * cluster layouts, AND engines — each has a value-level DuckDB oracle in
  * `queries/Pipeline.scala`.
  */
object Prep {

  /** md5-derived bucket in [0, buckets): deterministic, engine-portable
    * (DuckDB twin: `('0x'||substr(md5(salt||id),1,8))::BIGINT % buckets`).
    * Salt lets several independent splits coexist over one id space. */
  private[operators] def md5Bucket(id: Column, buckets: Int, salt: String): Column =
    pmod(conv(substring(md5(concat(lit(salt), id.cast("string"))
      .cast("binary")), 1, 8), 16, 10).cast("long"), lit(buckets))

  /** Chunk each document into token windows of `chunkTokens` with
    * `overlap` tokens shared between consecutive chunks — the standard
    * long-document -> model-context-window step. Narrow explode, no
    * shuffle; chunk count per doc ~ n_tokens / (chunkTokens - overlap).
    * Output: (idCol, chunk_idx, chunk_tokens, chunk_text). */
  def chunk(df: DataFrame, idCol: String, textCol: String,
            chunkTokens: Int = 512, overlap: Int = 64): DataFrame = {
    require(overlap < chunkTokens, "overlap must be < chunkTokens")
    val stride = chunkTokens - overlap
    // token array materialized as a column: a plain expression referenced
    // inside the interpreted transform lambda would re-tokenize the doc
    // once per chunk (see Dedup.shingles)
    val toks = col("__toks")
    val starts = sequence(lit(0), greatest(size(toks) - 1, lit(0)),
      lit(stride))
    df.withColumn("__toks", TextAnalysis.tokens(col(textCol)))
      .select(col(idCol), posexplode(
        transform(starts, s => slice(toks, s + 1, lit(chunkTokens)))))
      .select(col(idCol), col("pos").as("chunk_idx"),
        size(col("col")).cast("long").as("chunk_tokens"),
        array_join(col("col"), " ").as("chunk_text"))
  }

  /** Deterministic train/val/test assignment from the md5 of the id: a
    * document lands in the same split on every run, on every engine, and
    * under any repartitioning — the property random() splits lack. Narrow
    * per-row op. Output adds (bucket, split). */
  def hashSplit(df: DataFrame, idCol: String, trainPct: Int = 90,
                valPct: Int = 5, salt: String = "split:"): DataFrame = {
    require(trainPct + valPct <= 100, "trainPct + valPct must be <= 100")
    val bucket = md5Bucket(col(idCol), 100, salt)
    df.withColumn("bucket", bucket)
      .withColumn("split",
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "val")
          .otherwise("test"))
  }

  /** Deterministic stratified sample: the `perGroup` rows with the
    * smallest md5(salt || id) within each group — uniform-ish like a
    * random sample, but reproducible across runs, engines, and
    * repartitioning (the same property [[hashSplit]] gives splits).
    * One shuffle on the group key; rank pushdown (WindowGroupLimit)
    * keeps per-partition state at perGroup rows. */
  def groupSample(df: DataFrame, idCol: String, groupCol: String,
                  perGroup: Int, salt: String = "sample:"): DataFrame = {
    val rank = Window.partitionBy(groupCol)
      .orderBy(md5(concat(lit(salt), col(idCol).cast("string"))
        .cast("binary")).asc, col(idCol).asc)
    df.withColumn("__rn", row_number().over(rank))
      .filter(col("__rn") <= perGroup).drop("__rn")
  }

  /** Per-group frequency cap: keep at most `n` rows per group, the BEST
    * ones under the caller's ordering — the C4/Gopher-style curation
    * step that stops crawl-heavy domains from flooding the training mix
    * ("at most N docs per domain, preferring highest quality"). The
    * complement of [[groupSample]]: same top-N-per-key shape, but ranked
    * by an explicit policy (quality desc) instead of an md5 coin, so
    * what survives is the group's best, not a uniform draw.
    *
    * Deliberately a PLAIN declarative window, not a hand-rolled salted
    * two-phase: Catalyst's WindowGroupLimit rule inserts a map-side
    * partial group-limit BEFORE the shuffle, so every task already emits
    * at most `n` rows per key — shuffle volume is O(n × tasks), and a
    * billion-row hot domain costs its scan, not its shuffle. Hand-
    * scheduling that would re-implement the optimizer (the plan shape is
    * pinned in PlanAuditSpec instead). Callers must make `order` a total
    * order per group (break ties on the id) or the cap boundary is
    * engine-dependent. */
  def capPerGroup(df: DataFrame, groupCol: String, n: Int,
                  order: Seq[Column]): DataFrame = {
    require(n > 0, "cap must be positive")
    val w = Window.partitionBy(groupCol).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n).drop("__rn")
  }

  /** Weighted dataset mixing: keep each row with probability
    * `weights(group)` — evaluated as a deterministic md5 coin per id, so
    * the mixed corpus is bit-reproducible across runs, engines, and
    * cluster layouts (a `rand()` mix is none of those). The corpus
    * assembly step: upsample is out of scope (weights in [0,1] —
    * duplication belongs to the loader); downsampling crawl-heavy
    * sources is exactly this. Narrow per-row op, no shuffle. Groups
    * absent from `weights` keep `defaultWeight`. */
  def weightedSample(df: DataFrame, idCol: String, groupCol: String,
                     weights: Map[String, Double],
                     defaultWeight: Double = 1.0,
                     salt: String = "mix:"): DataFrame = {
    require((weights.values ++ Seq(defaultWeight)).forall(w =>
      w >= 0.0 && w <= 1.0), "weights must be in [0, 1]")
    val buckets = 1000000
    val coin = md5Bucket(col(idCol), buckets, salt)
    // ONE map-literal lookup node, however many groups: the previous
    // nested when-chain grew ~3 expression nodes per weights entry, the
    // same linear-expression-growth ceiling the BPE encode hit — a real
    // crawl mixture weights THOUSANDS of source domains, which would
    // blow Catalyst's recursive Column conversion. try_element_at (not
    // element_at) on purpose: it is NULL-on-miss in every Spark
    // version and ANSI mode, where plain element_at only stopped
    // throwing under ANSI in 3.4 (SPARK-40066) — this op must not
    // change behavior with the session's ansi flag. Misses (group
    // absent from the map) fall to defaultWeight via the coalesce.
    val w =
      if (weights.isEmpty) lit(defaultWeight)
      else coalesce(
        try_element_at(typedLit(weights), col(groupCol).cast("string")),
        lit(defaultWeight))
    df.filter(coin < w * buckets)
  }

  /** Deterministic global shuffle: assign every row its position in the
    * md5-permuted training order. Sorting by a hash of the id IS a
    * uniform pseudo-random permutation, but unlike `orderBy(rand())` it
    * replays identically across runs, engines, and cluster layouts —
    * epoch N of a training job is reproducible byte-for-byte (vary
    * `salt` per epoch).
    *
    * The global rank is computed WITHOUT a global single-partition
    * window: the first two hex chars of the hash are a PREFIX of the
    * sort key, so ordering by (bucket, hash) equals ordering by hash.
    * Phase 1 aggregates 256 bucket counts into exclusive offsets (the
    * only total ordering happens on that 256-row frame); phase 2 is a
    * partition-parallel row_number within each bucket plus the broadcast
    * offset. Both phases scale horizontally — the classic distributed
    * ranking pattern. Output adds (shuffle_pos), 1-based. */
  def deterministicShuffle(df: DataFrame, idCol: String,
                           salt: String = "shuffle:"): DataFrame = {
    val h = md5(concat(lit(salt), col(idCol).cast("string")).cast("binary"))
    val withH = df.withColumn("__h", h)
      .withColumn("__b", conv(substring(col("__h"), 1, 2), 16, 10).cast("int"))
    val offsets = withH.groupBy("__b").agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(sum("__n").over(
          Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select("__b", "__off")
    val win = Window.partitionBy("__b")
      .orderBy(col("__h").asc, col(idCol).asc)
    withH.join(broadcast(offsets), "__b")
      .withColumn("shuffle_pos", col("__off") + row_number().over(win))
      .drop("__h", "__b", "__off")
  }

  /** Sequence packing: assign documents to fixed-budget bins by running
    * token count — the batching step that turns a corpus into
    * max-length training sequences. Documents are sharded by md5(id) so
    * packing parallelizes (each shard packs independently — packing is
    * per-worker in any real loader), then a per-shard id-ordered running
    * sum assigns bin = floor(exclusive_cumsum / maxTokens).
    *
    * Capacity semantics: start-offset binning — a bin may overrun
    * `maxTokens` by at most one document (the one straddling the
    * boundary). Exact first-fit packing needs sequential state and is
    * deliberately not offered as a distributed op; at the loader level
    * the overrun doc is truncated or spilled. Output adds
    * (shard, bin, n_tokens). */
  def packSequences(df: DataFrame, idCol: String, tokenCountCol: String,
                    maxTokens: Long = 8192, shards: Int = 64,
                    salt: String = "pack:"): DataFrame = {
    val shard = md5Bucket(col(idCol), shards, salt)
    val w = Window.partitionBy("shard").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("shard", shard)
      .withColumn("n_tokens", col(tokenCountCol).cast("long"))
      .withColumn("bin",
        floor(coalesce(sum(col("n_tokens")).over(w), lit(0L)) / maxTokens))
  }

  /** Keyed upsert: batch rows REPLACE same-key corpus rows, new-key
    * batch rows append — the daily-refresh merge for a parquet corpus
    * with no table format underneath (recrawled pages supersede their
    * previous crawl; brand-new pages land alongside). Schemas must
    * match by name ([[org.apache.spark.sql.Dataset.unionByName]]
    * enforces it).
    *
    * Scale shape: one `left_anti` join on the key plus a union — the
    * corpus is scanned once and never widened. The anti join carries
    * only the batch's KEY column, so with the usual batch << corpus the
    * key side sits under the broadcast threshold (or AQE converts at
    * runtime) and the corpus never shuffles; the pattern stays correct
    * either way. Duplicate keys WITHIN the batch are passed through —
    * feed the batch through a dedup stage first if its source can
    * repeat keys. */
  def upsert(corpus: DataFrame, batch: DataFrame, key: String): DataFrame =
    corpus.join(batch.select(col(key)), Seq(key), "left_anti")
      .unionByName(batch)
}
