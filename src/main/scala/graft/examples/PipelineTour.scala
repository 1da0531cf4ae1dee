package graft.examples

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.core.Sessions
import graft.operators.{Dedup, Prep, Search, Similarity, Sketches, TextAnalysis}
import graft.sinks.Sinks
import graft.sources.Tables

/** End-to-end training-data pipeline over the documents corpus — the
  * composition every individual operator exists for:
  *
  *   normalize → quality + repetition filters → language id →
  *   exact dedup → near-dedup (minhash, cluster-exact survivors) →
  *   benchmark decontamination → weighted dataset mix → PII scrub →
  *   substring-span report → BM25 retrieval → epoch shuffle → bloom
  *   eval-set prefilter → incremental day-2 dedup → deterministic
  *   train/val/test split → chunk to context windows → pack into
  *   sequence bins → BPE tokenizer training + merge-artifact ship +
  *   real-token recount → partitioned write + z-ordered copy; plus the
  *   embedding side:
  *   int8 quantization → JL projection → k-means quantizer → IVF top-k.
  *
  * Each stage is lazy; the whole pipeline is ONE Catalyst plan per action
  * (dedup's candidate join is the only pair-wise stage). Run:
  * `sbt "runMain graft.examples.PipelineTour"`.
  */
object PipelineTour {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("graft-pipeline-tour")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    val raw = Tables.load(spark, dir, "documents")
    println(s"raw docs:            ${raw.count()}")

    // 1. canonical text + per-doc stats (narrow, shuffle-free)
    val normed = raw
      .withColumn("norm", TextAnalysis.normalize(col("text")))
      .withColumn("quality", TextAnalysis.qualityScore(col("text")))
      .withColumn("lang_pred", TextAnalysis.langId(col("text")))
      .withColumn("n_tokens", TextAnalysis.tokenCount(col("text")))

    // 2. quality gate + Gopher-style repetition gate (both narrow)
    val filtered = normed
      .filter(col("quality") >= 0.5 && col("n_tokens") >= 10)
      .filter(TextAnalysis.dupNgramFrac(col("text"), 3) <= 0.05 &&
        TextAnalysis.topNgramFrac(col("text"), 2) <= 0.07)
    println(s"after quality gates: ${filtered.count()}")

    // 3. exact dedup on normalized content (one shuffle)
    val exactKept = filtered.join(
      Dedup.exactByContent(filtered, "doc_id", "norm").select("doc_id"),
      Seq("doc_id"), "left_semi")
    println(s"after exact dedup:   ${exactKept.count()}")

    // 4. near-dedup: minhash LSH pairs -> one survivor per transitive
    // duplicate component (union-find), not just greedy keep-first
    val pairs = Dedup.minhashPairs(exactKept, "doc_id", "text",
      threshold = 0.7)
    val survivors = Dedup.keepFirstExact(exactKept, "doc_id", pairs)
    println(s"after near dedup:    ${survivors.count()} " +
      s"(removed ${exactKept.count() - survivors.count()} near-dups)")

    // 5. benchmark decontamination: drop training docs that contain a
    // held-out "benchmark" doc (here: the first 20 ids stand in for an
    // eval set) — the corpus side never shuffles
    val bench = raw.filter(col("doc_id") < 20)
    val contaminated = Dedup.contaminationPairs(
        survivors.filter(col("doc_id") >= 20), bench, "doc_id", "text",
        n = 3, threshold = 0.8)
      .select(col("corpus_id").as("doc_id")).distinct()
    val clean = survivors.join(contaminated, Seq("doc_id"), "left_anti")
    println(s"after decontam:      ${clean.count()}")

    // 6. weighted dataset mix (md5-coin, replayable): keep all en, half
    // zh, a quarter de, 10% of the rest
    val mixed = Prep.weightedSample(clean, "doc_id", "lang",
      Map("en" -> 1.0, "zh" -> 0.5, "de" -> 0.25), defaultWeight = 0.1)
    println(s"after weighted mix:  ${mixed.count()}")

    // 7. deterministic split + chunk + pack — the loader-facing steps
    val split = Prep.hashSplit(mixed, "doc_id", trainPct = 90, valPct = 5)
    val train = split.filter(col("split") === "train")
    val chunks = Prep.chunk(train, "doc_id", "norm",
      chunkTokens = 128, overlap = 16)
    val packed = Prep.packSequences(chunks
        .withColumn("chunk_id",
          concat(col("doc_id"), lit(":"), col("chunk_idx"))),
      "chunk_id", "chunk_tokens", maxTokens = 2048, shards = 8)
    println(s"train chunks:        ${chunks.count()} packed into " +
      s"${packed.select("shard", "bin").distinct().count()} sequence bins")

    // 8. embedding side: int8-quantize (4x smaller, scales cancel in
    // cosine), train the IVF quantizer, probe for neighbors
    val embs = Tables.load(spark, dir, "embeddings")
    val q8 = Similarity.quantizeInt8(embs, "vec_id", "embedding")
    val q8nn = Similarity.bruteForceTopK(q8, q8.filter(col("vec_id") < 4),
      "vec_id", "qvec", k = 3)
    println(s"int8 neighbors (4 queries x 3): ${q8nn.count()}")
    val cents = Similarity.kmeans(embs, "vec_id", "embedding", k = 8,
      iters = 2)
    val nn = Similarity.ivfTopK(embs, embs.filter(col("vec_id") < 4),
      "vec_id", "embedding", cents, k = 3, nProbe = 2)
    println(s"ivf neighbors (4 queries x 3): ${nn.count()}")

    // 9. round-4 stages: PII scrub + span-level substring dedup report +
    // BM25 retrieval + epoch shuffle + bloom prefilter + JL projection
    val scrubbed = mixed.withColumn("norm",
      TextAnalysis.redactPii(col("norm")))
    // span report runs PRE-dedup (on `filtered`): that is where repeated
    // passages still exist to find
    val spans = Dedup.repeatedSpans(filtered, "doc_id", "norm",
      n = 8, minDocs = 2)
    println(s"repeated spans (pre-dedup): ${spans.count()} across " +
      s"${spans.select("doc_id").distinct().count()} docs")
    val hits = Search.bm25TopK(scrubbed, "doc_id", "norm",
      terms = Seq("data", "query"), k = 5)
    println(s"bm25 top-5 for [data, query]: ${hits.count()} hits")
    val epoch1 = Prep.deterministicShuffle(scrubbed, "doc_id",
      salt = "epoch1:")
    println(s"epoch order head:    " +
      epoch1.orderBy("shuffle_pos").select("doc_id").limit(3)
        .collect().map(_.getLong(0)).mkString(","))
    // bloom prefilter: which mixed docs are (probably) in the eval set —
    // broadcastable bits instead of a join against the full eval table
    val bloom = Sketches.bloomBuild(bench.select("doc_id"), "doc_id",
      bits = 1024, k = 3)
    val flagged = Sketches.bloomMightContain(bloom, scrubbed, "doc_id",
      bits = 1024, k = 3).filter(col("might_contain"))
    println(s"bloom-flagged for eval recheck: ${flagged.count()}")
    val projected = Similarity.randomProject(embs, "embedding", outDim = 16)
    println(s"projected 64d->16d:  ${projected.count()} vectors")
    // incremental day-2: pretend ids >= 450 arrive tomorrow
    val day2 = Dedup.incrementalSurvivors(
      raw.filter(col("doc_id") >= 450), clean.filter(col("doc_id") < 450),
      "doc_id", "text", threshold = 0.7)
    println(s"day-2 batch survivors: ${day2.count()}")

    // 10. round-10 stages: train the tokenizer on the CLEANED corpus
    // (training on raw data bakes boilerplate into the vocab), ship its
    // merge artifact, and re-budget in REAL tokens
    val bpePath = Files.createTempDirectory("graft_pipeline_bpe_")
      .resolve("merges").toString
    graft.operators.Bpe.writeMerges(
      graft.operators.Bpe.train(clean, "norm", nMerges = 8), bpePath,
      sourceTag = "pipeline-tour")
    val merges = graft.operators.Bpe.readMerges(spark, bpePath,
      expectedSource = Some("pipeline-tour"))
    val toks = graft.operators.Bpe.encodeTokenCounts(clean, "doc_id",
      "norm", merges)
    println(s"bpe merges:          ${merges.map(m => m._1 + m._2).mkString(",")}")
    println(s"bpe corpus tokens:   " +
      toks.agg(sum("n_tokens")).collect()(0).getLong(0))

    // 11. partitioned write, clustered for downstream range scans
    val out = Files.createTempDirectory("graft_pipeline_").resolve("corpus")
    Sinks.writePartitioned(
      split.select("doc_id", "lang_pred", "quality", "n_tokens", "norm",
        "split"),
      out.toString, Seq("split", "lang_pred"))
    val back = spark.read.parquet(out.toString)
    println(s"written + re-read:   ${back.count()} rows, " +
      s"partitions: ${back.select("lang_pred").distinct().count()} langs" +
      s" x ${back.select("split").distinct().count()} splits")
    // the embedding side's artifact: a z-ordered copy for 2-D selective
    // scans (doc bucket x quality bucket)
    val zout = Files.createTempDirectory("graft_pipeline_z_")
      .resolve("z").toString
    graft.operators.ZOrder.writeZOrdered(
      split.select(col("doc_id"), (col("doc_id") % 65536).as("xb"),
        (col("quality") * 650).cast("long").as("yb"), col("norm")),
      zout, Seq("xb", "yb"), numFiles = 4)
    println(s"z-ordered copy:      ${spark.read.parquet(zout).count()} rows")

    spark.stop()
    println("PipelineTour done.")
  }
}
