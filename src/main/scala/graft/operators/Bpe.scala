package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING as a distributed pipeline — the
  * canonical tokenizer-fitting job a training-data platform runs before
  * any token budget, packing, or dedup-by-token stage can exist
  * (reference keeps text as opaque utf8 columns; cf. src/datasets.rs —
  * tokenization is the first thing a consumer adds on top).
  *
  * The trainer works on the WORD-FREQUENCY dict, not the corpus: one
  * corpus pass builds (word, count), and every merge iteration after
  * that touches only distinct words — the Zipf factor (occurrences /
  * distinct words) is the scale win, exactly why classic BPE trainers
  * count over a word dict. At 100 TB the corpus pass is one shuffle;
  * the per-iteration pair-count groupBy is vocabulary-sized.
  *
  * Everything is deterministic and ENGINE-PORTABLE so the merge
  * trajectory replays bit-identically in the DuckDB oracle
  * (`txt_bpe`):
  *  - normalization strips to [A-Za-z ]+ BEFORE lowercasing (ASCII
  *    lower is portable; unicode case folding is not),
  *  - the best pair is (max count, lexicographically-least "l r")
  *    — both total orders,
  *  - merge application is plain substring `replace` on a
  *    double-space-padded symbol string (see [[applyMerge]]) — no
  *    regex, because RE2 (DuckDB) has no lookbehind, and plain
  *    left-to-right non-overlapping replace IS greedy BPE merge order.
  *
  * No UDFs anywhere: symbol strings flow through codegen'd string
  * builtins, the driver loop holds only the iteration counter, and the
  * per-step frames are stats-truncating-checkpointed like the k-means
  * and CC loops ([[graft.plans.Checkpoints]]).
  */
object Bpe {

  /** Portable normalization: strip to letters/spaces FIRST (so `lower`
    * only ever sees ASCII), then split on runs of spaces. */
  private[graft] def normalizeWords(textCol: Column): Column =
    split(trim(lower(regexp_replace(textCol, "[^A-Za-z ]+", " "))), " +")

  /** A word as its BPE symbol string: single-space-joined characters
    * ("hello" -> "h e l l o"). Merges only ever change the spacing. */
  private[graft] def symbolize(word: Column): Column =
    trim(regexp_replace(word, "(.)", "$1 "))

  /** One corpus pass -> (ws: symbol string, cnt): the word-frequency
    * dict every iteration trains against. */
  def wordFrequencies(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(normalizeWords(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .select(symbolize(col("word")).as("ws"), col("cnt"))

  /** Apply one merge (lft, rgt) -> lft||rgt to a symbol string with
    * greedy left-to-right non-overlapping semantics — the BPE rule —
    * using only plain `replace`:
    * double every separator space and pad, so each boundary owns TWO
    * spaces and the pattern " lft  rgt " can claim one space on each
    * side without starving the adjacent match ("a b a b" merges BOTH
    * pairs; "a a a" merges only the left one, exactly like the
    * reference BPE implementations); then collapse the doubled spaces
    * and trim. Portable: `replace` is left-to-right non-overlapping in
    * every engine, no regex dialect involved. */
  private[graft] def applyMerge(ws: Column, lft: Column,
                                    rgt: Column): Column = {
    val padded = concat(lit("  "), replace(ws, lit(" "), lit("  ")),
      lit("  "))
    val pat = concat(lit(" "), lft, lit("  "), rgt, lit(" "))
    val rep = concat(lit(" "), lft, rgt, lit(" "))
    trim(replace(replace(padded, pat, rep), lit("  "), lit(" ")))
  }

  /** Train `nMerges` BPE merges; returns the merge TRAJECTORY
    * (step, lft, rgt, merged, pair_count) — the artifact a tokenizer
    * ships. Stops early (fewer rows) if the dict runs out of pairs.
    *
    * ADAPTIVE GATE (the connectedComponents precedent,
    * Dedup.scala:1019): after the one corpus pass, the dict is
    * VOCABULARY-sized — for any real corpus a few million rows at most,
    * and usually far less. Below `smallDictThreshold` distinct words
    * the dict is collected ONCE and the merge loop runs driver-side
    * (one Spark job total instead of one job + checkpoint per merge —
    * a 32k-merge production vocabulary would otherwise be 32k
    * sequential Spark jobs). Above the gate the distributed loop runs
    * unchanged. Both paths compute the IDENTICAL trajectory (same
    * argmax total order, same greedy merge semantics — spec-pinned),
    * so the gate is a cost decision, never a semantics decision.
    *
    * Per distributed iteration: pair counts are one vocabulary-sized
    * groupBy (each word contributes its adjacent symbol pairs weighted
    * by word count), the argmax travels as a BROADCAST 1-row frame
    * into the merge application (no collect — the driver never sees
    * the pair), and the dict needs no re-aggregation afterwards
    * because two distinct words stay distinct under any merge (spacing
    * changes, the character sequence doesn't) — so an iteration is
    * exactly one shuffle. */
  def train(df: DataFrame, textCol: String, nMerges: Int,
            smallDictThreshold: Long = 500000L): DataFrame = {
    require(nMerges >= 1, s"nMerges must be positive: $nMerges")
    val (words0, dictSize) = graft.plans.Checkpoints.truncatedWithCount(
      wordFrequencies(df, textCol))
    if (dictSize <= smallDictThreshold)
      return trainDriver(df.sparkSession, words0, nMerges)
    var words = words0
    var traj = Vector.empty[DataFrame]
    var exhausted = false
    var step = 1
    while (step <= nMerges && !exhausted) {
      val syms = words.withColumn("syms", split(col("ws"), " "))
      val pairs = syms.filter(size(col("syms")) >= 2)
        .select(col("cnt"), explode(expr(
          "transform(sequence(0, size(syms)-2), " +
            "i -> struct(syms[i] AS lft, syms[i+1] AS rgt))")).as("p"))
        .groupBy(col("p.lft").as("lft"), col("p.rgt").as("rgt"))
        .agg(sum("cnt").as("pair_count"))
      val (best, n) = graft.plans.Checkpoints.truncatedWithCount(
        pairs.orderBy(col("pair_count").desc,
            concat(col("lft"), lit(" "), col("rgt")).asc)
          .limit(1)
          .select(lit(step).as("step"), col("lft"), col("rgt"),
            col("pair_count")))
      if (n == 0) exhausted = true
      else {
        traj :+= best
        words = graft.plans.Checkpoints.truncated(
          words.crossJoin(broadcast(best.select("lft", "rgt")))
            .select(applyMerge(col("ws"), col("lft"), col("rgt")).as("ws"),
              col("cnt")))
        step += 1
      }
    }
    if (traj.isEmpty)
      throw new IllegalStateException(
        "bpe: corpus has no adjacent symbol pairs (all words single-char?)")
    traj.reduce(_ unionByName _)
      .withColumn("merged", concat(col("lft"), col("rgt")))
      .select("step", "lft", "rgt", "merged", "pair_count")
  }

  /** Greedy left-to-right non-overlapping merge on a symbol array —
    * the driver twin of [[applyMerge]]'s padded-replace trick ("a b a b"
    * merges both pairs; "a a a" only the left one). */
  private def applyMergeDriver(syms: Array[String], l: String,
                               r: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += l + r; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** The below-gate merge loop: the (ws, cnt) dict collected once, then
    * classic BPE training over symbol arrays — same total order as the
    * distributed argmax ((max count, lexicographically-least "l r")),
    * same greedy merge, so the trajectory is bit-identical.
    *
    * This is the full incremental trainer shape, sized for the gate's
    * own motivation (32k merges over a 500k-word dict):
    *  - an INVERTED OCCURRENCE INDEX (pair -> word ids currently
    *    containing it) makes each merge touch only affected words — no
    *    per-merge scan of the dict;
    *  - the argmax comes from a LAZY MAX-HEAP: every count change
    *    pushes the new (count, pair) entry, and selection pops stale
    *    entries (count no longer current) until the top is live — the
    *    textbook lazy-deletion priority queue, so a step costs
    *    O(affected words × len × log) instead of O(|pairs|). */
  private[graft] def trainDriver(spark: SparkSession, dict: DataFrame,
                                 nMerges: Int): DataFrame = {
    val words = dict.select("ws", "cnt").collect()
      .map(r => (r.getString(0).split(" "), r.getLong(1)))
    val counts = scala.collection.mutable.HashMap
      .empty[(String, String), Long]
    val occurs = scala.collection.mutable.HashMap
      .empty[(String, String), scala.collection.mutable.Set[Int]]
    // max count first; on count ties the LEXICOGRAPHICALLY LEAST
    // "l r" must win (the distributed orderBy's total order), so the
    // smaller pair key compares as the LARGER heap element
    val ord: Ordering[(Long, String, String)] =
      new Ordering[(Long, String, String)] {
        def compare(a: (Long, String, String),
                    b: (Long, String, String)): Int = {
          val c = java.lang.Long.compare(a._1, b._1)
          if (c != 0) c
          else (b._2 + " " + b._3).compareTo(a._2 + " " + a._3)
        }
      }
    val heap =
      scala.collection.mutable.PriorityQueue.empty[(Long, String, String)](ord)
    def bump(p: (String, String), delta: Long): Unit = {
      val v = counts.getOrElse(p, 0L) + delta
      if (v == 0L) counts.remove(p) else counts(p) = v
      if (v > 0L) heap.enqueue((v, p._1, p._2))
    }
    def indexWord(w: Int): Unit = {
      val (syms, cnt) = words(w)
      var i = 0
      while (i < syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        bump(p, cnt)
        occurs.getOrElseUpdate(
          p, scala.collection.mutable.Set.empty) += w
        i += 1
      }
    }
    def unindexWord(w: Int): Unit = {
      val (syms, cnt) = words(w)
      var i = 0
      while (i < syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        bump(p, -cnt)
        occurs.get(p).foreach(_ -= w)
        i += 1
      }
    }
    words.indices.foreach(indexWord)
    def popBest(): Option[(String, String, Long)] = {
      while (heap.nonEmpty) {
        val (c, l, r) = heap.head
        val cur = counts.getOrElse((l, r), 0L)
        if (c == cur && cur > 0L) return Some((l, r, c))
        heap.dequeue() // stale: the pair's current value (if any)
                       // was re-pushed when it last changed
      }
      None
    }
    val traj = Vector.newBuilder[(Int, String, String, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= nMerges && !exhausted) {
      popBest() match {
        case None => exhausted = true
        case Some((l, r, n)) =>
          traj += ((step, l, r, l + r, n))
          val affected =
            occurs.getOrElse((l, r), scala.collection.mutable.Set.empty)
              .toArray // snapshot: un/re-indexing mutates the set
          java.util.Arrays.sort(affected)
          for (w <- affected) {
            unindexWord(w)
            words(w) = (applyMergeDriver(words(w)._1, l, r), words(w)._2)
            indexWord(w)
          }
          step += 1
      }
    }
    val rows = traj.result()
    if (rows.isEmpty)
      throw new IllegalStateException(
        "bpe: corpus has no adjacent symbol pairs (all words single-char?)")
    import spark.implicits._
    rows.toDF("step", "lft", "rgt", "merged", "pair_count")
  }

  /** The normalization contract a merge table is only valid under —
    * stamped into the artifact and demanded back at read time, because
    * merges trained against one tokenization silently mis-tokenize
    * under another. Bump when [[normalizeWords]]/[[symbolize]] change. */
  val NormVersion = "ascii-lower-v1"

  /** Persist a trained merge table as the tokenizer artifact a
    * production job ships: one tiny parquet dir holding the trajectory
    * in step order, with the normalization version and (optionally) the
    * source-corpus provenance stamped into the step column's metadata —
    * the minhash-index / sketches convention: the artifact carries its
    * own contract. */
  def writeMerges(merges: DataFrame, path: String,
                  sourceTag: String = ""): Unit = {
    val b = new org.apache.spark.sql.types.MetadataBuilder()
      .putString("normalization", NormVersion)
    if (sourceTag.nonEmpty) b.putString("source", sourceTag)
    val meta = b.build()
    merges.select(col("step").as("step", meta), col("lft"), col("rgt"),
        col("merged"), col("pair_count"))
      .coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Read a [[writeMerges]] artifact back as the ordered merge list,
    * validating the stamped contract: metadata present, normalization
    * version matches this build, optional provenance tag matches, and
    * steps are contiguous from 1 (a torn or concatenated artifact must
    * not half-apply). A merge table that fails ANY check refuses to
    * encode — a wrong table silently changes every downstream token
    * count, which is the worst possible failure mode for a budget or
    * packing stage. */
  def readMerges(spark: SparkSession, path: String,
                 expectedSource: Option[String] = None)
      : Seq[(String, String)] = {
    val df = spark.read.parquet(path)
    val m = df.schema("step").metadata
    require(m.contains("normalization"),
      s"$path is missing bpe merge metadata — was it written by " +
        "writeMerges?")
    require(m.getString("normalization") == NormVersion,
      s"merge table at $path was trained under normalization " +
        s"'${m.getString("normalization")}' but this build is " +
        s"'$NormVersion' — refusing to encode with a mismatched " +
        "tokenization")
    expectedSource.foreach { want =>
      val got = if (m.contains("source")) m.getString("source") else ""
      require(got == want,
        s"merge table at $path was trained from '$got' but this encode " +
          s"expects '$want' — refusing to tokenize with the wrong " +
          "tokenizer")
    }
    val rows = df.select("step", "lft", "rgt").orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2)))
    require(rows.nonEmpty, s"merge table at $path is empty")
    rows.zipWithIndex.foreach { case ((s, _, _), i) =>
      require(s == i + 1,
        s"merge table at $path has non-contiguous steps " +
          s"(${rows.map(_._1).mkString(",")}) — torn artifact?")
    }
    rows.map { case (_, l, r) => (l, r) }.toIndexedSeq
  }

  /** ENCODE with a trained merge table: per-document token and word
    * counts under the merges, applied in training order. The merges
    * arrive as literals — the production shape: a tokenizer is trained
    * once and its (small) merge list ships with every job.
    *
    * Same Zipf trick as training: the merge chain is evaluated once per
    * DISTINCT word (a vocabulary-sized frame), then joined back to the
    * per-document occurrence counts — the corpus is never dragged
    * through the merge expressions.
    *
    * SCALE SHAPE: each merge adds ~6 expression nodes, so one
    * projection carrying the whole chain grows linearly with merge
    * count — a 32k–50k-merge production vocabulary would be a
    * ~200k-node expression tree that Catalyst's analyzer recursion and
    * codegen's 64 KB JVM method ceiling cannot survive (the same
    * huge-method threshold [[graft.plans.VectorExpressions]] respects).
    * The chain therefore applies in BATCHES of `mergesPerStage` per
    * projection with a stats-truncating checkpoint between batches
    * ([[graft.plans.Checkpoints]]): expression depth is bounded by the
    * batch size, total cost scales linearly with vocab × batches, and
    * the checkpointed frame is VOCABULARY-sized, never corpus-sized.
    * A merge list that fits one batch (the contract queries' 8) keeps
    * the original single-projection lazy plan — no checkpoint, oracle
    * plans unchanged. The default of 16 is measured, not guessed: each
    * applyMerge nests ~8 Column levels, and Spark 4's recursive
    * ColumnNode->Expression conversion blew a default 1 MB thread
    * stack at 64 merges/projection (~500 nested levels) — 16 keeps the
    * tree ~130 deep, an order of magnitude under that ceiling on any
    * JVM stack size. */
  def encodeTokenCounts(df: DataFrame, idCol: String, textCol: String,
                        merges: Seq[(String, String)],
                        mergesPerStage: Int = 16): DataFrame = {
    require(mergesPerStage >= 1,
      s"mergesPerStage must be positive: $mergesPerStage")
    // occ feeds BOTH the final join and the vocab derivation — cache,
    // or the corpus is tokenized twice (the dd_spans lesson; pinned in
    // PlanAuditSpec). Plan-lifetime cache convention: lives until the
    // session's cache is cleared.
    val occ = df
      .select(col(idCol), explode(normalizeWords(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col(idCol), col("word")).agg(count(lit(1)).as("k"))
      .cache()
    val batches = merges.grouped(mergesPerStage).toVector
    var syms = occ.select("word").distinct()
      .withColumn("ws", symbolize(col("word")))
    for ((batch, i) <- batches.zipWithIndex) {
      syms = syms.withColumn("ws", batch.foldLeft(col("ws")) {
        case (c, (l, r)) => applyMerge(c, lit(l), lit(r))
      })
      // truncate between batches only — a single-batch chain stays lazy
      if (i < batches.size - 1)
        syms = graft.plans.Checkpoints.truncated(syms)
    }
    val vocab = syms
      .select(col("word"), size(split(col("ws"), " ")).as("n_tok"))
    occ.join(vocab, "word")
      .groupBy(col(idCol))
      .agg(sum(col("k") * col("n_tok")).as("n_tokens"),
        sum(col("k")).as("n_words"))
  }
}
