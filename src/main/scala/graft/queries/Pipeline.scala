package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Multimodal, Similarity, TextAnalysis}
import graft.sources.Tables

/** Training-data-pipeline operators (dedup / similarity / text analysis /
  * multimodal) as named queries over `documents` and `embeddings`, with
  * DuckDB oracles wherever the semantics are SQL-expressible. Hash-based
  * ops that depend on Spark's xxhash64 (minhash/simhash/LSH) are
  * rows-only checked — their *verified* counterparts (exact n-gram
  * jaccard, brute-force cosine) carry the oracles.
  */
object Pipeline {
  private type Q = (SparkSession, String) => DataFrame
  private def docs(s: SparkSession, dir: String) = Tables.load(s, dir, "documents")
  private def embs(s: SparkSession, dir: String) = Tables.load(s, dir, "embeddings")

  val queries: Map[String, Q] = Map(
    // exact content dedup: survivors + multiplicity per content hash
    "dd_exact" -> ((s, dir) => {
      Dedup.exactByContent(docs(s, dir), "doc_id", "text")
        .select(col("content_hash"), col("doc_id"), col("dup_count"))
        .orderBy("doc_id")
    }),

    // exact n-gram jaccard near-dup pairs (inverted-index join; oracled)
    "dd_ngram_pairs" -> ((s, dir) => {
      Dedup.ngramJaccardPairs(docs(s, dir), "doc_id", "text",
          threshold = 0.8, n = 3)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy("id_a", "id_b")
    }),

    // minhash LSH near-dup pairs (xxhash-dependent -> rows-only check)
    "dd_minhash_pairs" -> ((s, dir) => {
      Dedup.minhashPairs(docs(s, dir), "doc_id", "text", threshold = 0.7)
        .select(col("id_a"), col("id_b"),
          round(col("est_jaccard"), 4).as("est_jaccard"))
        .orderBy("id_a", "id_b")
    }),

    // simhash near-dup pairs (xxhash-dependent -> rows-only check)
    "dd_simhash_pairs" -> ((s, dir) => {
      Dedup.simhashPairs(docs(s, dir), "doc_id", "text", maxHamming = 3)
        .orderBy("id_a", "id_b")
    }),

    // near-dedup survivors: keep-first over the exact-jaccard pair set
    "dd_survivors" -> ((s, dir) => {
      val d = docs(s, dir)
      val pairs = Dedup.ngramJaccardPairs(d, "doc_id", "text", 0.8, 3)
      Dedup.keepFirst(d, "doc_id", pairs).select("doc_id").orderBy("doc_id")
    }),

    // embedding near-dup pairs, brute-force verified (oracled)
    "dd_embed_pairs" -> ((s, dir) => {
      import graft.functions.VectorFunctions._
      val e = embs(s, dir)
      val a = e.select(col("vec_id").as("id_a"), col("embedding").as("va"),
        normSq(col("embedding")).as("na"))
      val b = e.select(col("vec_id").as("id_b"), col("embedding").as("vb"),
        normSq(col("embedding")).as("nb"))
      a.crossJoin(b).filter(col("id_a") < col("id_b"))
        .withColumn("cosine", cosineFromParts(dot(col("va"), col("vb")),
          col("na"), col("nb")))
        .filter(col("cosine") >= 0.45)
        .select(col("id_a"), col("id_b"), round(col("cosine"), 4).as("cosine"))
        .orderBy("id_a", "id_b")
    }),

    // embedding near-dup pairs via hyperplane LSH (rows-only; recall<1 by
    // design — the scale path for true near-dup regimes)
    "dd_embed_lsh" -> ((s, dir) => {
      Dedup.embeddingPairs(embs(s, dir), "vec_id", "embedding",
          threshold = 0.3, tables = 8, bits = 8)
        .select(col("id_a"), col("id_b"), round(col("cosine"), 4).as("cosine"))
        .orderBy("id_a", "id_b")
    }),

    // brute-force cosine top-k ANN baseline (oracled)
    "sim_topk" -> ((s, dir) => {
      val e = embs(s, dir)
      Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 8),
          "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cosine"), 4).as("cosine"))
        .orderBy("query_id", "neighbor_id")
    }),

    // label centroids: grouped vector mean (oracled on first components)
    "sim_centroids" -> ((s, dir) => {
      Similarity.labelCentroids(embs(s, dir), "label", "embedding")
        .select(col("label"), col("n"),
          round(element_at(col("centroid"), 1), 6).as("c1"),
          round(element_at(col("centroid"), 2), 6).as("c2"))
        .orderBy("label")
    }),

    // token counting (oracled)
    "txt_tokens" -> ((s, dir) => {
      docs(s, dir).select(col("doc_id"),
          length(col("text")).cast("long").as("n_chars"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
          TextAnalysis.tokenEstimate(col("text")).cast("long")
            .as("token_estimate"))
        .orderBy("doc_id")
    }),

    // quality metrics + score (oracled)
    "txt_quality" -> ((s, dir) => {
      docs(s, dir).select(col("doc_id"),
          TextAnalysis.qualityMetrics(col("text")).as("m"),
          TextAnalysis.qualityScore(col("text")).as("quality"))
        .select(col("doc_id"),
          col("m.n_tokens").cast("long").as("n_tokens"),
          col("m.mean_token_len").as("mean_token_len"),
          col("m.stopword_ratio").as("stopword_ratio"),
          col("m.alpha_ratio").as("alpha_ratio"),
          col("quality"))
        .orderBy("doc_id")
    }),

    // language id vs the labeled lang column (oracled)
    "txt_langid" -> ((s, dir) => {
      docs(s, dir).select(col("doc_id"), col("lang"),
          TextAnalysis.langId(col("text")).as("lang_pred"))
        .orderBy("doc_id")
    }),

    // content fingerprint, order-insensitive (oracled via md5)
    "txt_fingerprint" -> ((s, dir) => {
      docs(s, dir).select(col("doc_id"),
          TextAnalysis.fingerprint(col("text")).as("fingerprint"))
        .orderBy("doc_id")
    }),

    // batch sessionization: 30-min-gap sessions via lag + running sum —
    // the batch twin of streaming.EventsStreaming.sessionize (oracled)
    "ev_sessionize" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("value"),
          unix_micros(col("ts")).as("us"))
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      val gapUs = 1800L * 1000000L
      val sess = e
        .withColumn("gap", col("us") - lag("us", 1).over(w))
        .withColumn("new_sess",
          when(col("gap").isNull || col("gap") > gapUs, 1).otherwise(0))
        .withColumn("session_id", sum("new_sess").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      sess.groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total"))
        .orderBy("user_id", "session_id")
    }),

    // canonical text normalization (oracled)
    "txt_normalize" -> ((s, dir) => {
      docs(s, dir).select(col("doc_id"),
          TextAnalysis.normalize(col("text")).as("norm"),
          length(TextAnalysis.normalize(col("text"))).cast("long")
            .as("norm_len"))
        .orderBy("doc_id")
    }),

    // LSH-probed ANN (xxhash-free but Spark-seeded hyperplanes: rows-only;
    // the oracled exact counterpart is sim_topk)
    "sim_topk_lsh" -> ((s, dir) => {
      val e = embs(s, dir)
      Similarity.lshTopK(e, e.filter(col("vec_id") < 8), "vec_id",
          "embedding", k = 5, tables = 8, bits = 6)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cosine"), 4).as("cosine"))
        .orderBy("query_id", "neighbor_id")
    }),

    // corpus top terms: explode -> count -> top-k (oracled)
    "txt_top_terms" -> ((s, dir) => {
      docs(s, dir).repartition(col("doc_id"))
        .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("token").asc)
        .limit(20)
    }),

    // TF-IDF per (doc, term): the classic feature-extraction join.
    // round(6) absorbs potential last-ulp libm log() differences.
    "txt_tfidf" -> ((s, dir) => {
      val d = docs(s, dir).repartition(col("doc_id"))
      val nDocs = d.count()
      val terms = d.select(col("doc_id"),
        explode(TextAnalysis.tokens(col("text"))).as("token"))
      val tf = terms.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
      tf.join(dfreq, "token")
        .withColumn("tfidf", round(col("tf") *
          log(lit(nDocs.toDouble) / col("df")), 6))
        .filter(col("doc_id") < 10)
        .select("doc_id", "token", "tf", "df", "tfidf")
        .orderBy("doc_id", "token")
    }),

    // multimodal metadata plumbing (oracled: byte length + checksum)
    "mm_meta" -> ((s, dir) => {
      Multimodal.attachPayload(docs(s, dir), "text", "image/png")
        .select(col("doc_id"), col("media_meta.byte_len").as("byte_len"),
          col("media_meta.checksum").as("checksum"))
        .orderBy("doc_id")
    }),

    // multimodal featurize through the batched mapPartitions path
    // (decode is stubbed -> rows-only check on the real plumbing)
    "mm_features" -> ((s, dir) => {
      val withPayload = Multimodal.attachPayload(docs(s, dir), "text")
      Multimodal.featurize(withPayload, "doc_id").toDF()
        .select(col("doc_id"), col("byte_len"), col("width"), col("height"),
          col("n_frames"))
        .orderBy("doc_id")
    }),
  )

  private val ShingleSql =
    """SELECT doc_id, unnest(list_distinct(list_transform(
         range(1, greatest(len(t)-2, 1)+1),
         i -> array_to_string(t[i:i+2], ' ')))) AS shingle
       FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
             FROM documents)"""

  val oracle: Map[String, String] = Map(
    "dd_exact" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS doc_id,
           count(*) AS dup_count
         FROM documents GROUP BY 1 ORDER BY doc_id""",
    "dd_ngram_pairs" ->
      s"""WITH sh AS ($ShingleSql),
         sizes AS (SELECT doc_id, count(*) AS set_size FROM sh GROUP BY 1),
         inter AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
           FROM sh a JOIN sh b
             ON a.shingle = b.shingle AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
         SELECT id_a, id_b,
           round(i::DOUBLE / (sa.set_size + sb.set_size - i), 4) AS jaccard
         FROM inter
         JOIN sizes sa ON sa.doc_id = id_a
         JOIN sizes sb ON sb.doc_id = id_b
         WHERE i::DOUBLE / (sa.set_size + sb.set_size - i) >= 0.8
         ORDER BY id_a, id_b""",
    "dd_survivors" ->
      s"""WITH sh AS ($ShingleSql),
         sizes AS (SELECT doc_id, count(*) AS set_size FROM sh GROUP BY 1),
         inter AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
           FROM sh a JOIN sh b
             ON a.shingle = b.shingle AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         dups AS (
           SELECT DISTINCT id_b FROM inter
           JOIN sizes sa ON sa.doc_id = id_a
           JOIN sizes sb ON sb.doc_id = id_b
           WHERE i::DOUBLE / (sa.set_size + sb.set_size - i) >= 0.8)
         SELECT doc_id FROM documents
         WHERE doc_id NOT IN (SELECT id_b FROM dups)
         ORDER BY doc_id""",
    "dd_embed_pairs" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
         SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(a.e, b.e), 4) AS cosine
         FROM v a JOIN v b ON a.vec_id < b.vec_id
         WHERE list_cosine_similarity(a.e, b.e) >= 0.45
         ORDER BY id_a, id_b""",
    "sim_topk" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         scored AS (
           SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_cosine_similarity(q.e, c.e) AS cos
           FROM v q JOIN v c ON c.vec_id != q.vec_id
           WHERE q.vec_id < 8),
         ranked AS (
           SELECT query_id, neighbor_id, cos,
             row_number() OVER (PARTITION BY query_id
               ORDER BY cos DESC, neighbor_id ASC) AS rn
           FROM scored)
         SELECT query_id, neighbor_id, round(cos, 4) AS cosine
         FROM ranked WHERE rn <= 5 ORDER BY query_id, neighbor_id""",
    "sim_centroids" ->
      """SELECT label, count(*) AS n,
           round(sum(embedding[1]::DOUBLE) / count(*), 6) AS c1,
           round(sum(embedding[2]::DOUBLE) / count(*), 6) AS c2
         FROM embeddings GROUP BY label ORDER BY label""",
    "txt_tokens" ->
      """SELECT doc_id, length(text)::BIGINT AS n_chars,
           len(string_split_regex(trim(text), '\s+'))::BIGINT AS n_tokens,
           greatest(
             len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')),
             ceil(length(text) / 4)::INT)::BIGINT AS token_estimate
         FROM documents ORDER BY doc_id""",
    "txt_quality" ->
      """WITH m AS (
           SELECT doc_id, text,
             string_split_regex(trim(text), '\s+') AS toks,
             length(text) AS len
           FROM documents),
         base AS (
           SELECT doc_id,
             len(toks)::BIGINT AS n_tokens,
             round(length(regexp_replace(text, '\s+', '', 'g'))::DOUBLE /
               greatest(len(toks), 1), 4) AS mean_token_len,
             round(len(list_filter(toks, x -> list_contains(
                 ['the','a','an','and','or','of','to','in','is','it','that',
                  'for','on','with','as','at','by','this'], lower(x))))::DOUBLE /
               greatest(len(toks), 1), 4) AS stopword_ratio,
             round(len(regexp_extract_all(text, '[A-Za-z]'))::DOUBLE /
               greatest(len, 1), 4) AS alpha_ratio,
             (CASE WHEN len(toks) BETWEEN 10 AND 10000 THEN 1.0 ELSE 0.3 END)
               AS length_ok
           FROM m)
         SELECT doc_id, n_tokens, mean_token_len, stopword_ratio, alpha_ratio,
           floor((length_ok * 0.4 + least(stopword_ratio * 5.0, 1.0) * 0.3
             + alpha_ratio * 0.3) * 10000 + 0.5) / 10000 AS quality
         FROM base ORDER BY doc_id""",
    "txt_langid" ->
      """WITH t AS (
           SELECT doc_id, lang,
             string_split_regex(trim(lower(text)), '\s+') AS toks
           FROM documents),
         s AS (
           SELECT doc_id, lang,
             len(list_filter(toks, x -> list_contains(
               ['der','die','das','und','ist','nicht','mit','ein'], x)))::DOUBLE
               / greatest(len(toks), 1) AS s_de,
             len(list_filter(toks, x -> list_contains(
               ['the','and','of','to','in','is','that','with'], x)))::DOUBLE
               / greatest(len(toks), 1) AS s_en,
             len(list_filter(toks, x -> list_contains(
               ['el','la','los','y','es','no','con','una'], x)))::DOUBLE
               / greatest(len(toks), 1) AS s_es,
             len(list_filter(toks, x -> list_contains(
               ['le','la','les','et','est','pas','avec','une'], x)))::DOUBLE
               / greatest(len(toks), 1) AS s_fr,
             len(list_filter(toks, x -> list_contains(
               ['的','是','不','了','在','和','有','我'], x)))::DOUBLE
               / greatest(len(toks), 1) AS s_zh
           FROM t)
         SELECT doc_id, lang,
           CASE WHEN greatest(s_de, s_en, s_es, s_fr, s_zh) = 0 THEN 'und'
                WHEN s_de >= greatest(s_en, s_es, s_fr, s_zh) THEN 'de'
                WHEN s_en >= greatest(s_es, s_fr, s_zh) THEN 'en'
                WHEN s_es >= greatest(s_fr, s_zh) THEN 'es'
                WHEN s_fr >= s_zh THEN 'fr'
                ELSE 'zh' END AS lang_pred
         FROM s ORDER BY doc_id""",
    "txt_fingerprint" ->
      """SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(
             string_split_regex(trim(text), '\s+'))), ' ')) AS fingerprint
         FROM documents ORDER BY doc_id""",
    "ev_sessionize" ->
      """WITH e AS (
           SELECT user_id, event_id, value, epoch_ns(ts) // 1000 AS us
           FROM events),
         g AS (
           SELECT user_id, event_id, value, us,
             CASE WHEN us - lag(us) OVER w IS NULL
                    OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END
               AS new_sess
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
         s AS (
           SELECT user_id, event_id, value,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
           FROM g)
         SELECT user_id, session_id::BIGINT AS session_id,
           count(*) AS n_events, round(sum(value), 2) AS total
         FROM s GROUP BY user_id, s.session_id
         ORDER BY user_id, session_id""",
    "txt_normalize" ->
      """SELECT doc_id,
           trim(regexp_replace(regexp_replace(lower(text),
             '[.,;:!?''"()\[\]{}-]', '', 'g'), '\s+', ' ', 'g')) AS norm,
           length(trim(regexp_replace(regexp_replace(lower(text),
             '[.,;:!?''"()\[\]{}-]', '', 'g'), '\s+', ' ', 'g')))::BIGINT
             AS norm_len
         FROM documents ORDER BY doc_id""",
    "txt_top_terms" ->
      """SELECT token, count(*) AS cnt FROM (
           SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
           FROM documents)
         GROUP BY token ORDER BY cnt DESC, token ASC LIMIT 20""",
    "txt_tfidf" ->
      """WITH terms AS (
           SELECT doc_id, unnest(string_split_regex(trim(text), '\s+'))
             AS token
           FROM documents),
         tf AS (SELECT doc_id, token, count(*) AS tf FROM terms
                GROUP BY 1, 2),
         dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
         n AS (SELECT count(*)::DOUBLE AS n_docs FROM documents)
         SELECT doc_id, tf.token, tf, df,
           round(tf * ln(n_docs / df), 6) AS tfidf
         FROM tf JOIN dfreq ON tf.token = dfreq.token CROSS JOIN n
         WHERE doc_id < 10
         ORDER BY doc_id, tf.token""",
    "mm_meta" ->
      """SELECT doc_id, octet_length(text::BLOB)::BIGINT AS byte_len,
           md5(text) AS checksum
         FROM documents ORDER BY doc_id""",
  )
}
