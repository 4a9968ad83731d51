package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.pipeline.ExtractPipeline

/** Training-data pipeline operators as driver-checkable queries.
  *
  * Dup-free driver data means near-dup structure is PLANTED in-query:
  * a deterministic modified copy of the documents table is unioned in
  * (same expression on the Spark and DuckDB sides), so dedup queries
  * have non-trivial answers the oracle can verify.
  */
object OpsQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** documents ∪ exact copies (doc_id+100000, every 7th doc). */
  private def docsWithExactDups(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select("doc_id", "text")
    d.unionAll(d.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 100000).as("doc_id"), col("text")))
  }

  /** documents ∪ near copies (noise words appended, every 5th doc). */
  private def docsWithNearDups(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select("doc_id", "text")
    d.unionAll(d.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" zz qq xx")).as("text")))
  }

  /** embeddings ∪ exact copies (vec_id+100000, every 9th vector). */
  private def embWithDups(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings").select("vec_id", "embedding")
    e.unionAll(e.filter(col("vec_id") % 9 === 0)
      .select((col("vec_id") + 100000).as("vec_id"), col("embedding")))
  }

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // exact dedup: hash-groupBy, keep min id (oracle-checked)
    "d1_dedup_exact" -> ((s, dir) => {
      Dedup.exactGroups(docsWithExactDups(s, dir), "doc_id", "text")
        .select(col("keep_id"), col("dup_cnt"))
        .orderBy("keep_id")
    }),
    // exact n-gram Jaccard over inverted shingle index
    "d2_ngram_jaccard" -> ((s, dir) => {
      GraftSession.register(s)
      Dedup.ngramJaccardPairs(docsWithNearDups(s, dir), "doc_id", "text", 0.6)
        .withColumn("jaccard", round(col("jaccard"), 6))
        .orderBy("id_a", "id_b")
    }),
    // MinHash+LSH banding (estimated jaccard)
    "d3_minhash_lsh" -> ((s, dir) => {
      GraftSession.register(s)
      Dedup.minhashPairs(docsWithNearDups(s, dir), "doc_id", "text",
          k = 64, bands = 16, minEstJaccard = 0.5)
        .orderBy("id_a", "id_b")
    }),
    // SimHash hamming-band dedup
    "d4_simhash" -> ((s, dir) => {
      GraftSession.register(s)
      Dedup.simhashPairs(docsWithNearDups(s, dir), "doc_id", "text", maxHamming = 3)
        .orderBy("id_a", "id_b")
    }),
    // embedding-cosine near-dup via LSH buckets (planted exact copies
    // ⇒ cosine == 1.0 bit-exactly; oracle checks the full pair set)
    "d5_embed_neardup" -> ((s, dir) => {
      GraftSession.register(s)
      Dedup.embeddingNearDupPairs(embWithDups(s, dir), "vec_id", "embedding",
          minCosine = 0.999999, planes = 8)
        .select(col("id_a"), col("id_b"))
        .orderBy("id_a", "id_b")
    }),
    // brute-force cosine top-k (ANN baseline; oracle-checked ranks)
    "s1_cosine_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 5)
      Similarity.bruteForceTopK(emb, queries, 10)
        .select(col("query_id"), col("rank"), col("neighbor_id"))
        .orderBy("query_id", "rank")
    }),
    // LSH-bucketed ANN (scale path; recall vs s1 asserted in tests)
    "s2_ann_lsh" -> ((s, dir) => {
      GraftSession.register(s)
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 5)
      Similarity.lshTopK(emb, queries, 10, planes = 8)
        .select(col("query_id"), col("rank"), col("neighbor_id"))
        .orderBy("query_id", "rank")
    }),
    // language-ID heuristic over extracted web pages (planted langs)
    "t1_langid" -> ((s, _) => {
      GraftSession.register(s)
      val ex = ExtractPipeline.extracted(ExtractPipeline.pages(s, 1000).toDF())
        .filter(col("error").isNull && length(col("text")) > 0)
      ex.select(col("url"),
          call_function("graft_langid",
            regexp_replace(col("text"), "(?m)^--- صفحة \\d+ ---$", "")).as("lang_pred"),
          col("lang").as("lang_true"))
        .orderBy("url")
    }),
    // quality scoring: length/word/stopword/punct features (oracle)
    "t2_quality" -> ((s, dir) => {
      val words = split(trim(col("text")), " ")
      val stop = array(Seq("the", "a", "of", "to", "and", "in", "is").map(lit): _*)
      t(s, dir, "documents").select(
        col("doc_id"),
        length(col("text")).as("n_chars_m"),
        size(words).as("n_words"),
        size(array_intersect(words, stop)).as("stop_hits"),
        (size(filter(words, w => w.isin("the", "a", "of", "to", "and", "in", "is")))
          .cast("double") / size(words).cast("double")).as("stop_ratio"))
        .withColumn("stop_ratio", round(col("stop_ratio"), 6))
        .orderBy("doc_id")
    }),
    // token counting: whitespace + BPE-ish regex segmentation (oracle)
    "t3_tokens" -> ((s, dir) => {
      t(s, dir, "documents").select(
        col("doc_id"),
        size(split(trim(col("text")), "\\s+")).as("ws_tokens"),
        size(expr("regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\\\s]', 0)"))
          .as("bpeish_tokens"))
        .orderBy("doc_id")
    }),
    // winnowing fingerprints: shared-fingerprint containment pairs.
    // Stop-fingerprint removal (df > 50) is part of the operator: a
    // fingerprint present in half the corpus carries no containment
    // signal but quadratic join cost — standard winnowing practice,
    // and the only viable shape at 10^12 docs.
    "t4_fingerprint" -> ((s, dir) => {
      GraftSession.register(s)
      val fp = docsWithNearDups(s, dir).select(col("doc_id"),
        explode(call_function("graft_fingerprint", col("text"))).as("fp"))
      val rare = fp.groupBy("fp").agg(count(lit(1)).as("df"))
        .filter(col("df") <= 50).select("fp")
      val fpr = fp.join(broadcast(rare), Seq("fp"))
      fpr.as("a").join(fpr.as("b"),
          col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .agg(count(lit(1)).as("shared_fp"))
        .filter(col("shared_fp") >= 8)
        .orderBy("id_a", "id_b")
    }),
    // IVF ANN: k-means coarse quantizer + nprobe inverted-list search
    "s3_ann_ivf" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val centroids = IvfIndex.train(emb, k = 16, iters = 2)
      val queries = emb.filter(col("vec_id") < 5)
      IvfIndex.topK(emb, queries, centroids, k = 10, nprobe = 4)
        .select(col("query_id"), col("rank"), col("neighbor_id"))
        .orderBy("query_id", "rank")
    }),
    // repetition filter: distinct-trigram ratio (training-data quality)
    "t5_repetition" -> ((s, dir) => {
      GraftSession.register(s)
      val sh = Dedup.shingles(col("text"))
      val words = split(trim(col("text")), "\\s+")
      val shAll = when(size(words) >= 3,
        transform(sequence(lit(0), size(words) - 3),
          i => concat_ws(" ", slice(words, i + 1, lit(3))))).otherwise(array())
      t(s, dir, "documents")
        .select(col("doc_id"),
          size(shAll).as("n_trigrams"),
          size(sh).as("n_distinct"),
          when(size(shAll) > 0,
            round(size(sh).cast("double") / size(shAll).cast("double"), 6))
            .otherwise(lit(1.0)).as("distinct_ratio"))
        .withColumn("repetitive", col("distinct_ratio") < 0.5)
        .orderBy("doc_id")
    }),
    // multimodal plumbing: stub decode + feature schema + frame sample
    "m1_media_features" -> ((s, _) => {
      val feats = Multimodal.features(Multimodal.gen(s, 300)).toDF()
      feats.select(col("media_id"), col("kind"), col("width"), col("height"),
          col("n_frames"), size(col("feature")).as("feat_dim"), col("decode_error"))
        .orderBy("media_id")
    }),
    "m2_frame_sample" -> ((s, _) => {
      val feats = Multimodal.features(Multimodal.gen(s, 300)).toDF()
      Multimodal.frameSample(feats, 24).orderBy("media_id", "frame_idx")
    }))

  def oracles: Map[String, String] = Map(
    "d1_dedup_exact" ->
      """WITH docs AS (
        | SELECT doc_id, text FROM documents
        | UNION ALL
        | SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0)
        |SELECT MIN(doc_id) AS keep_id, COUNT(*) AS dup_cnt
        |FROM docs GROUP BY text HAVING COUNT(*) > 1
        |ORDER BY keep_id""".stripMargin,
    "d5_embed_neardup" ->
      """WITH emb AS (
        | SELECT vec_id, embedding FROM embeddings
        | UNION ALL
        | SELECT vec_id + 100000 AS vec_id, embedding FROM embeddings WHERE vec_id % 9 = 0)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |FROM emb a JOIN emb b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.999999
        |ORDER BY id_a, id_b""".stripMargin,
    "s1_cosine_topk" ->
      """WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5),
        |scored AS (
        | SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |  list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) /
        |   (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[])) *
        |    sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))) AS cosine
        | FROM q, embeddings c WHERE q.vec_id <> c.vec_id),
        |ranked AS (
        | SELECT query_id, neighbor_id,
        |  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
        | FROM scored)
        |SELECT query_id, rank, neighbor_id FROM ranked WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin,
    "t2_quality" ->
      """SELECT doc_id,
        | LENGTH(text) AS n_chars_m,
        | len(string_split(TRIM(text), ' ')) AS n_words,
        | len(list_distinct(list_intersect(string_split(TRIM(text), ' '),
        |   ['the','a','of','to','and','in','is']))) AS stop_hits,
        | ROUND(len(list_filter(string_split(TRIM(text), ' '),
        |   w -> list_contains(['the','a','of','to','and','in','is'], w)))::DOUBLE /
        |   len(string_split(TRIM(text), ' '))::DOUBLE, 6) AS stop_ratio
        |FROM documents ORDER BY doc_id""".stripMargin,
    "t3_tokens" ->
      """SELECT doc_id,
        | len(regexp_split_to_array(TRIM(text), '\s+')) AS ws_tokens,
        | len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS bpeish_tokens
        |FROM documents ORDER BY doc_id""".stripMargin)
}
