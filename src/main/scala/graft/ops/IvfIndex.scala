package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-style ANN: the k-means-coarse-quantizer variant of approximate
  * nearest neighbor (the brief's "IVF or LSH-bucketed" scale path —
  * LSH lives in Similarity.lshTopK; this is the IVF flavor).
  *
  * Training: Lloyd's iterations expressed as DataFrame aggregations —
  * assign (one broadcast join + argmin) then re-center (one groupBy) —
  * so it scales to any corpus: per iteration exactly one shuffle of
  * (cluster, vector-sum) partial aggregates. Centroid init is
  * deterministic (first k vectors by id — k-means|| would be the
  * production choice; init quality is not the point here).
  *
  * Query: probe the `nprobe` nearest centroids, score only those
  * inverted lists.
  */
object IvfIndex {

  /** One Lloyd assign step: nearest centroid id per row.
    * `centroids`: (cluster INT, centroid ARRAY<DOUBLE>) — broadcast. */
  private def assign(emb: DataFrame, centroids: DataFrame): DataFrame = {
    val scored = emb.crossJoin(broadcast(centroids))
      .withColumn("dist",
        aggregate(zip_with(col("embedding"), col("centroid"),
          (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
          lit(0.0), (a, x) => a + x))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("dist"), col("cluster"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .drop("rn", "dist", "centroid")
  }

  /** Train k centroids with `iters` Lloyd iterations. Returns
    * (cluster, centroid) — small enough to broadcast at any corpus
    * size (k vectors). */
  def train(emb: DataFrame, k: Int, iters: Int): DataFrame = {
    val spark = emb.sparkSession
    var centroids = emb.orderBy("vec_id").limit(k)
      .select((row_number().over(Window.orderBy("vec_id")) - 1).as("cluster"),
        transform(col("embedding"), x => x.cast("double")).as("centroid"))
    var i = 0
    while (i < iters) {
      val assigned = assign(emb, centroids)
      // re-center: element-wise mean per cluster via posexplode + agg
      val sums = assigned
        .select(col("cluster"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .groupBy(col("cluster"), col("dim"))
        .agg(avg(col("v").cast("double")).as("m"))
      centroids = sums.groupBy(col("cluster"))
        .agg(transform(array_sort(collect_list(struct(col("dim"), col("m")))),
          x => x.getField("m")).as("centroid"))
      i += 1
    }
    centroids
  }

  /** Top-k cosine neighbors probing the `nprobe` nearest inverted
    * lists per query. */
  def topK(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
           k: Int, nprobe: Int): DataFrame = {
    val lists = assign(corpus, centroids) // (vec_id, embedding, cluster)
    val qprobe = {
      val scored = queries.crossJoin(broadcast(centroids))
        .withColumn("dist",
          aggregate(zip_with(col("embedding"), col("centroid"),
            (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
            lit(0.0), (a, x) => a + x))
      val w = Window.partitionBy(col("vec_id")).orderBy(col("dist"), col("cluster"))
      scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= nprobe)
        .select(col("vec_id").as("query_id"), col("embedding").as("qemb"), col("cluster"))
    }
    val scored = lists.join(broadcast(qprobe), Seq("cluster"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("cosine", Similarity.cosine(col("qemb"), col("embedding")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"), col("cosine"))
  }
}
