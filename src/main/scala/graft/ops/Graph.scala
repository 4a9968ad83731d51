package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph analytics over crawl-derived edges (outlink extraction →
  * host graph → rank). */
object Graph {

  /** INTEGER-EXACT PageRank, damping 0.85, `iters` rounds.
    *
    * All arithmetic is 64-bit integer with ranks scaled by `scale`
    * (default 2^20): each edge's contribution is floored INDIVIDUALLY
    * (`(85·r) div (100·outdeg)`), so the per-node sum is
    * permutation-invariant and the result is bit-identical at any
    * parallelism — and a SQL oracle recomputes it exactly (float
    * PageRank cannot be hash-compared across engines; this is the
    * same fixed-point discipline as IvfIndex.QuantScale). Dangling
    * nodes (no out-edges) leak their rank mass — the standard
    * simplification; add sink redistribution if mass conservation
    * matters.
    *
    * Scale shape per iteration: ONE equi-join of edges against the
    * (nodes-sized) rank table on src + a combiner-friendly sum keyed
    * by dst — edges never self-join and never materialize more than
    * one row per edge. outdeg and N are computed once. Multigraph
    * semantics: parallel edges each contribute. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int = 3, scale: Long = 1L << 20): DataFrame = {
    require(iters >= 1 && scale > 0)
    // persist the loop-invariant frames: every iteration's plan would
    // otherwise re-embed (and re-execute) the edge scan, the
    // union+distinct node shuffle, and the outdeg aggregate — the same
    // iterative-Spark discipline connectedComponents applies. nodes is
    // materialized by the count below; the caller owns session-level
    // cache hygiene for this terminal op (blocks age out via LRU).
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).persist()
    val nodes = e.select(col("src").as("host"))
      .union(e.select(col("dst").as("host"))).distinct().persist()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("odeg")).persist()
    val n = nodes.count() // one small agg job, like IVF's k×partitions
    require(n > 0, "pageRank: empty graph")
    val base = (15L * scale) / (100L * n)
    var ranks = nodes.withColumn("rank", lit(scale / n))
    (1 to iters).foreach { _ =>
      val contrib = e
        .join(ranks.select(col("host").as("src"), col("rank")), "src")
        .join(outdeg, "src")
        .select(col("dst").as("host"),
          expr("(85 * rank) div (100 * odeg)").as("c"))
        .groupBy("host").agg(sum("c").as("contrib"))
      ranks = nodes.join(contrib, Seq("host"), "left_outer")
        .select(col("host"),
          (lit(base) + coalesce(col("contrib"), lit(0L))).as("rank"))
    }
    ranks
  }
}
