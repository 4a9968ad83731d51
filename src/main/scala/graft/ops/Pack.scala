package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus sharding by cumulative weight — the export step that turns a
  * deduped/filtered corpus into fixed-budget training shards. */
object Pack {

  /** Assign each row a shard id so that consecutive rows (ordered by
    * `idCol`) fill each shard up to `budget` total weight: a row's
    * shard is `(exclusive running weight sum) div budget` — the
    * deterministic, order-stable analogue of greedy sequence packing
    * (a doc lands in the shard where its first token falls).
    *
    * The naive Spark spelling — `Window.orderBy(id)` with no
    * partition key — moves the ENTIRE corpus through one partition
    * (Catalyst plans an un-partitioned window as a SinglePartition
    * Exchange): the classic global-prefix-sum scale trap. This
    * implementation is the distributed two-level prefix sum instead:
    *
    *   1. bucket  = id div bucketSize   (row-local; contiguous id
    *      ranges, so bucket order == id order)
    *   2. within-bucket exclusive prefix via a window PARTITIONED by
    *      bucket (parallel across buckets, ≤ bucketSize rows each)
    *   3. bucket totals (map-side combined aggregate, one row per
    *      bucket) get THEIR exclusive prefix via the only
    *      single-partition window — over the #buckets-row aggregate,
    *      never the corpus (t19's bounded-window discipline) — and
    *      broadcast back.
    *
    * At 10^12 docs with the default bucketSize 2^20, level 2 is ~10^6
    * rows — driver-trivial; a third level would extend past 2^40
    * buckets. Output: (idCol, weightCol, tok_offset, shard).
    *
    * Contract: `idCol` values are unique; weights are non-negative.
    * Ids need NOT be dense — sparse ids just yield underfull buckets,
    * and the running sum (hence sharding) is unaffected. */
  def prefixShards(rows: DataFrame, idCol: String, weightCol: String,
                   budget: Long, bucketSize: Long = 1L << 20): DataFrame = {
    require(budget > 0 && bucketSize > 0)
    val w = rows.select(col(idCol).cast("long").as("id"),
      col(weightCol).cast("long").as("wt"))
    val bucketed = w.withColumn("bucket", expr(s"id div ${bucketSize}L"))
    val withinW = Window.partitionBy("bucket").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val pre = bucketed.withColumn("pre",
      coalesce(sum(col("wt")).over(withinW), lit(0L)))
    val bucketW = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy("bucket").agg(sum("wt").as("btot"))
      .withColumn("boff", coalesce(sum(col("btot")).over(bucketW), lit(0L)))
      .select("bucket", "boff")
    pre.join(broadcast(offsets), "bucket")
      .select(col("id").as(idCol), col("wt").as(weightCol),
        (col("boff") + col("pre")).as("tok_offset"),
        expr(s"(boff + pre) div ${budget}L").as("shard"))
  }
}
