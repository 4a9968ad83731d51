package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator Spark lacks natively,
  * built by composition per the preference order (compose > custom
  * plan — builder brief; SURVEY.md §7.5): for every fact row, attach
  * the latest dim ROW with the same key and dimTime <= factTime.
  *
  * ROW semantics (the ASOF standard, and what the DuckDB ASOF oracle
  * computes): the fill carries the latest dim row as ONE struct, so a
  * null payload column in the latest row stays null — it is NOT
  * back-filled per-column from an older row.
  *
  * Shape: union the two sides tagged, sort within key by (time, tag),
  * then a running `last(dimStruct, ignoreNulls)` window fill. ONE
  * shuffle (by key) regardless of table sizes — the scalable
  * alternative to a range-condition join, which Spark would plan as a
  * broadcast-nested-loop at large sizes.
  *
  * SKEW CONTRACT: the window partitions by `key`, so one
  * pathologically hot key (say 50% of all rows) lands on a single task
  * — and unlike a join, AQE cannot split a window partition, nor can
  * the extraction pipeline's salting trick apply (the running fill is
  * a cross-row computation over the whole key). Correctness is
  * unaffected (AsOfJoinSkewSpec asserts it at 50% skew); wall-clock
  * degrades to the hot key's row count. If a production key
  * distribution has such a key, pre-split it by coarse time range
  * (process each range separately, seeding each range with the
  * latest dim row at its lower bound) — a range-bucketed variant that
  * keeps the fill exact while bounding task size.
  */
object AsOfJoin {

  /** ROW-semantics plumbing shared by both variants — the single place
    * the as-of payload contract lives: the dim payload travels as ONE
    * nullable struct (`__dim`), facts carry a typed null, the fill
    * window picks whole rows, and the output projects `__dim.<c>` as
    * `dim_<c>`. Both variants MUST use this (the bucketed variant
    * shares q20's ASOF oracle on the premise that semantics are
    * identical). */
  private final case class DimStruct(
      structType: org.apache.spark.sql.types.StructType, dimCols: Seq[String]) {
    def nullCol: Column = lit(null).cast(structType).as("__dim")
    def fromDim: Column = struct(dimCols.map(col): _*).as("__dim")
    def fromSeed: Column =
      struct(dimCols.map(c => col(s"__seed.$c").as(c)): _*).as("__dim")
    def renames: Seq[Column] = dimCols.map(c => col(s"__dim.$c").as(s"dim_$c"))
    def fill(df: DataFrame, w: org.apache.spark.sql.expressions.WindowSpec): DataFrame =
      df.withColumn("__dim", last(col("__dim"), ignoreNulls = true).over(w))
  }

  private def dimStruct(dim: DataFrame, dimCols: Seq[String]): DimStruct =
    DimStruct(
      org.apache.spark.sql.types.StructType(dimCols.map(c => dim.schema(c))), dimCols)

  /** @param fact   fact table
    * @param dim    dimension/state-change table
    * @param key    equi-key column name (same name both sides)
    * @param factTs fact event-time column name
    * @param dimTs  dim effective-time column name
    * @param dimCols dim payload columns to carry (renamed as-is onto facts)
    */
  def latestBefore(fact: DataFrame, dim: DataFrame, key: String,
                   factTs: String, dimTs: String, dimCols: Seq[String]): DataFrame = {
    val factSide = fact
      .withColumn("__t", col(factTs))
      .withColumn("__tag", lit(1)) // facts sort AFTER a same-instant dim row
    val dimSide0 = dim
      .withColumn("__t", col(dimTs))
      .withColumn("__tag", lit(0))
    // align schemas: fact columns null on dim side; the dim payload
    // travels as ONE struct so the fill picks whole rows (row
    // semantics), never mixes columns from different dim rows
    val factCols = factSide.columns.filterNot(c => c == "__t" || c == "__tag" || c == key)
    val ds = dimStruct(dim, dimCols)
    val unioned = factSide
      .select(Seq(col(key), col("__t"), col("__tag")) ++
        factCols.map(col) :+ ds.nullCol: _*)
      .unionByName(dimSide0.select(
        Seq(col(key), col("__t"), col("__tag")) ++
          factCols.map(c => lit(null).cast(factSide.schema(c).dataType).as(c)) :+
          ds.fromDim: _*))
    val w = Window.partitionBy(col(key)).orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = ds.fill(unioned, w)
    val renames: Seq[Column] =
      Seq(col(key)) ++ factCols.map(col) ++ ds.renames
    filled.filter(col("__tag") === 1).select(renames: _*)
  }

  /** Skew-resistant variant of [[latestBefore]]: identical semantics,
    * but no task ever holds a whole key. The timeline of each key is
    * split into `bucketWidth`-sized ranges and the running fill window
    * partitions by (key, bucket) — a key holding 50% of all rows
    * spreads over (its time span / bucketWidth) tasks.
    *
    * Mechanics (all frames bounded by BUCKET counts, not row counts):
    *   1. per (key, bucket): the latest dim row, as an aggregate —
    *      one row per key×bucket that has dims;
    *   2. a cumulative carry across buckets (window over the
    *      aggregated frame, ≤ #buckets rows per key) densified to
    *      every bucket in the key's observed range, giving each
    *      bucket its "state at bucket start" seed;
    *   3. facts ∪ dims ∪ seeds, filled by a window over
    *      (key, bucket).
    *
    * Contracts: `tsToLong(ts)` must be a monotone integer image of the
    * event time (default: cast to long — epoch seconds for timestamps);
    * same-instant dims must be pre-deduped (as in latestBefore);
    * pick `bucketWidth` so a key's span is thousands of buckets, not
    * millions (the dense carry materializes one row per key×bucket).
    * That choice is ENFORCED, not prose: an in-plan guard raises (with
    * the fix named) for any key whose span exceeds `maxBucketsPerKey`
    * buckets (default 100k), before that key's dense carry explodes to
    * millions of rows. In-plan means zero extra Spark jobs — the check
    * rides the bounds aggregate the join computes anyway.
    */
  /** tsToLong for timestamp columns: epoch seconds (pair with a
    * bucketWidth in seconds). The default `cast("long")` covers
    * numeric event times; Spark won't cast timestamps to long. */
  val tsSeconds: Column => Column =
    c => (unix_micros(c.cast("timestamp")) / lit(1000000L)).cast("long")

  def latestBeforeBucketed(fact: DataFrame, dim: DataFrame, key: String,
                           factTs: String, dimTs: String, dimCols: Seq[String],
                           bucketWidth: Long,
                           tsToLong: Column => Column = _.cast("long"),
                           maxBucketsPerKey: Long = 100000L): DataFrame = {
    require(bucketWidth > 0)
    require(maxBucketsPerKey > 0)
    val payStruct = struct(col(dimTs).as("__dts") +: dimCols.map(col): _*)
    val dimB = dim
      .withColumn("__b", floor(tsToLong(col(dimTs)) / bucketWidth).cast("long"))
    val factB = fact
      .withColumn("__b", floor(tsToLong(col(factTs)) / bucketWidth).cast("long"))

    // 1. latest dim per (key, bucket): ts ranges are disjoint across
    // buckets, so a lexicographic struct max IS the latest-by-ts row
    val perBucket = dimB.groupBy(col(key), col("__b"))
      .agg(max(payStruct).as("__last"))

    // 2. cumulative carry over the AGGREGATED frame (≤ #buckets rows
    // per key), densified to every bucket a fact or dim touches, then
    // shifted: bucket b's seed is the carry through bucket b-1
    val bounds = perBucket.select(col(key), col("__b"))
      .unionByName(factB.select(col(key), col("__b")))
      .groupBy(col(key)).agg(min(col("__b")).as("__b0"), max(col("__b")).as("__b1"))
    // width guard, IN-PLAN: a key whose span would densify more than
    // maxBucketsPerKey buckets raises before its dense explode runs.
    // Evaluated lazily with the query itself — zero extra jobs and no
    // recomputation of the bounds subtree (an eager .head() here would
    // scan fact+dim once at construction and again at execution).
    val width = col("__b1") - col("__b0") + lit(1L)
    val guarded = bounds.withColumn("__b1",
      when(width <= maxBucketsPerKey, col("__b1")).otherwise(raise_error(concat(
        lit(s"latestBeforeBucketed: bucketWidth=$bucketWidth densifies "),
        width.cast("string"),
        lit(s" buckets for a single key's time span (cap $maxBucketsPerKey)" +
          " — widen bucketWidth to ~span/1000 or raise maxBucketsPerKey" +
          " explicitly")))))
    val dense = guarded.select(col(key),
      explode(sequence(col("__b0"), col("__b1"))).as("__b"))
    val carryW = Window.partitionBy(col(key)).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = dense.join(perBucket, Seq(key, "__b"), "left_outer")
      .withColumn("__carry", last(col("__last"), ignoreNulls = true).over(carryW))
    val seeds = carried
      .withColumn("__seed", lag(col("__carry"), 1).over(
        Window.partitionBy(col(key)).orderBy(col("__b"))))
      .filter(col("__seed").isNotNull)
      .select(col(key), col("__b"), col("__seed"))

    // 3. one fill window per (key, bucket): seeds sort first (tag -1),
    // then dims (0) before same-instant facts (1) — latestBefore's
    // order and its ROW semantics (the shared DimStruct plumbing)
    val factCols = factB.columns.filterNot(c => c == "__b" || c == key)
    val ds = dimStruct(dim, dimCols)
    val factSide = factB.select(
      Seq(col(key), col("__b"), col(factTs).as("__t"), lit(1).as("__tag")) ++
        factCols.map(col) :+ ds.nullCol: _*)
    val dimSide = dimB.select(
      Seq(col(key), col("__b"), col(dimTs).as("__t"), lit(0).as("__tag")) ++
        factCols.map(c => lit(null).cast(factB.schema(c).dataType).as(c)) :+
        ds.fromDim: _*)
    val seedSide = seeds.select(
      Seq(col(key), col("__b"), col("__seed.__dts").as("__t"), lit(-1).as("__tag")) ++
        factCols.map(c => lit(null).cast(factB.schema(c).dataType).as(c)) :+
        ds.fromSeed: _*)
    val unioned = factSide.unionByName(dimSide).unionByName(seedSide)
    val fillW = Window.partitionBy(col(key), col("__b"))
      .orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = ds.fill(unioned, fillW)
    val renames: Seq[Column] =
      Seq(col(key)) ++ factCols.map(col) ++ ds.renames
    filled.filter(col("__tag") === 1).select(renames: _*)
  }
}
