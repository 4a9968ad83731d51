package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator Spark lacks natively,
  * built by composition per the preference order (compose > custom
  * plan — builder brief; SURVEY.md §7.5): for every fact row, attach
  * the latest dim row with the same key and dimTime <= factTime.
  *
  * Shape: union the two sides tagged, sort within key by (time, tag),
  * then a running `last(dimValue, ignoreNulls)` window fill. ONE
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
    // align schemas: fact columns null on dim side and vice versa
    val factCols = factSide.columns.filterNot(c => c == "__t" || c == "__tag" || c == key)
    val dimPay = dimCols.map(c => c -> s"__dim_$c")
    val unioned = factSide
      .select(Seq(col(key), col("__t"), col("__tag")) ++
        factCols.map(col) ++ dimPay.map { case (_, a) => lit(null).as(a) }: _*)
      .unionByName(dimSide0.select(
        Seq(col(key), col("__t"), col("__tag")) ++
          factCols.map(c => lit(null).cast(factSide.schema(c).dataType).as(c)) ++
          dimPay.map { case (c, a) => col(c).as(a) }: _*))
    val w = Window.partitionBy(col(key)).orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = dimPay.foldLeft(unioned) { case (df, (_, a)) =>
      df.withColumn(a, last(col(a), ignoreNulls = true).over(w))
    }
    val renames: Seq[Column] =
      Seq(col(key)) ++ factCols.map(col) ++
        dimPay.map { case (c, a) => col(a).as(s"dim_$c") }
    filled.filter(col("__tag") === 1).select(renames: _*)
  }
}
