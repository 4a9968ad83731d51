package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** UTF-8 text sink — the reference's save path (S7,
  * main_window.py:777-792): writes extracted documents as UTF-8 text,
  * one record per line (`url\ttext-with-escaped-newlines`), REFUSING
  * the write when nothing non-blank survives the guard
  * (main_window.py:784-786 refuses blank saves).
  */
object TextSink {

  final class EmptyOutputException extends Exception(
    "refusing to save: no non-empty extracted text (S7/P6 guard)")

  /** @return number of documents written */
  def save(extracted: DataFrame, dir: String): Long = {
    val nonBlank = extracted
      .filter(col("error").isNull &&
        length(trim(coalesce(col("text"), lit("")))) > 0) // P6 guard
    // pre-write guard without a second job: write, then refuse/clean up
    // is wrong (partial visibility) — count first, tiny relational job
    val n = nonBlank.count()
    if (n == 0) throw new EmptyOutputException
    nonBlank
      .select(concat_ws("\t", col("url"),
        regexp_replace(col("text"), "\n", "\\\\n")).as("value"))
      .write.mode("overwrite").text(dir)
    n
  }
}
