package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expr._

/** `SparkSessionExtensions` registration — the spark-submit-friendly
  * path (SURVEY.md §4.2): a cluster job adds
  * `--conf spark.sql.extensions=graft.GraftExtensions` and every
  * session (including ones created by thriftserver/connect) gets the
  * graft function surface without calling GraftSession.register.
  * No custom Rule/Strategy is injected — SURVEY.md §4.2 establishes
  * none is needed (everything is expressions + standard plans).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo("graft", name)

  override def apply(e: SparkSessionExtensions): Unit = {
    def inject(name: String, builder: Seq[Expression] => Expression): Unit =
      e.injectFunction((FunctionIdentifier(name), info(name), builder))

    inject("graft_extract", exprs => ExtractMainText(exprs.head, exprs(1)))
    inject("graft_simhash", exprs => SimHash64(exprs.head))
    inject("graft_minhash", exprs => MinHashSig(exprs.head, 64))
    inject("graft_fingerprint", exprs => Winnow(exprs.head, 16))
    inject("graft_langid", exprs => LangId(exprs.head))
    inject("graft_lsh_bucket", exprs => LshBucket(exprs.head, exprs(1)))
    inject("graft_explode_blocks", exprs => ExplodeBlocks(exprs.head))
    inject("graft_shingles", exprs => Shingles(exprs.head))
  }
}
