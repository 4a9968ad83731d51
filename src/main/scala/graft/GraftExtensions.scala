package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

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

    // builders delegate to GraftSession so the two registration paths
    // (temp functions vs extensions) can never drift apart
    GraftSession.builders.foreach { case (name, builder) => inject(name, builder) }
  }
}
