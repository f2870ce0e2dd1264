package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expressions.DotQuantized

/** Engine extension point (SURVEY §7.1): registers graft's native
  * Catalyst expressions into the session's function registry.
  *
  * Wire up either declaratively
  * (`spark.sql.extensions=graft.GraftExtensions`) or imperatively via
  * [[GraftExtensions.register]] for sessions built elsewhere.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.dotqDescriptor)
  }
}

object GraftExtensions {
  private val dotqDescriptor = (
    FunctionIdentifier("graft_dotq"),
    new ExpressionInfo(classOf[DotQuantized].getName, "graft_dotq"),
    (children: Seq[Expression]) => DotQuantized(children(0), children(1)))

  /** Imperative registration for an already-built session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      dotqDescriptor._1, dotqDescriptor._2, dotqDescriptor._3)
}
