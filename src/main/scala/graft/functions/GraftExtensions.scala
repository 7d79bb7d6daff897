package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Config-driven entry point: set
  * `spark.sql.extensions=graft.functions.GraftExtensions` and every graft
  * kernel is installed in each new session with no code call — the standard
  * way a Spark library ships Catalyst extensions (`Tables.table` still
  * registers imperatively for sessions created without the conf). Both
  * paths consume [[GraftFunctions.builders]], so a kernel parameter can
  * never differ between them. Also injects the
  * [[SimilarityFilterPruning]] optimizer rule (length-filter pre-pruning
  * for Jaccard predicates) and the [[graft.plans.AsOfJoinStrategy]]
  * planner strategy (native as-of join). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, name, usage, "", "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info(name, usage), builder))
    }
    ext.injectOptimizerRule(_ => SimilarityFilterPruning)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
