package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** `spark.sql.extensions` entry point — the cluster-deployment path.
  *
  * [[GraftSession]] covers embedded/local use, but a spark-submit or
  * managed-cluster user builds the session from configuration, where the
  * idiomatic hook is
  * `--conf spark.sql.extensions=graft.GraftExtensions`: every graft SQL
  * function (the codegen'd kernel family plus the capped-collect
  * aggregate) is injected at session build time, before any user code
  * runs — no `GraftFunctions.register` call, no temp-function scope.
  * Operators keep their internal `register` calls for robustness on
  * foreign sessions; both paths share ONE builder list
  * ([[graft.functions.GraftFunctions.builders]]), so they cannot drift.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    graft.functions.GraftFunctions.builders.foreach { case (name, b) =>
      // DESCRIBE FUNCTION metadata: point at the builder registry, where
      // a reader finds the name -> expression-class mapping (the builder
      // lambda hides the concrete class until invoked)
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.GraftFunctions", name), b))
    }
}
