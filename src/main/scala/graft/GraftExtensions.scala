package graft

import org.apache.spark.sql.SparkSessionExtensions

import graft.functions.expressions.GraftFunctions

/** `spark.sql.extensions` entry point: injects the graft_* expression
  * surface into every session built with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")`.
  * The same builders can be registered at runtime via
  * [[graft.functions.expressions.GraftFunctions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.builders.zip(GraftFunctions.identifiers).foreach {
      case ((name, builder), ident) =>
        ext.injectFunction((ident, GraftFunctions.expressionInfo(name), builder))
    }
}
