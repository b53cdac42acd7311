package org.apache.spark.sql

import org.apache.spark.sql.catalyst.analysis.FunctionRegistry

/** Test-only bridge into the `private[sql]` extensions hook a session
  * build calls — lets GraftExtensionsSpec pin the cluster wiring
  * without constructing a second SparkSession. */
object GraftExtensionsTestBridge {
  def applyFunctions(ext: SparkSessionExtensions, reg: FunctionRegistry): FunctionRegistry =
    ext.registerFunctions(reg)
}
