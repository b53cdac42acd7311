package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier

import graft.functions.GraftFunctions

/** SparkSessionExtensions entry point: enable with
  * `--conf spark.sql.extensions=graft.GraftExtensions` to get graft's
  * native functions in every session of a cluster (the library-local
  * alternative is `GraftFunctions.register(spark)`). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      GraftFunctions.cosineInfo,
      GraftFunctions.cosineBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_srp_sign"),
      GraftFunctions.srpSignInfo,
      GraftFunctions.srpSignBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_hamming_topk"),
      GraftFunctions.hammingTopKInfo,
      GraftFunctions.hammingTopKBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash"),
      GraftFunctions.simHashInfo,
      GraftFunctions.simHashBuilder))
  }
}
