package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.scalatest.funsuite.AnyFunSuite

/** The cluster wiring (`spark.sql.extensions=graft.GraftExtensions`)
  * must expose exactly what the library-local
  * `GraftFunctions.register` does — a function present in one path but
  * not the other means SQL that works on a laptop fails on the
  * cluster (graft_simhash was exactly that gap). Exercised through the
  * same registerFunctions hook a session build uses. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("extensions inject every graft function register() exposes") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val reg = org.apache.spark.sql.GraftExtensionsTestBridge
      .applyFunctions(ext, FunctionRegistry.builtin.clone())
    // derived from the shared list register() iterates — NOT hardcoded,
    // so a function added to one path and forgotten on the other fails
    // here instead of at cluster deploy
    val want = graft.functions.GraftFunctions.all.map(_._1)
    assert(want.size >= 4, "the shared function list lost entries")
    want.foreach { f =>
      assert(reg.functionExists(FunctionIdentifier(f)),
        s"$f missing from the extensions path")
    }
  }
}
