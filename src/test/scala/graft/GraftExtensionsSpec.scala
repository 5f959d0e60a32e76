package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.scalatest.funsuite.AnyFunSuite

/** The spark.sql.extensions installer must inject every native expression
  * the library ships — a pure-SQL deployment sets one config and gets the
  * whole function surface. (The injected list is private[sql], hence the
  * reflective read.)
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions injects all seven native functions") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    // registerFunctions is private[sql] (public in bytecode) — reflect in
    val reg = new org.apache.spark.sql.catalyst.analysis.SimpleFunctionRegistry
    classOf[SparkSessionExtensions].getMethods
      .find(m => m.getName == "registerFunctions" && m.getParameterCount == 1)
      .getOrElse(fail("registerFunctions not found"))
      .invoke(ext, reg)
    val names = reg.listFunction().map(_.funcName).toSet
    val expected = Set("decode_s7", "token_hashes", "shingle_hashes", "poly_hash",
      "vec_dot", "vec_cos", "vec_l2sq")
    assert(expected.subsetOf(names), s"missing: ${expected -- names}")
  }
}
