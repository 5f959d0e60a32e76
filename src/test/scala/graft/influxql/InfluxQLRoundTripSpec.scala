package graft.influxql

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import InfluxQLAst._

/** Property test: `parse(render(ast)) == ast` over generated statements —
  * exercises the lexer/parser across the whole accepted grammar (field
  * shapes, predicates, group/fill combinations, clause tails) far beyond
  * the hand-written cases in InfluxQLSpec.
  */
class InfluxQLRoundTripSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  test("parse(render(statement)) == statement for 300 generated statements") {
    check(Prop.forAll(InfluxQLGen.genStatement) { st =>
      val rendered = InfluxQLRender.render(st)
      val reparsed =
        try InfluxQLParser.parse(rendered)
        catch { case e: InfluxQLParseException =>
          throw new AssertionError(s"failed to reparse: $rendered", e) }
      if (reparsed != st)
        println(s"MISMATCH:\n  rendered: $rendered\n  expected: $st\n  got:      $reparsed")
      reparsed == st
    })
  }

  test("r9 TA / predictor spellings render round-trip") {
    // the generator can't mix these into multi-field selects (they must be
    // the SELECT's only field), so pin each spelling directly
    val tail = "FROM events WHERE time >= '2024-01-01' AND time < '2024-01-02' GROUP BY time(1h)"
    Seq(
      s"SELECT DOUBLE_EXPONENTIAL_MOVING_AVERAGE(MEAN(value), 9) $tail",
      s"SELECT TRIPLE_EXPONENTIAL_MOVING_AVERAGE(MEAN(value), 9) $tail",
      s"SELECT TRIPLE_EXPONENTIAL_DERIVATIVE(MEAN(value), 9) $tail",
      s"SELECT KAUFMANS_ADAPTIVE_MOVING_AVERAGE(MEAN(value), 9) $tail",
      s"SELECT HOLT_WINTERS_WITH_FIT(MEAN(value), 3, 0) $tail").foreach { q =>
      val st = InfluxQLParser.parse(q)
      assert(InfluxQLParser.parse(InfluxQLRender.render(st)) === st, q)
    }
  }
}
