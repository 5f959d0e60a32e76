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
}
