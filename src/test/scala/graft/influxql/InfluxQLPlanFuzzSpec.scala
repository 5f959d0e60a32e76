package graft.influxql

import org.scalacheck.{Prop, Test => SCTest}

import graft.SparkTestBase
import InfluxQLAst._

/** Planner totality fuzz: every generated SELECT the parser accepts (and
  * that satisfies the planner's documented preconditions — fill/forecast
  * need a bounded range) must PLAN and EXECUTE without throwing. Catches
  * crash-combinations the hand-written cases don't reach: transforms over
  * integral inside fill grids, tz + offset + SLIMIT stacks, expression
  * fields over every aggregate, per-series limits on top of all of it.
  */
class InfluxQLPlanFuzzSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  // pinned now(): relative bounds resolve inside the testdata's range
  private val nowNs = 1704844800000000000L // 2024-01-10T00:00Z

  private def hasLo(w: Seq[Cond]): Boolean = w.exists {
    case TimeCond(">" | ">=", _) | NowCond(">" | ">=", _) => true
    case _ => false
  }
  private def hasHi(w: Seq[Cond]): Boolean = w.exists {
    case TimeCond("<" | "<=", _) | NowCond("<" | "<=", _) => true
    case _ => false
  }

  test("60 generated SELECTs plan and execute without throwing") {
    // map, don't filter: a suchThat here exhausts the generator on some
    // seeds (the grammar generators already discard internally)
    val gen = InfluxQLGen.genSelect.map { s =>
      // fill() grids require a bounded WHERE range (documented refusal)
      if (s.fill != FillMissing && s.fill != FillNone &&
        !(hasLo(s.where) && hasHi(s.where))) s.copy(fill = FillMissing)
      else s
    }
    val prop = Prop.forAll(gen) { s =>
      val q = InfluxQLRender.render(s)
      try {
        InfluxQLPlanner.plan(spark, dir, s, nowNs = Some(nowNs)).limit(5).collect()
        true
      } catch { case e: Throwable =>
        println(s"FUZZ FAILURE on: $q\n  ${e.getClass.getSimpleName}: ${e.getMessage}")
        false
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(res.passed, res.status.toString)
  }

  test("TRIX over zero-valued buckets yields NULL, not DIVIDE_BY_ZERO (r12 fuzz find)") {
    // minimized from a failing generated case: SPREAD of single-point 5m
    // buckets is 0 everywhere, so TRIX's previous-e3 divisor is 0 — under
    // ANSI the old spelling threw mid-task; the x/0 convention is NULL
    val rows = InfluxQLPlanner.sql(spark, dir,
      """SELECT TRIPLE_EXPONENTIAL_DERIVATIVE(SPREAD(value), 3) AS t0
        |FROM events
        |WHERE time >= 1704104127957347594 AND time < 1704134608096023933
        |GROUP BY time(5m)""".stripMargin,
      nowNs = Some(nowNs)).collect()
    assert(rows.nonEmpty)
    // every populated single-point bucket spreads to 0 ⇒ TRIX is NULL
    assert(rows.forall(r => r.isNullAt(1)), s"expected NULLs, got ${rows.take(3).toSeq}")
  }

  test("20 generated SHOW TAG VALUES statements plan and execute without throwing") {
    val prop = Prop.forAll(InfluxQLGen.genShowTagValues) { st =>
      val q = InfluxQLRender.render(st)
      try {
        InfluxQLPlanner.sql(spark, dir, q, nowNs = Some(nowNs)).limit(5).collect()
        true
      } catch { case e: Throwable =>
        println(s"FUZZ FAILURE on: $q\n  ${e.getClass.getSimpleName}: ${e.getMessage}")
        false
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }
}
