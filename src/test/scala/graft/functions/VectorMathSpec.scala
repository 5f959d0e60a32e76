package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.Row

/** Pins the native vec_dot/vec_cos/vec_l2sq expressions to the
  * `aggregate(zip_with(...))` higher-order functions they replaced:
  * bit-identical doubles (same left-to-right fold order), identical null
  * semantics (length mismatch / null element → NULL), and execution inside
  * WholeStageCodegen (the whole point of going native).
  */
class VectorMathSpec extends SparkTestBase {

  private def hofDot(a: String, b: String) =
    s"aggregate(zip_with($a, $b, (x, y) -> cast(x AS double) * cast(y AS double)), 0D, (acc, v) -> acc + v)"
  private def hofCos(a: String, b: String) =
    s"${hofDot(a, b)} / (sqrt(${hofDot(a, a)}) * sqrt(${hofDot(b, b)}))"

  private lazy val df = {
    VectorMath.register(spark)
    // deterministic pseudo-random float vectors, incl. negative values —
    // built over spark.range (NOT a local Seq) so plans keep a real
    // WholeStageCodegen scan instead of folding to LocalTableScan
    spark.range(64).selectExpr("id",
      "transform(sequence(0, 47), i -> cast((((id * 31 + i * 17) % 41) - 20) / 7.0 AS float)) AS a",
      "transform(sequence(0, 47), i -> cast((((id * 13 + i * 29) % 37) - 18) / 5.0 AS float)) AS b")
  }

  test("vec_dot / vec_cos are bit-identical to the HOF folds on float arrays") {
    val bad = df.selectExpr(
      s"vec_dot(a, b) AS nd", s"${hofDot("a", "b")} AS hd",
      s"vec_cos(a, b) AS nc", s"${hofCos("a", "b")} AS hc")
      .where("nd <> hd OR nc <> hc") // bitwise-exact double compare
    assert(bad.count() === 0)
  }

  test("vec_l2sq matches the integer zip_with fold on long arrays") {
    val bad = df.selectExpr(
      "transform(a, x -> cast(floor(x * 7) AS bigint)) AS qa",
      "transform(b, x -> cast(floor(x * 5) AS bigint)) AS qb")
      .selectExpr("vec_l2sq(qa, qb) AS nl",
        "aggregate(zip_with(qa, qb, (x, y) -> (x - y) * (x - y)), 0L, (s, v) -> s + v) AS hl")
      .where("nl <> hl")
    assert(bad.count() === 0)
  }

  test("null semantics mirror zip_with: length mismatch and null elements → NULL") {
    VectorMath.register(spark)
    val r = spark.sql(
      """SELECT vec_dot(array(1.0D, 2.0D), array(1.0D)) AS mismatch,
        |       vec_dot(array(1.0D, CAST(NULL AS DOUBLE)), array(1.0D, 2.0D)) AS nullelem,
        |       vec_cos(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D)) AS nullarr,
        |       vec_l2sq(array(1L, 2L), array(1L, 2L, 3L)) AS lmismatch
        |""".stripMargin).collect()(0)
    assert(r === Row(null, null, null, null))
  }

  test("property: HOF parity holds over hostile values (NaN/Inf/-0.0/empty/tiny/huge)") {
    import org.scalacheck.Gen
    VectorMath.register(spark)
    val special = Gen.oneOf(0.0, -0.0, Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity, Double.MinPositiveValue, 1e300, -1e300, 1.5, -2.25)
    val elem = Gen.frequency(3 -> Gen.chooseNum(-1e6, 1e6), 1 -> special)
    val genVec = Gen.choose(0, 8).flatMap(n => Gen.listOfN(n, elem))
    val vecs = Gen.listOfN(200, Gen.zip(genVec, genVec)).sample.get ++ Seq(
      // pinned: denormal squares underflow the norm to 0 while the
      // cross-dot survives → guarded zero-norm, native ±Inf (found by fuzz)
      (List(java.lang.Double.MIN_VALUE), List(1e6)),
      (List(0.0, -0.0), List(1.0, 2.0)), // exact zero norm → NaN
      (List.empty[Double], List.empty[Double])) // both empty → NaN
    import spark.implicits._
    val df2 = vecs.toDF("a", "b")
    // java.lang.Double.equals treats NaN == NaN and distinguishes ±0.0 —
    // exactly the bit-level parity contract. One documented divergence:
    // on an exactly-zero norm the ANSI HOF division THROWS, while vec_cos
    // returns IEEE NaN (kinder, and unreachable on real embeddings) — the
    // CASE guards the HOF and the property pins native NaN for that case.
    val rows = df2.selectExpr(
      s"vec_dot(a, b) AS nd", s"${hofDot("a", "b")} AS hd",
      s"vec_cos(a, b) AS nc",
      s"CASE WHEN sqrt(${hofDot("a", "a")}) * sqrt(${hofDot("b", "b")}) = 0.0D THEN NULL " +
        s"ELSE ${hofCos("a", "b")} END AS hc",
      s"sqrt(${hofDot("a", "a")}) * sqrt(${hofDot("b", "b")}) = 0.0D AS zero_norm").collect()
    val bad = rows.zipWithIndex.filterNot { case (r, _) =>
      def eqD(x: Int, y: Int) =
        (r.isNullAt(x) && r.isNullAt(y)) ||
          (!r.isNullAt(x) && !r.isNullAt(y) &&
            java.lang.Double.valueOf(r.getDouble(x)).equals(java.lang.Double.valueOf(r.getDouble(y))))
      // either bit-equal (incl. both-NULL, e.g. length mismatch), or the
      // guarded zero-norm case where the ANSI HOF would throw → native
      // IEEE x/0: NaN when the cross-dot is 0 too, ±Inf when denormal
      // squares underflowed the norm to 0 but the cross-dot survived
      val cosOk = eqD(2, 3) ||
        (r.isNullAt(3) && !r.isNullAt(2) &&
          (r.getDouble(2).isNaN || r.getDouble(2).isInfinite))
      eqD(0, 1) && cosOk
    }
    assert(bad.isEmpty, bad.take(3).map { case (r, i) =>
      s"row $i: vecs=${vecs(i)} row=$r"
    }.mkString("\n"))
  }

  test("the expressions run inside WholeStageCodegen (no fallback, no eval)") {
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    val plan = df.selectExpr("vec_cos(a, b) AS c", "vec_dot(a, b) AS d")
      .queryExecution.executedPlan
    val stages = plan.collect { case w: WholeStageCodegenExec => w }
    assert(stages.exists(_.toString.contains("vec_cos")),
      s"expected vec_cos inside a WholeStageCodegen stage in:\n$plan")
    // interpreted-path parity too (e.g. when codegen is disabled): direct eval
    val hof = df.selectExpr(s"${hofCos("a", "b")} AS c").collect().map(_.getDouble(0))
    val nat = df.selectExpr("vec_cos(a, b) AS c").collect().map(_.getDouble(0))
    assert(java.util.Arrays.equals(hof, nat))
  }
}
