package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** r12 optimization guards: the native one-pass expressions that replaced
  * interpreted higher-order-function spellings in the dedup/text hot paths
  * must be BIT-IDENTICAL to the HOF forms they replaced (the DuckDB oracle
  * fragments still describe the HOF semantics).
  */
class NativeTextExprSpec extends SparkTestBase {

  private def tokensDf = {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val words = Vector("alpha", "beta", "gamma", "", "delta", "épsilon", "z")
    (0 until 200).map { i =>
      val n = rnd.nextInt(12) // includes arrays shorter than every n below
      (i.toLong, (0 until n).map(_ => words(rnd.nextInt(words.length))))
    }.toDF("id", "toks")
  }

  test("word_ngrams(toks, n) == transform(sequence, concat_ws(slice)) for n in 2, 5, 8") {
    TextHash.register(spark)
    for (n <- Seq(2, 5, 8)) {
      val df = tokensDf
        .withColumn("native", expr(s"word_ngrams(toks, $n)"))
        .withColumn("hof", expr(
          s"CASE WHEN size(toks) >= $n THEN transform(sequence(1, size(toks) - ${n - 1}), " +
            s"i -> concat_ws(' ', slice(toks, i, $n))) ELSE array() END"))
      val bad = df.filter(col("native") =!= col("hof")).count()
      assert(bad == 0L, s"n=$n: $bad rows diverge from the HOF spelling")
    }
  }

  test("word_ngrams skips NULL array elements like concat_ws (ADVICE r12 — " +
      "UnsafeArrayData reads a null element as empty string without the guard)") {
    TextHash.register(spark)
    import spark.implicits._
    val df = Seq(
      (1L, Seq[String]("a", null, "b", "c")),
      (2L, Seq[String](null, null, "x")),
      (3L, Seq[String]("only")))
      .toDF("id", "toks")
      // force the UnsafeArrayData representation through an exchange
      .repartition(2)
      .withColumn("native", expr("word_ngrams(toks, 2)"))
      .withColumn("hof", expr(
        "CASE WHEN size(toks) >= 2 THEN transform(sequence(1, size(toks) - 1), " +
          "i -> concat_ws(' ', slice(toks, i, 2))) ELSE array() END"))
    assert(df.filter(col("native") =!= col("hof")).count() == 0L,
      "null elements must contribute nothing, exactly like concat_ws")
    // "a NULL" must be the gram "a", not "a " (the empty-string read)
    val g = df.filter(col("id") === 1).select(expr("element_at(native, 1)")).head().getString(0)
    assert(g == "a", s"expected 'a', got '$g'")
  }

  test("word_ngrams with the wrong arity raises an AnalysisException, not an index error") {
    TextHash.register(spark)
    import spark.implicits._
    val df = Seq((1L, Seq("a", "b"))).toDF("id", "toks")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.selectExpr("word_ngrams(toks)").collect()
    }
    assert(e.getMessage.toLowerCase.contains("word_ngrams"))
  }

  test("minhash_sig(hs) == array_min(transform(hs, (a*hv+b) % p)) for all 8 hashes") {
    TextHash.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(43)
    val hs = (0 until 200).map { i =>
      (i.toLong, (0 until rnd.nextInt(40)).map(_ => math.abs(rnd.nextLong()) % TextHash.Mod))
    }.toDF("id", "hs")
    val withSig = hs.withColumn("sig", expr("minhash_sig(hs)"))
    val checks = TextHash.MinHashA.indices.map { j =>
      val a = TextHash.MinHashA(j); val b = TextHash.MinHashB(j)
      expr(s"element_at(sig, ${j + 1})") <=>
        expr(s"array_min(transform(hs, hv -> ($a * hv + $b) % ${TextHash.MinHashP}))")
    }.reduce(_ && _)
    val bad = withSig.filter(!checks).count()
    assert(bad == 0L, s"$bad rows diverge from the transform spelling (incl. empty arrays)")
  }
}
