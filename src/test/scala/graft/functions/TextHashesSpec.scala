package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Native TokenHashes/ShingleHashes must equal the interpreted lambda
  * forms they replaced (the oracle-parity contract), including null array
  * elements (ADVICE round 2: these NPE'd before).
  */
class TextHashesSpec extends SparkTestBase {

  private val CP = 1000000007L

  private def refTokenHash(s: String): Long =
    s.foldLeft(0L)((acc, c) => (acc * 31 + c.toInt) % CP)

  test("token_hashes == per-token polynomial hash; null elements map to null") {
    import spark.implicits._
    TextHash.register(spark)
    val toks: Seq[Seq[String]] = Seq(
      Seq("hello", "world"), Seq(""), Seq("a", null, "b"), Seq(null), Seq())
    val rows = toks.map(t => Tuple1(t)).toDF("toks")
      .withColumn("hs", expr("token_hashes(toks)"))
      .select("hs").as[Seq[java.lang.Long]].collect()
    toks.zip(rows).foreach { case (in, out) =>
      assert(out.length === in.length)
      in.zip(out).foreach {
        case (null, h) => assert(h == null)
        case (s, h)    => assert(h == refTokenHash(s), s"token '$s'")
      }
    }
  }

  test("token_hashes matches the reference fold on seeded random ASCII tokens") {
    import spark.implicits._
    TextHash.register(spark)
    val rnd = new scala.util.Random(42)
    val samples = Seq.fill(30)(
      Seq.fill(rnd.nextInt(6))(rnd.alphanumeric.take(rnd.nextInt(12)).mkString))
    val rows = samples.map(Tuple1(_)).toDF("toks")
      .selectExpr("token_hashes(toks) AS hs").as[Seq[Long]].collect()
    samples.zip(rows).foreach { case (ts, out) =>
      assert(out === ts.map(refTokenHash), s"input $ts")
    }
  }

  private def refCodepointHash(s: String): Long = {
    var acc = 0L
    s.codePoints().forEach(cp => acc = (acc * 31 + cp) % CP)
    acc
  }

  test("poly_hash folds whole codepoints: non-BMP chars contribute one step, not surrogate pairs") {
    import spark.implicits._
    TextHash.register(spark)
    // U+1F600 (emoji) and U+10348 are surrogate pairs in UTF-16; each must
    // fold exactly once with its full codepoint, matching the DuckDB
    // string_split+unicode per-codepoint iteration.
    val samples = Seq("a😀b", "𐍈", "mixed 😀😁 tail", "plain ascii", "")
    val out = samples.toDF("s").selectExpr("poly_hash(s) AS h").as[Long].collect()
    samples.zip(out).foreach { case (s, h) =>
      assert(h === refCodepointHash(s), s"input codepoints ${s.codePoints().toArray.toSeq}")
    }
    // And the ASCII fast path still agrees with the char-wise reference.
    assert(out(3) === refTokenHash("plain ascii"))
  }

  test("token_hashes and shingle_hashes agree with the codepoint fold on non-BMP tokens") {
    import spark.implicits._
    TextHash.register(spark)
    val toks = Seq("café", "😀", "x𐍈y")
    val th = Seq(Tuple1(toks)).toDF("toks")
      .selectExpr("token_hashes(toks) AS hs").as[Seq[Long]].head()
    assert(th === toks.map(refCodepointHash))
    val sh = Seq(Tuple1(toks)).toDF("toks")
      .selectExpr("shingle_hashes(toks) AS hs").as[Seq[Long]].head()
    assert(sh === Seq(refCodepointHash(toks.mkString(" "))))
  }

  test("shingle_hashes == distinct hashes of 3-token windows; null-containing windows skipped") {
    import spark.implicits._
    TextHash.register(spark)
    def refShingles(ts: Seq[String]): Seq[Long] =
      ts.sliding(3).filter(w => w.size == 3 && !w.contains(null))
        .map(w => refTokenHash(w.mkString(" "))).toSeq.distinct
    val cases: Seq[Seq[String]] = Seq(
      Seq("a", "b", "c", "d"), Seq("x", "x", "x", "x", "x"),
      Seq("a", null, "c", "d", "e"), Seq("a", "b"), Seq())
    cases.foreach { ts =>
      val out = Seq(Tuple1(ts)).toDF("toks")
        .selectExpr("shingle_hashes(toks) AS hs").as[Seq[Long]].head()
      assert(out === refShingles(ts), s"input $ts")
    }
  }
}
