package graft.sinks

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The driver-local parser ([[LineProtocolLocal]], the /write hot path)
  * must implement EXACTLY the grammar of the distributed parser
  * ([[LineProtocol.parseLines]], the bulk path): this spec runs one
  * shared corpus — every grammar feature plus the property-test's
  * hostile names — through both and compares measurement, tags, string
  * fields, numeric views, and timestamps field by field. The Spark
  * parser's own property-pinned round trip (LineProtocolSpec) makes it
  * the oracle.
  */
class LineProtocolLocalSpec extends SparkTestBase {

  private val corpus: Seq[String] = {
    val nasty = Seq("plain", "with space", "with,comma", "k=v", "a b,c=d",
      "back\\slash", "__two  spaces")
    val escaped = nasty.map(_.replace(",", "\\,").replace(" ", "\\ "))
    val keyEscaped = escaped.map(_.replace("=", "\\="))
    (for { m <- escaped; a <- keyEscaped }
      yield s"$m $a=3.25 1704067200000000000") ++ Seq(
      "cpu,host=a,dc=west usage=0.5,idle=99.1 1704067200000000000",
      "my\\ plc,unit=c temp=21.5 5000",
      "bare value=1.0",
      """disk,path\,0=/mnt\ data,k\=1=v\=2 used=10.5 100""",
      """log,host=a msg="warn, disk=\" 90%\" full",count=42i,load=0.5 200""",
      """flag,host=b ok=true 300""",
      """str,host=c value="3.5" 400""", // quoted numeric: STRING-typed
      "neg,host=d delta=-42i,f=-1.5e3 500",
      "m v=1",
      "plc9,alias=temp value=21.5 1704067200000000000")
  }

  test("local parser == distributed parser over the shared grammar corpus") {
    import spark.implicits._
    val sparkSide = LineProtocol.parseLines(corpus.toDF("line"))
      .select(col("line"), col("measurement"), col("tags"), col("fields_str"),
        col("fields"), col("ts_ns"))
      .collect()
      .map(r => r.getString(0) -> r).toMap
    corpus.foreach { line =>
      val local = LineProtocolLocal.parseLine(line)
      assert(local.isRight, s"local parser rejected '$line': $local")
      val p = local.toOption.get
      val s = sparkSide(line)
      assert(p.measurement == s.getString(1), s"measurement for '$line'")
      assert(p.tags == s.getAs[Map[String, String]]("tags"), s"tags for '$line'")
      assert(p.fields.map(f => f.key -> f.str).toMap ==
        s.getAs[Map[String, String]]("fields_str"), s"fields_str for '$line'")
      // java.lang.Double keeps the null (unset numeric view) from being
      // silently unboxed to 0.0 in the comparison
      val sparkNum = s.getAs[Map[String, java.lang.Double]]("fields")
      p.fields.foreach { f =>
        assert(f.num.map(Double.box) == Option(sparkNum(f.key)),
          s"numeric view for '$line' field ${f.key}: local=${f.num} spark=${sparkNum(f.key)}")
      }
      val sparkTs = if (s.isNullAt(5)) None else Some(s.getLong(5))
      assert(p.tsNs == sparkTs, s"ts for '$line'")
    }
  }

  test("quoted string field values are never coerced to numbers (both parsers)") {
    import spark.implicits._
    // value="3.5" is a STRING on the wire — InfluxDB would store a string
    // field, never the float 3.5
    val local = LineProtocolLocal.parseLine("""m,alias=a value="3.5" 100""").toOption.get
    assert(local.fields == Vector(LineProtocolLocal.Field("value", "3.5", None)))
    val row = LineProtocol.parseLines(Seq("""m,alias=a value="3.5" 100""").toDF("line"))
      .select(element_at(col("fields"), "value")).collect()(0)
    assert(row.isNullAt(0), "distributed parser must not coerce quoted values")
  }

  test("property: local parser == distributed parser over generated lines") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    // names over the full separator alphabet (escaped on the wire);
    // trailing backslash excluded — the wire's own unrepresentable case
    val nameChar = Gen.frequency(
      (8, Gen.alphaNumChar), (1, Gen.const(' ')), (1, Gen.const(',')),
      (1, Gen.const('=')), (1, Gen.const('_')))
    val name = Gen.nonEmptyListOf(nameChar).map(_.mkString)
      .suchThat(s => !s.endsWith("\\") && s.trim.nonEmpty)
    def esc(s: String, eq: Boolean): String = {
      val base = s.replace(",", "\\,").replace(" ", "\\ ")
      if (eq) base.replace("=", "\\=") else base
    }
    val fieldVal = Gen.oneOf(
      Gen.chooseNum(-1e6, 1e6).map(d => f"$d%.3f"),
      Gen.chooseNum(-99999L, 99999L).map(l => s"${l}i"),
      Gen.const("true"),
      Gen.alphaNumStr.map(s => "\"" + s + "\""))
    val genLine = for {
      m <- name
      nTags <- Gen.choose(0, 3)
      tags <- Gen.listOfN(nTags, Gen.zip(name, name))
      nFields <- Gen.choose(1, 4)
      fields <- Gen.listOfN(nFields, Gen.zip(name, fieldVal))
      ts <- Gen.option(Gen.choose(0L, 1800000000000000000L))
    } yield {
      val tagPart = tags.zipWithIndex
        .map { case ((k, v), i) => s",${esc(s"$k$i", eq = true)}=${esc(v, eq = true)}" }
        .mkString
      val fieldPart = fields.zipWithIndex
        .map { case ((k, v), i) => s"${esc(s"$k$i", eq = true)}=$v" }.mkString(",")
      s"${esc(m, eq = false)}$tagPart $fieldPart${ts.map(" " + _).getOrElse("")}"
    }
    val lines = Gen.listOfN(120, genLine).sample.getOrElse(Nil)
    assert(lines.size == 120)
    val sparkSide = LineProtocol.parseLines(lines.distinct.toDF("line"))
      .select(col("line"), col("measurement"), col("tags"), col("fields_str"),
        col("fields"), col("ts_ns"))
      .collect().map(r => r.getString(0) -> r).toMap
    val prop = Prop.forAll(Gen.oneOf(lines)) { line =>
      val s = sparkSide(line)
      LineProtocolLocal.parseLine(line) match {
        case Right(p) =>
          val sparkNum = s.getAs[Map[String, java.lang.Double]]("fields")
          p.measurement == s.getString(1) &&
            p.tags == s.getAs[Map[String, String]]("tags") &&
            p.fields.map(f => f.key -> f.str).toMap ==
              s.getAs[Map[String, String]]("fields_str") &&
            p.fields.forall(f => f.num.map(Double.box) == Option(sparkNum(f.key))) &&
            p.tsNs == (if (s.isNullAt(5)) None else Some(s.getLong(5)))
        case Left(_) => false
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), prop)
    assert(res.passed, res.status.toString)
  }

  test("local parser rejects malformed lines with pointed reasons") {
    def reject(line: String): String =
      LineProtocolLocal.parseLine(line).swap.toOption
        .getOrElse(fail(s"'$line' should have been rejected"))
    assert(reject("plc9,alias=temp nonsense").contains("field"))
    assert(reject("").contains("measurement"))
    assert(reject("justname").contains("fields"))
    assert(reject("m,=v value=1").contains("tag"))
    assert(reject("m v=1 notanumber").contains("timestamp"))
  }
}
