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
