package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** The native expression end-to-end through a DataFrame plan (codegen path). */
class DecodeS7ExprSpec extends SparkTestBase {

  test("decode_s7 in a plan: decodes all types, NULLs invalid input") {
    DecodeS7.register(spark)
    import spark.implicits._
    val rows = Seq(
      ("real50", S7.encodeReal(50.0f), S7.WLReal, 0),
      ("wordNeg", S7.encodeWord(-123), S7.WLWord, 0),
      ("dwordBig", S7.encodeDWord(4000000000L), S7.WLDWord, 0),
      ("bit1", S7.encodeBits(0x0a), S7.WLBit, 1),
      ("bit0", S7.encodeBits(0x0a), S7.WLBit, 2),
      ("shortBuf", Array[Byte](1), S7.WLReal, 0),
      ("badType", Array[Byte](1, 2, 3, 4), 99, 0),
    ).toDF("name", "buf", "type_code", "bit")
    val out = rows.select($"name", expr("decode_s7(buf, type_code, bit)").as("v"))
      .collect().map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(out("real50") === 50.0)
    assert(out("wordNeg") === -123.0)
    assert(out("dwordBig") === 4000000000.0)
    assert(out("bit1") === 1.0)
    assert(out("bit0") === 0.0)
    assert(out("shortBuf") == null)
    assert(out("badType") == null)
  }

  test("decode_s7 survives whole-stage codegen (forced on)") {
    DecodeS7.register(spark)
    import spark.implicits._
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val n = Seq.tabulate(100)(i => (S7.encodeWord(i.toShort), S7.WLWord, 0))
        .toDF("buf", "type_code", "bit")
        .select(expr("decode_s7(buf, type_code, bit)").as("v"))
        .agg(sum($"v")).as[Double].head()
      assert(n === (0 until 100).sum.toDouble)
    } finally spark.conf.unset("spark.sql.codegen.factoryMode")
  }
}
