package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{DecodeS7, ShingleHashes, TokenHashes}

/** Session-extension installer — makes the engine's native expressions
  * available to ANY session (including pure-SQL users) via
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * instead of requiring per-session `register(spark)` calls. Injected
  * functions: `decode_s7` (SURVEY §2.10 D3 — the S7 buffer decoder,
  * ref Linux/InfluxConnector2.py:146-170), `token_hashes` /
  * `shingle_hashes` (the dedup pipeline's native hashing).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("decode_s7"),
      new ExpressionInfo(classOf[DecodeS7].getName, "decode_s7"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DecodeS7(children(0), children(1), children(2))))
    ext.injectFunction((
      FunctionIdentifier("token_hashes"),
      new ExpressionInfo(classOf[TokenHashes].getName, "token_hashes"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        TokenHashes(children.head)))
    ext.injectFunction((
      FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ShingleHashes(children.head)))
  }
}
