package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{DecodeS7, PolyHash, ShingleHashes, TokenHashes, VecCos, VecDot, VecL2Sq}

/** Session-extension installer — makes the engine's native expressions
  * available to ANY session (including pure-SQL users) via
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * instead of requiring per-session `register(spark)` calls. Injected
  * functions: `decode_s7` (SURVEY §2.10 D3 — the S7 buffer decoder,
  * ref Linux/InfluxConnector2.py:146-170), `token_hashes` /
  * `shingle_hashes` / `poly_hash` (the dedup pipeline's native hashing),
  * and `vec_dot` / `vec_cos` / `vec_l2sq` (the codegen'd vector math of
  * the knn/embedding-dedup family).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private type Exprs = Seq[org.apache.spark.sql.catalyst.expressions.Expression]

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("decode_s7"),
      new ExpressionInfo(classOf[DecodeS7].getName, "decode_s7"),
      (children: Exprs) => DecodeS7(children(0), children(1), children(2))))
    ext.injectFunction((
      FunctionIdentifier("token_hashes"),
      new ExpressionInfo(classOf[TokenHashes].getName, "token_hashes"),
      (children: Exprs) => TokenHashes(children.head)))
    ext.injectFunction((
      FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (children: Exprs) => ShingleHashes(children.head)))
    ext.injectFunction((
      FunctionIdentifier("poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "poly_hash"),
      (children: Exprs) => PolyHash(children.head)))
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (children: Exprs) => VecDot(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("vec_cos"),
      new ExpressionInfo(classOf[VecCos].getName, "vec_cos"),
      (children: Exprs) => VecCos(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("vec_l2sq"),
      new ExpressionInfo(classOf[VecL2Sq].getName, "vec_l2sq"),
      (children: Exprs) => VecL2Sq(children(0), children(1))))
  }
}
