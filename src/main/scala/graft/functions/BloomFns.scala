package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Session registration for Spark's native bloom-filter expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the machinery
  * behind AQE runtime filters, which Catalyst only injects on its own
  * heuristics). Registering them makes the runtime-filter pattern
  * available EXPLICITLY: build a bloom of the (filtered) dim-side join
  * keys as a scalar subquery, prune the fact side before the shuffle.
  *
  * At 100 TB this is the difference between shuffling the whole fact
  * table and shuffling only rows that can possibly match — the bloom is
  * a few MB broadcast to every task, false positives are removed by the
  * exact join that follows, so the final result is identical (which is
  * what makes `q_join_bloom` oracle-checkable with a plain SQL join).
  */
object BloomFns {

  /** Register `graft_bloom_agg(hash)` and `graft_might_contain(bloom, hash)`.
    * Idempotent.
    */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.registerFunction(
      FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(classOf[BloomFilterAggregate].getName, "graft_bloom_agg"),
      (children: Seq[Expression]) => children match {
        case Seq(c)       => new BloomFilterAggregate(c)
        case Seq(c, n)    => new BloomFilterAggregate(c, n)
        case Seq(c, n, b) => BloomFilterAggregate(c, n, b, 0, 0)
        case _ => throw new IllegalArgumentException(
          "graft_bloom_agg(hash[, estimatedItems[, numBits]])")
      })
    registry.registerFunction(
      FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(classOf[BloomFilterMightContain].getName, "graft_might_contain"),
      (children: Seq[Expression]) => children match {
        case Seq(bloom, value) => BloomFilterMightContain(bloom, value)
        case _ => throw new IllegalArgumentException("graft_might_contain(bloom, hash)")
      })
  }
}
