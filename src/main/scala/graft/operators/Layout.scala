package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical data-layout utilities (r13) — the WRITE side of
  * `queries/QLayout`'s planner: cluster a table on several dimensions so
  * parquet footer min/max stats (zone maps) prune files for predicates on
  * ANY clustered dimension. This is `OPTIMIZE ZORDER BY` as a plain
  * library call: rank-normalize each dimension, bit-interleave, range-
  * partition on the z-value, sort within partitions, write.
  *
  * At 100 TB the write is one range-shuffle (Spark samples the z
  * distribution for balanced files) — the same cost as any global sort —
  * and it pays back on every scan that carries a clustered-dimension
  * predicate. ZOrderSkipSpec measures the payback on real parquet.
  */
object Layout {

  /** Interleave-spread `x`'s low `bits` across positions `stride` apart
    * (position offset 0): the magic-mask ladder generalized to stride 2
    * (2-D) and the shift-compose loop for higher strides. Input must fit
    * in `bits` (callers rank-normalize first). */
  private def spread(x: Column, bits: Int, stride: Int): Column =
    if (stride == 2) {
      // classic doubling ladder, 16→32 bits
      val a = (x.bitwiseOR(shiftleft(x, 8))).bitwiseAND(lit(0x00FF00FFL))
      val b = (a.bitwiseOR(shiftleft(a, 4))).bitwiseAND(lit(0x0F0F0F0FL))
      val c = (b.bitwiseOR(shiftleft(b, 2))).bitwiseAND(lit(0x33333333L))
      (c.bitwiseOR(shiftleft(c, 1))).bitwiseAND(lit(0x55555555L))
    } else {
      // general stride: place bit i of x at position i·stride — a sum of
      // disjoint masked shifts (bit-exact, codegen-friendly, bits ≤ 21)
      (0 until bits).map { i =>
        shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), i * stride)
      }.reduce((p, q) => p.bitwiseOR(q))
    }

  /** N-dimensional z-value of rank-normalized inputs: dimension j's bits
    * land on positions ≡ N−1−j (mod N), so earlier dims take higher
    * significance within each bit group (matches the 2-D planner's
    * `2·spread(a) + spread(b)`). Each dim gets `60 / n` bits. */
  def zValueN(ranked: Seq[Column]): Column = {
    val n = ranked.size
    require(n >= 2 && n <= 4, s"z-order supports 2-4 dimensions, got $n")
    val bits = 60 / n min 16
    ranked.zipWithIndex.map { case (c, j) =>
      shiftleft(spread(c, bits, n), n - 1 - j)
    }.reduce((p, q) => p.bitwiseOR(q))
  }

  /** Rank-normalize `c` into [0, 2^bits): value·2^bits div (max+1).
    * `domain` is the exclusive upper bound of the dimension (max + 1). */
  def rankNorm(c: Column, domain: Column, bits: Int): Column =
    (c * (1L << bits)).divide(domain).cast("long")

  /** Z-cluster `df` on `dims` (2-4 numeric columns) into `numFiles`
    * parquet files at `path`: each file covers one z-range, so its footer
    * min/max are tight on EVERY clustered dimension. Dimension domains
    * are taken from the data (one tiny aggregate). */
  def zorderWrite(df: DataFrame, dims: Seq[String], numFiles: Int,
      path: String): Unit = {
    val n = dims.size
    val bits = 60 / n min 16
    val bounds = df.agg(
      (max(col(dims.head)) + 1).as(s"__d0"),
      dims.tail.zipWithIndex.map { case (d, i) =>
        (max(col(d)) + 1).as(s"__d${i + 1}") }: _*)
    val ranked = dims.zipWithIndex.map { case (d, j) =>
      rankNorm(col(d), col(s"__d$j"), bits)
    }
    df.crossJoin(broadcast(bounds))
      .withColumn("__z", zValueN(ranked))
      .select(df.columns.map(col) :+ col("__z"): _*)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
