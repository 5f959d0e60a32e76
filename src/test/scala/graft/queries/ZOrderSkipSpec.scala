package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Physical twin of q_zorder_layout (L1, r13): writes REAL parquet under
  * both layouts and measures how many files a 2-D predicate actually
  * touches.
  *
  * "Touches" = distinct `input_file_name()` over the matching rows — the
  * set of files a zone-map-pruning reader cannot skip, because a file
  * whose footer min/max excludes the predicate never contains a matching
  * row. This is the honest, reader-independent measure of layout quality
  * (Spark's own row-group pruning then benefits from exactly these
  * footer stats).
  *
  * Pinned claims:
  *  - a 1-D layout (sorted by partkey) concentrates a partkey predicate
  *    but smears a suppkey predicate across EVERY file;
  *  - the z-order layout bounds BOTH single-dimension predicates and is
  *    strictly better on the conjunction than the 1-D layout's
  *    non-leading dimension.
  */
class ZOrderSkipSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.01"
  private val files = 16

  private def writeLayout(sorted: org.apache.spark.sql.DataFrame, dir: String): Unit =
    sorted.write.mode("overwrite").parquet(dir)

  private def filesTouched(dir: String, p: (Long, Long), s: (Long, Long)): Long =
    spark.read.parquet(dir)
      .filter(col("l_partkey").between(p._1, p._2) &&
        col("l_suppkey").between(s._1, s._2))
      .select(input_file_name()).distinct().count()

  test("z-order layout concentrates 2-D predicates; 1-D smears the non-leading dim") {
    val li = graft.tables.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    val Array(np, ns) = li
      .agg(max("l_partkey") + 1, max("l_suppkey") + 1).head()
      .toSeq.map(_.asInstanceOf[Number].longValue).toArray

    val base = Files.createTempDirectory("graft-zorder").toString
    val zDir = s"$base/z"
    val lDir = s"$base/l"

    // z-order write: range-partition on the z-value then sort within —
    // exactly the at-scale recipe (each output file covers one z-range,
    // so its footer min/max are tight on BOTH dimensions)
    val withZ = li.withColumn("z",
      QLayout.zValue(expr(s"l_partkey * 65536 div $np"), expr(s"l_suppkey * 65536 div $ns")))
    writeLayout(
      withZ.repartitionByRange(files, col("z"), col("l_orderkey"), col("l_linenumber"))
        .sortWithinPartitions("z").drop("z"), zDir)
    // 1-D write: the same file count, sorted by the leading key only
    writeLayout(
      li.repartitionByRange(files, col("l_partkey"), col("l_orderkey"), col("l_linenumber"))
        .sortWithinPartitions("l_partkey"), lDir)

    assert(spark.read.parquet(zDir).count() === li.count())

    // the q_zorder_layout predicate shapes: 10%-wide ranges; the open
    // side spans the ACTUAL domain (not a hardcoded cap) so the spec
    // stays honest at any SF
    val pRange = (np / 4, np / 4 + np / 10 - 1)
    val sRange = (ns / 10, 2 * (ns / 10) - 1)
    val allP = (0L, np)
    val allS = (0L, ns)

    val zP = filesTouched(zDir, pRange, allS)
    val zS = filesTouched(zDir, allP, sRange)
    val zB = filesTouched(zDir, pRange, sRange)
    val lP = filesTouched(lDir, pRange, allS)
    val lS = filesTouched(lDir, allP, sRange)
    val lB = filesTouched(lDir, pRange, sRange)

    info(s"files touched of $files — zorder: p=$zP s=$zS both=$zB; linear: p=$lP s=$lS both=$lB")

    // 1-D: perfect on its own key, useless on the other dimension
    assert(lP <= 4, s"1-D layout should concentrate its own key, touched $lP")
    assert(lS === files.toLong, "1-D layout cannot skip any file for the non-leading dim")
    // z-order: bounded on BOTH dimensions (≤ half the files for a 10% range)
    assert(zP <= files / 2, s"z-order partkey predicate touched $zP of $files")
    assert(zS <= files / 2, s"z-order suppkey predicate touched $zS of $files")
    // conjunction: z-order must beat the 1-D layout's smeared dimension
    assert(zB < lS, s"z-order conjunction ($zB) should beat 1-D's smear ($lS)")
    assert(zB <= zP && zB <= zS, "conjunction can only prune further")
  }

  test("Layout.zorderWrite clusters 3 dimensions: every single-dim predicate stays bounded") {
    import graft.operators.Layout
    val li = graft.tables.Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_suppkey"),
        col("l_quantity").cast("long").as("l_qty"))
    val Seq(np, ns, nq) = li
      .agg(max("l_partkey") + 1, max("l_suppkey") + 1, max("l_qty") + 1).head()
      .toSeq.map(_.asInstanceOf[Number].longValue)

    val dir = Files.createTempDirectory("graft-zorder3").toString + "/z3"
    Layout.zorderWrite(li, Seq("l_partkey", "l_suppkey", "l_qty"), files, dir)
    assert(spark.read.parquet(dir).count() === li.count())

    def touched(cond: org.apache.spark.sql.Column): Long =
      spark.read.parquet(dir).filter(cond)
        .select(input_file_name()).distinct().count()

    // 10%-wide range on each dimension independently
    val tP = touched(col("l_partkey").between(np / 4, np / 4 + np / 10 - 1))
    val tS = touched(col("l_suppkey").between(ns / 10, 2 * (ns / 10) - 1))
    val tQ = touched(col("l_qty").between(nq / 10, 2 * (nq / 10) - 1))
    val tAll = touched(
      col("l_partkey").between(np / 4, np / 4 + np / 10 - 1) &&
        col("l_suppkey").between(ns / 10, 2 * (ns / 10) - 1) &&
        col("l_qty").between(nq / 10, 2 * (nq / 10) - 1))
    info(s"3-D z-order files touched of $files: p=$tP s=$tS q=$tQ conjunction=$tAll")

    // no dimension smears across every file (the 1-D failure mode), and
    // the conjunction prunes at least as hard as any single dimension
    for ((t, d) <- Seq((tP, "partkey"), (tS, "suppkey"), (tQ, "qty")))
      assert(t < files.toLong, s"3-D z-order must bound the $d predicate, touched $t/$files")
    assert(tAll <= Seq(tP, tS, tQ).min)
  }
}
