package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftQuery
import Q._

/** Data-LAYOUT operators (r13) — the storage-side half of the 100 TB
  * story. Query-side pruning (PushedFilters, partition pruning, zone
  * maps) only pays when the data is physically clustered so that a
  * predicate's rows live in FEW files; these operators compute and
  * measure that clustering.
  *
  * Z-ORDERING interleaves the bits of several clustering dimensions into
  * one sort key, so a range predicate on ANY of the dimensions maps to a
  * bounded set of key ranges — after a range-partitioned write, every
  * file's min/max footer stats (parquet zone maps) are tight on EVERY
  * dimension, where a 1-D sort is tight on the leading dimension only.
  * This is the layout trick behind Delta/Iceberg `OPTIMIZE ZORDER BY`;
  * here it is a plain integer expression + `repartitionByRange`, nothing
  * engine-private. The bit-interleave is the classic magic-mask spread
  * (each step doubles the gap between payload bits), all BIGINT `|`/`&`/
  * shift arithmetic — both engines replay it bit-for-bit.
  *
  * ZOrderSkipSpec is the physical twin: it writes real parquet both ways
  * and counts the files a 2-D predicate actually touches.
  */
object QLayout {

  /** Two-dimensional z-value: a's bits on odd positions, b's on even —
    * delegates to the ONE spread-ladder implementation in
    * `operators/Layout` (the write-side utility), so planner and writer
    * can never drift. */
  def zValue(a: Column, b: Column): Column =
    graft.operators.Layout.zValueN(Seq(a, b))

  /** The same spread ladder as ONE DuckDB SQL expression (textual
    * duplication is fine — the oracle runs once at tiny SF). */
  private def spreadSql(x: String): String = {
    val s1 = s"(($x | ($x << 8)) & 16711935)"
    val s2 = s"(($s1 | ($s1 << 4)) & 252645135)"
    val s3 = s"(($s2 | ($s2 << 2)) & 858993459)"
    s"(($s3 | ($s3 << 1)) & 1431655765)"
  }

  val all: Seq[GraftQuery] = Seq(

    GraftQuery(
      "q_zorder_layout",
      "L1 (r13): Z-ORDER layout planner — the analytic zone-map skip-rate report a " +
        "100 TB table owner reads before choosing a clustering key. lineitem rows are " +
        "bucketed into 64 equal-count 'files' two ways: 1-D (sorted by l_partkey — " +
        "what a naive date/key sort gives) and Z-ORDER (bit-interleaved " +
        "l_partkey×l_suppkey, the magic-mask spread ladder in plain BIGINT " +
        "arithmetic). Per bucket the min/max of BOTH dimensions — exactly the parquet " +
        "footer stats a scan prunes on — then for three predicates (partkey range, " +
        "suppkey range, both) the number of files whose bounding box intersects: the " +
        "files a zone-map-pruning scan MUST read. The 1-D layout is near-perfect on " +
        "its own sort key and reads EVERY file for the other dimension (sf0.01: " +
        "8 vs 64 of 64); z-order stays bounded on BOTH single dimensions (12 and 18) " +
        "and is multiplicatively better on the conjunction (3 vs 8) — the measured, " +
        "all-integer version of the curve every OPTIMIZE-ZORDER doc sketches. Each " +
        "dimension is normalized to a 16-bit rank (value·65536 div domain) before " +
        "interleaving so unequal key widths cannot let one dimension dominate the " +
        "curve. At scale the buckets are real files " +
        "(repartitionByRange on the z-value + per-file footer stats; ZOrderSkipSpec " +
        "is that physical twin), and equal-count bucketing is Spark's own " +
        "range-partitioner contract (Q.stackedNtile — both layouts' buckets in one " +
        "range exchange, no SinglePartition sort).",
      s"""WITH bounds0 AS (SELECT max(l_partkey) + 1 AS np, max(l_suppkey) + 1 AS ns
         |                 FROM lineitem),
         |z0 AS (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
         |             2 * ${spreadSql("(l_partkey * 65536 // np)")}
         |               + ${spreadSql("(l_suppkey * 65536 // ns)")} AS z
         |            FROM lineitem, bounds0),
         |zt AS (SELECT l_partkey, l_suppkey,
         |              ntile(64) OVER (ORDER BY z, l_orderkey, l_linenumber) AS zb,
         |              ntile(64) OVER (ORDER BY l_partkey, l_orderkey, l_linenumber) AS lb
         |       FROM z0),
         |boxes AS (
         |  SELECT 'zorder' AS layout, zb AS f,
         |         min(l_partkey) AS pmin, max(l_partkey) AS pmax,
         |         min(l_suppkey) AS smin, max(l_suppkey) AS smax
         |  FROM zt GROUP BY zb
         |  UNION ALL
         |  SELECT 'linear', lb, min(l_partkey), max(l_partkey),
         |         min(l_suppkey), max(l_suppkey)
         |  FROM zt GROUP BY lb),
         |preds AS (SELECT predicate,
         |            CASE WHEN usep THEN np // 4 ELSE 0 END AS plo,
         |            CASE WHEN usep THEN np // 4 + np // 10 - 1 ELSE np END AS phi,
         |            CASE WHEN uses THEN ns // 10 ELSE 0 END AS slo,
         |            CASE WHEN uses THEN 2 * (ns // 10) - 1 ELSE ns END AS shi
         |          FROM bounds0, (VALUES
         |            ('p_range', true, false),
         |            ('s_range', false, true),
         |            ('both',    true, true)) AS t(predicate, usep, uses)),
         |hits AS (SELECT layout, predicate, count(*) AS files_hit
         |         FROM boxes JOIN preds
         |           ON pmin <= phi AND pmax >= plo AND smin <= shi AND smax >= slo
         |         GROUP BY 1, 2),
         |m1 AS (SELECT
         |         sum(CASE WHEN l_partkey BETWEEN np // 4 AND np // 4 + np // 10 - 1
         |                  THEN 1 ELSE 0 END)::BIGINT AS m_p,
         |         sum(CASE WHEN l_suppkey BETWEEN ns // 10 AND 2 * (ns // 10) - 1
         |                  THEN 1 ELSE 0 END)::BIGINT AS m_s,
         |         sum(CASE WHEN l_partkey BETWEEN np // 4 AND np // 4 + np // 10 - 1
         |                   AND l_suppkey BETWEEN ns // 10 AND 2 * (ns // 10) - 1
         |                  THEN 1 ELSE 0 END)::BIGINT AS m_b
         |       FROM lineitem, bounds0),
         |m AS (SELECT 'p_range' AS predicate, m_p AS rows_matched FROM m1
         |      UNION ALL SELECT 's_range', m_s FROM m1
         |      UNION ALL SELECT 'both', m_b FROM m1)
         |SELECT h.layout, h.predicate, h.files_hit::BIGINT AS files_hit,
         |       m.rows_matched
         |FROM hits h JOIN m USING (predicate)
         |ORDER BY layout, predicate""".stripMargin) { (s, dir) =>
      // normalize each dimension to a 16-bit rank before interleaving —
      // unequal raw bit widths would otherwise let the wider dimension's
      // high bits dominate the curve (measured at sf0.01: unnormalized
      // interleave pruned s_range to 59/64 files; normalized, 18/64).
      // ONE bounds row feeds the z normalization, the predicate grid AND
      // the selectivity pass — the domains cannot drift apart. Collected
      // ONCE to the driver (1 row — the bounded-scalar rule): the r13
      // spelling crossJoin(broadcast(bounds0)) re-ran the max() aggregate
      // scan for every consumer (3 extra lineitem scans + 3
      // BroadcastNestedLoopJoins in the formatted plan).
      val b0 = lineitem(s, dir)
        .agg((max(col("l_partkey")) + 1).as("np"), (max(col("l_suppkey")) + 1).as("ns"))
        .head()
      val (np, ns) = (b0.getLong(0), b0.getLong(1))
      // the narrow 5-column base is recomputed per consumer: a pruned
      // 4-column parquet scan + integer hashing is CHEAPER than another
      // 60M-row checkpoint at sf10 (each ntile already materializes its
      // range-partitioned copy inside rankedWithTotal — adding a base
      // checkpoint made the key slower at scale, measured both ways)
      val li = lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_suppkey"),
          zValue(expr(s"l_partkey * 65536 div ${np}L"), expr(s"l_suppkey * 65536 div ${ns}L"))
            .as("z"))
      // the two bucketings are INDEPENDENT (zb and lb never meet on one
      // row — each feeds only its own box aggregate), and both are exact
      // 64-bucket equal-count ntiles of the SAME rows under different
      // orderings — exactly Q.stackedNtile's shape (r13, VERDICT r12 #1/#6):
      // ONE range exchange + ONE checkpoint + ONE collect computes both
      // bucketings (the r12 spelling paid 2 × sample/checkpoint/collect),
      // and each layout's box stats aggregate straight off the stacked
      // frame — no union of two ntile pipelines. Both orderings' lead
      // values are BIGINT (z, l_partkey), so no cast is involved.
      val stacked = Q.stackedNtile(li, 64,
        Seq(col("z"), col("l_partkey")),
        Seq(col("l_orderkey"), col("l_linenumber")), "f")
      val boxes = stacked.groupBy(col("__sid"), col("f"))
        .agg(min(col("l_partkey")).as("pmin"), max(col("l_partkey")).as("pmax"),
          min(col("l_suppkey")).as("smin"), max(col("l_suppkey")).as("smax"))
        .select(when(col("__sid") === 1, "zorder").otherwise("linear").as("layout"),
          col("f"), col("pmin"), col("pmax"), col("smin"), col("smax"))
      // predicate bounds derive from the key domain (max+1) so the same
      // 10%-wide ranges select real rows at every SF — all integer LITERALS
      // now that np/ns are driver values, so the per-predicate file count is
      // ONE conditional aggregation over the 128-row box frame (the r12
      // boxes⋈preds broadcast join + regroup collapsed away, VERDICT r12 #6)
      val predBounds = Seq(
        ("p", np / 4, np / 4 + np / 10 - 1, 0L, ns),
        ("s", 0L, np, ns / 10, 2 * (ns / 10) - 1),
        ("b", np / 4, np / 4 + np / 10 - 1, ns / 10, 2 * (ns / 10) - 1))
      val hitCols = predBounds.map { case (tag, plo, phi, slo, shi) =>
        sum(when(col("pmin") <= phi && col("pmax") >= plo &&
          col("smin") <= shi && col("smax") >= slo, 1L).otherwise(0L)).as(s"h_$tag")
      }
      val hits = boxes.groupBy("layout").agg(hitCols.head, hitCols.tail: _*)
        .selectExpr("layout",
          "stack(3, 'p_range', h_p, 's_range', h_s, 'both', h_b) AS (predicate, files_hit)")
        // the oracle's boxes⋈preds INNER join drops a (layout, predicate)
        // with zero intersecting files outright; keep that set identical
        // (can only fire if a predicate matches zero rows)
        .filter(col("files_hit") > 0)
      // exact selectivities in ONE conditional-aggregation pass over the
      // two-column scan (no 3× row fan-out); literal bounds so the
      // BETWEENs are codegen'd constants
      val pIn = expr(s"l_partkey BETWEEN ${np / 4} AND ${np / 4 + np / 10 - 1}")
      val sIn = expr(s"l_suppkey BETWEEN ${ns / 10} AND ${2 * (ns / 10) - 1}")
      val m1 = lineitem(s, dir).select("l_partkey", "l_suppkey").agg(
        sum(when(pIn, 1L).otherwise(0L)).as("m_p"),
        sum(when(sIn, 1L).otherwise(0L)).as("m_s"),
        sum(when(pIn && sIn, 1L).otherwise(0L)).as("m_b"))
      // unpivot the 1-row selectivity frame with ONE stack generator — the
      // r12 3-way unionByName re-executed the m1 aggregate subtree 3×
      val m = m1.selectExpr(
        "stack(3, 'p_range', m_p, 's_range', m_s, 'both', m_b) AS (predicate, rows_matched)")
      hits.join(m, "predicate")
        .select(col("layout"), col("predicate"),
          col("files_hit").cast("bigint").as("files_hit"), col("rows_matched"))
        .orderBy("layout", "predicate")
    },
  )
}
