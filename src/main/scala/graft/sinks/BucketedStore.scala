package graft.sinks

import org.apache.spark.sql.DataFrame

/** Bucketed table layout — the 100 TB co-located-join story (SURVEY.md §4).
  *
  * The reference partitions work device-first (one database per PLC,
  * Linux/InfluxConnector2.py:107-109); at warehouse scale the equivalent is
  * bucketing fact tables by their join/series key so repeated joins and
  * per-series windows run WITHOUT a shuffle: two tables bucketed by the
  * same key into the same bucket count join bucket-to-bucket (no Exchange
  * in the plan — pinned by BucketedJoinSpec), and `sortBy` within buckets
  * lets sort-merge skip the per-task sort. On a 1000-executor cluster this
  * turns every enrichment join of the hot path into a map-side merge.
  */
object BucketedStore {

  /** Write `df` into the session catalog bucketed (and bucket-sorted) by
    * `key`. Readers get the bucketing metadata via `spark.table(name)`.
    */
  def write(df: DataFrame, name: String, key: String, buckets: Int): Unit =
    write(df, name, Seq(key), buckets)

  /** Composite-key variant — e.g. the LSH band table bucketed by
    * (band_id, k) so the candidate self-join is bucket-to-bucket.
    */
  def write(df: DataFrame, name: String, keys: Seq[String], buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*).sortBy(keys.head, keys.tail: _*)
      .saveAsTable(name)
}
