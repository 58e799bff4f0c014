package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed co-located joins — the PERSISTED shuffle lever, completing
  * the join toolkit next to SkewJoins' salting (per-run) and
  * `broadcast()` (small side): tables that are joined repeatedly on the
  * same key get written ONCE bucketed-and-sorted by that key, and every
  * later join between them needs no shuffle exchange and no sort — each
  * task merge-joins bucket i against bucket i.
  *
  * At 100 TB this is the difference between re-exchanging a fact table
  * on every query and paying the exchange once at ingest: the scan of a
  * bucketed table reports `HashPartitioning(key, n)` so Catalyst's
  * EnsureRequirements inserts nothing. Both sides must agree on bucket
  * COUNT and key; a mismatch silently falls back to a plain exchange
  * (the spec pins the exchange-free plan, not just the result).
  *
  * No reference counterpart (the reference's store is a row log, its
  * only join surface is driver-side projection state); this is the
  * Spark-native upgrade path SURVEY §4.3 promises for repeated
  * stream-to-stream correlation.
  */
object BucketedJoins {

  /** Write `df` as a managed parquet table bucketed AND sorted by
    * `key` into `buckets` buckets. Overwrites `table`.
    *
    * The pre-write `repartition(buckets, key)` uses the same Murmur3
    * hash as the bucket assignment, so every task holds exactly one
    * bucket and each bucket lands as ONE file. That matters twice:
    * without it a bucketed write emits up to tasks × buckets files
    * (the small-files explosion), and Spark only trusts `sortBy`
    * ordering — eliding the join-side SortExec — when a bucket is a
    * single file. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
      path: Option[String] = None): Unit = {
    val w = df.repartition(buckets, org.apache.spark.sql.functions.col(key))
      .write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
    // path → EXTERNAL bucketed table: catalog metadata (in-memory here,
    // metastore in production) + data files at the caller's location —
    // lets callers own the data lifecycle (temp-dir cleanup, ingest
    // landing zones) while keeping the bucket spec queryable
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** Inner equi-join of two bucketed tables on `key`. Caller must have
    * written both via `writeBucketed` with the SAME bucket count; the
    * resulting sort-merge join reads bucket i vs bucket i with no
    * exchange (default behavior) and — under
    * `spark.sql.legacy.bucketedTableScan.outputOrdering=true`, since
    * 3.0 the sorted-scan ordering is opt-in — no sort either (both
    * pinned by BucketedJoinSpec). */
  def join(spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
