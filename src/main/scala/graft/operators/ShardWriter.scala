package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The write side of the curation pipeline: documents → N training
  * shards on disk. Uses the SAME arithmetic hash family as the audit
  * query (x_shard_assign) and the samplers — mod-before-multiply,
  * int64-safe at any doc_id — so the balance report and the physical
  * layout agree BY CONSTRUCTION: `x_shard_assign` run before the write
  * predicts exactly what lands in each `shard=NN/` directory.
  *
  * Scale shape: one `repartition(shards, shard)` exchange feeds the
  * writer (the hash IS the partitioner), rows sort by doc_id within a
  * shard so file contents are byte-reproducible run-to-run and parquet
  * min/max stats on doc_id stay tight for downstream point reads.
  * Deterministic and rerunnable: no rand(), overwrite mode replaces a
  * partial previous attempt atomically per Spark's commit protocol.
  */
object ShardWriter {

  /** Write `docs` (needs a long `doc_id`) into `shards` shard dirs under
    * `outDir`; returns the per-shard audit (docs per shard) read back
    * from the written layout. */
  def write(docs: DataFrame, outDir: String, shards: Int = 16): DataFrame = {
    val assigned = docs.withColumn("shard",
      (col("doc_id") % 1000003L * 2654435761L % 1000003L % shards).cast("int"))
    assigned
      .repartition(shards, col("shard"))
      .sortWithinPartitions("shard", "doc_id")
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
    docs.sparkSession.read.parquet(outDir)
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("shard")
  }
}
