package graft.streaming

import org.apache.spark.sql.SparkSession

/** State-store provider selection for the live projections.
  *
  * The default HDFS-backed provider keeps every key's state on the JVM
  * heap of the executor that owns the partition — fine for thousands of
  * streams, a memory wall for state that outgrows the heap. The RocksDB
  * provider spills state to local SSD with an off-heap block cache, the
  * standard choice for large keyed state (millions of streams/users at
  * the 100 TB design point), with changelog checkpointing keeping commit
  * costs incremental.
  *
  * Set BEFORE starting the query; Spark pins the provider in the
  * checkpoint, so a query keeps its provider across restarts
  * (StatefulProjectionSpec proves resume under RocksDB).
  */
object StateStores {

  val RocksDBProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Route new streaming queries' state to RocksDB, with incremental
    * (changelog) checkpointing. */
  def useRocksDB(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", RocksDBProvider)
    spark.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
  }

  /** Back to the default heap-backed provider (new queries only). */
  def useDefault(spark: SparkSession): Unit = {
    spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    spark.conf.unset(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled")
  }
}
