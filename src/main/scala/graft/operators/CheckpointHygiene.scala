package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Release the block-manager storage behind a localCheckpoint'd
  * Dataset. `Dataset.unpersist` only uncaches CATALOG-cached plans;
  * a local checkpoint lives as a persistent RDD outside the catalog
  * and survives `spark.catalog.clearCache()` — in a long session
  * (bench: ~500 query executions) un-released checkpoints accumulate
  * into block-manager/GC pressure that taxes every LATER query (the
  * r8 x_zipf_slope anomaly: alphabetically-last lines inflated ~25×).
  *
  * Only call this once every action over the checkpoint has run:
  * local-checkpoint lineage is TRUNCATED, so an unpersisted block
  * cannot be recomputed — a consumer that reads it afterwards fails
  * rather than recomputes. Safe by construction at the two call
  * sites (MinHashDedup.saveIndex, the x_ann_incremental one-time
  * build): both fully consume the checkpoint inside the function
  * before releasing it.
  */
object CheckpointHygiene {
  def release(df: DataFrame): Unit =
    df.queryExecution.logical match {
      case l: LogicalRDD => l.rdd.unpersist(blocking = false)
      case _             => ()
    }
}
