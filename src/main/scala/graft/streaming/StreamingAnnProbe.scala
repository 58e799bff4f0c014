package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

import graft.operators.{ExactAnn, IvfPq}

/** Online ANN serving — the streaming twin of the persisted vector
  * indexes ([[graft.operators.ExactAnn]] / [[graft.operators.IvfPq]]),
  * completing the index family's online story next to
  * StreamingExactDedup (exact digests) and StreamingNearDup (MinHash
  * shingles): embeddings arriving on a stream are probed against the
  * static persisted index micro-batch by micro-batch, so every new
  * crawl vector gets its top-k corpus neighbours the moment it lands —
  * no nightly batch probe.
  *
  * Unlike the dedup twins this needs NO cross-batch operator state: a
  * new vector's neighbours depend only on the (static) index, so each
  * micro-batch runs the SAME bounded batch probe and the stream's
  * exactly-once story is the sink's + checkpoint's. That statelessness
  * is the point — index updates stay a batch concern
  * (saveIndex(append) nightly), serving stays a stateless map, the
  * same split faiss deployments use. The IVF-PQ path releases its
  * per-batch encode checkpoint via [[IvfPq.probeAndConsume]] — a
  * long-running stream would otherwise retain one block per
  * micro-batch.
  *
  * At 100 TB: the exact probe streams the full code/vector table per
  * batch (right while the corpus side is small or recall must be 1.0);
  * the IVF-PQ probe reads only probed cells' ~8-byte code rows via
  * partition pruning — the serving path. Both emit the same
  * (new_id, rk, index_id, *_bp) contract, so swapping is a flag.
  */
object StreamingAnnProbe {

  /** Start probing `embStream` — (vec_id, v array<double>, nrm) rows —
    * against the index at `indexPath`, appending results to `outDir`
    * as parquet. `exact = true` probes an [[ExactAnn]] index (emits
    * sim_bp); otherwise an [[IvfPq]] index (emits approx_bp). */
  def start(
      embStream: DataFrame,
      indexPath: String,
      k: Int,
      outDir: String,
      checkpoint: String,
      exact: Boolean = false,
      nProbe: Int = 2): StreamingQuery = {
    graft.functions.VecDot.register(embStream.sparkSession)
    embStream.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (exact)
          ExactAnn.probeAgainstIndex(batch, indexPath, k)
            .write.mode("append").parquet(outDir)
        else
          IvfPq.probeAndConsume(batch, indexPath, k, nProbe)(
            _.write.mode("append").parquet(outDir))
      }
      .start()
  }
}
