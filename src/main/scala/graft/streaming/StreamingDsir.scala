package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

import graft.operators.DsirLm

/** Online DSIR domain scoring — the streaming twin of x_dsir_weights
  * and the serving read of the persisted [[graft.operators.DsirLm]]
  * estimator: documents arriving on a crawl stream are scored
  * micro-batch by micro-batch against the frozen target/raw unigram
  * LMs, so every new doc carries its importance weight the moment it
  * lands — the gate a streaming curation pipeline applies BEFORE
  * paying for dedup or embedding.
  *
  * Like [[StreamingAnnProbe]] this needs NO cross-batch operator
  * state: a doc's weight depends only on the (static) estimator, so
  * each micro-batch runs the SAME bounded batch score, and
  * exactly-once output comes from the checkpoint plus an IDEMPOTENT
  * sink (each batch deletes-then-appends its own batch_id partition —
  * see [[start]] for why the gate forces that over dynamic
  * overwrite). Estimator updates stay a batch concern — retrain via
  * [[DsirLm.train]], then restart from the same checkpoint: the LM is
  * resolved once at query start, so a restart re-resolves the rolled
  * artifact and already-committed batches never re-emit (the
  * StreamingAnnProbe rollover contract).
  *
  * At 100 TB: the per-batch cost is one exploded-token LEFT join to
  * the static vocab table (broadcast when bounded) and a per-doc fold
  * — no corpus rescans, no state store, no shuffle proportional to
  * anything but the arriving batch.
  */
object StreamingDsir {

  /** Start scoring `docStream` — (doc_id, source, text) rows — against
    * the estimator persisted at `lmPath`, writing (doc_id, source,
    * w_bp) to `outDir` as parquet partitioned by `batch_id`.
    *
    * With `tauBp` set this becomes the RESAMPLING GATE itself (the
    * x_dsir_resample race run per arrival): only docs winning
    * w + Gumbel(hash(doc_id)) ≥ τ are written — losers are dropped
    * before any downstream dedup/embedding spend, and because the draw
    * is a deterministic function of doc_id, a replayed batch drops
    * exactly the same docs. The race key is the length-UNNORMALIZED
    * sum weight (DsirLm.score(lengthNormalized = false)) — the same
    * form x_dsir_resample races, so a doc's streaming fate matches the
    * batch resample's; gated output rows therefore carry the SUM
    * weight in w_bp, ungated rows the x_dsir_weights mean.
    *
    * Sink idempotence is delete-then-append rather than the
    * dynamic-partition overwrite StreamingAnnProbe uses: a GATED
    * replay can legitimately keep ZERO rows (the documented rollover
    * path — retrain, restart from the same checkpoint — can land in
    * the at-least-once crash window with an estimator that now fails
    * every doc of the replayed batch), and a dynamic overwrite that
    * writes no partition would leave the earlier attempt's rows
    * stranded in that batch_id forever. Deleting the batch partition
    * first makes empty-keep replays converge to the correct absent
    * partition. */
  def start(
      docStream: DataFrame,
      lmPath: String,
      outDir: String,
      checkpoint: String,
      tauBp: Option[Long] = None): StreamingQuery = {
    import org.apache.spark.sql.functions.col
    val lm = DsirLm.load(docStream.sparkSession, lmPath)
    docStream.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val gated = tauBp match {
          case Some(tau) =>
            DsirLm.score(batch, lm, lengthNormalized = false)
              .where(col("w_bp") + DsirLm.gumbelBp(col("doc_id")) >= tau)
          case None => DsirLm.score(batch, lm)
        }
        val part = new org.apache.hadoop.fs.Path(s"$outDir/batch_id=$batchId")
        val fs = part.getFileSystem(
          batch.sparkSession.sparkContext.hadoopConfiguration)
        // delete returns false BOTH for path-absent (fine) and for a
        // failed delete (must abort: appending after a failed delete
        // would duplicate the previous attempt's rows) — disambiguate
        // and fail the batch so the stream retries
        if (!fs.delete(part, true) && fs.exists(part))
          throw new java.io.IOException(
            s"failed to delete replayed partition $part")
        gated
          .withColumn("batch_id", org.apache.spark.sql.functions.lit(batchId))
          .write.mode("append")
          .partitionBy("batch_id")
          .parquet(outDir)
      }
      .start()
  }
}
