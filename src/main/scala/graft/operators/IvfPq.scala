package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IVF-PQ — the composition production ANN systems actually deploy
  * (faiss IndexIVFPQ): an IVF coarse quantizer prunes WHICH vectors a
  * probe visits (nProbe nearest cells), PQ compression makes each visit
  * cheap (an M-step ADC table walk over 8 codes instead of a 64-float
  * dot). The two prunings multiply: at 100 TB a probe touches
  * nProbe/k of the corpus, reading ~8 bytes per vector touched.
  *
  * Built entirely from the two existing operators' parts — KMeansIVF's
  * deterministic coarse training + broadcast-argmin cell assignment
  * (graft.functions.Centroids), ProductQuantizer's codebooks + ADC scan
  * (graft.functions.PqCodec) — wired as one declarative plan: cell
  * equi-join (broadcast probe side) → ADC score → per-probe top-R →
  * exact re-rank. No stage shuffles raw vectors; the only exchange is
  * the narrow (p_id, vec_id, approx) candidate set entering the
  * per-probe window.
  */
object IvfPq {

  final case class Index(
      cents: Array[(Int, Array[Double])],
      pq: ProductQuantizer.Model)

  /** Train both quantizers on their bounded driver samples. */
  def train(
      emb: DataFrame,
      k: Int = 10,
      coarseIters: Int = 3,
      m: Int = 8,
      ks: Int = 16): Index =
    Index(
      KMeansIVF.train(emb, k = k, iters = coarseIters),
      ProductQuantizer.train(emb, m = m, ks = ks))

  /** Persist both quantizers (two tiny parquet tables under `path`) —
    * the train-once / serve-many lifecycle for the composed index. */
  def save(spark: org.apache.spark.sql.SparkSession,
      index: Index, path: String): Unit = {
    KMeansIVF.save(spark, index.cents, s"$path/coarse")
    ProductQuantizer.save(spark, index.pq, s"$path/pq")
  }

  /** Load an index saved by [[save]]. */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): Index =
    Index(
      KMeansIVF.load(spark, s"$path/coarse"),
      ProductQuantizer.load(spark, s"$path/pq"))

  /** Top-k per probe: nProbe cells → ADC walk → top-`rerank` → exact
    * cosine. Output (p_id, rk, vec_id, sim_bp), exact sims — the same
    * contract as every other ANN operator here. */
  def searchTopK(
      emb: DataFrame,
      index: Index,
      probeIds: Seq[Long],
      k: Int,
      nProbe: Int = 2,
      rerank: Int = 64): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val cents = index.cents.toSeq

    // probe collection + ADC tables + exact re-rank are shared with the
    // flat-PQ path (ProductQuantizer.collectProbes/buildLuts/exactRerank)
    // — one LUT layout, one rerank contract, no drift between the two
    val pq = index.pq
    val probes = ProductQuantizer.collectProbes(emb, probeIds)
    val luts = ProductQuantizer.buildLuts(probes, pq)

    // the index: every vector tagged with its cell + its codes — both
    // narrow codegen kernels, zero exchange (PlanShapeSpec-pinned parts)
    val indexed = emb
      .withColumn("cid", graft.functions.Centroids.nearestCol($"v", $"nrm", cents))
      .withColumn("codes", graft.functions.PqCodec.encodeCol(
        $"v", $"nrm", pq.codebook, pq.m, pq.ks, pq.dsub))

    // probe fan-out: (p_id, p_idx, one row per probed cell), broadcast
    val pdf = broadcast(
      probes.map(_._1).zipWithIndex.toSeq.toDF("p_id", "p_idx")
        .join(emb.where($"vec_id".isin(probeIds: _*))
          .select($"vec_id".as("p_id"),
            explode(graft.functions.Centroids.nearestCol($"v", $"nrm", cents, nProbe))
              .as("p_cid")),
          "p_id"))

    val cand = graft.functions.TopK.pruneBySim(
      pdf.join(indexed, $"cid" === $"p_cid" && $"vec_id" =!= $"p_id")
        .select($"p_id", $"vec_id",
          graft.functions.PqCodec.adcCol($"codes", $"p_idx", luts, pq.m, pq.ks)
            .as("approx")),
      "approx", rerank)

    ProductQuantizer.exactRerank(cand, emb, probes, k)
  }
}
