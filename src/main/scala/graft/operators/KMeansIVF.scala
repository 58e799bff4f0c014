package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) ANN with k-means-trained centroids — the quality
  * upgrade over the seeded-centroid variant (x_ann_ivf keeps seeds for
  * oracle parity; this operator is the scale path and VectorOpsSpec
  * measures its recall against brute force).
  *
  * Training is Lloyd's algorithm, DETERMINISTIC end to end: init = the k
  * lowest vec_ids (no rand), assignment ties broken by centroid id,
  * element-wise mean via a (cid, dimension) aggregate. Per iteration:
  * one broadcast-join assignment pass + one narrow aggregate — centroids
  * themselves are k×dim doubles, driver-sized at any corpus scale.
  *
  * Search mirrors IVF practice: every vector indexed under its nearest
  * centroid; a probe scans the `nProbe` nearest centroid buckets
  * (nProbe > 1 is IVF's multi-probe analogue — recall lost to a
  * boundary assignment is recovered from the next-nearest cell).
  */
object KMeansIVF {

  /** Train k centroids (unit-normalized, cosine geometry). Returns
    * (cid, vector) pairs. `emb` needs (vec_id, v: array<double>, nrm). */
  def train(emb: DataFrame, k: Int, iters: Int = 5): Array[(Int, Array[Double])] = {
    val spark = emb.sparkSession
    import spark.implicits._
    graft.functions.VecDot.register(spark)

    // deterministic init: the k lowest vec_ids, unit-normalized
    var cents: Array[(Int, Array[Double])] = emb.orderBy("vec_id").limit(k)
      .select($"v", $"nrm").collect()
      .zipWithIndex
      .map { case (r, i) =>
        val v = r.getSeq[Double](0).toArray
        val n = r.getDouble(1)
        i -> v.map(_ / n)
      }

    for (_ <- 1 to iters) {
      val assigned = assign(emb, cents)
      // element-wise mean per centroid: explode to (cid, pos, x), one
      // aggregate, k×dim result rows — driver-sized
      val sums = assigned
        .select($"cid", posexplode($"v"))
        .groupBy($"cid", $"pos")
        .agg(avg($"col").as("m"))
        .collect()
      val byCid = sums.groupBy(_.getInt(0))
      cents = cents.map { case (cid, old) =>
        byCid.get(cid) match {
          case None => (cid, old) // empty cluster keeps its centroid
          case Some(rows) =>
            val mean = new Array[Double](old.length)
            rows.foreach(r => mean(r.getInt(1)) = r.getDouble(2))
            val n = math.sqrt(mean.map(x => x * x).sum)
            (cid, if (n == 0) old else mean.map(_ / n))
        }
      }
    }
    cents
  }

  /** Tag every vector with its nearest centroid (cosine, ties by cid).
    *
    * Broadcast-argmin kernel (graft.functions.Centroids): the k×dim
    * centroid matrix rides into the expression as a plan reference
    * object and every row computes its argmax-cosine in one tight loop —
    * a narrow map with ZERO exchange, replacing the k×N cross-join +
    * window that replicated the whole corpus k× through a shuffle.
    * Centroids here are unit vectors; the kernel divides by their true
    * (≈1.0) norms — same argmax, same cid-ascending tie rule. */
  def assign(emb: DataFrame, cents: Array[(Int, Array[Double])]): DataFrame = {
    graft.functions.Centroids.register(emb.sparkSession, cents.toSeq)
    emb.withColumn("cid", expr("nearest_centroid(v, nrm)"))
  }

  /** Top-k exact-cosine neighbours for each probe, scanning the nProbe
    * nearest centroid buckets. */
  def searchTopK(
      emb: DataFrame,
      cents: Array[(Int, Array[Double])],
      probeIds: Seq[Long],
      k: Int,
      nProbe: Int = 2): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    // serving path may reuse saved centroids without ever calling train()
    graft.functions.VecDot.register(spark)
    val indexed = assign(emb, cents) // registers nearest_centroid(s) too

    // Per probe: its nProbe nearest centroids via the kernel's top-n
    // variant — no cache needed for the two `indexed` legs: the probe
    // leg is isin-filtered at the scan and the assignment itself is now
    // a narrow map, so recomputing it costs less than managing a cache.
    val probes = broadcast(indexed
      .where($"vec_id".isin(probeIds: _*))
      .select($"vec_id".as("p_id"), $"v".as("pv"), $"nrm".as("p_nrm"))
      .withColumn("p_cid", explode(expr(s"nearest_centroids(pv, p_nrm, $nProbe)"))))

    val w = Window.partitionBy($"p_id").orderBy($"sim".desc, $"vec_id")
    probes.join(indexed, $"cid" === $"p_cid" && $"vec_id" =!= $"p_id")
      .withColumn("sim", expr("vec_dot(pv, v)") / ($"p_nrm" * $"nrm"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where($"rk" <= k)
      .select($"p_id", $"rk", $"vec_id",
        floor($"sim" * 10000.0).cast("long").as("sim_bp"))
      .orderBy($"p_id", $"rk")
  }
}
