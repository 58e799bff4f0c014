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

  /** Tag every vector with its nearest centroid (cosine, ties by cid). */
  def assign(emb: DataFrame, cents: Array[(Int, Array[Double])]): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val centsDf = broadcast(spark.createDataset(
      cents.toSeq.map { case (cid, v) => (cid, v.toSeq) }).toDF("cid", "cv"))
    val wAsg = Window.partitionBy($"vec_id").orderBy($"cos_c".desc, $"cid")
    emb.join(centsDf, lit(true))
      // centroids are unit vectors → cosine = dot / |v|
      .withColumn("cos_c", expr("vec_dot(v, cv)") / $"nrm")
      .withColumn("rn", row_number().over(wAsg))
      .where($"rn" === 1)
      .drop("rn", "cos_c", "cv")
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
    val indexed = assign(emb, cents).persist() // probe and candidate legs

    // per probe: its nProbe nearest centroids
    val centsDf = broadcast(spark.createDataset(
      cents.toSeq.map { case (cid, v) => (cid, v.toSeq) }).toDF("p_cid", "cv"))
    val wProbe = Window.partitionBy($"p_id").orderBy($"cos_c".desc, $"p_cid")
    val probes = broadcast(indexed
      .where($"vec_id".isin(probeIds: _*))
      .select($"vec_id".as("p_id"), $"v".as("pv"), $"nrm".as("p_nrm"))
      .join(centsDf, lit(true))
      .withColumn("cos_c", expr("vec_dot(pv, cv)") / $"p_nrm")
      .withColumn("pn", row_number().over(wProbe))
      .where($"pn" <= nProbe)
      .select($"p_id", $"pv", $"p_nrm", $"p_cid"))

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
