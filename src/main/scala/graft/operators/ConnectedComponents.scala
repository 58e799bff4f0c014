package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by iterative min-label propagation — the cluster
  * step of a dedup pipeline: near-dup PAIRS (from ngram/minhash/simhash)
  * become duplicate GROUPS, each labeled by its smallest doc id (the
  * canonical representative to keep).
  *
  * Algorithm: every node starts labeled with itself; each round every
  * node takes the min label in its closed neighbourhood; stop when no
  * label changed. Rounds ≤ graph diameter, and near-dup graphs are
  * small-diameter clusters, so convergence is fast. Each round is one
  * join + one aggregate on (edges ⨝ labels) — all shuffles keyed by node
  * id. (The alternating large-star/small-star formulation drops the
  * round count to O(log n) for adversarial graphs; not needed for dedup
  * clusters.)
  */
object ConnectedComponents {

  val MaxRounds = 50

  /** edges(srcCol, dstCol) — undirected. Returns (id, cluster_id). */
  def components(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._

    val undirected = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .unionAll(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .distinct()
      .persist()

    var labels = undirected.select($"src".as("id")).distinct()
      .withColumn("lbl", $"id")
      .persist()

    var round = 0
    var converged = false
    while (!converged && round < MaxRounds) {
      // min label over the closed neighbourhood
      val next = undirected
        .join(labels.withColumnRenamed("id", "dst").withColumnRenamed("lbl", "dst_lbl"), "dst")
        .groupBy($"src".as("id"))
        .agg(min($"dst_lbl").as("nbr_lbl"))
        .join(labels, "id")
        .select($"id", least($"lbl", $"nbr_lbl").as("lbl"))
        .persist()
      val changed = next.join(labels.withColumnRenamed("lbl", "old"), "id")
        .where($"lbl" =!= $"old").limit(1).count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      round += 1
    }
    undirected.unpersist()
    labels.select($"id", $"lbl".as("cluster_id"))
  }
}
