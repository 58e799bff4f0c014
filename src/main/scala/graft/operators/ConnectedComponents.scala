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

  /** Below this edge count the graph fits comfortably on the driver and
    * union-find beats paying multi-second distributed-round latency per
    * iteration (measured ~3-5 s/round in fixed job overhead for a
    * hundred-edge dedup graph). Above it, the iterative join path runs.
    * Same result either way (min id per component). */
  val DriverEdgeLimit = 1000000L

  /** edges(srcCol, dstCol) — undirected. Returns (id, cluster_id).
    *
    * Cache contract: all intermediates this operator persists are
    * unpersisted before it returns. On the distributed path the RETURNED
    * frame is backed by one localCheckpoint (one row per node — the
    * result itself, lineage already cut); ownership of its blocks
    * transfers to the caller's first action
    * ([[CheckpointHygiene.releaseAfterFirstAction]] — single-consumption
    * contract, the PageRank pattern). The driver path (graphs ≤
    * `driverLimit`) returns a plain local relation and leaves nothing
    * cached. `driverLimit` exists for tests to force the distributed
    * regime (the KCore/PageRank pattern). */
  def components(edges: DataFrame, srcCol: String, dstCol: String,
      driverLimit: Long = DriverEdgeLimit): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._

    val pairs = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
      // both the size probe and the chosen path re-read the edge set;
      // without the cache the upstream pair pipeline runs twice
      .persist()
    // size probe WITHOUT row transfer: count the limited frame — rows
    // stay on the executors; only when the graph is confirmed
    // driver-sized does collect() ship it (the prior limit(N+1).collect()
    // shipped up to 1M rows just to discard them on the distributed path)
    val probeCount = pairs
      .limit(math.min(driverLimit, Int.MaxValue - 1L).toInt + 1).count()
    if (probeCount <= driverLimit) {
      val probe = pairs.collect()
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      probe.foreach { row =>
        val (a, b) = (row.getLong(0), row.getLong(1))
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = probe.flatMap(r => Seq(r.getLong(0), r.getLong(1))).distinct
      val out = nodes.map(n => (n, find(n))).toSeq
      pairs.unpersist()
      return spark.createDataset(out).toDF("id", "cluster_id")
    }
    // labels come back materialized (localCheckpoint), so the edge cache
    // can be released as soon as the propagation finishes
    val out = distributedComponents(pairs)
    pairs.unpersist()
    out
  }

  /** The scale path: iterative min-label propagation over joins. */
  private def distributedComponents(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._

    val undirected = pairs.select($"src", $"dst")
      .unionAll(pairs.select($"dst".as("src"), $"src".as("dst")))
      .distinct()
      .persist()

    var labels = undirected.select($"src".as("id")).distinct()
      .withColumn("lbl", $"id")
      .persist()

    var round = 0
    var converged = false
    while (!converged && round < MaxRounds) {
      // min label over the closed neighbourhood. localCheckpoint cuts
      // the lineage each round: without it round k's plan nests all
      // k-1 prior joins, so analysis/optimization time (and any
      // recompute on executor loss... acceptable: labels are cheap to
      // rebuild from the persisted edge set) grows per round
      val next = undirected
        .join(labels.withColumnRenamed("id", "dst").withColumnRenamed("lbl", "dst_lbl"), "dst")
        .groupBy($"src".as("id"))
        .agg(min($"dst_lbl").as("nbr_lbl"))
        .join(labels, "id")
        .select($"id", least($"lbl", $"nbr_lbl").as("lbl"))
        .localCheckpoint()
      val changed = next.join(labels.withColumnRenamed("lbl", "old"), "id")
        .where($"lbl" =!= $"old").limit(1).count()
      // round 0's labels are catalog-persisted (unpersist frees them);
      // every later round's labels are a localCheckpoint, whose blocks
      // Dataset.unpersist does NOT free (the CheckpointHygiene lesson) —
      // release both ways so intermediate rounds don't strand one
      // checkpoint each until the ContextCleaner happens to run.
      // ROOT-ONLY release: round 0's plan embeds the CALLER'S edge
      // lineage — a recursive release would walk into and free a
      // checkpoint the caller owns; only rounds ≥ 1, whose labels ARE
      // a bare checkpoint, have anything to free here
      labels.unpersist()
      CheckpointHygiene.releaseRoot(labels)
      labels = next
      converged = changed == 0
      round += 1
    }
    undirected.unpersist()
    // fail loud: silently stopping mid-propagation would return wrong
    // cluster ids for any chain longer than MaxRounds
    if (!converged) throw new IllegalStateException(
      s"connected components did not converge within $MaxRounds rounds " +
        "(graph diameter too large — raise MaxRounds or use " +
        "large-star/small-star rounds)")
    CheckpointHygiene.releaseAfterFirstAction(
      labels.select($"id", $"lbl".as("cluster_id")), labels)
  }
}
