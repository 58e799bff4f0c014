package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact k-core decomposition (core number per node) of an undirected
  * graph.
  *
  * The scale path iterates the neighborhood h-index operator: starting
  * from c₀(v) = deg(v), each round sets c(v) to the h-index of its
  * neighbors' current estimates (the largest h such that ≥ h neighbors
  * have estimate ≥ h). The sequence is non-increasing and converges to
  * the core number (Lü et al., "The H-index of a network node and its
  * relation to degree and coreness", Nat. Commun. 7:10168, 2016) — a
  * fixpoint computation of one equi-join + one keyed aggregate per
  * round, the same shape as [[ConnectedComponents]]' label propagation,
  * with localCheckpoint cutting lineage per round. Per-node work is
  * bounded by degree (the neighbor-estimate array), which is the same
  * bound the underlying adjacency already pays; rounds are bounded by
  * the graph's core-number range in practice (single digits on
  * power-law graphs).
  *
  * Graphs at or under [[DriverEdgeLimit]] edges instead run the exact
  * Batagelj–Zaversnik peel on the driver (O(m) with bucket queues) —
  * the same size-probe pattern as ConnectedComponents, so the common
  * report-sized graph never pays a distributed round-trip per
  * iteration. Both paths return the identical (id, core) table; the
  * spec pins their equality on a real graph.
  *
  * Node ids may be any orderable type (LONG doc ids, STRING tokens).
  */
object KCore {

  val MaxRounds = 100
  val DriverEdgeLimit = 1000000L

  /** edges(aCol, bCol) — undirected; self-loops dropped, duplicate
    * edges collapsed. Returns (id, core) with one row per non-isolated
    * node. On the DISTRIBUTED path the returned frame is
    * SINGLE-CONSUMPTION (its checkpoint releases after the caller's
    * first action — see CheckpointHygiene.releaseAfterFirstAction). */
  def coreNumbers(edges0: DataFrame, aCol: String, bCol: String,
      driverLimit: Long = DriverEdgeLimit): DataFrame = {
    val spark = edges0.sparkSession
    import spark.implicits._

    val canon = edges0.select(col(aCol).as("a"), col(bCol).as("b"))
      .where($"a" =!= $"b")
      .select(least($"a", $"b").as("a"), greatest($"a", $"b").as("b"))
      .distinct()
      .persist()
    val probeCount = canon.limit(math.min(driverLimit, Int.MaxValue - 1L).toInt + 1).count()
    val out =
      if (probeCount <= driverLimit) driverPeel(canon)
      else distributedCore(canon)
    canon.unpersist()
    out
  }

  /** Exact O(m) Batagelj–Zaversnik peel for driver-sized graphs: nodes
    * leave in nondecreasing current-degree order; a node's core is the
    * degree it holds when removed (monotone running max). */
  private def driverPeel(canon: DataFrame): DataFrame = {
    val spark = canon.sparkSession
    import spark.implicits._
    val es = canon.collect().map(r => (r.get(0), r.get(1)))
    val adj = scala.collection.mutable.Map.empty[Any, scala.collection.mutable.Set[Any]]
    es.foreach { case (a, b) =>
      adj.getOrElseUpdate(a, scala.collection.mutable.Set.empty) += b
      adj.getOrElseUpdate(b, scala.collection.mutable.Set.empty) += a
    }
    val deg = scala.collection.mutable.Map.empty[Any, Int]
    adj.foreach { case (v, ns) => deg(v) = ns.size }
    // bucket queue over current degree; deterministic node order inside
    // a bucket is irrelevant — core numbers are order-independent
    val buckets = scala.collection.mutable.Map.empty[Int, scala.collection.mutable.Set[Any]]
    deg.foreach { case (v, d) =>
      buckets.getOrElseUpdate(d, scala.collection.mutable.Set.empty) += v
    }
    val core = scala.collection.mutable.Map.empty[Any, Int]
    var running = 0
    var remaining = deg.size
    var d = 0
    while (remaining > 0) {
      while (buckets.getOrElse(d, scala.collection.mutable.Set.empty).isEmpty
          && d <= deg.size) d += 1
      val bucket = buckets(d)
      val v = bucket.head
      bucket -= v
      running = math.max(running, d)
      core(v) = running
      remaining -= 1
      adj(v).foreach { u =>
        if (!core.contains(u)) {
          val du = deg(u)
          buckets(du) -= u
          deg(u) = du - 1
          buckets.getOrElseUpdate(du - 1, scala.collection.mutable.Set.empty) += u
          // peeling only lowers degrees, so the scan floor backs up
          if (du - 1 < d) d = du - 1
        }
      }
      adj(v).foreach(u => adj(u) -= v)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        core.toSeq.map { case (v, c) =>
          org.apache.spark.sql.Row(v, c.toLong)
        }, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          canon.schema("a").dataType),
        org.apache.spark.sql.types.StructField("core",
          org.apache.spark.sql.types.LongType))))
  }

  /** The scale path: iterated neighborhood h-index to fixpoint. */
  private def distributedCore(canon: DataFrame): DataFrame = {
    val spark = canon.sparkSession
    import spark.implicits._
    val und = canon.select($"a".as("src"), $"b".as("dst"))
      .unionAll(canon.select($"b".as("src"), $"a".as("dst")))
      .persist()
    var est = und.groupBy($"src".as("id"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint()
    var round = 0
    var converged = false
    while (!converged && round < MaxRounds) {
      // h-index of the neighbor estimates: sort desc, count positions
      // i (1-based) where cs[i] >= i — the indicator is
      // prefix-contiguous on a descending array, so the sum IS h
      val next = und
        .join(est.select($"id".as("dst"), $"c".as("nc")), "dst")
        .groupBy($"src".as("id"))
        .agg(sort_array(collect_list($"nc"), asc = false).as("cs"))
        .select($"id", expr(
          """aggregate(zip_with(cs, sequence(1, size(cs)),
               (v, i) -> IF(v >= i, 1L, 0L)), 0L, (acc, x) -> acc + x)""")
          .as("c"))
        .localCheckpoint()
      val changed = next.join(est.select($"id", $"c".as("old")), "id")
        .where($"c" =!= $"old").limit(1).count()
      // free the superseded round's checkpoint NOW (Dataset.unpersist
      // would not touch it — the CheckpointHygiene lesson); without
      // this every h-index round strands one block for the session
      CheckpointHygiene.release(est)
      est = next
      converged = changed == 0
      round += 1
    }
    und.unpersist()
    if (!converged) throw new IllegalStateException(
      s"k-core h-index iteration did not converge in $MaxRounds rounds")
    // final round's blocks transfer to the caller's first action
    // (single-consumption contract, the PageRank pattern)
    CheckpointHygiene.releaseAfterFirstAction(
      est.select($"id", $"c".as("core")), est)
  }
}
