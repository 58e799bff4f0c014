package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label-propagation community detection (Raghavan, Albert
  * & Kumara 2007, "Near linear time algorithm to detect community
  * structures in large-scale networks") over an undirected graph, made
  * DETERMINISTIC: labels initialize to the node's own id, every round
  * updates ALL nodes from the PREVIOUS round's labels (synchronous —
  * no arrival-order dependence), the new label is the most frequent
  * label among a node's neighbors with ties to the SMALLEST label,
  * and the round count is FIXED (the training-loop termination rule:
  * synchronous LPA can 2-cycle on bipartite-ish structure, so
  * run-to-convergence is not well-defined — a fixed budget is, and it
  * is what both engines can replay exactly).
  *
  * Two regimes, the [[KCore]]/[[ConnectedComponents]] pattern:
  * driver-sized graphs (≤ [[DriverEdgeLimit]] canonical edges — the
  * report-sized graph every corpus-profile query reads) run a local
  * loop; larger graphs run the distributed rounds — per round one
  * (node, neighbor-label) count aggregate, one per-node max, and one
  * min-label tie-break join, each shape a plain shuffle on the node
  * key with localCheckpoint cutting lineage per round
  * (CheckpointHygiene releases superseded rounds' blocks). Node ids
  * may be any orderable type (LONG doc ids, STRING tokens) — the
  * tie-break is min() on the id type in both regimes.
  *
  * Returns (id, community): one row per non-isolated node, community =
  * the surviving label's node id. The spec pins driver ≡ distributed
  * on a real graph plus constructed two-clique/tie cases.
  */
object LabelPropagation {

  val DriverEdgeLimit = 1000000L

  /** edges(aCol, bCol) — undirected; self-loops dropped, duplicate
    * edges collapsed. `rounds` synchronous update rounds. */
  def communities(edges0: DataFrame, aCol: String, bCol: String,
      rounds: Int = 5, driverLimit: Long = DriverEdgeLimit): DataFrame = {
    require(rounds >= 0, s"rounds must be nonnegative, got $rounds")
    val spark = edges0.sparkSession
    import spark.implicits._
    val canon = edges0.select(col(aCol).as("a"), col(bCol).as("b"))
      .where($"a" =!= $"b")
      .select(least($"a", $"b").as("a"), greatest($"a", $"b").as("b"))
      .distinct()
      .persist()
    // the probe's limit() is Int-capped, so the effective driver gate is
    // min(driverLimit, Int.MaxValue − 1): a caller passing a larger
    // driverLimit must NOT be routed to the driver path on a probe that
    // merely hit its Int cap (ADVICE r13 — that collect() would OOM).
    // Clamped below at 0 (ADVICE r14): a degenerate driverLimit < −1
    // would otherwise make limit(cap+1) throw an AnalysisException at
    // runtime instead of routing distributed; any driverLimit ≤ 0 means
    // "never take the driver path" and now does exactly that.
    val cap = math.max(0L, math.min(driverLimit, Int.MaxValue - 1L))
    val probeCount = canon.limit(cap.toInt + 1).count()
    val out =
      if (probeCount <= cap) driverLpa(canon, rounds)
      else distributedLpa(canon, rounds)
    canon.unpersist()
    out
  }

  /** Local synchronous loop for driver-sized graphs. */
  private def driverLpa(canon: DataFrame, rounds: Int): DataFrame = {
    val spark = canon.sparkSession
    val es = canon.collect().map(r => (r.get(0), r.get(1)))
    val adj = scala.collection.mutable.Map
      .empty[Any, scala.collection.mutable.ArrayBuffer[Any]]
    es.foreach { case (a, b) =>
      adj.getOrElseUpdate(a, scala.collection.mutable.ArrayBuffer.empty) += b
      adj.getOrElseUpdate(b, scala.collection.mutable.ArrayBuffer.empty) += a
    }
    // min() on the id type ≡ the distributed path's min(): orderable
    // ids only (the operator's contract). Strings compare by UNSIGNED
    // UTF-8 BYTES, not Java's UTF-16 code units — Spark SQL's
    // min()/least() order UTF8String binary, and the two orders diverge
    // for ids mixing U+E000–U+FFFF with supplementary-plane characters
    // (ADVICE r13: the regimes would pick different tie labels).
    def utf8Lt(a: String, b: String): Boolean = {
      val xa = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val xb = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      val n = math.min(xa.length, xb.length)
      while (i < n) {
        val d = (xa(i) & 0xff) - (xb(i) & 0xff)
        if (d != 0) return d < 0
        i += 1
      }
      xa.length < xb.length
    }
    def lt(x: Any, y: Any): Boolean = (x, y) match {
      case (a: Long, b: Long)     => a < b
      case (a: String, b: String) => utf8Lt(a, b)
      case (a: Int, b: Int)       => a < b
      case _ => throw new IllegalArgumentException(
        s"unorderable node id type: ${x.getClass}")
    }
    var lab: Map[Any, Any] = adj.keysIterator.map(v => v -> v).toMap
    for (_ <- 1 to rounds) {
      lab = adj.iterator.map { case (v, ns) =>
        val counts = scala.collection.mutable.Map.empty[Any, Int]
        ns.foreach(u => counts(lab(u)) = counts.getOrElse(lab(u), 0) + 1)
        val mx = counts.valuesIterator.max
        val best = counts.iterator.collect { case (l, c) if c == mx => l }
          .reduceLeft((x, y) => if (lt(y, x)) y else x)
        v -> best
      }.toMap
    }
    val idType = canon.schema("a").dataType
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        lab.toSeq.map { case (v, l) => org.apache.spark.sql.Row(v, l) }, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", idType),
        org.apache.spark.sql.types.StructField("community", idType))))
  }

  /** The scale path: per round, count neighbor labels per node, take
    * the max count, tie-break to the min label — three node-keyed
    * shuffles, synchronous via the previous round's checkpointed
    * labels. */
  private def distributedLpa(canon: DataFrame, rounds: Int): DataFrame = {
    val spark = canon.sparkSession
    import spark.implicits._
    val und = canon.select($"a".as("u"), $"b".as("v"))
      .unionAll(canon.select($"b".as("u"), $"a".as("v")))
      .persist()
    var lab = und.select($"u".as("id")).distinct()
      .select($"id", $"id".as("lab"))
      .localCheckpoint()
    for (_ <- 1 to rounds) {
      val cnt = und.join(lab.select($"id".as("v"), $"lab"), "v")
        .groupBy($"u", $"lab").agg(count(lit(1)).as("n"))
      val mx = cnt.groupBy($"u").agg(max($"n").as("mx"))
      val next = cnt.join(mx, "u").where($"n" === $"mx")
        .groupBy($"u").agg(min($"lab").as("lab"))
        .select($"u".as("id"), $"lab")
        .localCheckpoint()
      CheckpointHygiene.release(lab)
      lab = next
    }
    und.unpersist()
    CheckpointHygiene.releaseAfterFirstAction(
      lab.select($"id", $"lab".as("community")), lab)
  }
}
