package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Integer-exact PageRank (basis points, damping 0.85 spelled as the
  * exact integer recurrence `1500 + (8500·Σ rank DIV deg) DIV 10000`)
  * over an undirected pair list — the duplicate-cluster centrality
  * read behind x_dup_pagerank, kept in int64 end to end so Spark DIV
  * and DuckDB // agree bit-for-bit.
  *
  * Two-regime dispatch, same shape as [[ConnectedComponents]] /
  * [[KCore]]: graphs at or under [[ConnectedComponents.DriverEdgeLimit]]
  * edges run the iteration as a driver-local loop over the collected
  * pair list (a fixed iteration count over a small graph spends more
  * on Spark job scheduling than on arithmetic — the measured KCore/BPE
  * lesson), larger graphs run the distributed join/aggregate stack with
  * one pre-partitioned edge exchange reused by every iteration
  * (ReusedExchange). Both regimes execute the IDENTICAL integer
  * recurrence — PageRankSpec dual-runs them and pins equality row for
  * row, plus closed forms on constructed graphs.
  */
object PageRank {

  /** pairs(aCol, bCol): distinct undirected pairs over INTEGRAL node
    * ids (byte/short/int/long — enforced loudly below: a silent
    * cast("long") of string tokens would yield all-null ids, an NPE on
    * the driver path and one phantom null node with garbage ranks on
    * the distributed path; rank a string-keyed graph by mapping tokens
    * to dense ids first). Returns one row per node — (id, deg, rank_bp)
    * after `iters` iterations, unordered (callers add their own top-k).
    * `driverLimit` exists for tests to force the distributed regime
    * (the KCore pattern). On the DISTRIBUTED path the returned frame
    * is SINGLE-CONSUMPTION (its checkpoint releases after the caller's
    * first action — CheckpointHygiene.releaseAfterFirstAction). */
  def ranksBp(pairs0: DataFrame, aCol: String, bCol: String,
      iters: Int = 3,
      driverLimit: Long = ConnectedComponents.DriverEdgeLimit): DataFrame = {
    val spark = pairs0.sparkSession
    import spark.implicits._
    Seq(aCol, bCol).foreach { c =>
      import org.apache.spark.sql.types._
      val ok = pairs0.schema(c).dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }
      require(ok,
        s"PageRank.ranksBp needs integral node ids; column '$c' is " +
          s"${pairs0.schema(c).dataType.catalogString} — map tokens to " +
          "dense ids before ranking")
    }
    val pairs = pairs0.select(col(aCol).cast("long").as("a"),
      col(bCol).cast("long").as("b"))
      // the size probe and the chosen path both re-read the pair set
      .persist()
    val probeCount = pairs
      .limit(math.min(driverLimit, Int.MaxValue - 1L).toInt + 1).count()
    if (probeCount <= driverLimit) {
      val probe = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
      pairs.unpersist()
      // doubled edge list, same multiset as the distributed unionAll
      val edges = probe.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      val deg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
      var rank = deg.map { case (id, _) => id -> 10000L }
      for (_ <- 1 to iters) {
        val s = scala.collection.mutable.Map.empty[Long, Long]
        edges.foreach { case (src, dst) =>
          // Long / on non-negative operands == Spark DIV == DuckDB //
          s.update(dst, s.getOrElse(dst, 0L) + rank(src) / deg(src))
        }
        rank = s.map { case (id, v) => id -> (1500L + (8500L * v) / 10000L) }.toMap
      }
      spark.createDataset(
          rank.toSeq.map { case (id, r) => (id, deg(id), r) })
        .toDF("id", "deg", "rank_bp")
    } else {
      // one exchange under the whole iteration stack: every reference
      // to `edges` below reuses this shuffle, so the upstream pair
      // pipeline materializes the graph exactly once (ReusedExchange)
      val edges = pairs.select($"a".as("src"), $"b".as("dst"))
        .unionAll(pairs.select($"b".as("src"), $"a".as("dst")))
        .repartition($"src")
      val deg = edges.groupBy($"src").agg(count(lit(1)).as("deg"))
      val edgesD = edges.join(deg, "src")
      var rank = deg.select($"src".as("id"), lit(10000L).as("rank"))
      for (_ <- 1 to iters) {
        rank = edgesD.join(rank, $"src" === $"id")
          .select($"dst", expr("rank DIV deg").as("contrib"))
          .groupBy($"dst")
          .agg(sum($"contrib").as("s"))
          .select($"dst".as("id"),
            expr("CAST(1500 + (8500 * s) DIV 10000 AS BIGINT)").as("rank"))
      }
      // localCheckpoint materializes the iteration ONCE (the pairs
      // persist can then be dropped before return without the caller's
      // action re-running the whole pair build); ownership of the
      // checkpoint blocks transfers to the caller's first action via
      // the one-shot listener — a long non-bench session (a notebook,
      // Verify's pool) no longer strands one block per invocation.
      // Single-consumption contract: see releaseAfterFirstAction.
      val out = rank.join(deg, $"id" === $"src")
        .select($"id", $"deg", $"rank".as("rank_bp"))
        .localCheckpoint()
      pairs.unpersist()
      CheckpointHygiene.releaseAfterFirstAction(out)
    }
  }
}
