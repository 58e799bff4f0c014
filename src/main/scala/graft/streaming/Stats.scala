package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Live engine stats (reference O23: per-projection processed counts,
  * avg ms/event + mem-used, engine incoming/processed counters,
  * streams.clj:99-149 + api.clj:188-201, pushed to clients every
  * second). Spark-side the same numbers fall out of
  * StreamingQueryListener progress events; this listener keeps the
  * latest snapshot per query, queryable as rows ([[toDF]]) — the
  * descriptor-stats surface for the whole streaming twin set
  * (StreamingBurst/Paths/Session/... run with no changes; any query on
  * the session reports here).
  *
  * mem-used maps to the state-store footprint
  * (`stateOperators.memoryUsedBytes`, summed over operators) plus the
  * total state rows — for a stateful twin this IS the projection's
  * in-memory size, the number the reference's `mem-used` gauge reports
  * per projection. Stateless queries report 0. */
final class StatsListener extends StreamingQueryListener {

  final case class QueryStats(
      name: String,
      processed: Long,
      lastBatchRows: Long,
      avgMsPerEvent: Double,
      memUsedBytes: Long,
      stateRows: Long,
      status: String)

  private val stats = mutable.Map.empty[String, QueryStats]
  private val idToName = mutable.Map.empty[java.util.UUID, String]

  private def nameOf(name: String, id: java.util.UUID): String =
    Option(name).getOrElse(id.toString)

  def snapshot: Seq[QueryStats] = stats.synchronized(stats.values.toSeq.sortBy(_.name))

  override def onQueryStarted(event: QueryStartedEvent): Unit = stats.synchronized {
    val name = nameOf(event.name, event.id)
    idToName(event.id) = name
    stats(name) = QueryStats(name, 0L, 0L, 0.0, 0L, 0L, "running")
  }

  override def onQueryProgress(event: QueryProgressEvent): Unit = stats.synchronized {
    val p = event.progress
    val name = nameOf(p.name, p.id)
    idToName(p.id) = name
    val prev = stats.getOrElse(name, QueryStats(name, 0L, 0L, 0.0, 0L, 0L, "running"))
    val rows = p.numInputRows
    val ms = Option(p.durationMs.get("triggerExecution")).map(_.toLong).getOrElse(0L)
    val ops = Option(p.stateOperators).map(_.toSeq).getOrElse(Nil)
    stats(name) = prev.copy(
      processed = prev.processed + rows,
      lastBatchRows = rows,
      avgMsPerEvent = if (rows > 0) ms.toDouble / rows else prev.avgMsPerEvent,
      memUsedBytes = ops.map(_.memoryUsedBytes).sum,
      stateRows = ops.map(_.numRowsTotal).sum,
      status = "running")
  }

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = stats.synchronized {
    // attribute termination to THE terminated query via the id→name map
    val status = if (event.exception.isDefined) "failed" else "finished"
    idToName.get(event.id).foreach { name =>
      stats.get(name).foreach(v => stats(name) = v.copy(status = status))
    }
  }
}

object StatsListener {
  def install(spark: SparkSession): StatsListener = {
    val l = new StatsListener
    spark.streams.addListener(l)
    l
  }
}

/** Queryable-rows view of a listener snapshot — the `stats` API read
  * (reference api.clj:188-201): one row per live query with the
  * descriptor-stats columns (processed / avg-time / mem-used). */
object TwinStats {
  def toDF(spark: SparkSession, l: StatsListener)
      : org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    l.snapshot.map(s => (s.name, s.processed, s.lastBatchRows,
        s.avgMsPerEvent, s.memUsedBytes, s.stateRows, s.status))
      .toDF("query_name", "processed", "last_batch_rows",
        "avg_ms_per_event", "mem_used_bytes", "state_rows", "status")
  }
}
