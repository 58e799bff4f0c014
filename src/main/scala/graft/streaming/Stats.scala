package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Live engine stats (reference O23: per-projection processed counts,
  * avg ms/event, engine incoming/processed counters, streams.clj:99-149 +
  * api.clj:188-201, pushed to clients every second). Spark-side the same
  * numbers fall out of StreamingQueryListener progress events; this
  * listener keeps the latest snapshot per query, queryable as rows.
  */
final class StatsListener extends StreamingQueryListener {

  final case class QueryStats(
      name: String,
      processed: Long,
      lastBatchRows: Long,
      avgMsPerEvent: Double,
      status: String)

  private val stats = mutable.Map.empty[String, QueryStats]
  private val idToName = mutable.Map.empty[java.util.UUID, String]

  private def nameOf(name: String, id: java.util.UUID): String =
    Option(name).getOrElse(id.toString)

  def snapshot: Seq[QueryStats] = stats.synchronized(stats.values.toSeq.sortBy(_.name))

  override def onQueryStarted(event: QueryStartedEvent): Unit = stats.synchronized {
    val name = nameOf(event.name, event.id)
    idToName(event.id) = name
    stats(name) = QueryStats(name, 0L, 0L, 0.0, "running")
  }

  override def onQueryProgress(event: QueryProgressEvent): Unit = stats.synchronized {
    val p = event.progress
    val name = nameOf(p.name, p.id)
    idToName(p.id) = name
    val prev = stats.getOrElse(name, QueryStats(name, 0L, 0L, 0.0, "running"))
    val rows = p.numInputRows
    val ms = Option(p.durationMs.get("triggerExecution")).map(_.toLong).getOrElse(0L)
    stats(name) = prev.copy(
      processed = prev.processed + rows,
      lastBatchRows = rows,
      avgMsPerEvent = if (rows > 0) ms.toDouble / rows else prev.avgMsPerEvent,
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
