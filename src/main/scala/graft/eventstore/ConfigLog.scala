package graft.eventstore

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Event-sourced projection configuration — the reference's `__config__`
  * stream (core.clj:109-132, api.clj:20-26): projection CRUD is itself
  * appended to the event log, so the catalog is an audit log you can
  * replay, not a mutable in-memory map. Registering/unregistering writes
  * a config event FIRST (the log is the source of truth), then applies
  * the change to the wrapped in-memory [[ProjectionCatalog]]; at boot
  * the catalog is rebuilt by folding `__config__` in order_id order.
  *
  * Scope: runtime-registered [[SqlFold]]s round-trip through the log
  * (their source IS a string, exactly what the reference persists).
  * Compiled [[Fold]]s are code — they ship with the deployment and are
  * re-registered by code at boot ([[ConfigLogCatalog.registerCompiled]]
  * is deliberately NOT event-sourced), the same way the reference's
  * protected defaults live in default_projs.clj rather than the log.
  */
object ConfigLog {

  /** The reserved config stream name. */
  val Stream = "__config__"

  private val ServiceId = "graft-config"

  /** One replayed config event. `foldSql` carries a [[SqlFold]] source;
    * `initSql`/`stepSql` carry an [[OrderedSqlFold]]'s two expressions. */
  final case class ConfigEvent(
      action: String,
      name: String,
      foldSql: Option[String],
      initSql: Option[String],
      stepSql: Option[String])

  private def payload(
      action: String,
      name: String,
      aggSql: Option[String],
      initSql: Option[String] = None,
      stepSql: Option[String] = None): String = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = m.createObjectNode()
    node.put("action", action)
    node.put("name", name)
    aggSql.foreach(node.put("fold_sql", _))
    initSql.foreach(node.put("init_sql", _))
    stepSql.foreach(node.put("step_sql", _))
    m.writeValueAsString(node)
  }

  /** Append one config event through the normal ingest path (stamped,
    * validated, partition-pruned like any other stream). */
  def append(
      spark: SparkSession,
      logDir: String,
      action: String,
      name: String,
      aggSql: Option[String],
      atMs: Long): Unit = {
    import spark.implicits._
    val raw = Seq((Stream, ServiceId, s"$action:$name", "1",
        payload(action, name, aggSql)))
      .toDF("stream_name", "service_id", "local_id", "schema_version", "payload")
      .withColumn("provenance",
        lit(null).cast("struct<service_id:string,local_id:string,relationship:string>"))
    Ingest.append(Ingest.stamp(raw, atMs), logDir)
  }

  /** Append an ordered-fold registration (both expression strings). */
  def appendOrdered(
      spark: SparkSession,
      logDir: String,
      name: String,
      initSql: String,
      stepSql: String,
      atMs: Long): Unit = {
    import spark.implicits._
    val raw = Seq((Stream, ServiceId, s"register_ordered:$name", "1",
        payload("register_ordered", name, None, Some(initSql), Some(stepSql))))
      .toDF("stream_name", "service_id", "local_id", "schema_version", "payload")
      .withColumn("provenance",
        lit(null).cast("struct<service_id:string,local_id:string,relationship:string>"))
    Ingest.append(Ingest.stamp(raw, atMs), logDir)
  }

  /** Replay `__config__` in order. Empty when the log (or the stream)
    * doesn't exist yet. */
  def replay(spark: SparkSession, logDir: String): Seq[ConfigEvent] = {
    val part = new org.apache.hadoop.fs.Path(s"$logDir/stream_name=$Stream")
    val fs = part.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(part)) return Seq.empty
    spark.read.parquet(part.toString)
      .orderBy("order_id")
      .select(
        get_json_object(col("payload"), "$.action"),
        get_json_object(col("payload"), "$.name"),
        get_json_object(col("payload"), "$.fold_sql"),
        get_json_object(col("payload"), "$.init_sql"),
        get_json_object(col("payload"), "$.step_sql"))
      .collect()
      .map(r => ConfigEvent(r.getString(0), r.getString(1),
        Option(r.getString(2)), Option(r.getString(3)), Option(r.getString(4))))
      .toSeq
  }
}

/** A [[ProjectionCatalog]] whose SqlFold CRUD is event-sourced to the
  * log's `__config__` stream. Construction replays history: a restarted
  * node recovers every runtime registration (and unregistration) without
  * any out-of-band state, with protected defaults intact.
  *
  * A historical event whose fold source no longer passes [[SqlFold]]'s
  * registration vetting (e.g. the allowlist tightened since it was
  * written) is SKIPPED with a stderr warning rather than bricking boot —
  * the audit log keeps the record; the catalog just won't run it.
  */
final class ConfigLogCatalog(
    spark: SparkSession,
    logDir: String,
    clock: () => Long = () => System.currentTimeMillis()) {

  private val catalog = new ProjectionCatalog

  // boot = fold the config stream (register replaces, unregister removes;
  // protected defaults refuse removal exactly as at runtime)
  ConfigLog.replay(spark, logDir).foreach {
    case ConfigLog.ConfigEvent("register", name, Some(sql), _, _) =>
      try catalog.register(SqlFold(name, sql))
      catch { case e: IllegalArgumentException =>
        System.err.println(s"[config] skipping replayed fold '$name': ${e.getMessage}")
      }
    case ConfigLog.ConfigEvent("register_ordered", name, _, Some(init), Some(step)) =>
      try catalog.register(OrderedSqlFold(name, init, step))
      catch { case e: IllegalArgumentException =>
        System.err.println(s"[config] skipping replayed ordered fold '$name': ${e.getMessage}")
      }
    case ConfigLog.ConfigEvent("unregister", name, _, _, _) => catalog.unregister(name)
    // A KNOWN action with its SQL payload fields missing is a malformed
    // event, not an unknown action — diagnose it as such (the catch-all
    // below would misreport it and send whoever reads the log hunting
    // for a nonexistent action kind).
    case ConfigLog.ConfigEvent("register", name, None, _, _) =>
      System.err.println(s"[config] malformed 'register' event for '$name': " +
        "missing fold_sql payload field — skipped")
    case ConfigLog.ConfigEvent("register_ordered", name, _, init, step) =>
      val missing = Seq("init_sql" -> init, "step_sql" -> step)
        .collect { case (f, None) => f }.mkString(", ")
      System.err.println(s"[config] malformed 'register_ordered' event for " +
        s"'$name': missing $missing payload field(s) — skipped")
    case ConfigLog.ConfigEvent(other, name, _, _, _) =>
      System.err.println(s"[config] unknown config action '$other' for '$name' — skipped")
  }

  /** Register a runtime SQL fold: log first, then apply. */
  def register(f: SqlFold): Unit = {
    ConfigLog.append(spark, logDir, "register", f.name, Some(f.aggSql), clock())
    catalog.register(f)
  }

  /** Register a runtime ordered fold: log first, then apply — the
    * audit-log property covers both runtime-registrable kinds. */
  def register(f: OrderedSqlFold): Unit = {
    ConfigLog.appendOrdered(spark, logDir, f.name, f.initSql, f.stepSql, clock())
    catalog.register(f)
  }

  /** Unregister; protected defaults refuse (and nothing is logged). */
  def unregister(name: String): Boolean =
    if (catalog.isProtected(name) || catalog.get(name).isEmpty) false
    else {
      ConfigLog.append(spark, logDir, "unregister", name, None, clock())
      catalog.unregister(name)
    }

  /** Compiled folds are deployment code, not runtime config — registered
    * in memory only (see [[ConfigLog]] scope note). */
  def registerCompiled(f: Fold[_]): Unit = catalog.register(f)

  def get(name: String): Option[NamedProjection] = catalog.get(name)
  def names: Seq[String] = catalog.names
  def isProtected(name: String): Boolean = catalog.isProtected(name)
}
