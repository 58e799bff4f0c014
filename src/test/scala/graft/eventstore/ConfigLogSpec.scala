package graft.eventstore

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The reference's event-sourced projection config (`__config__`,
  * core.clj:109-132, api.clj:20-26): CRUD is appended to the log and the
  * catalog is a fold over it — restart recovers every runtime
  * registration, protected defaults stay protected, and the audit trail
  * survives in the log itself. */
class ConfigLogSpec extends AnyFunSuite with SparkTestBase {

  private val T0 = 1700000000000L

  private def clockFrom(t0: Long): () => Long = {
    val t = new java.util.concurrent.atomic.AtomicLong(t0)
    () => t.getAndAdd(1000L)
  }

  test("catalog rebuilds from the __config__ stream across restarts") {
    val log = tmpDir("cfg")
    val cat = new ConfigLogCatalog(spark, log, clockFrom(T0))
    cat.register(SqlFold("v_sum", "sum(cast(get_json_object(payload, '$.v') as double))"))
    cat.register(SqlFold("latest", "max_by(payload, order_id)"))
    cat.register(SqlFold("doomed", "count(1)"))
    assert(cat.unregister("doomed"))
    // replace-if-exists is one more register event; last write wins
    cat.register(SqlFold("v_sum", "count(1)"))

    // a fresh node over the same log: every surviving registration is
    // back, the removal stayed removed, defaults are present + protected
    val rebooted = new ConfigLogCatalog(spark, log, clockFrom(T0 + 100000L))
    assert(rebooted.get("latest").exists(
      _.asInstanceOf[SqlFold].aggSql == "max_by(payload, order_id)"))
    assert(rebooted.get("v_sum").exists(_.asInstanceOf[SqlFold].aggSql == "count(1)"))
    assert(rebooted.get("doomed").isEmpty)
    assert(rebooted.names.contains("__streams__"))
    assert(!rebooted.unregister("__streams__")) // protected, and not logged
    assert(rebooted.get("__streams__").isDefined)

    // the audit trail is ordinary log data: 5 config events, replayable
    assert(ConfigLog.replay(spark, log).size == 5)

    // a restored fold actually runs
    val evLog = tmpDir("cfgev")
    Ingest.ingest(rawEvents(20), evLog, T0)
    val rows = Projections.runSql(Replay.typed(spark, evLog),
      rebooted.get("v_sum").get.asInstanceOf[SqlFold]).collect()
    assert(rows.map(_.getLong(3)).sum == 20L)
  }

  test("boot on an empty/non-existent log is just the defaults") {
    val cat = new ConfigLogCatalog(spark, tmpDir("cfgempty") + "/nothere")
    assert(cat.names.toSet == Set("__streams__", "__security-state__"))
  }

  test("compiled folds are deployment code: registered in memory, not logged") {
    val log = tmpDir("cfgcode")
    val cat = new ConfigLogCatalog(spark, log, clockFrom(T0))
    cat.registerCompiled(CountFold("code_fold"))
    assert(cat.get("code_fold").isDefined)
    assert(ConfigLog.replay(spark, log).isEmpty)
    // so a reboot does NOT restore it — code re-registers it at boot
    assert(new ConfigLogCatalog(spark, log).get("code_fold").isEmpty)
  }

  test("ordered folds are event-sourced too: reboot restores them") {
    val log = tmpDir("cfgord")
    val cat = new ConfigLogCatalog(spark, log, clockFrom(T0))
    cat.register(OrderedSqlFold("journal", "''", "concat(acc, x.local_id, ';')"))
    val rebooted = new ConfigLogCatalog(spark, log, clockFrom(T0 + 10000))
    val restored = rebooted.get("journal")
    assert(restored.exists(_.isInstanceOf[OrderedSqlFold]))
    assert(restored.get.asInstanceOf[OrderedSqlFold].stepSql
      == "concat(acc, x.local_id, ';')")
    // a forged historical ordered event that fails vetting is skipped
    ConfigLog.appendOrdered(spark, log, "evil_ord",
      "''", "java_method('java.lang.System', 'getenv')", T0 + 20000)
    val again = new ConfigLogCatalog(spark, log, clockFrom(T0 + 30000))
    assert(again.get("evil_ord").isEmpty)
    assert(again.get("journal").isDefined)
  }

  test("a known action with missing payload fields is a malformed skip, not 'unknown action'") {
    val log = tmpDir("cfgmal")
    // forge events with the right action but a gutted payload (a buggy
    // or truncated writer) — boot must skip them as malformed, keep
    // replaying, and NOT misreport the action itself as unknown
    ConfigLog.append(spark, log, "register", "half_reg", None, T0)
    ConfigLog.append(spark, log, "register_ordered", "half_ord", None, T0 + 1000)
    ConfigLog.append(spark, log, "register", "fine", Some("count(1)"), T0 + 2000)
    val err = new java.io.ByteArrayOutputStream()
    val old = System.err
    System.setErr(new java.io.PrintStream(err, true, "UTF-8"))
    val cat = try new ConfigLogCatalog(spark, log, clockFrom(T0 + 3000))
    finally System.setErr(old)
    assert(cat.get("half_reg").isEmpty)
    assert(cat.get("half_ord").isEmpty)
    assert(cat.get("fine").isDefined)
    val diag = err.toString("UTF-8")
    assert(diag.contains("malformed 'register' event for 'half_reg'"), diag)
    assert(diag.contains("malformed 'register_ordered' event for 'half_ord'"), diag)
    assert(!diag.contains("unknown config action 'register"), diag)
  }

  test("a replayed event that no longer passes vetting is skipped, not fatal") {
    val log = tmpDir("cfgbad")
    // forge a historical event whose source the allowlist rejects today
    // (writing it directly — SqlFold's constructor would refuse)
    ConfigLog.append(spark, log, "register", "evil",
      Some("java_method('java.lang.System', 'exit', 0)"), T0)
    ConfigLog.append(spark, log, "register", "fine", Some("count(1)"), T0 + 1000)
    val cat = new ConfigLogCatalog(spark, log, clockFrom(T0 + 2000))
    assert(cat.get("evil").isEmpty) // skipped
    assert(cat.get("fine").isDefined) // rest of the replay unaffected
  }
}
