package graft.eventstore

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** Mirrors the reference's projection invariants (projections.clj):
  * fold count == event count (:100-105), latest-per-key state, failure
  * capture (streams.clj:90-97), replace-and-refold (:159-182), protected
  * defaults (:150-154).
  */
class ProjectionSpec extends AnyFunSuite with SparkTestBase {

  private val T0 = 1700000000000L

  private def logOf(n: Int): org.apache.spark.sql.Dataset[Event] = {
    val log = tmpDir("plog")
    Ingest.ingest(rawEvents(n), log, T0)
    Replay.typed(spark, log)
  }

  test("count fold == count(*) per stream (the (fn [a b] (inc a)) projection)") {
    import spark.implicits._
    val ev = logOf(101)
    val folded = Projections.runOrdered(ev, CountFold("c")).collect()
      .map(r => r.stream_name -> r.value).toMap
    val sql = ev.groupBy("stream_name").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(folded == sql)
    assert(folded.values.sum == 101L)
  }

  test("latest-per-key fold == window row_number=1 (security-state pattern)") {
    import spark.implicits._
    val ev = logOf(60)
    val folded = Projections.runOrdered(ev, LatestFold("l")).collect()
    folded.foreach { r =>
      val expected = ev.where($"stream_name" === r.stream_name)
        .orderBy($"order_id".desc).limit(1).collect().head
      assert(r.value(expected.local_id) == expected.payload)
      assert(r.status == "finished")
    }
  }

  test("sum fold over JSON payload field == SQL sum") {
    import spark.implicits._
    val ev = logOf(40)
    val folded = Projections.runOrdered(ev, SumFold("s", "v")).collect()
      .map(r => r.stream_name -> r.value).toMap
    val sql = ev
      .withColumn("v", get_json_object($"payload", "$.v").cast("double"))
      .groupBy("stream_name").agg(sum($"v")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(folded == sql)
  }

  test("failing fold: state frozen at last good value, status=failed, error captured") {
    import spark.implicits._
    val boom = new Fold[Long] {
      val name = "boom"
      val initial = 0L
      def step(s: Long, e: Event): Long =
        if (s == 3) throw new IllegalStateException("kaboom") else s + 1
    }
    val ev = logOf(20)
    val res = Projections.runOrdered(ev, boom).collect()
    res.foreach { r =>
      assert(r.status == "failed")
      assert(r.value == 3L)
      assert(r.last_error.exists(_.contains("kaboom")))
    }
  }

  test("catalog: replace-if-exists, protected defaults, re-fold gives same result") {
    val cat = new ProjectionCatalog
    assert(cat.names.contains("__streams__"))
    assert(!cat.unregister("__streams__")) // protected (core.clj:102-107)
    cat.register(CountFold("mine"))
    cat.register(CountFold("mine")) // replace, no error
    assert(cat.unregister("mine"))
    assert(cat.get("mine").isEmpty)

    // re-registration re-folds full history → identical descriptor
    // (modulo the wall-clock stats fields, which are measurements)
    import spark.implicits._
    val ev = logOf(30)
    def stable(rows: Array[ProjRow[Long]]) = rows
      .map(r => (r.stream_name, r.value, r.processed, r.status, r.last_error))
      .sortBy(_._1).toSeq
    val a = stable(Projections.runOrdered(ev, CountFold("r")).collect())
    val b = stable(Projections.runOrdered(ev, CountFold("r")).collect())
    assert(a == b)
    // the stats fields themselves are populated
    val rows = Projections.runOrdered(ev, CountFold("r")).collect()
    assert(rows.forall(r => r.avg_step_us >= 0.0 && r.state_bytes > 0))
  }

  test("runtime-registered SQL-expression folds: no recompile, no code eval") {
    import spark.implicits._
    val cat = new ProjectionCatalog

    // syntactically invalid source is rejected at the registration edge
    // (the reference compiles fold source at register time, exec.clj)
    intercept[Exception] { SqlFold("bad", "sum((") }

    // register from strings at runtime
    cat.register(SqlFold("v_sum",
      "sum(cast(get_json_object(payload, '$.v') as double))"))
    cat.register(SqlFold("latest_payload", "max_by(payload, order_id)"))
    assert(cat.get("v_sum").isDefined)
    assert(!cat.unregister("__streams__")) // protected defaults intact

    val ev = logOf(40)
    val vSum = Projections.runSql(ev,
      cat.get("v_sum").get.asInstanceOf[SqlFold]).collect()
      .map(r => r.getString(1) -> r.getDouble(2)).toMap
    val wantSum = ev
      .withColumn("v", get_json_object($"payload", "$.v").cast("double"))
      .groupBy("stream_name").agg(sum($"v")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(vSum == wantSum)

    // the latest-per-stream expression fold matches the ordered replay
    val latest = Projections.runSql(ev,
      cat.get("latest_payload").get.asInstanceOf[SqlFold]).collect()
      .map(r => r.getString(1) -> r.getString(2)).toMap
    latest.foreach { case (stream, payload) =>
      val expected = ev.where($"stream_name" === stream)
        .orderBy($"order_id".desc).limit(1).collect().head
      assert(payload == expected.payload, stream)
    }

    // descriptor shape: name, status, processed are populated
    val rows = Projections.runSql(ev, SqlFold("n", "count(1)")).collect()
    assert(rows.forall(r => r.getString(0) == "n" && r.getString(4) == "finished"))
    assert(rows.map(_.getLong(3)).sum == 40L)

    // replace-if-exists works across kinds (compiled fold → SQL fold)
    cat.register(CountFold("dual"))
    cat.register(SqlFold("dual", "count(1)"))
    assert(cat.get("dual").get.isInstanceOf[SqlFold])
  }

  test("order-sensitive runtime SQL fold: concat journal == compiled ordered fold") {
    import spark.implicits._
    val ev = logOf(60)

    // non-commutative step: append each event's local_id in replay order
    val f = OrderedSqlFold("journal", "''", "concat(acc, x.local_id, ';')")
    val got = Projections.runOrderedSql(ev, f).collect()
      .map(r => r.getString(1) -> r.getString(2)).toMap

    // ground truth via the compiled sequential fold
    val want = Projections.runOrdered(ev, JournalFold("j")).collect()
      .map(r => r.stream_name -> r.value).toMap
    assert(got == want)

    // processed counts match the stream sizes
    val counts = Projections.runOrderedSql(ev, f).collect()
      .map(r => r.getString(1) -> r.getLong(3)).toMap
    val sql = ev.groupBy("stream_name").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == sql)

    // registration-edge vetting: same allowlist as SqlFold, both exprs
    intercept[IllegalArgumentException] {
      OrderedSqlFold("evil", "''", "java_method('java.lang.System', 'getenv')")
    }
    intercept[IllegalArgumentException] {
      OrderedSqlFold("evil2", "reflect('java.util.UUID', 'randomUUID')", "acc")
    }
    intercept[Exception] { OrderedSqlFold("bad", "''", "concat((") }
  }

  test("ordered fold with a '--' comment in its source still runs (canonical re-render)") {
    import spark.implicits._
    // a line comment parses cleanly standalone, but raw interpolation
    // into `aggregate(evs, init, (acc, x) -> step)` would comment out
    // the template's closing parens — every batch would ParseException.
    // The canonical re-render strips it at registration.
    val commented = OrderedSqlFold("journal_c",
      "'' -- start empty",
      "concat(acc, x.local_id, ';') -- audit trail")
    assert(!commented.initCanonical.contains("--"))
    assert(!commented.stepCanonical.contains("--"))
    val ev = logOf(30)
    val got = Projections.runOrderedSql(ev, commented).collect()
      .map(r => r.getString(1) -> r.getString(2)).toMap
    val want = Projections.runOrderedSql(
      ev, OrderedSqlFold("journal", "''", "concat(acc, x.local_id, ';')"))
      .collect().map(r => r.getString(1) -> r.getString(2)).toMap
    assert(got == want)
  }

  test("SqlFold rejects reflection/side-effecting/off-allowlist source at registration") {
    // the injection surface of runtime registration: Catalyst exposes
    // arbitrary static-method invocation — must die at the edge
    for (src <- Seq(
        "java_method('java.lang.System', 'exit', 0)",
        "reflect('java.lang.Runtime', 'getRuntime')",
        "min(reflect('java.lang.System', 'getenv'))", // nested inside an allowed agg
        "sum(rand())", // nondeterministic
        "count(input_file_name())", // i/o probe
        "max((SELECT payload FROM other))")) { // subquery
      val ex = intercept[IllegalArgumentException] { SqlFold("evil", src) }
      assert(ex.getMessage.contains("evil"), src)
    }
    // the folds photon users actually write still register fine
    SqlFold("ok1", "sum(cast(get_json_object(payload, '$.v') as double))")
    SqlFold("ok2", "max_by(payload, order_id)")
    SqlFold("ok3", "count(if(length(payload) > 10, 1, null))")
  }

  test("property: count fold == count(*) for random event batches (ScalaCheck gen)") {
    import spark.implicits._
    // deterministic ScalaCheck sampling (no scalatestplus bridge offline)
    val sizes = Iterator.iterate(Seed(42L))(_.next).take(5)
      .map(s => Gen.choose(1, 120).pureApply(Gen.Parameters.default, s)).toList
    sizes.foreach { n =>
      val ev = logOf(n)
      val folded = Projections.runOrdered(ev, CountFold("p")).collect().map(_.value).sum
      assert(folded == n.toLong, s"n=$n")
    }
  }

  test("commutative aggregator path (udaf) agrees with ordered fold for counts") {
    import spark.implicits._
    val ev = logOf(50)
    val agg = Projections.aggregator[Long](0L, (s, _) => s + 1, _ + _)
    val viaAgg = ev.groupByKey(_.stream_name).agg(agg.toColumn.name("n")).collect().toMap
    val viaFold = Projections.runOrdered(ev, CountFold("c")).collect()
      .map(r => r.stream_name -> r.value).toMap
    assert(viaAgg == viaFold)
  }
}

/** Non-commutative ground-truth fold for the OrderedSqlFold test (file
  * scope: a method-local class would capture the unserializable suite). */
final case class JournalFold(name: String) extends Fold[String] {
  override def initial: String = ""
  override def step(state: String, e: Event): String = state + e.local_id + ";"
}
