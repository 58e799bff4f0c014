package graft.eventstore

import scala.collection.mutable
import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Anything registrable in the [[ProjectionCatalog]]. */
trait NamedProjection extends Serializable {
  def name: String
}

/** A projection = photon's generic fold `state ← f(state, event)` with an
  * initial value, run per stream (reference streams.clj:241-274 register,
  * 125-161 fold step). `stream = None` folds every stream separately;
  * photon's "one projection over one stream" is the single-group case.
  */
trait Fold[S] extends NamedProjection {
  def initial: S
  def step(state: S, e: Event): S
}

/** A projection registered AT RUNTIME from a SQL aggregate-expression
  * string — the safe middle ground for the reference's runtime
  * registration UX (api.clj:20-26: clients POST fold source at runtime;
  * deviation §7.6 rules out code eval): the string goes through
  * `expr()`/Catalyst, which covers the folds photon users actually write
  * (count / sum / min / max / latest-by-order, e.g.
  * `"max_by(payload, order_id)"`) and runs as a PARALLEL mergeable
  * aggregate rather than a sequential fold — the 100 TB shape.
  * Order-sensitive non-commutative folds still need a compiled [[Fold]]
  * (SURVEY.md §7.4 documents the constraint).
  *
  * The expression is parsed AND vetted at construction, so syntactically
  * invalid or unsafe source is rejected at the registration edge —
  * mirroring the reference's compile step (exec.clj:16-24). Fold source
  * arrives from untrusted clients in the reference's POST-registration
  * API, and Catalyst exposes side-effecting escape hatches
  * (`java_method`/`reflect` invoke arbitrary static methods), so every
  * function called by the expression must be on [[SqlFold.Allowed]] and
  * subqueries are rejected outright. Analysis errors (unknown column)
  * still surface on first run, loudly.
  */
final case class SqlFold(name: String, aggSql: String) extends NamedProjection {
  // parse = registration-time validation (functions.expr defers parsing)
  {
    val parsed =
      org.apache.spark.sql.catalyst.parser.CatalystSqlParser.parseExpression(aggSql)
    val called = parsed.collect {
      case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction =>
        f.nameParts.mkString(".").toLowerCase(java.util.Locale.ROOT)
    }
    val illegal = called.filterNot(SqlFold.Allowed).distinct
    if (illegal.nonEmpty) throw new IllegalArgumentException(
      s"SqlFold '$name' calls functions outside the runtime-registration " +
        s"allowlist: ${illegal.mkString(", ")} (source: $aggSql)")
    if (parsed.exists(_.isInstanceOf[
        org.apache.spark.sql.catalyst.expressions.PlanExpression[_]]))
      throw new IllegalArgumentException(
        s"SqlFold '$name' must be a pure aggregate expression; subqueries " +
          s"are not allowed (source: $aggSql)")
  }
}

/** An ORDER-SENSITIVE projection registered at runtime from SQL
  * expression strings — closes the deviation-§7.6 gap SqlFold left
  * open (non-commutative folds needed compiled Scala). The fold runs
  * as a Catalyst `aggregate` HOF over each stream's events collected
  * into an order_id-sorted struct array:
  *
  *   aggregate(evs, <initSql>, (acc, x) -> <stepSql>)
  *
  * `stepSql` references the accumulator as `acc` and the current
  * event's columns as `x.order_id`, `x.payload`, … — e.g.
  * `"if(get_json_object(x.payload, '$.v') > acc.hi, named_struct('hi',
  * ...), acc)"` or `"concat(acc, x.local_id)"`. Sequential semantics
  * are exactly the reference's one-event-at-a-time contract
  * (streams.clj:147-161); parallelism is across streams, like
  * [[Projections.runOrdered]].
  *
  * Scale bound, stated loudly: the per-stream event array materializes
  * in one aggregation buffer, so a single stream must fit in executor
  * memory. That is inherent to running an ARBITRARY runtime-registered
  * sequential fold in one pass; streams beyond memory keep the
  * compiled [[Fold]] path (which streams through an iterator) or a
  * mergeable [[SqlFold]].
  *
  * Both expression strings are parsed and allowlist-vetted at
  * registration exactly like [[SqlFold]] (no reflection escape
  * hatches, no subqueries).
  */
final case class OrderedSqlFold(name: String, initSql: String, stepSql: String)
    extends NamedProjection {
  /** Canonical (comment-free) renderings of the vetted expressions —
    * what actually gets interpolated into the `aggregate(evs, init,
    * (acc, x) -> step)` template. Interpolating the RAW source would be
    * wrong: a `--` line comment parses cleanly as a standalone
    * expression yet comments out the template's closing parenthesis at
    * use, so a fold that validated at registration would throw a
    * ParseException on every batch. Re-rendering from the parsed tree
    * (`Expression.sql`) strips comments by construction; a round-trip
    * re-parse guards against any non-reparseable rendering. */
  val (initCanonical, stepCanonical) = {
    def vet(which: String, src: String): String = {
      val parsed =
        org.apache.spark.sql.catalyst.parser.CatalystSqlParser.parseExpression(src)
      val called = parsed.collect {
        case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction =>
          f.nameParts.mkString(".").toLowerCase(java.util.Locale.ROOT)
      }
      val illegal = called.filterNot(SqlFold.Allowed).distinct
      if (illegal.nonEmpty) throw new IllegalArgumentException(
        s"OrderedSqlFold '$name' $which calls functions outside the " +
          s"runtime-registration allowlist: ${illegal.mkString(", ")} (source: $src)")
      if (parsed.exists(_.isInstanceOf[
          org.apache.spark.sql.catalyst.expressions.PlanExpression[_]]))
        throw new IllegalArgumentException(
          s"OrderedSqlFold '$name' $which must be a pure expression; subqueries " +
            s"are not allowed (source: $src)")
      val canonical =
        try parsed.sql
        catch { case NonFatal(ex) => throw new IllegalArgumentException(
          s"OrderedSqlFold '$name' $which cannot be canonicalized " +
            s"(${ex.getMessage}); simplify the expression (source: $src)")
        }
      try org.apache.spark.sql.catalyst.parser.CatalystSqlParser
        .parseExpression(canonical)
      catch { case NonFatal(ex) => throw new IllegalArgumentException(
        s"OrderedSqlFold '$name' $which canonical form does not re-parse " +
          s"('$canonical': ${ex.getMessage}); simplify the expression " +
          s"(source: $src)")
      }
      canonical
    }
    (vet("init", initSql), vet("step", stepSql))
  }
}

object SqlFold {
  /** Functions a runtime-registered fold may call: the mergeable
    * aggregates photon folds are built from, plus pure scalar plumbing
    * (arithmetic, conditionals, strings, dates, json accessors). No
    * reflection (`java_method`/`reflect`/`call_method_via_reflection`),
    * no I/O (`input_file_name`), no nondeterminism (`rand`/`uuid`), no
    * env probes (`current_user`/`current_database`) — anything off-list
    * is rejected at registration, not discovered in production. */
  val Allowed: Set[String] = Set(
    // aggregates
    "count", "sum", "min", "max", "avg", "mean", "first", "last", "any_value",
    "min_by", "max_by", "count_if", "bool_and", "bool_or", "every", "any", "some",
    "collect_list", "collect_set", "approx_count_distinct", "hll_sketch_agg",
    "percentile", "percentile_approx", "approx_percentile", "median", "mode",
    "stddev", "stddev_pop", "stddev_samp", "variance", "var_pop", "var_samp",
    "skewness", "kurtosis", "corr", "covar_pop", "covar_samp",
    "bit_and", "bit_or", "bit_xor", "bitmap_construct_agg",
    // conditionals / null handling
    "coalesce", "nullif", "if", "ifnull", "nvl", "nvl2", "least", "greatest",
    // arithmetic
    "abs", "round", "bround", "floor", "ceil", "ceiling", "sqrt", "cbrt",
    "pow", "power", "exp", "expm1", "ln", "log", "log2", "log10", "sign",
    "mod", "pmod", "try_divide", "try_add", "try_multiply", "try_subtract",
    // strings
    "concat", "concat_ws", "substring", "substr", "length", "char_length",
    "lower", "upper", "trim", "ltrim", "rtrim", "lpad", "rpad", "split",
    "regexp_extract", "regexp_replace", "regexp_like", "rlike", "like",
    "replace", "translate", "instr", "locate", "position", "left", "right",
    "format_number", "format_string",
    // json (payloads are json strings)
    "get_json_object", "json_tuple", "from_json", "to_json", "json_array_length",
    "json_object_keys", "schema_of_json",
    // arrays / maps / structs built from the row itself
    "struct", "named_struct", "array", "map", "map_from_entries", "element_at",
    "size", "cardinality", "array_contains", "array_distinct", "array_max",
    "array_min", "sort_array", "slice", "flatten", "arrays_zip",
    // dates
    "to_timestamp", "to_date", "unix_timestamp", "from_unixtime", "date_trunc",
    "trunc", "year", "quarter", "month", "day", "dayofmonth", "dayofweek",
    "dayofyear", "weekofyear", "hour", "minute", "second", "datediff",
    "date_add", "date_sub", "add_months", "months_between", "last_day",
    "unix_millis", "unix_micros", "timestamp_millis", "timestamp_micros",
    // hashing (content fingerprints are a legit fold)
    "hash", "xxhash64", "md5", "sha1", "sha2", "crc32")
}

/** Descriptor row — the queryable "running query" record (SURVEY.md §1.3:
  * projection-name, stream-name, current-value, processed, status,
  * last-error, avg-time, mem-used; reference streams.clj:216-232,
  * doc/schemas.md:97-123).
  *
  * `avg_step_us` mirrors the reference's `avg-time` (ms/event,
  * streams.clj:105-106) at µs resolution; `state_bytes` mirrors
  * `mem-used` (serialized state size, nippy byte-counting at
  * streams.clj:108-123) using the state's UTF-8 rendering as the size
  * proxy — same monotonic signal, no serializer round-trip per update.
  */
final case class ProjRow[S](
    projection_name: String,
    stream_name: String,
    value: S,
    processed: Long,
    status: String,
    last_error: Option[String],
    avg_step_us: Double = 0.0,
    state_bytes: Long = 0L)

object Projections {

  /** Ordered per-stream fold — faithful to the reference's guarantee that
    * a projection sees its stream's events one at a time in order-id order
    * (streams.clj:147-161). Spark shape: one shuffle on stream_name, an
    * in-partition sort by (stream_name, order_id), then a streaming fold
    * over each run of equal stream — parallel ACROSS streams (like the
    * reference's worker pool is parallel across projections,
    * streams.clj:410-420), sequential within one, which is forced by
    * arbitrary non-commutative `step`.
    *
    * Failure capture mirrors streams.clj:90-97: the first exception stops
    * that stream's fold, keeps the last good state and records
    * status=failed + the error text.
    */
  def runOrdered[S](events: Dataset[Event], fold: Fold[S])(
      implicit enc: Encoder[ProjRow[S]]): Dataset[ProjRow[S]] = {
    events
      .repartition(col("stream_name"))
      .sortWithinPartitions("stream_name", "order_id")
      .mapPartitions { it =>
        val out = mutable.ArrayBuffer.empty[ProjRow[S]]
        var cur: String = null
        var state: S = fold.initial
        var n = 0L
        var ns = 0L
        var err: Option[String] = None
        def flush(): Unit = if (cur != null) {
          val bytes = Option(state).map(_.toString.getBytes("UTF-8").length.toLong)
            .getOrElse(0L)
          out += ProjRow(fold.name, cur, state, n,
            if (err.isDefined) "failed" else "finished", err,
            if (n > 0) ns / 1000.0 / n else 0.0, bytes)
        }
        it.foreach { e =>
          if (e.stream_name != cur) {
            flush(); cur = e.stream_name; state = fold.initial; n = 0L; ns = 0L
            err = None
          }
          if (err.isEmpty) {
            val t0 = System.nanoTime()
            try { state = fold.step(state, e); n += 1 }
            catch { case NonFatal(ex) =>
              err = Some(s"${ex.getClass.getName}: ${ex.getMessage}")
            }
            ns += System.nanoTime() - t0
          }
        }
        flush()
        out.iterator
      }
  }

  /** Run a runtime-registered SQL-expression fold: one hash aggregate
    * per stream (partial aggregation, no sort), descriptor-shaped
    * output. The same agg expression drops into a streaming
    * `groupBy(stream_name).agg(...)` for the live path when it is
    * streaming-compatible. */
  def runSql(events: Dataset[Event], f: SqlFold): DataFrame =
    events.toDF()
      .groupBy(col("stream_name"))
      .agg(expr(f.aggSql).as("value"), count(lit(1)).as("processed"))
      .select(lit(f.name).as("projection_name"), col("stream_name"),
        col("value"), col("processed"), lit("finished").as("status"),
        lit(null).cast("string").as("last_error"))

  /** Run a runtime-registered ORDER-SENSITIVE SQL fold (see
    * [[OrderedSqlFold]]): per stream, collect events into an
    * order_id-sorted struct array and left-fold it with the Catalyst
    * `aggregate` HOF — one shuffle keyed by stream, sequential within
    * a stream (forced by non-commutativity), parallel across streams.
    * order_id leads the struct so array_sort's lexicographic order is
    * exactly replay order (order_ids are unique per stream). */
  def runOrderedSql(events: Dataset[Event], f: OrderedSqlFold): DataFrame = {
    events.toDF()
      .groupBy(col("stream_name"))
      .agg(
        array_sort(collect_list(struct(
          col("order_id"), col("event_time"), col("service_id"),
          col("local_id"), col("schema_version"), col("payload")))).as("evs"),
        count(lit(1)).as("processed"))
      .select(lit(f.name).as("projection_name"), col("stream_name"),
        expr(s"aggregate(evs, ${f.initCanonical}, (acc, x) -> ${f.stepCanonical})")
          .as("value"),
        col("processed"), lit("finished").as("status"),
        lit(null).cast("string").as("last_error"))
  }

  /** Commutative/mergeable folds get the fully-parallel path: a typed
    * Aggregator usable with groupByKey or as a registered UDAF — partial
    * (map-side) aggregation, no in-partition sort. This is the 100 TB
    * shape; SURVEY.md §7.4 documents the constraint vs. arbitrary folds. */
  def aggregator[S: Encoder](
      init: S, stepFn: (S, Event) => S, mergeFn: (S, S) => S): Aggregator[Event, S, S] =
    new Aggregator[Event, S, S] {
      override def zero: S = init
      override def reduce(b: S, a: Event): S = stepFn(b, a)
      override def merge(b1: S, b2: S): S = mergeFn(b1, b2)
      override def finish(r: S): S = r
      override def bufferEncoder: Encoder[S] = implicitly[Encoder[S]]
      override def outputEncoder: Encoder[S] = implicitly[Encoder[S]]
    }
}

/** The projection registry (reference streams.clj:276-286 register/
  * unregister + core.clj:102-107: defaults are protected from deletion;
  * re-registering an existing name replaces it and re-folds history —
  * observable as full reprocessing, test projections.clj:159-182).
  */
final class ProjectionCatalog {
  private val folds = mutable.LinkedHashMap.empty[String, NamedProjection]
  private val protectedNames = mutable.Set.empty[String]

  ProjectionCatalog.defaults.foreach { f => folds(f.name) = f; protectedNames += f.name }

  def register(f: NamedProjection): Unit = folds(f.name) = f // replace-if-exists
  def unregister(name: String): Boolean =
    if (protectedNames(name)) false
    else folds.remove(name).isDefined
  def get(name: String): Option[NamedProjection] = folds.get(name)
  def names: Seq[String] = folds.keys.toSeq
  def isProtected(name: String): Boolean = protectedNames(name)
}

object ProjectionCatalog {
  /** Built-ins mirroring default_projs.clj: `__streams__` (per-stream
    * totals, :8-26) and `__security-state__`-style latest-per-key
    * (:28-39). */
  def defaults: Seq[Fold[_]] = Seq(CountFold("__streams__"), LatestFold("__security-state__"))
}

/** `(fn [a b] (inc a))` — the count fold from the reference's tests
  * (projections.clj:71-78). */
final case class CountFold(name: String) extends Fold[Long] {
  override def initial: Long = 0L
  override def step(state: Long, e: Event): Long = state + 1
}

/** Latest event payload per local_id — the `__security-state__` keyed
  * upsert pattern (default_projs.clj:28-39): fold maintains
  * {key → latest payload}. */
final case class LatestFold(name: String) extends Fold[Map[String, String]] {
  override def initial: Map[String, String] = Map.empty
  override def step(state: Map[String, String], e: Event): Map[String, String] =
    state.updated(e.local_id, e.payload)
}

/** Sum of a numeric JSON payload field (commutative example). */
final case class SumFold(name: String, field: String) extends Fold[Double] {
  @transient private lazy val mapper =
    new com.fasterxml.jackson.databind.ObjectMapper()
  override def initial: Double = 0.0
  override def step(state: Double, e: Event): Double = {
    val v = mapper.readTree(e.payload).path(field)
    if (v.isNumber) state + v.asDouble() else state
  }
}
