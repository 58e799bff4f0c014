package graft.eventstore

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Statistical JSON-payload schema inference per (stream, schema_version)
  * — the reference's `__streams__` projection folds each event's payload
  * into an inferred schema via clj-schema-inspector, fully for the first
  * 10 events of a version and with 2% sampling afterwards
  * (default_projs.clj:8-26, sampling rule line 19). Inferred schemas
  * record per-field type / required-mode / count
  * (test schema_test.clj:41-71).
  *
  * Spark shape: a typed Aggregator (commutative, mergeable — partial
  * aggregation works) whose buffer is {field → (type, count)} plus an
  * exact processed count. The 2% Bernoulli draw is a DETERMINISTIC
  * payload hash (the reference uses `rand`; SURVEY.md §4.2 calls out the
  * replacement); the first-10 head rule is per partial buffer, so
  * repartitioning can over-sample the head (never under-sample — each
  * group always has ≥ FullInferenceHead samples when big enough), and
  * the inferred field set/types are partition-independent for payloads
  * caught by the hash rule.
  */
object SchemaInfer {

  final case class FieldStat(ftype: String, count: Long)
  final case class Buf(processed: Long, sampled: Long, fields: Map[String, FieldStat])
  final case class InferredField(
      stream_name: String, schema_version: String, field: String,
      ftype: String, count: Long, total: Long, sampled: Long, required: Boolean)

  private val FullInferenceHead = 10
  private val SamplePercent = 2

  @transient private lazy val mapper = new ObjectMapper()

  private def typeName(n: JsonNode): String =
    if (n.isTextual) "string"
    else if (n.isIntegralNumber) "integer"
    else if (n.isNumber) "double"
    else if (n.isBoolean) "boolean"
    else if (n.isArray) "array"
    else if (n.isObject) "object"
    else "null"

  /** Flatten one payload into field → type (nested fields dotted). */
  private[eventstore] def fieldsOf(payload: String): Map[String, String] = {
    def walk(prefix: String, n: JsonNode): Iterator[(String, String)] =
      if (n.isObject)
        n.properties().asScala.iterator.flatMap { e =>
          val p = if (prefix.isEmpty) e.getKey else s"$prefix.${e.getKey}"
          if (e.getValue.isObject) walk(p, e.getValue)
          else Iterator(p -> typeName(e.getValue))
        }
      else Iterator.empty
    try walk("", mapper.readTree(payload)).toMap
    catch { case _: Exception => Map.empty }
  }

  /** Deterministic 2% Bernoulli draw from the payload bytes. */
  private def sampled(payload: String): Boolean =
    math.floorMod(scala.util.hashing.MurmurHash3.stringHash(payload), 100) < SamplePercent

  /** Order-independent type resolution: a commutative/associative join
    * on a widening lattice, so the inferred type cannot depend on
    * partitioning or partial-merge order (a first-seen rule flickers
    * run-to-run for mixed-type fields). `null` is the bottom (a JSON
    * null carries no type evidence); integer widens to double; any other
    * disagreement is reported as `mixed` (the top). */
  private[eventstore] def widen(a: String, b: String): String =
    if (a == b) a
    else if (a == "null") b
    else if (b == "null") a
    else if ((a == "integer" && b == "double") || (a == "double" && b == "integer")) "double"
    else "mixed"

  /** One payload into the buffer (shared by the typed Aggregator and
    * the catalyst InferSchemaAgg). */
  def reduceBuf(b: Buf, payload: String): Buf = {
    val take = b.sampled < FullInferenceHead || sampled(payload)
    if (!take) b.copy(processed = b.processed + 1)
    else {
      val merged = fieldsOf(payload).foldLeft(b.fields) { case (m, (f, t)) =>
        val prev = m.getOrElse(f, FieldStat(t, 0L))
        m.updated(f, FieldStat(widen(prev.ftype, t), prev.count + 1))
      }
      Buf(b.processed + 1, b.sampled + 1, merged)
    }
  }

  def mergeBuf(a: Buf, b: Buf): Buf = Buf(
    a.processed + b.processed,
    a.sampled + b.sampled,
    b.fields.foldLeft(a.fields) { case (m, (f, s)) =>
      val prev = m.getOrElse(f, FieldStat(s.ftype, 0L))
      m.updated(f, FieldStat(widen(prev.ftype, s.ftype), prev.count + s.count))
    })

  val agg: Aggregator[String, Buf, Buf] = new Aggregator[String, Buf, Buf] {
    override def zero: Buf = Buf(0L, 0L, Map.empty)
    override def reduce(b: Buf, payload: String): Buf = reduceBuf(b, payload)
    override def merge(a: Buf, b: Buf): Buf = mergeBuf(a, b)
    override def finish(r: Buf): Buf = r
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Buf] = Encoders.product[Buf]
  }

  /** Infer per (stream, schema_version); `required` = seen in every
    * sampled event of that version (schema_test.clj mode semantics). */
  def infer(spark: SparkSession, events: Dataset[Event]): Dataset[InferredField] = {
    import spark.implicits._
    events
      .groupByKey(e => (e.stream_name, Option(e.schema_version).getOrElse("")))
      .mapValues(_.payload)
      .agg(agg.toColumn.name("buf"))
      .flatMap { case ((stream, ver), buf) =>
        buf.fields.toSeq.sortBy(_._1).map { case (f, st) =>
          InferredField(stream, ver, f, st.ftype, st.count, buf.processed,
            buf.sampled, st.count == buf.sampled)
        }
      }
  }

  /** Tabular view for the schema-query API (handler.clj:256-263). */
  def inferDf(spark: SparkSession, events: Dataset[Event]): DataFrame =
    infer(spark, events).toDF()
      .orderBy("stream_name", "schema_version", "field")
}
