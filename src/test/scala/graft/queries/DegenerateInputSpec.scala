package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestBase}

/** Constructed-degenerate-corpus pins for every moment-ratio query (the
  * round-7 x_heaps_fit lesson): a closed vocabulary / constant series is
  * LEGAL input, and on it every raw slope/r2/correlation is 0/0
  * cancellation noise that DuckDB evaluates with RUN-VARYING results —
  * so each query carries an integer-exact degeneracy guard, and each
  * guard is pinned here on a corpus built to trip it. The non-degenerate
  * control rows in the same corpus prove the guard doesn't over-fire. */
class DegenerateInputSpec extends AnyFunSuite with SparkTestBase {

  test("x_heaps_fit: saturated closed vocabulary => beta 0.0, r2 1.0, flagged") {
    import spark.implicits._
    val dir = tmpDir("heapsdegen")
    // 40 docs over a TWO-word closed vocabulary: both types are seen by
    // doc 1, so n_types is constant (=2) at every ladder step
    (1L to 40L).map(i => (i, "aa bb aa", "en", "s0", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("x_heaps_fit")(spark, dir).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getLong(2) == 2L, s"n_types: $r")
      assert(r.getDouble(3) == 0.0 &&
        !(1.0 / r.getDouble(3)).isNegInfinity, s"beta not +0.0: $r")
      assert(r.getDouble(4) == 1.0, s"r2: $r")
      assert(r.getBoolean(5), s"saturated flag: $r")
    }
    // determinism across runs — the precise failure mode was run-varying
    val a = SparkEntry.queries("x_heaps_fit")(spark, dir).collect().map(_.toString)
    val b = SparkEntry.queries("x_heaps_fit")(spark, dir).collect().map(_.toString)
    assert(a.sameElements(b))
  }

  test("x_heaps_fit: growing vocabulary keeps the live regression branch") {
    import spark.implicits._
    val dir = tmpDir("heapslive")
    // doc i introduces a fresh type w<i> alongside the common filler, so
    // n_types strictly grows with every ladder step
    (1L to 40L).map(i => (i, s"w$i aa", "en", "s0", 6L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("x_heaps_fit")(spark, dir).collect()
    assert(rows.length == 10)
    assert(rows.map(_.getLong(2)).distinct.length > 1, "n_types must vary")
    rows.foreach { r =>
      assert(r.getDouble(3) > 0.0, s"beta must be positive on growth: $r")
      assert(r.getDouble(4) > 0.9, s"near-linear growth, r2: $r")
      assert(!r.getBoolean(5), s"saturated flag must be off: $r")
    }
  }

  test("x_zipf_slope: all-tied counts => slope 0.0, intercept ln(n), r2 1.0; varying lang unaffected") {
    import spark.implicits._
    val dir = tmpDir("zipfdegen")
    // lang "xx": every type occurs exactly 3 times (constant y).
    // lang "en": zipf-ish varying counts (control).
    val tied = (1L to 10L).map(i => (i, s"t$i t$i t$i", "xx", "s0", 11L))
    val varied = (11L to 20L).map(i =>
      (i, ("common " * (21 - i).toInt).trim + s" rare$i", "en", "s0", 20L))
    (tied ++ varied).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("x_zipf_slope")(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val xx = out("xx")
    assert(xx.getDouble(2) == 0.0 &&
      !(1.0 / xx.getDouble(2)).isNegInfinity, s"slope not +0.0: $xx")
    assert(xx.getDouble(3) == math.BigDecimal(math.log(3.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble, s"intercept: $xx")
    assert(xx.getDouble(4) == 1.0, s"r2: $xx")
    val en = out("en")
    assert(en.getDouble(2) < 0.0, s"control slope must stay negative: $en")
  }

  test("x_hill_tail: fully-tied tail is dropped; real tail kept") {
    import spark.implicits._
    val ts0 = Timestamp.valueOf("2026-01-01 00:00:00")
    val dir = tmpDir("hilldegen")
    // "flat": 250 events all value=5.0 -> top-201 all tie -> alpha = 1/0,
    // must be DROPPED. "pareto": 250 events with a genuine tail -> kept.
    val flat = (1L to 250L).map(i => (i, ts0, i % 7, "flat", 5.0, "{}"))
    val pareto = (251L to 500L).map(i =>
      (i, ts0, i % 7, "pareto", 1.0 / (1.0 - (i - 250L).toDouble / 251.0), "{}"))
    (flat ++ pareto)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = SparkEntry.queries("x_hill_tail")(spark, dir).collect()
    val types = rows.map(_.getString(0)).toSet
    assert(!types.contains("flat"), s"tied tail must be dropped: ${rows.mkString}")
    assert(types.contains("pareto"), s"real tail must survive: ${rows.mkString}")
    assert(rows.forall(r => !r.isNullAt(2) && !r.getDouble(2).isInfinite))
  }

  test("x_autocorr: constant daily series => exact-integer guard yields 0 bp") {
    import spark.implicits._
    val dir = tmpDir("acdegen")
    // 20 days x exactly 3 events/day: variance term m*saa - sa*sa is an
    // EXACT integer 0, so the guard must fire (never a noisy ratio)
    val rows = for { d <- 0L until 20L; k <- 0L until 3L } yield
      (d * 3 + k, new Timestamp(86400000L * d + k), d % 5, "steady", 1.0, "{}")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("x_autocorr")(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getLong(3) == 0L, s"constant series bp: $r"))
  }
}
