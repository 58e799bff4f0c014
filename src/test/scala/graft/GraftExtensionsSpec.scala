package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.eventstore.{Ingest, Replay}
import graft.sources.EventSource

class GraftExtensionsSpec extends AnyFunSuite with SparkTestBase {

  test("GraftExtensions installs the native functions as SQL functions") {
    // fresh session (shared SparkContext) built WITH the extensions
    val ctx = spark.sparkContext
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val withExt = SparkSession.builder()
      .master(ctx.master)
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val row = withExt.sql(
        """SELECT simhash64(array('a','b')) AS s,
                  vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
                  size(shingle_hashes(array('a','b','c','d'), 3)) AS n,
                  size(minhash_sig(array(1L, 2L, 3L), 32)) AS m,
                  poly_hash('abc') AS p,
                  ws_token_count(' a  b c ') AS w,
                  stop_token_count('The cat is ON a mat') AS st,
                  ngram_top_count(array('a','b','a','b','c'), 2) AS tc""")
        .collect().head
      assert(row.getDouble(1) == 11.0)
      assert(row.getInt(2) == 2)
      assert(row.getInt(3) == 32)
      // ((0*31+97)*31+98)*31+99 = 97*961 + 98*31 + 99
      assert(row.getLong(4) == (97L * 961 + 98 * 31 + 99))
      assert(row.getLong(5) == 3L)
      assert(row.getLong(6) == 3L) // the, is, a
      assert(row.getLong(7) == 2L) // "a b" occurs twice
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("event source/sink: parquet, json and csv roundtrip the same events") {
    val log = tmpDir("srclog")
    Ingest.ingest(rawEvents(30), log, 1700000000000L)
    val events = Replay.typed(spark, log).toDF()
    val n = events.count()

    Seq("json", "csv").foreach { fmt =>
      val out = tmpDir(s"src$fmt")
      EventSource.write(events, fmt, out)
      val back = EventSource.read(spark, fmt, out)
      assert(back.count() == n, fmt)
      val a = events.select("stream_name", "order_id", "payload")
        .collect().map(_.toString).sorted
      val b = back.select("stream_name", "order_id", "payload")
        .collect().map(_.toString).sorted
      assert(a.sameElements(b), fmt)
    }

    val out = tmpDir("srcparquet")
    EventSource.write(events, "parquet", out)
    assert(EventSource.read(spark, "parquet", out).count() == n)
    intercept[IllegalArgumentException](EventSource.read(spark, "xml", "/tmp/x"))
  }
}
