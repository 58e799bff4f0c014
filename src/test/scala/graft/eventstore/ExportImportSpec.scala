package graft.eventstore

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Mirrors export_test.clj:50-58: export line count == cold replay count,
  * payload fidelity through the roundtrip, find-name dedup. */
class ExportImportSpec extends AnyFunSuite with SparkTestBase {

  private val T0 = 1700000000000L

  test("export → import roundtrip preserves count and payloads under a fresh name") {
    import spark.implicits._
    val log = tmpDir("eilog")
    Ingest.ingest(rawEvents(25), log, T0)
    val df = Replay.open(spark, log)
    val exp = tmpDir("eiexp")

    ExportImport.exportStream(df, "s1", exp)
    val name = ExportImport.importStream(spark, exp, log, "s1", T0 + 60000)
    assert(name == "s1-1") // s1 exists → find-name dedup (api.clj:158-166)

    val re = Replay.open(spark, log)
    val orig = Replay.cold(re, "s1").select("payload").as[String].collect().sorted
    val imported = Replay.cold(re, name).select("payload").as[String].collect().sorted
    assert(imported.length == 13) // ceil(25/2) events on s1
    assert(imported.sameElements(orig))
    // imported events are re-stamped, not copies
    val maxOrig = Replay.cold(re, "s1").agg(org.apache.spark.sql.functions.max("order_id"))
      .as[Long].head()
    val minImp = Replay.cold(re, name).agg(org.apache.spark.sql.functions.min("order_id"))
      .as[Long].head()
    assert(minImp > maxOrig)
  }

  test("findName skips every taken suffix") {
    assert(ExportImport.findName(Set(), "s") == "s")
    assert(ExportImport.findName(Set("s"), "s") == "s-1")
    assert(ExportImport.findName(Set("s", "s-1", "s-2"), "s") == "s-3")
  }
}
