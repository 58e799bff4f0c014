package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The persisted band-bucket index: incremental dedup must equal the
  * batch self-join restricted to cross pairs — new batches never
  * rescan or re-sign the corpus. */
class MinHashIndexSpec extends AnyFunSuite with SparkTestBase {

  private def toks(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_id"),
      expr("filter(split(lower(text), ' +'), x -> x != '')").as("toks"))

  private def corpus() = {
    import spark.implicits._
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .where($"doc_id" < 300).select($"doc_id", $"text")
  }

  test("dedupAgainstIndex equals the self-join's cross pairs; appends extend the index") {
    import spark.implicits._
    val a = corpus()
    // the new batch: two near-copies of corpus docs (ids shifted to a
    // fresh range) plus one unrelated doc
    val copies = a.where($"doc_id".isin(7L, 11L))
      .select(($"doc_id" + 100000L).as("doc_id"), $"text")
    val fresh = Seq((200001L, "completely unrelated words nothing shared here at all with anything"))
      .toDF("doc_id", "text")
    val b = copies.unionAll(fresh)

    val dir = tmpDir("mhindex")
    MinHashDedup.saveIndex(toks(a), "doc_id", "toks", s"$dir/idx")

    val inc = MinHashDedup.dedupAgainstIndex(
      toks(b), "doc_id", "toks", s"$dir/idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    // ground truth: the batch self-join over A ∪ B, cross pairs only
    val full = MinHashDedup.nearDuplicates(
      toks(a.unionAll(b)), "doc_id", "toks")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter { case (x, y, _) => (x < 100000L) != (y < 100000L) }
      .map { case (x, y, j) => if (x >= 100000L) (x, y, j) else (y, x, j) }
      .toSet
    assert(inc == full, s"inc=$inc full=$full")
    // the exact copies must be found with jac 10000
    assert(inc.contains((100007L, 7L, 10000L)) &&
      inc.contains((100011L, 11L, 10000L)), inc.toString)
    assert(!inc.exists(_._1 == 200001L), "unrelated doc matched")

    // append B; a later batch C (copy of a B doc) must match against it
    MinHashDedup.saveIndex(toks(b), "doc_id", "toks", s"$dir/idx", append = true)
    val c = Seq((300001L, b.where($"doc_id" === 100007L)
      .collect()(0).getString(1))).toDF("doc_id", "text")
    val incC = MinHashDedup.dedupAgainstIndex(
      toks(c), "doc_id", "toks", s"$dir/idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(incC.contains((300001L, 7L, 10000L)) &&
      incC.contains((300001L, 100007L, 10000L)), incC.toString)
  }
}
