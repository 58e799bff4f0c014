package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The persisted exact-digest index: batch probes must find exactly the
  * verbatim-text matches with min-id keeper semantics, appends must
  * extend membership, and corpus text must never be needed at probe
  * time (the index IS the digests). */
class ExactDedupSpec extends AnyFunSuite with SparkTestBase {

  test("probe finds verbatim matches with min-id keeper; misses stay clean") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox"),
      (2L, "jumps over the lazy dog"),
      (5L, "the quick brown fox"), // duplicate text, higher id → not keeper
      (9L, "entirely different text")).toDF("doc_id", "text")
    val batch = Seq(
      (101L, "the quick brown fox"),      // dup of keeper 1
      (102L, "jumps over the lazy dog"),  // dup of keeper 2
      (103L, "never seen before")).toDF("doc_id", "text")

    val dir = tmpDir("exactidx")
    ExactDedup.saveIndex(corpus, "doc_id", "text", s"$dir/idx")
    val got = ExactDedup
      .dedupAgainstIndex(batch, "doc_id", "text", s"$dir/idx")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((101L, 1L), (102L, 2L)))
  }

  test("append extends membership; duplicate digests across appends keep the min keeper") {
    import spark.implicits._
    val first = Seq((1L, "alpha beta"), (2L, "gamma delta")).toDF("doc_id", "text")
    val second = Seq((10L, "epsilon zeta"), (11L, "alpha beta")).toDF("doc_id", "text")
    val dir = tmpDir("exactappend")
    ExactDedup.saveIndex(first, "doc_id", "text", s"$dir/idx")
    ExactDedup.saveIndex(second, "doc_id", "text", s"$dir/idx", append = true)
    val batch = Seq((100L, "alpha beta"), (101L, "epsilon zeta")).toDF("doc_id", "text")
    val got = ExactDedup
      .dedupAgainstIndex(batch, "doc_id", "text", s"$dir/idx")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // "alpha beta" exists in both appends (keepers 1 and 11) → min wins
    assert(got === Set((100L, 1L), (101L, 10L)))
  }

  test("index stores digests only — no text column on disk") {
    import spark.implicits._
    val corpus = Seq((1L, "some document body")).toDF("doc_id", "text")
    val dir = tmpDir("exactschema")
    ExactDedup.saveIndex(corpus, "doc_id", "text", s"$dir/idx")
    val schema = spark.read.parquet(s"$dir/idx").schema
    assert(schema.fieldNames.toSet === Set("digest", "keeper_id"))
  }

  test("x_dedup_incremental nonzero path on a constructed cross-split duplicate") {
    import spark.implicits._
    // ids chosen so % 10 splits corpus (1, 2) from batch (10, 20);
    // text of 10 duplicates corpus doc 1
    val docs = Seq(
      (1L, "en", "shared text body"),
      (2L, "fr", "corpus only text"),
      (10L, "en", "shared text body"),
      (20L, "fr", "batch only text")).toDF("doc_id", "lang", "text")
    val dir = tmpDir("exactquery")
    val corpus = docs.where($"doc_id" % 10 =!= 0)
    val batch = docs.where($"doc_id" % 10 === 0)
    ExactDedup.saveIndex(corpus, "doc_id", "text", s"$dir/idx")
    val hits = ExactDedup.dedupAgainstIndex(batch, "doc_id", "text", s"$dir/idx")
    val report = batch.select($"doc_id".as("new_id"), $"lang")
      .join(hits.select($"new_id", lit(1).as("hit")), Seq("new_id"), "left")
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_batch"),
        sum(coalesce($"hit", lit(0))).cast("long").as("n_dup"))
      .orderBy($"lang")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(report === Seq(("en", 1L, 1L), ("fr", 1L, 0L)))
  }
}
