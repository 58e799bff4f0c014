package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Dataset invariants the optimized query plans are LOAD-BEARING on
  * (ADVICE r19): the r19 rewrites of x_rare_token_docs and
  * x_dup_gram_mass use min/max(doc_id) as owner identity and join the
  * doc frame without deduping doc_id — correct only while doc_id is
  * unique per row in documents. The DuckDB oracle hash-match would
  * catch a violation indirectly; this spec names the assumption so a
  * future testdata regeneration that violates it fails LOUDLY here,
  * not as an opaque hash mismatch. */
class DataInvariantSpec extends AnyFunSuite with SparkTestBase {

  test("documents.doc_id is unique per row at every shipped SF") {
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val path = s"/root/testdata/$sf/documents.parquet"
      if (new java.io.File(path).exists) {
        val df = spark.read.parquet(path)
        val n = df.count()
        val d = df.select("doc_id").distinct().count()
        assert(n == d,
          s"$sf: documents has $n rows but only $d distinct doc_id — " +
            "the min/max-owner-identity plans double-count under duplicates")
      }
    }
  }
}
