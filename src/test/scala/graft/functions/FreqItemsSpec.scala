package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Misra-Gries sketch invariants — the guarantees the x_freq_items
  * two-pass design rests on. */
class FreqItemsSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def tokens = {
    import spark.implicits._
    spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(expr("filter(split(lower(text), ' +'), x -> x != '')"))
        .as("token"))
      .repartition(8) // force real partial-sketch merges
  }

  test("MG guarantee: heavy hitters always surface, estimates are lower bounds") {
    import spark.implicits._
    val exact = tokens.groupBy($"token").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum

    // k smaller than the vocabulary → evictions actually happen
    val k = 8
    assert(exact.size > k, "fixture must exceed k to exercise evictions")
    val cand = FreqItems.candidates(tokens.as[String], k)
    assert(cand.size <= k)
    // every item with true count > N/(k+1) is present
    val bound = n / (k + 1)
    exact.foreach { case (t, c) =>
      if (c > bound) assert(cand.contains(t), s"heavy hitter $t (count $c > $bound) evicted")
    }
    // kept counters never overcount
    cand.foreach { case (t, est) =>
      assert(est <= exact.getOrElse(t, 0L), s"$t overcounted: $est > ${exact.get(t)}")
    }

    // k >= vocabulary → no eviction ever → sketch counts are exact
    val full = FreqItems.candidates(tokens.as[String], exact.size + 10)
    assert(full == exact)
  }

  test("x_freq_items under forced evictions: exact top-10 in both margin regimes") {
    import spark.implicits._
    def run(name: String, docs: Seq[(Long, String)]): Unit = {
      val dir = tmpDir(name)
      docs.toDF("doc_id", "text").write.mode("overwrite")
        .parquet(s"$dir/documents.parquet")
      val out = graft.SparkEntry.queries("x_freq_items")(spark, dir)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val exact = docs.flatMap(_._2.split(" +").filter(_.nonEmpty).map(_.toLowerCase))
        .groupBy(identity).view.mapValues(_.size.toLong).toSeq
        .sortBy { case (t, n) => (-n, t) }.take(10)
      assert(out == exact, name)
    }
    def doc(word: String, reps: Int) = Seq.fill(reps)(word).mkString(" ")

    // 300 distinct tokens >> k=64 → Misra-Gries evictions fire in both
    // fixtures. Heavy head: c10 = 410 > N/65 → the margin holds and the
    // sketch path is provably exact.
    run("fi_heavy",
      (0 until 10).map(i => (i.toLong, doc(f"head$i%02d", 500 - 10 * i))) ++
        (0 until 290).map(i => (100L + i, doc(f"tail$i%03d", 3))))
    // Flat corpus: every token count 3 → c10 = 3 <= N/65 → the guard
    // must detect the failed margin and fall back to the exact
    // vocabulary aggregate (a silent sketch answer could differ here).
    run("fi_flat",
      (0 until 300).map(i => (i.toLong, doc(f"tok$i%03d", 3))))
  }

  test("x_freq_items: sketch+rescore output equals the exact top-10") {
    import spark.implicits._
    val out = graft.SparkEntry.queries("x_freq_items")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val exact = tokens.groupBy($"token").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (t, n) => (-n, t) }.take(10)
    assert(out.toSeq == exact.toSeq)
  }
}
