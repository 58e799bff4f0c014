package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** BPE induction pinned to the published algorithm (Sennrich et al.
  * 2016): greedy argmax over weighted adjacent-pair counts, merge,
  * repeat. The classic worked corpus has a known merge sequence, so the
  * trainer is testable against the literature, not against itself. */
class BpeTrainerSpec extends AnyFunSuite with SparkTestBase {

  private def sennrichVocab() = {
    import spark.implicits._
    Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("word", "n")
  }

  test("applyMerge rewrites non-overlapping occurrences left to right") {
    assert(BpeTrainer.applyMerge(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(BpeTrainer.applyMerge(Seq("l", "o", "w"), "l", "o") == Seq("lo", "w"))
    assert(BpeTrainer.applyMerge(Seq("x"), "a", "b") == Seq("x"))
    assert(BpeTrainer.applyMerge(Nil, "a", "b") == Nil)
  }

  test("the Sennrich corpus trains the published first merges") {
    val (merges, segs) = BpeTrainer.train(sennrichVocab(), steps = 4)
    // pair counts: (e,s)=9 (newest 6 + widest 3) is the unique argmax;
    // then (es,t)=9; then (est,.)... with no </w> marker the next
    // argmax is (l,o)=7 (low 5 + lower 2), then (lo,w)=7.
    val asTuples = merges.map(m => (m.left, m.right, m.count))
    assert(asTuples.take(4) == Seq(
      ("e", "s", 9L), ("es", "t", 9L), ("l", "o", 7L), ("lo", "w", 7L)),
      merges.toString)
    // final segmentation: "newest" = [n, e, w, est]
    val newest = segs.where(segs("word") === "newest")
      .collect()(0).getSeq[String](2)
    assert(newest == Seq("n", "e", "w", "est"), newest.toString)
  }

  test("merge counts are non-increasing and training is deterministic") {
    val (a, _) = BpeTrainer.train(sennrichVocab(), steps = 8)
    val (b, _) = BpeTrainer.train(sennrichVocab(), steps = 8)
    assert(a == b)
    // greedy argmax: each step's count can't exceed the previous step's
    a.sliding(2).foreach {
      case Seq(x, y) => assert(y.count <= x.count, a.toString)
      case _ =>
    }
    // every merge must have fired at least twice (the stop rule)
    assert(a.forall(_.count >= 2))
  }

  test("driver-local and distributed regimes train identical merge tables") {
    // default driverLimit routes this tiny vocab to the local loop;
    // driverLimit = 0 forces the distributed loop — results must match
    // merge-for-merge and segmentation-for-segmentation.
    val (local, lsegs) = BpeTrainer.train(sennrichVocab(), steps = 8)
    val (dist, dsegs) = BpeTrainer.train(sennrichVocab(), steps = 8, driverLimit = 0)
    assert(local == dist, s"local=$local dist=$dist")
    val l = lsegs.collect().map(r => (r.getString(0), r.getLong(1), r.getSeq[String](2))).sortBy(_._1)
    val d = dsegs.collect().map(r => (r.getString(0), r.getLong(1), r.getSeq[String](2))).sortBy(_._1)
    assert(l.toSeq == d.toSeq)
  }

  test("distributed training strands no checkpoint blocks once the state is released") {
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    val (merges, state) = BpeTrainer.train(sennrichVocab(), steps = 8, driverLimit = 0)
    assert(merges.nonEmpty)
    // intermediate steps release inline; the FINAL state is the
    // caller's to free (the MiningOps call sites release it when they
    // only need the merge table)
    CheckpointHygiene.release(state)
    val deadline = System.nanoTime + 10L * 1000 * 1000 * 1000
    while (spark.sparkContext.getPersistentRDDs.nonEmpty &&
        System.nanoTime < deadline) Thread.sleep(50)
    val leaked = spark.sparkContext.getPersistentRDDs
    assert(leaked.isEmpty,
      s"stranded ${leaked.size} RDDs: " +
        leaked.values.map(r => s"${r.id}:${r.name}").mkString(", "))
  }

  test("training stops when no pair repeats") {
    import spark.implicits._
    val tiny = Seq(("ab", 1L), ("cd", 1L)).toDF("word", "n")
    val (merges, _) = BpeTrainer.train(tiny, steps = 5)
    assert(merges.isEmpty, merges.toString)
  }

  test("encode folds the merge table exactly like training segmentation") {
    val (merges, segs) = BpeTrainer.train(sennrichVocab(), steps = 4)
    // serving-side encode must reproduce the training-side segmentation
    segs.collect().foreach { r =>
      val w = r.getString(0)
      assert(BpeTrainer.encode(w, merges) == r.getSeq[String](2), w)
    }
    // no merges = character segmentation
    assert(BpeTrainer.encode("low", Nil) == Seq("l", "o", "w"))
    // an unseen word still encodes with whatever merges apply
    assert(BpeTrainer.encode("lowest", merges) == Seq("low", "est"))
  }

  test("x_bpe_fertility: bounded ratios, trained merges strictly compress") {
    val rows = graft.SparkEntry.queries("x_bpe_fertility")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (syms, chars) = (r.getLong(3), r.getLong(4))
      // at least one symbol per word; merges never split below 1
      assert(syms >= 10000, r.toString)
      // each symbol holds at least one char, and >1 on average once
      // any merge fired (10 merges over this corpus always fire)
      assert(chars > 10000, r.toString)
    }
  }
}
