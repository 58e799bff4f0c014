package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) tokenizer induction — the full
  * greedy merge loop x_bpe_pairs only takes the first step of
  * (Sennrich et al. 2016; no reference-engine counterpart — the
  * reference has no tokenizer surface).
  *
  * Deviation from the paper, stated up front: words are NOT suffixed
  * with the end-of-word marker (`</w>`), so merges conflate
  * word-internal and word-final contexts (e.g. the "es" in "есть" vs
  * "goes" count as the same pair). The marker only matters when the
  * detokenizer must reconstruct word boundaries; the queries built on
  * this trainer (x_bpe_train / x_bpe_fertility) consume whitespace
  * pre-tokenized words where boundaries are already explicit, so the
  * simplification changes merge ORDER only in corpora where final and
  * internal contexts genuinely diverge — BpeTrainerSpec pins the merge
  * order this no-marker variant produces.
  *
  * Vocabulary-first, like every tokenizer read in this repo: training
  * state is the (word, count) table — Heaps-sublinear in the corpus —
  * never the token stream, so a merge step costs O(vocab × word length)
  * regardless of corpus size. Each step is
  *   1. one distributed pair-count aggregate over adjacent symbol pairs
  *      (map-side combined, weighted by word count),
  *   2. a TakeOrdered(1) for the argmax pair — (count DESC, left ASC,
  *      right ASC) total order, so training is deterministic on any
  *      cluster/partitioning,
  *   3. a narrow per-row merge pass rewriting symbol arrays.
  * The driver holds ONE (pair, count) row per step plus the merge
  * table — never the vocabulary. The loop materializes each generation
  * (localCheckpoint) so step N's lineage does not replay steps 1..N-1.
  *
  * Stopping: after `steps` merges or when no pair occurs twice
  * (weighted), whichever comes first — the classic termination rule.
  *
  * Two regimes, like KCore/ConnectedComponents: the vocabulary is
  * Heaps-sublinear, so at bench scale it is a handful of rows and the
  * 10-step distributed loop would be ~20 Spark jobs of pure scheduling
  * overhead. `train` size-probes the vocabulary (one bounded collect);
  * at or under `driverLimit` words the identical greedy loop runs
  * driver-local (same argmax total order, same applyMerge — spec pins
  * regime equality), above it the distributed loop runs. A 100 TB
  * English corpus has a ~10M+ word vocabulary → distributed path.
  */
object BpeTrainer {

  /** Vocabulary rows at or under which training runs driver-local
    * (≈256k words × ~10 chars ≈ a few MB on the driver). */
  val DriverVocabLimit: Int = 1 << 18

  final case class Merge(step: Int, left: String, right: String, count: Long)

  /** One merge application: replace every non-overlapping left-to-right
    * occurrence of (l, r) adjacent symbols with l+r. Pure function on a
    * word's symbol array (exposed for the spec). */
  def applyMerge(syms: Seq[String], l: String, r: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += l + r
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toSeq
  }

  /** BPE ENCODE: segment a word with a trained merge table — the
    * serving side. Standard BPE applies learned merges in training
    * order, which is exactly a fold of applyMerge over the table (pure
    * per-word function: broadcast the ≤`steps`-entry table and encode
    * anywhere, no driver involvement). */
  def encode(word: String, merges: Seq[Merge]): Seq[String] =
    merges.foldLeft(word.map(_.toString): Seq[String]) { (syms, m) =>
      applyMerge(syms, m.left, m.right)
    }

  /** Train `steps` merges over a (word, n) vocabulary table.
    * Returns the ordered merge table and the final per-word
    * segmentation (word, n, symbols). `driverLimit` picks the regime
    * (see object scaladoc); pass 0 to force the distributed loop. */
  def train(vocab: DataFrame, steps: Int,
            driverLimit: Int = DriverVocabLimit): (Seq[Merge], DataFrame) = {
    val spark = vocab.sparkSession
    import spark.implicits._
    require(steps >= 0)

    val typed = vocab.select(col("word").cast("string"), col("n").cast("long"))
    if (driverLimit > 0) {
      // Size probe doubling as the collect: one bounded fetch of at most
      // driverLimit+1 rows decides the regime AND supplies the local input.
      val probe = typed.limit(driverLimit + 1).as[(String, Long)].collect()
      if (probe.length <= driverLimit) {
        val (merges, segs) = localTrain(probe, steps)
        return (merges,
          spark.createDataset(segs.toIndexedSeq).toDF("word", "n", "symbols"))
      }
    }
    trainDistributed(typed.as[(String, Long)], steps)
  }

  /** The identical greedy loop run on the driver: pair counts weighted
    * by word frequency, (count DESC, left ASC, right ASC) argmax, stop
    * when no pair occurs twice. */
  private def localTrain(words: Array[(String, Long)], steps: Int)
      : (Seq[Merge], Array[(String, Long, Seq[String])]) = {
    var state = words.map { case (w, n) => (w, n, w.map(_.toString): Seq[String]) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var step = 1
    var done = false
    while (step <= steps && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      state.foreach { case (_, n, syms) =>
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + n)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), c) = counts.minBy { case ((pl, pr), pc) => (-pc, pl, pr) }
        if (c < 2) done = true
        else {
          merges += Merge(step, l, r, c)
          state = state.map { case (w, n, syms) => (w, n, applyMerge(syms, l, r)) }
          step += 1
        }
      }
    }
    (merges.toSeq, state)
  }

  private def trainDistributed(words: Dataset[(String, Long)], steps: Int)
      : (Seq[Merge], DataFrame) = {
    val spark = words.sparkSession
    import spark.implicits._

    var state: Dataset[(String, Long, Seq[String])] = words
      .map { case (w, n) => (w, n, w.map(_.toString): Seq[String]) }
      .localCheckpoint(eager = true)

    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var step = 1
    var done = false
    while (step <= steps && !done) {
      // adjacent-pair counts, weighted by word frequency
      val top = state.flatMap { case (_, n, syms) =>
        if (syms.length < 2) Iterator.empty
        else syms.iterator.zip(syms.iterator.drop(1)).map { case (a, b) => ((a, b), n) }
      }.groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
        .map { case ((l, r), c) => (l, r, c) }
        .toDF("l", "r", "c")
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(1)
        .collect()
      if (top.isEmpty || top(0).getLong(2) < 2) done = true
      else {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(step, l, r, c)
        val next = state
          .map { case (w, n, syms) => (w, n, applyMerge(syms, l, r)) }
          .localCheckpoint(eager = true)
        // unpersist alone does NOT free a localCheckpoint's blocks —
        // release the superseded step's checkpoint explicitly or every
        // merge step strands one block (the CheckpointHygiene lesson)
        state.unpersist()
        CheckpointHygiene.release(state)
        state = next
        step += 1
      }
    }
    (merges.toSeq, state.toDF("word", "n", "symbols"))
  }
}
