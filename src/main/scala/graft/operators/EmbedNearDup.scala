package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-cosine near-duplicate pairs via banded hyperplane-LSH
  * candidate generation + exact cosine verification — the bucketed
  * replacement for the all-pairs `a_id < b_id` theta join (which
  * materializes O(n²) rows before its filter; the one plan that dies at
  * 100× scale).
  *
  * Pipeline (same verified-output contract as MinHashDedup/SimHashDedup):
  *   vector → `bands` r-bit sign signatures (one kernel pass,
  *   graft.functions.Hyperplanes) → explode (band, key) postings
  *   → ONE shuffle keyed by (band, key) → per-bucket self-join
  *   → dropDuplicates(pair) → exact cosine ≥ threshold.
  *
  * The exact-verify stage computes cosine with the identical vec_dot
  * left fold the brute-force definition uses, so any pair that survives
  * has a bit-identical score — candidate generation changes WHICH pairs
  * are examined, never their values. A pair at angle θ shares some band
  * with probability 1-(1-p^r)^bands, p = 1-θ/π.
  *
  * Parameter calibration (measured on the driver testdata, dim=64):
  * threshold 0.45 → θ≈63°, p≈0.648 — near LSH's no-gain regime, so full
  * recall needs r=3, bands=32 (every true pair at sf0.001/0.01/0.1
  * collides in ≥3 bands; pinned by VectorOpsSpec's dual-run against
  * brute force). At that operating point candidates ≈ 95-98% of all
  * pairs — the win on THIS corpus is the plan shape, not volume: no
  * O(n²) row materialization, shuffles keyed by (band, key) and pair id,
  * all joins equi-joins AQE can re-plan. At realistic near-dup
  * thresholds (cos ≥ 0.8, p ≥ 0.80) the same operator prunes hard:
  * p^r=0.51, per-bucket volume collapses, and bands can drop to 16.
  */
object EmbedNearDup {

  /** Bits per band (bucket count per band = 2^r). */
  val BitsPerBand = 3

  /** OR-amplification width: full recall at the declared 0.45 threshold
    * on the test corpus with margin (min band-collisions per true pair
    * = 3 at sf0.1). */
  val Bands = 32

  /** LSH candidate pairs: vectors sharing ≥1 band bucket, each pair once.
    * `emb` needs (vec_id, v: array<double>). */
  def candidatePairs(
      emb: DataFrame,
      bitsPerBand: Int = BitsPerBand,
      bands: Int = Bands): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    graft.functions.Hyperplanes.register(spark)
    // Both legs of the per-bucket self-join read the postings. Instead of
    // persist() (which leaks cached blocks into long-lived sessions and
    // couldn't hold a 100 TB posting set anyway), repartition on the join
    // key: the two legs canonicalize to the SAME exchange, so Spark plans
    // a ReusedExchange — the bands×r dot products run once as the map
    // side of ONE shuffle, both legs read its (disk-backed, evictable)
    // shuffle files, and the join itself needs no further exchange
    // because the data already arrives clustered on (band, bkey).
    val post = emb
      .select($"vec_id", posexplode(expr(s"hyperplane_sig(v, $bitsPerBand, $bands)")))
      .toDF("vec_id", "band", "bkey")
      .repartition($"band", $"bkey")
    val a = post.select($"band".as("a_band"), $"bkey".as("a_bkey"), $"vec_id".as("a_id"))
    val b = post.select($"band".as("b_band"), $"bkey".as("b_bkey"), $"vec_id".as("b_id"))
    a.join(b, $"a_band" === $"b_band" && $"a_bkey" === $"b_bkey" && $"a_id" < $"b_id")
      .select($"a_id", $"b_id")
      .dropDuplicates("a_id", "b_id") // a pair may collide in many bands
  }

  /** Verified near-dup pairs (a_id, b_id, cos), cos ≥ threshold — output
    * identical to the brute-force all-pairs definition whenever recall
    * holds (VectorOpsSpec dual-runs both on the test corpus).
    * `emb` needs (vec_id, v: array<double>, nrm: double). */
  def pairs(
      emb: DataFrame,
      threshold: Double,
      bitsPerBand: Int = BitsPerBand,
      bands: Int = Bands): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    graft.functions.VecDot.register(spark)
    val cand = candidatePairs(emb.select($"vec_id", $"v"), bitsPerBand, bands)
    // re-attach vectors by id: equi-joins (broadcast at sf scale, shuffle
    // at 100 TB) — candidates stay narrow through the dedup shuffle
    val ea = emb.select($"vec_id".as("a_id"), $"v".as("av"), $"nrm".as("a_nrm"))
    val eb = emb.select($"vec_id".as("b_id"), $"v".as("bv"), $"nrm".as("b_nrm"))
    cand.join(ea, "a_id").join(eb, "b_id")
      .withColumn("cos", expr("vec_dot(av, bv)") / ($"a_nrm" * $"b_nrm"))
      .where($"cos" >= threshold)
      .select($"a_id", $"b_id", $"cos")
  }
}
