package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-20 same-run A/B harness (the VERDICT-r18-task-2 discipline):
  * candidate rewrites live HERE first, next to a verbatim copy of the
  * current spelling; every variant's result is asserted identical
  * in-run (count + order-insensitive row-hash sum), then variants are
  * timed interleaved (A/B/A/B, min-of-reps) with an untouched control
  * query alongside. Winners are then applied to the real query code
  * and re-gated against the DuckDB oracle. NOT part of any graded
  * path. sbt "runMain graft.tools.ScratchAB [target] [reps]" */
object ScratchAB {
  def main(args: Array[String]): Unit = {
    val target = args.headOption.getOrElse("all")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    spark.range(100000).selectExpr("sum(id)").collect()

    def t(name: String): DataFrame = {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$sfDir/$name.parquet")
      df.schema.fields.foldLeft(df) { (d, f) =>
        f.dataType match {
          case org.apache.spark.sql.types.LongType
              if Set("ts", "l_shipdate", "o_orderdate")(f.name) =>
            d.withColumn(f.name, expr(s"timestamp_micros(${f.name} DIV 1000)"))
          case org.apache.spark.sql.types.TimestampNTZType =>
            d.withColumn(f.name, col(f.name).cast("timestamp"))
          case _ => d
        }
      }
    }

    // ---------- r_subquery_correlated ----------
    def subqA(): DataFrame = {
      t("orders").createOrReplaceTempView("graft_corr_orders")
      spark.sql(
        """SELECT o_orderkey, o_custkey,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_c
           FROM graft_corr_orders o
           WHERE (SELECT count(*) FROM graft_corr_orders i
                  WHERE i.o_custkey = o.o_custkey)
                   * CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) * 2
                 > (SELECT sum(CAST(CAST(i.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                    FROM graft_corr_orders i WHERE i.o_custkey = o.o_custkey) * 3
           ORDER BY o_orderkey""")
    }
    def subqB(): DataFrame = {
      val o = t("orders").select($"o_orderkey", $"o_custkey",
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").as("price_c"))
      val ag = o.groupBy($"o_custkey")
        .agg(count(lit(1)).as("cnt"), sum($"price_c").as("tot"))
      o.join(ag, "o_custkey")
        .where($"cnt" * $"price_c" * 2 > $"tot" * 3)
        .select($"o_orderkey", $"o_custkey", $"price_c")
        .orderBy($"o_orderkey")
    }

    // ---------- x_drift_js ----------
    def jsBase(): DataFrame = {
      val d = t("events")
        .select($"event_type",
          expr("CAST(floor(value * 100.0) AS BIGINT)").as("cents"),
          expr("unix_millis(ts) DIV 86400000").as("day"))
      val dr = d.agg(min($"day").as("d0"), max($"day").as("d1"))
      d.crossJoin(broadcast(dr))
        .withColumn("early", $"day" <= expr("(d0 + d1) DIV 2"))
        .groupBy($"event_type", $"cents")
        .agg(sum(when($"early", 1L).otherwise(0L)).as("ea"),
          sum(when(!$"early", 1L).otherwise(0L)).as("la"))
    }
    def jsTerm(s2: DataFrame): DataFrame =
      s2.where($"ne" > 0 && $"nl" > 0)
        .groupBy($"event_type", $"ne", $"nl")
        .agg(sum(
          when($"ea" > 0,
            expr("0.5 * (CAST(ea AS DOUBLE) / ne)"
              + " * ln(CAST(2 * CAST(ea AS DECIMAL(38,0)) * nl AS DOUBLE)"
              + "      / CAST(CAST(ea AS DECIMAL(38,0)) * nl"
              + "           + CAST(la AS DECIMAL(38,0)) * ne AS DOUBLE))"))
            .otherwise(0.0)
          + when($"la" > 0,
            expr("0.5 * (CAST(la AS DOUBLE) / nl)"
              + " * ln(CAST(2 * CAST(la AS DECIMAL(38,0)) * ne AS DOUBLE)"
              + "      / CAST(CAST(ea AS DECIMAL(38,0)) * nl"
              + "           + CAST(la AS DECIMAL(38,0)) * ne AS DOUBLE))"))
            .otherwise(0.0)).as("jsd"))
        .select($"event_type", $"ne".as("n_early"), $"nl".as("n_late"),
          (round($"jsd", 4) + 0.0).as("jsd_nats"))
        .orderBy($"event_type")
    def jsA(): DataFrame = {
      val s = jsBase()
      val tt = s.groupBy($"event_type")
        .agg(sum($"ea").as("ne"), sum($"la").as("nl"))
      jsTerm(s.join(broadcast(tt), Seq("event_type")))
    }
    def jsB(): DataFrame = {
      val wT = Window.partitionBy($"event_type")
      jsTerm(jsBase()
        .select($"event_type", $"cents", $"ea", $"la",
          sum($"ea").over(wT).as("ne"), sum($"la").over(wT).as("nl")))
    }

    // ---------- x_drift_ks ----------
    def ksOn(useMergedFrames: Boolean): DataFrame = {
      val d = t("events")
        .select($"event_type",
          expr("CAST(floor(value * 100.0) AS BIGINT)").as("cents"),
          expr("unix_millis(ts) DIV 86400000").as("day"))
      val dr = d.agg(min($"day").as("d0"), max($"day").as("d1"))
      val s = d.crossJoin(broadcast(dr))
        .withColumn("early", $"day" <= expr("(d0 + d1) DIV 2"))
        .groupBy($"event_type", $"cents")
        .agg(sum(when($"early", 1L).otherwise(0L)).as("ea"),
          sum(when(!$"early", 1L).otherwise(0L)).as("la"))
      val wC = Window.partitionBy($"event_type").orderBy($"cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wT =
        if (useMergedFrames)
          Window.partitionBy($"event_type").orderBy($"cents")
            .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        else Window.partitionBy($"event_type")
      val wM = Window.partitionBy($"event_type")
      val c = s.select($"event_type", $"cents",
        sum($"ea").over(wC).as("cume"), sum($"la").over(wC).as("cuml"),
        sum($"ea").over(wT).as("ne"), sum($"la").over(wT).as("nl"))
        .where($"ne" > 0 && $"nl" > 0)
        .withColumn("term",
          expr(graft.queries.DriftArith.absCrossTermSql("cume", "nl", "cuml", "ne")))
        .withColumn("mx", max($"term").over(wM))
      c.where($"term" === $"mx")
        .groupBy($"event_type", $"ne", $"nl", $"mx")
        .agg(min($"cents").as("ks_at_cents"))
        .select($"event_type", $"ne".as("n_early"), $"nl".as("n_late"),
          $"ks_at_cents",
          expr(graft.queries.DriftArith.scaleBpSql("mx", "ne", "nl")).as("ks_bp"))
        .orderBy($"event_type")
    }

    // ---------- x_drift_tvd ----------
    def tvdTerm(term: DataFrame): DataFrame =
      term
        .withColumn("tvd_bp",
          expr("sum(abs_drift_bp) OVER (PARTITION BY week_idx) DIV 2"))
        .orderBy($"week_idx", $"event_type")
    def tvdWc(): DataFrame = t("events")
      .select($"event_type", expr("unix_millis(ts) DIV 604800000").as("w"))
      .groupBy($"event_type", $"w")
      .agg(count(lit(1)).as("c"))
    def tvdFrom(wc: DataFrame): DataFrame = {
      val mw = wc.agg(min($"w").as("w0"))
      val base = wc.crossJoin(broadcast(mw)).where($"w" === $"w0")
        .select($"event_type".as("b_type"), $"c".as("bc"))
      val bt = base.agg(sum($"bc").as("btot"))
      val wk = wc.groupBy($"w").agg(sum($"c").as("wtot"))
        .select($"w".as("wk_w"), $"wtot")
      val diff = expr(graft.queries.DriftArith.crossTermSql("c", "btot", "bc", "wtot"))
      val term = wc.crossJoin(broadcast(mw)).where($"w" > $"w0")
        .join(broadcast(base), $"b_type" === $"event_type")
        .join(broadcast(wk), $"wk_w" === $"w")
        .crossJoin(broadcast(bt))
        .select(($"w" - $"w0").as("week_idx"), $"event_type",
          $"c".as("obs"),
          expr("(abs(CAST(c AS DECIMAL(38,0)) * btot"
            + " - CAST(bc AS DECIMAL(38,0)) * wtot) * 10000)"
            + " DIV (CAST(wtot AS DECIMAL(38,0)) * btot)")
            .as("abs_drift_bp"),
          when(diff > 0, 1L).when(diff < 0, -1L).otherwise(0L)
            .as("drift_sign"))
      tvdTerm(term)
    }
    def tvdA(): DataFrame = tvdFrom(tvdWc())
    def tvdB(): DataFrame = tvdFrom(tvdWc().persist())
    def tvdC(): DataFrame = {
      val wG = Window.partitionBy()
      val wW = Window.partitionBy($"w")
      val wT = Window.partitionBy($"event_type")
      val e = tvdWc()
        .withColumn("w0", min($"w").over(wG))
        .withColumn("wtot", sum($"c").over(wW))
        .withColumn("bc", max(when($"w" === $"w0", $"c")).over(wT))
        .withColumn("btot", sum(when($"w" === $"w0", $"c")).over(wG))
        .where($"w" > $"w0" && $"bc".isNotNull)
      val diff = expr(graft.queries.DriftArith.crossTermSql("c", "btot", "bc", "wtot"))
      tvdTerm(e.select(($"w" - $"w0").as("week_idx"), $"event_type",
        $"c".as("obs"),
        expr("(abs(CAST(c AS DECIMAL(38,0)) * btot"
          + " - CAST(bc AS DECIMAL(38,0)) * wtot) * 10000)"
          + " DIV (CAST(wtot AS DECIMAL(38,0)) * btot)")
          .as("abs_drift_bp"),
        when(diff > 0, 1L).when(diff < 0, -1L).otherwise(0L)
          .as("drift_sign")))
    }

    // ---------- x_token_kl ----------
    def tokExpr = "filter(split(lower(text), ' +'), x -> x != '')"
    def klA(): DataFrame = {
      val tok = t("documents")
        .select($"source", explode(expr(tokExpr)).as("token"))
      val st = tok.groupBy($"source", $"token").agg(count(lit(1)).as("c_st"))
      val ct = tok.groupBy($"token".as("ct_token")).agg(count(lit(1)).as("c_t"))
      val ns = st.groupBy($"source".as("ns_source")).agg(sum($"c_st").as("n_s"))
      val nn = ct.agg(sum($"c_t").as("n"))
      st.join(ct, $"ct_token" === $"token")
        .join(broadcast(ns), $"ns_source" === $"source")
        .crossJoin(broadcast(nn))
        .groupBy($"source", $"n_s")
        .agg(round(sum(($"c_st".cast("double") / $"n_s") *
          log($"c_st".cast("double") * $"n" /
            ($"n_s".cast("double") * $"c_t"))), 4).as("kl_nats"))
        .select($"source", $"n_s".as("n_tokens"), $"kl_nats")
        .orderBy($"source")
    }
    def klB(): DataFrame = {
      val docs = t("documents")
      val st = docs.select($"source", explode(expr(tokExpr)).as("token"))
        .groupBy($"source", $"token").agg(count(lit(1)).as("c_st"))
      val nn = docs
        .select(expr(s"CAST(size($tokExpr) AS BIGINT)").as("ntok"))
        .agg(sum($"ntok").as("n"))
      st.withColumn("c_t", sum($"c_st").over(Window.partitionBy($"token")))
        .withColumn("n_s", sum($"c_st").over(Window.partitionBy($"source")))
        .crossJoin(broadcast(nn))
        .groupBy($"source", $"n_s")
        .agg(round(sum(($"c_st".cast("double") / $"n_s") *
          log($"c_st".cast("double") * $"n" /
            ($"n_s".cast("double") * $"c_t"))), 4).as("kl_nats"))
        .select($"source", $"n_s".as("n_tokens"), $"kl_nats")
        .orderBy($"source")
    }

    // ---------- x_heaps_fit ----------
    def heapsPts(): DataFrame = {
      val docs = t("documents")
      val mx = docs.agg(max($"doc_id").as("maxid"))
      val lad = spark.range(1, 11).toDF("i")
        .crossJoin(broadcast(mx))
        .select($"i", expr("(maxid * i) DIV 10").as("t_i"))
      val dc = docs.select($"doc_id",
        expr(s"CAST(size($tokExpr) AS BIGINT)").as("ntok"))
      val fs = docs.select($"doc_id", explode(expr(tokExpr)).as("token"))
        .groupBy($"token").agg(min($"doc_id").as("first_seen"))
      val nn = dc.crossJoin(broadcast(lad)).where($"doc_id" <= $"t_i")
        .groupBy($"i").agg(sum($"ntok").as("n_tokens"))
      val vv = fs.crossJoin(broadcast(lad)).where($"first_seen" <= $"t_i")
        .groupBy($"i".as("v_i")).agg(count(lit(1)).as("n_types"))
      nn.join(broadcast(vv), $"v_i" === $"i")
        .select($"i".as("p_idx"), $"n_tokens", $"n_types")
    }
    val heapsBetaSql =
      """CASE WHEN count(DISTINCT n_types) = 1 THEN 0.0
         ELSE regr_slope(ln(CAST(n_types AS DOUBLE)), ln(CAST(n_tokens AS DOUBLE))) END"""
    val heapsR2Sql =
      """CASE WHEN count(DISTINCT n_types) = 1 THEN 1.0
         ELSE covar_pop(ln(CAST(n_types AS DOUBLE)), ln(CAST(n_tokens AS DOUBLE)))
              * covar_pop(ln(CAST(n_types AS DOUBLE)), ln(CAST(n_tokens AS DOUBLE)))
              / (var_pop(ln(CAST(n_tokens AS DOUBLE)))
                 * var_pop(ln(CAST(n_types AS DOUBLE)))) END"""
    def heapsA(): DataFrame = {
      val pts = heapsPts()
      val fit = pts.agg(
        (round(expr(heapsBetaSql), 4) + lit(0.0)).as("beta"),
        (round(expr(heapsR2Sql), 4) + lit(0.0)).as("r2"),
        (countDistinct($"n_types") === 1).as("saturated"))
      pts.crossJoin(broadcast(fit))
        .select($"p_idx", $"n_tokens", $"n_types", $"beta", $"r2", $"saturated")
        .orderBy($"p_idx")
    }
    def heapsB(): DataFrame = {
      // fit via a global window over the 10-point frame: pts computed
      // ONCE (the A spelling recomputes the whole corpus subtree for
      // the fit AND the final cross join). count(DISTINCT) is not a
      // window function; size(collect_set(...)) over the same frame is
      // its exact integer equivalent.
      val wG = Window.partitionBy()
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val sat = size(collect_set($"n_types").over(wG)) === 1
      heapsPts()
        .withColumn("saturated", sat)
        .withColumn("beta", round(when($"saturated", lit(0.0))
          .otherwise(expr("regr_slope(ln(CAST(n_types AS DOUBLE)), ln(CAST(n_tokens AS DOUBLE)))")
            .over(wG)), 4) + lit(0.0))
        .withColumn("r2", round(when($"saturated", lit(1.0))
          .otherwise(
            expr("covar_pop(ln(CAST(n_types AS DOUBLE)), ln(CAST(n_tokens AS DOUBLE)))").over(wG)
              * expr("covar_pop(ln(CAST(n_types AS DOUBLE)), ln(CAST(n_tokens AS DOUBLE)))").over(wG)
              / (expr("var_pop(ln(CAST(n_tokens AS DOUBLE)))").over(wG)
                * expr("var_pop(ln(CAST(n_types AS DOUBLE)))").over(wG))), 4) + lit(0.0))
        .select($"p_idx", $"n_tokens", $"n_types", $"beta", $"r2", $"saturated")
        .orderBy($"p_idx")
    }

    // ---------- x_source_overlap ----------
    def soA(): DataFrame = {
      val st = t("documents")
        .select($"source", explode(expr(tokExpr)).as("token")).distinct()
      val sz = st.groupBy($"source").agg(count(lit(1)).as("n"))
      val pr = st.select($"source".as("a_src"), $"token")
        .join(st.select($"source".as("b_src"), $"token".as("b_tok")),
          $"token" === $"b_tok" && $"a_src" < $"b_src")
        .groupBy($"a_src", $"b_src")
        .agg(count(lit(1)).as("inter"))
      pr.join(broadcast(sz.select($"source".as("sa_src"), $"n".as("sa_n"))),
          $"sa_src" === $"a_src")
        .join(broadcast(sz.select($"source".as("sb_src"), $"n".as("sb_n"))),
          $"sb_src" === $"b_src")
        .select($"a_src", $"b_src", $"inter",
          expr("(inter * 10000) DIV (sa_n + sb_n - inter)").as("jac_bp"),
          expr("(inter * 10000) DIV least(sa_n, sb_n)").as("cont_bp"))
        .where($"jac_bp" >= 1000)
        .orderBy($"a_src", $"b_src")
    }
    def soB(): DataFrame = {
      // set sizes ride the distinct frame as a window column and travel
      // through the self-join legs (the x_cooccur first() idiom) — the
      // sz aggregate's separate recompute of the scan+explode+distinct
      // subtree is gone
      val st = t("documents")
        .select($"source", explode(expr(tokExpr)).as("token")).distinct()
        .withColumn("n", count(lit(1)).over(Window.partitionBy($"source")))
      st.select($"source".as("a_src"), $"token", $"n".as("na"))
        .join(st.select($"source".as("b_src"), $"token".as("b_tok"), $"n".as("nb")),
          $"token" === $"b_tok" && $"a_src" < $"b_src")
        .groupBy($"a_src", $"b_src")
        .agg(count(lit(1)).as("inter"),
          first($"na").as("sa_n"), first($"nb").as("sb_n"))
        .select($"a_src", $"b_src", $"inter",
          expr("(inter * 10000) DIV (sa_n + sb_n - inter)").as("jac_bp"),
          expr("(inter * 10000) DIV least(sa_n, sb_n)").as("cont_bp"))
        .where($"jac_bp" >= 1000)
        .orderBy($"a_src", $"b_src")
    }

    // ---------- x_lang_jsd ----------
    def jsdFrom(stIn: DataFrame): DataFrame = {
      val st = stIn
      val nl = st.groupBy($"lang").agg(sum($"c").as("n"))
      val u = st.select($"token").distinct()
      val pr = nl.select($"lang".as("lang_a"), $"n".as("na"))
        .join(nl.select($"lang".as("lang_b"), $"n".as("nb")),
          $"lang_a" < $"lang_b")
      val j = pr.crossJoin(u)
        .join(broadcast(st.select($"lang".as("la2"), $"token".as("ta2"),
          $"c".as("ca"))), $"la2" === $"lang_a" && $"ta2" === $"token",
          "left")
        .join(broadcast(st.select($"lang".as("lb2"), $"token".as("tb2"),
          $"c".as("cb"))), $"lb2" === $"lang_b" && $"tb2" === $"token",
          "left")
        .na.fill(0L, Seq("ca", "cb"))
      j.groupBy($"lang_a", $"lang_b", $"na", $"nb")
        .agg(round(sum(
          when($"ca" > 0, lit(0.5) * ($"ca".cast("double") / $"na")
            * log(($"ca".cast("double") / $"na")
              / (($"ca".cast("double") / $"na"
                + $"cb".cast("double") / $"nb") / 2))).otherwise(0.0)
          + when($"cb" > 0, lit(0.5) * ($"cb".cast("double") / $"nb")
            * log(($"cb".cast("double") / $"nb")
              / (($"ca".cast("double") / $"na"
                + $"cb".cast("double") / $"nb") / 2))).otherwise(0.0)), 4)
          .as("jsd"))
        .select($"lang_a", $"lang_b", $"na".as("n_a"), $"nb".as("n_b"),
          $"jsd")
        .orderBy($"lang_a", $"lang_b")
    }
    def jsdSt(): DataFrame = t("documents")
      .select($"lang", explode(expr(tokExpr)).as("token"))
      .groupBy($"lang", $"token")
      .agg(count(lit(1)).as("c"))
    def jsdA(): DataFrame = jsdFrom(jsdSt())
    def jsdB(): DataFrame = jsdFrom(jsdSt().persist())

    // ---------- skew probes (guide §2.5, VERDICT r19 task 4) ----------
    // Not an A/B: prints the join-key distributions of the two live
    // posting-join kernels so SCALING.md can carry measured skew rows.
    if (target == "skew") {
      def stats(df: DataFrame, what: String): Unit = {
        val r = df.agg(count(lit(1)), max($"k"),
          expr("CAST(approx_percentile(k, 0.5, 10000) AS BIGINT)"),
          expr("CAST(approx_percentile(k, 0.99, 10000) AS BIGINT)"),
          sum($"k" * $"k")).collect()(0)
        println(s"[skew] $what: keys=${r.getLong(0)} max=${r.getLong(1)} " +
          s"p50=${r.getLong(2)} p99=${r.getLong(3)} sum_k2=${r.getLong(4)} " +
          f"max/p50=${r.getLong(1).toDouble / math.max(1, r.getLong(2))}%.1f")
      }
      // x_cooccur: pair generation self-joins vocab postings on doc_id —
      // per-doc work is k² with k = |doc ∩ top-100 vocab|
      val tok = t("documents").select($"doc_id",
        explode(expr("filter(split(lower(text), ' +'), x -> x != '')")).as("token"))
        .distinct()
      val dfq = tok.groupBy($"token").agg(count(lit(1)).as("n"))
      val voc = dfq.orderBy($"n".desc, $"token").limit(100)
      stats(tok.join(broadcast(voc), "token")
        .groupBy($"doc_id").agg(count(lit(1)).as("k")), "x_cooccur doc_id")
      // x_dedup_minhash: the single (band, bkey) shuffle — bucket size
      // distribution IS the self-join skew
      val docToks = t("documents").select($"doc_id",
        expr("filter(split(lower(text), ' +'), x -> x != '')").as("toks"))
      val idx = java.nio.file.Files.createTempDirectory("skewmh").toString
      graft.operators.MinHashDedup.saveIndex(docToks, "doc_id", "toks", idx)
      stats(spark.read.parquet(s"$idx/bands")
        .groupBy($"band", $"bkey").agg(count(lit(1)).as("k")),
        "x_dedup_minhash (band,bkey)")
      spark.stop(); return
    }

    // exchange-reuse probe: execute and inspect the FINAL (AQE) plan
    if (target == "reuse") {
      for (q <- Seq("x_cooccur", "x_dedup_minhash")) {
        val df = graft.SparkEntry.queries(q)(spark, sfDir)
        df.collect() // execute THIS QueryExecution so AQE finalizes it
        val p = df.queryExecution.executedPlan.toString
        val stageIds = "ShuffleQueryStage (\\d+)".r.findAllMatchIn(p).map(_.group(1)).toSeq
        println(s"[reuse] $q: reusedExchange=${p.contains("ReusedExchange")} " +
          s"shuffleStages=$stageIds tableCache=${p.contains("TableCacheQueryStage")}")
      }
      spark.stop(); return
    }

    // control: untouched simple line timed alongside every target
    def control(): DataFrame = {
      val ev = t("events")
      ev.groupBy($"event_type").agg(count(lit(1)).as("n")).orderBy($"event_type")
    }

    val targets: Seq[(String, Seq[(String, () => DataFrame)])] = Seq(
      "subq" -> Seq("A_correlated" -> (() => subqA()), "B_aggjoin" -> (() => subqB())),
      "js" -> Seq("A_ttjoin" -> (() => jsA()), "B_window" -> (() => jsB())),
      "ks" -> Seq("A_twowin" -> (() => ksOn(false)), "B_mergedframe" -> (() => ksOn(true))),
      "tvd" -> Seq("A_live" -> (() => tvdA()), "B_persist" -> (() => tvdB()),
        "C_windows" -> (() => tvdC())),
      "kl" -> Seq("A_joinback" -> (() => klA()), "B_windows" -> (() => klB())),
      "heaps" -> Seq("A_crossfit" -> (() => heapsA()), "B_windowfit" -> (() => heapsB())),
      "so" -> Seq("A_szjoin" -> (() => soA()), "B_carried" -> (() => soB())),
      "jsd" -> Seq("A_live" -> (() => jsdA()), "B_persist" -> (() => jsdB()))
    ).filter { case (n, _) => target == "all" || target.split(",").contains(n) }

    def checksum(df: DataFrame): (Long, String) = {
      val cols = df.columns.sorted.map(c => col(c))
      val r = df.select(xxhash64(cols: _*).as("h"))
        .agg(count(lit(1)), sum($"h".cast("decimal(38,0)")))
        .collect()(0)
      (r.getLong(0), if (r.isNullAt(1)) "0" else r.getDecimal(1).toString)
    }
    def time(fn: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      fn().write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      dt
    }

    targets.foreach { case (tname, variants) =>
      println(s"== $tname ==")
      val sums = variants.map { case (vn, fn) =>
        val cs = checksum(fn())
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        println(f"  checksum $vn%-14s rows=${cs._1} hashsum=${cs._2}")
        cs
      }
      require(sums.distinct.size == 1,
        s"$tname: VARIANTS DISAGREE — ${variants.map(_._1).zip(sums)}")
      // interleaved timing: (A B C control) x reps, after one discarded
      // warm-up each
      variants.foreach { case (_, fn) => time(fn) }
      time(() => control())
      val acc = scala.collection.mutable.Map[String, List[Double]]()
      (1 to reps).foreach { _ =>
        variants.foreach { case (vn, fn) =>
          acc(vn) = time(fn) :: acc.getOrElse(vn, Nil) }
        acc("control") = time(() => control()) :: acc.getOrElse("control", Nil)
      }
      (variants.map(_._1) :+ "control").foreach { vn =>
        val xs = acc(vn)
        println(f"  $vn%-14s min=${xs.min}%.3f reps=${xs.reverse.map(x => f"$x%.3f").mkString(",")}")
      }
    }
    spark.stop()
  }
}
