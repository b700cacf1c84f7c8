package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.gold.{Extended, Tpch2}

/** Structural/differential assertions for the TPC-H second wave and the
  * extended-analytics queries (value-level ground truth is the DuckDB
  * oracle; these pin invariants that survive data regeneration). */
class ExtendedCoverageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("q2: every kept supplier offers exactly the per-part minimum") {
    val df = Tpch2.q2MinCostSupplier(spark, sf).cache()
    assert(df.count() > 0)
    // one min value per part (ties allowed across suppliers, not values)
    assert(df.groupBy(col("p_partkey"))
      .agg(countDistinct(col("min_unit")).as("nv"))
      .where(col("nv") =!= 1).count() === 0)
  }

  test("q8: market share is a proper fraction") {
    val df = Tpch2.q8MarketShare(spark, sf)
    assert(df.where(col("mkt_share") < 0 || col("mkt_share") > 1).count() === 0)
  }

  test("q11: mean-relative threshold keeps a non-empty strict subset") {
    val df = Tpch2.q11ImportantParts(spark, sf).cache()
    val kept = df.count()
    assert(kept > 0)
    val parts = Tables.lineitem(spark, sf).select(col("l_partkey")).distinct().count()
    assert(kept < parts)
  }

  test("q13: distribution accounts for every customer exactly once") {
    val df = Tpch2.q13CustDist(spark, sf)
    val total = df.agg(sum(col("custdist"))).first().getLong(0)
    assert(total === Tables.customer(spark, sf).count())
  }

  test("q15: the kept supplier(s) hold the global max revenue") {
    val df = Tpch2.q15TopSupplier(spark, sf).cache()
    assert(df.count() >= 1)
    assert(df.select(col("total_rev")).distinct().count() === 1)
  }

  test("q21: sole late shippers exist and waits are positive") {
    val df = Tpch2.q21SoleLateShipper(spark, sf).cache()
    assert(df.count() > 0)
    assert(df.where(col("numwait") <= 0).count() === 0)
  }

  test("session_volume: sessions per user are disjoint and gap-closed") {
    val df = Extended.sessionVolume(spark, sf).cache()
    assert(df.where(col("se") <= col("ss")).count() === 0)
    // no two sessions of one user overlap: count pairwise via self-join on user
    val a = df.select(col("user_id"), col("ss").as("a_ss"), col("se").as("a_se"))
    val b = df.select(col("user_id"), col("ss").as("b_ss"), col("se").as("b_se"))
    val overlaps = a.join(b, Seq("user_id"))
      .where(col("a_ss") < col("b_ss") && col("b_ss") < col("a_se"))
    assert(overlaps.count() === 0)
  }

  test("sliding_volume: 2h/1h slide counts every event exactly twice") {
    val df = Extended.slidingVolume(spark, sf)
    val windowed = df.agg(sum(col("n_events"))).first().getLong(0)
    assert(windowed === 2 * Tables.events(spark, sf).count())
  }

  test("value_deciles: 9 per group, equals a driver-side percentile_disc on collected values") {
    val rows = graft.gold.Extended.valueDeciles(spark, sf).collect()
    val byFlag = rows.groupBy(_.getAs[String]("l_returnflag"))
    val prices = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_extendedprice")).collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    assert(byFlag.keySet === prices.keySet)
    byFlag.foreach { case (flag, ds) =>
      assert(ds.length === 9)
      val sorted = prices(flag)
      ds.foreach { r =>
        val d = r.getAs[Int]("d")
        val expect = sorted(((d.toLong * sorted.length + 9) / 10).toInt - 1)
        assert(r.getAs[Double]("decile_value") === expect,
          s"flag=$flag d=$d")
      }
      // monotone non-decreasing boundaries
      val vals = ds.sortBy(_.getAs[Int]("d")).map(_.getAs[Double]("decile_value"))
      assert(vals.toSeq === vals.sorted.toSeq)
    }
  }

  test("exact_median matches the builtin median within double noise") {
    val ours = Extended.exactMedian(spark, sf)
      .select(col("l_returnflag"), col("median_price"))
    val builtin = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(median(col("l_extendedprice")).as("m"))
    val joined = ours.join(builtin, Seq("l_returnflag"))
      .where(abs(col("median_price") - col("m")) > 1e-6)
    assert(joined.count() === 0)
  }

  test("mode_priority: picked count equals the builtin per-group max count") {
    val ours = Extended.modePriority(spark, sf)
    val ref = Tables.orders(spark, sf)
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("o_orderstatus")).agg(max(col("c")).as("max_c"))
    assert(ours.join(ref, Seq("o_orderstatus"))
      .where(col("cnt") =!= col("max_c")).count() === 0)
  }

  test("stats_corr matches builtin corr/covar_samp within rounding") {
    val ours = Extended.statsCorr(spark, sf)
    val ref = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(corr(col("l_quantity"), col("l_extendedprice")).as("c"),
        covar_samp(col("l_quantity"), col("l_extendedprice")).as("cv"))
    val bad = ours.join(ref, Seq("l_returnflag"))
      .where(abs(col("corr_qp") - col("c")) > 1e-5
        || abs(col("covar_qp") - col("cv")) > 1e-2)
    assert(bad.count() === 0)
  }

  test("grouping_sets_geo: nation and region subtotals both sum to the grand total") {
    val df = Extended.groupingSetsGeo(spark, sf).cache()
    val grand = df.where(col("g_n") === 1 && col("g_r") === 1)
      .agg(sum(col("n_customers"))).first().getLong(0)
    val byNation = df.where(col("g_n") === 0)
      .agg(sum(col("n_customers"))).first().getLong(0)
    val byRegion = df.where(col("g_r") === 0)
      .agg(sum(col("n_customers"))).first().getLong(0)
    assert(grand === byNation && grand === byRegion)
  }

  test("top_tokens: dense top-20, counts non-increasing in rank order") {
    val rows = Extended.topTokens(spark, sf).orderBy(col("rk")).collect()
    assert(rows.length === 20)
    assert(rows.map(_.getAs[Int]("rk")).toSeq === (1 to 20))
    val cnts = rows.map(_.getAs[Long]("cnt"))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b })
  }

  test("emb_norm_stats: min <= avg <= max per label") {
    val df = Extended.embNormStats(spark, sf)
    assert(df.where(col("avg_norm") < col("min_norm") - lit(1e-9)
      || col("avg_norm") > col("max_norm") + lit(1e-9)).count() === 0)
  }

  test("split_assign: buckets bounded, splits consistent with buckets") {
    val df = graft.functions.Text.splitAssign(spark, sf).cache()
    assert(df.where(col("bucket") < 0 || col("bucket") >= 100).count() === 0)
    assert(df.where(
      (col("bucket") < 90 && col("split") =!= "train")
        || (col("bucket") >= 90 && col("bucket") < 95 && col("split") =!= "validation")
        || (col("bucket") >= 95 && col("split") =!= "test")).count() === 0)
    // deterministic across invocations
    val again = graft.functions.Text.splitAssign(spark, sf)
    assert(df.exceptAll(again).count() === 0)
  }

  test("repetition_stats: fractions bounded, bigram count = n_tokens - 1") {
    val df = graft.functions.Text.repetitionStats(spark, sf).cache()
    assert(df.where(col("top_bigram_frac") <= 0 || col("top_bigram_frac") > 1).count() === 0)
    assert(df.where(col("dup_trigram_frac") < 0 || col("dup_trigram_frac") >= 1).count() === 0)
    val toks = graft.functions.Text.textFingerprint(spark, sf)
      .select(col("doc_id"), col("n_tokens"))
    assert(df.join(toks, Seq("doc_id"))
      .where(col("n_bigrams") =!= col("n_tokens") - 1).count() === 0)
  }

  test("tfidf_top3: at most 3 ranked terms per doc, scores non-increasing") {
    val df = graft.functions.Text.tfidfTop3(spark, sf).cache()
    assert(df.groupBy(col("doc_id")).count().where(col("count") > 3).count() === 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("rk"))
    val bad = df.withColumn("prev", lag(col("score"), 1).over(w))
      .where(col("prev").isNotNull && col("score") > col("prev"))
    assert(bad.count() === 0)
  }

  test("hourly_resample: contiguous hour axis, totals preserved") {
    val df = Extended.hourlyResample(spark, sf).cache()
    // gap-free: row count equals the hour span
    val span = df.agg(((unix_timestamp(max(col("h"))) - unix_timestamp(min(col("h")))) / 3600 + 1)
      .as("expect")).first().getDouble(0)
    assert(df.count() === span.toLong)
    // zero-filling adds no events
    val total = df.agg(sum(col("n_events"))).first().getLong(0)
    assert(total === Tables.events(spark, sf).count())
  }

  test("event_funnel: step counts monotonically decrease, rates in [0,1]") {
    val r = Extended.eventFunnel(spark, sf).first()
    val (n1, n2, n3) = (r.getAs[Long]("n_signup"),
      r.getAs[Long]("n_click_after"), r.getAs[Long]("n_purchase_after"))
    assert(n1 >= n2 && n2 >= n3 && n3 >= 0)
    assert(r.getAs[Double]("click_rate") <= 1.0
      && r.getAs[Double]("purchase_rate") <= 1.0)
  }

  test("emb_quantize_stats: int8 range respected; reconstruction within scale/2") {
    import graft.operators.Similarity
    val stats = Similarity.quantizeStats(spark, sf).cache()
    assert(stats.where(col("max_q") > 127 || col("max_q") < 0).count() === 0)
    assert(stats.where(col("n_saturated") < col("n_vecs")).count() === 0) // max element always saturates
    // per-element reconstruction error bound |x - q*scale| <= scale/2 (+eps)
    val bad = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"),
        (array_max(transform(col("embedding"), v => abs(v.cast("double")))) / 127.0).as("scale"))
      .where(col("scale") > 0)
      .select(col("vec_id"), col("scale"),
        array_max(transform(col("embedding"), v =>
          abs(v.cast("double") - round(v.cast("double") / col("scale")) * col("scale"))))
          .as("max_err"))
      .where(col("max_err") > col("scale") * 0.5 * 1.000001)
    assert(bad.count() === 0)
  }

  test("emb_pq_codes: every subspace fully assigned within the code range") {
    import graft.operators.Similarity
    val df = Similarity.pqCodeStats(spark, sf).cache()
    assert(df.where(col("code") < 0 || col("code") >= Similarity.PqK).count() === 0)
    assert(df.where(col("m") < 0 || col("m") >= Similarity.PqM).count() === 0)
    // every (m) accounts for every vector exactly once
    val n = Tables.embeddings(spark, sf).count()
    val perM = df.groupBy(col("m")).agg(sum(col("n_vectors")).as("t"))
    assert(perM.where(col("t") =!= n).count() === 0)
    assert(perM.count() === Similarity.PqM)
  }

  test("salted_brand_volume equals the plain unsalted join") {
    val salted = Extended.saltedBrandVolume(spark, sf)
    val plain = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(Dsl.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }
}
