package graft.gold

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, IntegerType}

import graft.{Dsl, Tables}
import graft.Dsl._
import graft.operators.Skew

/** Third surface wave: sessionization, sliding time windows, exact order
  * statistics (median without engine-specific interpolation), mode with a
  * deterministic tiebreak, Pearson correlation / covariance from exact
  * sums, GROUPING SETS, token frequency top-k, embedding-norm statistics,
  * and the salted-join path surfaced as an oracle-checked query.
  *
  * Scale notes: sessionization and sliding windows are hash aggs on
  * derived keys (session_window / window) — no global sort; the mode and
  * top-k windows run over *aggregated* rows only (group cardinality, not
  * fact volume); the exact median is the one genuinely sort-heavy op here
  * (per-group rank), kept exact deliberately — the sketch alternative is
  * `Skew.approxMetrics`; correlation needs a single grouped pass (six
  * exact sums), no second scan.
  */
object Extended {

  /** Gap-based sessionization via session_window (the batch form of the
    * streaming session aggregation): sessions close after 2 idle hours;
    * end = last event + gap, per Spark session-window semantics, which the
    * oracle mirrors with a LAG/cumulative-sum rewrite — the comparison
    * doubles as an equivalence proof of the two formulations. */
  def sessionVolume(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "2 hours"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("volume"))
      .select(col("user_id"),
        col("session_window.start").as("ss"),
        col("session_window.end").as("se"),
        col("n_events"), col("volume"))

  /** Sliding windows (2 h window, 1 h slide): every event lands in exactly
    * two hour-aligned windows; a plain hash agg on the derived window key. */
  def slidingVolume(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "2 hours", "1 hour"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("volume"))
      .select(col("window.start").as("ws"), col("window.end").as("we"),
        col("n_events"), col("volume"))

  /** Price-range width of one rank bucket in [[cumulativeHistogram]].
    * Prices carry 2 decimals, so a 500-wide bucket holds ≤ 50,000 distinct
    * values — a constant bound independent of corpus size. */
  private val RankBucketWidth = 500.0

  /** Two-phase cumulative counts over the distinct-value histogram of
    * l_extendedprice per l_returnflag, with every window partition
    * BOUNDED regardless of scale — the distributed form of a per-group
    * rank scan:
    *
    *  1. hash-aggregate raw rows to (flag, price, cnt) — one shuffle,
    *     map-side combined;
    *  2. range-bucket the values (`floor(price / width)` — fixed-width,
    *     data-independent) and aggregate per-bucket totals: a frame of
    *     bucket cardinality (value domain / width), corpus-independent;
    *  3. prefix-sum the bucket totals with a window per flag — runs over
    *     BUCKET rows only, never values — giving each bucket its global
    *     rank offset and each flag its total n;
    *  4. broadcast-join the offsets back and cumulate WITHIN each
    *     (flag, bucket): partitions hold at most one bucket's distinct
    *     values (≤ width·100 rows for 2-decimal money), so no reducer
    *     ever scans a whole group's histogram.
    *
    * cum = bucket offset + within-bucket running count is exactly the
    * single-window cumulative count (bucket order is value order), so the
    * rank arithmetic downstream — and the DuckDB oracles — are unchanged.
    * Returns (l_returnflag, l_extendedprice, cnt, prev, cum, n).
    *
    * The offsets side re-derives the histogram (Catalyst shares no common
    * subtrees across a self-join, and the join-key null filter the
    * optimizer injects on the probe side keeps ReuseExchange from
    * matching): two scans + two map-side-combined aggregations instead of
    * one. At 100 TB persist the histogram frame (value-domain-bounded,
    * megabytes) before calling [[exactMedianOn]] — the operator shape is
    * unchanged. */
  private def cumulativeHistogram(spark: SparkSession, dir: String): DataFrame =
    cumulativeHistogramOn(Tables.lineitem(spark, dir))

  private[graft] def cumulativeHistogramOn(lineitem: DataFrame): DataFrame = {
    // materialize the histogram ONCE for its two consumers (offsets
    // derivation + probe side): Catalyst shares no subtrees across the
    // self-join, so without this the scan + map-side aggregation ran
    // twice per query — the "persist the histogram frame" note below,
    // now applied at bench scale too (measured: the second scan+agg was
    // ~40% of exact_median). localCheckpoint keeps the operator shape.
    val hist = lineitem
      .groupBy(col("l_returnflag"), col("l_extendedprice"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("bkt", floor(col("l_extendedprice") / RankBucketWidth))
      .localCheckpoint(true)
    val wPrevBkts = Window.partitionBy(col("l_returnflag")).orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wFlag = Window.partitionBy(col("l_returnflag"))
    val offsets = hist.groupBy(col("l_returnflag"), col("bkt"))
      .agg(sum(col("cnt")).as("bcnt"))
      .withColumn("offset", coalesce(sum(col("bcnt")).over(wPrevBkts), lit(0L)))
      .withColumn("n", sum(col("bcnt")).over(wFlag))
      .select(col("l_returnflag"), col("bkt"), col("offset"), col("n"))
    val wInBkt = Window.partitionBy(col("l_returnflag"), col("bkt"))
      .orderBy(col("l_extendedprice"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist.join(broadcast(offsets), Seq("l_returnflag", "bkt"))
      .withColumn("cum", col("offset") + sum(col("cnt")).over(wInBkt))
      .withColumn("prev", col("cum") - col("cnt"))
      .select(col("l_returnflag"), col("l_extendedprice"), col("cnt"),
        col("prev"), col("cum"), col("n"))
  }

  /** Exact median per group, interpolation-free: average the one or two
    * middle elements over exact decimals. Bit-reproducible (builtin
    * percentile/quantile interpolation trees differ per engine). Rank
    * positions come from [[cumulativeHistogram]] — bounded windows, no
    * group-sized reducer; the middle positions p1/p2 are located in the
    * cumulative counts and a value spanning both contributes twice
    * (weight), reproducing exactly the two-middle-elements average. */
  def exactMedian(spark: SparkSession, dir: String): DataFrame =
    exactMedianOn(cumulativeHistogram(spark, dir))

  private[graft] def exactMedianOn(cumHist: DataFrame): DataFrame =
    cumHist
      .withColumn("p1", floor((col("n") + 1) / 2))
      .withColumn("p2", floor((col("n") + 2) / 2))
      .withColumn("wgt",
        when(col("p1") > col("prev") && col("p1") <= col("cum"), 1).otherwise(0)
          + when(col("p2") =!= col("p1")
            && col("p2") > col("prev") && col("p2") <= col("cum"), 1).otherwise(0))
      .where(col("wgt") > 0)
      .groupBy(col("l_returnflag"))
      .agg(
        (sum(Dsl.money(col("l_extendedprice")) * col("wgt")).cast(DoubleType)
          / sum(col("wgt"))).as("median_price"),
        max(col("n")).as("n"))

  /** Exact per-group deciles (equi-height histogram boundaries) from the
    * same bounded-window [[cumulativeHistogram]]; rank selection is pure
    * integer arithmetic (r_d = ceil(d·n/10) = (d·n+9) div 10 —
    * percentile_disc semantics) so both engines pick identical boundary
    * values with no float interpolation to disagree on. The one fan-out
    * (×9 deciles) happens AFTER the aggregation, on histogram rows. */
  def valueDeciles(spark: SparkSession, dir: String): DataFrame =
    cumulativeHistogram(spark, dir)
      .select(col("l_returnflag"), col("l_extendedprice"), col("prev"),
        col("cum"), col("n"),
        explode(sequence(lit(1), lit(9))).as("d"))
      .withColumn("r", expr("(cast(d as bigint) * n + 9) div 10"))
      .where(col("r") > col("prev") && col("r") <= col("cum"))
      .select(col("l_returnflag"), col("d"),
        col("l_extendedprice").as("decile_value"), col("n"))

  /** Mode (most frequent value) per group with a deterministic tiebreak —
    * two-level: grouped counts first, then a window over group-cardinality
    * rows only. */
  def modePriority(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"))
    counts
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("o_orderstatus"))
          .orderBy(col("cnt").desc, col("o_orderpriority"))))
      .where(col("rk") === 1)
      .select(col("o_orderstatus"), col("o_orderpriority").as("mode_priority"),
        col("cnt"))
  }

  /** Pearson correlation + sample covariance of (quantity, price) per
    * return flag, derived from six exact decimal sums with a fixed IEEE
    * double tree (builtin CORR/COVAR accumulate in doubles — order
    * dependent, engine specific). Final rounding absorbs the oracle's
    * decimal→double double-rounding exactly as `Dsl.dstddev` does. */
  def statsCorr(spark: SparkSession, dir: String): DataFrame = {
    val x = Dsl.money(col("l_quantity"))
    val y = Dsl.money(col("l_extendedprice"))
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(x).cast(DoubleType).as("sx"),
        sum(y).cast(DoubleType).as("sy"),
        sum(x * x).cast(DoubleType).as("sxx"),
        sum(y * y).cast(DoubleType).as("syy"),
        sum(x * y).cast(DoubleType).as("sxy"))
      .select(col("l_returnflag"), col("n"),
        round((col("n") * col("sxy") - col("sx") * col("sy"))
          / sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
            * (col("n") * col("syy") - col("sy") * col("sy"))), 6).as("corr_qp"),
        round((col("sxy") - col("sx") * col("sy") / col("n"))
          / (col("n") - lit(1)), 6).as("covar_qp"))
  }

  /** GROUPING SETS ((nation), (region), ()) in one pass over the geo
    * hierarchy — disjoint subtotal sets without a full CUBE expansion. */
  def groupingSetsGeo(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupingSets(
        Seq(Seq(col("n_name")), Seq(col("r_name")), Seq.empty),
        col("n_name"), col("r_name"))
      .agg(
        dsum(col("c_acctbal")).as("total_bal"),
        count(lit(1)).as("n_customers"),
        grouping(col("n_name")).cast(IntegerType).as("g_n"),
        grouping(col("r_name")).cast(IntegerType).as("g_r"))

  /** Token frequency top-20 over the English corpus: regex extraction →
    * explode → count → distributed top-k. The deterministic orderBy+limit
    * plans as TakeOrderedAndProject (per-partition heaps, O(n log k)) —
    * never a single-partition sort of the whole vocabulary; the rank
    * window then runs over exactly 20 rows. ASCII token class keeps
    * lower() engine-agnostic on multilingual input. */
  def topTokens(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .where(col("lang") === "en")
      .select(explode(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(20)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("cnt").desc, col("token"))))

  // Single source of truth for the embedding dimension: the oracle SQL
  // below enumerates exactly Dim elements, and a drifting private copy
  // would silently truncate the oracle's sum.
  private def EmbDim = graft.operators.Similarity.Dim

  /** Embedding L2-norm statistics per label: exact-decimal self dot
    * product per vector (order-independent), then exact-decimal averaging
    * of the norms — the vector-column profiling pass a training pipeline
    * runs before similarity search. */
  def embNormStats(spark: SparkSession, dir: String): DataFrame = {
    // unrolled codegen'd exact-decimal kernel shared with the similarity
    // operators (identical values to the interpreted fold it replaces)
    val norm2 = graft.operators.Similarity.exactSelfSum(col("embedding"))
    Tables.embeddings(spark, dir)
      .select(col("label"), sqrt(norm2).as("nrm"))
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("n_vecs"),
        // double→decimal re-rounding of the sqrt'd norms is the one step
        // engines disagree on (shortest-repr vs exact-binary rounding at
        // digit 12); final round(…,6) absorbs that ulp-level noise
        round(sum(graft.functions.Native.to_dec(col("nrm"), 18, 12)).cast(DoubleType)
          / count(col("nrm")), 6).as("avg_norm"),
        min(col("nrm")).as("min_norm"),
        max(col("nrm")).as("max_norm"))
  }

  /** Time-series densification: hourly event rollup with every hour of
    * the observed span present, empty hours zero-filled. The hour axis is
    * generated (sequence+explode from a one-row span aggregate — rows
    * proportional to the time span, not the data) and the rollup joins
    * onto it; at scale the generated axis is tiny and broadcasts into the
    * left join. The standard shape for gap-free dashboards/windows. */
  def hourlyResample(spark: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("volume"))
    val hours = hourly
      .agg(min(col("h")).as("mn"), max(col("h")).as("mx"))
      .select(explode(sequence(col("mn"), col("mx"), expr("INTERVAL 1 HOUR"))).as("h"))
    hours.join(hourly, Seq("h"), "left")
      .select(col("h"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("volume"), lit(0.0)).as("volume"))
  }

  /** Three-step event funnel (signup → first click after it → first
    * purchase after that): per-step user counts and conversion ratios.
    * Each step is a grouped min-timestamp co-partitioned on user_id, so
    * the three stages reuse one shuffle layout; ratios are exact-count
    * divisions. */
  def eventFunnel(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val s1 = e.where(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_signup"))
    val s2 = e.where(col("event_type") === "click")
      .join(s1, Seq("user_id"))
      .where(col("ts") > col("t_signup"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
    val s3 = e.where(col("event_type") === "purchase")
      .join(s2, Seq("user_id"))
      .where(col("ts") > col("t_click"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
    // one left-join chain + one aggregate: each step's subtree executes
    // once (three separate scalar counts would re-derive the whole chain
    // per count), and the joins stay co-partitioned on user_id
    s1.join(s2, Seq("user_id"), "left")
      .join(s3, Seq("user_id"), "left")
      .agg(count(lit(1)).as("n_signup"),
        count(col("t_click")).as("n_click_after"),
        count(col("t_purchase")).as("n_purchase_after"))
      .select(col("n_signup"), col("n_click_after"), col("n_purchase_after"),
        (col("n_click_after").cast(DoubleType) / col("n_signup")).as("click_rate"),
        (col("n_purchase_after").cast(DoubleType) / col("n_click_after")).as("purchase_rate"))
  }

  /** Fixed-width histogram of extended price per return flag: bucket =
    * floor(x/500) with fixed bounds — a single hash aggregation on a
    * computed key (no data-dependent two-pass min/max), the scale-correct
    * binning shape for dashboards and distribution monitoring. */
  def priceHistogram(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"),
        floor(col("l_extendedprice") / 500.0).cast(IntegerType).as("bucket"))
      .agg(count(lit(1)).as("n"),
        dsum(col("l_extendedprice")).as("bucket_mass"))

  /** The salted-join path as a first-class query: revenue per brand through
    * `Skew.saltedJoin` (hot-key splitting). The oracle is the plain join —
    * the comparison proves salting is semantics-neutral. */
  def saltedBrandVolume(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey").as("p_partkey"),
        col("l_extendedprice"), col("l_discount"))
    val dim = Tables.part(spark, dir).select(col("p_partkey"), col("p_brand"))
    Skew.saltedJoin(li, dim, Seq("p_partkey"), factor = 8)
      .groupBy(col("p_brand"))
      .agg(
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  object oracle {
    val sessionVolume: String =
      s"""WITH t AS (
         |  SELECT user_id, ts, value,
         |    CASE WHEN LAG(ts) OVER w IS NULL
         |           OR ts - LAG(ts) OVER w >= INTERVAL 2 HOUR THEN 1 ELSE 0 END AS new_s
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         |s AS (
         |  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         |  FROM t)
         |SELECT user_id, MIN(ts) AS ss, MAX(ts) + INTERVAL 2 HOUR AS se,
         |  COUNT(*) AS n_events, ${Dsl.sql.dsum("value")} AS volume
         |FROM s GROUP BY user_id, sid""".stripMargin

    val slidingVolume: String =
      s"""SELECT make_timestamp(ws * 1000000) AS ws,
         |  make_timestamp((ws + 7200) * 1000000) AS we,
         |  COUNT(*) AS n_events, ${Dsl.sql.dsum("value")} AS volume
         |FROM (
         |  SELECT value,
         |    CAST(floor((epoch(ts) - k.k * 3600) / 7200) * 7200 + k.k * 3600 AS BIGINT) AS ws
         |  FROM events, (VALUES (0), (1)) k(k))
         |GROUP BY 1, 2""".stripMargin

    val exactMedian: String =
      s"""WITH ranked AS (
         |  SELECT l_returnflag, l_extendedprice,
         |    ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rn,
         |    COUNT(*) OVER (PARTITION BY l_returnflag) AS n
         |  FROM lineitem)
         |SELECT l_returnflag,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS median_price,
         |  MAX(n) AS n
         |FROM ranked
         |WHERE rn = CAST(floor((n + 1) / 2) AS BIGINT)
         |   OR rn = CAST(floor((n + 2) / 2) AS BIGINT)
         |GROUP BY 1""".stripMargin

    val valueDeciles: String =
      s"""WITH counts AS (
         |  SELECT l_returnflag, l_extendedprice, COUNT(*) AS cnt
         |  FROM lineitem GROUP BY 1, 2),
         |c AS (
         |  SELECT l_returnflag, l_extendedprice, cnt,
         |    SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS cum,
         |    SUM(cnt) OVER (PARTITION BY l_returnflag) AS n
         |  FROM counts),
         |x AS (
         |  SELECT c.*, cum - cnt AS prev, CAST(i AS INT) AS d,
         |    (i * n + 9) // 10 AS r
         |  FROM c, range(1, 10) t(i))
         |SELECT l_returnflag, d, l_extendedprice AS decile_value,
         |  CAST(n AS BIGINT) AS n
         |FROM x WHERE r > prev AND r <= cum""".stripMargin

    val modePriority: String =
      s"""WITH counts AS (
         |  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
         |  FROM orders GROUP BY 1, 2)
         |SELECT o_orderstatus, o_orderpriority AS mode_priority, cnt
         |FROM counts
         |QUALIFY ROW_NUMBER() OVER (PARTITION BY o_orderstatus
         |  ORDER BY cnt DESC, o_orderpriority) = 1""".stripMargin

    val statsCorr: String = {
      // (19,6) casts force DuckDB's int128 multiply (values identical to
      // Spark's (18,6)² products) — same trick as Dsl.sql.dstddev.
      val sx  = "CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)"
      val sy  = "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)"
      val sxx = "CAST(SUM(CAST(l_quantity AS DECIMAL(19,6)) * CAST(l_quantity AS DECIMAL(19,6))) AS DOUBLE)"
      val syy = "CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,6)) * CAST(l_extendedprice AS DECIMAL(19,6))) AS DOUBLE)"
      val sxy = "CAST(SUM(CAST(l_quantity AS DECIMAL(19,6)) * CAST(l_extendedprice AS DECIMAL(19,6))) AS DOUBLE)"
      s"""WITH sums AS (
         |  SELECT l_returnflag, COUNT(*) AS n,
         |    $sx AS sx, $sy AS sy, $sxx AS sxx, $syy AS syy, $sxy AS sxy
         |  FROM lineitem GROUP BY 1)
         |SELECT l_returnflag, n,
         |  round((n * sxy - sx * sy)
         |    / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS corr_qp,
         |  round((sxy - sx * sy / n) / (n - 1), 6) AS covar_qp
         |FROM sums""".stripMargin
    }

    val groupingSetsGeo: String =
      s"""SELECT n_name, r_name,
         |  ${Dsl.sql.dsum("c_acctbal")} AS total_bal,
         |  COUNT(*) AS n_customers,
         |  CAST(GROUPING(n_name) AS INT) AS g_n,
         |  CAST(GROUPING(r_name) AS INT) AS g_r
         |FROM customer
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY GROUPING SETS ((n_name), (r_name), ())""".stripMargin

    val topTokens: String =
      s"""WITH toks AS (
         |  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
         |  FROM documents WHERE lang = 'en'),
         |c AS (SELECT token, COUNT(*) AS cnt FROM toks GROUP BY 1)
         |SELECT token, cnt,
         |  CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS INT) AS rk
         |FROM c QUALIFY rk <= 20""".stripMargin

    val embNormStats: String =
      s"""WITH n AS (
         |  SELECT label,
         |    sqrt((SELECT CAST(SUM(CAST(CAST(embedding[i] AS DOUBLE)
         |                 * CAST(embedding[i] AS DOUBLE) AS DECIMAL(20,12))) AS DOUBLE)
         |          FROM range(1, ${EmbDim + 1}) t(i))) AS nrm
         |  FROM embeddings)
         |SELECT label, COUNT(*) AS n_vecs,
         |  round(CAST(SUM(CAST(nrm AS DECIMAL(18,12))) AS DOUBLE) / COUNT(nrm), 6) AS avg_norm,
         |  MIN(nrm) AS min_norm, MAX(nrm) AS max_norm
         |FROM n GROUP BY 1""".stripMargin

    val priceHistogram: String =
      s"""SELECT l_returnflag,
         |  CAST(floor(l_extendedprice / 500.0) AS INT) AS bucket,
         |  COUNT(*) AS n,
         |  ${Dsl.sql.dsum("l_extendedprice")} AS bucket_mass
         |FROM lineitem GROUP BY 1, 2""".stripMargin

    val hourlyResample: String =
      s"""WITH hourly AS (
         |  SELECT date_trunc('hour', ts) AS h, COUNT(*) AS n_events,
         |    ${Dsl.sql.dsum("value")} AS volume
         |  FROM events GROUP BY 1),
         |span AS (SELECT MIN(h) AS mn, MAX(h) AS mx FROM hourly),
         |hours AS (SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h FROM span)
         |SELECT hours.h, COALESCE(n_events, 0) AS n_events,
         |  COALESCE(volume, 0.0) AS volume
         |FROM hours LEFT JOIN hourly ON hours.h = hourly.h""".stripMargin

    val eventFunnel: String =
      s"""WITH s1 AS (
         |  SELECT user_id, MIN(ts) AS t_signup FROM events
         |  WHERE event_type = 'signup' GROUP BY 1),
         |s2 AS (
         |  SELECT e.user_id, MIN(e.ts) AS t_click
         |  FROM events e JOIN s1 ON e.user_id = s1.user_id
         |  WHERE e.event_type = 'click' AND e.ts > s1.t_signup GROUP BY 1),
         |s3 AS (
         |  SELECT e.user_id, MIN(e.ts) AS t_purchase
         |  FROM events e JOIN s2 ON e.user_id = s2.user_id
         |  WHERE e.event_type = 'purchase' AND e.ts > s2.t_click GROUP BY 1)
         |SELECT (SELECT COUNT(*) FROM s1) AS n_signup,
         |  (SELECT COUNT(*) FROM s2) AS n_click_after,
         |  (SELECT COUNT(*) FROM s3) AS n_purchase_after,
         |  CAST((SELECT COUNT(*) FROM s2) AS DOUBLE)
         |    / (SELECT COUNT(*) FROM s1) AS click_rate,
         |  CAST((SELECT COUNT(*) FROM s3) AS DOUBLE)
         |    / (SELECT COUNT(*) FROM s2) AS purchase_rate""".stripMargin

    /** Plain (unsalted) join — proves the salted path is semantics-neutral. */
    val saltedBrandVolume: String =
      s"""SELECT p_brand,
         |  ${Dsl.sql.dsum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
         |  COUNT(*) AS n_items
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |GROUP BY 1""".stripMargin
  }
}
