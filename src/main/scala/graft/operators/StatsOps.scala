package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GramMatrixAgg
import graft.sources.Tables

/** Statistical / time-series operators: the numeric-analysis layer the
  * reference's dashboard (`/root/reference/app.py:80-84` recomputes
  * mean/sum cards per refresh) grows into once users ask "how do these
  * measures RELATE" rather than "what is their level" — correlation
  * structure, trends, distribution shape, smoothing, streaks, and gap
  * repair.
  *
  * Scale shapes (the part that must survive 1000 executors):
  *   - corr_matrix: ONE scan + a model-sized mergeable Gram partial per
  *     partition ([[graft.functions.GramMatrixAgg]]) — the d×d second
  *     moment of a 100 TB fact table costs one reduce of ~d²/2 doubles;
  *     no per-pair pass, no shuffle of the fact table.
  *   - regr_trend / group_entropy: plain keyed aggregation — partial
  *     aggregates push to the map side, only group-sized state shuffles.
  *   - hist_equidepth / window_ewma / window_streaks: entity-partitioned
  *     windows (event_type / user_id) — per-key state is bounded, keys
  *     parallelize; no global sort anywhere.
  *   - resample_interp: per-user day spine + frame-bounded
  *     ignore-nulls carries, the interpolation twin of resample_ffill.
  *
  * Determinism: every double that crosses the oracle boundary is
  * `round(…, 6) + 0.0` (the repo-wide −0.0 normalization); orderings are
  * total (unique tie-break column in every ORDER BY).
  */
object StatsOps {

  private def ev(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), unix_micros(col("ts")).as("us"),
        to_date(col("ts")).as("day"))

  private def r6(c: Column): Column = round(c, 6) + lit(0.0d)

  /** Explicit middle-pair median of `v`, one row per `keys` combination
    * (global when `keys` is empty): order, take rows (m+1)÷2 and
    * (m+2)÷2, average — identical arithmetic in DuckDB, so no engine
    * quantile-interpolation implementation ever enters an oracle
    * compare. Shared by stats_theilsen and anomaly_seasonal. Integer
    * `div`, not Column./ — the latter is DOUBLE division on longs, and
    * an even m would yield k+0.5, matching neither middle row. */
  private def explicitMedian(df: DataFrame, v: String,
      keys: Seq[String]): DataFrame = {
    val part =
      if (keys.isEmpty) Window.partitionBy(lit(1))
      else Window.partitionBy(keys.map(col): _*)
    val ranked = df
      .withColumn("rn", row_number().over(part.orderBy(col(v))))
      .withColumn("m", count(lit(1)).over(part))
      .filter(col("rn") === expr("(m + 1) div 2") ||
        col("rn") === expr("(m + 2) div 2"))
    if (keys.isEmpty) ranked.agg(avg(col(v)).as(v))
    else ranked.groupBy(keys.map(col): _*).agg(avg(col(v)).as(v))
  }

  // ── full Pearson correlation matrix over lineitem's measures in ONE
  // pass: graft_gram accumulates n, Σxᵢ and the Σxᵢxⱼ upper triangle as a
  // single mergeable aggregate, and the 6 pairwise correlations are pure
  // arithmetic on the resulting 1-row array — where a naive corr(a,b)
  // per pair either rescans or at best re-aggregates per pair, this is
  // one scan + one ~120-byte reduce regardless of table size. corr is
  // scale-factor-invariant, so the population-moment form here equals
  // DuckDB's sample corr exactly (the n/(n−1) factors cancel). ──
  private val CorrCols =
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  def statsCorrMatrix(spark: SparkSession, dir: String): DataFrame = {
    val d = CorrCols.length
    val g1 = Tables.lineitem(spark, dir)
      .select(array(CorrCols.map(c => col(c).cast("double")): _*).as("v"))
      .agg(GramMatrixAgg(col("v"), d).as("g"))
    def el(k: Int): Column = element_at(col("g"), k + 1)
    val n = el(0)
    def s(i: Int): Column = el(1 + i)
    def gram(i: Int, j: Int): Column =
      el(1 + d + i * d - i * (i - 1) / 2 + (j - i)) // upper-tri flat index
    def cov(i: Int, j: Int): Column =
      gram(i, j) / n - (s(i) / n) * (s(j) / n)
    val pairs = for {
      i <- 0 until d; j <- (i + 1) until d
    } yield struct(
      lit(CorrCols(i)).as("col_a"), lit(CorrCols(j)).as("col_b"),
      r6(cov(i, j) / sqrt(cov(i, i) * cov(j, j))).as("r"))
    g1.select(explode(array(pairs: _*)).as("p"))
      .select(col("p.col_a").as("col_a"), col("p.col_b").as("col_b"),
        col("p.r").as("r"))
      .orderBy("col_a", "col_b")
  }

  // ── per-group OLS trend: slope / intercept / R² of `value` against the
  // event's day number, per event_type — "is this metric drifting, and
  // how fast". Uses the engine's codegen'd regression aggregates
  // (regr_slope/…): single keyed aggregation, partial-aggregated
  // map-side, so the fact table shuffles only 5 tiny moment tuples. ──
  def regrTrend(spark: SparkSession, dir: String): DataFrame =
    ev(spark, dir)
      .select(col("event_type"), col("value"),
        expr("CAST(us div 86400000000 AS DOUBLE)").as("x"))
      .groupBy(col("event_type"))
      .agg(r6(expr("regr_slope(value, x)")).as("slope"),
        r6(expr("regr_intercept(value, x)")).as("intercept"),
        r6(expr("regr_r2(value, x)")).as("r2"),
        expr("CAST(regr_count(value, x) AS BIGINT)").as("n"))
      .orderBy("event_type")

  // ── Shannon entropy of the language mix per source — the corpus-
  // diversity diagnostic an LLM-data curator tracks per provider (a
  // source whose entropy collapses started scraping one language).
  // Two keyed aggregations over group-sized frames; the natural-log
  // p·ln p sum is rounded once at the boundary. ──
  def groupEntropy(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.documents(spark, dir)
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("tot", sum(col("cnt")).over(Window.partitionBy("source")))
    c.groupBy(col("source"))
      .agg(count(lit(1)).as("n_langs"),
        first(col("tot")).as("n_docs"),
        r6(-sum((col("cnt") / col("tot")) * log(col("cnt") / col("tot"))))
          .as("entropy"))
      .orderBy("source")
  }

  // ── equi-depth histogram: 10 equal-count buckets of `value` per
  // event_type via ntile over a TOTAL order (value, event_id — the
  // tie-break makes bucket assignment deterministic), then per-bucket
  // lo/hi/count. The windows are entity-partitioned, so unlike a global
  // ntile this parallelizes per key; for a single global histogram at
  // scale, window_rank_family_scaled's bucketed rank reconstruction is
  // the drop-in form. Bounds pass through un-arithmetic'd → bit-exact. ──
  def histEquidepth(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value"), col("event_id"))
    ev(spark, dir)
      .select(col("event_type"), col("value"), col("event_id"))
      .withColumn("bucket", ntile(10).over(w).cast("long"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(min(col("value")).as("lo"), max(col("value")).as("hi"),
        count(lit(1)).as("cnt"))
      .orderBy("event_type", "bucket")
  }

  /** [[windowEwma]] truncation: weights beyond 49 lags are ≤ 0.9⁵⁰ ≈
    * 0.5%, below the 6-dp output rounding for this data's magnitudes —
    * so a 50-row frame gives the exact same rounded answer as the
    * unbounded recurrence while keeping per-row state O(1). */
  private val EwmaLags = 49
  private val EwmaDecay = "0.9D"

  // ── exponentially-weighted moving average per user (decay 0.9,
  // normalized weights — pandas `ewm(alpha=0.1, adjust=True)`): the
  // smoothing primitive behind every "trend line" card. One shuffle onto
  // user_id, then a 50-row frame collected in event-time order and
  // reduced by codegen'd higher-order functions — no self-join, no
  // per-row UDF. The truncated closed form makes the recurrence
  // expressible as a frame aggregate (windowed sums can't carry
  // position-dependent weights), which is what lets it run as ONE
  // window pass at any scale. ──
  def windowEwma(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
      .rowsBetween(-EwmaLags, 0)
    ev(spark, dir)
      .select(col("event_id"), col("user_id"), col("us"), col("value"))
      .withColumn("hist", collect_list(col("value")).over(w))
      .withColumn("ewma", expr(
        s"""round(
           |  aggregate(
           |    transform(hist,
           |      (x, i) -> x * pow($EwmaDecay, size(hist) - 1 - i)),
           |    0D, (a, b) -> a + b)
           |  / ((1.0D - pow($EwmaDecay, CAST(size(hist) AS DOUBLE))) / 0.1D),
           |6) + 0.0D""".stripMargin))
      .select(col("event_id"), col("user_id"), col("ewma"))
      .orderBy("user_id", "event_id")
  }

  // ── gaps-and-islands: consecutive-day activity streaks per user via
  // the classic day−row_number island key — pure integer arithmetic
  // (bit-exact in any engine), one shuffle on user_id, per-user state
  // bounded by distinct active days. ──
  def windowStreaks(spark: SparkSession, dir: String): DataFrame = {
    val byDay = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val islands = ev(spark, dir)
      .select(col("user_id"), col("day")).distinct()
      .withColumn("grp",
        expr("datediff(day, DATE'1970-01-01')") - row_number().over(byDay))
      .groupBy(col("user_id"), col("grp"))
      .agg(count(lit(1)).as("len"))
    islands.groupBy(col("user_id"))
      .agg(max(col("len")).as("longest_streak"),
        count(lit(1)).as("n_streaks"),
        sum(col("len")).as("active_days"))
      .orderBy("user_id")
  }

  // ── linear-interpolation resample: the imputation twin of
  // resample_ffill for VALUE series where a straight-line estimate beats
  // carrying the last level. Same per-user day spine + left join; the
  // fill is two frame-bounded IGNORE NULLS carries (previous / next
  // known point, each dragging its day along) and a pure-arithmetic
  // lerp — no self-join against known points. Spine endpoints are known
  // by construction (min/max come from observed days), so every gap has
  // both neighbors. ──
  def resampleInterp(spark: SparkSession, dir: String): DataFrame = {
    val daily = ev(spark, dir)
      .groupBy(col("user_id"), col("day"))
      .agg(avg(col("value")).as("v"))
    val grid = daily.groupBy(col("user_id"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("user_id"),
        explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    val byDay = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val prevF = byDay.rowsBetween(Window.unboundedPreceding, -1)
    val nextF = byDay.rowsBetween(1, Window.unboundedFollowing)
    grid.join(daily, Seq("user_id", "day"), "left")
      .withColumn("pv", last(col("v"), ignoreNulls = true).over(prevF))
      .withColumn("pd", last(when(col("v").isNotNull, col("day")),
        ignoreNulls = true).over(prevF))
      .withColumn("nv", first(col("v"), ignoreNulls = true).over(nextF))
      .withColumn("nd", first(when(col("v").isNotNull, col("day")),
        ignoreNulls = true).over(nextF))
      .select(col("user_id"),
        date_format(col("day"), "yyyy-MM-dd").as("day_s"),
        when(col("v").isNotNull, r6(col("v")))
          .otherwise(r6(col("pv") + (col("nv") - col("pv")) *
            (datediff(col("day"), col("pd")).cast("double") /
              datediff(col("nd"), col("pd")).cast("double")))).as("val"),
        col("v").isNull.as("is_gap"))
      .orderBy("user_id", "day_s")
  }

  // ── Welch's two-sample t-test between every pair of event types on
  // `value` — "are these two segments' means actually different". One
  // keyed aggregation produces the 5-row (n, mean, var) frame; the pair
  // grid is a self-join of that TINY frame (never of the fact table), so
  // the fact table is scanned once regardless of how many pairs are
  // tested. t and the Welch–Satterthwaite df are pure arithmetic on the
  // moments. ──
  def statsTtest(spark: SparkSession, dir: String): DataFrame = {
    val m = ev(spark, dir).groupBy(col("event_type"))
      .agg(count(lit(1)).cast("double").as("n"),
        avg(col("value")).as("m"), var_samp(col("value")).as("v"))
    val a = m.select(col("event_type").as("type_a"), col("n").as("na"),
      col("m").as("ma"), col("v").as("va"))
    val b = m.select(col("event_type").as("type_b"), col("n").as("nb"),
      col("m").as("mb"), col("v").as("vb"))
    val se2 = col("va") / col("na") + col("vb") / col("nb")
    a.crossJoin(b).filter(col("type_a") < col("type_b"))
      .select(col("type_a"), col("type_b"),
        r6((col("ma") - col("mb")) / sqrt(se2)).as("t_stat"),
        r6(se2 * se2 / (
          (col("va") / col("na")) * (col("va") / col("na")) / (col("na") - 1) +
            (col("vb") / col("nb")) * (col("vb") / col("nb")) / (col("nb") - 1)))
          .as("df"))
      .orderBy("type_a", "type_b")
  }

  // ── χ² test of independence: event_type × day-of-week (the portable
  // `days-since-epoch mod 7` — identical integer arithmetic in any
  // engine, unlike locale-dependent DOW functions). The observed grid is
  // one keyed aggregation; expected counts come from the row/column
  // marginals of that ~35-row frame, INCLUDING structurally-zero cells
  // (the marginal cross join rebuilds them — dropping empty cells would
  // understate χ²). Everything after the one fact-table scan is
  // arithmetic on group-sized frames. ──
  def statsChi2(spark: SparkSession, dir: String): DataFrame = {
    val o = ev(spark, dir)
      .select(col("event_type"),
        expr("pmod(datediff(day, DATE'1970-01-01'), 7)").as("dow"))
      .groupBy(col("event_type"), col("dow"))
      .agg(count(lit(1)).as("o"))
    val rowT = o.groupBy(col("event_type")).agg(sum(col("o")).as("rt"))
    val colT = o.groupBy(col("dow")).agg(sum(col("o")).as("ct"))
    val n = o.agg(sum(col("o")).as("n"))
    val grid = rowT.crossJoin(colT).crossJoin(broadcast(n))
      .join(o, Seq("event_type", "dow"), "left")
      .select(col("event_type"), col("dow"),
        coalesce(col("o"), lit(0L)).as("o"),
        (col("rt").cast("double") * col("ct") / col("n")).as("e"),
        col("rt"), col("ct"), col("n"))
    grid.agg(
      r6(sum((col("o") - col("e")) * (col("o") - col("e")) / col("e")))
        .as("chi2"),
      ((countDistinct(col("event_type")) - 1) *
        (countDistinct(col("dow")) - 1)).as("df"),
      first(col("n")).as("n"))
  }

  // ── rolling z-score anomaly: each value against its own trailing
  // 20-event window's mean/σ (the self-adapting threshold — unlike
  // anomaly_mad's global per-type stats, this tracks drift). Entity-
  // partitioned frame; only rows with a FULL window are emitted, so
  // every engine computes the identical frame. σ rounded before the
  // comparison so both engines take the same branch at the 3σ line. ──
  def windowRollingZscore(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id")).rowsBetween(-19, 0)
    ev(spark, dir)
      .select(col("event_id"), col("user_id"), col("us"), col("value"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))))
      .withColumn("m", avg(col("value")).over(w))
      .withColumn("s", stddev_samp(col("value")).over(w))
      .filter(col("rn") >= 20 && col("s") > 0)
      .withColumn("z", r6((col("value") - col("m")) / col("s")))
      // the 3σ branch tests the ROUNDED z, so both engines agree at the line
      .select(col("event_id"), col("user_id"), col("z"),
        (abs(col("z")) > 3).as("is_out"))
      .orderBy("user_id", "event_id")
  }

  // ── autocorrelation function of the daily total value series at lags
  // 1..7 — the "is there weekly structure" diagnostic that decides
  // whether seasonal_dow is worth modeling. The daily series is built
  // ONCE with a decimal-exact sum (order-independent), then each lag is
  // a co-partitioned self-join on the shifted calendar day; gap days
  // simply drop out of both sides identically. Pearson per lag comes
  // from decimal moment sums (the statsCorr discipline), so both
  // engines do the identical integer-like arithmetic and ONE final
  // rounded division chain. The series is one row per day — tiny — but
  // the same plan holds for a per-entity ACF at any cardinality (swap
  // the join/group keys). ──
  def statsAcf(spark: SparkSession, dir: String): DataFrame = {
    val daily = ev(spark, dir).groupBy(col("day"))
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("v"))
    val lagged = daily
      .withColumn("lag", explode(sequence(lit(1), lit(7))))
      .withColumn("prev_day", date_sub(col("day"), col("lag")))
      .join(daily.select(col("day").as("prev_day"), col("v").as("pv")),
        "prev_day")
    // daily totals carry exactly 2 decimals: DECIMAL(18,2) is lossless and
    // keeps products inside width 38 in BOTH engines (28,6)² would spill
    // DuckDB to double and reintroduce order-dependence)
    val x = col("v").cast("decimal(18,2)")
    val y = col("pv").cast("decimal(18,2)")
    val nD = col("n").cast("double")
    lagged.groupBy(col("lag").cast("long").as("lag"))
      .agg(count(lit(1)).as("n"),
        sum(x).cast("double").as("sx"), sum(y).cast("double").as("sy"),
        sum(x * y).cast("double").as("sxy"),
        sum(x * x).cast("double").as("sxx"),
        sum(y * y).cast("double").as("syy"))
      .select(col("lag"), col("n"),
        r6((nD * col("sxy") - col("sx") * col("sy")) /
          sqrt((nD * col("sxx") - col("sx") * col("sx")) *
            (nD * col("syy") - col("sy") * col("sy")))).as("acf"))
      .orderBy("lag")
  }

  // ── partial autocorrelation of the same daily series at lags 1..3 —
  // the AR-order-selection companion of stats_acf: the ACF says "is
  // there memory", the PACF says "how many AR terms carry it" (φkk ≈ 0
  // beyond the true order). Lag correlations reuse stats_acf's
  // exact-decimal lagged-pair device verbatim (calendar join,
  // DECIMAL(18,2) moments, r snapped to 6 dp); the Durbin–Levinson
  // recursion through order 3 — φ11 = r1, φ22 = (r2−r1²)/(1−r1²),
  // φ21 = r1 − φ22·r1, φ33 = (r3 − φ21·r2 − φ22·r1)/(1 − φ21·r1 −
  // φ22·r2) — is then pure scalar arithmetic on a 1-row frame, written
  // with the SAME token sequence in both engines so every derived
  // double is bit-identical. The ±2/√n white-noise band gives the
  // significance flag. ──
  def statsPacf(spark: SparkSession, dir: String): DataFrame = {
    val daily = ev(spark, dir).groupBy(col("day"))
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("v"))
    val lagged = daily
      .withColumn("lag", explode(sequence(lit(1), lit(3))))
      .withColumn("prev_day", date_sub(col("day"), col("lag")))
      .join(daily.select(col("day").as("prev_day"), col("v").as("pv")),
        "prev_day")
    val x = col("v").cast("decimal(18,2)")
    val y = col("pv").cast("decimal(18,2)")
    val nD = col("n").cast("double")
    val rk = lagged.groupBy(col("lag"))
      .agg(count(lit(1)).as("n"),
        sum(x).cast("double").as("sx"), sum(y).cast("double").as("sy"),
        sum(x * y).cast("double").as("sxy"),
        sum(x * x).cast("double").as("sxx"),
        sum(y * y).cast("double").as("syy"))
      .select(col("lag"),
        r6((nD * col("sxy") - col("sx") * col("sy")) /
          sqrt((nD * col("sxx") - col("sx") * col("sx")) *
            (nD * col("syy") - col("sy") * col("sy")))).as("r"))
    val nDays = daily.agg(count(lit(1)).as("n_days"))
    rk.agg(max(when(col("lag") === 1, col("r"))).as("r1"),
        max(when(col("lag") === 2, col("r"))).as("r2"),
        max(when(col("lag") === 3, col("r"))).as("r3"))
      .crossJoin(broadcast(nDays))
      .withColumn("phi22", expr("(r2 - r1 * r1) / (1.0 - r1 * r1)"))
      .withColumn("phi21", expr("r1 - phi22 * r1"))
      .withColumn("phi33", expr(
        "(r3 - phi21 * r2 - phi22 * r1)" +
          " / (1.0 - phi21 * r1 - phi22 * r2)"))
      .withColumn("band", r6(expr(
        "2.0 / sqrt(cast(n_days as double))")))
      .select(explode(array(
        struct(lit(1L).as("lag"), col("r1").as("acf"),
          col("r1").as("pacf")),
        struct(lit(2L).as("lag"), col("r2").as("acf"),
          r6(col("phi22")).as("pacf")),
        struct(lit(3L).as("lag"), col("r3").as("acf"),
          r6(col("phi33")).as("pacf")))).as("p"),
        col("n_days"), col("band"))
      .select(col("p.lag").as("lag"), col("n_days"), col("p.acf").as("acf"),
        col("p.pacf").as("pacf"), col("band").as("band_95"),
        (abs(col("p.pacf")) > col("band")).as("significant"))
      .orderBy("lag")
  }

  // ── CUSUM drift detection per user: the one-sided cumulative-sum
  // statistic S_t = max(0, S_{t-1} + (x_t − μ − k)) — which looks like an
  // un-windowable recurrence but has the exact closed form
  // S_t = P_t − min_{j≤t} P_j over the prefix sums P of the slack-adjusted
  // deviations. That identity is what makes CUSUM a TWO-WINDOW-PASS
  // operator (running sum + running min) instead of a sequential scan —
  // the whole point at scale. μ and σ come from decimal moment sums and
  // are ROUNDED before use; the deviations are then exact decimals, so
  // the running sum/min are integer-exact in both engines regardless of
  // how each engine associates its window aggregation. k = σ/2 (the
  // standard half-sigma slack), alarm at S > 5σ. ──
  def windowCusum(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
    val tl = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val base = ev(spark, dir)
      .select(col("event_id"), col("user_id"), col("us"),
        col("value").cast("decimal(18,2)").as("v"))
      .withColumn("n", count(lit(1)).over(byUser))
      .withColumn("sx", sum(col("v")).over(byUser))
      .withColumn("sxx", sum(col("v") * col("v")).over(byUser))
      .filter(col("n") >= 2)
      .withColumn("mu6", r6(col("sx").cast("double") / col("n"))
        .cast("decimal(24,6)"))
      .withColumn("sd6", r6(sqrt(
        (col("n").cast("double") * col("sxx").cast("double") -
          col("sx").cast("double") * col("sx").cast("double")) /
          (col("n").cast("double") * (col("n").cast("double") - 1))))
        .cast("decimal(24,6)"))
      .filter(col("sd6") > 0)
      // slack k = σ/2, exact at scale 7; dev is a pure decimal
      .withColumn("dev",
        col("v") - col("mu6") - col("sd6") * lit(BigDecimal("0.5")))
    base
      .withColumn("p", sum(col("dev")).over(tl))
      .withColumn("m", min(col("p")).over(tl))
      .withColumn("s", r6((col("p") - col("m")).cast("double") /
        col("sd6").cast("double")))
      .select(col("event_id"), col("user_id"), col("s"),
        (col("s") > 5).as("alarm"))
      .orderBy("user_id", "event_id")
  }

  /** [[statsKs]] samples: the two behavioral distributions compared. */
  private val KsTypeA = "click"
  private val KsTypeB = "purchase"

  // ── two-sample Kolmogorov–Smirnov: D = sup |F₁ − F₂| between the value
  // distributions of two event types. ECDFs are evaluated only at
  // observed values (where the sup is attained): group by value ONCE,
  // running integer counts per sample over the value order, one max.
  // Counts are integers, so the only doubles are two divisions and the
  // final λ = D·√(n₁n₂/(n₁+n₂)) — rounded at the boundary. Scale shape:
  // one shuffle onto the value grid; the running counts parallelize per
  // range partition. ──
  def statsKs(spark: SparkSession, dir: String): DataFrame = {
    val g = ev(spark, dir)
      .filter(col("event_type").isin(KsTypeA, KsTypeB))
      .groupBy(col("value"))
      .agg(sum(when(col("event_type") === KsTypeA, 1L).otherwise(0L)).as("a"),
        sum(when(col("event_type") === KsTypeB, 1L).otherwise(0L)).as("b"))
    // the cumulative pass runs over the GROUPED value grid (≤ |distinct
    // values| rows — the 2-dp metric domain), not the raw events; a
    // global ECDF over an unbounded domain would use the bucketed rank
    // reconstruction of window_rank_family_scaled instead
    val byVal = Window.orderBy(col("value"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = g.withColumn("ca", sum(col("a")).over(byVal))
      .withColumn("cb", sum(col("b")).over(byVal))
    val tot = g.agg(sum(col("a")).as("n1"), sum(col("b")).as("n2"))
    cum.crossJoin(broadcast(tot))
      .groupBy(col("n1"), col("n2"))
      .agg(max(abs(col("ca").cast("double") / col("n1") -
        col("cb").cast("double") / col("n2"))).as("d"))
      .select(col("n1"), col("n2"), r6(col("d")).as("d_stat"),
        r6(col("d") * sqrt(col("n1").cast("double") * col("n2") /
          (col("n1") + col("n2")))).as("lambda"))
  }

  // ── Mann–Whitney U (two-sample rank-sum) between the same two value
  // distributions statsKs compares — the nonparametric location test that
  // complements KS's shape test. Ranks never materialize per row: on the
  // grouped value grid, a tie group spanning ranks
  // (cumBefore, cumBefore+t] has average rank cumBefore + (t+1)/2, so
  // U = Σ a·avgrank − n₁(n₁+1)/2 comes from ONE running count over the
  // grid (group-sized, like statsKs). The z-score uses the standard
  // tie-corrected variance n₁n₂/12·((N+1) − Σ(t³−t)/(N(N−1))). All sums
  // are integer-or-dyadic (·.5) arithmetic — exact in both engines —
  // and rounded once at the boundary. ──
  def statsMannWhitney(spark: SparkSession, dir: String): DataFrame = {
    val g = ev(spark, dir)
      .filter(col("event_type").isin(KsTypeA, KsTypeB))
      .groupBy(col("value"))
      .agg(sum(when(col("event_type") === KsTypeA, 1L).otherwise(0L)).as("a"),
        sum(when(col("event_type") === KsTypeB, 1L).otherwise(0L)).as("b"))
      .withColumn("t", col("a") + col("b"))
    val byVal = Window.orderBy(col("value"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = g.withColumn("cum_before",
      coalesce(sum(col("t")).over(byVal), lit(0L)))
    val tot = g.agg(sum(col("a")).as("n1"), sum(col("b")).as("n2"),
      sum(col("t") * col("t") * col("t") - col("t")).as("tie3"))
    ranked.crossJoin(broadcast(tot))
      .groupBy(col("n1"), col("n2"), col("tie3"))
      .agg(sum(col("a").cast("double") *
        (col("cum_before") + (col("t") + 1).cast("double") / 2)).as("r1"))
      .select(col("n1"), col("n2"),
        (col("r1") - col("n1").cast("double") * (col("n1") + 1) / 2).as("u1"),
        col("tie3"))
      .select(col("n1"), col("n2"), col("u1"),
        (col("n1").cast("double") * col("n2") - col("u1")).as("u2"),
        col("tie3"))
      .select(col("n1"), col("n2"),
        r6(col("u1")).as("u1"), r6(col("u2")).as("u2"),
        r6((col("u1") - col("n1").cast("double") * col("n2") / 2) /
          sqrt(col("n1").cast("double") * col("n2") / 12 *
            ((col("n1") + col("n2") + 1).cast("double") -
              col("tie3").cast("double") /
                ((col("n1") + col("n2")).cast("double") *
                  (col("n1") + col("n2") - 1))))).as("z"))
  }

  // ── Brunner–Munzel test between the click/purchase value
  // distributions: the rank test that drops Mann–Whitney's hidden
  // equal-variance assumption (under unequal spreads U's null is wrong
  // even when medians agree — the Behrens–Fisher problem in rank
  // form). Everything reduces on the exact-cents value GRID with the
  // doubled-midrank identity (combined D = 2F+t+1, within-group
  // Dᵢ = 2Fᵢ+tᵢ+1 — all integers); the rank-variance moments Σc·u,
  // Σc·u² accumulate in DECIMAL(38,0) so no corpus size overflows
  // them, and W, the Satterthwaite df and the normal-approximation
  // two-sided p (df is reported so a reader can judge the t≈Φ step)
  // are single cast-first expressions. Only grid-sized windows run. ──
  def statsBrunnerMunzel(spark: SparkSession, dir: String): DataFrame = {
    val g = ev(spark, dir)
      .filter(col("event_type").isin(KsTypeA, KsTypeB))
      .groupBy(col("value"))
      .agg(sum(when(col("event_type") === KsTypeA, 1L).otherwise(0L))
        .as("a"),
        sum(when(col("event_type") === KsTypeB, 1L).otherwise(0L))
          .as("b"))
      .withColumn("t", col("a") + col("b"))
    val byVal = Window.orderBy(col("value"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val r = g
      .withColumn("f", coalesce(sum(col("t")).over(byVal), lit(0L)))
      .withColumn("fa", coalesce(sum(col("a")).over(byVal), lit(0L)))
      .withColumn("fb", coalesce(sum(col("b")).over(byVal), lit(0L)))
      .withColumn("dd", expr("2 * f + t + 1"))
      .withColumn("ua", expr("dd - (2 * fa + a + 1)"))
      .withColumn("ub", expr("dd - (2 * fb + b + 1)"))
    val m = r.agg(sum(col("a")).as("n1"), sum(col("b")).as("n2"),
      sum(expr("CAST(a AS DECIMAL(38,0)) * dd")).as("ad"),
      sum(expr("CAST(b AS DECIMAL(38,0)) * dd")).as("bd"),
      sum(expr("CAST(a AS DECIMAL(38,0)) * ua")).as("au1"),
      sum(expr("CAST(a AS DECIMAL(38,0)) * ua * ua")).as("au2"),
      sum(expr("CAST(b AS DECIMAL(38,0)) * ub")).as("bu1"),
      sum(expr("CAST(b AS DECIMAL(38,0)) * ub * ub")).as("bu2"))
    m.withColumn("rbar1", expr("cast(ad as double) / (2 * n1)"))
      .withColumn("rbar2", expr("cast(bd as double) / (2 * n2)"))
      .withColumn("ma", expr("cast(ad as double) / n1 - (n1 + 1)"))
      .withColumn("mb", expr("cast(bd as double) / n2 - (n2 + 1)"))
      .withColumn("s1", expr(
        "(cast(au2 as double) - 2 * ma * cast(au1 as double)" +
          " + n1 * ma * ma) / (4 * (cast(n1 as double) - 1))"))
      .withColumn("s2", expr(
        "(cast(bu2 as double) - 2 * mb * cast(bu1 as double)" +
          " + n2 * mb * mb) / (4 * (cast(n2 as double) - 1))"))
      .withColumn("w", expr(
        "cast(n1 as double) * n2 * (rbar2 - rbar1) / (n1 + n2)" +
          " / sqrt(n1 * s1 + n2 * s2)"))
      .withColumn("aw", abs(col("w")))
      .withColumn("p2", r6(expr(s"2.0 * (1.0 - ${phiSql("aw")})")))
      .select(col("n1"), col("n2"),
        r6(expr("(rbar2 - (n2 + 1) / 2.0) / n1")).as("p_hat"),
        r6(col("w")).as("w_stat"),
        r6(expr(
          "(n1 * s1 + n2 * s2) * (n1 * s1 + n2 * s2)" +
            " / ((n1 * s1) * (n1 * s1) / (cast(n1 as double) - 1)" +
            " + (n2 * s2) * (n2 * s2) / (cast(n2 as double) - 1))"))
          .as("df"),
        col("p2").as("p_two"),
        (col("p2") < lit(0.05d)).as("significant"))
  }

  // ── Mood's two-sample SCALE test (click vs purchase values): scores
  // each observation by its squared distance from the mid-rank center,
  // (R − (N+1)/2)², so it detects SPREAD differences where
  // Mann–Whitney detects location — the rank-based competitor to
  // stats_ansari_bradley, kept because the two weigh the tails
  // differently (Mood quadratically — more tail-sensitive). In doubled
  // midranks the score is the exact INTEGER (D − (N+1))² = 4·score, so
  // T accumulates in DECIMAL(38,0) on the cents value grid (midranks
  // stand in for ties; the null moments are the classical no-ties
  // forms, the standard practical approximation, noted here). One
  // grid-sized window + one reduce; z and p are single expressions. ──
  def statsMoodScale(spark: SparkSession, dir: String): DataFrame = {
    val g = ev(spark, dir)
      .filter(col("event_type").isin(KsTypeA, KsTypeB))
      .groupBy(col("value"))
      .agg(sum(when(col("event_type") === KsTypeA, 1L).otherwise(0L))
        .as("a"),
        sum(when(col("event_type") === KsTypeB, 1L).otherwise(0L))
          .as("b"))
      .withColumn("t", col("a") + col("b"))
    val byVal = Window.orderBy(col("value"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val r = g
      .withColumn("f", coalesce(sum(col("t")).over(byVal), lit(0L)))
      .withColumn("dd", expr("2 * f + t + 1"))
    val withN = r.crossJoin(broadcast(
        g.agg(sum(col("a") + col("b")).as("nn"))))
      .select(col("a"),
        expr("CAST(a AS DECIMAL(38,0)) * (dd - (nn + 1)) * (dd - (nn + 1))")
          .as("sc"), col("nn"))
      .agg(first(col("nn")).as("nn"),
        sum(col("a")).as("n1"), sum(col("sc")).as("t4"))
    withN
      .crossJoin(broadcast(g.agg(sum(col("b")).as("n2"))))
      .withColumn("e4", expr(
        "cast(n1 as double) * (cast(nn as double) * nn - 1) / 3"))
      .withColumn("v4", expr(
        "4.0 * (cast(n1 as double) * n2 * (nn + 1)" +
          " * (cast(nn as double) * nn - 4)) / 45"))
      .withColumn("z", expr("(cast(t4 as double) - e4) / sqrt(v4)"))
      .withColumn("az", abs(col("z")))
      .withColumn("p2", r6(expr(s"2.0 * (1.0 - ${phiSql("az")})")))
      .select(col("n1"), col("n2"),
        r6(expr("cast(t4 as double) / 4")).as("t_stat"),
        r6(expr("e4 / 4")).as("t_expected"),
        r6(col("z")).as("z"), col("p2").as("p_two"),
        (col("p2") < lit(0.05d)).as("significant"))
  }

  // ── two-sample Poisson rate comparison (click vs purchase arrivals
  // over the same day exposure): the conditional test — given N = n₁+n₂
  // events, n₁ ~ Bin(N, ½) under equal rates — reduces to
  // z = (n₁−n₂)/√N, with the rate ratio and its log-scale Wald CI
  // alongside (the "is this stream running hot" check a pipeline
  // monitor wants as one row). Counts are exact int64; z, ln RR and
  // the CI are single cast-first expressions; p through the shared Φ
  // polynomial. ──
  def statsPoissonRate(spark: SparkSession, dir: String): DataFrame =
    ev(spark, dir)
      .filter(col("event_type").isin(KsTypeA, KsTypeB))
      .agg(sum(when(col("event_type") === KsTypeA, 1L).otherwise(0L))
        .as("n1"),
        sum(when(col("event_type") === KsTypeB, 1L).otherwise(0L))
          .as("n2"),
        countDistinct(col("day")).as("n_days"))
      .withColumn("z", expr(
        "cast(n1 - n2 as double) / sqrt(cast(n1 + n2 as double))"))
      .withColumn("az", abs(col("z")))
      .withColumn("p2", r6(expr(s"2.0 * (1.0 - ${phiSql("az")})")))
      .withColumn("lnrr", expr(
        "ln(cast(n1 as double) / cast(n2 as double))"))
      .withColumn("se", expr(
        "sqrt(1.0 / cast(n1 as double) + 1.0 / cast(n2 as double))"))
      .select(col("n1"), col("n2"), col("n_days"),
        r6(expr("cast(n1 as double) / n_days")).as("rate_1"),
        r6(expr("cast(n2 as double) / n_days")).as("rate_2"),
        r6(expr("cast(n1 as double) / cast(n2 as double)"))
          .as("rate_ratio"),
        r6(col("z")).as("z"), col("p2").as("p_two"),
        r6(exp(expr("lnrr - 1.959964 * se"))).as("rr_ci_lo"),
        r6(exp(expr("lnrr + 1.959964 * se"))).as("rr_ci_hi"),
        (col("p2") < lit(0.05d)).as("significant"))

  // ── distribution-free confidence interval for the per-type daily
  // revenue MEDIAN: the binomial order-statistic interval (ranks
  // n/2 ∓ z√n/2) — no normality assumed anywhere, the robust
  // companion of stats_wilson_ci's proportion interval. Rank fences
  // floor the SAME double in both engines; the median itself is the
  // explicit middle pair; endpoint picks are window-free argmax-by-
  // rank reads on the day-grid frame. ──
  def statsMedianCi(spark: SparkSession, dir: String): DataFrame = {
    val daily = ev(spark, dir).groupBy(col("event_type"), col("day"))
      .agg((sum(col("value").cast("decimal(18,2)")) * 100).cast("long")
        .as("revc"))
    val wo = Window.partitionBy(col("event_type"))
      .orderBy(col("revc"), col("day"))
    daily
      .withColumn("rn", row_number().over(wo).cast("long"))
      .withColumn("n",
        count(lit(1)).over(Window.partitionBy(col("event_type"))))
      .withColumn("l", greatest(lit(1L), expr(
        "CAST(floor((cast(n as double)" +
          " - 1.959964 * sqrt(cast(n as double))) / 2) AS BIGINT)")))
      .withColumn("u", col("n") + 1 - col("l"))
      .groupBy(col("event_type"))
      .agg(first(col("n")).as("n_days"), first(col("l")).as("rank_lo"),
        first(col("u")).as("rank_hi"),
        avg(when(col("rn") === expr("(n + 1) div 2") ||
          col("rn") === expr("(n + 2) div 2"), col("revc"))).as("medc"),
        max(when(col("rn") === col("l"), col("revc"))).as("loc"),
        max(when(col("rn") === col("u"), col("revc"))).as("hic"))
      .select(col("event_type"), col("n_days"),
        r6(expr("medc / 100")).as("median"),
        col("rank_lo"), col("rank_hi"),
        r6(expr("cast(loc as double) / 100")).as("ci_lo"),
        r6(expr("cast(hic as double) / 100")).as("ci_hi"))
      .orderBy("event_type")
  }

  /** [[statsBootstrap]] resample count and the Poisson(1) CDF in ppm —
    * P(X≤k) for k=0..4, tail folded into weight 5 (P(X≥6) ≈ 6e-4). The
    * SAME integer constants appear in the DuckDB oracle, so the resample
    * weights are engine-identical by construction. */
  private val BootB = 32
  private val BootCdfPpm = Seq(367879, 735759, 919699, 981012, 996340)

  // ── bootstrap confidence interval for the mean, via the POISSON
  // bootstrap — the at-scale form: instead of drawing B independent
  // n-row resamples (undistributable), each row contributes to resample
  // b with multiplicity w ~ Poisson(1), approximated by thresholding the
  // portable Knuth-multiplicative uniform of (event_id, b) against the
  // Poisson CDF. ONE scan fans out ×B (the inherent bootstrap cost,
  // linear in B and embarrassingly parallel), per-resample means are
  // keyed aggregations of decimal-exact sums, and the CI is a percentile
  // over the B-row means frame. Every weight is integer-deterministic in
  // both engines; means are rounded before the interpolating percentile
  // so the CI arithmetic runs on identical doubles. ──
  def statsBootstrap(spark: SparkSession, dir: String): DataFrame = {
    val e = ev(spark, dir)
      .select(col("event_id"), col("value").cast("decimal(18,2)").as("v"))
    val Seq(p0, p1, p2, p3, p4) = BootCdfPpm
    val weighted = e
      .select(col("event_id"), col("v"),
        explode(expr(s"sequence(0, ${BootB - 1})")).as("b"))
      .withColumn("u", expr(s"pmod(pmod(event_id, 2147483648) * $BootB + b," +
        " 2147483648) * 2654435761 % 2147483648 % 1000000"))
      .withColumn("w", when(col("u") < p0, 0).when(col("u") < p1, 1)
        .when(col("u") < p2, 2).when(col("u") < p3, 3)
        .when(col("u") < p4, 4).otherwise(5))
    val means = weighted.groupBy(col("b"))
      .agg(r6(sum(col("v") * col("w")).cast("double") / sum(col("w")))
        .as("m"))
    means.agg(count(lit(1)).as("n_resamples"),
      r6(expr("percentile(m, 0.025)")).as("ci_lo"),
      r6(expr("percentile(m, 0.5)")).as("ci_med"),
      r6(expr("percentile(m, 0.975)")).as("ci_hi"),
      r6(min(col("m"))).as("mn"), r6(max(col("m"))).as("mx"))
  }

  // ── additive seasonal decomposition of the daily value series:
  // value = trend (centered 7-day moving average) + seasonal (per-weekday
  // mean of the detrended series) + residual. Only days with a FULL
  // ±3-day window are decomposed, so every engine sees identical frames.
  // The daily series and the detrended deviations are exact decimals
  // (trend is rounded before subtraction), making the per-weekday means
  // order-independent; each output double is rounded once. ──
  def seasonalDecompose(spark: SparkSession, dir: String): DataFrame = {
    val w7 = Window.orderBy(col("day")).rowsBetween(-3, 3)
    val daily = ev(spark, dir).groupBy(col("day"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("vd"))
    val trended = daily
      .withColumn("cnt7", count(lit(1)).over(w7))
      .withColumn("trend6", r6(sum(col("vd")).over(w7).cast("double") / 7)
        .cast("decimal(24,6)"))
      .filter(col("cnt7") === 7)
      .withColumn("dow", dayofweek(col("day")))
      .withColumn("det", col("vd") - col("trend6"))
    val seasonal = trended.groupBy(col("dow"))
      .agg((round(sum(col("det")).cast("double") / count(lit(1)), 6) + lit(0.0d))
        .as("seasonal"))
    trended.join(broadcast(seasonal), "dow")
      .select(col("day"), col("vd").cast("double").as("v"),
        col("trend6").cast("double").as("trend"), col("seasonal"),
        r6(col("det").cast("double") - col("seasonal")).as("resid"))
      .orderBy("day")
  }

  // ── STL strength-of-components per event type (Hyndman's Fₜ/Fₛ):
  // ONE number each for "how much of this series is trend" and "how
  // much is weekly seasonality" — the triage that says whether
  // forecast_holt (trend) or forecast_holt_winters (seasonal) is the
  // right model before fitting either. Same decomposition recipe as
  // seasonal_decompose (centered 7-day trend on full windows, dow-mean
  // seasonal at 6 dp) but per type, and every component stays an EXACT
  // DECIMAL (resid = det − seasonal is decimal arithmetic, never a
  // rounded double), so the three variance moment-sets sum exactly and
  // each strength is pure IEEE arithmetic at the boundary. ──
  def statsStlStrength(spark: SparkSession, dir: String): DataFrame = {
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val w7 = wOrd.rowsBetween(-3, 3)
    val daily = ev(spark, dir).groupBy(col("event_type"), col("day"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("vd"))
    val trended = daily
      .withColumn("cnt7", count(lit(1)).over(w7))
      .withColumn("trend6",
        r6(sum(col("vd")).over(w7).cast("double") / 7)
          .cast("decimal(24,6)"))
      .filter(col("cnt7") === 7)
      .withColumn("dow", dayofweek(col("day")))
      .withColumn("det", expr("CAST(vd - trend6 AS DECIMAL(18,6))"))
    val seasonal = trended.groupBy(col("event_type"), col("dow"))
      .agg((round(sum(col("det")).cast("double") / count(lit(1)), 6)
        + lit(0.0d)).cast("decimal(18,6)").as("seas"))
    // square at (18,6)×(18,6) = (37,12) — inside Spark's width-38 cap,
    // so the product keeps scale 12 exactly. (Widening an operand past
    // 19 digits would push precision over 38 and Spark silently RESCALES
    // the product to 6 dp while DuckDB keeps 12 — a 1e-6 divergence; the
    // oracle side instead widens ONE operand to int128 storage, which
    // DuckDB caps to (38,12) without the int64 runtime overflow.)
    def mom(c: String) = Seq(
      sum(col(c)).as(s"s_$c"),
      sum(expr(s"CAST($c AS DECIMAL(18,6)) * CAST($c AS DECIMAL(18,6))"))
        .as(s"q_$c"))
    val comp = trended.join(broadcast(seasonal), Seq("event_type", "dow"))
      .withColumn("resid", expr("CAST(det - seas AS DECIMAL(18,6))"))
      .withColumn("des", expr("CAST(vd - seas AS DECIMAL(18,6))"))
    def varOf(c: String) = expr(
      s"(n * cast(q_$c as double) - cast(s_$c as double)" +
        s" * cast(s_$c as double)) / (cast(n as double) * (n - 1))")
    comp.groupBy(col("event_type"))
      .agg((Seq(count(lit(1)).as("n")) ++ mom("resid") ++ mom("det") ++
        mom("des")).head,
        (Seq(count(lit(1)).as("n")) ++ mom("resid") ++ mom("det") ++
          mom("des")).tail: _*)
      .select(col("event_type"), col("n").as("n_days"),
        r6(varOf("resid")).as("var_resid"),
        r6(varOf("det")).as("var_detrended"),
        r6(varOf("des")).as("var_deseasonalized"),
        r6(greatest(lit(0.0d),
          lit(1.0d) - varOf("resid") / varOf("des")))
          .as("trend_strength"),
        r6(greatest(lit(0.0d),
          lit(1.0d) - varOf("resid") / varOf("det")))
          .as("seasonal_strength"))
      .orderBy("event_type")
  }

  // ── floor-trader pivot points per event type: yesterday's bar sets
  // today's pivot grid (P = (H+L+C)/3, R1/S1 = 2P∓L/H, R2/S2 = P±range)
  // — the reference-level ladder intraday dashboards draw before the
  // session opens, on the same integer OHLC-ish bars as window_atr.
  // Everything is integer cents until the /3-grid maps; the position
  // flag compares the close against the 6-dp pivot. ──
  def windowPivotPoints(spark: SparkSession, dir: String): DataFrame = {
    val bars = ev(spark, dir)
      .withColumn("vc",
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"))
      .groupBy(col("event_type"), col("day"))
      .agg(max(col("vc")).as("h"), min(col("vc")).as("l"),
        max(struct(col("us"), col("event_id"), col("vc")))
          .getField("vc").as("c"))
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("day"))
    bars
      .withColumn("ph", lag(col("h"), 1).over(wOrd))
      .withColumn("pl", lag(col("l"), 1).over(wOrd))
      .withColumn("pc", lag(col("c"), 1).over(wOrd))
      .filter(col("ph").isNotNull)
      .withColumn("p", expr("cast(ph + pl + pc as double) / 3"))
      .withColumn("p6", r6(expr("p / 100")))
      .select(col("event_type"), col("day"),
        r6(expr("cast(c as double) / 100")).as("close"),
        col("p6").as("pivot"),
        r6(expr("(2 * p - pl) / 100")).as("r1"),
        r6(expr("(2 * p - ph) / 100")).as("s1"),
        r6(expr("(p + (ph - pl)) / 100")).as("r2"),
        r6(expr("(p - (ph - pl)) / 100")).as("s2"),
        (expr("cast(c as double) / 100") > col("p6")).as("above_pivot"))
      .orderBy("event_type", "day")
  }

  // ── one-way ANOVA across event types: does mean value differ between
  // groups? Computed entirely from per-group (n, Σv, Σv²) — decimal-exact
  // sums, one keyed aggregation of the fact table, then a k-row reduce —
  // so the F statistic costs one scan regardless of corpus size (the
  // textbook sum-of-squares identities SSb = Σ S1ᵢ²/nᵢ − T²/N,
  // SSw = ΣS2 − Σ S1ᵢ²/nᵢ; Casella & Berger §11.2). Both engines form
  // identical decimal sums, cast once to double, and run the same IEEE
  // arithmetic — r6 seals the boundary. ──
  def statsAnova(spark: SparkSession, dir: String): DataFrame = {
    val g = ev(spark, dir).groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("s1"),
        sum(col("value").cast("decimal(18,2)") *
          col("value").cast("decimal(18,2)")).cast("double").as("s2"))
    val tot = g.agg(count(lit(1)).as("k"), sum(col("n")).as("nn"),
      sum(col("s1")).as("t"), sum(col("s2")).as("ss2"),
      sum(col("s1") * col("s1") / col("n")).as("sg"))
    tot.select(col("k"), col("nn").as("n"),
        r6(col("sg") - col("t") * col("t") / col("nn")).as("ss_between"),
        r6(col("ss2") - col("sg")).as("ss_within"),
        (col("k") - 1).as("df1"), (col("nn") - col("k")).as("df2"),
        r6(((col("sg") - col("t") * col("t") / col("nn")) / (col("k") - 1)) /
          ((col("ss2") - col("sg")) / (col("nn") - col("k")))).as("f_stat"))
  }

  // ── rolling correlation of two aligned daily series (trailing 14 full
  // days): does view volume track purchase volume this fortnight? The
  // moment sums feeding Pearson's r are INTEGER window sums of integer
  // daily counts (Σx, Σy, Σxy, Σx², Σy² over a ROWS frame), so every
  // engine derives bit-identical moments under any partitioning; r is one
  // final double formula, rounded once. Degenerate frames (either series
  // constant) yield null rather than a NaN. The window runs over the
  // |days|-sized daily grid, never the events — one keyed aggregation
  // then a tiny partitionless frame, same discipline as stats_ks. ──
  def rollingCorr(spark: SparkSession, dir: String): DataFrame = {
    val daily = ev(spark, dir).groupBy(col("day"))
      .agg(sum((col("event_type") === "view").cast("long")).as("x"),
        sum((col("event_type") === "purchase").cast("long")).as("y"))
    val w = Window.orderBy(col("day")).rowsBetween(-13, 0)
    daily
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("sx", sum(col("x")).over(w))
      .withColumn("sy", sum(col("y")).over(w))
      .withColumn("sxy", sum(col("x") * col("y")).over(w))
      .withColumn("sxx", sum(col("x") * col("x")).over(w))
      .withColumn("syy", sum(col("y") * col("y")).over(w))
      .filter(col("n") === 14)
      .select(col("day"), col("x"), col("y"),
        when((col("n") * col("sxx") - col("sx") * col("sx")) *
          (col("n") * col("syy") - col("sy") * col("sy")) > 0,
          r6((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            sqrt(((col("n") * col("sxx") - col("sx") * col("sx")) *
              (col("n") * col("syy") - col("sy") * col("sy"))).cast("double"))))
          .as("r14"))
      .orderBy("day")
  }

  /** [[statsPsi]] period split (2024-01-16 UTC, µs) — the same boundary
    * the versioned-store keys commit at, so the two periods are the two
    * snapshots a monitoring job would actually compare. */
  private val PsiSplitUs = 1705363200000000L

  // ── population stability index: the standard ML-monitoring drift
  // metric between a reference period and a current period,
  // PSI = Σ_buckets (p_i − q_i)·ln(p_i/q_i), per event type. Bucket
  // edges are the REFERENCE period's exact deciles (9 cut points,
  // |types|×9 rows, broadcast back like rfm_segments' quintiles — no
  // global sort); bucket membership is an integer edge-comparison sum,
  // counts are integers, and shares use add-one smoothing
  // ((c_i+1)/(n+10)) so empty buckets stay finite and every ratio is
  // derived from identical integers in both engines. One scan per
  // period, grid-sized state everywhere. ──
  def statsPsi(spark: SparkSession, dir: String): DataFrame = {
    val e = ev(spark, dir)
      .select(col("event_type"), col("value"),
        (col("us") < PsiSplitUs).as("is_ref"))
    val edgeCols = (1 to 9).map(i =>
      r6(expr(s"percentile(value, 0.$i)")).as(s"e$i"))
    val edges = e.filter(col("is_ref"))
      .groupBy(col("event_type"))
      .agg(edgeCols.head, edgeCols.tail: _*)
    val bucket = (1 to 9).map(i => (col("value") > col(s"e$i")).cast("int"))
      .reduce(_ + _)
    val counts = e.join(broadcast(edges), "event_type")
      .groupBy(col("event_type"), col("is_ref"), bucket.as("b"))
      .agg(count(lit(1)).as("c"))
    val tot = Window.partitionBy(col("event_type"), col("is_ref"))
    // dense (type, bucket) grid so buckets empty on ONE side still pair
    val grid = counts.select(col("event_type")).distinct()
      .crossJoin(spark.range(0, 10).select(col("id").cast("int").as("b")))
    val shares = grid
      .join(counts.filter(col("is_ref")).select(col("event_type"), col("b"),
        col("c").as("cr")), Seq("event_type", "b"), "left")
      .join(counts.filter(!col("is_ref")).select(col("event_type"), col("b"),
        col("c").as("cc")), Seq("event_type", "b"), "left")
      .select(col("event_type"), col("b"),
        coalesce(col("cr"), lit(0L)).as("cr"),
        coalesce(col("cc"), lit(0L)).as("cc"))
    val sums = Window.partitionBy(col("event_type"))
    shares
      .withColumn("p", (col("cr") + 1).cast("double") /
        (sum(col("cr")).over(sums) + 10))
      .withColumn("q", (col("cc") + 1).cast("double") /
        (sum(col("cc")).over(sums) + 10))
      .groupBy(col("event_type"))
      .agg(r6(sum((col("p") - col("q")) * log(col("p") / col("q"))))
        .as("psi"))
      .orderBy("event_type")
  }

  // ── Gini coefficient of per-user spend: how concentrated is activity
  // value across users — the inequality summary every marketplace/usage
  // dashboard carries. Computed from the closed form
  // G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n over per-user totals ranked
  // ascending (spend, user tiebreak). The rank runs over the |users|-sized
  // aggregate, never the events; Σ i·x sums DECIMAL products of an
  // integer rank and a decimal(18,2) spend — exact under any partition
  // order, one double division at the end. ──
  def statsGini(spark: SparkSession, dir: String): DataFrame = {
    val spend = ev(spark, dir).groupBy(col("user_id"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("x"))
    val ranked = spend.withColumn("i",
      row_number().over(Window.orderBy(col("x"), col("user_id"))))
    ranked.agg(count(lit(1)).as("n_users"),
        sum(col("x")).cast("double").as("total_value"),
        sum(col("i") * col("x")).cast("double").as("swx"))
      .select(col("n_users"), col("total_value"),
        r6(lit(2d) * col("swx") / (col("n_users") * col("total_value")) -
          (col("n_users") + 1).cast("double") / col("n_users")).as("gini"))
  }

  // ── Benford first-digit audit: observed first-significant-digit shares
  // of the value measure vs Benford's law — the classic
  // fabricated-numbers screen auditors run on transaction feeds. The
  // digit comes from integer CENTS through a CASE magnitude ladder, NOT
  // floor(log10(v)) — float log of a near-power-of-ten is exactly the
  // knife edge cross-engine floats disagree on, while the integer ladder
  // is branch-identical everywhere. Expected shares are ln(1+1/d)/ln(10)
  // on literal digits. One keyed aggregation; 9 rows out. ──
  def statsBenford(spark: SparkSession, dir: String): DataFrame = {
    val cents = abs(col("value")).cast("decimal(18,2)") * 100
    val digit = (1 to 15).foldLeft(lit(0L)) { (acc, p) =>
      val lo = math.pow(10, p - 1).toLong
      val hi = math.pow(10, p).toLong
      when(cents >= lo && cents < hi, (cents.cast("long") / lo).cast("long"))
        .otherwise(acc)
    }
    val counts = ev(spark, dir)
      .filter(col("value").isNotNull && abs(col("value")) >= 0.01)
      .select(digit.as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    counts
      .withColumn("share",
        r6(col("n").cast("double") / sum(col("n")).over(Window.partitionBy())))
      .withColumn("benford",
        r6(log(lit(1d) + lit(1d) / col("digit")) / log(lit(10d))))
      .orderBy("digit")
  }

  // ── running drawdown of daily order revenue: each day's distance below
  // the all-time peak, the time-under-water series every
  // capacity/forecast dashboard tracks. Daily revenue and the running
  // peak are exact decimals (max is order-free), so the only double is
  // the final ratio — rounded once. The window runs over the |days| grid. ──
  def windowDrawdown(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("v"))
    val run = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, 0)
    daily
      .withColumn("peak", max(col("v")).over(run))
      .select(col("day"), col("v").cast("double").as("revenue"),
        col("peak").cast("double").as("peak"),
        r6((col("peak") - col("v")).cast("double") /
          col("peak").cast("double")).as("drawdown"))
      .orderBy("day")
  }

  // ── Holt linear-trend exponential smoothing of each event_type's daily
  // revenue series — the forecasting step up from window_ewma (level only)
  // and regr_trend (global OLS line): level AND trend adapt recursively,
  // so the 7-day-ahead forecast tracks recent drift instead of the
  // all-history average. The recursion is inherently sequential, which is
  // exactly why it runs on the RIGHT side of the aggregation boundary: the
  // 100 TB fact table reduces to group-sized daily series via one keyed
  // partial-aggregated groupBy (DECIMAL sums → order-independent, so the
  // collected y values are bit-identical to the oracle's), and the fold
  // itself is a per-key `aggregate` HOF over ≤ a-few-thousand elements —
  // codegen'd arithmetic on group-sized state, never a pass over raw rows.
  // Init (Hyndman & Athanasopoulos, fpp3 §8.2 simple-init form): the
  // first two observations are consumed by l=y₁, b=y₂−y₁, and the update
  // lₜ=αyₜ+(1−α)(lₜ₋₁+bₜ₋₁), bₜ=β(lₜ−lₜ₋₁)+(1−β)bₜ₋₁ then runs over
  // y₃…yₙ (y₂ initializes, it is not also re-smoothed). The oracle replays
  // the identical recursion as a recursive CTE — same literals, same
  // operation order, bit-equal doubles until the single boundary round. ──
  private val HoltA = "0.5"
  private val HoltB = "0.3"

  def forecastHolt(spark: SparkSession, dir: String): DataFrame =
    ev(spark, dir)
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("y"))
      .groupBy(col("event_type"))
      .agg(sort_array(collect_list(struct(col("day"), col("y")))).as("s"))
      // the init needs two observations; a 1-point series would index
      // past the array under ANSI mode AND vanish from the oracle's
      // recursion (base t=2 never equals n=1) — drop it on BOTH sides
      .filter(size(col("s")) >= 2)
      .withColumn("st", expr(
        s"""aggregate(
           |  slice(s, 3, greatest(size(s) - 2, 0)),
           |  named_struct('l', s[0].y, 'b', s[1].y - s[0].y),
           |  (st, p) -> named_struct(
           |    'l', $HoltA * p.y + (1.0D - $HoltA) * (st.l + st.b),
           |    'b', $HoltB * (($HoltA * p.y + (1.0D - $HoltA) * (st.l + st.b))
           |           - st.l) + (1.0D - $HoltB) * st.b))""".stripMargin))
      .select(col("event_type"),
        size(col("s")).cast("long").as("n_days"),
        r6(col("st.l")).as("level"),
        r6(col("st.b")).as("trend"),
        r6(col("st.l") + lit(7.0d) * col("st.b")).as("forecast_7"))
      .orderBy("event_type")

  // ── Holt-Winters additive triple smoothing: [[forecastHolt]] plus a
  // 7-slot weekly seasonal state — the forecaster that knows Mondays
  // differ from Sundays. Same scale shape: ONE keyed aggregation reduces
  // the fact table to group-sized daily series; the recursion folds over
  // that series as a codegen'd `aggregate` HOF whose state is a
  // (level, trend, s[7]) struct. Update (Hyndman fpp3 §8.3, additive):
  //   lₜ = α(yₜ−s_slot) + (1−α)(lₜ₋₁+bₜ₋₁)
  //   bₜ = β(lₜ−lₜ₋₁) + (1−β)bₜ₋₁
  //   s_slot ← γ(yₜ−lₜ₋₁−bₜ₋₁) + (1−γ)s_slot
  // Pinned simple init: l₀ = mean of the first 7 observations
  // (left-associated sum — the oracle repeats the same association),
  // b₀ = 0, s_slot = (that slot's first-week y) − l₀. The weekday slot
  // is epoch-day mod 7 — ENGINE-NEUTRAL, unlike dayofweek() whose
  // Sunday origin differs between Spark (1) and DuckDB (0). Assumes ≥ 8
  // observations per key (every tested SF has ≥ 30); the oracle replays
  // the recursion as a recursive CTE carrying the 7 slots as columns. ──
  private val HwA = "0.3"
  private val HwB = "0.1"
  private val HwG = "0.2"

  def forecastHoltWinters(spark: SparkSession, dir: String): DataFrame =
    ev(spark, dir)
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("y"))
      .withColumn("dw",
        pmod(datediff(col("day"), lit("1970-01-01")), lit(7)) + 1)
      .groupBy(col("event_type"))
      .agg(sort_array(collect_list(struct(col("day"), col("y"), col("dw"))))
        .as("obs"))
      // a weekly seasonal state cannot be fit from under one season;
      // the oracle drops such keys naturally (its base row carries t=7,
      // which never equals n < 7) — match it explicitly here
      .filter(size(col("obs")) >= 7)
      .withColumn("l0",
        expr("aggregate(slice(obs, 1, 7), 0D, (a, x) -> a + x.y) / 7.0D"))
      // first-week seasonal: the FIRST first-week observation on each
      // slot (unique when days are contiguous; get() — not [0], which
      // throws under ANSI mode on an empty filter result — pins the
      // gap case to null→0D deterministically, oracle mirrors via
      // arg_min FILTER)
      .withColumn("s0", expr(
        """transform(sequence(1, 7),
          |  d -> coalesce(
          |    get(filter(slice(obs, 1, 7), p -> p.dw = d), 0).y - l0,
          |    0D))""".stripMargin))
      .withColumn("st", expr(
        s"""aggregate(
           |  slice(obs, 8, greatest(size(obs) - 7, 0)),
           |  named_struct('l', l0, 'b', 0D, 's', s0),
           |  (st, p) -> named_struct(
           |    'l', $HwA * (p.y - element_at(st.s, p.dw))
           |           + (1.0D - $HwA) * (st.l + st.b),
           |    'b', $HwB * (($HwA * (p.y - element_at(st.s, p.dw))
           |           + (1.0D - $HwA) * (st.l + st.b)) - st.l)
           |           + (1.0D - $HwB) * st.b,
           |    's', transform(st.s, (x, i) ->
           |           if(i + 1 = p.dw,
           |             $HwG * (p.y - st.l - st.b) + (1.0D - $HwG) * x,
           |             x))))""".stripMargin))
      .select(col("event_type"),
        size(col("obs")).cast("long").as("n_days"),
        r6(col("st.l")).as("level"),
        r6(col("st.b")).as("trend"),
        // 7 days out lands on the SAME weekday as the last observation
        r6(col("st.l") + lit(7.0d) * col("st.b") +
          expr("element_at(st.s, element_at(obs, size(obs)).dw)"))
          .as("forecast_7"),
        r6(expr("array_max(st.s) - array_min(st.s)")).as("amplitude"))
      .orderBy("event_type")

  // ── Theil-Sen robust trend per event_type: the median of all pairwise
  // slopes of the daily-revenue series, with the intercept as the median
  // residual at that slope — the robust-statistics twin of regr_trend's
  // OLS line (one corrupted day drags an OLS slope arbitrarily; Theil-Sen
  // tolerates up to ~29% outliers). Same scale shape as forecast_holt:
  // the fact table collapses to a group-sized series FIRST, and the
  // O(n²/2) pair enumeration runs on that series (366 days → 67k pairs
  // per key) as a keyed self-join — bounded per key, parallel across
  // keys, never a pass over raw events. The median is computed EXPLICITLY
  // (row_number + the (m+1)÷2/(m+2)÷2 middle pair) rather than through
  // either engine's quantile function, so no interpolation-implementation
  // drift can leak into the compare; the intercept pass reuses the
  // UNROUNDED slope, and each output rounds once at the boundary. ──
  def statsTheilSen(spark: SparkSession, dir: String): DataFrame = {
    // cached: this group-sized frame (|types|×|days| rows) feeds the
    // pair self-join, the residual pass, and the count — uncached, each
    // consumer re-aggregates the FULL fact table (4 extra corpus scans
    // at sf≈1, measured 18.5 s → 3.9 s)
    val daily = ev(spark, dir)
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("y"))
      .select(col("event_type"),
        datediff(col("day"), lit("1970-01-01")).cast("double").as("x"),
        col("y"))
      .cache()
    def medianOf(df: DataFrame, v: String): DataFrame =
      explicitMedian(df, v, Seq("event_type"))
    val a = daily.alias("a")
    val b = daily.alias("b")
    val slopes = a.join(b, col("a.event_type") === col("b.event_type") &&
        col("b.x") > col("a.x"))
      .select(col("a.event_type").as("event_type"),
        ((col("b.y") - col("a.y")) / (col("b.x") - col("a.x"))).as("slope"))
    val slope = medianOf(slopes, "slope")
    val resid = daily.join(broadcast(slope), "event_type")
      .select(col("event_type"),
        (col("y") - col("slope") * col("x")).as("icpt"))
    val n = daily.groupBy(col("event_type")).agg(count(lit(1)).as("n_days"))
    n.join(slope, "event_type").join(medianOf(resid, "icpt"), "event_type")
      .select(col("event_type"), col("n_days"),
        r6(col("slope")).as("slope"), r6(col("icpt")).as("intercept"))
      .orderBy("event_type")
  }

  // ── seasonal anomaly detection: anomaly_mad on the DESEASONALIZED
  // daily series. A Monday always looks anomalous against a plain global
  // band when weekends are quiet — the robust band must be fit on the
  // residual AFTER the trend and day-of-week effects are removed
  // ([[seasonalDecompose]]'s resid), which is exactly what an on-call
  // alert on daily revenue needs. Median and MAD use the explicit
  // middle-pair form (same anti-quantile-drift discipline as
  // stats_theilsen) over the |days|-sized residual frame; every window
  // here runs on aggregated group-sized data, never the fact table. The
  // flag compares the UNROUNDED score (both engines derive it from the
  // same 6-dp-rounded residuals, so the comparison is bit-identical);
  // the reported score is rounded once at the boundary. ──
  def anomalySeasonal(spark: SparkSession, dir: String): DataFrame = {
    // cached ×2: dec and dev are |days|-row frames, but each is consumed
    // by MULTIPLE branches (median, deviation, final select) and dec's
    // lineage is the whole decompose — a full fact-table aggregation.
    // Uncached, the branch tree re-evaluates the decompose ~6× (measured
    // 45 s at sf≈1; cached 4.4 s).
    val dec = seasonalDecompose(spark, dir)
      .select(col("day"), col("v"), col("trend"), col("seasonal"),
        col("resid"))
      .cache()
    val med = explicitMedian(dec, "resid", Nil)
      .select(col("resid").as("med"))
    val dev = dec.crossJoin(broadcast(med))
      .withColumn("dev", abs(col("resid") - col("med")))
      .cache()
    val mad = explicitMedian(dev.select(col("dev")), "dev", Nil)
      .select(col("dev").as("mad"))
    dev.crossJoin(broadcast(mad))
      .withColumn("raw", col("dev") / expr("nullif(mad, 0.0D)"))
      .select(col("day"), col("v"),
        r6(col("trend") + col("seasonal")).as("expected"), col("resid"),
        r6(col("raw")).as("score"), (col("raw") > 3.5d).as("is_anomaly"))
      .orderBy("day")
  }

  // ── Exact distribution-shape moments per group: skewness and excess
  // kurtosis from DECIMAL-exact raw power sums — the "is this metric's
  // distribution drifting" gauge behind the dashboard's mean/sum cards
  // (`/root/reference/app.py:80-84` stops at first moments).
  //
  // Determinism device: `value` is known 2-dp, so iv = value·100 is an
  // EXACT int64 (via the decimal(18,2) cast both engines already agree
  // on). Power sums Σiv, Σiv², Σiv³, Σiv⁴ accumulate in DECIMAL(38,0) —
  // associative and partitioning-independent, unlike double sums. iv ≤
  // 5.7e4 keeps iv⁴ ≤ 1.1e19 per row and the sf-corpus totals ≤ ~1e24,
  // far under the 1e38 ceiling (headroom to ~1e13 rows — 100 TB-class —
  // before the iv⁴ sum needs a second-level split). Moments then combine
  // in DOUBLE with an op-for-op identical formula on both engines:
  // casting the same exact integer to double is deterministic IEEE, and
  // +,-,*,/,sqrt are all correctly rounded, so skew/kurt agree bit-for-
  // bit before the final 6-dp display rounding. Skew/kurt are scale-
  // invariant, so the ×100 never needs undoing; only the mean rescales.
  // ONE scan, map-side partial aggregation, group-sized state — the
  // at-scale shape is a plain keyed agg. ──
  def statsMoments(spark: SparkSession, dir: String): DataFrame = {
    val df = ev(spark, dir)
      .withColumn("iv",
        (col("value").cast("decimal(18,2)") * 100).cast("long"))
    df.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("iv").cast("decimal(38,0)")).as("s1"),
        sum((col("iv") * col("iv")).cast("decimal(38,0)")).as("s2"),
        sum((col("iv") * col("iv") * col("iv")).cast("decimal(38,0)"))
          .as("s3"),
        // iv⁴ would overflow int64 per-row at iv > 5.5e4: square once in
        // int64 (exact), then multiply in decimal
        sum((col("iv") * col("iv")).cast("decimal(38,0)") *
          (col("iv") * col("iv"))).as("s4"))
      .select(col("event_type"), col("n"),
        expr("round(cast(s1 as double) / n / 100, 6) + 0.0d").as("mean"),
        expr("""round(
            (cast(s3 as double) / n
              - 3 * (cast(s1 as double) / n) * (cast(s2 as double) / n)
              + 2 * (cast(s1 as double) / n) * (cast(s1 as double) / n)
                  * (cast(s1 as double) / n))
            / ((cast(s2 as double) / n
                 - (cast(s1 as double) / n) * (cast(s1 as double) / n))
               * sqrt(cast(s2 as double) / n
                 - (cast(s1 as double) / n) * (cast(s1 as double) / n))),
            6) + 0.0d""").as("skewness"),
        expr("""round(
            (cast(s4 as double) / n
              - 4 * (cast(s1 as double) / n) * (cast(s3 as double) / n)
              + 6 * (cast(s1 as double) / n) * (cast(s1 as double) / n)
                  * (cast(s2 as double) / n)
              - 3 * (cast(s1 as double) / n) * (cast(s1 as double) / n)
                  * (cast(s1 as double) / n) * (cast(s1 as double) / n))
            / ((cast(s2 as double) / n
                 - (cast(s1 as double) / n) * (cast(s1 as double) / n))
               * (cast(s2 as double) / n
                 - (cast(s1 as double) / n) * (cast(s1 as double) / n)))
            - 3, 6) + 0.0d""").as("kurtosis"))
      .orderBy("event_type")
  }

  // ── Exact WEIGHTED median per group (lower weighted median: the
  // first value whose cumulative weight reaches half the total) —
  // weighted medians are how a corpus-weighted pipeline summarizes
  // "typical price per unit sold" instead of per line. At scale the
  // naive per-group cumulative sort is a 3-task cliff on a 10⁹-row
  // fact table, so this runs the bucket-then-refine two-pass: integer
  // price-cent BANDS (≤1025) carry per-(group, band) weight sums; the
  // tiny band frame locates each group's BOUNDARY band and its
  // carry-in offset; only boundary-band rows (1/1024 of the table)
  // enter a window — partitioned by (group, band), bounded state. The
  // first row with 2·(offset + running weight) ≥ total weight is the
  // same row the naive global cumulative picks (band cums decompose
  // exactly), which is what the oracle runs. All weights and
  // comparisons are integer — no cross-engine arithmetic anywhere. ──
  def weightedMedian(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select(
      col("l_returnflag").as("g"),
      (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
        .as("pc"),
      col("l_quantity").cast("long").as("wt"),
      (col("l_orderkey") * 8 + col("l_linenumber")).as("tb"))
    val width = li.agg(greatest(lit(1L),
      floor(max(col("pc")) / 1024).cast("long")).as("w"))
    val banded = li.crossJoin(broadcast(width))
      .withColumn("band", (col("pc") / col("w")).cast("long"))
    val wCum = Window.partitionBy(col("g")).orderBy(col("band"))
    val wAll = Window.partitionBy(col("g"))
    val targets = banded.groupBy(col("g"), col("band"))
      .agg(sum(col("wt")).as("bw"))
      .withColumn("cum", sum(col("bw")).over(wCum))
      .withColumn("tw", sum(col("bw")).over(wAll))
      .filter(col("cum") * 2 >= col("tw"))
      .withColumn("rn", row_number().over(wCum))
      .filter(col("rn") === 1)
      .select(col("g"), col("band"), (col("cum") - col("bw")).as("off"),
        col("tw"))
    val wIn = Window.partitionBy(col("g"), col("band"))
      .orderBy(col("pc"), col("tb"))
    banded.join(broadcast(targets), Seq("g", "band"))
      .withColumn("cumw", col("off") + sum(col("wt")).over(
        wIn.rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("cumw") * 2 >= col("tw"))
      .withColumn("rn", row_number().over(wIn))
      .filter(col("rn") === 1)
      .select(col("g").as("l_returnflag"),
        (col("pc").cast("double") / 100).as("med_price"),
        col("tw").as("total_weight"))
      .orderBy("l_returnflag")
  }

  /** Daily DECIMAL-exact value sums per event_type with an integer day
    * index — the group-sized series the residual-diagnostic keys
    * ([[statsDw]], [[statsRuns]]) analyze. The 100 TB fact table
    * reduces to ≤|days| rows per group FIRST; everything after runs on
    * model-sized frames. */
  private def dailySeries(spark: SparkSession, dir: String): DataFrame =
    ev(spark, dir)
      .groupBy(col("event_type"),
        expr("us div 86400000000").as("dayno"))
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("v"))

  // ── Durbin-Watson residual autocorrelation: fit the per-type OLS
  // trend (the regr_trend builtins), then DW = Σ(eᵢ−eᵢ₋₁)²/Σeᵢ² over
  // the daily residuals — THE "is the trend model missing serial
  // structure" diagnostic (DW≈2 independent, →0 positive
  // autocorrelation). Residuals are snapped to 6 dp and accumulated in
  // DECIMAL: the two sums are order-independent, so the statistic
  // can't flake on partition order; regr_slope/intercept agree
  // cross-engine far inside the snap (regr_trend's green row is the
  // precedent). All windows partition by event_type over ≤|days|
  // rows. ──
  def statsDw(spark: SparkSession, dir: String): DataFrame = {
    val daily = dailySeries(spark, dir)
    val fit = daily.groupBy(col("event_type"))
      .agg(expr("regr_slope(v, CAST(dayno AS DOUBLE))").as("b"),
        expr("regr_intercept(v, CAST(dayno AS DOUBLE))").as("a"),
        count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("dayno"))
    daily.join(broadcast(fit), Seq("event_type"))
      .withColumn("e",
        expr("CAST(round(v - (a + b * CAST(dayno AS DOUBLE)), 6)" +
          " AS DECIMAL(24,6))"))
      .withColumn("de", col("e") - lag(col("e"), 1).over(w))
      .groupBy(col("event_type"))
      .agg(first(col("n")).as("n"),
        (sum(col("de") * col("de")).cast("double") /
          sum(col("e") * col("e")).cast("double")).as("raw"))
      .select(col("event_type"), col("n"),
        r6(col("raw")).as("dw"))
      .orderBy("event_type")
  }

  // ── Wald-Wolfowitz RUNS test on the daily series: are above-median /
  // below-median days randomly interleaved, or does the metric move in
  // streaks? The median is the explicit middle-pair rule (engine-
  // neutral); days equal to the median drop (standard treatment); the
  // run count R and the n₊/n₋ totals are pure integers, and the
  // normal approximation z = (R − μ)/σ divides exact integers in
  // double with one sqrt — bit-identical cross-engine. Group-sized
  // frames throughout. ──
  def statsRuns(spark: SparkSession, dir: String): DataFrame = {
    val daily = dailySeries(spark, dir)
    val med = explicitMedian(daily.select(col("event_type"), col("v")),
      "v", Seq("event_type"))
      .withColumnRenamed("v", "med")
    val w = Window.partitionBy(col("event_type")).orderBy(col("dayno"))
    daily.join(broadcast(med), Seq("event_type"))
      .filter(col("v") =!= col("med"))
      .withColumn("s", when(col("v") > col("med"), 1L).otherwise(0L))
      .withColumn("chg",
        when(lag(col("s"), 1).over(w).isNull ||
          lag(col("s"), 1).over(w) =!= col("s"), 1L).otherwise(0L))
      .groupBy(col("event_type"))
      .agg(sum(col("chg")).as("runs"), sum(col("s")).as("n_plus"),
        (count(lit(1)) - sum(col("s"))).as("n_minus"))
      // exact INTEGER products, then one explicit double division per
      // term — a bare `2.0 * …/ …` would be DECIMAL division in Spark
      // SQL vs double in DuckDB (the jarque_bera lesson)
      .select(col("event_type"), col("runs"), col("n_plus"), col("n_minus"),
        r6(expr("""(runs - (1 + CAST(2 * n_plus * n_minus AS DOUBLE)
              / (n_plus + n_minus)))
            / sqrt(CAST(2 * n_plus * n_minus
                * (2 * n_plus * n_minus - (n_plus + n_minus)) AS DOUBLE)
              / (CAST(n_plus + n_minus AS DOUBLE)
                 * (n_plus + n_minus) * (n_plus + n_minus - 1)))"""))
          .as("z"))
      .orderBy("event_type")
  }

  // ── Jarque-Bera normality test per group: JB = n/6·(S² + K²/4) from
  // [[statsMoments]]' exact-sum skewness and excess kurtosis — the
  // "can I use z-tables on this metric" gate. Computed from the
  // 6-dp-rounded moments (both engines hold identical values there, so
  // the derived statistic is trivially identical); reject at the χ²₂
  // 5% critical value 5.991. ──
  def statsJarqueBera(spark: SparkSession, dir: String): DataFrame =
    statsMoments(spark, dir)
      // CAST-first double arithmetic: a bare `n / 6.0` would parse as
      // DECIMAL division in Spark SQL (6.0 is a decimal literal) while
      // DuckDB divides in double — ~1e-6 divergence that round(…, 6)
      // cannot absorb
      .withColumn("jb_raw",
        expr("cast(n as double) / 6 *" +
          " (skewness * skewness + kurtosis * kurtosis / 4)"))
      .select(col("event_type"), col("n"),
        r6(col("jb_raw")).as("jb"),
        (col("jb_raw") > 5.991d).as("reject_normal"))
      .orderBy("event_type")

  // ── Levene/Brown-Forsythe variance-homogeneity test: do the event
  // types share a spread, or is one metric noisier? (The assumption
  // behind stats_anova's F.) Deviations are from the per-group MEDIAN
  // (the robust Brown-Forsythe form), and the median comes from the
  // exact 2-dp VALUE GRID (the stats_ks device) — cumulative counts
  // over ≤|distinct values| rows per group, never a fact-table sort.
  // The trick that keeps both engines bit-equal: with m1/m2 the two
  // middle grid values, the deviation |v − med| scales to the EXACT
  // INTEGER |2·iv − (m1+m2)| — F is scale-invariant, so the ×200 never
  // needs undoing and every sum below it is DECIMAL-exact. The F ratio
  // itself is cast-first double arithmetic; per-group squared-sum
  // terms snap to 6 dp and sum in DECIMAL (order-free). ──
  def statsLevene(spark: SparkSession, dir: String): DataFrame = {
    val b = ev(spark, dir).select(col("event_type"),
      (col("value").cast("decimal(18,2)") * 100).cast("long").as("iv"))
    val grid = b.groupBy(col("event_type"), col("iv"))
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(
        Window.partitionBy(col("event_type")).orderBy(col("iv"))))
      .withColumn("n", sum(col("c")).over(
        Window.partitionBy(col("event_type"))))
    val meds = grid.groupBy(col("event_type"))
      .agg(min(when(col("cum") >= expr("(n + 1) div 2"), col("iv")))
        .as("m1"),
        min(when(col("cum") >= expr("(n + 2) div 2"), col("iv"))).as("m2"))
    val z = b.join(broadcast(meds), Seq("event_type"))
      .select(col("event_type"),
        abs(col("iv") * 2 - (col("m1") + col("m2"))).as("z"))
    val per = z.groupBy(col("event_type"))
      .agg(count(lit(1)).as("nj"),
        sum(col("z").cast("decimal(38,0)")).as("sj"),
        sum((col("z") * col("z")).cast("decimal(38,0)")).as("ssj"))
      .select(col("nj"), col("sj"), col("ssj"),
        expr("cast(round(cast(sj as double) * cast(sj as double) / nj, 6)" +
          " as decimal(24,6))").as("tj"))
    per.agg(count(lit(1)).as("k"), sum(col("nj")).as("n"),
        sum(col("sj")).as("s"), sum(col("ssj")).as("ss"),
        sum(col("tj")).as("b1"))
      .select(col("k"), col("n"),
        r6(expr("""((cast(b1 as double)
              - cast(s as double) * cast(s as double) / n) / (k - 1))
            / ((cast(ss as double) - cast(b1 as double)) / (n - k))"""))
          .as("f_stat"))
  }

  // ── Cramér's V effect size: chi2 says WHETHER type and weekday are
  // associated; V = √(χ²/(n·min(r−1,c−1))) says HOW MUCH on a 0..1
  // scale — the report a drift dashboard actually shows. Same
  // observed/expected grid as stats_chi2; V derives from the ROUNDED
  // χ² (the jarque_bera discipline), one sqrt, cast-first division. ──
  def statsCramersV(spark: SparkSession, dir: String): DataFrame = {
    val o = ev(spark, dir)
      .select(col("event_type"),
        expr("pmod(datediff(day, DATE'1970-01-01'), 7)").as("dow"))
      .groupBy(col("event_type"), col("dow"))
      .agg(count(lit(1)).as("o"))
    val rowT = o.groupBy(col("event_type")).agg(sum(col("o")).as("rt"))
    val colT = o.groupBy(col("dow")).agg(sum(col("o")).as("ct"))
    val n = o.agg(sum(col("o")).as("n"))
    val grid = rowT.crossJoin(colT).crossJoin(broadcast(n))
      .join(o, Seq("event_type", "dow"), "left")
      .select(coalesce(col("o"), lit(0L)).as("o"),
        (col("rt").cast("double") * col("ct") / col("n")).as("e"),
        col("event_type"), col("dow"), col("n"))
    grid.agg(
        (round(sum((col("o") - col("e")) * (col("o") - col("e")) /
          col("e")), 6) + lit(0.0d)).as("chi2"),
        countDistinct(col("event_type")).as("r"),
        countDistinct(col("dow")).as("c"),
        first(col("n")).as("n"))
      .select(col("chi2"), col("n"),
        r6(expr("sqrt(chi2 / (cast(n as double) * least(r - 1, c - 1)))"))
          .as("v"))
  }

  // ── Ljung-Box portmanteau test: Q = n(n+2) Σ_{k=1..7} ρ_k²/(n−k) over
  // the daily-series ACF — "is there ANY autocorrelation structure",
  // the whiteness gate run before trusting i.i.d. assumptions in the
  // other tests. ρ_k comes from the IDENTICAL decimal-moment pipeline
  // as stats_acf and is ROUNDED before entering Q, so both engines sum
  // the same 6-dp terms; n is the day count (1-row broadcast — plan
  // audit). Reject at the χ²(7) 5% critical value on the rounded Q. ──
  def statsLjungBox(spark: SparkSession, dir: String): DataFrame = {
    val daily = ev(spark, dir).groupBy(col("day"))
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("v"))
    val nDays = daily.agg(count(lit(1)).as("n_days"))
    val lagged = daily
      .withColumn("lag", explode(sequence(lit(1), lit(7))))
      .withColumn("prev_day", date_sub(col("day"), col("lag")))
      .join(daily.select(col("day").as("prev_day"), col("v").as("pv")),
        "prev_day")
    val x = col("v").cast("decimal(18,2)")
    val y = col("pv").cast("decimal(18,2)")
    val nD = col("n").cast("double")
    val acf = lagged.groupBy(col("lag").cast("long").as("lag"))
      .agg(count(lit(1)).as("n"),
        sum(x).cast("double").as("sx"), sum(y).cast("double").as("sy"),
        sum(x * y).cast("double").as("sxy"),
        sum(x * x).cast("double").as("sxx"),
        sum(y * y).cast("double").as("syy"))
      .select(col("lag"),
        r6((nD * col("sxy") - col("sx") * col("sy")) /
          sqrt((nD * col("sxx") - col("sx") * col("sx")) *
            (nD * col("syy") - col("sy") * col("sy")))).as("acf"))
    acf.crossJoin(broadcast(nDays))
      .groupBy(col("n_days"))
      .agg(count(lit(1)).as("df"),
        sum(col("acf") * col("acf") /
          (col("n_days") - col("lag")).cast("double")).as("s"))
      .select(col("n_days"), col("df"),
        r6(col("n_days").cast("double") *
          (col("n_days") + 2).cast("double") * col("s")).as("q_stat"))
      .withColumn("reject_5pct", col("q_stat") > 14.06714)
  }

  // ── Bollinger bands on the per-type daily series: 7-day trailing
  // mean ± 2σ, breakout = today's total outside the ROUNDED bands (both
  // engines branch on identical 6-dp values — the windowRollingZscore
  // discipline). Entity-partitioned frame (event_type) so the window
  // never single-partitions at scale; only full 7-day windows emit. ──
  def windowBollinger(spark: SparkSession, dir: String): DataFrame = {
    val daily = ev(spark, dir).groupBy(col("event_type"), col("day"))
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("v"))
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val w7 = wOrd.rowsBetween(-6, 0)
    daily
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("m", avg(col("v")).over(w7))
      .withColumn("s", stddev_samp(col("v")).over(w7))
      .filter(col("rn") >= 7 && col("s") > 0)
      .select(col("event_type"), col("day"), col("v"),
        r6(col("m")).as("ma7"), r6(col("s")).as("sd7"),
        r6(col("m") + lit(2) * col("s")).as("upper"),
        r6(col("m") - lit(2) * col("s")).as("lower"))
      .withColumn("is_break",
        col("v") > col("upper") || col("v") < col("lower"))
      .orderBy("event_type", "day")
  }

  // ── Jensen-Shannon drift per event_type between the stats_psi
  // reference/current halves (same PsiSplitUs cut): JSD term
  // ½p·ln(p/m) + ½q·ln(q/m), m = (p+q)/2 — always finite, so unlike
  // KL/PSI it needs NO smoothing and a type absent on one side still
  // contributes a bounded term. Shares p, q are exact bigint/total
  // divisions; the term is rounded once. Counts partial-aggregate
  // map-side; the 1-row totals frame broadcasts (plan audit). ──
  def statsJsd(spark: SparkSession, dir: String): DataFrame = {
    val c = ev(spark, dir)
      .groupBy(col("event_type"), (col("us") < PsiSplitUs).as("is_ref"))
      .agg(count(lit(1)).as("c"))
    val totals = c.agg(
      sum(when(col("is_ref"), col("c")).otherwise(lit(0L))).as("tr"),
      sum(when(!col("is_ref"), col("c")).otherwise(lit(0L))).as("tc"))
    val types = c.select(col("event_type")).distinct()
    val shares = types
      .join(c.filter(col("is_ref"))
        .select(col("event_type"), col("c").as("cr")),
        Seq("event_type"), "left")
      .join(c.filter(!col("is_ref"))
        .select(col("event_type"), col("c").as("cc")),
        Seq("event_type"), "left")
      .crossJoin(broadcast(totals))
      .select(col("event_type"),
        (coalesce(col("cr"), lit(0L)).cast("double") / col("tr")).as("p"),
        (coalesce(col("cc"), lit(0L)).cast("double") / col("tc")).as("q"))
      .withColumn("m", (col("p") + col("q")) / 2)
    shares.select(col("event_type"),
        r6(col("p")).as("p"), r6(col("q")).as("q"),
        r6(when(col("p") > 0, col("p") * log(col("p") / col("m")))
            .otherwise(lit(0.0d)) / 2 +
          when(col("q") > 0, col("q") * log(col("q") / col("m")))
            .otherwise(lit(0.0d)) / 2).as("jsd_term"))
      .orderBy("event_type")
  }

  // ── Gaussian kernel density estimate of `value` on a 64-point grid:
  // Silverman bandwidth h = 1.06·σ·n^(−1/5) (rounded to 6 dp so both
  // engines share the exact h), density = Σ K((x−g)/h) / (n·h·√2π).
  // The kernel terms are rounded to 9 dp and summed in DECIMAL (the
  // text_lm_score discipline) — a raw double sum over n·64 terms would
  // be order-dependent beyond what round(…,6) absorbs. The 64-row
  // grid broadcasts (plan audit); the expansion is map-side only and
  // partial-aggregates into 64 groups, so at 100 TB the shuffle is 64
  // rows per task regardless of corpus size. ──
  def histKde(spark: SparkSession, dir: String): DataFrame = {
    val e = ev(spark, dir).select(col("value"))
    val d2 = col("value").cast("decimal(18,2)")
    val st = e.agg(
        min(col("value")).cast("double").as("lo"),
        max(col("value")).cast("double").as("hi"),
        count(lit(1)).as("n"),
        sum(d2).cast("double").as("sx"),
        sum(d2 * d2).cast("double").as("sxx"))
      .withColumn("sigma", sqrt((col("sxx") -
        col("sx") * col("sx") / col("n")) / (col("n") - 1)))
      .withColumn("h", round(lit(1.06) * col("sigma") *
        pow(col("n").cast("double"), lit(-0.2)), 6))
    val grid = st
      .select(col("n"), col("h"), col("lo"), col("hi"),
        explode(sequence(lit(0), lit(63))).as("j"))
      .withColumn("gx",
        col("lo") + (col("hi") - col("lo")) * col("j").cast("double") / 63)
    e.crossJoin(broadcast(grid))
      .withColumn("z", (col("value") - col("gx")) / col("h"))
      .withColumn("term",
        round(exp(col("z") * col("z") / -2), 9).cast("decimal(18,9)"))
      .groupBy(col("j"), col("gx"), col("n"), col("h"))
      .agg(sum(col("term")).as("s"))
      .select(col("j").cast("int").as("grid_id"), r6(col("gx")).as("x"),
        r6(col("s").cast("double") /
          (col("n").cast("double") * col("h") * lit(2.5066282746310002)))
          .as("density"))
      .orderBy("grid_id")
  }

  // ── QQ table: per-type deciles of `value` against the GLOBAL deciles
  // — "which segment's distribution is shifted, and where in the
  // body/tail". Exact interpolated percentiles on both engines (the
  // stats_psi parity), rounded before the diff so the comparison is
  // 6-dp arithmetic. Two keyed aggregations + a 9-row broadcast join
  // on decile (equi — hash, not nested loop). ──
  def statsQq(spark: SparkSession, dir: String): DataFrame = {
    val e = ev(spark, dir)
    def qCols = (1 to 9).map(i =>
      r6(expr(s"percentile(value, 0.$i)")).as(s"q$i"))
    val stackExpr = "stack(9, " +
      (1 to 9).map(i => s"$i, q$i").mkString(", ") + ") as (decile, q)"
    val typed = e.groupBy(col("event_type")).agg(qCols.head, qCols.tail: _*)
      .select(col("event_type"), expr(stackExpr))
      .withColumnRenamed("q", "q_type")
    val glob = e.agg(qCols.head, qCols.tail: _*)
      .select(expr(stackExpr)).withColumnRenamed("q", "q_global")
    typed.join(broadcast(glob), "decile")
      .select(col("event_type"), col("decile"), col("q_type"),
        col("q_global"), r6(col("q_type") - col("q_global")).as("shift"))
      .orderBy("event_type", "decile")
  }

  // ── RSI-14 (Cutler's simple-average form — window-pure, unlike
  // Wilder's recursive smoothing) on the per-type daily series:
  // rsi = 100·Σgains / (Σgains + Σlosses) over the trailing 14 deltas.
  // Day-over-day deltas are exact DECIMAL(·,2) differences and the
  // window sums stay decimal, so the single double division at the end
  // is the only float op — order-independent by construction. Deltas
  // are filtered non-null BEFORE the frame is applied so both engines
  // window over identical row sets; only full 14-delta windows with
  // movement emit. ──
  def windowRsi(spark: SparkSession, dir: String): DataFrame = {
    val daily = ev(spark, dir).groupBy(col("event_type"), col("day"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("v"))
    val wo = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val w14 = wo.rowsBetween(-13, 0)
    daily
      .withColumn("delta", col("v") - lag(col("v"), 1).over(wo))
      .filter(col("delta").isNotNull)
      .withColumn("rn", row_number().over(wo))
      // CASE, not greatest(): DuckDB's greatest() promotes DECIMAL
      // arguments to DOUBLE (measured), which would turn the window sum
      // into an order-dependent float sum — CASE keeps decimal on both
      // engines, and the typed zero keeps Spark's branch coercion
      // decimal too
      .withColumn("sg", sum(when(col("delta") > 0, col("delta"))
        .otherwise(expr("CAST(0 AS DECIMAL(18,2))"))).over(w14))
      .withColumn("sl", sum(when(col("delta") < 0, -col("delta"))
        .otherwise(expr("CAST(0 AS DECIMAL(18,2))"))).over(w14))
      .filter(col("rn") >= 14 && (col("sg") + col("sl")) > 0)
      .select(col("event_type"), col("day"),
        col("sg").cast("double").as("sum_gain"),
        col("sl").cast("double").as("sum_loss"),
        r6(lit(100) * col("sg").cast("double") /
          (col("sg") + col("sl")).cast("double")).as("rsi14"))
      .orderBy("event_type", "day")
  }

  // ── single changepoint location (binary-segmentation first split) on
  // the daily series: argmax_t |S_t − (t/n)·S_n|. The statistic is
  // compared SCALED BY n — |n·S_t − t·S_n| is an exact decimal
  // (decimal × int), so the argmax is picked by integer-exact
  // comparison and no float ever decides between candidate days; the
  // reported magnitude divides back by n once at the end. Prefix sums
  // ride the ordered day frame (one row per day); the 1-row (n, S_n)
  // totals broadcast (plan audit). ──
  def statsChangepoint(spark: SparkSession, dir: String): DataFrame = {
    val daily = ev(spark, dir).groupBy(col("day"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("v"))
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val pre = daily
      .withColumn("t", row_number().over(Window.orderBy(col("day"))))
      .withColumn("st", sum(col("v")).over(w))
    val tot = daily.agg(count(lit(1)).as("n"),
      sum(col("v")).as("sn"))
    pre.crossJoin(broadcast(tot))
      .filter(col("t") < col("n"))
      .select(col("day"), col("t"), col("n"),
        abs(col("st") * col("n") - col("sn") * col("t")).as("cn"))
      .orderBy(col("cn").desc, col("day"))
      .limit(1)
      .select(col("day").as("change_day"), col("t").cast("long").as("t"),
        col("n").as("n_days"),
        r6(col("cn").cast("double") / col("n")).as("cusum_stat"))
  }

  // ── k-anonymity audit over the quasi-identifier tuple
  // (event_type, day-of-week, value bucketed to 100s) — "how many rows
  // could be singled out if this event log were released". One keyed
  // aggregation to group sizes, then a 1-row integer summary: group and
  // row counts under k = 5 and k = 10. All-integer arithmetic except
  // the two final rounded percentages. ──
  def privacyKanon(spark: SparkSession, dir: String): DataFrame = {
    val g = ev(spark, dir)
      .groupBy(col("event_type"),
        expr("pmod(datediff(day, DATE'1970-01-01'), 7)").as("dow"),
        floor(col("value") / 100).as("vb"))
      .agg(count(lit(1)).as("k"))
    g.agg(count(lit(1)).as("n_groups"), sum(col("k")).as("n_rows"),
        sum((col("k") < 5).cast("long")).as("groups_lt_5"),
        sum(when(col("k") < 5, col("k")).otherwise(lit(0L)))
          .as("rows_lt_5"),
        sum((col("k") < 10).cast("long")).as("groups_lt_10"),
        sum(when(col("k") < 10, col("k")).otherwise(lit(0L)))
          .as("rows_lt_10"))
      .select(col("n_groups"), col("n_rows"),
        col("groups_lt_5"), col("rows_lt_5"),
        r6(col("rows_lt_5").cast("double") / col("n_rows"))
          .as("pct_rows_lt_5"),
        col("groups_lt_10"), col("rows_lt_10"),
        r6(col("rows_lt_10").cast("double") / col("n_rows"))
          .as("pct_rows_lt_10"))
  }

  // ── forecast-accuracy backtest: per event_type, the MAE of the
  // seasonal-naive forecast (v[day−7]) against the MAE of the plain
  // naive (v[day−1]) over every day where both calendar lags exist —
  // MASE < 1 means weekly structure beats persistence, i.e. the
  // forecast_holt_winters seasonal machinery is earning its keep.
  // Calendar joins (the stats_acf discipline), NOT row-lags, so gap
  // days drop out identically on both engines; absolute errors are
  // exact decimals and each reported ratio is ONE double division. ──
  def forecastMase(spark: SparkSession, dir: String): DataFrame = {
    val daily = ev(spark, dir).groupBy(col("event_type"), col("day"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("v"))
    val d1 = daily.select(col("event_type"),
      date_add(col("day"), 1).as("day"), col("v").as("v1"))
    val d7 = daily.select(col("event_type"),
      date_add(col("day"), 7).as("day"), col("v").as("v7"))
    daily.join(d1, Seq("event_type", "day"))
      .join(d7, Seq("event_type", "day"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_eval"),
        sum(abs(col("v") - col("v1"))).as("sn"),
        sum(abs(col("v") - col("v7"))).as("ss"))
      .select(col("event_type"), col("n_eval"),
        r6(col("sn").cast("double") / col("n_eval")).as("mae_naive"),
        r6(col("ss").cast("double") / col("n_eval")).as("mae_snaive"),
        r6(col("ss").cast("double") / col("sn").cast("double"))
          .as("mase"))
      .orderBy("event_type")
  }

  // ── Hodges-Lehmann location estimate of the daily total: the median
  // of all n(n+1)/2 Walsh averages (vᵢ+vⱼ)/2, i ≤ j — the robust
  // "typical day" with ~29% breakdown, the estimator behind the
  // signed-rank test's confidence interval. The pair join carries a
  // constant equi-key so it plans as a hash join with the i ≤ j
  // residual (the theilsen convention), O(n²/2) rows bounded on the
  // DAY-COUNT frame, never the fact table; the median is the explicit
  // middle pair on both engines. ──
  def statsHodgesLehmann(spark: SparkSession, dir: String): DataFrame = {
    val daily = ev(spark, dir).groupBy(col("day"))
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("v"))
      .withColumn("k", lit(1))
    val pairs = daily.select(col("k"), col("day").as("d1"),
        col("v").as("v1"))
      .join(daily.select(col("k"), col("day").as("d2"), col("v").as("v2")),
        "k")
      .filter(col("d1") <= col("d2"))
      .select(((col("v1") + col("v2")) / 2).as("walsh"))
    val med = explicitMedian(pairs, "walsh", Nil)
    val n = daily.agg(count(lit(1)).as("n_days"),
      (count(lit(1)) * (count(lit(1)) + 1) / 2).cast("long").as("n_pairs"))
    n.crossJoin(broadcast(med))
      .select(col("n_days"), col("n_pairs"),
        r6(col("walsh")).as("hl_estimate"))
  }

  // ── inter-event gap histogram: per-user think-time deltas bucketed
  // on a log-ish ladder (<1 s, <10 s, <1 min, <10 min, <1 h, ≥1 h) —
  // the distribution that justifies (or indicts) the sessionizer's
  // 30-minute timeout. Gaps are integer-second floors of µs
  // differences (`div`, truncating; both engines floor the same
  // nonnegative values), buckets and counts are pure integers, and the
  // share divides by the 6-row frame's own window total. ──
  def sessionGapHist(spark: SparkSession, dir: String): DataFrame = {
    val wo = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val g = ev(spark, dir)
      .select(col("user_id"), col("us"), col("event_id"))
      .withColumn("prev", lag(col("us"), 1).over(wo))
      .filter(col("prev").isNotNull)
      .withColumn("gap_s", expr("(us - prev) div 1000000"))
      .withColumn("b",
        when(col("gap_s") < 1, 0).when(col("gap_s") < 10, 1)
          .when(col("gap_s") < 60, 2).when(col("gap_s") < 600, 3)
          .when(col("gap_s") < 3600, 4).otherwise(5))
      .groupBy(col("b")).agg(count(lit(1)).as("cnt"))
    g.withColumn("bucket",
        when(col("b") === 0, "lt_1s").when(col("b") === 1, "lt_10s")
          .when(col("b") === 2, "lt_1m").when(col("b") === 3, "lt_10m")
          .when(col("b") === 4, "lt_1h").otherwise("ge_1h"))
      .withColumn("share",
        r6(col("cnt").cast("double") /
          sum(col("cnt")).over(Window.partitionBy(lit(1)))))
      .select(col("b").cast("int").as("b"), col("bucket"), col("cnt"),
        col("share"))
      .orderBy("b")
  }

  // ── partial correlation r_xy·z = (r_xy − r_xz·r_yz) /
  // √((1−r_xz²)(1−r_yz²)) for the lineitem measure pairs, controlling
  // for discount — "is the qty↔price association real or
  // discount-driven". The pairwise r's come from the engine's corr()
  // and are ROUNDED to 6 dp before entering the formula (the
  // stats_corr_matrix parity: corr is scale-invariant so pop/sample
  // forms agree), so the partial is 6-dp arithmetic both engines
  // reproduce bit-for-bit. One scan, one 1-row moment frame. ──
  def statsPartialCorr(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val m = li.agg(
      r6(corr(col("l_quantity"), col("l_extendedprice"))).as("r_qp"),
      r6(corr(col("l_quantity"), col("l_tax"))).as("r_qt"),
      r6(corr(col("l_extendedprice"), col("l_tax"))).as("r_pt"),
      r6(corr(col("l_quantity"), col("l_discount"))).as("r_qd"),
      r6(corr(col("l_extendedprice"), col("l_discount"))).as("r_pd"),
      r6(corr(col("l_tax"), col("l_discount"))).as("r_td"))
    def partial(rxy: Column, rxz: Column, ryz: Column): Column =
      r6((rxy - rxz * ryz) /
        sqrt((lit(1.0) - rxz * rxz) * (lit(1.0) - ryz * ryz)))
    m.withColumn("pqp", partial(col("r_qp"), col("r_qd"), col("r_pd")))
      .withColumn("pqt", partial(col("r_qt"), col("r_qd"), col("r_td")))
      .withColumn("ppt", partial(col("r_pt"), col("r_pd"), col("r_td")))
      .select(expr("stack(3, " +
        "'l_quantity', 'l_extendedprice', r_qp, pqp, " +
        "'l_quantity', 'l_tax', r_qt, pqt, " +
        "'l_extendedprice', 'l_tax', r_pt, ppt) " +
        "as (x, y, r_xy, r_partial)"),
        lit("l_discount").as("control"))
      .select(col("x"), col("y"), col("control"), col("r_xy"),
        col("r_partial"))
      .orderBy("x", "y")
  }

  // ── Cohen's d effect size for every event_type pair: the
  // magnitude companion to stats_ttest's p-values (a tiny p with
  // d ≈ 0 is noise at scale, not signal). Per-group (n, Σv, Σv²)
  // decimal sums → sample variances; pooled SD and d are identical
  // double chains on both engines. The 5-row moment frame self-joins
  // on a < b (plan audit: group-domain frame, never fact-sized). ──
  def statsCohensD(spark: SparkSession, dir: String): DataFrame = {
    val d2 = col("value").cast("decimal(18,2)")
    val m = ev(spark, dir).groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(d2).cast("double").as("sx"),
        sum(d2 * d2).cast("double").as("sxx"))
      .select(col("event_type"), col("n"),
        (col("sx") / col("n")).as("mean"),
        ((col("sxx") - col("sx") * col("sx") / col("n")) /
          (col("n") - 1)).as("var"))
    val a = m.select(col("event_type").as("type_a"), col("n").as("na"),
      col("mean").as("ma"), col("var").as("va"))
    val b = m.select(col("event_type").as("type_b"), col("n").as("nb"),
      col("mean").as("mb"), col("var").as("vb"))
    a.crossJoin(broadcast(b))
      .filter(col("type_a") < col("type_b"))
      .select(col("type_a"), col("type_b"), col("na"), col("nb"),
        r6(col("ma")).as("mean_a"), r6(col("mb")).as("mean_b"),
        r6((col("ma") - col("mb")) /
          sqrt(((col("na") - 1) * col("va") + (col("nb") - 1) * col("vb"))
            / (col("na") + col("nb") - 2))).as("cohens_d"))
      .orderBy("type_a", "type_b")
  }

  // ── empirical CDF per event_type, evaluated on ONE shared 21-point
  // global grid (so the 5 curves are directly comparable — the visual
  // twin of stats_ks's max-gap statistic). F(g) = |v ≤ g| / n is pure
  // integer counting; the grid points are the identical double chain
  // on both engines, and the ≤ comparisons branch on identical
  // doubles. The 21-row grid broadcasts (plan audit); the expansion is
  // map-side and collapses into 105 output rows. ──
  def statsEcdf(spark: SparkSession, dir: String): DataFrame = {
    val e = ev(spark, dir).select(col("event_type"), col("value"))
    val st = e.agg(min(col("value")).cast("double").as("lo"),
      max(col("value")).cast("double").as("hi"))
    val grid = st.select(col("lo"), col("hi"),
        explode(sequence(lit(0), lit(20))).as("j"))
      .withColumn("gx",
        col("lo") + (col("hi") - col("lo")) * col("j").cast("double") / 20)
    e.crossJoin(broadcast(grid))
      .groupBy(col("event_type"), col("j"), col("gx"))
      .agg(count(lit(1)).as("n"),
        sum((col("value") <= col("gx")).cast("long")).as("c"))
      .select(col("event_type"), col("j").cast("int").as("grid_id"),
        r6(col("gx")).as("x"),
        r6(col("c").cast("double") / col("n")).as("ecdf"))
      .orderBy("event_type", "grid_id")
  }

  // ── effective sample size under importance reweighting to a UNIFORM
  // event-type mix: w_t = n/(k·c_t), ESS = (Σw)²/Σw² — the one number
  // that says whether rebalancing by weighting (sample_temperature's
  // alternative) would collapse onto a handful of rare-class rows.
  // Weights are ROUNDED before use so the 3.0 clip branches
  // identically; Σ's run over the k-row class frame, not the corpus.
  // The 1-row totals broadcast (plan audit). ──
  def sampleEss(spark: SparkSession, dir: String): DataFrame = {
    val c = ev(spark, dir).groupBy(col("event_type"))
      .agg(count(lit(1)).as("ct"))
    val tot = c.agg(sum(col("ct")).as("n"), count(lit(1)).as("k"))
    val w = c.crossJoin(broadcast(tot))
      .withColumn("w",
        r6(col("n").cast("double") / (col("k") * col("ct"))))
      .withColumn("wc", least(col("w"), lit(3.0)))
    w.groupBy(col("n"), col("k"))
      .agg(sum(col("ct") * col("w")).as("sw"),
        sum(col("ct") * col("w") * col("w")).as("sww"),
        sum(col("ct") * col("wc")).as("scw"),
        sum(col("ct") * col("wc") * col("wc")).as("scww"))
      .select(col("n"), col("k").cast("int").as("n_types"),
        r6(col("sw") * col("sw") / col("sww")).as("ess_raw"),
        r6(col("scw") * col("scw") / col("scww")).as("ess_clipped"),
        r6(col("sw") * col("sw") / col("sww") / col("n")).as("ess_frac"))
  }

  // ── growth-rate table: per-type daily revenue with day-over-day and
  // week-over-week percentage change via CALENDAR joins (gap days give
  // NULL growth on both engines, never a wrong row-lag). The decimal
  // daily sums are cast to double once and each rate is one subtraction
  // + one division on identical doubles. ──
  def windowGrowth(spark: SparkSession, dir: String): DataFrame = {
    val daily = ev(spark, dir).groupBy(col("event_type"), col("day"))
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("v"))
    val d1 = daily.select(col("event_type"),
      date_add(col("day"), 1).as("day"), col("v").as("v1"))
    val d7 = daily.select(col("event_type"),
      date_add(col("day"), 7).as("day"), col("v").as("v7"))
    daily.join(d1, Seq("event_type", "day"), "left")
      .join(d7, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"), col("v").as("rev"),
        r6((col("v") - col("v1")) / col("v1") * 100).as("dod_pct"),
        r6((col("v") - col("v7")) / col("v7") * 100).as("wow_pct"))
      .orderBy("event_type", "day")
  }

  // ── order-fulfilment backlog curve: lines placed vs lines shipped,
  // cumulated over the calendar — the operational "are we falling
  // behind" series. Two keyed day-counts full-outer-joined on the day
  // spine, integer prefix sums over the |days|-sized frame (the fact
  // table never enters a window). ──
  def backlogCurve(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), to_date(col("l_shipdate")).as("ship_d"))
      .join(Tables.orders(spark, dir)
        .select(col("o_orderkey"), to_date(col("o_orderdate")).as("ord_d")),
        col("l_orderkey") === col("o_orderkey"))
    val placed = li.groupBy(col("ord_d").as("day"))
      .agg(count(lit(1)).as("placed"))
    val shipped = li.groupBy(col("ship_d").as("day"))
      .agg(count(lit(1)).as("shipped"))
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, 0)
    placed.join(shipped, Seq("day"), "full_outer")
      .select(col("day"), coalesce(col("placed"), lit(0L)).as("placed"),
        coalesce(col("shipped"), lit(0L)).as("shipped"))
      .withColumn("cum_placed", sum(col("placed")).over(w))
      .withColumn("cum_shipped", sum(col("shipped")).over(w))
      .withColumn("backlog", col("cum_placed") - col("cum_shipped"))
      .orderBy("day")
  }

  // ── Granger-style predictive test: does yesterday's CLICK volume
  // help predict today's PURCHASE revenue beyond purchase's own lag?
  // Uses the partial-correlation identity — F(1, n−3) =
  // (n−3)·r²_p/(1−r²_p) with r_p = corr(y_t, x_{t−1} | y_{t−1}) — so
  // the whole test is three pairwise correlations (ROUNDED, the
  // stats_partial_corr parity) and pure 6-dp arithmetic; no normal
  // equations, no matrix solve. Lags are calendar joins on the
  // two-series day frame. Reject at the F(1,60) ≈ 4.00 5% line on the
  // rounded statistic. ──
  def statsGranger(spark: SparkSession, dir: String): DataFrame = {
    val daily = ev(spark, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .groupBy(col("day"), col("event_type"))
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("v"))
    val y = daily.filter(col("event_type") === "purchase")
      .select(col("day"), col("v").as("y"))
    val x = daily.filter(col("event_type") === "click")
      .select(col("day"), col("v").as("x"))
    val frame = y
      .join(y.select(date_add(col("day"), 1).as("day"),
        col("y").as("ylag")), "day")
      .join(x.select(date_add(col("day"), 1).as("day"),
        col("x").as("xlag")), "day")
    val m = frame.agg(count(lit(1)).as("n"),
      r6(corr(col("y"), col("xlag"))).as("r_yx"),
      r6(corr(col("y"), col("ylag"))).as("r_yy"),
      r6(corr(col("xlag"), col("ylag"))).as("r_xy"))
    m.select(col("n"),
        r6((col("r_yx") - col("r_yy") * col("r_xy")) /
          sqrt((lit(1.0) - col("r_yy") * col("r_yy")) *
            (lit(1.0) - col("r_xy") * col("r_xy")))).as("r_partial"),
        col("r_yx"), col("r_yy"))
      .withColumn("f_stat",
        r6((col("n") - 3).cast("double") * col("r_partial") *
          col("r_partial") /
          (lit(1.0) - col("r_partial") * col("r_partial"))))
      .withColumn("reject_5pct", col("f_stat") > 4.0)
      .select(col("n"), col("r_yx"), col("r_yy"), col("r_partial"),
        col("f_stat"), col("reject_5pct"))
  }

  // ── data-volume anomaly days: daily row counts against the robust
  // median ± 3.5·MAD band (the anomaly_mad discipline applied to the
  // PIPELINE itself — a day whose ingest volume collapses or doubles
  // is a data incident before it is a statistics incident). Counts
  // are integers; median and MAD are explicit middle pairs; the band
  // compares the integer count against the ROUNDED threshold so both
  // engines flag identical days. ──
  def dqVolumeAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val c = ev(spark, dir).groupBy(col("day"))
      .agg(count(lit(1)).cast("double").as("cnt"))
    val med = explicitMedian(c.select(col("cnt")), "cnt", Nil)
      .select(col("cnt").as("med"))
    val dev = c.crossJoin(broadcast(med))
      .withColumn("dev", abs(col("cnt") - col("med")))
    val mad = explicitMedian(dev.select(col("dev")), "dev", Nil)
      .select(col("dev").as("mad"))
    c.crossJoin(broadcast(med)).crossJoin(broadcast(mad))
      .select(col("day"), col("cnt").cast("long").as("n_rows"),
        r6(col("med")).as("med"), r6(col("mad")).as("mad"),
        (abs(col("cnt") - col("med")) >
          r6(lit(3.5) * col("mad"))).as("is_anomaly"))
      .orderBy("day")
  }

  // ── mutual information between event_type and the value's 100-band
  // bucket, with the normalized variant NMI = I/√(H_t·H_b) — the
  // dependence measure stats_chi2 tests but doesn't quantify in bits.
  // Every probability is an exact bigint ratio; each log argument is a
  // ratio of exact integer PRODUCTS (c·n vs r·s, both inside int64),
  // so the two engines feed ln identical doubles and the ≤35-term sums
  // round at 6 dp. Marginals join back equi (hash); the 1-row total
  // broadcasts (plan audit). ──
  def statsMutualInfo(spark: SparkSession, dir: String): DataFrame = {
    val j = ev(spark, dir)
      .groupBy(col("event_type"), floor(col("value") / 100).as("vb"))
      .agg(count(lit(1)).as("c")).cache()
    val rT = j.groupBy(col("event_type")).agg(sum(col("c")).as("r"))
    val cT = j.groupBy(col("vb")).agg(sum(col("c")).as("s"))
    val n = j.agg(sum(col("c")).as("n"), count(lit(1)).as("n_cells"))
    val mi = j.join(rT, "event_type").join(cT, "vb")
      .crossJoin(broadcast(n))
      .agg(r6(sum((col("c").cast("double") / col("n")) *
        log((col("c") * col("n")).cast("double") /
          (col("r") * col("s")).cast("double")))).as("mi_nats"))
    val hT = rT.crossJoin(broadcast(n.select(col("n"))))
      .agg(r6(-sum((col("r").cast("double") / col("n")) *
        log(col("r").cast("double") / col("n")))).as("h_type"))
    val hB = cT.crossJoin(broadcast(n.select(col("n"))))
      .agg(r6(-sum((col("s").cast("double") / col("n")) *
        log(col("s").cast("double") / col("n")))).as("h_bucket"))
    n.crossJoin(broadcast(mi)).crossJoin(broadcast(hT))
      .crossJoin(broadcast(hB))
      .select(col("n"), col("n_cells"), col("mi_nats"),
        col("h_type"), col("h_bucket"),
        r6(col("mi_nats") / sqrt(col("h_type") * col("h_bucket")))
          .as("nmi"))
  }

  // ── Lorenz curve of user spend: users ranked by (spend, id) into 10
  // explicit integer deciles — ((rn−1)·10) div m + 1, never ntile() —
  // each decile's user count and DECIMAL-exact spend, and the running
  // cumulative share. The rank runs over the user-dimension frame (the
  // stats_gini waiver class: |users|, not |events|); everything until
  // the two share divisions is integer/decimal-exact. ──
  def distLorenz(spark: SparkSession, dir: String): DataFrame = {
    val spend = ev(spark, dir).groupBy(col("user_id"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("v"))
    val wo = Window.orderBy(col("v"), col("user_id"))
    val m = Window.partitionBy(lit(1))
    val ranked = spend
      .withColumn("rn", row_number().over(wo))
      .withColumn("m", count(lit(1)).over(m))
      .withColumn("tot", sum(col("v")).over(m))
      .withColumn("decile", expr("((rn - 1) * 10) div m + 1"))
    ranked.groupBy(col("decile"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("v")).as("spend"), first(col("tot")).as("tot"))
      .withColumn("cum_spend",
        sum(col("spend")).over(Window.orderBy(col("decile"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("decile").cast("int").as("decile"), col("n_users"),
        col("spend").cast("double").as("spend"),
        r6(col("spend").cast("double") / col("tot").cast("double"))
          .as("share"),
        r6(col("cum_spend").cast("double") / col("tot").cast("double"))
          .as("cum_share"))
      .orderBy("decile")
  }

  // ── Palma ratio of user spend: top-10% share over bottom-40% share —
  // the inequality headline number policy reports quote instead of the
  // full Lorenz table (the middle 50% is empirically stable, so the
  // tails' ratio IS the story). Reuses dist_lorenz's explicit-decile
  // device verbatim (rank over the (v, user_id) total order, integer
  // decile fences) so the shares reconcile with that key's table
  // row-for-row; tail sums stay exact DECIMAL until the two final
  // divisions. Same at-scale note as dist_lorenz: the global rank is
  // the explicit form — window_rank_family_scaled's bucketed rank
  // reconstruction is the drop-in when one panel outgrows a window. ──
  def distPalma(spark: SparkSession, dir: String): DataFrame = {
    val spend = ev(spark, dir).groupBy(col("user_id"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("v"))
    val wo = Window.orderBy(col("v"), col("user_id"))
    val m = Window.partitionBy(lit(1))
    spend
      .withColumn("rn", row_number().over(wo))
      .withColumn("m", count(lit(1)).over(m))
      .withColumn("decile", expr("((rn - 1) * 10) div m + 1"))
      .agg(count(lit(1)).as("n_users"), sum(col("v")).as("tot"),
        sum(when(col("decile") === 10, col("v"))).as("top10"),
        sum(when(col("decile") <= 4, col("v"))).as("bot40"))
      .select(col("n_users"),
        r6(expr("cast(top10 as double) / cast(tot as double)"))
          .as("top10_share"),
        r6(expr("cast(bot40 as double) / cast(tot as double)"))
          .as("bot40_share"),
        r6(expr("cast(top10 as double) / cast(bot40 as double)"))
          .as("palma_ratio"))
  }

  // ── quintile share table of user spend (+ the S80/S20 income-share
  // ratio on the top row's cumulative read): the 5-band summary between
  // dist_lorenz's 10-row curve and dist_palma's single number — the EU
  // at-risk-of-inequality format. Same explicit-rank device and exact
  // DECIMAL band sums; shares divide once at the boundary. ──
  def distQuintileShares(spark: SparkSession, dir: String): DataFrame = {
    val spend = ev(spark, dir).groupBy(col("user_id"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("v"))
    val wo = Window.orderBy(col("v"), col("user_id"))
    val m = Window.partitionBy(lit(1))
    val ranked = spend
      .withColumn("rn", row_number().over(wo))
      .withColumn("m", count(lit(1)).over(m))
      .withColumn("tot", sum(col("v")).over(m))
      .withColumn("quintile", expr("((rn - 1) * 5) div m + 1"))
    val byQ = ranked.groupBy(col("quintile"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("v")).as("spend"), first(col("tot")).as("tot"))
    byQ
      .withColumn("cum_spend",
        sum(col("spend")).over(Window.orderBy(col("quintile"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("q1", sum(when(col("quintile") === 1, col("spend")))
        .over(m))
      .withColumn("q5", sum(when(col("quintile") === 5, col("spend")))
        .over(m))
      .select(col("quintile").cast("int").as("quintile"), col("n_users"),
        col("spend").cast("double").as("spend"),
        r6(col("spend").cast("double") / col("tot").cast("double"))
          .as("share"),
        r6(col("cum_spend").cast("double") / col("tot").cast("double"))
          .as("cum_share"),
        r6(col("q5").cast("double") / col("q1").cast("double"))
          .as("s80_s20"))
      .orderBy("quintile")
  }

  // ── Kruskal–Wallis H: does `value`'s LOCATION differ across event
  // types — the k-group nonparametric ANOVA (stats_anova assumes
  // normality; stats_mannwhitney compares exactly two groups; this is
  // the k-group rank form between them). The rank device is the grid
  // trick, not a global sort: values collapse to exact CENTS, doubled
  // average ranks come from the distinct-cents frame (2r = 2·F + t + 1
  // with F = count below, t = ties at the value) — the cents grid is
  // bounded (≤100k rows) FOREVER, so the only window in the plan runs
  // on a fixed-size frame no matter how many events exist. Per-group
  // rank sums S2_g and counts are exact int64 (S2 ≤ 2N·n_g, inside
  // 2^53, so the double cast before squaring is exact); the tie term
  // Σ(t³−t) accumulates in DECIMAL(38,0) because a concentrated value
  // can push t³ past int64 at corpus scale. One double division per
  // output column, cast-first on both engines. ──
  def statsKruskal(spark: SparkSession, dir: String): DataFrame = {
    val j = ev(spark, dir)
      .groupBy(col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .agg(count(lit(1)).as("c")).cache()
    val t = j.groupBy(col("cents")).agg(sum(col("c")).as("t"))
    val f = t.withColumn("fb",
      sum(col("t")).over(Window.orderBy(col("cents"))
        .rowsBetween(Window.unboundedPreceding, 0)) - col("t"))
    val g = j.join(f, "cents")
      .groupBy(col("event_type"))
      .agg(sum(col("c")).as("n_g"),
        sum(col("c") * (col("fb") * 2 + col("t") + 1)).as("s2"))
    val tc = t.agg(sum(col("t").cast("decimal(38,0)") * col("t") * col("t")
      - col("t")).as("tsum"))
    g.agg(count(lit(1)).as("k"), sum(col("n_g")).as("n"),
        sum(expr("cast(s2 as double) * cast(s2 as double) / n_g")).as("q"))
      .crossJoin(broadcast(tc))
      .select(col("k"), col("n"),
        r6(expr("3.0 * q / (cast(n as double) * (n + 1)) - 3.0 * (n + 1)"))
          .as("h"),
        r6(expr("1.0 - cast(tsum as double)" +
          " / (cast(n as double) * n * n - n)")).as("tie_c"),
        r6(expr("(3.0 * q / (cast(n as double) * (n + 1)) - 3.0 * (n + 1))" +
          " / (1.0 - cast(tsum as double)" +
          " / (cast(n as double) * n * n - n))")).as("h_adj"))
  }

  // ── ingest freshness audit: per event type, when did data last
  // arrive, how far it lags the corpus watermark (the max timestamp any
  // type reached), and whether the lag breaches a 60-minute SLA — the
  // staleness companion of [[dqVolumeAnomaly]]'s volume check (a feed
  // can keep its volume and still be replaying yesterday). All
  // arithmetic is integer µs (exact on both engines); the 1-row
  // watermark broadcasts (scalar-broadcast idiom); one shuffle, keyed
  // by type. ──
  def dqFreshness(spark: SparkSession, dir: String): DataFrame = {
    val e = ev(spark, dir)
    val wm = e.agg(max(col("us")).as("wm"))
    e.crossJoin(broadcast(wm))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        max(col("us")).as("last_us"),
        first(col("wm")).as("wm"),
        sum(when(col("us") >= col("wm") - lit(86400000000L), 1L)
          .otherwise(0L)).as("n_last_24h"))
      .select(col("event_type"), col("n_events"), col("last_us"),
        expr("(wm - last_us) div 60000000").as("lag_min"),
        col("n_last_24h"),
        (expr("(wm - last_us) div 60000000") >= 60L).as("is_stale"))
      .orderBy("event_type")
  }

  // ── two-regressor OLS: daily revenue (whole dollars — floor(cents/
  // 100) keeps y an EXACT integer whose squared moments stay inside
  // int64 at any achievable SF, where cents² · days overflows at 10×)
  // on daily click and view counts, solved in closed form by Cramer's
  // rule on the centered normal equations — the multi-feature step up
  // from regr_trend's single regressor. Raw moments are exact int64
  // sums on the |days| grid; centered combinations (n·Sxx − Sx²) stay
  // int64; the determinant and coefficients cast each EXACT moment to
  // double once and share one expression tree with the oracle, so both
  // engines feed IEEE math identical inputs in identical order. R² =
  // (b1·S1y + b2·S2y)/(n·Syy − Sy²) — the /n in SSR and SST cancels. ──
  def statsOlsMulti(spark: SparkSession, dir: String): DataFrame = {
    val daily = ev(spark, dir)
      .groupBy(col("day"))
      .agg(count(when(col("event_type") === "click", 1)).as("x1"),
        count(when(col("event_type") === "view", 1)).as("x2"),
        floor(sum(col("value").cast("decimal(18,2)"))).cast("long").as("y"))
    val m = daily.agg(count(lit(1)).as("n"),
      sum(col("x1")).as("sx1"), sum(col("x2")).as("sx2"),
      sum(col("y")).as("sy"),
      sum(col("x1") * col("x1")).as("s11r"),
      sum(col("x2") * col("x2")).as("s22r"),
      sum(col("x1") * col("x2")).as("s12r"),
      sum(col("x1") * col("y")).as("s1yr"),
      sum(col("x2") * col("y")).as("s2yr"),
      sum(col("y") * col("y")).as("syyr"))
    m.select(col("n"),
        expr("n * s11r - sx1 * sx1").as("c11"),
        expr("n * s22r - sx2 * sx2").as("c22"),
        expr("n * s12r - sx1 * sx2").as("c12"),
        expr("n * s1yr - sx1 * sy").as("c1y"),
        expr("n * s2yr - sx2 * sy").as("c2y"),
        expr("n * syyr - sy * sy").as("cyy"),
        col("sx1"), col("sx2"), col("sy"))
      .select(col("n"),
        r6(expr("(cast(c1y as double) * c22 - cast(c2y as double) * c12)" +
          " / (cast(c11 as double) * c22 - cast(c12 as double) * c12)"))
          .as("b1"),
        r6(expr("(cast(c2y as double) * c11 - cast(c1y as double) * c12)" +
          " / (cast(c11 as double) * c22 - cast(c12 as double) * c12)"))
          .as("b2"),
        r6(expr("(cast(sy as double)" +
          " - ((cast(c1y as double) * c22 - cast(c2y as double) * c12)" +
          "    / (cast(c11 as double) * c22 - cast(c12 as double) * c12))" +
          "   * sx1" +
          " - ((cast(c2y as double) * c11 - cast(c1y as double) * c12)" +
          "    / (cast(c11 as double) * c22 - cast(c12 as double) * c12))" +
          "   * sx2) / n")).as("b0"),
        r6(expr("(((cast(c1y as double) * c22 - cast(c2y as double) * c12)" +
          "    / (cast(c11 as double) * c22 - cast(c12 as double) * c12))" +
          "   * c1y" +
          " + ((cast(c2y as double) * c11 - cast(c1y as double) * c12)" +
          "    / (cast(c11 as double) * c22 - cast(c12 as double) * c12))" +
          "   * c2y) / cast(cyy as double)")).as("r2"))
  }

  // ── Wilson score interval for the daily purchase rate: per day,
  // k = purchase events over n = all events, 95% CI by the Wilson
  // formula — the interval that stays inside [0,1] and behaves at
  // small n where the naive ±z√(p(1−p)/n) fails (the standard for
  // conversion dashboards). k and n are exact integers; p and the
  // interval are ONE shared double expression tree (cast-first, z²
  // written as cast(1.96 as double) on both engines so no decimal-
  // literal arithmetic sneaks in). Grid-sized output, keyed shuffle. ──
  def statsWilsonCi(spark: SparkSession, dir: String): DataFrame = {
    val z2 = "(cast(1.96 as double) * cast(1.96 as double))"
    val p = "(cast(k as double) / n)"
    val s = s"sqrt($p * (1 - $p) / n + $z2 / (4 * n * n))"
    val den = s"(1 + $z2 / n)"
    ev(spark, dir).groupBy(col("day"))
      .agg(count(lit(1)).as("n"),
        count(when(col("event_type") === "purchase", 1)).as("k"))
      .select(col("day"), col("n"), col("k"),
        r6(expr(p)).as("p_hat"),
        r6(expr(s"($p + $z2 / (2 * n) - cast(1.96 as double) * $s) / $den"))
          .as("ci_lo"),
        r6(expr(s"($p + $z2 / (2 * n) + cast(1.96 as double) * $s) / $den"))
          .as("ci_hi"))
      .orderBy("day")
  }

  // ── Friedman test: do the k event types keep the same revenue
  // ORDERING day after day — the blocked companion of [[statsKruskal]]
  // (Kruskal-Wallis pools all observations; Friedman ranks WITHIN each
  // day, so day-level shocks that lift every type together cancel
  // instead of inflating the statistic). Blocks are the complete
  // day×type grid (missing cells as 0 revenue, built identically in
  // the oracle); within-day midranks use the doubled-rank device over
  // PER-DAY windows — parallel by block, never a global sort. Rank
  // sums are exact small ints; Q = 3·ΣS2_j²/(nk(k+1)) − 3n(k+1) is one
  // cast-first division. ──
  def statsFriedman(spark: SparkSession, dir: String): DataFrame = {
    val ranked = friedmanGrid(spark, dir)
    val s = ranked.groupBy(col("event_type"))
      .agg(sum(col("r2x")).as("s2"), count(lit(1)).as("n"))
    s.agg(count(lit(1)).as("k"), first(col("n")).as("n_blocks"),
        sum(col("s2") * col("s2")).as("ss"))
      .select(col("n_blocks"), col("k"),
        r6(expr("cast(3 * ss as double)" +
          " / (cast(n_blocks as double) * k * (k + 1))" +
          " - cast(3 * n_blocks * (k + 1) as double)")).as("q"))
  }

  /** The stats_friedman block grid (zero-filled day×type cells with
    * doubled within-day midranks), shared by [[statsQuade]] and
    * [[statsNemenyi]] so the three blocked-rank keys rank identically. */
  private def friedmanGrid(spark: SparkSession, dir: String): DataFrame = {
    val rev = ev(spark, dir).groupBy(col("day"), col("event_type"))
      .agg((sum(col("value").cast("decimal(18,2)")) * 100).cast("long")
        .as("revc"))
    val days = rev.select(col("day")).distinct()
    val types = rev.select(col("event_type")).distinct()
    val grid = days.crossJoin(broadcast(types))
      .join(rev, Seq("day", "event_type"), "left")
      .withColumn("revc", coalesce(col("revc"), lit(0L)))
    grid.withColumn("r2x",
      rank().over(Window.partitionBy(col("day")).orderBy(col("revc"))) * 2
        + count(lit(1)).over(Window.partitionBy(col("day"), col("revc")))
        - 1)
  }

  // ── Quade test: the block-WEIGHTED Friedman — blocks (days) with a
  // wider value range carry proportionally more evidence, which makes
  // Quade sharper than Friedman when treatment effects scale with the
  // block's overall level (revenue days do exactly that). Block weights
  // are doubled midranks of the integer day range; centered cell scores
  // S = q·(r − (k+1)/2) stay EXACT int64 in ×4 units, so A and the
  // per-treatment sums reduce exactly and the F statistic is pure
  // cast-first arithmetic ((b−1)·B/(A−B), the ×16 factors cancel). ──
  def statsQuade(spark: SparkSession, dir: String): DataFrame = {
    val ranked = friedmanGrid(spark, dir)
    val dayRange = ranked.groupBy(col("day"))
      .agg((max(col("revc")) - min(col("revc"))).as("rng"))
    val q2 = dayRange.withColumn("q2",
      rank().over(Window.orderBy(col("rng"))) * 2
        + count(lit(1)).over(Window.partitionBy(col("rng"))) - 1)
      .select(col("day"), col("q2"))
    val cells = ranked.join(q2, "day")
      .withColumn("k",
        count(lit(1)).over(Window.partitionBy(col("day"))))
      .withColumn("s4", col("q2") * (col("r2x") - (col("k") + 1)))
    val perType = cells.groupBy(col("event_type"))
      .agg(sum(col("s4")).as("t4"), count(lit(1)).as("b"),
        first(col("k")).as("k"))
    val a16 = cells.agg(
      sum(expr("CAST(s4 AS DECIMAL(38,0)) * s4")).as("a16"))
    perType
      .agg(first(col("k")).as("k"), first(col("b")).as("n_blocks"),
        // B side summed exactly like A (DECIMAL(38,0), HUGEINT in the
        // oracle): t4² can exceed 2^53, where a double sum becomes
        // partial-aggregation-order-dependent; double only at the ratio
        sum(expr("CAST(t4 AS DECIMAL(38,0)) * t4")).as("b16n"))
      .crossJoin(broadcast(a16))
      .withColumn("bb", expr("cast(b16n as double) / n_blocks"))
      .select(col("n_blocks"), col("k"),
        r6(expr("cast(a16 as double) / 16")).as("a_stat"),
        r6(expr("bb / 16")).as("b_stat"),
        r6(expr("(cast(n_blocks as double) - 1) * bb" +
          " / (cast(a16 as double) - bb)")).as("f_stat"),
        (col("k") - 1).as("df1"),
        ((col("n_blocks") - 1) * (col("k") - 1)).as("df2"))
  }

  /** Nemenyi q_0.05/√2 critical constants by treatment count (published
    * Studentized-range table; the SAME literals appear in the oracle). */
  private val NemenyiQ = Map(2 -> "1.959964", 3 -> "2.343701",
    4 -> "2.569032", 5 -> "2.727774", 6 -> "2.849705")

  // ── Nemenyi post-hoc after Friedman: WHICH event-type pairs differ —
  // the omnibus Q only says "some do". Mean ranks come from the shared
  // doubled-rank grid (exact integers / one division); a pair is
  // flagged when |R̄ᵢ − R̄ⱼ| exceeds the critical distance
  // q·√(k(k+1)/6n) with the published q constant for this k (literal
  // ladder, k ≤ 6 here — extend the table before adding types).
  // Verdicts compare 6-dp-snapped values. ──
  def statsNemenyi(spark: SparkSession, dir: String): DataFrame = {
    val s = friedmanGrid(spark, dir)
      .groupBy(col("event_type"))
      .agg(sum(col("r2x")).as("s2"), count(lit(1)).as("n"))
    val k = s.agg(count(lit(1)).as("k"))
    val qCase = NemenyiQ.toSeq.sortBy(_._1)
      .map { case (kk, q) => s"WHEN $kk THEN ${q}D" }.mkString(" ")
    val withK = s.crossJoin(broadcast(k))
      .withColumn("rbar", expr("cast(s2 as double) / (2 * n)"))
    withK.as("a").join(broadcast(withK.as("b")),
        col("a.event_type") < col("b.event_type"))
      .select(col("a.event_type").as("type_a"),
        col("b.event_type").as("type_b"),
        col("a.n").as("n_blocks"), col("a.k").as("k"),
        col("a.rbar").as("rbar_a"), col("b.rbar").as("rbar_b"))
      .withColumn("diff6", r6(abs(col("rbar_a") - col("rbar_b"))))
      .withColumn("cd6", r6(expr(
        s"(CASE k $qCase END)" +
          " * sqrt(cast(k as double) * (k + 1) / (6.0 * n_blocks))")))
      .select(col("type_a"), col("type_b"),
        r6(col("rbar_a")).as("mean_rank_a"),
        r6(col("rbar_b")).as("mean_rank_b"),
        col("diff6").as("rank_diff"), col("cd6").as("critical_dist"),
        (col("diff6") > col("cd6")).as("significant"))
      .orderBy("type_a", "type_b")
  }

  // ── regression influence diagnostics for the daily revenue trend:
  // per day, the OLS residual, leverage h = 1/n + n(x−x̄)² written as
  // the exact-integer ratio (n·x−Sx)²/(n·(n·Sxx−Sx²)), and Cook's
  // distance e²h/(p·s²·(1−h)²) — which days SINGLE-HANDEDLY steer the
  // trend line regr_trend reports (a launch-day spike can own the
  // slope; this is the audit that finds it). The fit comes from exact
  // int64 moments (y in cents, x = epoch day), residuals are snapped
  // to 6 dp and squared in DECIMAL (the stats_dw device) so SSE is
  // order-independent on both engines; every double division is
  // cast-first from exact integers. Flag at the standard 4/n cut. ──
  def statsInfluence(spark: SparkSession, dir: String): DataFrame = {
    val daily = ev(spark, dir).groupBy(col("day"))
      .agg((sum(col("value").cast("decimal(18,2)")) * 100).cast("long")
        .as("y"))
      .withColumn("x", datediff(col("day"), lit("1970-01-01")).cast("long"))
    val m = daily.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
      sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
      sum(col("x") * col("y")).as("sxy"))
    val withFit = daily.crossJoin(broadcast(m))
      .withColumn("b", expr("cast(n * sxy - sx * sy as double)" +
        " / (n * sxx - sx * sx)"))
      .withColumn("a", expr("(cast(sy as double) - b * sx) / n"))
      .withColumn("ei6", expr(
        "cast(round((y - (a + b * x)) * 1000000, 0) as bigint)"))
      .withColumn("h", expr("cast(1 as double) / n" +
        " + cast((n * x - sx) * (n * x - sx) as double)" +
        " / (cast(n as double) * (n * sxx - sx * sx))"))
    val sse = withFit
      .agg(sum(expr("cast(ei6 as decimal(38,0)) * ei6")).as("ssei"))
    withFit.crossJoin(broadcast(sse))
      .withColumn("s2",
        expr("(cast(ssei as double) / 1000000000000) / (n - 2)"))
      .withColumn("e2", expr("(cast(ei6 as double) / 1000000)" +
        " * (cast(ei6 as double) / 1000000)"))
      .select(col("day"), col("x"), col("y"),
        r6(expr("cast(ei6 as double) / 1000000")).as("resid"),
        r6(col("h")).as("leverage"),
        r6(expr("e2 * h / (2 * s2 * (1 - h) * (1 - h))")).as("cooks_d"),
        (expr("e2 * h / (2 * s2 * (1 - h) * (1 - h))")
          > expr("cast(4 as double) / n")).as("influential"))
      .orderBy("day")
  }

  // ── 2-D activity histogram: the weekday × hour event-density grid
  // (the heatmap behind every "when are users active" panel) — the
  // 2-dim member of the histogram family (width_bucket = 1-D value,
  // hist_equidepth = quantile bins, hist_kde = smoothed). BOTH axes
  // derive from pure integer µs arithmetic (dayno+4 mod 7 anchors
  // 1=Sunday on the epoch's Thursday; hour = µs div 3600000000 mod
  // 24) — no calendar function whose week convention could differ
  // between engines. One keyed aggregation onto a ≤168-row grid; the
  // 1-row total broadcasts for the share. ──
  def hist2d(spark: SparkSession, dir: String): DataFrame = {
    val g = ev(spark, dir)
      .select(expr("pmod(us div 86400000000 + 4, 7) + 1").as("dow"),
        expr("(us div 3600000000) % 24").as("hr"))
      .groupBy(col("dow"), col("hr")).agg(count(lit(1)).as("cnt"))
    val tot = g.agg(sum(col("cnt")).as("total"))
    g.crossJoin(broadcast(tot))
      .select(col("dow"), col("hr"), col("cnt"),
        r6(expr("cast(cnt as double) / total")).as("share"))
      .orderBy("dow", "hr")
  }

  // ── l-diversity audit: k-anonymity ([[privacyKanon]]) only counts
  // HOW MANY rows share a quasi-identifier group — if all of them carry
  // the same sensitive value, the group still leaks it (the homogeneity
  // attack k-anonymity misses; Machanavajjhala et al. 2007). Same QI
  // grid as the kanon key minus the sensitive column (weekday ×
  // value-band), sensitive attribute = event_type; per group l =
  // distinct sensitive values, summarized as the l<2 / l<3 exposure.
  // Two keyed aggregations on the bounded QI grid; all counts exact. ──
  def privacyLDiversity(spark: SparkSession, dir: String): DataFrame = {
    val g = ev(spark, dir)
      .groupBy(expr("pmod(datediff(day, DATE'1970-01-01'), 7)").as("dow"),
        floor(col("value") / 100).as("vb"))
      .agg(count(lit(1)).as("k"),
        countDistinct(col("event_type")).as("l"))
    g.agg(count(lit(1)).as("n_groups"), sum(col("k")).as("n_rows"),
        min(col("l")).as("min_l"),
        sum((col("l") < 2).cast("long")).as("groups_lt_2"),
        sum(when(col("l") < 2, col("k")).otherwise(lit(0L)))
          .as("rows_lt_2"),
        sum((col("l") < 3).cast("long")).as("groups_lt_3"),
        sum(when(col("l") < 3, col("k")).otherwise(lit(0L)))
          .as("rows_lt_3"))
      .select(col("n_groups"), col("n_rows"), col("min_l"),
        col("groups_lt_2"), col("rows_lt_2"),
        col("groups_lt_3"), col("rows_lt_3"),
        r6(col("rows_lt_3").cast("double") / col("n_rows"))
          .as("pct_rows_lt_3"))
  }

  // ── circular statistics of purchase time-of-day: the arithmetic mean
  // of hours is meaningless on a clock (23h and 1h average to noon);
  // the circular mean direction and resultant length R̄ (Fisher 1993)
  // are the right "when do purchases happen / how concentrated" pair.
  // Per type: reduce to the 24-hour integer grid FIRST (counts exact,
  // corpus-size-independent), snap sin/cos of the 24 constant angles
  // to 9 dp DECIMAL (the text_lm_score libm device — JVM and C math
  // libraries are not bit-identical beyond ~1 ulp; snapping makes the
  // weighted sums exact decimal arithmetic), and finish with atan2 +
  // sqrt on the two exact totals. mean_hour is mapped to [0,24). ──
  def statsCircular(spark: SparkSession, dir: String): DataFrame = {
    val g = ev(spark, dir)
      .groupBy(col("event_type"),
        expr("(us div 3600000000) % 24").as("hr"))
      .agg(count(lit(1)).as("c"))
      .withColumn("s9", expr("cast(round(sin(2 * pi() * hr / cast(24 " +
        "as double)), 9) as decimal(12,9))"))
      .withColumn("c9", expr("cast(round(cos(2 * pi() * hr / cast(24 " +
        "as double)), 9) as decimal(12,9))"))
    g.groupBy(col("event_type"))
      .agg(sum(col("c")).as("n"),
        sum(col("s9") * col("c")).as("ss"),
        sum(col("c9") * col("c")).as("sc"))
      .select(col("event_type"), col("n"),
        r6(expr("pmod(atan2(cast(ss as double), cast(sc as double))" +
          " / (2 * pi()) * 24, cast(24 as double))")).as("mean_hour"),
        r6(expr("sqrt(cast(ss as double) * cast(ss as double)" +
          " + cast(sc as double) * cast(sc as double)) / n")).as("r_bar"))
      .orderBy("event_type")
  }

  // ── Herfindahl–Hirschman concentration: per part brand, the supplier
  // revenue-share HHI Σshareᵢ² — the standard "is this market owned by
  // one player" gauge (dist_lorenz/stats_gini measure inequality across
  // a population; HHI measures concentration within a named market).
  // Supplier revenues are DECIMAL-exact (18,2) sums; Σrᵢ² squares in
  // DECIMAL (37,4) — exact on both engines — and the single division
  // casts the two exact totals to double once (den² as the product of
  // two identical casts, deterministic). The part dim broadcasts;
  // per-brand supplier counts are bounded, so every aggregate is
  // keyed + partial. Flag at the DOJ 0.25 threshold. ──
  def distHhi(spark: SparkSession, dir: String): DataFrame = {
    val r = Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("l_suppkey"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).as("r"))
      .withColumn("r", col("r").cast("decimal(18,2)"))
    r.groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_suppliers"),
        sum(col("r")).as("tot"), sum(col("r") * col("r")).as("sq"))
      .select(col("p_brand"), col("n_suppliers"),
        col("tot").cast("double").as("total_rev"),
        r6(expr("cast(sq as double)" +
          " / (cast(tot as double) * cast(tot as double))")).as("hhi"),
        (expr("cast(sq as double)" +
          " / (cast(tot as double) * cast(tot as double))") > lit(0.25d))
          .as("concentrated"))
      .orderBy("p_brand")
  }

  // ── McNemar's paired test: did the SAME users change purchasing
  // behavior between the first and second half of the window — the
  // paired binary companion of stats_wilcoxon_signed (that tests a
  // paired CONTINUOUS shift; this tests a paired YES/NO flip). Only
  // the discordant users carry information: b = purchased-then-
  // stopped, c = started; χ² = (b−c)²/(b+c), 1 df (classic form, no
  // continuity correction — documented). The half-split midpoint is
  // integer day arithmetic on the observed range (scalar broadcast);
  // everything else is one keyed boolean aggregate per user. ──
  def statsMcnemar(spark: SparkSession, dir: String): DataFrame = {
    val p = ev(spark, dir).filter(col("event_type") === "purchase")
      .select(col("user_id"),
        expr("us div 86400000000").as("dayno"))
    val span = p.agg(min(col("dayno")).as("lo"), max(col("dayno")).as("hi"))
    val flags = p.crossJoin(broadcast(span))
      .withColumn("mid", expr("(lo + hi + 1) div 2"))
      .groupBy(col("user_id"))
      .agg(max((col("dayno") < col("mid")).cast("int")).as("p1"),
        max((col("dayno") >= col("mid")).cast("int")).as("p2"))
    flags.agg(count(lit(1)).as("n_users"),
        sum((col("p1") === 1 && col("p2") === 1).cast("long")).as("n_both"),
        sum((col("p1") === 1 && col("p2") === 0).cast("long")).as("b"),
        sum((col("p1") === 0 && col("p2") === 1).cast("long")).as("c"))
      .select(col("n_users"), col("n_both"), col("b"), col("c"),
        // b + c = 0 (no discordant pair anywhere) leaves χ² undefined —
        // report NULL, not 0: "no evidence" ≠ "evidence of no change"
        r6(expr("CASE WHEN b + c > 0 THEN" +
          " cast((b - c) * (b - c) as double) / (b + c) END")).as("chi2"),
        expr("CASE WHEN b + c > 0 THEN" +
          " cast((b - c) * (b - c) as double) / (b + c) > 3.841d" +
          " ELSE false END").as("significant"))
  }

  // ── Tukey box-plot fences per event type: Q1/Q3 by the percentile ↔
  // quantile_cont pairing, fences at ±1.5·IQR SNAPPED to 6 dp before
  // any row compares against them — the snap makes the boundary
  // decision identical on both engines even if the interpolated
  // quantiles differ in the last ulp (values have 2 dp, quantile
  // fractions add 2 more, so 6 dp loses nothing). The quartile pass is
  // one keyed aggregate; the fence pass re-joins the 5-row threshold
  // table broadcast — the IQR-rule outlier gauge next to anomaly_mad's
  // MAD version (fences are the dashboard convention; MAD is the
  // robust-estimator one). ──
  def statsTukey(spark: SparkSession, dir: String): DataFrame = {
    val e = ev(spark, dir)
    val q = e.groupBy(col("event_type"))
      .agg(expr("round(percentile(value, 0.25), 6)").as("q1"),
        expr("round(percentile(value, 0.75), 6)").as("q3"))
      .withColumn("lo", expr("round(q1 - 1.5D * (q3 - q1), 6)"))
      .withColumn("hi", expr("round(q3 + 1.5D * (q3 - q1), 6)"))
    e.join(broadcast(q), "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), first(col("q1")).as("q1"),
        first(col("q3")).as("q3"), first(col("lo")).as("lo"),
        first(col("hi")).as("hi"),
        sum((col("value") < col("lo") || col("value") > col("hi"))
          .cast("long")).as("n_outliers"))
      .select(col("event_type"), col("n"),
        r6(col("q1")).as("q1"), r6(col("q3")).as("q3"),
        r6(col("lo")).as("fence_lo"), r6(col("hi")).as("fence_hi"),
        col("n_outliers"),
        r6(expr("cast(n_outliers as double) / n")).as("pct_outliers"))
      .orderBy("event_type")
  }

  // ── Ulcer Index of the daily revenue series per event type: RMS of
  // the running-peak drawdown percentage — window_drawdown reports how
  // DEEP the worst trough went; UI also charges for how LONG the
  // series sat below its peak (the risk gauge that distinguishes one
  // bad day from a bad month). The series is DECIMAL-exact daily cents
  // with a per-type running max (keyed windows, grid-sized frames);
  // each drawdown% is one double division from exact ints, snapped to
  // 6 dp DECIMAL(12,6) and SQUARED IN DECIMAL so the mean is order-
  // independent; sqrt of one exact total closes it. ──
  def windowUlcer(spark: SparkSession, dir: String): DataFrame = {
    val daily = ev(spark, dir).groupBy(col("event_type"), col("day"))
      .agg((sum(col("value").cast("decimal(18,2)")) * 100).cast("long")
        .as("revc"))
    val peaked = daily.withColumn("peak",
      max(col("revc")).over(Window.partitionBy(col("event_type"))
        .orderBy(col("day")).rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("dd6", expr("cast(round(100 * cast(peak - revc" +
        " as double) / peak, 6) as decimal(12,6))"))
    peaked.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        max(col("dd6")).cast("double").as("max_drawdown_pct"),
        sum(col("dd6") * col("dd6")).as("ssq"))
      .select(col("event_type"), col("n_days"),
        r6(col("max_drawdown_pct")).as("max_drawdown_pct"),
        r6(expr("sqrt(cast(ssq as double) / n_days)")).as("ulcer_index"))
      .orderBy("event_type")
  }

  // ── t-closeness audit, completing the k/l/t privacy triad
  // ([[privacyKanon]] counts group sizes, [[privacyLDiversity]] counts
  // distinct sensitive values; this measures how far each group's
  // sensitive DISTRIBUTION sits from the corpus-wide one — a group can
  // be large and diverse yet still 90% 'purchase' against a 20% base
  // rate, which IS the leak). Distance = total variation (the standard
  // for categorical sensitive attributes): per QI group, TVD·(2·n_g·N)
  // = Σ_t |c_gt·N − C_t·n_g| is EXACT int64 over the complete
  // group×type grid (missing cells as 0), so both engines compare and
  // divide identical integers. Summary = worst group + the t>0.2
  // exposure. ──
  def privacyTCloseness(spark: SparkSession, dir: String): DataFrame = {
    val cells = ev(spark, dir)
      .groupBy(expr("pmod(datediff(day, DATE'1970-01-01'), 7)").as("dow"),
        floor(col("value") / 100).as("vb"), col("event_type"))
      .agg(count(lit(1)).as("c")).cache()
    val glob = cells.groupBy(col("event_type")).agg(sum(col("c")).as("ct"))
    val tot = glob.agg(sum(col("ct")).as("n"))
    val groups = cells.groupBy(col("dow"), col("vb"))
      .agg(sum(col("c")).as("ng"))
    val grid = groups.crossJoin(broadcast(glob))
      .join(cells, Seq("dow", "vb", "event_type"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
      .crossJoin(broadcast(tot))
    val tvd = grid.groupBy(col("dow"), col("vb"))
      .agg(first(col("ng")).as("ng"), first(col("n")).as("n"),
        sum(abs(col("c") * col("n") - col("ct") * col("ng"))).as("num"))
      .withColumn("t", expr("cast(num as double) / (2 * ng * n)"))
    tvd.agg(count(lit(1)).as("n_groups"), sum(col("ng")).as("n_rows"),
        r6(max(col("t"))).as("max_t"),
        sum((col("t") > 0.2).cast("long")).as("groups_gt_02"),
        sum(when(col("t") > 0.2, col("ng")).otherwise(lit(0L)))
          .as("rows_gt_02"))
      .select(col("n_groups"), col("n_rows"), col("max_t"),
        col("groups_gt_02"), col("rows_gt_02"),
        r6(expr("cast(rows_gt_02 as double) / n_rows")).as("pct_rows_gt_02"))
  }

  // ── survival analysis over the event stream: per user, hours from
  // FIRST activity to first high-value purchase (value ≥ 80); users who
  // never convert are right-CENSORED at the corpus horizon — the
  // "time-to-convert with censoring done right" upgrade of
  // funnel_time_to_convert, which silently drops non-converters and so
  // overstates conversion speed. One row per user (keyed aggregation of
  // the 100 TB stream), then every curve/test below runs on the
  // time-grid-sized frame (≤ distinct hours — group-sized state, the
  // stats_ecdf convention for its windows). Durations are pure int64
  // epoch-µs arithmetic, bit-equal in any engine. ──
  private def survSubjects(spark: SparkSession, dir: String): DataFrame = {
    val e = ev(spark, dir)
    val subj = e.groupBy(col("user_id"))
      .agg(min(col("us")).as("t0"),
        min(when(col("event_type") === "purchase" && col("value") >= 80,
          col("us"))).as("tp"))
    val mx = e.agg(max(col("us")).as("mxus"))
    subj.crossJoin(broadcast(mx))
      .select(col("user_id"),
        when(col("tp").isNotNull, 1L).otherwise(0L).as("observed"),
        expr("(coalesce(tp, mxus) - t0) div 3600000000").as("t"))
  }

  // ── Kaplan–Meier product-limit curve of the conversion survival
  // function. n_risk(t) = subjects with T ≥ t (the standard convention:
  // censored-at-t still at risk at t), and S(t) multiplies (1 − d/n)
  // over event times ≤ t. The product crosses the oracle boundary as a
  // 9-dp-snapped DECIMAL sum of ln terms (the text_lm_score device —
  // libm's ~1 ulp can't move a 1e-9 grid), exp'd and rounded at the
  // very end; full extinction (d = n_risk, ln 0 diverges between
  // engines) short-circuits to exactly 0. ──
  def statsKaplanMeier(spark: SparkSession, dir: String): DataFrame = {
    val s = survSubjects(spark, dir)
    val byT = s.groupBy(col("t"))
      .agg(sum(col("observed")).as("d"),
        sum(lit(1L) - col("observed")).as("c"))
    val w = Window.orderBy(col("t"))
    val curve = byT
      .withColumn("n_risk",
        sum(col("d") + col("c")).over(
          w.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      .withColumn("term", expr(
        """CASE WHEN d > 0 AND d < n_risk
          |THEN CAST(round(ln(1.0 - cast(d as double) / n_risk), 9)
          |          AS DECIMAL(18,9)) END""".stripMargin))
      .withColumn("cuml",
        sum(col("term")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .filter(col("d") > 0)
    curve.select(col("t").as("t_hours"), col("n_risk"),
        col("d").as("d_events"), col("c").as("c_censored"),
        r6(expr("CASE WHEN d = n_risk THEN 0.0" +
          " ELSE exp(cast(cuml as double)) END")).as("survival"))
      .orderBy("t_hours")
  }

  // ── two-sample log-rank test: does the hash-A/B split (the
  // ab_srm_check coin — portable Knuth hash of user_id, so both engines
  // and any rerun deal the same groups) convert at the same RATE over
  // time, the censoring-aware alternative to comparing raw conversion
  // fractions. At each pooled event time, group 1's expected events
  // E₁ = d·n₁/n and the hypergeometric variance accumulate as
  // 9-dp-snapped DECIMAL sums; χ² = (ΣO−E)²/ΣV is two exact sums and
  // one final division. Same subjects frame as the KM curve — the two
  // keys share one user-level reduction shape. ──
  def statsLogrank(spark: SparkSession, dir: String): DataFrame = {
    val s = survSubjects(spark, dir).withColumn("g",
      expr("pmod(pmod(user_id, 2147483648) * 2654435761, 2147483648) % 2"))
    val byT = s.groupBy(col("t"))
      .agg(count(lit(1)).as("a"), sum(col("observed")).as("d"),
        sum(when(col("g") === 1, 1L).otherwise(0L)).as("a1"),
        sum(when(col("g") === 1, col("observed")).otherwise(0L)).as("d1"))
    val w = Window.orderBy(col("t"))
    val terms = byT
      .withColumn("n", sum(col("a")).over(
        w.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      .withColumn("n1", sum(col("a1")).over(
        w.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      .filter(col("d") > 0)
      .withColumn("ome", expr(
        """CAST(round(d1 - cast(d as double) * n1 / n, 9)
          |     AS DECIMAL(18,9))""".stripMargin))
      .withColumn("v", expr(
        """CASE WHEN n > 1 THEN CAST(round(
          |  cast(d as double) * n1 / n * (1.0 - cast(n1 as double) / n)
          |    * (n - d) / (n - 1), 9) AS DECIMAL(18,9))
          |ELSE CAST(0 AS DECIMAL(18,9)) END""".stripMargin))
    val grp = s.agg(
      sum(when(col("g") === 1, 1L).otherwise(0L)).as("n1_subj"),
      sum(when(col("g") === 0, 1L).otherwise(0L)).as("n0_subj"),
      sum(when(col("g") === 1, col("observed")).otherwise(0L)).as("o1"),
      sum(when(col("g") === 0, col("observed")).otherwise(0L)).as("o0"))
    terms.agg(sum(col("ome")).as("ome"), sum(col("v")).as("v"))
      .crossJoin(broadcast(grp))
      .select(col("n1_subj"), col("n0_subj"), col("o1"), col("o0"),
        r6(col("ome").cast("double")).as("o_minus_e"),
        r6(col("v").cast("double")).as("var_sum"),
        r6(expr("CASE WHEN cast(v as double) > 0 THEN" +
          " cast(ome as double) * cast(ome as double)" +
          " / cast(v as double) END")).as("chi2"))
  }

  // ── Cochran's Q — the k-treatment extension of stats_mcnemar's
  // paired flip test: across the k event types, do USERS (the blocks)
  // participate at the same rate, judged on the within-user binary
  // profile rather than raw totals (a few hyperactive users can't fake
  // a difference, and user-level correlation is conditioned away).
  // X_ij = "user i emitted a HIGH-VALUE (>150) event of type j" — the
  // plain any-event mark saturates (every user touches every type, k·T
  // = ΣR², denominator 0), so the mark must be selective to carry
  // information; degenerate saturation still guards to NULL. The
  // whole statistic
  // is the closed form (k−1)·(k·ΣC_j² − T²) / (k·T − ΣR_i²) — every
  // term an exact int64 from two keyed aggregations (per-type column
  // sums, per-user row sums), ONE final division. All-zero / all-one
  // users cancel between numerator and denominator, so no block
  // filtering is needed — the fact table reduces to |users|+k rows of
  // state no matter the scale. ──
  def statsCochranQ(spark: SparkSession, dir: String): DataFrame = {
    val pres = ev(spark, dir)
      .filter(col("value") > 150)
      .select(col("user_id"), col("event_type")).distinct()
    val rowsSq = pres.groupBy(col("user_id"))
      .agg(count(lit(1)).as("r"))
      .agg(sum(col("r")).as("t"), sum(col("r") * col("r")).as("sr2"),
        count(lit(1)).as("n_subjects"))
    val colsSq = pres.groupBy(col("event_type"))
      .agg(count(lit(1)).as("c"))
      .agg(count(lit(1)).as("k"), sum(col("c") * col("c")).as("sc2"))
    rowsSq.crossJoin(broadcast(colsSq))
      .select(col("n_subjects"), col("k"), col("t").as("total_marks"),
        (col("k") - 1).as("df"),
        r6(expr("CASE WHEN k * t - sr2 > 0 THEN" +
          " cast((k - 1) * (k * sc2 - t * t) as double)" +
          " / (k * t - sr2) END")).as("q_stat"))
  }

  // ── Page's L trend test — Friedman asks "do the treatments differ
  // AT ALL"; Page asks the sharper ordered question "does daily revenue
  // INCREASE along a hypothesized treatment order" (here the event
  // types in name order — the test's order input is a modeling choice;
  // any fixed order replays identically). Within each day-block, types
  // get DOUBLED average ranks on exact cent revenue (the stats_friedman
  // tie device — integers even under ties), L accumulates as the pure
  // int64 Σ_j j·R2_j (halved at the very end), and the normal
  // approximation z = (L − Nk(k+1)²/4) / √(Nk²(k+1)(k²−1)/144) is
  // arithmetic on those integers (classic untied-variance form; ties
  // make it conservative — documented, matched in the oracle). Block
  // grid is |days|×k — group-sized forever. ──
  def statsPageTrend(spark: SparkSession, dir: String): DataFrame = {
    val rev = ev(spark, dir).groupBy(col("day"), col("event_type"))
      .agg((sum(col("value").cast("decimal(18,2)")) * 100).cast("long")
        .as("revc"))
    val days = rev.select(col("day")).distinct()
    val types = rev.select(col("event_type")).distinct()
      .withColumn("j", row_number().over(
        Window.partitionBy(lit(1)).orderBy(col("event_type"))))
    val grid = days.crossJoin(broadcast(types))
      .join(rev, Seq("day", "event_type"), "left")
      .withColumn("revc", coalesce(col("revc"), lit(0L)))
    val ranked = grid.withColumn("r2x",
      rank().over(Window.partitionBy(col("day")).orderBy(col("revc"))) * 2
        + count(lit(1)).over(Window.partitionBy(col("day"), col("revc")))
        - 1)
    val perType = ranked.groupBy(col("j"))
      .agg(sum(col("r2x")).as("r2"), count(lit(1)).as("n"))
    perType.agg(count(lit(1)).as("k"), first(col("n")).as("n_blocks"),
        sum(col("j") * col("r2")).as("l2"))
      .select(col("n_blocks"), col("k"),
        r6(expr("cast(l2 as double) / 2")).as("l_stat"),
        r6(expr("(cast(l2 as double) / 2" +
          " - cast(n_blocks * k * (k + 1) * (k + 1) as double) / 4)" +
          " / sqrt(cast(n_blocks * k * k * (k + 1) as double)" +
          " * (k * k - 1) / 144)")).as("z"))
  }

  // ── central-DP Laplace release of the event-type histogram — the
  // third privacy mechanism next to privacy_rr_counts (local DP, noise
  // at the client) and the k/l/t audits (no noise, just measurement):
  // a trusted curator adds Laplace(1/ε) to each count (sensitivity 1
  // for a histogram under add/remove-one adjacency) and releases ONLY
  // the noisy values. The noise is inverse-CDF Laplace driven by the
  // portable Knuth-hash uniform seeded on the category's name-order
  // index — like privacy_rr_counts' coin, a REPLAYABLE pseudo-noise
  // (auditable, bit-identical in both engines, and exactly what a
  // seeded production PRNG does); swap in a real entropy source for an
  // actual release. ln snaps to the 1e-9 grid; counts are one keyed
  // aggregation of the fact table — k rows of state. ──
  def privacyDpCounts(spark: SparkSession, dir: String): DataFrame = {
    val counts = ev(spark, dir).groupBy(col("event_type"))
      .agg(count(lit(1)).as("c"))
      .withColumn("j", row_number().over(
        Window.partitionBy(lit(1)).orderBy(col("event_type"))).cast("long"))
    counts
      .withColumn("u", expr(
        "(pmod(pmod(j, 2147483648) * 2654435761, 2147483648) + 1)" +
          " / 2147483649.0"))
      .withColumn("noise", expr(
        """CASE WHEN u < 0.5
          |THEN round(ln(2.0 * u), 9)
          |ELSE -round(ln(2.0 * (1.0 - u)), 9) END""".stripMargin))
      .select(col("event_type"), lit(1.0d).as("epsilon"),
        r6(col("c") + col("noise")).as("noisy_count"))
      .orderBy("event_type")
  }

  // ── Hill tail-index estimator: how heavy is the right tail of order
  // values — α ≈ 1 means Zipf-like (means barely exist; a top-sample
  // IS the mass), α > 3 means thin enough that averages are honest.
  // stats_benford audits digit plausibility and dist_lorenz measures
  // overall inequality; this estimates the tail EXPONENT itself, the
  // number that decides whether p99-based capacity planning works. The
  // estimator only touches the top k+1 = 101 order statistics — at any
  // corpus size that is ONE TakeOrderedAndProject (per-partition heaps,
  // driver merge, deterministic price-then-key total order), then a
  // 101-row frame: H = mean ln(xᵢ/x₍ₖ₊₁₎) over the top k, α = 1/H,
  // with ln terms 9-dp-snapped and DECIMAL-summed. ──
  def statsHillTail(spark: SparkSession, dir: String): DataFrame = {
    val top = Tables.orders(spark, dir)
      .select(col("o_totalprice").as("x"), col("o_orderkey"))
      .orderBy(desc("x"), col("o_orderkey"))
      .limit(101)
    val w = Window.partitionBy(lit(1))
      .orderBy(desc("x"), col("o_orderkey"))
    top
      .withColumn("rn", row_number().over(w))
      .withColumn("thr", min(col("x")).over(Window.partitionBy(lit(1))))
      .filter(col("rn") <= 100)
      .withColumn("term", expr(
        "CAST(round(ln(x / thr), 9) AS DECIMAL(18,9))"))
      .agg(count(lit(1)).as("k"), min(col("thr")).as("x_threshold"),
        sum(col("term")).as("s"))
      .select(col("k"), col("x_threshold"),
        r6(expr("cast(s as double) / k")).as("hill_h"),
        r6(expr("cast(k as double) / cast(s as double)")).as("alpha"))
  }

  // ── stochastic oscillator (%K/%D) on daily revenue — window_rsi asks
  // "how one-sided were the last 14 changes"; this asks the complement
  // "WHERE in the last-14-day range does today close": %K = 100·(C −
  // L14)/(H14 − L14) positions today between the trailing low and high,
  // %D smooths %K over 3 days. Daily revenue reduces to exact int64
  // CENTS first (the window_rsi device), so L14/H14 are integer window
  // min/max and %K is one cast-first division; %D snaps %K to a 6-dp
  // DECIMAL and averages THOSE (3-row frame — exact sum, one division),
  // so no order-dependent double accumulation anywhere. Flat 14-day
  // ranges (H = L) yield NULL, not 0/0. Per-type windows — parallel,
  // bounded state, the series frame is group-sized at any corpus. ──
  def windowStochastic(spark: SparkSession, dir: String): DataFrame = {
    val daily = ev(spark, dir).groupBy(col("event_type"), col("day"))
      .agg((sum(col("value").cast("decimal(18,2)")) * 100).cast("long")
        .as("revc"))
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val w14 = wOrd.rowsBetween(-13, 0)
    val w3 = wOrd.rowsBetween(-2, 0)
    daily
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("l14", min(col("revc")).over(w14))
      .withColumn("h14", max(col("revc")).over(w14))
      .withColumn("k6", expr(
        """CASE WHEN h14 > l14 THEN
          |CAST(round(100.0 * cast(revc - l14 as double) / (h14 - l14), 6)
          |     AS DECIMAL(12,6)) END""".stripMargin))
      .withColumn("ks", sum(col("k6")).over(w3))
      .withColumn("kn", count(col("k6")).over(w3))
      .filter(col("rn") >= 14)
      .select(col("event_type"), col("day"),
        r6(col("k6").cast("double")).as("pct_k"),
        r6(expr("CASE WHEN kn > 0 THEN cast(ks as double) / kn END"))
          .as("pct_d"))
      .orderBy("event_type", "day")
  }

  // ── Cochran–Armitage trend test: does the purchase RATE rise
  // monotonically across the ordered day-of-week groups (scores w =
  // 0..6) — stats_chi2 detects ANY association at k−1 df; spending its
  // single df on the ordered alternative makes this strictly more
  // powerful when a trend is the hypothesis. The χ² form
  // N·(N·Σwr − R·Σwn)² / (R·(N−R)·(N·Σw²n − (Σwn)²)) is evaluated on
  // five exact int64 sums from ONE keyed aggregation; the products run
  // in DECIMAL (≤1e37 — no int64 wrap at any corpus size) and exactly
  // one final double division crosses the oracle boundary. trend_dir is
  // the sign of the numerator: +1 = rate rising over the week. ──
  def statsPropTrend(spark: SparkSession, dir: String): DataFrame = {
    val g = ev(spark, dir)
      .groupBy(expr("pmod(datediff(day, DATE'1970-01-01'), 7)").as("w"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("r"))
    g.agg(sum(col("n")).as("nt"), sum(col("r")).as("rt"),
        sum(col("w") * col("n")).as("swn"),
        sum(col("w") * col("w") * col("n")).as("sw2n"),
        sum(col("w") * col("r")).as("swr"))
      .withColumn("num", expr(
        "cast(nt as decimal(18,0)) * swr - cast(rt as decimal(18,0)) * swn"))
      .withColumn("den1", expr("cast(rt as decimal(18,0)) * (nt - rt)"))
      .withColumn("den2", expr(
        "cast(nt as decimal(18,0)) * sw2n" +
          " - cast(swn as decimal(18,0)) * swn"))
      .select(col("nt").as("n_total"), col("rt").as("r_total"),
        expr("cast(sign(cast(num as double)) as int)").as("trend_dir"),
        r6(expr("cast(num as double) * cast(num as double)" +
          " * nt / (cast(den1 as double) * cast(den2 as double))"))
          .as("chi2_trend"))
  }

  // ── peaks-over-threshold EVT fit — stats_hill_tail estimates the tail
  // EXPONENT; this fits the full generalized-Pareto excess model the
  // capacity planner actually simulates from (P(X−u > y | X > u) ≈
  // GPD(ξ, σ)). Threshold u = the 51st order statistic under the
  // deterministic (price desc, orderkey) total order — a rank threshold,
  // not an engine quantile, so both engines select the identical excess
  // set via ONE TakeOrderedAndProject. Excesses snap to exact int64
  // CENTS (prices are 2-dp); mean and variance come from integer
  // Σy/Σy² via the n·Σy²−(Σy)² form, and the ξ/σ method-of-moments
  // (ξ = ½(1−m²/s²), σ = ½m(m²/s²+1)) is pure arithmetic on those two
  // exact numbers, in identical textual order in the oracle. ──
  def anomalyPot(spark: SparkSession, dir: String): DataFrame = {
    val top = Tables.orders(spark, dir)
      .select(col("o_totalprice").as("x"), col("o_orderkey"))
      .orderBy(desc("x"), col("o_orderkey"))
      .limit(51)
    val w = Window.partitionBy(lit(1))
      .orderBy(desc("x"), col("o_orderkey"))
    top
      .withColumn("rn", row_number().over(w))
      .withColumn("u", min(col("x")).over(Window.partitionBy(lit(1))))
      .filter(col("rn") <= 50)
      .withColumn("yc", expr("CAST(round((x - u) * 100, 0) AS BIGINT)"))
      .groupBy(col("u"))
      .agg(count(lit(1)).as("n"), sum(col("yc")).as("sy"),
        sum(col("yc") * col("yc")).as("sy2"))
      .withColumn("m", expr("cast(sy as double) / 100 / n"))
      .withColumn("s2", expr(
        "cast(n * sy2 - sy * sy as double) / (n * (n - 1)) / 10000"))
      .withColumn("rr", expr("m * m / s2"))
      .select(col("n").as("n_exceed"), col("u").as("threshold"),
        r6(col("m")).as("mean_excess"),
        r6(expr("0.5 * (1.0 - rr)")).as("xi"),
        r6(expr("0.5 * m * (rr + 1.0)")).as("sigma"))
  }

  // ── SES hyperparameter grid search — forecast_holt runs ONE fixed
  // smoothing constant; real forecasting picks α by backtest. Each α in
  // the grid folds the same group-sized daily series through the
  // s ← αy + (1−α)s recursion accumulating the one-step-ahead SSE
  // (e_t = y_t − s_{t−1}), the standard selection criterion; the
  // winner is flagged by exact (rounded-SSE, α) rank. The corpus
  // reduces to ONE daily series once, then the 4-point grid explodes
  // against it — adding grid points costs |grid| folds over an
  // in-memory array, never another corpus scan. The oracle replays
  // every fold step bit-for-bit as a recursive CTE carrying α. ──
  def forecastSesGrid(spark: SparkSession, dir: String): DataFrame = {
    val series = ev(spark, dir)
      .groupBy(col("day"))
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("y"))
      .agg(sort_array(collect_list(struct(col("day"), col("y")))).as("s"))
      .filter(size(col("s")) >= 2)
    val grid = series.select(col("s"),
      explode(expr("array(0.2D, 0.4D, 0.6D, 0.8D)")).as("alpha"))
    val folded = grid.withColumn("st", expr(
      """aggregate(
        |  slice(s, 2, size(s) - 1),
        |  named_struct('sv', s[0].y, 'sse', 0D),
        |  (st, p) -> named_struct(
        |    'sv', alpha * p.y + (1.0D - alpha) * st.sv,
        |    'sse', st.sse + (p.y - st.sv) * (p.y - st.sv)))""".stripMargin))
      .select(col("alpha"), size(col("s")).cast("long").as("n_days"),
        r6(col("st.sv")).as("level"), r6(col("st.sse")).as("sse"))
    folded
      .withColumn("is_best", (row_number().over(Window.partitionBy(lit(1))
        .orderBy(col("sse"), col("alpha"))) === 1))
      .orderBy("alpha")
  }

  // ── Lincoln–Petersen / Chapman capture–recapture: estimate the TOTAL
  // user population from two one-week sighting windows — the ecology
  // estimator that answers "how many users exist that we have not seen
  // yet" from overlap alone (approx_distinct counts who DID appear;
  // this extrapolates to who exists). Windows are the first and second
  // 7-day spans from the corpus min day (data-derived, integer day
  // arithmetic); n₁, n₂ and the recapture overlap m reduce to per-user
  // presence flags — ONE scan, |users| rows of state. Both the classic
  // n₁n₂/m and the small-sample Chapman form (with its standard error)
  // are pure arithmetic on three exact integers, and the ACTUAL
  // two-window distinct count rides along so the estimate is audited
  // against truth in the same row. ──
  def statsLincolnPetersen(spark: SparkSession, dir: String): DataFrame = {
    val e = ev(spark, dir)
    val mn = e.agg(min(col("day")).as("d0"))
    val flags = e.crossJoin(broadcast(mn))
      .withColumn("off", datediff(col("day"), col("d0")))
      .filter(col("off") < 14)
      .groupBy(col("user_id"))
      .agg(max((col("off") < 7).cast("long")).as("in_a"),
        max((col("off") >= 7).cast("long")).as("in_b"))
    flags.agg(sum(col("in_a")).as("n1"), sum(col("in_b")).as("n2"),
        sum(col("in_a") * col("in_b")).as("m"),
        count(lit(1)).as("n_seen"))
      .select(col("n1"), col("n2"), col("m"), col("n_seen"),
        r6(expr("CASE WHEN m > 0 THEN" +
          " cast(n1 as double) * n2 / m END")).as("n_hat_lp"),
        r6(expr("cast((n1 + 1) as double) * (n2 + 1) / (m + 1) - 1.0"))
          .as("n_hat_chapman"),
        r6(expr("sqrt(cast((n1 + 1) as double) * (n2 + 1) * (n1 - m)" +
          " * (n2 - m) / (cast((m + 1) as double) * (m + 1) * (m + 2)))"))
          .as("se_chapman"))
  }

  // ── overdispersion check + negative-binomial fit on per-user event
  // counts: a Poisson process has variance ≈ mean; real user activity
  // clumps (sessions, bursts), and the dispersion index D = s²/m says
  // HOW badly the Poisson assumption fails — with the method-of-moments
  // NB parameters (r = m²/(s²−m), p = m/s²) as the distribution you
  // should be simulating load with instead. Counts reduce to exact
  // int64 (Σk, Σk²) in one keyed-then-global aggregation; sample
  // variance uses the n·Σk²−(Σk)² form (no mean subtraction, no
  // cancellation), and every output is one double op on those integers.
  // Equidispersed data (s² ≤ m) yields NULL NB parameters, not a
  // division blow-up. ──
  def statsOverdispersion(spark: SparkSession, dir: String): DataFrame = {
    val counts = ev(spark, dir).groupBy(col("user_id"))
      .agg(count(lit(1)).as("k"))
    counts.agg(count(lit(1)).as("n"), sum(col("k")).as("sk"),
        sum(col("k") * col("k")).as("sk2"))
      .withColumn("m", expr("cast(sk as double) / n"))
      .withColumn("s2", expr(
        "cast(n * sk2 - sk * sk as double) / (cast(n as double) * (n - 1))"))
      .select(col("n").as("n_users"), r6(col("m")).as("mean_events"),
        r6(col("s2")).as("var_events"),
        r6(expr("s2 / m")).as("dispersion"),
        r6(expr("CASE WHEN s2 > m THEN m * m / (s2 - m) END")).as("nb_r"),
        r6(expr("CASE WHEN s2 > m THEN m / s2 END")).as("nb_p"),
        expr("s2 <= 1.5 * m").as("near_poisson"))
  }

  // ── time-decayed engagement score over IRREGULAR event times —
  // window_ewma decays per ROW, which treats a 5-second burst like a
  // 5-day absence; this decays by the ACTUAL gap (τ = 6 h half-life
  // scale): score = Σᵢ vᵢ·e^{−(T_last−tᵢ)/τ}. The recursion
  // s ← v + e^{−Δt/τ}·s unrolls exactly to that weighted sum (the
  // exponentials compose), so NO sequential fold is needed: one
  // per-user window max for T_last, then a keyed aggregation whose
  // terms snap to the 1e-9 grid before an exact DECIMAL sum — scan
  // speed at any corpus size, and the one libm call per row (exp)
  // is absorbed by the snap. The freshness-weighted user-value score
  // a ranking feature store recomputes continuously. ──
  def windowEwmaTimedecay(spark: SparkSession, dir: String): DataFrame = {
    val perUser = Window.partitionBy(col("user_id"))
    ev(spark, dir)
      .withColumn("last_us", max(col("us")).over(perUser))
      .withColumn("term", expr(
        """CAST(round(value
          |  * exp(-(cast(last_us - us as double) / 21600000000.0D)), 9)
          |  AS DECIMAL(28,9))""".stripMargin))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        r6(sum(col("term")).cast("double")).as("decayed_score"))
      .orderBy("user_id")
  }

  // ── Nelson–Aalen cumulative hazard over the same censored
  // conversion-time frame as [[statsKaplanMeier]]: H(t) = Σ dᵢ/nᵢ —
  // the hazard-scale view (KM answers "what fraction survives";
  // the hazard increments answer "how INTENSE is conversion pressure
  // at each age", and Breslow's e^{−H} is the estimator that stays
  // defined past full extinction). Same one-pass subjects reduction;
  // the d/n increments snap to the 1e-9 grid and cumulate as an exact
  // DECIMAL window sum over the time-grid-sized frame. ──
  def statsNelsonAalen(spark: SparkSession, dir: String): DataFrame = {
    val s = survSubjects(spark, dir)
    val byT = s.groupBy(col("t"))
      .agg(sum(col("observed")).as("d"),
        sum(lit(1L) - col("observed")).as("c"))
    val w = Window.orderBy(col("t"))
    byT
      .withColumn("n_risk",
        sum(col("d") + col("c")).over(
          w.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      .withColumn("h_term", expr(
        """CASE WHEN d > 0
          |THEN CAST(round(cast(d as double) / n_risk, 9)
          |          AS DECIMAL(18,9))
          |ELSE CAST(0 AS DECIMAL(18,9)) END""".stripMargin))
      .withColumn("ch",
        sum(col("h_term")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .filter(col("d") > 0)
      .select(col("t").as("t_hours"), col("n_risk"),
        col("d").as("d_events"),
        r6(col("ch").cast("double")).as("cum_hazard"),
        r6(expr("exp(-cast(ch as double))")).as("s_breslow"))
      .orderBy("t_hours")
  }

  // ── difference-in-proportions confidence interval for the hash-A/B
  // purchase rate — ab_srm_check validates the SPLIT, stats_wilson_ci
  // bounds each arm alone; the decision quantity is Δ = p₁ − p₀ with
  // its Wald 95% interval, plus the Newcombe hybrid (Wilson bounds per
  // arm, combined) that stays honest at extreme rates. Counts are four
  // exact int64s from one keyed pass over the deterministic split;
  // every interval bound is textual-identical arithmetic on them. The
  // "ship it / no difference" row an experimentation platform emits
  // per metric. ──
  def statsTwoPropCi(spark: SparkSession, dir: String): DataFrame = {
    val g = ev(spark, dir)
      .groupBy(expr(
        "pmod(pmod(user_id, 2147483648) * 2654435761, 2147483648) % 2")
        .as("g"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("r"))
    val wide = g.agg(
      sum(when(col("g") === 0, col("n"))).as("n0"),
      sum(when(col("g") === 0, col("r"))).as("r0"),
      sum(when(col("g") === 1, col("n"))).as("n1"),
      sum(when(col("g") === 1, col("r"))).as("r1"))
    wide
      .withColumn("p0", expr("cast(r0 as double) / n0"))
      .withColumn("p1", expr("cast(r1 as double) / n1"))
      .withColumn("se", expr(
        "sqrt(p0 * (1.0 - p0) / n0 + p1 * (1.0 - p1) / n1)"))
      // Wilson bounds per arm (z = 1.96), the stats_wilson_ci device
      .withColumn("w0l", expr(
        "(p0 + 1.9208D / n0 - 1.96 * sqrt(p0 * (1.0 - p0) / n0" +
          " + 0.9604D / (cast(n0 as double) * n0))) / (1.0 + 3.8416D / n0)"))
      .withColumn("w0u", expr(
        "(p0 + 1.9208D / n0 + 1.96 * sqrt(p0 * (1.0 - p0) / n0" +
          " + 0.9604D / (cast(n0 as double) * n0))) / (1.0 + 3.8416D / n0)"))
      .withColumn("w1l", expr(
        "(p1 + 1.9208D / n1 - 1.96 * sqrt(p1 * (1.0 - p1) / n1" +
          " + 0.9604D / (cast(n1 as double) * n1))) / (1.0 + 3.8416D / n1)"))
      .withColumn("w1u", expr(
        "(p1 + 1.9208D / n1 + 1.96 * sqrt(p1 * (1.0 - p1) / n1" +
          " + 0.9604D / (cast(n1 as double) * n1))) / (1.0 + 3.8416D / n1)"))
      .select(col("n0"), col("r0"), col("n1"), col("r1"),
        r6(expr("p1 - p0")).as("delta"),
        r6(expr("p1 - p0 - 1.96 * se")).as("wald_lo"),
        r6(expr("p1 - p0 + 1.96 * se")).as("wald_hi"),
        r6(expr("p1 - p0 - sqrt((p1 - w1l) * (p1 - w1l)" +
          " + (w0u - p0) * (w0u - p0))")).as("newcombe_lo"),
        r6(expr("p1 - p0 + sqrt((w1u - p1) * (w1u - p1)" +
          " + (p0 - w0l) * (p0 - w0l))")).as("newcombe_hi"))
  }

  // ── Neyman-optimal stratified-sample allocation: given a 1,000-row
  // budget over the event-type strata, n_h ∝ N_h·S_h — big AND noisy
  // strata get the rows, tiny/homogeneous ones don't waste them (the
  // design step BEFORE sample_stratified's fixed rates; proportional
  // allocation rides along to show what naive stratification would
  // do). Per-stratum S_h comes from exact int64 cent moments
  // (n·Σx²−(Σx)² — the stats_overdispersion form); allocations use
  // floor(budget·share) with the remainder going to the largest
  // fractional parts (largest-remainder rounding, deterministic by
  // (frac desc, type)), so Σn_h = budget exactly in both engines. ──
  def sampleNeymanAlloc(spark: SparkSession, dir: String): DataFrame = {
    val strata = ev(spark, dir).groupBy(col("event_type"))
      .agg(count(lit(1)).as("nh"),
        sum((col("value").cast("decimal(18,2)") * 100).cast("long"))
          .as("sx"),
        sum(expr(
          "cast(cast(value as decimal(18,2)) * 100 as bigint)" +
            " * cast(cast(value as decimal(18,2)) * 100 as bigint)"))
          .as("sx2"))
      .withColumn("sh", expr(
        "sqrt(cast(nh * sx2 - sx * sx as double)" +
          " / (cast(nh as double) * (nh - 1))) / 100"))
      .withColumn("w", expr(
        "CAST(round(nh * sh, 6) AS DECIMAL(28,6))"))
    val tot = strata.agg(sum(col("w")).as("tw"), sum(col("nh")).as("tn"))
    val alloc = strata.crossJoin(broadcast(tot))
      .withColumn("share", expr("cast(w as double) / cast(tw as double)"))
      .withColumn("n_base", expr("CAST(floor(1000 * share) AS BIGINT)"))
      .withColumn("frac", expr("1000 * share - n_base"))
    val short = alloc.agg((lit(1000L) - sum(col("n_base"))).as("rem"))
    alloc.crossJoin(broadcast(short))
      .withColumn("rk", row_number().over(Window.partitionBy(lit(1))
        .orderBy(desc("frac"), col("event_type"))))
      .select(col("event_type"), col("nh").as("n_stratum"),
        r6(col("sh")).as("stddev_value"),
        r6(col("share")).as("neyman_share"),
        (col("n_base") + when(col("rk") <= col("rem"), 1L).otherwise(0L))
          .as("n_alloc"),
        expr("CAST(round(1000 * cast(nh as double) / tn, 0) AS BIGINT)")
          .as("n_proportional"))
      .orderBy("event_type")
  }

  // One shared set of smoothing constants, stringified from the SAME
  // Scala doubles the oracle interpolates — Scala's Double.toString is
  // the shortest round-trip representation, so both engines parse the
  // bit-identical constant.
  private val MacdD12 = (11.0 / 13.0).toString
  private val MacdA12 = (2.0 / 13.0).toString
  private val MacdD26 = (25.0 / 27.0).toString
  private val MacdA26 = (2.0 / 27.0).toString
  private val MacdD9 = (0.8).toString
  private val MacdA9 = (0.2).toString

  // ── MACD(12, 26, 9) on daily revenue — the trend-vs-momentum
  // completion of the TA family (RSI positions within the recent range,
  // Bollinger bands the level, MACD reads the CROSSOVER of two decay
  // horizons). Each EMA is the pandas adjust=true closed form — a
  // geometric-weighted mean over a bounded trailing frame (the
  // window_ewma device: finite window, exact partial-window
  // normalization (1−dⁿ)/α). MACD snaps to 6 dp BEFORE the signal
  // EMA consumes it, so the second smoothing stage reads provably
  // identical inputs in both engines. Per-type windows; the series
  // frame is day-grid-sized at any corpus. ──
  def windowMacd(spark: SparkSession, dir: String): DataFrame = {
    val daily = ev(spark, dir).groupBy(col("event_type"), col("day"))
      .agg((sum(col("value").cast("decimal(18,2)")) * 100).cast("long")
        .as("revc"))
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("day"))
    def ema(h: String, d: String, a: String): String =
      s"""aggregate(transform($h, (x, i) -> x * pow($d, size($h) - 1 - i)),
         |  0D, (acc, t) -> acc + t)
         |/ ((1.0D - pow($d, cast(size($h) as double))) / $a)""".stripMargin
    val staged = daily
      .withColumn("h12",
        collect_list(col("revc").cast("double")).over(
          wOrd.rowsBetween(-11, 0)))
      .withColumn("h26",
        collect_list(col("revc").cast("double")).over(
          wOrd.rowsBetween(-25, 0)))
      .withColumn("macd", round(
        expr(ema("h12", MacdD12, MacdA12)) -
          expr(ema("h26", MacdD26, MacdA26)), 6) + lit(0.0d))
    staged
      .withColumn("h9",
        collect_list(col("macd")).over(wOrd.rowsBetween(-8, 0)))
      .withColumn("signal",
        round(expr(ema("h9", MacdD9, MacdA9)), 6) + lit(0.0d))
      .select(col("event_type"), col("day"), col("macd"), col("signal"),
        r6(col("macd") - col("signal")).as("histogram"))
      .orderBy("event_type", "day")
  }

  private val KeltD = (19.0 / 21.0).toString
  private val KeltA = (2.0 / 21.0).toString

  // ── Keltner channel per event type: 20-EMA of the typical price
  // (h+l+c)/3 banded at ±2·ATR(10) — the volatility-adaptive envelope
  // (window_bollinger's bands breathe with stddev; Keltner's with true
  // range, so gaps widen them too). Composes the two audited devices:
  // the window-listed finite-history EMA (window_macd's fold, summed
  // in identical element order in both engines) and window_atr's
  // integer true range. Bands and flags compare 6-dp-snapped values;
  // entity-partitioned, full frames only. ──
  def windowKeltner(spark: SparkSession, dir: String): DataFrame = {
    val bars = ev(spark, dir)
      .withColumn("vc",
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"))
      .groupBy(col("event_type"), col("day"))
      .agg(max(col("vc")).as("h"), min(col("vc")).as("l"),
        max(struct(col("us"), col("event_id"), col("vc")))
          .getField("vc").as("c"))
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("day"))
    def ema(h: String, d: String, a: String): String =
      s"""aggregate(transform($h, (x, i) -> x * pow($d, size($h) - 1 - i)),
         |  0D, (acc, t) -> acc + t)
         |/ ((1.0D - pow($d, cast(size($h) as double))) / $a)""".stripMargin
    bars
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("pc", lag(col("c"), 1).over(wOrd))
      .withColumn("tr", greatest(col("h") - col("l"),
        abs(col("h") - col("pc")), abs(col("l") - col("pc"))))
      .withColumn("tpd", expr("cast(h + l + c as double) / 3"))
      .withColumn("h20",
        collect_list(col("tpd")).over(wOrd.rowsBetween(-19, 0)))
      .withColumn("atr_c", sum(col("tr")).over(wOrd.rowsBetween(-9, 0)))
      .filter(col("rn") >= 20)
      .withColumn("mid6",
        round(expr(ema("h20", KeltD, KeltA) + "/ 100"), 6) + lit(0.0d))
      .withColumn("atr6", r6(expr("cast(atr_c as double) / 1000")))
      .withColumn("up6", r6(col("mid6") + lit(2.0d) * col("atr6")))
      .withColumn("lo6", r6(col("mid6") - lit(2.0d) * col("atr6")))
      .select(col("event_type"), col("day"),
        r6(expr("cast(c as double) / 100")).as("close"),
        col("mid6").as("mid_ema20"), col("atr6").as("atr10"),
        col("up6").as("upper"), col("lo6").as("lower"),
        (expr("cast(c as double) / 100") > col("up6")).as("above_upper"),
        (expr("cast(c as double) / 100") < col("lo6")).as("below_lower"))
      .orderBy("event_type", "day")
  }

  // ── Heikin-Ashi candles per event type: the smoothed OHLC transform
  // (haClose = mean of the bar, haOpen = midpoint of the PRIOR HA
  // candle) chart platforms use to de-noise trend runs. The haOpen
  // recursion unrolls to the exact geometric form haOpen_t =
  // c₁·½^(t−1) + Σ_{j<t} haClose_j·½^(t−j) — the window-listed
  // power-weight fold again (summed in identical element order in
  // both engines), so no sequential scan exists in the plan; ½-powers
  // of the day-count-bounded history underflow double well past any
  // real series length. Open is the previous close (first bar: its own
  // close) since the bars carry no session open. ──
  def windowHeikinAshi(spark: SparkSession, dir: String): DataFrame = {
    val bars = ev(spark, dir)
      .withColumn("vc",
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"))
      .groupBy(col("event_type"), col("day"))
      .agg(max(col("vc")).as("h"), min(col("vc")).as("l"),
        max(struct(col("us"), col("event_id"), col("vc")))
          .getField("vc").as("c"))
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("day"))
    bars
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("o", coalesce(lag(col("c"), 1).over(wOrd), col("c")))
      .withColumn("hc", expr("cast(o + h + l + c as double) / 4"))
      .withColumn("c1", first(col("c")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("hist", collect_list(col("hc")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("ho", expr(
        """cast(c1 as double) * pow(0.5, rn - 1)
          |+ aggregate(transform(hist,
          |    (x, i) -> x * pow(0.5, size(hist) - i)),
          |  0D, (acc, t) -> acc + t)""".stripMargin))
      .withColumn("ho6", r6(expr("ho / 100")))
      .withColumn("hc6", r6(expr("hc / 100")))
      .select(col("event_type"), col("day"),
        col("ho6").as("ha_open"), col("hc6").as("ha_close"),
        r6(expr("greatest(cast(h as double), ho, hc) / 100"))
          .as("ha_high"),
        r6(expr("least(cast(l as double), ho, hc) / 100")).as("ha_low"),
        (col("hc6") > col("ho6")).as("bullish"))
      .orderBy("event_type", "day")
  }

  // ── Breusch–Pagan heteroscedasticity test on the daily revenue
  // trend: stats_dw asks whether the trend's residuals are serially
  // correlated; this asks whether their VARIANCE grows along the trend
  // (fan-shaped residuals make every OLS standard error a lie, which
  // is exactly when regr_trend's r² overstates confidence). The
  // auxiliary regression e² ~ day reduces to the closed R² form on
  // exact sums: residuals snap to 6 dp (the stats_dw device), e²
  // snaps to integer µ-units, and all five moments accumulate in
  // DECIMAL — LM = n·R² is one double expression at the end, flagged
  // against the χ²(1) 5% critical value. ──
  def statsBreuschPagan(spark: SparkSession, dir: String): DataFrame = {
    val daily = dailySeries(spark, dir)
    val fit = daily.groupBy(col("event_type"))
      .agg(expr("regr_slope(v, CAST(dayno AS DOUBLE))").as("b"),
        expr("regr_intercept(v, CAST(dayno AS DOUBLE))").as("a"))
    daily.join(broadcast(fit), Seq("event_type"))
      .withColumn("e", expr(
        "CAST(round(v - (a + b * CAST(dayno AS DOUBLE)), 6)" +
          " AS DECIMAL(24,6))"))
      .withColumn("e2m", expr(
        "CAST(round(cast(e as double) * cast(e as double) * 1000000, 0)" +
          " AS DECIMAL(18,0))"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(dayno AS DECIMAL(18,0))")).as("sx"),
        sum(expr("CAST(dayno AS DECIMAL(18,0))" +
          " * CAST(dayno AS DECIMAL(18,0))")).as("sx2"),
        sum(col("e2m")).as("se"),
        sum(expr("CAST(e2m AS DECIMAL(28,0)) * e2m")).as("se2"),
        sum(expr("CAST(dayno AS DECIMAL(18,0)) * e2m")).as("sxe"))
      .withColumn("r2", expr(
        """(cast(n * sxe - sx * se as double)
          |  * cast(n * sxe - sx * se as double))
          |/ (cast(n * sx2 - sx * sx as double)
          |  * cast(n * se2 - se * se as double))""".stripMargin))
      .select(col("event_type"), col("n"),
        r6(expr("n * r2")).as("lm_stat"),
        expr("n * r2 > 3.841459").as("heteroscedastic"))
      .orderBy("event_type")
  }

  private val CrostonA = (0.1).toString

  // ── Croston's method for INTERMITTENT demand — Holt/Holt-Winters
  // assume a dense series; per-part order quantities are mostly-zero
  // spiky series where exponential smoothing of the raw signal decays
  // to noise between spikes. Croston smooths two things separately at
  // demand OCCURRENCES only: the nonzero demand size z and the
  // inter-arrival gap p; the per-day forecast is z/p. No dense spine
  // is ever materialized — the fold walks the occurrence list
  // (group-sized per part) carrying (z, p, prev-day) state, exactly
  // the forecast_holt scale shape, and the oracle replays the
  // recursion per part as a recursive CTE. Init pinned: z from the
  // first two demands, p from their gap. Top-50 series by occurrence
  // count via TakeOrderedAndProject. ──
  def forecastCroston(spark: SparkSession, dir: String): DataFrame = {
    val dem = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_partkey").as("part"),
        expr("datediff(to_date(o_orderdate), DATE'1970-01-01')")
          .cast("long").as("dayno"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
        .as("d"))
    val a = CrostonA
    val folded = dem.groupBy(col("part"))
      .agg(sort_array(collect_list(struct(col("dayno"), col("d"))))
        .as("s"))
      .filter(size(col("s")) >= 3)
      .withColumn("st", expr(
        s"""aggregate(
           |  slice(s, 3, size(s) - 2),
           |  named_struct(
           |    'z', ${a}D * s[1].d + (1.0D - ${a}D) * s[0].d,
           |    'p', CAST(s[1].dayno - s[0].dayno AS DOUBLE),
           |    'pt', s[1].dayno),
           |  (st, pp) -> named_struct(
           |    'z', ${a}D * pp.d + (1.0D - ${a}D) * st.z,
           |    'p', ${a}D * CAST(pp.dayno - st.pt AS DOUBLE)
           |           + (1.0D - ${a}D) * st.p,
           |    'pt', pp.dayno))""".stripMargin))
    folded
      .select(col("part"), size(col("s")).cast("long").as("n_points"),
        r6(col("st.z")).as("z_size"), r6(col("st.p")).as("p_interval"),
        r6(expr("st.z / st.p")).as("rate_per_day"))
      .orderBy(desc("n_points"), col("part"))
      .limit(50)
  }

  /** Stratified 2×2 table frame shared by [[statsMantelHaenszel]] and
    * [[statsWoolf]]: stratum = day-of-week, exposure = the portable
    * user-hash arm (ab_srm_check's replayable assignment), outcome =
    * purchase event. One keyed aggregation to 7 rows of exact int64
    * cell counts. */
  private def strataTables(spark: SparkSession, dir: String): DataFrame =
    ev(spark, dir)
      .withColumn("arm", expr(
        "pmod(pmod(user_id, 2147483648) * 2654435761, 2147483648) % 2"))
      .withColumn("dow", expr("pmod(datediff(day, DATE'1970-01-01'), 7)"))
      .withColumn("succ", (col("event_type") === "purchase").cast("long"))
      .groupBy(col("dow"))
      .agg(sum(when(col("arm") === 1, col("succ")).otherwise(0L)).as("a"),
        sum(when(col("arm") === 1, lit(1L) - col("succ")).otherwise(0L))
          .as("b"),
        sum(when(col("arm") === 0, col("succ")).otherwise(0L)).as("c"),
        sum(when(col("arm") === 0, lit(1L) - col("succ")).otherwise(0L))
          .as("d"))
      .withColumn("n", col("a") + col("b") + col("c") + col("d"))

  // ── Mantel–Haenszel pooled odds ratio + CMH test: does the exposure
  // arm shift the purchase rate AFTER controlling for day-of-week —
  // the stratified-confounding answer a raw 2×2 (stats_chi2's shape)
  // gets wrong whenever traffic mix differs by day. Cell counts are
  // exact int64; each stratum's a·d/n, b·c/n, E[a] and hypergeometric
  // variance term is ONE cast-first double expression snapped to 9 dp
  // before its DECIMAL sum (7-row frame, order can't leak), and the
  // verdict compares the 6-dp CMH χ² against the 1-df 5% point. ──
  def statsMantelHaenszel(spark: SparkSession, dir: String): DataFrame =
    strataTables(spark, dir)
      .select(
        expr("CAST(round(cast(a as double) * d / n, 9)" +
          " AS DECIMAL(28,9))").as("adn"),
        expr("CAST(round(cast(b as double) * c / n, 9)" +
          " AS DECIMAL(28,9))").as("bcn"),
        expr("CAST(round(cast(a + b as double) * (a + c) / n, 9)" +
          " AS DECIMAL(28,9))").as("ea"),
        expr("CAST(round(cast(a + b as double) * (c + d) * (a + c)" +
          " * (b + d) / (cast(n as double) * n * (n - 1)), 9)" +
          " AS DECIMAL(28,9))").as("va"),
        col("a"))
      .agg(count(lit(1)).as("k_strata"), sum(col("a")).as("sa"),
        sum(col("adn")).as("num"), sum(col("bcn")).as("den"),
        sum(col("ea")).as("sea"), sum(col("va")).as("sva"))
      .withColumn("chi2r", r6(expr(
        "(cast(sa as double) - cast(sea as double))" +
          " * (cast(sa as double) - cast(sea as double))" +
          " / cast(sva as double)")))
      .select(col("k_strata"), col("sa").as("exposed_successes"),
        r6(expr("cast(sea as double)")).as("expected"),
        r6(expr("cast(num as double) / cast(den as double)"))
          .as("or_mh"),
        col("chi2r").as("chi2_cmh"),
        (col("chi2r") > lit(3.841d)).as("significant"))

  // ── Woolf homogeneity test over the same strata: is the odds ratio
  // the SAME on every day-of-week — the check that must pass before
  // anyone quotes stats_mantel_haenszel's single pooled OR (effect
  // modification means no one number exists). Haldane +0.5 correction
  // keeps zero cells finite; per-stratum ln OR and inverse-variance
  // weight are cast-first double expressions snapped to 9 dp, the
  // pooled ln OR is a ratio of exact DECIMAL sums, and the χ² against
  // k−1 df compares at 6 dp. Two group-sized aggregations. ──
  def statsWoolf(spark: SparkSession, dir: String): DataFrame = {
    val per = strataTables(spark, dir)
      .select(col("dow"),
        expr("CAST(round(ln(((cast(a as double) + 0.5)" +
          " * (cast(d as double) + 0.5))" +
          " / ((cast(b as double) + 0.5)" +
          " * (cast(c as double) + 0.5))), 9) AS DECIMAL(18,9))")
          .as("lnor"),
        expr("CAST(round(1.0 / (1.0 / (cast(a as double) + 0.5)" +
          " + 1.0 / (cast(b as double) + 0.5)" +
          " + 1.0 / (cast(c as double) + 0.5)" +
          " + 1.0 / (cast(d as double) + 0.5)), 9) AS DECIMAL(18,9))")
          .as("w"))
    val pooled = per
      .select(col("w"),
        expr("CAST(round(cast(w as double) * cast(lnor as double), 9)" +
          " AS DECIMAL(28,9))").as("wl"))
      .agg(count(lit(1)).as("k_strata"), sum(col("w")).as("sw"),
        sum(col("wl")).as("swl"))
      .withColumn("pooled", expr(
        "cast(swl as double) / cast(sw as double)"))
    per.crossJoin(broadcast(pooled))
      .select(col("k_strata"), col("pooled"),
        expr("CAST(round(cast(w as double)" +
          " * (cast(lnor as double) - pooled)" +
          " * (cast(lnor as double) - pooled), 9) AS DECIMAL(28,9))")
          .as("x2t"))
      .groupBy(col("k_strata"), col("pooled"))
      .agg(sum(col("x2t")).as("x2s"))
      .withColumn("x2r", r6(expr("cast(x2s as double)")))
      .select(col("k_strata"),
        r6(col("pooled")).as("ln_or_pooled"),
        r6(exp(col("pooled"))).as("or_pooled"),
        col("x2r").as("x2_homogeneity"),
        (col("k_strata") - 1).as("df"),
        (col("x2r") <= lit(12.592d)).as("homogeneous"))
  }

  // ── random-walk-with-drift backtest per event type: one-step
  // forecasts v̂ₜ₊₁ = vₜ + (vₜ − v₁)/(t−1) with the drift estimated on
  // the EXPANDING window (no look-ahead — the honest form of the
  // M-competition drift baseline), scored against the next calendar
  // day. Rounds out the baseline ladder forecast_mase starts: naive,
  // seasonal-naive, now drift — a trended series should beat naive
  // here BEFORE anyone reaches for Holt. Daily totals are exact
  // decimals; the naive error stays exact decimal, the drift error is
  // one double expression snapped to 9 dp before its sum; rel_mae < 1
  // means the drift term earns its keep. ──
  def forecastDrift(spark: SparkSession, dir: String): DataFrame = {
    val daily = ev(spark, dir).groupBy(col("event_type"), col("day"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("v"))
    val wo = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val f = daily
      .withColumn("t", row_number().over(wo))
      .withColumn("v1", first(col("v")).over(
        wo.rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("t") >= 2)
      .select(col("event_type"), date_add(col("day"), 1).as("day"),
        expr("cast(v as double)" +
          " + (cast(v as double) - cast(v1 as double)) / (t - 1)")
          .as("f"),
        col("v").as("vprev"))
    daily.join(f, Seq("event_type", "day"))
      .select(col("event_type"),
        expr("CAST(round(abs(cast(v as double) - f), 9)" +
          " AS DECIMAL(28,9))").as("ed"),
        abs(col("v") - col("vprev")).as("en"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_eval"), sum(col("ed")).as("sd"),
        sum(col("en")).as("sn"))
      .select(col("event_type"), col("n_eval"),
        r6(expr("cast(sd as double) / n_eval")).as("mae_drift"),
        r6(expr("cast(sn as double) / n_eval")).as("mae_naive"),
        r6(expr("cast(sd as double) / cast(sn as double)"))
          .as("rel_mae"))
      .orderBy("event_type")
  }

  // ── Syntetos–Boylan approximation + demand classification per part:
  // Croston's z/p estimator is POSITIVELY biased; the published SBA
  // correction (1 − α/2)·z/p removes it, and the
  // Syntetos–Boylan–Kostenko quadrant — mean inter-demand interval
  // vs CV² of demand sizes against the 1.32 / 0.49 fences — says which
  // estimator each series should use at all (smooth / intermittent /
  // erratic / lumpy). Shares forecast_croston's occurrence-list fold
  // verbatim (same α, same init); the classification moments are exact
  // DECIMAL sums reduced per part, fences compare 6-dp-snapped values.
  // Group-sized state; top-50 by occurrence count, never a global
  // sort. ──
  def forecastSba(spark: SparkSession, dir: String): DataFrame = {
    val demD = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_partkey").as("part"),
        expr("datediff(to_date(o_orderdate), DATE'1970-01-01')")
          .cast("long").as("dayno"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("dd"))
    val dem = demD.withColumn("d", col("dd").cast("double"))
    val a = CrostonA
    val folded = dem.groupBy(col("part"))
      .agg(sort_array(collect_list(struct(col("dayno"), col("d"))))
        .as("s"))
      .filter(size(col("s")) >= 3)
      .withColumn("st", expr(
        s"""aggregate(
           |  slice(s, 3, size(s) - 2),
           |  named_struct(
           |    'z', ${a}D * s[1].d + (1.0D - ${a}D) * s[0].d,
           |    'p', CAST(s[1].dayno - s[0].dayno AS DOUBLE),
           |    'pt', s[1].dayno),
           |  (st, pp) -> named_struct(
           |    'z', ${a}D * pp.d + (1.0D - ${a}D) * st.z,
           |    'p', ${a}D * CAST(pp.dayno - st.pt AS DOUBLE)
           |           + (1.0D - ${a}D) * st.p,
           |    'pt', pp.dayno))""".stripMargin))
    val mom = demD.groupBy(col("part"))
      .agg(count(lit(1)).as("n"), sum(col("dd")).as("s1"),
        // re-narrow before squaring: a widened decimal sum squared would
        // pass width 38 (binder error in DuckDB, silent rescale in Spark)
        sum(col("dd").cast("decimal(18,2)") *
          col("dd").cast("decimal(18,2)")).as("s2"),
        min(col("dayno")).as("mn"), max(col("dayno")).as("mx"))
    folded.join(mom, "part")
      .withColumn("pbar6",
        r6(expr("cast(mx - mn as double) / (n - 1)")))
      .withColumn("cv26", r6(expr(
        "(cast(n as double) * cast(s2 as double)" +
          " - cast(s1 as double) * cast(s1 as double))" +
          " / (cast(n as double) * (n - 1))" +
          " / ((cast(s1 as double) / n) * (cast(s1 as double) / n))")))
      .select(col("part"), size(col("s")).cast("long").as("n_points"),
        r6(expr("st.z / st.p")).as("croston_rate"),
        r6(expr("0.95 * (st.z / st.p)")).as("sba_rate"),
        col("pbar6").as("mean_interval"), col("cv26").as("cv2_size"),
        when(col("pbar6") < 1.32 && col("cv26") < 0.49, "smooth")
          .when(col("pbar6") >= 1.32 && col("cv26") < 0.49, "intermittent")
          .when(col("pbar6") < 1.32, "erratic")
          .otherwise("lumpy").as("demand_class"))
      .orderBy(desc("n_points"), col("part"))
      .limit(50)
  }

  // ── normal Q-Q table for daily revenue: empirical deciles of the
  // standardized series against the STANDARD NORMAL deciles —
  // stats_jarque_bera gives one number; this shows WHERE normality
  // fails (tails vs shoulders), which decides between a log transform
  // and a robust method. Empirical deciles use the established
  // percentile ↔ quantile_cont pairing on the day-grid frame;
  // standardization comes from exact cent moments; the reference
  // quantiles are the published Φ⁻¹ decile constants (a fixed literal
  // ladder — no erf needed in either engine). ──
  private val NormalDeciles = Seq(
    1 -> -1.2815515655446004, 2 -> -0.8416212335729142,
    3 -> -0.5244005127080407, 4 -> -0.2533471031357997,
    5 -> 0.0, 6 -> 0.2533471031357997, 7 -> 0.5244005127080407,
    8 -> 0.8416212335729142, 9 -> 1.2815515655446004)

  def statsQqNormal(spark: SparkSession, dir: String): DataFrame = {
    val daily = ev(spark, dir).groupBy(col("day"))
      .agg((sum(col("value").cast("decimal(18,2)")) * 100).cast("long")
        .as("revc"))
    val moments = daily.agg(count(lit(1)).as("n"),
        sum(col("revc")).as("s"),
        sum(expr("CAST(revc AS DECIMAL(28,0)) * revc")).as("s2"))
      .withColumn("m", expr("cast(s as double) / n"))
      .withColumn("sd", expr(
        "sqrt(cast(n * s2 - CAST(s AS DECIMAL(28,0)) * s as double)" +
          " / (cast(n as double) * (n - 1)))"))
    val decCols = (1 to 9).map(d =>
      expr(s"percentile(revc, 0.$d)").as(s"q$d"))
    val decs = daily.agg(decCols.head, decCols.tail: _*)
    decs.crossJoin(broadcast(moments))
      .select(col("m"), col("sd"),
        explode(array(NormalDeciles.map { case (d, z) =>
          struct(lit(d).as("decile"), col(s"q$d").as("q"),
            lit(z).as("z_normal"))
        }: _*)).as("e"))
      .select(col("e.decile").as("decile"),
        r6(expr("(e.q - m) / sd")).as("z_empirical"),
        r6(col("e.z_normal")).as("z_normal"),
        r6(expr("(e.q - m) / sd - e.z_normal")).as("gap"))
      .orderBy("decile")
  }

  // ── Grubbs outlier statistic per event type: the most extreme
  // standardized daily revenue and WHICH day it was — anomaly_mad
  // flags rows robustly; Grubbs is the classical single-outlier test
  // a reviewer asks for on small daily panels. Moments are exact
  // int64/decimal cent sums; the deviation snaps to 6 dp BEFORE the
  // argmax (so the picked day is engine-identical even at a near-tie),
  // ties broken by earliest day via the (dev, −dayno) struct max.
  // Day-grid frames; one scan. ──
  def statsGrubbs(spark: SparkSession, dir: String): DataFrame = {
    val daily = ev(spark, dir).groupBy(col("event_type"), col("day"))
      .agg((sum(col("value").cast("decimal(18,2)")) * 100).cast("long")
        .as("revc"))
      .withColumn("dayno", expr("datediff(day, DATE'1970-01-01')"))
    val mom = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("revc")).as("s"),
        sum(expr("CAST(revc AS DECIMAL(28,0)) * revc")).as("s2"))
      .withColumn("m", expr("cast(s as double) / n"))
      .withColumn("sd", expr(
        "sqrt(cast(n * s2 - CAST(s AS DECIMAL(28,0)) * s as double)" +
          " / (cast(n as double) * (n - 1)))"))
    daily.join(broadcast(mom), Seq("event_type"))
      .withColumn("dev", expr(
        "round(abs(revc - m) / sd, 6)"))
      .groupBy(col("event_type"))
      .agg(first(col("n")).as("n_days"),
        max(struct(col("dev"), (-col("dayno")).as("nd"))).as("mx"))
      .select(col("event_type"), col("n_days"),
        r6(col("mx.dev")).as("g_stat"),
        expr("date_add(DATE'1970-01-01', cast(-mx.nd as int))")
          .as("outlier_day"))
      .orderBy("event_type")
  }

  // ── Mann–Kendall trend test per event type: S = Σ_{i<j} sign(xⱼ−xᵢ)
  // over the daily-revenue series, tie-corrected variance, and Kendall's
  // tau-a — THE classical "is there a monotone trend" test that
  // complements stats_theilsen's slope ESTIMATE and stats_page_trend's
  // ordered-alternative test. Pairwise self-join runs on the GROUP-SIZED
  // daily frame (≤|days|² per type, the theilsen shape — never the fact
  // table); S and the tie term are pure int64 (exact cents comparisons),
  // divided once in double for z and tau. ──
  def statsMannKendall(spark: SparkSession, dir: String): DataFrame = {
    val daily = ev(spark, dir).groupBy(col("event_type"), col("day"))
      .agg((sum(col("value").cast("decimal(18,2)")) * 100).cast("long")
        .as("revc"))
      .withColumn("dayno", expr("datediff(day, DATE'1970-01-01')"))
      .cache()
    val a = daily.alias("a")
    val b = daily.alias("b")
    val s = a.join(b, col("a.event_type") === col("b.event_type") &&
        col("b.dayno") > col("a.dayno"))
      .groupBy(col("a.event_type").as("event_type"))
      .agg(sum(signum(col("b.revc") - col("a.revc")).cast("long"))
        .as("s_stat"))
    val ties = daily.groupBy(col("event_type"), col("revc"))
      .agg(count(lit(1)).as("t"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_distinct"), sum(col("t")).as("n_days"),
        sum(col("t") * (col("t") - 1) * (col("t") * 2 + 5)).as("tie_term"))
    val out = s.join(ties, "event_type")
      .withColumn("var_s", expr(
        "cast(n_days * (n_days - 1) * (2 * n_days + 5) - tie_term" +
          " as double) / 18"))
      .select(col("event_type"), col("n_days"), col("s_stat"),
        r6(col("var_s")).as("var_s"),
        r6(expr("cast(2 * s_stat as double) / (n_days * (n_days - 1))"))
          .as("tau_a"),
        r6(expr("CASE WHEN s_stat > 0" +
          " THEN cast(s_stat - 1 as double) / sqrt(var_s)" +
          " WHEN s_stat < 0" +
          " THEN cast(s_stat + 1 as double) / sqrt(var_s)" +
          " ELSE 0.0D END")).as("z"))
      .orderBy("event_type")
    daily.unpersist()
    out
  }

  // ── Pettitt changepoint test per event type: the rank-based
  // single-changepoint detector (stats_changepoint's CUSUM cousin,
  // robust to outliers because only SIGNS enter). U_t accumulates
  // V_t = Σ_{j≠t} sign(xⱼ−x_t) — the O(n²) pair pass collapses to one
  // group-sized self-join plus ONE cumulative window, instead of
  // materializing U for every split point separately. K = max|U_t| is
  // exact int64; the earliest argmax day comes from the (|U|, −dayno)
  // struct-max (the stats_grubbs tie discipline); the approximate
  // significance 2·exp(−6K²/(n³+n²)) is one closed-form double. ──
  def statsPettitt(spark: SparkSession, dir: String): DataFrame = {
    val daily = ev(spark, dir).groupBy(col("event_type"), col("day"))
      .agg((sum(col("value").cast("decimal(18,2)")) * 100).cast("long")
        .as("revc"))
      .withColumn("dayno", expr("datediff(day, DATE'1970-01-01')"))
      .cache()
    val a = daily.alias("a")
    val b = daily.alias("b")
    val v = a.join(b, col("a.event_type") === col("b.event_type") &&
        col("b.dayno") =!= col("a.dayno"))
      .groupBy(col("a.event_type").as("event_type"),
        col("a.dayno").as("dayno"))
      .agg(sum(signum(col("b.revc") - col("a.revc")).cast("long")).as("vt"))
    val byDay = Window.partitionBy(col("event_type")).orderBy(col("dayno"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val u = v.withColumn("ut", sum(col("vt")).over(byDay))
    val n = daily.groupBy(col("event_type")).agg(count(lit(1)).as("n_days"))
    val out = u.groupBy(col("event_type"))
      .agg(max(struct(abs(col("ut")).as("k"), (-col("dayno")).as("nd")))
        .as("mx"))
      .join(n, "event_type")
      .select(col("event_type"), col("n_days"),
        col("mx.k").as("k_stat"),
        expr("date_add(DATE'1970-01-01', cast(-mx.nd as int))")
          .as("cp_day"),
        r6(expr("least(2 * exp(cast(-6 * mx.k * mx.k as double)" +
          " / (cast(n_days as double) * n_days * n_days" +
          " + cast(n_days as double) * n_days)), 1.0D)")).as("p_approx"))
      .orderBy("event_type")
    daily.unpersist()
    out
  }

  /** User-spend-in-cents frame shared by the entropy-inequality keys:
    * positive totals only (log/reciprocal domains), exact int64. */
  private def userSpendPos(spark: SparkSession, dir: String): DataFrame =
    ev(spark, dir).groupBy(col("user_id"))
      .agg((sum(col("value").cast("decimal(18,2)")) * 100).cast("long")
        .as("xc"))
      .filter(col("xc") > 0)

  // ── Theil T and L inequality indices of user spend — the
  // entropy-based decomposable cousins of dist_lorenz/stats_gini
  // (Theil is additive across subgroups, which Gini is not — the index
  // a fairness report aggregates per region then rolls up). Per-user
  // log terms are snapped to 9 dp and summed in DECIMAL — associative,
  // so the |users|-sized reduce is partitioning-invariant — with the
  // scalar mean broadcast (one scan + one model-sized agg). ──
  def distTheil(spark: SparkSession, dir: String): DataFrame = {
    val spend = userSpendPos(spark, dir)
    val tot = spend.agg(count(lit(1)).as("n"), sum(col("xc")).as("s"))
      .withColumn("mu", expr("cast(s as double) / n"))
    spend.crossJoin(broadcast(tot))
      .select(col("n"), col("mu"),
        expr("CAST(round(xc / mu * ln(xc / mu), 9)" +
          " AS DECIMAL(18,9))").as("tt"),
        expr("CAST(round(ln(mu / xc), 9) AS DECIMAL(18,9))").as("tl"))
      .groupBy(col("n"), col("mu"))
      .agg(sum(col("tt")).as("st"), sum(col("tl")).as("sl"))
      .select(col("n").as("n_users"), r6(col("mu")).as("mean_cents"),
        r6(expr("cast(st as double) / n")).as("theil_t"),
        r6(expr("cast(sl as double) / n")).as("theil_l"))
  }

  // ── Atkinson inequality indices at ε ∈ {0.5, 1, 2} — the
  // welfare-weighted family: ε dials how much the bottom of the
  // distribution matters (ε→0 ~ mean-preserving, ε=2 ~ harmonic-mean
  // driven). ε=1 uses the geometric mean, ε=2 the reciprocal mean in
  // the O(1)-magnitude μ/x form (1/x in raw cents would underflow the
  // 9-dp snap). Same associative decimal-term discipline and broadcast
  // scalar mean as [[distTheil]]; one scan. ──
  def distAtkinson(spark: SparkSession, dir: String): DataFrame = {
    val spend = userSpendPos(spark, dir)
    val tot = spend.agg(count(lit(1)).as("n"), sum(col("xc")).as("s"))
      .withColumn("mu", expr("cast(s as double) / n"))
    spend.crossJoin(broadcast(tot))
      .select(col("n"), col("mu"),
        expr("CAST(round(sqrt(xc / mu), 9) AS DECIMAL(18,9))").as("th"),
        expr("CAST(round(ln(cast(xc as double)), 9)" +
          " AS DECIMAL(18,9))").as("tg"),
        expr("CAST(round(mu / xc, 9) AS DECIMAL(18,9))").as("tr"))
      .groupBy(col("n"), col("mu"))
      .agg(sum(col("th")).as("sh"), sum(col("tg")).as("sg"),
        sum(col("tr")).as("sr"))
      .select(col("n").as("n_users"), r6(col("mu")).as("mean_cents"),
        r6(expr("1 - cast(sh as double) / n * (cast(sh as double) / n)"))
          .as("a_eps_half"),
        r6(expr("1 - exp(cast(sg as double) / n) / mu")).as("a_eps_1"),
        r6(expr("1 - cast(n as double) / cast(sr as double)"))
          .as("a_eps_2"))
  }

  // ── Bartlett's test for homogeneity of variance across event types —
  // the parametric companion to stats_levene (Bartlett is the likelihood
  // -ratio test under normality; Levene is its robust cousin — a report
  // quotes both). Per-group moments are DECIMAL-exact one-scan sums (the
  // stats_anova frame); the k-row reduction snaps each log/reciprocal
  // term to fixed-dp DECIMAL before summing, so the tiny cross-group sum
  // is associative too. χ²-distributed with k−1 df under H₀. ──
  def statsBartlett(spark: SparkSession, dir: String): DataFrame = {
    val g = ev(spark, dir).groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("s1"),
        sum(col("value").cast("decimal(18,2)") *
          col("value").cast("decimal(18,2)")).cast("double").as("s2"))
      .withColumn("vi",
        (col("n") * col("s2") - col("s1") * col("s1")) /
          (col("n").cast("double") * (col("n") - 1)))
    g.agg(count(lit(1)).as("k"), sum(col("n")).as("nn"),
        sum(expr("CAST(round((n - 1) * vi, 6) AS DECIMAL(18,6))"))
          .as("sp_num"),
        sum(expr("CAST(round((n - 1) * ln(vi), 9) AS DECIMAL(18,9))"))
          .as("t_lnv"),
        sum(expr("CAST(round(1.0D / (n - 1), 12) AS DECIMAL(18,12))"))
          .as("c_sum"))
      .withColumn("sp2", expr("cast(sp_num as double) / (nn - k)"))
      .select(col("k"), col("nn").as("n"), r6(col("sp2")).as("pooled_var"),
        r6(expr("(nn - k) * ln(sp2) - cast(t_lnv as double)")).as("t_stat"),
        r6(expr("1 + (cast(c_sum as double) - 1.0D / (nn - k))" +
          " / (3 * (k - 1))")).as("c_factor"),
        r6(expr("((nn - k) * ln(sp2) - cast(t_lnv as double))" +
          " / (1 + (cast(c_sum as double) - 1.0D / (nn - k))" +
          " / (3 * (k - 1)))")).as("stat"))
  }

  // ── 1-D Wasserstein (earth-mover) distance between the same two
  // value distributions stats_ks and stats_mannwhitney compare — the
  // drift metric that weighs HOW FAR mass moved, not just whether the
  // CDFs separate (KS) or shifted (U). W₁ = Σ|F₁−F₂|·Δv over the
  // GROUPED value grid: one cumulative window on ≤|distinct values|
  // rows, each trapezoid term snapped to 9 dp DECIMAL so the grid-sized
  // sum is associative. ──
  def statsWasserstein(spark: SparkSession, dir: String): DataFrame = {
    val g = ev(spark, dir)
      .filter(col("event_type").isin(KsTypeA, KsTypeB))
      .groupBy(col("value"))
      .agg(sum(when(col("event_type") === KsTypeA, 1L).otherwise(0L)).as("a"),
        sum(when(col("event_type") === KsTypeB, 1L).otherwise(0L)).as("b"))
    val byVal = Window.orderBy(col("value"))
    val cum = g
      .withColumn("ca", sum(col("a")).over(
        byVal.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("cb", sum(col("b")).over(
        byVal.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("nextv", lead(col("value"), 1).over(byVal))
    val tot = g.agg(sum(col("a")).as("n1"), sum(col("b")).as("n2"))
    cum.crossJoin(broadcast(tot))
      .filter(col("nextv").isNotNull)
      .select(col("n1"), col("n2"),
        expr("CAST(round(abs(cast(ca as double) / n1" +
          " - cast(cb as double) / n2) * (nextv - value), 9)" +
          " AS DECIMAL(18,9))").as("term"))
      .groupBy(col("n1"), col("n2"))
      .agg(sum(col("term")).as("w1"))
      .select(col("n1"), col("n2"),
        r6(expr("cast(w1 as double)")).as("w1_dist"))
  }

  // ── Average True Range (14-day) per event type: the volatility
  // gauge the Bollinger/RSI/MACD family is missing — TR folds intraday
  // range AND overnight gap (|high−prev_close| / |low−prev_close|)
  // into one number. The daily OHLC-ish bar is built in exact cents
  // (high/low = max/min of value; close = last event of the day by the
  // unique (us, event_id) order, via struct-max — no argmax ambiguity);
  // TR is a greatest() of INTEGER differences, so every input to the
  // 14-row mean is engine-identical. Entity-partitioned windows; only
  // full frames emit. ──
  def windowAtr(spark: SparkSession, dir: String): DataFrame = {
    val bars = ev(spark, dir)
      .withColumn("vc",
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"))
      .groupBy(col("event_type"), col("day"))
      .agg(max(col("vc")).as("h"), min(col("vc")).as("l"),
        max(struct(col("us"), col("event_id"), col("vc")))
          .getField("vc").as("c"))
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val withTr = bars
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("pc", lag(col("c"), 1).over(wOrd))
      .withColumn("tr", greatest(col("h") - col("l"),
        abs(col("h") - col("pc")), abs(col("l") - col("pc"))))
    withTr
      .withColumn("atr_c",
        sum(col("tr")).over(wOrd.rowsBetween(-13, 0)))
      .filter(col("rn") >= 15)
      .select(col("event_type"), col("day"),
        r6(expr("cast(h as double) / 100")).as("high"),
        r6(expr("cast(l as double) / 100")).as("low"),
        r6(expr("cast(c as double) / 100")).as("close"),
        r6(expr("cast(tr as double) / 100")).as("true_range"),
        r6(expr("cast(atr_c as double) / 1400")).as("atr14"))
      .orderBy("event_type", "day")
  }

  // ── Williams %R (14-day) per event type: where today's close sits in
  // the trailing high–low channel, on the window_atr OHLC-ish bar —
  // the fast stochastic's raw positioning line (−100 = at the channel
  // low, 0 = at the high). Channel edges are integer window max/min of
  // exact cents; the single −100·(HH−c)/(HH−LL) map is one double
  // division, and the +0.0 normalization covers the c = HH bin (a bare
  // −100·0 would be −0.0). Entity-partitioned, full frames only; flat
  // channels (HH = LL) are skipped on the INTEGER compare, so both
  // engines drop identical rows. ──
  def windowWilliamsR(spark: SparkSession, dir: String): DataFrame = {
    val bars = ev(spark, dir)
      .withColumn("vc",
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"))
      .groupBy(col("event_type"), col("day"))
      .agg(max(col("vc")).as("h"), min(col("vc")).as("l"),
        max(struct(col("us"), col("event_id"), col("vc")))
          .getField("vc").as("c"))
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val w14 = wOrd.rowsBetween(-13, 0)
    bars
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("hh", max(col("h")).over(w14))
      .withColumn("ll", min(col("l")).over(w14))
      .filter(col("rn") >= 14 && col("hh") > col("ll"))
      .select(col("event_type"), col("day"),
        r6(expr("cast(c as double) / 100")).as("close"),
        r6(expr("cast(hh as double) / 100")).as("hh14"),
        r6(expr("cast(ll as double) / 100")).as("ll14"),
        r6(expr("-100.0 * cast(hh - c as double)" +
          " / cast(hh - ll as double)")).as("williams_r"))
      .orderBy("event_type", "day")
  }

  // ── Money Flow Index (14-day) per event type: volume-weighted RSI —
  // each bar's 3×typical-price (h+l+c, exact cents) times its trade
  // count flows into the positive or negative pool by the INTEGER
  // tpc-vs-prev compare, and MFI = 100·pos/(pos+neg) over 14 bars.
  // window_rsi weighs price change alone; MFI says whether the moves
  // carried participation. Pools are int64 sums of integer products
  // (tpc·vol ≲ 3·10⁵·day-volume — drop the cents scale one decade if a
  // single key's daily volume approaches 3·10¹³); ONE double division
  // at the boundary. Unchanged-tpc bars feed neither pool (the
  // classical convention), and both engines decide that on integers. ──
  def windowMfi(spark: SparkSession, dir: String): DataFrame = {
    val bars = ev(spark, dir)
      .withColumn("vc",
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"))
      .groupBy(col("event_type"), col("day"))
      .agg(max(col("vc")).as("h"), min(col("vc")).as("l"),
        max(struct(col("us"), col("event_id"), col("vc")))
          .getField("vc").as("c"),
        count(lit(1)).as("vol"))
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val w14 = wOrd.rowsBetween(-13, 0)
    bars
      .withColumn("tpc", col("h") + col("l") + col("c"))
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("ptpc", lag(col("tpc"), 1).over(wOrd))
      .withColumn("pos",
        when(col("tpc") > col("ptpc"), col("tpc") * col("vol"))
          .otherwise(0L))
      .withColumn("neg",
        when(col("tpc") < col("ptpc"), col("tpc") * col("vol"))
          .otherwise(0L))
      .withColumn("p14", sum(col("pos")).over(w14))
      .withColumn("n14", sum(col("neg")).over(w14))
      .filter(col("rn") >= 15 && (col("p14") + col("n14")) > 0)
      .select(col("event_type"), col("day"), col("vol"),
        r6(expr("cast(tpc as double) / 300")).as("typical_price"),
        r6(expr("100.0 * cast(p14 as double)" +
          " / cast(p14 + n14 as double)")).as("mfi14"),
        (expr("100.0 * cast(p14 as double)" +
          " / cast(p14 + n14 as double)") > lit(80.0d)).as("overbought"),
        (expr("100.0 * cast(p14 as double)" +
          " / cast(p14 + n14 as double)") < lit(20.0d)).as("oversold"))
      .orderBy("event_type", "day")
  }

  // ── Ichimoku baseline pair per event type: tenkan (9-bar) and kijun
  // (26-bar) channel MIDPOINTS — (HH+LL)/2, a different statistic from
  // the EMAs/means every other overlay here uses (midpoints ignore
  // in-channel distribution entirely, so they hold level through
  // one-sided noise). Channel edges are integer window max/min of exact
  // cents; the midpoints are single /200 maps; the cross signal
  // (tenkan vs kijun) compares 6-dp-snapped values. Entity-partitioned
  // windows, full 26-bar frames only. ──
  def windowIchimoku(spark: SparkSession, dir: String): DataFrame = {
    val bars = ev(spark, dir)
      .withColumn("vc",
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"))
      .groupBy(col("event_type"), col("day"))
      .agg(max(col("vc")).as("h"), min(col("vc")).as("l"),
        max(struct(col("us"), col("event_id"), col("vc")))
          .getField("vc").as("c"))
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val w9 = wOrd.rowsBetween(-8, 0)
    val w26 = wOrd.rowsBetween(-25, 0)
    bars
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("th", max(col("h")).over(w9))
      .withColumn("tl", min(col("l")).over(w9))
      .withColumn("kh", max(col("h")).over(w26))
      .withColumn("kl", min(col("l")).over(w26))
      .filter(col("rn") >= 26)
      .withColumn("t6", r6(expr("cast(th + tl as double) / 200")))
      .withColumn("k6", r6(expr("cast(kh + kl as double) / 200")))
      .select(col("event_type"), col("day"),
        r6(expr("cast(c as double) / 100")).as("close"),
        col("t6").as("tenkan9"), col("k6").as("kijun26"),
        r6(expr("(cast(th + tl as double) / 200" +
          " + cast(kh + kl as double) / 200) / 2")).as("senkou_a"),
        (col("t6") > col("k6")).as("bullish_cross"))
      .orderBy("event_type", "day")
  }

  // ── chandelier exit per event type: trailing stop at
  // HH(22) − 3·ATR(22) — the volatility-scaled exit line that ratchets
  // under a long position (window_atr prices the volatility; this
  // turns it into the risk rule). Highest-high and the 22-bar true-
  // range sum are integer window aggregates; the stop is one double
  // map, and the exit flag compares the integer close against the
  // 6-dp-snapped stop. Entity-partitioned, full frames only. ──
  def windowChandelierExit(spark: SparkSession, dir: String): DataFrame = {
    val bars = ev(spark, dir)
      .withColumn("vc",
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"))
      .groupBy(col("event_type"), col("day"))
      .agg(max(col("vc")).as("h"), min(col("vc")).as("l"),
        max(struct(col("us"), col("event_id"), col("vc")))
          .getField("vc").as("c"))
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val w22 = wOrd.rowsBetween(-21, 0)
    bars
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("pc", lag(col("c"), 1).over(wOrd))
      .withColumn("tr", greatest(col("h") - col("l"),
        abs(col("h") - col("pc")), abs(col("l") - col("pc"))))
      .withColumn("hh", max(col("h")).over(w22))
      .withColumn("atr_c", sum(col("tr")).over(w22))
      .filter(col("rn") >= 23)
      .withColumn("stop6", r6(expr(
        "cast(hh as double) / 100" +
          " - 3.0 * (cast(atr_c as double) / 2200)")))
      .select(col("event_type"), col("day"),
        r6(expr("cast(c as double) / 100")).as("close"),
        r6(expr("cast(hh as double) / 100")).as("hh22"),
        r6(expr("cast(atr_c as double) / 2200")).as("atr22"),
        col("stop6").as("chandelier_stop"),
        (expr("cast(c as double) / 100") < col("stop6")).as("exit_long"))
      .orderBy("event_type", "day")
  }

  // ── Aroon oscillator (14-period) on the per-type daily revenue: how
  // recently the trailing-14 high/low printed — a trend-freshness
  // signal orthogonal to level-based bands (window_bollinger) and
  // momentum (window_rsi). The in-window argmax/argmin use struct
  // max/min on (revenue, row-index) — exact integers, latest-bar ties
  // by lexicographic order in BOTH engines — so periods-since is pure
  // row arithmetic; the only doubles are the two final 100·(14−ps)/14
  // maps. Entity-partitioned, full frames only. ──
  def windowAroon(spark: SparkSession, dir: String): DataFrame = {
    val daily = ev(spark, dir).groupBy(col("event_type"), col("day"))
      .agg((sum(col("value").cast("decimal(18,2)")) * 100).cast("long")
        .as("revc"))
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val w14 = wOrd.rowsBetween(-13, 0)
    daily
      .withColumn("rn", row_number().over(wOrd).cast("long"))
      .withColumn("hi",
        max(struct(col("revc"), col("rn"))).over(w14))
      .withColumn("lo",
        // (revc, −rn): min picks the smallest revenue, ties resolved to
        // the LATEST bar (most negative −rn) — same freshest-bar
        // convention as the struct-max on the high side
        min(struct(col("revc"), (-col("rn")).as("nrn"))).over(w14))
      .filter(col("rn") >= 14)
      .select(col("event_type"), col("day"), col("revc"),
        (col("rn") - col("hi.rn")).as("ps_high"),
        (col("rn") + col("lo.nrn")).as("ps_low"),
        r6(expr("100 * cast(14 - (rn - hi.rn) as double) / 14"))
          .as("aroon_up"),
        r6(expr("100 * cast(14 - (rn + lo.nrn) as double) / 14"))
          .as("aroon_down"),
        r6(expr("100 * (cast(14 - (rn - hi.rn) as double) / 14" +
          " - cast(14 - (rn + lo.nrn) as double) / 14)"))
          .as("aroon_osc"))
      .orderBy("event_type", "day")
  }

  // ── Cliff's delta between the click/purchase value distributions —
  // the ordinal effect SIZE that says how big the stats_mannwhitney
  // shift actually is (δ = P(x>y) − P(x<y); U tells you it's
  // significant, δ tells you whether anyone should care). Dominance
  // counts come from ONE cumulative pass over the grouped value grid
  // (#(x>y) = Σ aᵥ·cum_b_before — the U-statistic identity), all
  // int64-exact; the single division and the standard
  // 0.147/0.33/0.474 magnitude fences branch on the 6-dp value. ──
  def statsCliffDelta(spark: SparkSession, dir: String): DataFrame = {
    val g = ev(spark, dir)
      .filter(col("event_type").isin(KsTypeA, KsTypeB))
      .groupBy(col("value"))
      .agg(sum(when(col("event_type") === KsTypeA, 1L).otherwise(0L)).as("a"),
        sum(when(col("event_type") === KsTypeB, 1L).otherwise(0L)).as("b"))
    val byVal = Window.orderBy(col("value"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = g.withColumn("cb_before",
        coalesce(sum(col("b")).over(byVal), lit(0L)))
      .withColumn("cb_thru",
        coalesce(sum(col("b")).over(byVal), lit(0L)) + col("b"))
    val tot = g.agg(sum(col("a")).as("n1"), sum(col("b")).as("n2"))
    cum.crossJoin(broadcast(tot))
      .groupBy(col("n1"), col("n2"))
      .agg(sum(col("a") * col("cb_before")).as("n_gt"),
        sum(col("a") * (col("n2") - col("cb_thru"))).as("n_lt"))
      .withColumn("delta6", r6(expr(
        "cast(n_gt - n_lt as double) / (n1 * n2)")))
      .select(col("n1"), col("n2"), col("n_gt"), col("n_lt"),
        col("delta6").as("delta"),
        when(abs(col("delta6")) < 0.147, "negligible")
          .when(abs(col("delta6")) < 0.33, "small")
          .when(abs(col("delta6")) < 0.474, "medium")
          .otherwise("large").as("magnitude"))
  }

  // ── Mood's median test across ALL event types: are the k per-type
  // value distributions centered on the same median — the quick-and-
  // robust k-group location screen (stats_kruskal ranks everything;
  // this only asks above/below the GRAND median, so it survives wild
  // tails and censoring). The grand median is the explicit middle pair
  // read off the grouped value grid's cumulative counts (no global
  // row sort — grid-sized window only); the 2×k χ² is then pure
  // integer-count arithmetic with one double division per cell. ──
  def statsMoodMedian(spark: SparkSession, dir: String): DataFrame = {
    val e = ev(spark, dir).select(col("event_type"), col("value"))
    val g = e.groupBy(col("value")).agg(count(lit(1)).as("t"))
    val cum = g.withColumn("cum", sum(col("t")).over(
      Window.orderBy(col("value"))
        .rowsBetween(Window.unboundedPreceding, 0)))
    val tot = g.agg(sum(col("t")).as("nn"))
    val med = cum.crossJoin(broadcast(tot))
      .select(col("value"), col("cum"), col("nn"),
        expr("(nn + 1) div 2").as("p1"), expr("(nn + 2) div 2").as("p2"))
      .agg(min(when(col("cum") >= col("p1"), col("value"))).as("v1"),
        min(when(col("cum") >= col("p2"), col("value"))).as("v2"))
      .select(((col("v1") + col("v2")) / 2).as("med"))
    val counts = e.crossJoin(broadcast(med))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum((col("value") > col("med")).cast("long")).as("above"))
    val ct = counts.agg(count(lit(1)).as("k"), sum(col("n")).as("nn"),
      sum(col("above")).as("ta"))
    counts.crossJoin(broadcast(ct))
      .select(col("k"), col("nn"), col("ta"), col("n"), col("above"),
        expr("cast(n * ta as double) / nn").as("e_above"),
        expr("cast(n * (nn - ta) as double) / nn").as("e_below"))
      .groupBy(col("k"), col("nn"), col("ta"))
      .agg(sum(expr("CAST(round((above - e_above) * (above - e_above)" +
          " / e_above + ((n - above) - e_below)" +
          " * ((n - above) - e_below) / e_below, 9)" +
          " AS DECIMAL(18,9))")).as("chi2d"))
      .crossJoin(broadcast(med))
      .select(col("k"), col("nn").as("n"), r6(col("med")).as("grand_median"),
        col("ta").as("n_above"),
        r6(expr("cast(chi2d as double)")).as("chi2"),
        (col("k") - 1).as("df"))
  }

  // ── on-balance volume per event type: running Σ of ±(daily event
  // count) signed by whether the daily close (last value of the day by
  // the unique (us, event_id) order, same bar as window_atr) rose or
  // fell — the flow-confirms-price indicator: OBV diverging from the
  // revenue level flags moves without participation. Sign and volume
  // are exact integers, so the running sum is int64 end to end; one
  // keyed aggregation + one entity-partitioned window. ──
  def windowObv(spark: SparkSession, dir: String): DataFrame = {
    val bars = ev(spark, dir)
      .withColumn("vc",
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("vol"),
        max(struct(col("us"), col("event_id"), col("vc")))
          .getField("vc").as("c"))
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("day"))
    bars
      .withColumn("pc", lag(col("c"), 1).over(wOrd))
      .withColumn("flow",
        when(col("pc").isNull, 0L)
          .when(col("c") > col("pc"), col("vol"))
          .when(col("c") < col("pc"), -col("vol"))
          .otherwise(0L))
      .withColumn("obv", sum(col("flow")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("event_type"), col("day"), col("vol"),
        r6(expr("cast(c as double) / 100")).as("close"),
        col("flow"), col("obv"))
      .orderBy("event_type", "day")
  }

  // ── cumulative VWAP per event type: running Σ(value·1)/Σ(1) where
  // each event is one "trade" — the benchmark price an execution desk
  // compares fills against, and the drift-free denominator for the
  // daily close (window_macd smooths price; VWAP anchors it to
  // participation). Numerator stays exact int64 cents cumulatively;
  // ONE division per emitted row. Also emits the day's own VWAP.
  // Grouped to daily first — the 100 TB fact table never enters a
  // window. ──
  def windowVwap(spark: SparkSession, dir: String): DataFrame = {
    val daily = ev(spark, dir)
      .withColumn("vc",
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("vol"), sum(col("vc")).as("pv"))
    val cumW = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, 0)
    daily
      .withColumn("cum_pv", sum(col("pv")).over(cumW))
      .withColumn("cum_vol", sum(col("vol")).over(cumW))
      .select(col("event_type"), col("day"), col("vol"),
        r6(expr("cast(pv as double) / (100 * vol)")).as("day_vwap"),
        r6(expr("cast(cum_pv as double) / (100 * cum_vol)"))
          .as("cum_vwap"))
      .orderBy("event_type", "day")
  }

  // ── Welch's heteroscedastic one-way ANOVA across event types — the
  // F-test to reach for when stats_bartlett REJECTS equal variances
  // (classic ANOVA's pooled denominator is then wrong; Welch weights
  // each group by n/s²). Group moments are the DECIMAL-exact
  // stats_anova frame; the k-row weight reduction snaps each term to
  // fixed-dp DECIMAL (associative), with the weight-sum broadcast back
  // for the second pass. Welch–Satterthwaite df₂ comes from the same
  // Σ(1−wᵢ/W)²/(nᵢ−1) term as the denominator. ──
  def statsWelchAnova(spark: SparkSession, dir: String): DataFrame = {
    val g = ev(spark, dir).groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("s1"),
        sum(col("value").cast("decimal(18,2)") *
          col("value").cast("decimal(18,2)")).cast("double").as("s2"))
      .withColumn("xb", expr("s1 / n"))
      .withColumn("vi", expr(
        "(n * s2 - s1 * s1) / (cast(n as double) * (n - 1))"))
      // the 9-dp snap makes wi identical in both engines BEFORE any
      // cross-group arithmetic reuses it
      .withColumn("wi", expr("cast(CAST(round(n / vi, 9)" +
        " AS DECIMAL(18,9)) as double)"))
    val tot = g.agg(count(lit(1)).as("k"),
      sum(expr("CAST(round(wi, 9) AS DECIMAL(18,9))")).as("wsum"),
      sum(expr("CAST(round(wi * xb, 6) AS DECIMAL(28,6))")).as("wxsum"))
      .withColumn("mw", expr("cast(wxsum as double) / cast(wsum as double)"))
    g.crossJoin(broadcast(tot))
      .groupBy(col("k"), col("wsum"), col("mw"))
      .agg(sum(expr("CAST(round(wi * (xb - mw) * (xb - mw), 6)" +
          " AS DECIMAL(28,6))")).as("a_num"),
        sum(expr("CAST(round((1 - wi / cast(wsum as double))" +
          " * (1 - wi / cast(wsum as double))" +
          " / (n - 1), 12) AS DECIMAL(18,12))")).as("lam"))
      .select(col("k"), r6(col("mw")).as("weighted_mean"),
        r6(expr("(cast(a_num as double) / (k - 1))" +
          " / (1 + 2 * cast(k - 2 as double) / (cast(k as double) * k - 1)" +
          " * cast(lam as double))")).as("f_stat"),
        (col("k") - 1).as("df1"),
        r6(expr("(cast(k as double) * k - 1)" +
          " / (3 * cast(lam as double))")).as("df2"))
  }

  // ── Ansari–Bradley two-sample SCALE test between the click/purchase
  // value distributions — do the two distributions differ in SPREAD
  // around a common median (mannwhitney asks about location; KS about
  // shape; this isolates dispersion). Symmetric scores min(r, N+1−r)
  // with midrank ties are computed PER TIE GROUP in closed form on the
  // grouped value grid: the score-sum over ranks (lo..hi] is two
  // arithmetic series clamped at the fold point — exact int64 — and
  // the tie group's members each take S/t. T = Σ_A scores; the z uses
  // the finite-population linear-rank moments E[T] = n₁·s̄ and
  // Var[T] = n₁n₂/(N(N−1))·Σ(sᵢ−s̄)², with Σsᵢ² = Σ S²/t per group.
  // One cumulative pass, grid-sized. ──
  def statsAnsariBradley(spark: SparkSession, dir: String): DataFrame = {
    val g = ev(spark, dir)
      .filter(col("event_type").isin(KsTypeA, KsTypeB))
      .groupBy(col("value"))
      .agg(sum(when(col("event_type") === KsTypeA, 1L).otherwise(0L)).as("a"),
        sum(when(col("event_type") === KsTypeB, 1L).otherwise(0L)).as("b"))
      .withColumn("t", col("a") + col("b"))
    val byVal = Window.orderBy(col("value"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val tot = g.agg(sum(col("a")).as("n1"), sum(col("b")).as("n2"),
      (sum(col("a")) + sum(col("b"))).as("nn"))
    val ranked = g.withColumn("lo",
        coalesce(sum(col("t")).over(byVal), lit(0L)) + 1)
      .withColumn("hi",
        coalesce(sum(col("t")).over(byVal), lit(0L)) + col("t"))
      .crossJoin(broadcast(tot))
      // Σ_{r=lo..hi} min(r, N+1−r): ascending arm r ≤ (N+1) div 2 plus
      // descending arm N+1−r beyond it, each a clamped integer series
      .withColumn("m", expr("(nn + 1) div 2"))
      .withColumn("ua", least(col("hi"), col("m")))
      .withColumn("sasc", expr(
        "CASE WHEN ua >= lo THEN (lo + ua) * (ua - lo + 1) div 2" +
          " ELSE 0 END"))
      .withColumn("lb", greatest(col("lo"), col("m") + 1))
      .withColumn("sdesc", expr(
        "CASE WHEN hi >= lb THEN (nn + 1) * (hi - lb + 1)" +
          " - (lb + hi) * (hi - lb + 1) div 2 ELSE 0 END"))
      .withColumn("s", col("sasc") + col("sdesc"))
    ranked
      .groupBy(col("n1"), col("n2"), col("nn"))
      .agg(sum(expr("CAST(round(a * (cast(s as double) / t), 9)" +
          " AS DECIMAL(28,9))")).as("t_a"),
        sum(col("s")).as("s_all"),
        sum(expr("CAST(round(cast(s as double) * s / t, 9)" +
          " AS DECIMAL(28,9))")).as("s2_all"))
      .withColumn("sbar", expr("cast(s_all as double) / nn"))
      .withColumn("varsum", expr(
        "cast(s2_all as double) - nn * sbar * sbar"))
      .select(col("n1"), col("n2"),
        r6(expr("cast(t_a as double)")).as("ab_stat"),
        r6(expr("n1 * sbar")).as("expected"),
        r6(expr("(cast(t_a as double) - n1 * sbar)" +
          " / sqrt(cast(n1 as double) * n2 / (cast(nn as double)" +
          " * (nn - 1)) * varsum)")).as("z"))
  }

  /** [[forecastTheta]] SES smoothing constant (shared with the oracle). */
  private val ThetaA = "0.3"

  // ── Theta-method forecast (θ=2, the M3-competition configuration):
  // average of the LS trend line (θ=0) and an SES fold over the
  // double-curvature theta line zₜ = 2yₜ − (a + b·t) — the
  // deceptively-simple method that beat every entrant at M3. The OLS
  // moments are EXACT int64 (daily cents × integer t, with Σt and Σt²
  // in closed form), so a and b are engine-identical doubles; the SES
  // recursion is one codegen'd aggregate fold carrying (i, l) state
  // (the forecast_holt shape — fact table reduces to a group-sized
  // series first). F(7) = ½(a + b(n+7)) + ½·l_n. ──
  def forecastTheta(spark: SparkSession, dir: String): DataFrame =
    ev(spark, dir)
      .groupBy(col("event_type"), col("day"))
      .agg((sum(col("value").cast("decimal(18,2)")) * 100).cast("long")
        .as("yc"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("yc")).as("syc"),
        sort_array(collect_list(struct(col("day"), col("yc")))).as("s"))
      .filter(col("n") >= 2)
      // Σt·yc via an indexed fold (the array is day-sorted, t = 1-based
      // position); Σt, Σt² in closed form — every moment exact int64
      .withColumn("styc", expr(
        "aggregate(s, named_struct('i', 0L, 'a', 0L)," +
          " (st, x) -> named_struct('i', st.i + 1," +
          " 'a', st.a + (st.i + 1) * x.yc)).a"))
      .withColumn("stt", expr("n * (n + 1) div 2"))
      .withColumn("st2", expr("n * (n + 1) * (2 * n + 1) div 6"))
      .withColumn("bc", expr("cast(n * styc - stt * syc as double)" +
        " / cast(n * st2 - stt * stt as double)"))
      .withColumn("ac", expr("(syc - bc * stt) / n"))
      .withColumn("lz", expr(
        s"""aggregate(
           |  slice(s, 2, greatest(size(s) - 1, 0)),
           |  named_struct('i', 1L, 'l', 2.0D * s[0].yc - (ac + bc)),
           |  (st, x) -> named_struct('i', st.i + 1,
           |    'l', $ThetaA * (2.0D * x.yc - (ac + bc * (st.i + 1)))
           |         + (1.0D - $ThetaA) * st.l)).l""".stripMargin))
      .select(col("event_type"), col("n").as("n_days"),
        r6(expr("bc / 100")).as("slope"),
        r6(expr("lz / 100")).as("ses_level"),
        r6(expr("(0.5D * (ac + bc * (n + 7)) + 0.5D * lz) / 100"))
          .as("forecast_7"))
      .orderBy("event_type")

  /** [[forecastDamped]] parameters (shared with the oracle): the
    * forecast_holt α/β plus the damping φ. */
  private val DampA = "0.5"
  private val DampB = "0.3"
  private val DampP = "0.9"

  // ── damped-trend Holt: the forecast_holt recursion with the trend
  // damped by φ at every step AND in the forecast horizon — the fix
  // for linear-trend extrapolation marching off to infinity (Gardner &
  // McKenzie; the default "safe" trender in practice). Same one-fold
  // group-sized shape as forecast_holt; F(7) sums the geometric
  // φ+φ²+…+φ⁷ in closed form, shared verbatim with the oracle. ──
  def forecastDamped(spark: SparkSession, dir: String): DataFrame =
    ev(spark, dir)
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("y"))
      .groupBy(col("event_type"))
      .agg(sort_array(collect_list(struct(col("day"), col("y")))).as("s"))
      .filter(size(col("s")) >= 2)
      .withColumn("st", expr(
        s"""aggregate(
           |  slice(s, 3, greatest(size(s) - 2, 0)),
           |  named_struct('l', s[0].y, 'b', s[1].y - s[0].y),
           |  (st, p) -> named_struct(
           |    'l', $DampA * p.y
           |         + (1.0D - $DampA) * (st.l + $DampP * st.b),
           |    'b', $DampB * (($DampA * p.y + (1.0D - $DampA)
           |           * (st.l + $DampP * st.b)) - st.l)
           |         + (1.0D - $DampB) * $DampP * st.b))""".stripMargin))
      .select(col("event_type"),
        size(col("s")).cast("long").as("n_days"),
        r6(col("st.l")).as("level"),
        r6(col("st.b")).as("trend"),
        r6(expr(s"st.l + st.b * ($DampP * (1.0D - pow($DampP, 7))" +
          s" / (1.0D - $DampP))")).as("forecast_7"))
      .orderBy("event_type")

  // ── Kaufman adaptive moving average (10/2/30) on the per-type daily
  // revenue: the smoother that SPEEDS UP in trends and flattens in
  // chop — efficiency ratio ER = |10-day net move| / Σ|daily moves|
  // gates the EMA constant between the fast(2) and slow(30) bounds.
  // ER is exact int64 cents (window sums of integer |diffs|); the
  // squared smoothing constant and the varying-coefficient recursion
  // kamaₜ = kamaₜ₋₁ + scₜ(yₜ−kamaₜ₋₁) run as ONE codegen'd fold over
  // the collected (day, y, sc) series (the forecast_holt shape —
  // windows do the O(1)-state parts, the fold does the one genuinely
  // sequential part). Emits the LAST bar per type with its full
  // adaptive state. ──
  def windowKama(spark: SparkSession, dir: String): DataFrame = {
    val daily = ev(spark, dir).groupBy(col("event_type"), col("day"))
      .agg((sum(col("value").cast("decimal(18,2)")) * 100).cast("long")
        .as("yc"))
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val er = daily
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("net",
        abs(col("yc") - lag(col("yc"), 10).over(wOrd)))
      .withColumn("vol", sum(abs(col("yc") - lag(col("yc"), 1).over(wOrd)))
        .over(wOrd.rowsBetween(-9, 0)))
      .withColumn("sc", expr(
        "CASE WHEN rn >= 11 THEN" +
          " pow((CASE WHEN vol > 0 THEN cast(net as double) / vol" +
          " ELSE 0.0D END) * (2.0D / 3 - 2.0D / 31) + 2.0D / 31, 2)" +
          " END"))
    er.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        sort_array(collect_list(struct(col("day"), col("yc"), col("sc"),
          col("rn")))).as("s"))
      .filter(col("n_days") >= 11)
      .withColumn("kama", expr(
        """aggregate(
          |  filter(s, x -> x.rn >= 12),
          |  CAST(s[10].yc AS DOUBLE),
          |  (k, x) -> k + x.sc * (x.yc - k))""".stripMargin))
      .select(col("event_type"), col("n_days"),
        r6(expr("element_at(s, -1).yc / 100.0D")).as("last_close"),
        r6(expr("element_at(s, -1).sc")).as("last_sc"),
        r6(expr("kama / 100.0D")).as("kama"))
      .orderBy("event_type")
  }

  // ── calendar-gap scan per event type: which series have HOLES — the
  // data-quality twin of dq_freshness (freshness asks "is the tail
  // recent"; this asks "is the middle continuous", the property every
  // window/forecast key above silently assumes). Consecutive-day
  // deltas come from one lag over the grouped day grid; the whole
  // profile is integer date arithmetic (span+1 − observed = missing,
  // max gap, gap count). ──
  def dqGapScan(spark: SparkSession, dir: String): DataFrame = {
    val daily = ev(spark, dir).groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n_ev"))
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("day"))
    daily
      .withColumn("gap", datediff(col("day"),
        lag(col("day"), 1).over(wOrd)))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        min(col("day")).as("first_day"), max(col("day")).as("last_day"),
        sum(when(col("gap") > 1, 1L).otherwise(0L)).as("n_gaps"),
        coalesce(max(when(col("gap") > 1, col("gap") - 1)), lit(0))
          .cast("long").as("longest_gap"))
      .withColumn("span_days",
        datediff(col("last_day"), col("first_day")).cast("long") + 1)
      .select(col("event_type"), col("n_days"), col("first_day"),
        col("last_day"), col("span_days"),
        (col("span_days") - col("n_days")).as("n_missing"),
        col("n_gaps"), col("longest_gap"))
      .orderBy("event_type")
  }

  /** Standard-normal CDF as a SQL snippet — Abramowitz & Stegun 7.1.26
    * (max abs error 1.5e-7, well inside the 6-dp compare): the SAME
    * string is embedded in the Spark expr and the DuckDB oracle, so the
    * arithmetic is token-identical in both engines. `x` must be a plain
    * column reference or parenthesized expression. */
  private def phiSql(x: String): String = {
    val z = s"(abs($x) / sqrt(2.0))"
    val t = s"(1.0 / (1.0 + 0.3275911 * $z))"
    val poly = s"($t * (0.254829592 + $t * (-0.284496736 + $t *" +
      s" (1.421413741 + $t * (-1.453152027 + $t * 1.061405429)))))"
    s"(0.5 * (1.0 + (CASE WHEN $x < 0 THEN -1.0 ELSE 1.0 END)" +
      s" * (1.0 - $poly * exp(-$z * $z))))"
  }

  // ── TOST equivalence test between the click and purchase mean
  // values: stats_ttest asks "are they different"; TOST asks the
  // question a migration sign-off actually needs — "are they the SAME
  // to within ±δ" (two one-sided Welch t's against a ±5%-of-pooled-mean
  // margin; equivalence requires BOTH to reject). Group moments are the
  // DECIMAL-exact frames; the one-sided p's go through the shared
  // token-identical Φ polynomial, and the verdict branches on the 6-dp
  // p (both engines compare identical values). ──
  def statsTost(spark: SparkSession, dir: String): DataFrame = {
    val g = ev(spark, dir)
      .filter(col("event_type").isin(KsTypeA, KsTypeB))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("s1"),
        sum(col("value").cast("decimal(18,2)") *
          col("value").cast("decimal(18,2)")).cast("double").as("s2"))
      .withColumn("m", expr("s1 / n"))
      .withColumn("vi", expr(
        "(n * s2 - s1 * s1) / (cast(n as double) * (n - 1))"))
    val a = g.filter(col("event_type") === KsTypeA)
      .select(col("n").as("n1"), col("m").as("m1"), col("vi").as("v1"))
    val b = g.filter(col("event_type") === KsTypeB)
      .select(col("n").as("n2"), col("m").as("m2"), col("vi").as("v2"))
    a.crossJoin(broadcast(b))
      .withColumn("d", expr("m1 - m2"))
      .withColumn("delta", expr("abs(0.05D * (m1 + m2) / 2)"))
      .withColumn("se", expr("sqrt(v1 / n1 + v2 / n2)"))
      .withColumn("tl", expr("(d + delta) / se"))
      .withColumn("tu", expr("(delta - d) / se"))
      .withColumn("pmax6", r6(expr(
        s"greatest(1.0 - ${phiSql("tl")}, 1.0 - ${phiSql("tu")})")))
      .select(col("n1"), col("n2"), r6(col("d")).as("diff"),
        r6(col("delta")).as("margin"), r6(col("se")).as("se"),
        r6(col("tl")).as("t_lower"), r6(col("tu")).as("t_upper"),
        col("pmax6").as("p_max"),
        (col("pmax6") < 0.05).as("equivalent"))
  }

  // ── Bayesian A/B readout on user-level purchase conversion: the same
  // portable-hash arms as ab_srm_check, Beta(x+1, n−x+1) posteriors,
  // and P(B > A) by the normal approximation to the posterior
  // difference — the "probability B is actually better" number a
  // decision memo quotes instead of a p-value. Counts are exact int64;
  // posterior moments are closed-form rationals of them; the single Φ
  // goes through the shared token-identical polynomial. One user-level
  // distinct + one flag aggregation. ──
  def abBayesApprox(spark: SparkSession, dir: String): DataFrame = {
    val u = ev(spark, dir)
      .groupBy(col("user_id"))
      .agg(max((col("event_type") === "purchase").cast("long"))
        .as("converted"))
      .withColumn("arm",
        expr("pmod(pmod(user_id, 2147483648) * 2654435761, 2147483648)" +
          " % 2"))
    u.agg(
        sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === 0L, col("converted")).otherwise(0L))
          .as("x_a"),
        sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("n_b"),
        sum(when(col("arm") === 1L, col("converted")).otherwise(0L))
          .as("x_b"))
      .withColumn("ma", expr("cast(x_a + 1 as double) / (n_a + 2)"))
      .withColumn("mb", expr("cast(x_b + 1 as double) / (n_b + 2)"))
      .withColumn("va", expr("cast(x_a + 1 as double) * (n_a - x_a + 1)" +
        " / (cast(n_a + 2 as double) * (n_a + 2) * (n_a + 3))"))
      .withColumn("vb", expr("cast(x_b + 1 as double) * (n_b - x_b + 1)" +
        " / (cast(n_b + 2 as double) * (n_b + 2) * (n_b + 3))"))
      .withColumn("zs", expr("(mb - ma) / sqrt(va + vb)"))
      .select(col("n_a"), col("x_a"), col("n_b"), col("x_b"),
        r6(expr("cast(x_a as double) / n_a")).as("cr_a"),
        r6(expr("cast(x_b as double) / n_b")).as("cr_b"),
        r6(expr("(cast(x_b as double) / n_b)" +
          " / (cast(x_a as double) / n_a) - 1")).as("rel_lift"),
        r6(expr(phiSql("zs"))).as("p_b_beats_a"))
  }

  // ── Weibull fit of the conversion-time distribution, by linearized
  // regression on the Kaplan–Meier curve: ln(−ln S(t)) is LINEAR in
  // ln t exactly when T ~ Weibull, so the OLS slope IS the shape k
  // (k<1 infant-mortality, k>1 wear-out) and exp(−intercept/k) the
  // scale — the parametric summary stats_kaplan_meier's curve points
  // at. The regression consumes the 6-dp-SNAPPED survival (already
  // engine-pinned by the KM ln-sum device), so every (x, y) point is
  // identical cross-engine; moments are 9-dp DECIMAL term sums over
  // the grid-sized curve. Points need 0 < S < 1 and t ≥ 1 h. ──
  def statsWeibullFit(spark: SparkSession, dir: String): DataFrame = {
    val s = survSubjects(spark, dir)
    val byT = s.groupBy(col("t"))
      .agg(sum(col("observed")).as("d"),
        sum(lit(1L) - col("observed")).as("c"))
    val w = Window.orderBy(col("t"))
    val pts = byT
      .withColumn("n_risk",
        sum(col("d") + col("c")).over(
          w.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      .withColumn("term", expr(
        """CASE WHEN d > 0 AND d < n_risk
          |THEN CAST(round(ln(1.0 - cast(d as double) / n_risk), 9)
          |          AS DECIMAL(18,9)) END""".stripMargin))
      .withColumn("cuml",
        sum(col("term")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .filter(col("d") > 0 && col("d") < col("n_risk") && col("t") >= 1)
      .withColumn("s6", r6(expr("exp(cast(cuml as double))")))
      .filter(col("s6") > 0 && col("s6") < 1)
      .select(expr("ln(cast(t as double))").as("x"),
        expr("ln(-ln(s6))").as("y"))
    pts.agg(count(lit(1)).as("n_points"),
        sum(expr("CAST(round(x, 9) AS DECIMAL(18,9))")).as("sx"),
        sum(expr("CAST(round(y, 9) AS DECIMAL(18,9))")).as("sy"),
        sum(expr("CAST(round(x * y, 9) AS DECIMAL(18,9))")).as("sxy"),
        sum(expr("CAST(round(x * x, 9) AS DECIMAL(18,9))")).as("sxx"))
      .withColumn("k", expr(
        "(n_points * cast(sxy as double) - cast(sx as double)" +
          " * cast(sy as double)) / (n_points * cast(sxx as double)" +
          " - cast(sx as double) * cast(sx as double))"))
      .withColumn("a", expr(
        "(cast(sy as double) - k * cast(sx as double)) / n_points"))
      .select(col("n_points"), r6(col("k")).as("shape_k"),
        r6(expr("exp(-a / k)")).as("scale_hours"),
        r6(col("a")).as("intercept"))
  }

  // ── negative-binomial method-of-moments fit of per-user event counts
  // per type — stats_overdispersion DETECTS var > mean; this fits the
  // (r, p) the detection implies, the distribution a capacity planner
  // simulates arrivals from (Poisson underestimates tails whenever the
  // dispersion index exceeds 1). Moments are exact int64 (counts of
  // counts); r = m²/(v−m), p = m/v are closed forms, nulled when the
  // data is UNDER-dispersed and NB degenerates. One user-level
  // reduction + one k-row pass. ──
  def statsNegbinFit(spark: SparkSession, dir: String): DataFrame = {
    val u = ev(spark, dir).groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("k"))
    u.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_users"), sum(col("k")).as("sk"),
        sum(col("k") * col("k")).as("sk2"))
      .withColumn("m", expr("cast(sk as double) / n_users"))
      .withColumn("v", expr(
        "cast(n_users * sk2 - CAST(sk AS DECIMAL(28,0)) * sk as double)" +
          " / (cast(n_users as double) * (n_users - 1))"))
      .select(col("event_type"), col("n_users"),
        r6(col("m")).as("mean"), r6(col("v")).as("variance"),
        r6(expr("v / m")).as("dispersion"),
        r6(expr("CASE WHEN v > m THEN m * m / (v - m) END")).as("r_fit"),
        r6(expr("CASE WHEN v > m THEN m / v END")).as("p_fit"))
      .orderBy("event_type")
  }

  // ── Hurst exponent (rescaled-range, block sizes 16 and 32) of the
  // per-type daily revenue: H>0.5 trending/persistent, H<0.5
  // mean-reverting — the long-memory diagnostic that says whether
  // window_ewma-style momentum or contrarian logic fits this series.
  // Per (type, size): full blocks only, R = range of the cumulative
  // deviation from the block mean (int cumsums minus k·mean — exact
  // inputs), S = population σ from exact block moments; H = the
  // two-point log-log slope ln(RS₁₆/RS₈)/ln 2. Block R/S terms snap
  // to 9-dp DECIMAL before the cross-block mean. Everything runs on
  // the grouped day grid. ──
  def statsHurst(spark: SparkSession, dir: String): DataFrame = {
    val daily = ev(spark, dir).groupBy(col("event_type"), col("day"))
      .agg((sum(col("value").cast("decimal(18,2)")) * 100).cast("long")
        .as("yc"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("event_type")).orderBy(col("day"))))
    val sized = daily.select(col("event_type"), col("yc"), col("rn"),
      explode(array(lit(8), lit(16))).as("sz"))
      .withColumn("b", expr("(rn - 1) div sz"))
      .withColumn("k", expr("(rn - 1) % sz + 1"))
    val blocks = sized.groupBy(col("event_type"), col("sz"), col("b"))
      .agg(count(lit(1)).as("nb"), sum(col("yc")).as("s1"),
        sum(expr("CAST(yc AS DECIMAL(28,0)) * yc")).as("s2"))
      .filter(col("nb") === col("sz"))
      .withColumn("mean", expr("cast(s1 as double) / sz"))
      .withColumn("sd", expr(
        "sqrt(cast(sz * s2 - CAST(s1 AS DECIMAL(28,0)) * s1 as double))" +
          " / sz"))
    val withCum = sized.join(blocks.select(col("event_type"), col("sz"),
        col("b"), col("mean"), col("sd")), Seq("event_type", "sz", "b"))
      .withColumn("cum", sum(col("yc")).over(
        Window.partitionBy(col("event_type"), col("sz"), col("b"))
          .orderBy(col("k"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("dev", expr("cum - k * mean"))
    val rs = withCum.groupBy(col("event_type"), col("sz"), col("b"))
      .agg((max(col("dev")) - min(col("dev"))).as("r"),
        first(col("sd")).as("sd"))
      .filter(col("sd") > 0)
      .groupBy(col("event_type"), col("sz"))
      .agg(count(lit(1)).as("n_blocks"),
        sum(expr("CAST(round(r / sd, 9) AS DECIMAL(18,9))")).as("rss"))
      .withColumn("rs", expr("cast(rss as double) / n_blocks"))
    val p8 = rs.filter(col("sz") === 8)
      .select(col("event_type"), col("rs").as("rsa"),
        col("n_blocks").as("blocks_8"))
    val p16 = rs.filter(col("sz") === 16)
      .select(col("event_type"), col("rs").as("rsb"),
        col("n_blocks").as("blocks_16"))
    p8.join(p16, "event_type")
      .select(col("event_type"), col("blocks_8"), col("blocks_16"),
        r6(col("rsa")).as("rs_8"), r6(col("rsb")).as("rs_16"),
        r6(expr("ln(rsb / rsa) / ln(2.0D)")).as("hurst"))
      .orderBy("event_type")
  }

  // ── sample entropy (m=2, r=0.2σ) of the per-type daily revenue —
  // the regularity score anomaly hunters read BEFORE trusting a
  // forecast: low SampEn = repeating patterns (forecastable), high =
  // irregular. A = template pairs matching on 3 consecutive points, B
  // on 2; SampEn = −ln(A/B). The O(n²) template join runs on the
  // GROUP-SIZED day grid per type (the theilsen pair-join class, never
  // the fact table); matches compare exact int64 cents against the
  // 6-dp-snapped tolerance, so the pair counts are engine-identical
  // integers and the single ln is the only float. ──
  def statsSampleEntropy(spark: SparkSession, dir: String): DataFrame = {
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val daily = ev(spark, dir).groupBy(col("event_type"), col("day"))
      .agg((sum(col("value").cast("decimal(18,2)")) * 100).cast("long")
        .as("yc"))
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("y1", lead(col("yc"), 1).over(wOrd))
      .withColumn("y2", lead(col("yc"), 2).over(wOrd))
      .filter(col("y2").isNotNull)
    val tol = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("yc")).as("s1"),
        sum(expr("CAST(yc AS DECIMAL(28,0)) * yc")).as("s2"))
      .withColumn("r_tol", expr(
        "round(0.2D * sqrt(cast(n * s2 - CAST(s1 AS DECIMAL(28,0)) * s1" +
          " as double)) / n, 6)"))
      .select(col("event_type"), col("n"), col("r_tol"))
    val a = daily.alias("a")
    val b = daily.alias("b")
    val pairs = a.join(b, col("a.event_type") === col("b.event_type") &&
        col("b.rn") > col("a.rn"))
      .join(broadcast(tol.select(col("event_type").as("tet"), col("r_tol"))),
        col("a.event_type") === col("tet"))
      .select(col("a.event_type").as("et"),
        (abs(col("a.yc") - col("b.yc")) <= col("r_tol")).as("m0"),
        (abs(col("a.y1") - col("b.y1")) <= col("r_tol")).as("m1"),
        (abs(col("a.y2") - col("b.y2")) <= col("r_tol")).as("m2"))
    pairs.groupBy(col("et").as("event_type"))
      .agg(sum((col("m0") && col("m1")).cast("long")).as("b_pairs"),
        sum((col("m0") && col("m1") && col("m2")).cast("long"))
          .as("a_pairs"))
      .join(broadcast(tol), "event_type")
      .select(col("event_type"), col("n").as("n_templates"),
        r6(col("r_tol") / 100).as("tolerance"),
        col("b_pairs"), col("a_pairs"),
        r6(expr("CASE WHEN a_pairs > 0 AND b_pairs > 0" +
          " THEN -ln(cast(a_pairs as double) / b_pairs) END"))
          .as("sampen"))
      .orderBy("event_type")
  }

  // ── central-DP mean with contribution clipping — the release
  // mechanism for a NUMERIC statistic (privacy_dp_counts handles
  // histograms): clip each value to [0, C] so one user moves the sum
  // by at most C, add Laplace(C/ε) to the clipped sum and Laplace(1/ε)
  // to the count, release noisy_sum/noisy_count. The clip bound is the
  // entire sensitivity argument — emitted alongside so an auditor can
  // check it. Same replayable inverse-CDF Laplace coin as
  // privacy_dp_counts (hash of the category index; seeds 1/2 for the
  // two releases); clipped sums are DECIMAL-exact. ──
  def privacyDpMean(spark: SparkSession, dir: String): DataFrame = {
    // CASE, not least/greatest: DuckDB's greatest() promotes DECIMAL to
    // DOUBLE, which would turn the exact clipped sum order-dependent
    val counts = ev(spark, dir).groupBy(col("event_type"))
      .agg(count(lit(1)).as("c"),
        sum(expr("CASE WHEN CAST(value AS DECIMAL(18,2)) < 0" +
          " THEN CAST(0 AS DECIMAL(18,2))" +
          " WHEN CAST(value AS DECIMAL(18,2)) > 200" +
          " THEN CAST(200 AS DECIMAL(18,2))" +
          " ELSE CAST(value AS DECIMAL(18,2)) END"))
          .cast("double").as("clipped_sum"))
      .withColumn("j", row_number().over(
        Window.partitionBy(lit(1)).orderBy(col("event_type"))).cast("long"))
    def lap(seed: Int, scale: String) = expr(
      s"""CASE WHEN (pmod(pmod(j * 2 + $seed, 2147483648) * 2654435761,
         |  2147483648) + 1) / 2147483649.0 < 0.5
         |THEN $scale * round(ln(2.0 * ((pmod(pmod(j * 2 + $seed,
         |  2147483648) * 2654435761, 2147483648) + 1) / 2147483649.0)),
         |  9)
         |ELSE -$scale * round(ln(2.0 * (1.0 - (pmod(pmod(j * 2 + $seed,
         |  2147483648) * 2654435761, 2147483648) + 1) / 2147483649.0)),
         |  9) END""".stripMargin)
    counts
      .withColumn("noisy_sum", col("clipped_sum") + lap(0, "200.0"))
      .withColumn("noisy_n", col("c") + lap(1, "1.0"))
      .select(col("event_type"), lit(1.0d).as("epsilon"),
        lit(200.0d).as("clip_bound"),
        r6(col("noisy_sum")).as("noisy_sum"),
        r6(col("noisy_n")).as("noisy_count"),
        r6(expr("noisy_sum / noisy_n")).as("dp_mean"))
      .orderBy("event_type")
  }

  // ── small-cell suppression of the (event type × weekday) release
  // table — the statistical-disclosure-control step every public data
  // release runs: cells under the k=10 threshold are withheld
  // (privacy_kanon MEASURES k-anonymity; this ENFORCES it on a
  // marginal release), plus per-type complementary suppression of the
  // minimum remaining cell whenever exactly one cell was withheld —
  // otherwise the row total reveals it by subtraction. Weekday is
  // epoch-day mod 7 (engine-neutral); the audit columns report how
  // much mass suppression withheld. ──
  def privacySuppression(spark: SparkSession, dir: String): DataFrame = {
    val cells = ev(spark, dir)
      .groupBy(col("event_type"),
        pmod(expr("datediff(day, DATE'1970-01-01')"), lit(7)).cast("long")
          .as("dow"))
      .agg(count(lit(1)).as("n"))
      .withColumn("primary_sup", col("n") < 10)
    val byType = Window.partitionBy(col("event_type"))
    val marked = cells
      .withColumn("n_sup", sum(col("primary_sup").cast("long")).over(byType))
      .withColumn("min_ok", min(when(!col("primary_sup"), col("n")))
        .over(byType))
      .withColumn("secondary_sup",
        col("n_sup") === 1 && !col("primary_sup") && col("n") === col("min_ok"))
      // complementary rule ties: suppress the LOWEST dow among equal-n
      .withColumn("min_dow", min(when(!col("primary_sup") &&
        (col("n") === col("min_ok")), col("dow"))).over(byType))
      .withColumn("suppressed", col("primary_sup") ||
        (col("secondary_sup") && col("dow") === col("min_dow")))
    marked.select(col("event_type"), col("dow"),
        when(!col("suppressed"), col("n")).as("released_n"),
        col("suppressed"),
        col("primary_sup").as("is_primary"))
      .orderBy("event_type", "dow")
  }

  // ── process-capability indices Cp/Cpk of `value` per event type
  // against fixed spec limits [10, 190] — the SPC summary that says
  // whether a metric pipeline stays inside its contract (Cp = spec
  // width over 6σ ignores centering; Cpk penalizes a drifted mean;
  // < 1.33 is the classic "process not capable" fence). Pure
  // moment arithmetic on the DECIMAL-exact group sums — one scan, one
  // k-row pass; the capability verdict branches on the 6-dp Cpk. ──
  def statsCpk(spark: SparkSession, dir: String): DataFrame =
    ev(spark, dir).groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("s1"),
        sum(col("value").cast("decimal(18,2)") *
          col("value").cast("decimal(18,2)")).cast("double").as("s2"))
      .withColumn("m", expr("s1 / n"))
      .withColumn("sd", expr(
        "sqrt((n * s2 - s1 * s1) / (cast(n as double) * (n - 1)))"))
      .withColumn("cpk6", r6(expr(
        "least((190.0D - m) / (3 * sd), (m - 10.0D) / (3 * sd))")))
      .select(col("event_type"), col("n"), r6(col("m")).as("mean"),
        r6(col("sd")).as("sd"),
        r6(expr("(190.0D - 10.0D) / (6 * sd)")).as("cp"),
        col("cpk6").as("cpk"),
        (col("cpk6") >= 1.33).as("capable"))
      .orderBy("event_type")

  // ── X̄ control chart on daily subgroups: each day's mean value per
  // type against the grand mean ± 3σ/√n_day limits — the monitoring
  // twin of stats_cpk (capability says CAN it stay in spec; the chart
  // says IS it in control today). Limits derive from the same exact
  // grand moments broadcast back to the |days|-grid; per-day means are
  // exact cents/count divisions and the violation flag compares the
  // 6-dp z so both engines flag identical days. Emits the full chart
  // with per-day flags plus each type's violation totals. ──
  def statsXbarChart(spark: SparkSession, dir: String): DataFrame = {
    val daily = ev(spark, dir).groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("nd"),
        (sum(col("value").cast("decimal(18,2)")) * 100).cast("long")
          .as("sc"))
    val grand = ev(spark, dir).groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("s1"),
        sum(col("value").cast("decimal(18,2)") *
          col("value").cast("decimal(18,2)")).cast("double").as("s2"))
      .withColumn("gm", expr("s1 / n"))
      .withColumn("gsd", expr(
        "sqrt((n * s2 - s1 * s1) / (cast(n as double) * (n - 1)))"))
      .select(col("event_type"), col("gm"), col("gsd"))
    val z = daily.join(broadcast(grand), "event_type")
      .withColumn("xbar", expr("cast(sc as double) / (100 * nd)"))
      .withColumn("z6", r6(expr(
        "(xbar - gm) / (gsd / sqrt(cast(nd as double)))")))
      .withColumn("violation", abs(col("z6")) > 3.0)
    val days = z.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("violation").cast("long")).as("n_violations"))
    z.join(days, "event_type")
      .select(col("event_type"), col("day"), col("nd").as("n_obs"),
        r6(col("xbar")).as("xbar"), col("z6").as("z"),
        col("violation"), col("n_days"), col("n_violations"))
      .orderBy("event_type", "day")
  }

  // ── 10% trimmed and winsorized means of `value` per event type —
  // the robust-location pair a metrics report quotes when stats_ttest's
  // plain mean is hostage to tails (trimming DROPS the extreme k=⌊n/10⌋
  // each side; winsorizing CLAMPS them to the surviving extremes). Both
  // are EXACT on the grouped cents grid: each tie group spans an
  // integer rank range, the trim window [k+1, n−k] intersects it in
  // closed form (the eval_lift span-overlap device), and the clamp
  // values are the grid rows covering ranks k+1 and n−k — int64
  // arithmetic to the final divisions. ──
  def statsTrimmedMean(spark: SparkSession, dir: String): DataFrame = {
    val g = ev(spark, dir)
      .withColumn("vc",
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"))
      .groupBy(col("event_type"), col("vc"))
      .agg(count(lit(1)).as("t"))
    val byVal = Window.partitionBy(col("event_type")).orderBy(col("vc"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val spans = g
      .withColumn("lo", coalesce(sum(col("t")).over(byVal), lit(0L)) + 1)
      .withColumn("hi",
        coalesce(sum(col("t")).over(byVal), lit(0L)) + col("t"))
    val tot = g.groupBy(col("event_type"))
      .agg(sum(col("t")).as("n"), sum(col("t") * col("vc")).as("sv"))
      .withColumn("k", expr("n div 10"))
    spans.join(broadcast(tot), "event_type")
      .withColumn("ov", expr(
        "greatest(0L, least(hi, n - k) - greatest(lo, k + 1) + 1)"))
      .groupBy(col("event_type"), col("n"), col("k"), col("sv"))
      .agg(sum(expr("ov * vc")).as("trim_sum"),
        sum(col("ov")).as("n_kept"),
        min(when(col("hi") >= col("k") + 1, col("vc"))).as("v_lo"),
        min(when(col("hi") >= expr("n - k"), col("vc"))).as("v_hi"))
      .select(col("event_type"), col("n"),
        r6(expr("cast(sv as double) / (100 * n)")).as("mean"),
        r6(expr("cast(trim_sum as double) / (100 * n_kept)"))
          .as("trimmed_mean_10"),
        r6(expr("cast(trim_sum + k * (v_lo + v_hi) as double)" +
          " / (100 * n)")).as("winsor_mean_10"),
        r6(expr("cast(v_lo as double) / 100")).as("clamp_lo"),
        r6(expr("cast(v_hi as double) / 100")).as("clamp_hi"))
      .orderBy("event_type")
  }

  // ── Tukey boxplot fences per event type: Q1/Q3 (the established
  // percentile ↔ quantile_cont interpolation pairing), IQR, the
  // 1.5·IQR inner and 3·IQR outer fences, and HOW MANY observations
  // fall outside each — the outlier budget that decides between
  // anomaly_mad's robust band and a plain threshold. Fences snap to
  // 6 dp BEFORE the comparison pass, so both engines count identical
  // outlier sets. Two scans (quantiles, then counts vs the broadcast
  // fences). ──
  def statsIqrFences(spark: SparkSession, dir: String): DataFrame = {
    val q = ev(spark, dir).groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.25D)").as("q1"),
        expr("percentile(value, 0.75D)").as("q3"))
      .withColumn("iqr", expr("q3 - q1"))
      .withColumn("lo_in", r6(expr("q1 - 1.5D * iqr")))
      .withColumn("hi_in", r6(expr("q3 + 1.5D * iqr")))
      .withColumn("lo_out", r6(expr("q1 - 3.0D * iqr")))
      .withColumn("hi_out", r6(expr("q3 + 3.0D * iqr")))
    ev(spark, dir).join(broadcast(q), "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), first(col("q1")).as("q1d"),
        first(col("q3")).as("q3d"), first(col("lo_in")).as("li"),
        first(col("hi_in")).as("hi"), first(col("lo_out")).as("lo"),
        first(col("hi_out")).as("ho"),
        sum(((col("value") < col("lo_in")) ||
          (col("value") > col("hi_in"))).cast("long")).as("n_mild"),
        sum(((col("value") < col("lo_out")) ||
          (col("value") > col("hi_out"))).cast("long")).as("n_extreme"))
      .select(col("event_type"), col("n"),
        r6(col("q1d")).as("q1"), r6(col("q3d")).as("q3"),
        col("li").as("fence_lo"), col("hi").as("fence_hi"),
        col("n_mild"), col("n_extreme"))
      .orderBy("event_type")
  }

  // ── tabular two-sided CUSUM chart (k=0.5σ slack, h=4σ decision
  // interval, reset-on-alarm) on the standardized daily revenue —
  // window_cusum plots the raw cumulative deviation; THIS is the
  // SPC-grade detector with the slack that ignores noise and the
  // decision limit that fires on a sustained small shift (the case
  // ±3σ X̄ charts are blind to). The genuinely sequential recursion
  // C⁺ₜ = max(0, C⁺ₜ₋₁ + zₜ − k) runs as one codegen'd fold per type
  // (the forecast_holt shape); z comes from exact grand moments
  // broadcast into the fold. Emits each type's final state + alarm
  // count. ──
  def statsCusumChart(spark: SparkSession, dir: String): DataFrame = {
    val daily = ev(spark, dir).groupBy(col("event_type"), col("day"))
      .agg((sum(col("value").cast("decimal(18,2)")) * 100).cast("long")
        .as("yc"))
    val mom = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("yc")).as("s1"),
        sum(expr("CAST(yc AS DECIMAL(28,0)) * yc")).as("s2"))
      .withColumn("mu", expr("cast(s1 as double) / n"))
      .withColumn("sd", expr(
        "sqrt(cast(n * s2 - CAST(s1 AS DECIMAL(28,0)) * s1 as double)" +
          " / (cast(n as double) * (n - 1)))"))
      .select(col("event_type"), col("mu"), col("sd"))
    daily.join(broadcast(mom), "event_type")
      .withColumn("z", expr("(yc - mu) / sd"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        sort_array(collect_list(struct(col("day"), col("z")))).as("s"))
      .withColumn("st", expr(
        """aggregate(s,
          |  named_struct('cp', 0.0D, 'cn', 0.0D, 'al', 0L),
          |  (st, x) -> IF(
          |    greatest(0.0D, st.cp + x.z - 0.5D) > 4.0D OR
          |    least(0.0D, st.cn + x.z + 0.5D) < -4.0D,
          |    named_struct('cp', 0.0D, 'cn', 0.0D, 'al', st.al + 1),
          |    named_struct('cp', greatest(0.0D, st.cp + x.z - 0.5D),
          |      'cn', least(0.0D, st.cn + x.z + 0.5D), 'al', st.al)))"""
          .stripMargin))
      .select(col("event_type"), col("n_days"),
        r6(col("st.cp")).as("cusum_pos"),
        r6(col("st.cn")).as("cusum_neg"),
        col("st.al").as("n_alarms"))
      .orderBy("event_type")
  }

  // ── Page–Hinkley drift detector (δ=0.1, λ=5, standardized units) —
  // the ONLINE change detector a streaming ingest pipeline embeds
  // (stats_pettitt is the offline retrospective twin): mₜ accumulates
  // deviations from the RUNNING mean, PH = m − min m fires when the
  // recent level drifts up relative to history. The whole
  // (count, sum, m, min m, alarm) state advances in one sequential
  // fold per type; the recursion is replayed verbatim by the oracle's
  // recursive CTE. ──
  def statsPageHinkley(spark: SparkSession, dir: String): DataFrame = {
    val daily = ev(spark, dir).groupBy(col("event_type"), col("day"))
      .agg((sum(col("value").cast("decimal(18,2)")) * 100).cast("long")
        .as("yc"))
    val mom = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("yc")).as("s1"),
        sum(expr("CAST(yc AS DECIMAL(28,0)) * yc")).as("s2"))
      .withColumn("mu", expr("cast(s1 as double) / n"))
      .withColumn("sd", expr(
        "sqrt(cast(n * s2 - CAST(s1 AS DECIMAL(28,0)) * s1 as double)" +
          " / (cast(n as double) * (n - 1)))"))
      .select(col("event_type"), col("mu"), col("sd"))
    daily.join(broadcast(mom), "event_type")
      .withColumn("z", expr("(yc - mu) / sd"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        sort_array(collect_list(struct(col("day"), col("z")))).as("s"))
      .withColumn("st", expr(
        """aggregate(s,
          |  named_struct('i', 0L, 'sm', 0.0D, 'm', 0.0D,
          |    'mn', 0.0D, 'al', 0L),
          |  (st, x) -> named_struct(
          |    'i', st.i + 1,
          |    'sm', st.sm + x.z,
          |    'm', st.m + x.z - (st.sm + x.z) / (st.i + 1) - 0.1D,
          |    'mn', least(st.mn,
          |      st.m + x.z - (st.sm + x.z) / (st.i + 1) - 0.1D),
          |    'al', st.al + IF(st.m + x.z - (st.sm + x.z) / (st.i + 1)
          |      - 0.1D - least(st.mn, st.m + x.z - (st.sm + x.z)
          |      / (st.i + 1) - 0.1D) > 5.0D, 1L, 0L)))""".stripMargin))
      .select(col("event_type"), col("n_days"),
        r6(col("st.m")).as("m_stat"),
        r6(col("st.mn")).as("m_min"),
        r6(expr("st.m - st.mn")).as("ph_stat"),
        (round(expr("st.m - st.mn"), 6) + lit(0.0d) > 5.0)
          .as("drift_flag"),
        col("st.al").as("n_alarm_days"))
      .orderBy("event_type")
  }

  // ── restricted mean survival time per hash arm — the censoring-robust
  // A/B effect measure when proportional hazards fails (stats_logrank
  // tests the event RATE over time; THIS reports expected event-free
  // hours up to a shared horizon τ = the smaller arm's own follow-up
  // limit, so neither arm extrapolates beyond what it observed). Area
  // under each arm's KM step curve: S is snapped to a 9-dp DECIMAL the
  // moment it leaves exp(), and every interval contribution S·Δt is
  // DECIMAL × integer hours — the accumulated area is exact, so
  // summation order can't diverge between engines. Median survival =
  // first event time where the snapped S ≤ 0.5 (NULL when the curve
  // never crosses — itself a deterministic fact). Same subject frame
  // and arm coin as stats_logrank: the survival family shares ONE
  // user-level reduction however many diagnostics read it. ──
  def statsRmst(spark: SparkSession, dir: String): DataFrame = {
    val s = survSubjects(spark, dir).withColumn("g",
      expr("pmod(pmod(user_id, 2147483648) * 2654435761, 2147483648) % 2"))
    val tau = s.groupBy(col("g")).agg(max(col("t")).as("mxt"))
      .agg(min(col("mxt")).as("tau"))
    val byT = s.groupBy(col("g"), col("t"))
      .agg(sum(col("observed")).as("d"),
        sum(lit(1L) - col("observed")).as("c"))
    val w = Window.partitionBy(col("g")).orderBy(col("t"))
    val curve = byT
      .withColumn("n_risk", sum(col("d") + col("c")).over(
        w.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      .withColumn("term", expr(
        """CASE WHEN d > 0 AND d < n_risk
          |THEN CAST(round(ln(1.0 - cast(d as double) / n_risk), 9)
          |          AS DECIMAL(18,9)) END""".stripMargin))
      .withColumn("cuml", sum(col("term")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("d") > 0)
      .withColumn("s9", expr(
        """CASE WHEN d = n_risk THEN CAST(0 AS DECIMAL(18,9))
          |ELSE CAST(round(exp(cast(cuml as double)), 9)
          |     AS DECIMAL(18,9)) END""".stripMargin))
      .crossJoin(broadcast(tau))
      .withColumn("tn",
        least(coalesce(lead(col("t"), 1).over(w), col("tau")), col("tau")))
    val ar = curve.groupBy(col("g"), col("tau"))
      .agg(min(col("t")).as("t1"),
        sum(expr("s9 * CAST(greatest(0L, tn - t) AS DECIMAL(10,0))"))
          .as("area_ev"),
        min(expr("CASE WHEN s9 <= 0.5 THEN t END")).as("median_t"))
    val grp = s.groupBy(col("g"))
      .agg(count(lit(1)).as("n_subj"), sum(col("observed")).as("n_events"))
    ar.join(broadcast(grp), "g")
      .select(col("g"), col("n_subj"), col("n_events"),
        col("tau").as("tau_hours"), col("median_t").as("median_t_hours"),
        r6(expr("cast(least(t1, tau) + area_ev as double)"))
          .as("rmst_hours"),
        r6(expr("cast(least(t1, tau) + area_ev as double) / tau"))
          .as("rmst_frac"))
      .orderBy("g")
  }

  // ── actuarial (weekly-interval) life table on the same conversion
  // cohort: the grouped-time presentation an ops review reads when the
  // exact KM curve has too many rows. Subjects censored inside an
  // interval count as half an exposure (the classical n′ = n − c/2
  // adjustment, carried as the EXACT integer 2n − c so no engine ever
  // divides early); q̂ = 2d / (2n − c) and the survival-to-interval-start
  // column multiplies (1 − q̂) via the repo's 9-dp-snapped Σln device,
  // collapsing to exactly 0 past any interval that exhausts its risk
  // set. One keyed aggregation to weekly bins (≈ dozens of rows at any
  // corpus size) + one tiny window pass. ──
  def statsLifeTable(spark: SparkSession, dir: String): DataFrame = {
    val byI = survSubjects(spark, dir)
      .groupBy(expr("t div 168").as("wk"))
      .agg(sum(col("observed")).as("d"),
        sum(lit(1L) - col("observed")).as("c"))
    val w = Window.orderBy(col("wk"))
    byI
      .withColumn("n_enter", sum(col("d") + col("c")).over(
        w.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      .withColumn("n2", expr("2 * n_enter - c"))
      .withColumn("term", expr(
        """CASE WHEN 2 * d < n2
          |THEN CAST(round(ln(1.0 - cast(2 * d as double) / n2), 9)
          |          AS DECIMAL(18,9)) END""".stripMargin))
      .withColumn("cuml", sum(col("term")).over(
        w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("extinct", coalesce(
        max(expr("CASE WHEN 2 * d >= n2 THEN 1 ELSE 0 END")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0)))
      .select(col("wk").as("interval_wk"),
        (col("wk") * 168).as("t_lo_hours"),
        col("n_enter"), col("d").as("d_events"), col("c").as("c_censored"),
        r6(expr("cast(2 * d as double) / n2")).as("q_hat"),
        r6(expr(
          """CASE WHEN extinct = 1 THEN 0.0D
            |WHEN cuml IS NULL THEN 1.0D
            |ELSE exp(cast(cuml as double)) END""".stripMargin))
          .as("surv_start"))
      .orderBy("interval_wk")
  }

  // ── Kendall's coefficient of concordance W — stats_friedman answers
  // "is the day-to-day type ordering non-random"; W answers "HOW MUCH
  // do the days agree" on a calibrated 0..1 scale (1 = every day ranks
  // the k types identically), with the standard tie correction
  // m²(k³−k) − m·ΣT so the zero-filled grid cells can't inflate
  // agreement. Same complete day×type grid and doubled-midrank device
  // as Friedman (rank sums stay exact int64); the tie term Σ(t³−t)
  // reduces per (day, value) group. Both W and its χ² = m(k−1)·W are
  // ONE cast-first division from exact integers. ──
  def statsKendallW(spark: SparkSession, dir: String): DataFrame = {
    val rev = ev(spark, dir).groupBy(col("day"), col("event_type"))
      .agg((sum(col("value").cast("decimal(18,2)")) * 100).cast("long")
        .as("revc"))
    val days = rev.select(col("day")).distinct()
    val types = rev.select(col("event_type")).distinct()
    val grid = days.crossJoin(broadcast(types))
      .join(rev, Seq("day", "event_type"), "left")
      .withColumn("revc", coalesce(col("revc"), lit(0L)))
    val ranked = grid.withColumn("r2x",
      rank().over(Window.partitionBy(col("day")).orderBy(col("revc"))) * 2
        + count(lit(1)).over(Window.partitionBy(col("day"), col("revc")))
        - 1)
    val rs = ranked.groupBy(col("event_type"))
      .agg(sum(col("r2x")).as("r2"), count(lit(1)).as("m"))
    val km = rs.agg(count(lit(1)).as("k"), first(col("m")).as("m0"))
    val s2 = rs.crossJoin(broadcast(km))
      .agg(first(col("k")).as("k"), first(col("m0")).as("m"),
        sum(expr("(r2 - m0 * (k + 1)) * (r2 - m0 * (k + 1))")).as("s2c"))
    val ties = grid.groupBy(col("day"), col("revc"))
      .agg(count(lit(1)).as("t"))
      .agg(sum(expr("t * t * t - t")).as("tt"))
    s2.crossJoin(broadcast(ties))
      .select(col("m").as("n_blocks"), col("k"), col("tt").as("ties_term"),
        r6(expr("cast(3 * s2c as double)" +
          " / (cast(m as double) * (m * (k * k * k - k) - tt))")).as("w"),
        r6(expr("cast(3 * s2c * (k - 1) as double)" +
          " / (m * (k * k * k - k) - tt)")).as("chi2"))
  }

  // ── Theil's uncertainty coefficient U on the documents lang×source
  // contingency — the DIRECTIONAL companion of stats_cramers_v /
  // stats_mutual_info: U(lang|source) = I/H(lang) reads "what fraction
  // of language uncertainty does knowing the source remove", and the
  // asymmetry between the two conditionals is itself the diagnostic (a
  // source that pins its language vs a language spread over sources).
  // One contingency aggregation (cells are corpus-reduced: |langs| ×
  // |sources| rows regardless of scale), marginals re-aggregated from
  // the CACHED cells, every ln argument a ratio of exact int64
  // products (the stats_mutual_info device), ≤ dozens of terms summed
  // then 6-dp-snapped before the three ratio divisions. ──
  def statsTheilU(spark: SparkSession, dir: String): DataFrame = {
    val j = Tables.documents(spark, dir)
      .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("c"))
      .cache()
    val rT = j.groupBy(col("lang")).agg(sum(col("c")).as("r"))
    val cT = j.groupBy(col("source")).agg(sum(col("c")).as("s"))
    val n = j.agg(sum(col("c")).as("n"), count(lit(1)).as("n_cells"))
    val mi = j.join(rT, "lang").join(cT, "source").crossJoin(broadcast(n))
      .agg(r6(sum((col("c").cast("double") / col("n")) *
        log((col("c") * col("n")).cast("double") /
          (col("r") * col("s")).cast("double")))).as("mi_nats"))
    val hL = rT.crossJoin(broadcast(n.select(col("n"))))
      .agg(r6(-sum((col("r").cast("double") / col("n")) *
        log(col("r").cast("double") / col("n")))).as("h_lang"))
    val hS = cT.crossJoin(broadcast(n.select(col("n"))))
      .agg(r6(-sum((col("s").cast("double") / col("n")) *
        log(col("s").cast("double") / col("n")))).as("h_source"))
    n.crossJoin(broadcast(mi)).crossJoin(broadcast(hL))
      .crossJoin(broadcast(hS))
      .select(col("n").as("n_docs"), col("n_cells"), col("mi_nats"),
        col("h_lang"), col("h_source"),
        r6(col("mi_nats") / col("h_lang")).as("u_lang_given_source"),
        r6(col("mi_nats") / col("h_source")).as("u_source_given_lang"),
        r6(lit(2.0d) * col("mi_nats") / (col("h_lang") + col("h_source")))
          .as("u_symmetric"))
  }

  // ── ordinal-association panel (Goodman–Kruskal γ, Somers' D both
  // directions, Kendall τ-b) between the value's 100-band bucket and
  // the 6-hour shift of day — stats_kendall_tau ranks raw pairs; THIS
  // is the grid identity for ordinal×ordinal data where ties are the
  // norm, and the three coefficients differ exactly in which ties they
  // charge for (γ none, Somers' one side, τ-b both). Concordant /
  // discordant pair counts come from a ~40-cell contingency self-join
  // (corpus reduces to the grid first — the O(n²) pair space never
  // materializes), tie terms from marginals; everything is exact int64
  // until the three final divisions. τ-b's denominator multiplies the
  // two tie-adjusted pair counts in DOUBLE (their int64 product can
  // overflow at corpus scale; one expression, same operands → both
  // engines compute the identical double). ──
  def statsOrdinalAssoc(spark: SparkSession, dir: String): DataFrame = {
    val cells = ev(spark, dir)
      .select(floor(col("value") / 100).cast("long").as("xb"),
        expr("((us div 3600000000) % 24) div 6").as("yb"))
      .groupBy(col("xb"), col("yb")).agg(count(lit(1)).as("m"))
      .cache()
    val a = cells.select(col("xb").as("x1"), col("yb").as("y1"),
      col("m").as("m1"))
    val b = cells.select(col("xb").as("x2"), col("yb").as("y2"),
      col("m").as("m2"))
    val cd = a.join(broadcast(b), col("x2") > col("x1"))
      .agg(sum(when(col("y2") > col("y1"),
          col("m1") * col("m2")).otherwise(0L)).as("cp"),
        sum(when(col("y2") < col("y1"),
          col("m1") * col("m2")).otherwise(0L)).as("dp"))
    val nTot = cells.agg(sum(col("m")).as("n"))
    val tx = cells.groupBy(col("xb")).agg(sum(col("m")).as("r"))
      .agg(sum(expr("r * (r - 1)")).as("tx2"))
    val ty = cells.groupBy(col("yb")).agg(sum(col("m")).as("s"))
      .agg(sum(expr("s * (s - 1)")).as("ty2"))
    cd.crossJoin(broadcast(nTot)).crossJoin(broadcast(tx))
      .crossJoin(broadcast(ty))
      .withColumn("dx", expr("n * (n - 1) - tx2"))
      .withColumn("dy", expr("n * (n - 1) - ty2"))
      .select(col("n"), col("cp").as("c_pairs"), col("dp").as("d_pairs"),
        expr("tx2 div 2").as("tied_x_pairs"),
        expr("ty2 div 2").as("tied_y_pairs"),
        r6(expr("cast(cp - dp as double) / (cp + dp)")).as("gamma"),
        r6(expr("cast(2 * (cp - dp) as double) / dx")).as("somers_d_yx"),
        r6(expr("cast(2 * (cp - dp) as double) / dy")).as("somers_d_xy"),
        r6(expr("cast(2 * (cp - dp) as double)" +
          " / sqrt(cast(dx as double) * dy)")).as("tau_b"))
  }

  // ── Commodity Channel Index (20-day) on per-type daily revenue —
  // window_bollinger standardizes by the rolling STDDEV (outliers
  // inflate their own yardstick); CCI divides by the rolling MEAN
  // ABSOLUTE deviation, the robust yardstick the indicator was designed
  // around. The whole statistic stays integer-exact until one division:
  // with S = Σ₂₀ revc, TP − SMA = (20·revc − S)/20 and MD =
  // Σ|20·xᵢ − S|/400, so CCI = (20·revc − S)·20000 / (15·Σ|20·xᵢ − S|)
  // — the deviation sum runs over the window's COLLECTED list (20
  // int64s per row, bounded state) because each |xᵢ − SMA_t| depends
  // on the CURRENT row's mean, not its own. Per-type windows
  // parallelize; the daily frame is group-sized at any corpus. ──
  def windowCci(spark: SparkSession, dir: String): DataFrame = {
    val daily = ev(spark, dir).groupBy(col("event_type"), col("day"))
      .agg((sum(col("value").cast("decimal(18,2)")) * 100).cast("long")
        .as("revc"))
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val w20 = wOrd.rowsBetween(-19, 0)
    daily
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("s", sum(col("revc")).over(w20))
      .withColumn("h", collect_list(col("revc")).over(w20))
      .filter(col("rn") >= 20)
      .withColumn("a", expr(
        "aggregate(h, 0L, (acc, x) -> acc + abs(20L * x - s))"))
      .select(col("event_type"), col("day"),
        r6(expr("cast(revc as double) / 100")).as("close"),
        r6(expr("cast(s as double) / 2000")).as("sma20"),
        r6(expr("cast(a as double) / 40000")).as("mean_dev"),
        r6(expr("CASE WHEN a > 0 THEN" +
          " cast(20 * revc - s as double) * 20000 / (15 * a) END"))
          .as("cci"))
      .orderBy("event_type", "day")
  }

  // ── Donchian channel (20-day, EXCLUSIVE of today) with breakout
  // flags — the rolling high/low envelope window_stochastic positions
  // within, but with the frame shifted one day back so "today broke
  // the channel" means today exceeded what any of the PRIOR 20 days
  // reached (include today and a breakout can never register — today
  // would be its own channel edge). Channel edges are integer window
  // min/max over cents, flags are integer comparisons, the two dollar
  // conversions are the only doubles. ──
  def windowDonchian(spark: SparkSession, dir: String): DataFrame = {
    val daily = ev(spark, dir).groupBy(col("event_type"), col("day"))
      .agg((sum(col("value").cast("decimal(18,2)")) * 100).cast("long")
        .as("revc"))
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val w20x = wOrd.rowsBetween(-20, -1)
    daily
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("up", max(col("revc")).over(w20x))
      .withColumn("lo", min(col("revc")).over(w20x))
      .filter(col("rn") >= 21)
      .select(col("event_type"), col("day"),
        r6(expr("cast(revc as double) / 100")).as("close"),
        r6(expr("cast(up as double) / 100")).as("channel_hi"),
        r6(expr("cast(lo as double) / 100")).as("channel_lo"),
        r6(expr("cast(up - lo as double) / 100")).as("width"),
        (col("revc") > col("up")).as("breakout_up"),
        (col("revc") < col("lo")).as("breakout_dn"))
      .orderBy("event_type", "day")
  }

  // ── AR(2) fit by Yule–Walker on per-type daily revenue — the
  // autoregressive companion of forecast_holt's trend smoothing: φ₁/φ₂
  // capture "tomorrow echoes today AND the day before" (oscillation /
  // mean-reversion that exponential smoothing can't express). Lag
  // correlations reuse stats_acf's exact-decimal lagged-pair device
  // (calendar-day join, DECIMAL(18,2) moments cast once to double,
  // r snapped to 6 dp), so the YW solve φ₁ = r₁(1−r₂)/(1−r₁²),
  // φ₂ = (r₂−r₁²)/(1−r₁²) runs on engine-identical inputs; the
  // one-step forecast reads the last two days via a window rank. The
  // stationarity triangle check compares 6-dp-snapped φ's, so the flag
  // can't flap between engines. ──
  def forecastAr2(spark: SparkSession, dir: String): DataFrame = {
    val daily = ev(spark, dir).groupBy(col("event_type"), col("day"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("v"))
    val lagged = daily
      .withColumn("lag", explode(sequence(lit(1), lit(2))))
      .withColumn("prev_day", date_sub(col("day"), col("lag")))
      .join(daily.select(col("event_type"), col("day").as("prev_day"),
        col("v").as("pv")), Seq("event_type", "prev_day"))
    val x = col("v").cast("decimal(18,2)")
    val y = col("pv").cast("decimal(18,2)")
    val nD = col("n").cast("double")
    val rk = lagged.groupBy(col("event_type"), col("lag"))
      .agg(count(lit(1)).as("n"),
        sum(x).cast("double").as("sx"), sum(y).cast("double").as("sy"),
        sum(x * y).cast("double").as("sxy"),
        sum(x * x).cast("double").as("sxx"),
        sum(y * y).cast("double").as("syy"))
      .select(col("event_type"), col("lag"),
        r6((nD * col("sxy") - col("sx") * col("sy")) /
          sqrt((nD * col("sxx") - col("sx") * col("sx")) *
            (nD * col("syy") - col("sy") * col("sy")))).as("r"))
    val rr = rk.groupBy(col("event_type"))
      .agg(max(when(col("lag") === 1, col("r"))).as("r1"),
        max(when(col("lag") === 2, col("r"))).as("r2"))
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val last = daily
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("m",
        count(lit(1)).over(Window.partitionBy(col("event_type"))))
      .groupBy(col("event_type"))
      .agg(first(col("m")).as("n_days"),
        sum(col("v")).cast("double").as("sv"),
        max(when(col("rn") === col("m"), col("v"))).cast("double")
          .as("x_last"),
        max(when(col("rn") === col("m") - 1, col("v"))).cast("double")
          .as("x_prev"))
    rr.join(last, "event_type")
      .withColumn("mu", expr("sv / n_days"))
      .withColumn("phi1", expr("r1 * (1.0 - r2) / (1.0 - r1 * r1)"))
      .withColumn("phi2", expr("(r2 - r1 * r1) / (1.0 - r1 * r1)"))
      .withColumn("phi1r", r6(col("phi1")))
      .withColumn("phi2r", r6(col("phi2")))
      .select(col("event_type"), col("n_days"), col("r1"), col("r2"),
        col("phi1r").as("phi1"), col("phi2r").as("phi2"),
        r6(col("mu")).as("mean_rev"),
        r6(expr("mu + phi1 * (x_last - mu) + phi2 * (x_prev - mu)"))
          .as("forecast_next"),
        (abs(col("phi2r")) < 1.0 &&
          (col("phi1r") + col("phi2r")) < 1.0 &&
          (col("phi2r") - col("phi1r")) < 1.0).as("stationary"))
      .orderBy("event_type")
  }

  // ── Lilliefors test per event type: is the daily revenue NORMAL once
  // its own mean and sd are estimated from the data — the honest
  // version of a one-sample KS (using estimated parameters shrinks the
  // null distribution; the 0.886/√n critical value is the Lilliefors
  // 5% point, not Kolmogorov's). z comes from exact int64 cents
  // moments, Φ from the shared token-identical polynomial, the ECDF
  // rank from a per-type (value, day) total order, so D⁺/D⁻ maxima
  // compare engine-identical doubles; the verdict compares 6-dp-snapped
  // D and critical value. Group-sized series frame, parallel by type. ──
  def statsLilliefors(spark: SparkSession, dir: String): DataFrame = {
    val daily = ev(spark, dir).groupBy(col("event_type"), col("day"))
      .agg((sum(col("value").cast("decimal(18,2)")) * 100).cast("long")
        .as("yc"))
    val mom = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("yc")).as("s1"),
        sum(expr("CAST(yc AS DECIMAL(28,0)) * yc")).as("s2"))
      .withColumn("mu", expr("cast(s1 as double) / n"))
      .withColumn("sd", expr(
        "sqrt(cast(n * s2 - CAST(s1 AS DECIMAL(28,0)) * s1 as double)" +
          " / (cast(n as double) * (n - 1)))"))
      .select(col("event_type"), col("n"), col("mu"), col("sd"))
    daily.join(broadcast(mom), "event_type")
      .withColumn("z", expr("(yc - mu) / sd"))
      .withColumn("rn", row_number().over(Window
        .partitionBy(col("event_type")).orderBy(col("yc"), col("day"))))
      .withColumn("phi", expr(phiSql("z")))
      .groupBy(col("event_type"))
      .agg(first(col("n")).as("n_days"),
        max(expr("cast(rn as double) / n - phi")).as("d_plus"),
        max(expr("phi - cast(rn - 1 as double) / n")).as("d_minus"))
      .withColumn("d6", r6(greatest(col("d_plus"), col("d_minus"))))
      .withColumn("crit6", r6(expr(
        "cast(0.886 as double) / sqrt(cast(n_days as double))")))
      .select(col("event_type"), col("n_days"),
        r6(col("d_plus")).as("d_plus"), r6(col("d_minus")).as("d_minus"),
        col("d6").as("d_stat"), col("crit6").as("crit_05"),
        (col("d6") > col("crit6")).as("normal_rejected"))
      .orderBy("event_type")
  }

  // ── paired sign test per event type: did week-over-week daily revenue
  // SHIFT, asking only the sign of each (day, day+7) difference — the
  // assumption-free floor under stats_wilcoxon_signed (which adds rank
  // magnitudes) and forecast-drift monitors: valid under any
  // distribution, immune to outliers. Pairs come from the calendar
  // self-join (gap days drop from both engines identically), zero
  // differences are discarded per the classical test, counts are exact
  // int64, and the normal-approximation z = (2S − n)/√n and its
  // two-sided p through the shared token-identical Φ polynomial are
  // single double expressions; the verdict compares the 6-dp p. ──
  def statsSignTest(spark: SparkSession, dir: String): DataFrame = {
    val daily = ev(spark, dir).groupBy(col("event_type"), col("day"))
      .agg((sum(col("value").cast("decimal(18,2)")) * 100).cast("long")
        .as("revc"))
    daily.select(col("event_type"), col("day").as("d1"),
        col("revc").as("r1"))
      .join(daily.select(col("event_type"), col("day").as("d2"),
        col("revc").as("r2")),
        Seq("event_type"))
      .filter(col("d2") === date_add(col("d1"), 7))
      .select(col("event_type"), (col("r2") - col("r1")).as("diff"))
      .filter(col("diff") =!= 0L)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("diff") > 0, 1L).otherwise(0L)).as("n_plus"))
      .withColumn("z", expr(
        "cast(2 * n_plus - n_pairs as double)" +
          " / sqrt(cast(n_pairs as double))"))
      .withColumn("az", abs(col("z")))
      .withColumn("p2", r6(expr(s"2.0 * (1.0 - ${phiSql("az")})")))
      .select(col("event_type"), col("n_pairs"), col("n_plus"),
        (col("n_pairs") - col("n_plus")).as("n_minus"),
        r6(col("z")).as("z"), col("p2").as("p_two"),
        (col("z") > 0).as("shift_up"),
        (col("p2") < lit(0.05d)).as("significant"))
      .orderBy("event_type")
  }

  /** Shared frame of the estimated-parameter normality tests
    * ([[statsAndersonDarling]], [[statsCvm]]): per-type daily revenue in
    * exact cents, z from int64 cents moments, Φ via the token-identical
    * [[phiSql]] polynomial, ECDF rank over the (revc, day) total order.
    * Identical to [[statsLilliefors]]'s frame so the three tests are
    * directly comparable per type. */
  private def normalityFrame(spark: SparkSession, dir: String): DataFrame = {
    val daily = ev(spark, dir).groupBy(col("event_type"), col("day"))
      .agg((sum(col("value").cast("decimal(18,2)")) * 100).cast("long")
        .as("yc"))
    val mom = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("yc")).as("s1"),
        sum(expr("CAST(yc AS DECIMAL(28,0)) * yc")).as("s2"))
      .withColumn("mu", expr("cast(s1 as double) / n"))
      .withColumn("sd", expr(
        "sqrt(cast(n * s2 - CAST(s1 AS DECIMAL(28,0)) * s1 as double)" +
          " / (cast(n as double) * (n - 1)))"))
      .select(col("event_type"), col("n"), col("mu"), col("sd"))
    daily.join(broadcast(mom), "event_type")
      .withColumn("z", expr("(yc - mu) / sd"))
      .withColumn("rn", row_number().over(Window
        .partitionBy(col("event_type")).orderBy(col("yc"), col("day"))))
      // clamped off the exact {0,1} saturation points of the A–S
      // polynomial (|z| ≳ 8.5): one extreme-outlier day would otherwise
      // make AD's ln(phi)/ln(1−phi) a -Inf/NaN in BOTH engines — and
      // non-finite doubles serialize differently across them, breaking
      // the bit-exact gate. Identity everywhere else (the clamp binds
      // only within 1e-15 of the endpoints; outputs snap at 6-9 dp).
      .withColumn("phi", expr(
        s"greatest(least(${phiSql("z")}, 1.0 - 1e-15), 1e-15)"))
  }

  // ── Anderson–Darling normality test per event type: the tail-weighted
  // companion of stats_lilliefors — AD integrates the squared ECDF−Φ gap
  // with weight 1/(Φ(1−Φ)), so it catches heavy/light TAILS that the
  // sup-norm D statistic (which peaks mid-distribution) misses. The
  // order-statistic form A² = −n − (1/n)Σ[(2i−1)lnΦᵢ + (2(n−i)+1)
  // ln(1−Φᵢ)] needs only each row's own rank, so it is ONE keyed
  // aggregation over the shared frame — no reverse-index self-join. Each
  // ln term is snapped to 9 dp and summed as an exact DECIMAL (double
  // addition isn't associative; the snap makes the sum order-free), Φ is
  // the shared token-identical polynomial, and the verdict compares the
  // 6-dp A*² against the 0.752 case-3 (estimated params) 5% point. ──
  def statsAndersonDarling(spark: SparkSession, dir: String): DataFrame =
    normalityFrame(spark, dir)
      .withColumn("term", expr(
        "CAST(round((2 * rn - 1) * ln(phi)" +
          " + (2 * (n - rn) + 1) * ln(1.0 - phi), 9) AS DECIMAL(28,9))"))
      .groupBy(col("event_type"))
      .agg(first(col("n")).as("n_days"), sum(col("term")).as("tsum"))
      .withColumn("a2", expr(
        "-cast(n_days as double) - cast(tsum as double) / n_days"))
      .withColumn("a2s", r6(expr(
        "a2 * (1.0 + 0.75 / n_days" +
          " + 2.25 / (cast(n_days as double) * n_days))")))
      .select(col("event_type"), col("n_days"), r6(col("a2")).as("a2"),
        col("a2s").as("a2_star"),
        expr("CAST(0.752 AS DOUBLE)").as("crit_05"),
        (col("a2s") > expr("CAST(0.752 AS DOUBLE)")).as("normal_rejected"))
      .orderBy("event_type")

  // ── Cramér–von Mises normality test per event type: the L²-norm
  // member of the EDF-test triple (Lilliefors = sup norm, AD = tail-
  // weighted L²) — W² = 1/(12n) + Σ(Φᵢ − (2i−1)/(2n))² weighs the WHOLE
  // curve equally, the middle ground a distribution-drift monitor
  // usually wants. Same shared frame and discipline: each squared gap is
  // a product of engine-identical doubles snapped to 9 dp, summed as
  // exact DECIMAL, and the verdict compares the 6-dp size-adjusted
  // W²(1 + 0.5/n) against the 0.126 estimated-params 5% point. ──
  def statsCvm(spark: SparkSession, dir: String): DataFrame =
    normalityFrame(spark, dir)
      .withColumn("term", expr(
        "CAST(round((phi - (2 * rn - 1) / (2.0 * n))" +
          " * (phi - (2 * rn - 1) / (2.0 * n)), 9) AS DECIMAL(28,9))"))
      .groupBy(col("event_type"))
      .agg(first(col("n")).as("n_days"), sum(col("term")).as("tsum"))
      .withColumn("w2", expr(
        "1.0 / (12.0 * n_days) + cast(tsum as double)"))
      .withColumn("w2s", r6(expr("w2 * (1.0 + 0.5 / n_days)")))
      .select(col("event_type"), col("n_days"), r6(col("w2")).as("w2"),
        col("w2s").as("w2_star"),
        expr("CAST(0.126 AS DOUBLE)").as("crit_05"),
        (col("w2s") > expr("CAST(0.126 AS DOUBLE)")).as("normal_rejected"))
      .orderBy("event_type")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stats_anderson_darling" -> statsAndersonDarling _,
    "stats_cvm"             -> statsCvm _,
    "stats_pacf"            -> statsPacf _,
    "dist_palma"            -> distPalma _,
    "dist_quintile_shares"  -> distQuintileShares _,
    "stats_sign_test"       -> statsSignTest _,
    "window_williams_r"     -> windowWilliamsR _,
    "window_mfi"            -> windowMfi _,
    "forecast_drift"        -> forecastDrift _,
    "forecast_sba"          -> forecastSba _,
    "stats_mantel_haenszel" -> statsMantelHaenszel _,
    "stats_woolf"           -> statsWoolf _,
    "window_keltner"        -> windowKeltner _,
    "window_heikin_ashi"    -> windowHeikinAshi _,
    "stats_brunner_munzel"  -> statsBrunnerMunzel _,
    "stats_median_ci"       -> statsMedianCi _,
    "stats_stl_strength"    -> statsStlStrength _,
    "window_pivot_points"   -> windowPivotPoints _,
    "stats_poisson_rate"    -> statsPoissonRate _,
    "stats_mood_scale"      -> statsMoodScale _,
    "stats_quade"           -> statsQuade _,
    "stats_nemenyi"         -> statsNemenyi _,
    "window_ichimoku"       -> windowIchimoku _,
    "window_chandelier_exit" -> windowChandelierExit _,
    "forecast_ar2"          -> forecastAr2 _,
    "stats_lilliefors"      -> statsLilliefors _,
    "stats_rmst"            -> statsRmst _,
    "stats_life_table"      -> statsLifeTable _,
    "stats_kendall_w"       -> statsKendallW _,
    "stats_theil_u"         -> statsTheilU _,
    "stats_ordinal_assoc"   -> statsOrdinalAssoc _,
    "window_cci"            -> windowCci _,
    "window_donchian"       -> windowDonchian _,
    "stats_cusum_chart"     -> statsCusumChart _,
    "stats_page_hinkley"    -> statsPageHinkley _,
    "stats_trimmed_mean"    -> statsTrimmedMean _,
    "stats_iqr_fences"      -> statsIqrFences _,
    "stats_cpk"             -> statsCpk _,
    "stats_xbar_chart"      -> statsXbarChart _,
    "privacy_dp_mean"       -> privacyDpMean _,
    "privacy_suppression"   -> privacySuppression _,
    "stats_hurst"           -> statsHurst _,
    "stats_sample_entropy"  -> statsSampleEntropy _,
    "stats_weibull_fit"     -> statsWeibullFit _,
    "stats_negbin_fit"      -> statsNegbinFit _,
    "stats_tost"            -> statsTost _,
    "ab_bayes_approx"       -> abBayesApprox _,
    "window_kama"           -> windowKama _,
    "dq_gap_scan"           -> dqGapScan _,
    "forecast_theta"        -> forecastTheta _,
    "forecast_damped"       -> forecastDamped _,
    "stats_welch_anova"     -> statsWelchAnova _,
    "stats_ansari_bradley"  -> statsAnsariBradley _,
    "window_obv"            -> windowObv _,
    "window_vwap"           -> windowVwap _,
    "stats_cliff_delta"     -> statsCliffDelta _,
    "stats_mood_median"     -> statsMoodMedian _,
    "window_atr"            -> windowAtr _,
    "window_aroon"          -> windowAroon _,
    "stats_bartlett"        -> statsBartlett _,
    "stats_wasserstein"     -> statsWasserstein _,
    "dist_theil"            -> distTheil _,
    "dist_atkinson"         -> distAtkinson _,
    "stats_mann_kendall"    -> statsMannKendall _,
    "stats_pettitt"         -> statsPettitt _,
    "stats_qq_normal"       -> statsQqNormal _,
    "stats_grubbs"          -> statsGrubbs _,
    "forecast_croston"      -> forecastCroston _,
    "stats_breusch_pagan"   -> statsBreuschPagan _,
    "window_macd"           -> windowMacd _,
    "stats_two_prop_ci"     -> statsTwoPropCi _,
    "sample_neyman_alloc"   -> sampleNeymanAlloc _,
    "window_ewma_timedecay" -> windowEwmaTimedecay _,
    "stats_nelson_aalen"    -> statsNelsonAalen _,
    "stats_overdispersion"  -> statsOverdispersion _,
    "stats_lincoln_petersen" -> statsLincolnPetersen _,
    "anomaly_pot"           -> anomalyPot _,
    "forecast_ses_grid"     -> forecastSesGrid _,
    "stats_prop_trend"      -> statsPropTrend _,
    "window_stochastic"     -> windowStochastic _,
    "privacy_dp_counts"     -> privacyDpCounts _,
    "stats_hill_tail"       -> statsHillTail _,
    "stats_cochran_q"       -> statsCochranQ _,
    "stats_page_trend"      -> statsPageTrend _,
    "stats_kaplan_meier"    -> statsKaplanMeier _,
    "stats_logrank"         -> statsLogrank _,
    "privacy_t_closeness"   -> privacyTCloseness _,
    "window_ulcer"          -> windowUlcer _,
    "stats_tukey"           -> statsTukey _,
    "dist_hhi"              -> distHhi _,
    "stats_mcnemar"         -> statsMcnemar _,
    "stats_circular"        -> statsCircular _,
    "privacy_l_diversity"   -> privacyLDiversity _,
    "hist_2d"               -> hist2d _,
    "stats_friedman"        -> statsFriedman _,
    "stats_influence"       -> statsInfluence _,
    "stats_ols_multi"       -> statsOlsMulti _,
    "stats_wilson_ci"       -> statsWilsonCi _,
    "stats_kruskal"         -> statsKruskal _,
    "dq_freshness"          -> dqFreshness _,
    "stats_mutual_info"     -> statsMutualInfo _,
    "dist_lorenz"           -> distLorenz _,
    "stats_granger"         -> statsGranger _,
    "dq_volume_anomaly"     -> dqVolumeAnomaly _,
    "window_growth"         -> windowGrowth _,
    "backlog_curve"         -> backlogCurve _,
    "stats_ecdf"            -> statsEcdf _,
    "sample_ess"            -> sampleEss _,
    "stats_cohens_d"        -> statsCohensD _,
    "stats_partial_corr"    -> statsPartialCorr _,
    "session_gap_hist"      -> sessionGapHist _,
    "stats_hodges_lehmann"  -> statsHodgesLehmann _,
    "forecast_mase"         -> forecastMase _,
    "stats_changepoint"     -> statsChangepoint _,
    "privacy_kanon"         -> privacyKanon _,
    "window_rsi"            -> windowRsi _,
    "hist_kde"              -> histKde _,
    "stats_qq"              -> statsQq _,
    "stats_jsd"             -> statsJsd _,
    "stats_ljung_box"       -> statsLjungBox _,
    "window_bollinger"      -> windowBollinger _,
    "stats_cramers_v"       -> statsCramersV _,
    "stats_levene"          -> statsLevene _,
    "stats_jarque_bera"     -> statsJarqueBera _,
    "stats_dw"              -> statsDw _,
    "stats_runs"            -> statsRuns _,
    "weighted_median"       -> weightedMedian _,
    "stats_moments"         -> statsMoments _,
    "anomaly_seasonal"      -> anomalySeasonal _,
    "forecast_holt"         -> forecastHolt _,
    "forecast_holt_winters" -> forecastHoltWinters _,
    "stats_theilsen"        -> statsTheilSen _,
    "rolling_corr"          -> rollingCorr _,
    "stats_benford"         -> statsBenford _,
    "window_drawdown"       -> windowDrawdown _,
    "stats_psi"             -> statsPsi _,
    "stats_gini"            -> statsGini _,
    "stats_acf"             -> statsAcf _,
    "stats_anova"           -> statsAnova _,
    "window_rolling_zscore" -> windowRollingZscore _,
    "stats_ttest"       -> statsTtest _,
    "stats_chi2"        -> statsChi2 _,
    "stats_corr_matrix" -> statsCorrMatrix _,
    "regr_trend"        -> regrTrend _,
    "group_entropy"     -> groupEntropy _,
    "hist_equidepth"    -> histEquidepth _,
    "window_ewma"       -> windowEwma _,
    "window_streaks"    -> windowStreaks _,
    "resample_interp"   -> resampleInterp _,
    "window_cusum"      -> windowCusum _,
    "stats_ks"          -> statsKs _,
    "seasonal_decompose" -> seasonalDecompose _,
    "stats_mannwhitney" -> statsMannWhitney _,
    "stats_bootstrap"   -> statsBootstrap _,
  )

  /** The stats_moments oracle, shared verbatim by stats_jarque_bera
    * (which derives JB from the rounded moments). */
  private val MomentsSql: String =
    """WITH b AS (
      |  SELECT event_type,
      |    CAST(CAST("value" AS DECIMAL(18,2)) * 100 AS BIGINT) AS iv
      |  FROM events),
      |s AS (
      |  SELECT event_type, count(*) AS n,
      |    sum(CAST(iv AS HUGEINT)) AS s1,
      |    sum(CAST(iv * iv AS HUGEINT)) AS s2,
      |    sum(CAST(iv * iv * iv AS HUGEINT)) AS s3,
      |    sum(CAST(iv * iv AS HUGEINT) * (iv * iv)) AS s4
      |  FROM b GROUP BY 1)
      |SELECT event_type, n,
      |  round(CAST(s1 AS DOUBLE) / n / 100, 6) + 0.0 AS mean,
      |  round(
      |    (CAST(s3 AS DOUBLE) / n
      |      - 3 * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)
      |      + 2 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
      |          * (CAST(s1 AS DOUBLE) / n))
      |    / ((CAST(s2 AS DOUBLE) / n
      |         - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
      |       * sqrt(CAST(s2 AS DOUBLE) / n
      |         - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))),
      |    6) + 0.0 AS skewness,
      |  round(
      |    (CAST(s4 AS DOUBLE) / n
      |      - 4 * (CAST(s1 AS DOUBLE) / n) * (CAST(s3 AS DOUBLE) / n)
      |      + 6 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
      |          * (CAST(s2 AS DOUBLE) / n)
      |      - 3 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
      |          * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
      |    / ((CAST(s2 AS DOUBLE) / n
      |         - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
      |       * (CAST(s2 AS DOUBLE) / n
      |         - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)))
      |    - 3, 6) + 0.0 AS kurtosis
      |FROM s ORDER BY event_type""".stripMargin

  /** Shared subject-level CTE block of the survival keys: one row per
    * user with (observed, t hours), censoring at the corpus horizon —
    * the SQL twin of [[survSubjects]]. */
  private val survCtes: String =
    """WITH mx AS (SELECT max(epoch_us(CAST(ts AS TIMESTAMP))) AS mxus
      |           FROM events),
      |subj AS (
      |  SELECT user_id, min(epoch_us(CAST(ts AS TIMESTAMP))) AS t0,
      |    min(CASE WHEN event_type = 'purchase' AND "value" >= 80
      |        THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS tp
      |  FROM events GROUP BY 1),
      |s AS (SELECT user_id,
      |        CAST(CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
      |          AS observed,
      |        (COALESCE(tp, mxus) - t0) // 3600000000 AS t
      |      FROM subj CROSS JOIN mx)""".stripMargin

  /** Duck-side EMA over a window-listed history `h` — identical element
    * order, weights and sequential summation as the Spark fold. */
  private def duckEma(h: String, d: String, a: String): String =
    s"""list_sum(list_transform(range(1, len($h) + 1),
       |    k -> $h[k] * pow($d, len($h) - k)))
       |/ ((1.0 - pow($d, CAST(len($h) AS DOUBLE))) / $a)""".stripMargin

  private val duckNormalDeciles: String = NormalDeciles
    .map { case (d, z) => s"($d, CAST($z AS DOUBLE))" }.mkString(", ")

  /** Shared daily-cents-per-type oracle CTE for the trend/changepoint
    * tests (mirrors the grouped frame in [[statsMannKendall]] /
    * [[statsPettitt]]). */
  private val duckDailyTyped: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
      |    CAST(CAST(ts AS TIMESTAMP) AS DATE) - DATE '1970-01-01'
      |      AS dayno,
      |    CAST(sum(CAST("value" AS DECIMAL(18,2))) * 100 AS BIGINT)
      |      AS revc
      |  FROM events GROUP BY 1, 2, 3),
      |""".stripMargin

  /** Shared oracle CTE block mirroring [[friedmanGrid]]: zero-filled
    * day×type grid with doubled within-day midranks. Ends at
    * `rk(day, event_type, revc, r2x)`, comma-terminated. */
  private val duckFriedmanGrid: String =
    """WITH rev AS (
      |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, event_type,
      |    CAST(sum(CAST("value" AS DECIMAL(18,2))) * 100 AS BIGINT)
      |      AS revc
      |  FROM events GROUP BY 1, 2),
      |grid AS (
      |  SELECT d.day, t.event_type, COALESCE(r.revc, 0) AS revc
      |  FROM (SELECT DISTINCT day FROM rev) d
      |  CROSS JOIN (SELECT DISTINCT event_type FROM rev) t
      |  LEFT JOIN rev r ON r.day = d.day AND r.event_type = t.event_type),
      |rk AS (SELECT day, event_type, revc,
      |    rank() OVER (PARTITION BY day ORDER BY revc) * 2
      |      + count(*) OVER (PARTITION BY day, revc) - 1 AS r2x
      |  FROM grid),
      |""".stripMargin

  /** Shared oracle CTE block mirroring [[strataTables]]: day-of-week
    * strata × hash-arm exposure × purchase outcome, exact int64 cells.
    * Ends at `tn(dow, a, b, c, d, n)`, comma-terminated. */
  private val duckStrataTables: String =
    """WITH s0 AS (SELECT
      |    ((user_id % 2147483648) * 2654435761) % 2147483648 % 2 AS arm,
      |    (CAST(CAST(ts AS TIMESTAMP) AS DATE) - DATE '1970-01-01') % 7
      |      AS dow,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS succ
      |  FROM events),
      |tbl AS (SELECT dow,
      |    CAST(sum(CASE WHEN arm = 1 THEN succ ELSE 0 END) AS BIGINT)
      |      AS a,
      |    CAST(sum(CASE WHEN arm = 1 THEN 1 - succ ELSE 0 END)
      |      AS BIGINT) AS b,
      |    CAST(sum(CASE WHEN arm = 0 THEN succ ELSE 0 END) AS BIGINT)
      |      AS c,
      |    CAST(sum(CASE WHEN arm = 0 THEN 1 - succ ELSE 0 END)
      |      AS BIGINT) AS d
      |  FROM s0 GROUP BY 1),
      |tn AS (SELECT *, a + b + c + d AS n FROM tbl),
      |""".stripMargin

  /** Shared oracle CTE block of the estimated-parameter normality tests
    * (appended to [[duckDailyTyped]]): mirrors [[normalityFrame]] — int64
    * cents moments → z → Φ via the token-identical polynomial, ECDF rank
    * over the (revc, day) total order. Ends at `pp(event_type, n, rn,
    * phi)`, comma-terminated for the test-specific CTEs to follow. */
  private lazy val duckNormalityFrame: String =
    s"""mo AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(revc) AS BIGINT) AS s1,
       |    sum(CAST(revc AS DECIMAL(28,0)) * revc) AS s2
       |  FROM daily GROUP BY 1),
       |mm AS (SELECT event_type, n, CAST(s1 AS DOUBLE) / n AS mu,
       |    sqrt(CAST(n * s2 - CAST(s1 AS DECIMAL(28,0)) * s1 AS DOUBLE)
       |      / (CAST(n AS DOUBLE) * (n - 1))) AS sd
       |  FROM mo),
       |zz AS (SELECT d.event_type, mm.n,
       |    (d.revc - mm.mu) / mm.sd AS z,
       |    CAST(row_number() OVER (PARTITION BY d.event_type
       |      ORDER BY d.revc, d.day) AS BIGINT) AS rn
       |  FROM daily d JOIN mm USING (event_type)),
       |pp AS (SELECT event_type, n, rn,
       |    greatest(least(${phiSql("z")}, 1.0 - 1e-15), 1e-15) AS phi
       |  FROM zz),
       |""".stripMargin

  /** Shared user-spend oracle CTE (mirrors [[userSpendPos]]). */
  private val duckUserSpendPos: String =
    """WITH spend AS (
      |  SELECT user_id,
      |    CAST(sum(CAST("value" AS DECIMAL(18,2))) * 100 AS BIGINT)
      |      AS xc
      |  FROM events GROUP BY 1 HAVING
      |    CAST(sum(CAST("value" AS DECIMAL(18,2))) * 100 AS BIGINT) > 0),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |          CAST(sum(xc) AS BIGINT) AS s,
      |          CAST(sum(xc) AS DOUBLE) / count(*) AS mu
      |        FROM spend),
      |""".stripMargin

  /** Standardized daily series + row numbers for the sequential drift
    * oracles (appended to the daily CTE, recursion-ready). */
  private val duckZSeries: String =
    """mo AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(revc) AS BIGINT) AS s1,
      |    sum(CAST(revc AS DECIMAL(28,0)) * revc) AS s2
      |  FROM daily GROUP BY 1),
      |mm AS (SELECT event_type, CAST(s1 AS DOUBLE) / n AS mu,
      |    sqrt(CAST(n * s2 - CAST(s1 AS DECIMAL(28,0)) * s1 AS DOUBLE)
      |      / (CAST(n AS DOUBLE) * (n - 1))) AS sd
      |  FROM mo),
      |zs AS (SELECT d.event_type,
      |    (d.revc - mm.mu) / mm.sd AS z,
      |    CAST(row_number() OVER (PARTITION BY d.event_type
      |      ORDER BY d.day) AS BIGINT) AS rn,
      |    CAST(count(*) OVER (PARTITION BY d.event_type) AS BIGINT)
      |      AS n
      |  FROM daily d JOIN mm USING (event_type)),
      |""".stripMargin

  val oracles: Map[String, String] = Map(
    "forecast_ar2" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    sum(CAST("value" AS DECIMAL(18,2))) AS v
        |  FROM events GROUP BY 1, 2),
        |lg AS (
        |  SELECT a.event_type, l.lag, a.v, b.v AS pv
        |  FROM daily a
        |  CROSS JOIN (SELECT unnest(range(1, 3)) AS lag) l
        |  JOIN daily b ON b.event_type = a.event_type
        |    AND b.day = a.day - CAST(l.lag AS INTEGER)),
        |m AS (
        |  SELECT event_type, lag, count(*) AS n,
        |    CAST(sum(CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(pv AS DECIMAL(18,2))) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(v AS DECIMAL(18,2)) * CAST(pv AS DECIMAL(18,2)))
        |      AS DOUBLE) AS sxy,
        |    CAST(sum(CAST(v AS DECIMAL(18,2)) * CAST(v AS DECIMAL(18,2)))
        |      AS DOUBLE) AS sxx,
        |    CAST(sum(CAST(pv AS DECIMAL(18,2)) * CAST(pv AS DECIMAL(18,2)))
        |      AS DOUBLE) AS syy
        |  FROM lg GROUP BY 1, 2),
        |rk AS (SELECT event_type, lag,
        |    round((CAST(n AS DOUBLE) * sxy - sx * sy) /
        |      sqrt((CAST(n AS DOUBLE) * sxx - sx * sx) *
        |           (CAST(n AS DOUBLE) * syy - sy * sy)), 6) + 0.0 AS r
        |  FROM m),
        |rr AS (SELECT event_type,
        |    max(CASE WHEN lag = 1 THEN r END) AS r1,
        |    max(CASE WHEN lag = 2 THEN r END) AS r2
        |  FROM rk GROUP BY 1),
        |lx AS (SELECT event_type, v,
        |    row_number() OVER (PARTITION BY event_type ORDER BY day)
        |      AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS m
        |  FROM daily),
        |lastv AS (SELECT event_type, CAST(any_value(m) AS BIGINT)
        |      AS n_days,
        |    CAST(sum(CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS sv,
        |    CAST(max(CASE WHEN rn = m THEN v END) AS DOUBLE) AS x_last,
        |    CAST(max(CASE WHEN rn = m - 1 THEN v END) AS DOUBLE)
        |      AS x_prev
        |  FROM lx GROUP BY 1),
        |f AS (SELECT rr.event_type, n_days, r1, r2,
        |    sv / n_days AS mu,
        |    r1 * (1.0 - r2) / (1.0 - r1 * r1) AS phi1,
        |    (r2 - r1 * r1) / (1.0 - r1 * r1) AS phi2,
        |    x_last, x_prev
        |  FROM rr JOIN lastv ON rr.event_type = lastv.event_type)
        |SELECT event_type, n_days, r1, r2,
        |  round(phi1, 6) + 0.0 AS phi1, round(phi2, 6) + 0.0 AS phi2,
        |  round(mu, 6) + 0.0 AS mean_rev,
        |  round(mu + phi1 * (x_last - mu) + phi2 * (x_prev - mu), 6)
        |    + 0.0 AS forecast_next,
        |  (abs(round(phi2, 6) + 0.0) < 1.0
        |   AND (round(phi1, 6) + 0.0) + (round(phi2, 6) + 0.0) < 1.0
        |   AND (round(phi2, 6) + 0.0) - (round(phi1, 6) + 0.0) < 1.0)
        |    AS stationary
        |FROM f ORDER BY event_type""".stripMargin,
    "stats_lilliefors" -> (duckDailyTyped +
      s"""mo AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(revc) AS BIGINT) AS s1,
         |    sum(CAST(revc AS DECIMAL(28,0)) * revc) AS s2
         |  FROM daily GROUP BY 1),
         |mm AS (SELECT event_type, n, CAST(s1 AS DOUBLE) / n AS mu,
         |    sqrt(CAST(n * s2 - CAST(s1 AS DECIMAL(28,0)) * s1 AS DOUBLE)
         |      / (CAST(n AS DOUBLE) * (n - 1))) AS sd
         |  FROM mo),
         |zz AS (SELECT d.event_type, mm.n,
         |    (d.revc - mm.mu) / mm.sd AS z,
         |    CAST(row_number() OVER (PARTITION BY d.event_type
         |      ORDER BY d.revc, d.day) AS BIGINT) AS rn
         |  FROM daily d JOIN mm USING (event_type)),
         |pp AS (SELECT event_type, n, rn, ${phiSql("z")} AS phi FROM zz),
         |ag AS (SELECT event_type, CAST(any_value(n) AS BIGINT) AS n_days,
         |    max(CAST(rn AS DOUBLE) / n - phi) AS d_plus,
         |    max(phi - CAST(rn - 1 AS DOUBLE) / n) AS d_minus
         |  FROM pp GROUP BY 1)
         |SELECT event_type, n_days,
         |  round(d_plus, 6) + 0.0 AS d_plus,
         |  round(d_minus, 6) + 0.0 AS d_minus,
         |  round(greatest(d_plus, d_minus), 6) + 0.0 AS d_stat,
         |  round(CAST(0.886 AS DOUBLE) / sqrt(CAST(n_days AS DOUBLE)), 6)
         |    + 0.0 AS crit_05,
         |  (round(greatest(d_plus, d_minus), 6) + 0.0) >
         |    (round(CAST(0.886 AS DOUBLE) / sqrt(CAST(n_days AS DOUBLE)),
         |      6) + 0.0) AS normal_rejected
         |FROM ag ORDER BY event_type""".stripMargin),
    "stats_anderson_darling" -> (duckDailyTyped + duckNormalityFrame +
      s"""tt AS (SELECT event_type, n,
         |    CAST(round((2 * rn - 1) * ln(phi)
         |      + (2 * (n - rn) + 1) * ln(1.0 - phi), 9) AS DECIMAL(28,9))
         |      AS term
         |  FROM pp),
         |ag AS (SELECT event_type, CAST(any_value(n) AS BIGINT) AS n_days,
         |    sum(term) AS tsum
         |  FROM tt GROUP BY 1),
         |f AS (SELECT event_type, n_days,
         |    -CAST(n_days AS DOUBLE) - CAST(tsum AS DOUBLE) / n_days AS a2
         |  FROM ag)
         |SELECT event_type, n_days, round(a2, 6) + 0.0 AS a2,
         |  round(a2 * (1.0 + 0.75 / n_days
         |    + 2.25 / (CAST(n_days AS DOUBLE) * n_days)), 6) + 0.0
         |    AS a2_star,
         |  CAST(0.752 AS DOUBLE) AS crit_05,
         |  (round(a2 * (1.0 + 0.75 / n_days
         |    + 2.25 / (CAST(n_days AS DOUBLE) * n_days)), 6) + 0.0)
         |    > CAST(0.752 AS DOUBLE) AS normal_rejected
         |FROM f ORDER BY event_type""".stripMargin),
    "stats_cvm" -> (duckDailyTyped + duckNormalityFrame +
      s"""tt AS (SELECT event_type, n,
         |    CAST(round((phi - (2 * rn - 1) / (2.0 * n))
         |      * (phi - (2 * rn - 1) / (2.0 * n)), 9) AS DECIMAL(28,9))
         |      AS term
         |  FROM pp),
         |ag AS (SELECT event_type, CAST(any_value(n) AS BIGINT) AS n_days,
         |    sum(term) AS tsum
         |  FROM tt GROUP BY 1),
         |f AS (SELECT event_type, n_days,
         |    1.0 / (12.0 * n_days) + CAST(tsum AS DOUBLE) AS w2
         |  FROM ag)
         |SELECT event_type, n_days, round(w2, 6) + 0.0 AS w2,
         |  round(w2 * (1.0 + 0.5 / n_days), 6) + 0.0 AS w2_star,
         |  CAST(0.126 AS DOUBLE) AS crit_05,
         |  (round(w2 * (1.0 + 0.5 / n_days), 6) + 0.0)
         |    > CAST(0.126 AS DOUBLE) AS normal_rejected
         |FROM f ORDER BY event_type""".stripMargin),
    "stats_brunner_munzel" -> {
      val pw = phiSql("aw")
      s"""WITH g AS (
         |  SELECT "value" AS v,
         |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS a,
         |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
         |      END) AS BIGINT) AS b
         |  FROM events WHERE event_type IN ('click', 'purchase')
         |  GROUP BY 1),
         |gt AS (SELECT *, a + b AS t FROM g),
         |r AS (SELECT *,
         |    COALESCE(sum(t) OVER wb, 0) AS f,
         |    COALESCE(sum(a) OVER wb, 0) AS fa,
         |    COALESCE(sum(b) OVER wb, 0) AS fb
         |  FROM gt
         |  WINDOW wb AS (ORDER BY v
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
         |rr AS (SELECT *, 2 * f + t + 1 AS dd,
         |    2 * f + t + 1 - (2 * fa + a + 1) AS ua,
         |    2 * f + t + 1 - (2 * fb + b + 1) AS ub
         |  FROM r),
         |m AS (SELECT CAST(sum(a) AS BIGINT) AS n1,
         |    CAST(sum(b) AS BIGINT) AS n2,
         |    sum(CAST(a AS HUGEINT) * dd) AS ad,
         |    sum(CAST(b AS HUGEINT) * dd) AS bd,
         |    sum(CAST(a AS HUGEINT) * ua) AS au1,
         |    sum(CAST(a AS HUGEINT) * ua * ua) AS au2,
         |    sum(CAST(b AS HUGEINT) * ub) AS bu1,
         |    sum(CAST(b AS HUGEINT) * ub * ub) AS bu2
         |  FROM rr),
         |d1 AS (SELECT *,
         |    CAST(ad AS DOUBLE) / (2 * n1) AS rbar1,
         |    CAST(bd AS DOUBLE) / (2 * n2) AS rbar2,
         |    CAST(ad AS DOUBLE) / n1 - (n1 + 1) AS ma,
         |    CAST(bd AS DOUBLE) / n2 - (n2 + 1) AS mb
         |  FROM m),
         |d2 AS (SELECT *,
         |    (CAST(au2 AS DOUBLE) - 2 * ma * CAST(au1 AS DOUBLE)
         |      + n1 * ma * ma) / (4 * (CAST(n1 AS DOUBLE) - 1)) AS s1,
         |    (CAST(bu2 AS DOUBLE) - 2 * mb * CAST(bu1 AS DOUBLE)
         |      + n2 * mb * mb) / (4 * (CAST(n2 AS DOUBLE) - 1)) AS s2
         |  FROM d1),
         |d3 AS (SELECT *,
         |    CAST(n1 AS DOUBLE) * n2 * (rbar2 - rbar1) / (n1 + n2)
         |      / sqrt(n1 * s1 + n2 * s2) AS w
         |  FROM d2),
         |d4 AS (SELECT *, abs(w) AS aw FROM d3),
         |d5 AS (SELECT *, round(2.0 * (1.0 - $pw), 6) + 0.0 AS p2
         |  FROM d4)
         |SELECT n1, n2,
         |  round((rbar2 - (n2 + 1) / 2.0) / n1, 6) + 0.0 AS p_hat,
         |  round(w, 6) + 0.0 AS w_stat,
         |  round((n1 * s1 + n2 * s2) * (n1 * s1 + n2 * s2)
         |    / ((n1 * s1) * (n1 * s1) / (CAST(n1 AS DOUBLE) - 1)
         |    + (n2 * s2) * (n2 * s2) / (CAST(n2 AS DOUBLE) - 1)), 6)
         |    + 0.0 AS df,
         |  p2 AS p_two, p2 < 0.05 AS significant
         |FROM d5""".stripMargin
    },
    "stats_quade" -> (duckFriedmanGrid +
      """rng AS (SELECT day,
        |    CAST(max(revc) - min(revc) AS BIGINT) AS rng
        |  FROM rk GROUP BY 1),
        |q2 AS (SELECT day,
        |    rank() OVER (ORDER BY rng) * 2
        |      + count(*) OVER (PARTITION BY rng) - 1 AS q2
        |  FROM rng),
        |cells AS (SELECT rk.event_type,
        |    CAST(count(*) OVER (PARTITION BY rk.day) AS BIGINT) AS k,
        |    q2.q2 * (rk.r2x - (count(*) OVER (PARTITION BY rk.day) + 1))
        |      AS s4
        |  FROM rk JOIN q2 ON q2.day = rk.day),
        |pt AS (SELECT event_type, CAST(sum(s4) AS BIGINT) AS t4,
        |    CAST(count(*) AS BIGINT) AS b,
        |    CAST(any_value(k) AS BIGINT) AS k
        |  FROM cells GROUP BY 1),
        |a16 AS (SELECT sum(CAST(s4 AS HUGEINT) * s4) AS a16 FROM cells),
        |f AS (SELECT CAST(any_value(k) AS BIGINT) AS k,
        |    CAST(any_value(b) AS BIGINT) AS n_blocks,
        |    sum(CAST(t4 AS HUGEINT) * t4) AS b16n
        |  FROM pt),
        |g AS (SELECT f.*, a16.a16,
        |      CAST(b16n AS DOUBLE) / n_blocks AS bb
        |      FROM f, a16)
        |SELECT n_blocks, k,
        |  round(CAST(a16 AS DOUBLE) / 16, 6) + 0.0 AS a_stat,
        |  round(bb / 16, 6) + 0.0 AS b_stat,
        |  round((CAST(n_blocks AS DOUBLE) - 1) * bb
        |    / (CAST(a16 AS DOUBLE) - bb), 6) + 0.0 AS f_stat,
        |  k - 1 AS df1, (n_blocks - 1) * (k - 1) AS df2
        |FROM g""".stripMargin),
    "stats_nemenyi" -> (duckFriedmanGrid +
      s"""s AS (SELECT event_type, CAST(sum(r2x) AS BIGINT) AS s2,
         |    CAST(count(*) AS BIGINT) AS n
         |  FROM rk GROUP BY 1),
         |kk AS (SELECT CAST(count(*) AS BIGINT) AS k FROM s),
         |wk AS (SELECT s.*, kk.k,
         |    CAST(s2 AS DOUBLE) / (2 * n) AS rbar
         |  FROM s, kk),
         |p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
         |    a.n AS n_blocks, a.k AS k, a.rbar AS rbar_a,
         |    b.rbar AS rbar_b
         |  FROM wk a JOIN wk b ON a.event_type < b.event_type),
         |d AS (SELECT *,
         |    round(abs(rbar_a - rbar_b), 6) + 0.0 AS diff6,
         |    round((CASE k ${NemenyiQ.toSeq.sortBy(_._1)
              .map { case (kk2, q) => s"WHEN $kk2 THEN $q" }
              .mkString(" ")} END)
         |      * sqrt(CAST(k AS DOUBLE) * (k + 1) / (6.0 * n_blocks)),
         |      6) + 0.0 AS cd6
         |  FROM p)
         |SELECT type_a, type_b,
         |  round(rbar_a, 6) + 0.0 AS mean_rank_a,
         |  round(rbar_b, 6) + 0.0 AS mean_rank_b,
         |  diff6 AS rank_diff, cd6 AS critical_dist,
         |  diff6 > cd6 AS significant
         |FROM d ORDER BY type_a, type_b""".stripMargin),
    "stats_mood_scale" -> {
      val pz = phiSql("az")
      s"""WITH g AS (
         |  SELECT "value" AS v,
         |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS a,
         |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
         |      END) AS BIGINT) AS b
         |  FROM events WHERE event_type IN ('click', 'purchase')
         |  GROUP BY 1),
         |gt AS (SELECT *, a + b AS t FROM g),
         |r AS (SELECT *,
         |    CAST(COALESCE(sum(t) OVER (ORDER BY v
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS f
         |  FROM gt),
         |rr AS (SELECT *, 2 * f + t + 1 AS dd FROM r),
         |nn0 AS (SELECT CAST(sum(a + b) AS BIGINT) AS nn FROM g),
         |m AS (SELECT CAST(any_value(nn) AS BIGINT) AS nn,
         |    CAST(sum(a) AS BIGINT) AS n1,
         |    sum(CAST(a AS HUGEINT)
         |      * (dd - (nn + 1)) * (dd - (nn + 1))) AS t4
         |  FROM rr, nn0),
         |n2t AS (SELECT CAST(sum(b) AS BIGINT) AS n2 FROM g),
         |d1 AS (SELECT m.*, n2t.n2,
         |    CAST(n1 AS DOUBLE) * (CAST(nn AS DOUBLE) * nn - 1) / 3
         |      AS e4,
         |    4.0 * (CAST(n1 AS DOUBLE) * n2 * (nn + 1)
         |      * (CAST(nn AS DOUBLE) * nn - 4)) / 45 AS v4
         |  FROM m, n2t),
         |d2 AS (SELECT *, (CAST(t4 AS DOUBLE) - e4) / sqrt(v4) AS z
         |  FROM d1),
         |d3 AS (SELECT *, abs(z) AS az FROM d2),
         |d4 AS (SELECT *, round(2.0 * (1.0 - $pz), 6) + 0.0 AS p2
         |  FROM d3)
         |SELECT n1, n2,
         |  round(CAST(t4 AS DOUBLE) / 4, 6) + 0.0 AS t_stat,
         |  round(e4 / 4, 6) + 0.0 AS t_expected,
         |  round(z, 6) + 0.0 AS z, p2 AS p_two, p2 < 0.05 AS significant
         |FROM d4""".stripMargin
    },
    "stats_poisson_rate" -> {
      val pz = phiSql("az")
      s"""WITH g AS (SELECT
         |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n1,
         |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
         |      END) AS BIGINT) AS n2,
         |    CAST(count(DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE))
         |      AS BIGINT) AS n_days
         |  FROM events
         |  WHERE event_type IN ('click', 'purchase')),
         |z AS (SELECT *,
         |    CAST(n1 - n2 AS DOUBLE) / sqrt(CAST(n1 + n2 AS DOUBLE))
         |      AS z,
         |    ln(CAST(n1 AS DOUBLE) / CAST(n2 AS DOUBLE)) AS lnrr,
         |    sqrt(1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n2 AS DOUBLE))
         |      AS se
         |  FROM g),
         |za AS (SELECT *, abs(z) AS az FROM z),
         |pp AS (SELECT *, round(2.0 * (1.0 - $pz), 6) + 0.0 AS p2
         |       FROM za)
         |SELECT n1, n2, n_days,
         |  round(CAST(n1 AS DOUBLE) / n_days, 6) + 0.0 AS rate_1,
         |  round(CAST(n2 AS DOUBLE) / n_days, 6) + 0.0 AS rate_2,
         |  round(CAST(n1 AS DOUBLE) / CAST(n2 AS DOUBLE), 6) + 0.0
         |    AS rate_ratio,
         |  round(z, 6) + 0.0 AS z, p2 AS p_two,
         |  round(exp(lnrr - 1.959964 * se), 6) + 0.0 AS rr_ci_lo,
         |  round(exp(lnrr + 1.959964 * se), 6) + 0.0 AS rr_ci_hi,
         |  p2 < 0.05 AS significant
         |FROM pp""".stripMargin
    },
    "stats_median_ci" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    CAST(sum(CAST("value" AS DECIMAL(18,2))) * 100 AS BIGINT)
        |      AS revc
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT *,
        |    CAST(row_number() OVER (PARTITION BY event_type
        |      ORDER BY revc, day) AS BIGINT) AS rn,
        |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
        |  FROM daily),
        |l AS (SELECT *,
        |    greatest(CAST(1 AS BIGINT), CAST(floor((CAST(n AS DOUBLE)
        |      - 1.959964 * sqrt(CAST(n AS DOUBLE))) / 2) AS BIGINT))
        |      AS lo_rank
        |  FROM r),
        |g AS (SELECT event_type, CAST(any_value(n) AS BIGINT) AS n_days,
        |    CAST(any_value(lo_rank) AS BIGINT) AS rank_lo,
        |    CAST(any_value(n) + 1 - any_value(lo_rank) AS BIGINT)
        |      AS rank_hi,
        |    avg(CASE WHEN rn = (n + 1) // 2 OR rn = (n + 2) // 2
        |        THEN revc END) AS medc,
        |    max(CASE WHEN rn = lo_rank THEN revc END) AS loc,
        |    max(CASE WHEN rn = n + 1 - lo_rank THEN revc END) AS hic
        |  FROM l GROUP BY 1)
        |SELECT event_type, n_days, round(medc / 100, 6) + 0.0 AS median,
        |  rank_lo, rank_hi,
        |  round(CAST(loc AS DOUBLE) / 100, 6) + 0.0 AS ci_lo,
        |  round(CAST(hic AS DOUBLE) / 100, 6) + 0.0 AS ci_hi
        |FROM g ORDER BY event_type""".stripMargin,
    "stats_mantel_haenszel" -> (duckStrataTables +
      """t AS (SELECT
        |    CAST(round(CAST(a AS DOUBLE) * d / n, 9) AS DECIMAL(28,9))
        |      AS adn,
        |    CAST(round(CAST(b AS DOUBLE) * c / n, 9) AS DECIMAL(28,9))
        |      AS bcn,
        |    CAST(round(CAST(a + b AS DOUBLE) * (a + c) / n, 9)
        |      AS DECIMAL(28,9)) AS ea,
        |    CAST(round(CAST(a + b AS DOUBLE) * (c + d) * (a + c)
        |      * (b + d) / (CAST(n AS DOUBLE) * n * (n - 1)), 9)
        |      AS DECIMAL(28,9)) AS va,
        |    a
        |  FROM tn),
        |g AS (SELECT CAST(count(*) AS BIGINT) AS k_strata,
        |    CAST(sum(a) AS BIGINT) AS sa, sum(adn) AS num,
        |    sum(bcn) AS den, sum(ea) AS sea, sum(va) AS sva
        |  FROM t),
        |f AS (SELECT *,
        |    round((CAST(sa AS DOUBLE) - CAST(sea AS DOUBLE))
        |      * (CAST(sa AS DOUBLE) - CAST(sea AS DOUBLE))
        |      / CAST(sva AS DOUBLE), 6) + 0.0 AS chi2r
        |  FROM g)
        |SELECT k_strata, sa AS exposed_successes,
        |  round(CAST(sea AS DOUBLE), 6) + 0.0 AS expected,
        |  round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) + 0.0
        |    AS or_mh,
        |  chi2r AS chi2_cmh, chi2r > 3.841 AS significant
        |FROM f""".stripMargin),
    "stats_woolf" -> (duckStrataTables +
      """per AS (SELECT dow,
        |    CAST(round(ln(((CAST(a AS DOUBLE) + 0.5)
        |      * (CAST(d AS DOUBLE) + 0.5))
        |      / ((CAST(b AS DOUBLE) + 0.5)
        |      * (CAST(c AS DOUBLE) + 0.5))), 9) AS DECIMAL(18,9))
        |      AS lnor,
        |    CAST(round(1.0 / (1.0 / (CAST(a AS DOUBLE) + 0.5)
        |      + 1.0 / (CAST(b AS DOUBLE) + 0.5)
        |      + 1.0 / (CAST(c AS DOUBLE) + 0.5)
        |      + 1.0 / (CAST(d AS DOUBLE) + 0.5)), 9) AS DECIMAL(18,9))
        |      AS w
        |  FROM tn),
        |po AS (SELECT CAST(count(*) AS BIGINT) AS k_strata,
        |    sum(w) AS sw,
        |    sum(CAST(round(CAST(w AS DOUBLE) * CAST(lnor AS DOUBLE), 9)
        |        AS DECIMAL(28,9))) AS swl
        |  FROM per),
        |pl AS (SELECT *, CAST(swl AS DOUBLE) / CAST(sw AS DOUBLE)
        |    AS pooled FROM po),
        |x AS (SELECT pl.k_strata, pl.pooled,
        |    CAST(round(CAST(w AS DOUBLE)
        |      * (CAST(lnor AS DOUBLE) - pooled)
        |      * (CAST(lnor AS DOUBLE) - pooled), 9) AS DECIMAL(28,9))
        |      AS x2t
        |  FROM per, pl),
        |g AS (SELECT k_strata, pooled, sum(x2t) AS x2s
        |      FROM x GROUP BY 1, 2),
        |f AS (SELECT *, round(CAST(x2s AS DOUBLE), 6) + 0.0 AS x2r
        |      FROM g)
        |SELECT k_strata, round(pooled, 6) + 0.0 AS ln_or_pooled,
        |  round(exp(pooled), 6) + 0.0 AS or_pooled,
        |  x2r AS x2_homogeneity, k_strata - 1 AS df,
        |  x2r <= 12.592 AS homogeneous
        |FROM f""".stripMargin),
    "stats_sign_test" -> {
      val pz = phiSql("az")
      s"""WITH daily AS (
         |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
         |    CAST(sum(CAST("value" AS DECIMAL(18,2))) * 100 AS BIGINT)
         |      AS revc
         |  FROM events GROUP BY 1, 2),
         |p AS (SELECT a.event_type, b.revc - a.revc AS diff
         |      FROM daily a JOIN daily b
         |        ON b.event_type = a.event_type
         |        AND b.day = a.day + 7
         |      WHERE b.revc - a.revc <> 0),
         |g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
         |        CAST(sum(CASE WHEN diff > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |          AS n_plus
         |      FROM p GROUP BY 1),
         |zt AS (SELECT *,
         |        CAST(2 * n_plus - n_pairs AS DOUBLE)
         |          / sqrt(CAST(n_pairs AS DOUBLE)) AS z
         |      FROM g),
         |za AS (SELECT *, abs(z) AS az FROM zt),
         |pp AS (SELECT *, round(2.0 * (1.0 - $pz), 6) + 0.0 AS p2
         |       FROM za)
         |SELECT event_type, n_pairs, n_plus, n_pairs - n_plus AS n_minus,
         |  round(z, 6) + 0.0 AS z, p2 AS p_two, z > 0 AS shift_up,
         |  p2 < 0.05 AS significant
         |FROM pp ORDER BY event_type""".stripMargin
    },
    "stats_pacf" ->
      """WITH daily AS (
        |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    CAST(sum(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS v
        |  FROM events GROUP BY 1),
        |lagged AS (
        |  SELECT l.lag, a.v, b.v AS pv
        |  FROM daily a
        |  CROSS JOIN (SELECT unnest(range(1, 4)) AS lag) l
        |  JOIN daily b ON b.day = a.day - CAST(l.lag AS INTEGER)),
        |m AS (
        |  SELECT lag, count(*) AS n,
        |    CAST(sum(CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(pv AS DECIMAL(18,2))) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(v AS DECIMAL(18,2)) * CAST(pv AS DECIMAL(18,2)))
        |      AS DOUBLE) AS sxy,
        |    CAST(sum(CAST(v AS DECIMAL(18,2)) * CAST(v AS DECIMAL(18,2)))
        |      AS DOUBLE) AS sxx,
        |    CAST(sum(CAST(pv AS DECIMAL(18,2)) * CAST(pv AS DECIMAL(18,2)))
        |      AS DOUBLE) AS syy
        |  FROM lagged GROUP BY 1),
        |rk AS (SELECT lag,
        |    round((CAST(n AS DOUBLE) * sxy - sx * sy) /
        |      sqrt((CAST(n AS DOUBLE) * sxx - sx * sx) *
        |           (CAST(n AS DOUBLE) * syy - sy * sy)), 6) + 0.0 AS r
        |  FROM m),
        |rr AS (SELECT
        |    max(CASE WHEN lag = 1 THEN r END) AS r1,
        |    max(CASE WHEN lag = 2 THEN r END) AS r2,
        |    max(CASE WHEN lag = 3 THEN r END) AS r3,
        |    (SELECT CAST(count(*) AS BIGINT) FROM daily) AS n_days
        |  FROM rk),
        |dl AS (SELECT *,
        |    (r2 - r1 * r1) / (1.0 - r1 * r1) AS phi22,
        |    round(2.0 / sqrt(CAST(n_days AS DOUBLE)), 6) + 0.0 AS band
        |  FROM rr),
        |dl2 AS (SELECT *, r1 - phi22 * r1 AS phi21 FROM dl),
        |dl3 AS (SELECT *,
        |    (r3 - phi21 * r2 - phi22 * r1)
        |      / (1.0 - phi21 * r1 - phi22 * r2) AS phi33
        |  FROM dl2),
        |rows3 AS (
        |  SELECT CAST(1 AS BIGINT) AS lag, n_days, r1 AS acf, r1 AS pacf,
        |    band FROM dl3
        |  UNION ALL
        |  SELECT CAST(2 AS BIGINT), n_days, r2,
        |    round(phi22, 6) + 0.0, band FROM dl3
        |  UNION ALL
        |  SELECT CAST(3 AS BIGINT), n_days, r3,
        |    round(phi33, 6) + 0.0, band FROM dl3)
        |SELECT lag, n_days, acf, pacf, band AS band_95,
        |  abs(pacf) > band AS significant
        |FROM rows3 ORDER BY lag""".stripMargin,
    "window_cci" -> (duckDailyTyped +
      """w AS (SELECT event_type, day, revc,
        |    row_number() OVER wt AS rn,
        |    CAST(sum(revc) OVER w20 AS BIGINT) AS s,
        |    list(revc) OVER w20 AS h
        |  FROM daily
        |  WINDOW wt AS (PARTITION BY event_type ORDER BY day),
        |    w20 AS (PARTITION BY event_type ORDER BY day
        |            ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)),
        |ag AS (SELECT *, CAST(list_sum(list_transform(h,
        |    x -> abs(20 * x - s))) AS BIGINT) AS dv
        |  FROM w WHERE rn >= 20)
        |SELECT event_type, day,
        |  round(CAST(revc AS DOUBLE) / 100, 6) + 0.0 AS close,
        |  round(CAST(s AS DOUBLE) / 2000, 6) + 0.0 AS sma20,
        |  round(CAST(dv AS DOUBLE) / 40000, 6) + 0.0 AS mean_dev,
        |  round(CASE WHEN dv > 0 THEN CAST(20 * revc - s AS DOUBLE)
        |    * 20000 / (15 * dv) END, 6) + 0.0 AS cci
        |FROM ag ORDER BY event_type, day""".stripMargin),
    "window_donchian" -> (duckDailyTyped +
      """w AS (SELECT event_type, day, revc,
        |    row_number() OVER wt AS rn,
        |    max(revc) OVER w20 AS up, min(revc) OVER w20 AS lo
        |  FROM daily
        |  WINDOW wt AS (PARTITION BY event_type ORDER BY day),
        |    w20 AS (PARTITION BY event_type ORDER BY day
        |            ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, day,
        |  round(CAST(revc AS DOUBLE) / 100, 6) + 0.0 AS close,
        |  round(CAST(up AS DOUBLE) / 100, 6) + 0.0 AS channel_hi,
        |  round(CAST(lo AS DOUBLE) / 100, 6) + 0.0 AS channel_lo,
        |  round(CAST(up - lo AS DOUBLE) / 100, 6) + 0.0 AS width,
        |  revc > up AS breakout_up, revc < lo AS breakout_dn
        |FROM w WHERE rn >= 21 ORDER BY event_type, day""".stripMargin),
    "stats_ordinal_assoc" ->
      """WITH cells AS (
        |  SELECT CAST(floor("value" / 100) AS BIGINT) AS xb,
        |    ((epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) % 24) // 6
        |      AS yb,
        |    CAST(count(*) AS BIGINT) AS m
        |  FROM events GROUP BY 1, 2),
        |cd AS (SELECT
        |    CAST(sum(CASE WHEN b.yb > a.yb THEN a.m * b.m ELSE 0 END)
        |      AS BIGINT) AS cp,
        |    CAST(sum(CASE WHEN b.yb < a.yb THEN a.m * b.m ELSE 0 END)
        |      AS BIGINT) AS dp
        |  FROM cells a JOIN cells b ON b.xb > a.xb),
        |nn AS (SELECT CAST(sum(m) AS BIGINT) AS n FROM cells),
        |tx AS (SELECT CAST(sum(r * (r - 1)) AS BIGINT) AS tx2 FROM
        |       (SELECT CAST(sum(m) AS BIGINT) AS r FROM cells
        |        GROUP BY xb)),
        |ty AS (SELECT CAST(sum(s * (s - 1)) AS BIGINT) AS ty2 FROM
        |       (SELECT CAST(sum(m) AS BIGINT) AS s FROM cells
        |        GROUP BY yb)),
        |dd AS (SELECT n, cp, dp, tx2, ty2,
        |    n * (n - 1) - tx2 AS dx, n * (n - 1) - ty2 AS dy
        |  FROM cd CROSS JOIN nn CROSS JOIN tx CROSS JOIN ty)
        |SELECT n, cp AS c_pairs, dp AS d_pairs,
        |  tx2 // 2 AS tied_x_pairs, ty2 // 2 AS tied_y_pairs,
        |  round(CAST(cp - dp AS DOUBLE) / (cp + dp), 6) + 0.0 AS gamma,
        |  round(CAST(2 * (cp - dp) AS DOUBLE) / dx, 6) + 0.0
        |    AS somers_d_yx,
        |  round(CAST(2 * (cp - dp) AS DOUBLE) / dy, 6) + 0.0
        |    AS somers_d_xy,
        |  round(CAST(2 * (cp - dp) AS DOUBLE)
        |    / sqrt(CAST(dx AS DOUBLE) * dy), 6) + 0.0 AS tau_b
        |FROM dd""".stripMargin,
    "stats_kendall_w" ->
      """WITH rev AS (
        |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, event_type,
        |    CAST(sum(CAST("value" AS DECIMAL(18,2))) * 100 AS BIGINT)
        |      AS revc
        |  FROM events GROUP BY 1, 2),
        |grid AS (
        |  SELECT d.day, t.event_type, COALESCE(r.revc, 0) AS revc
        |  FROM (SELECT DISTINCT day FROM rev) d
        |  CROSS JOIN (SELECT DISTINCT event_type FROM rev) t
        |  LEFT JOIN rev r ON r.day = d.day AND r.event_type = t.event_type),
        |rk AS (SELECT event_type,
        |    rank() OVER (PARTITION BY day ORDER BY revc) * 2
        |      + count(*) OVER (PARTITION BY day, revc) - 1 AS r2x
        |  FROM grid),
        |rs AS (SELECT event_type, CAST(sum(r2x) AS BIGINT) AS r2,
        |    CAST(count(*) AS BIGINT) AS m
        |  FROM rk GROUP BY 1),
        |km AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(any_value(m) AS BIGINT) AS m0 FROM rs),
        |s2 AS (SELECT CAST(any_value(k) AS BIGINT) AS k,
        |    CAST(any_value(m0) AS BIGINT) AS m,
        |    CAST(sum((r2 - m0 * (k + 1)) * (r2 - m0 * (k + 1)))
        |      AS BIGINT) AS s2c
        |  FROM rs CROSS JOIN km),
        |tt AS (SELECT CAST(sum(t * t * t - t) AS BIGINT) AS tt FROM
        |       (SELECT CAST(count(*) AS BIGINT) AS t FROM grid
        |        GROUP BY day, revc))
        |SELECT m AS n_blocks, k, tt AS ties_term,
        |  round(CAST(3 * s2c AS DOUBLE)
        |    / (CAST(m AS DOUBLE) * (m * (k * k * k - k) - tt)), 6) + 0.0
        |    AS w,
        |  round(CAST(3 * s2c * (k - 1) AS DOUBLE)
        |    / (m * (k * k * k - k) - tt), 6) + 0.0 AS chi2
        |FROM s2 CROSS JOIN tt""".stripMargin,
    "stats_theil_u" ->
      """WITH j AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1, 2),
        |rt AS (SELECT lang, CAST(sum(c) AS BIGINT) AS r FROM j GROUP BY 1),
        |ct AS (SELECT source, CAST(sum(c) AS BIGINT) AS s
        |  FROM j GROUP BY 1),
        |nn AS (SELECT CAST(sum(c) AS BIGINT) AS n,
        |    CAST(count(*) AS BIGINT) AS n_cells FROM j),
        |mi AS (SELECT round(sum((CAST(c AS DOUBLE) / n)
        |      * ln(CAST(c * n AS DOUBLE) / CAST(r * s AS DOUBLE))), 6)
        |      + 0.0 AS mi_nats
        |  FROM j JOIN rt USING (lang) JOIN ct USING (source)
        |  CROSS JOIN nn),
        |hl AS (SELECT round(-sum((CAST(r AS DOUBLE) / n)
        |      * ln(CAST(r AS DOUBLE) / n)), 6) + 0.0 AS h_lang
        |  FROM rt CROSS JOIN nn),
        |hs AS (SELECT round(-sum((CAST(s AS DOUBLE) / n)
        |      * ln(CAST(s AS DOUBLE) / n)), 6) + 0.0 AS h_source
        |  FROM ct CROSS JOIN nn)
        |SELECT n AS n_docs, n_cells, mi_nats, h_lang, h_source,
        |  round(mi_nats / h_lang, 6) + 0.0 AS u_lang_given_source,
        |  round(mi_nats / h_source, 6) + 0.0 AS u_source_given_lang,
        |  round(2 * mi_nats / (h_lang + h_source), 6) + 0.0 AS u_symmetric
        |FROM nn CROSS JOIN mi CROSS JOIN hl CROSS JOIN hs""".stripMargin,
    "stats_rmst" ->
      s"""$survCtes,
         |sg AS (SELECT *, ((user_id % 2147483648) * 2654435761
         |         % 2147483648) % 2 AS g FROM s),
         |tau AS (SELECT min(mxt) AS tau FROM
         |         (SELECT g, max(t) AS mxt FROM sg GROUP BY 1)),
         |byt AS (SELECT g, t, CAST(count(*) AS BIGINT) AS a,
         |    CAST(sum(observed) AS BIGINT) AS d
         |  FROM sg GROUP BY 1, 2),
         |r AS (SELECT *, sum(a) OVER (PARTITION BY g ORDER BY t
         |        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
         |        AS n_risk FROM byt),
         |tm AS (SELECT *, CASE WHEN d > 0 AND d < n_risk
         |    THEN CAST(round(ln(1.0 - CAST(d AS DOUBLE) / n_risk), 9)
         |         AS DECIMAL(18,9)) END AS term FROM r),
         |cm AS (SELECT *, sum(term) OVER (PARTITION BY g ORDER BY t
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |        AS cuml FROM tm),
         |cv AS (SELECT g, t, CASE WHEN d = n_risk
         |    THEN CAST(0 AS DECIMAL(18,9))
         |    ELSE CAST(round(exp(CAST(cuml AS DOUBLE)), 9)
         |         AS DECIMAL(18,9)) END AS s9
         |  FROM cm WHERE d > 0),
         |iv AS (SELECT g, t, s9, tau,
         |    least(COALESCE(lead(t) OVER (PARTITION BY g ORDER BY t),
         |      tau), tau) AS tn
         |  FROM cv CROSS JOIN tau),
         |ar AS (SELECT g, tau, min(t) AS t1,
         |    sum(s9 * CAST(greatest(0, tn - t) AS DECIMAL(10,0)))
         |      AS area_ev,
         |    min(CASE WHEN s9 <= 0.5 THEN t END) AS median_t
         |  FROM iv GROUP BY 1, 2),
         |grp AS (SELECT g, CAST(count(*) AS BIGINT) AS n_subj,
         |    CAST(sum(observed) AS BIGINT) AS n_events
         |  FROM sg GROUP BY 1)
         |SELECT ar.g, n_subj, n_events, tau AS tau_hours,
         |  median_t AS median_t_hours,
         |  round(CAST(least(t1, tau) + area_ev AS DOUBLE), 6) + 0.0
         |    AS rmst_hours,
         |  round(CAST(least(t1, tau) + area_ev AS DOUBLE) / tau, 6) + 0.0
         |    AS rmst_frac
         |FROM ar JOIN grp ON ar.g = grp.g ORDER BY ar.g""".stripMargin,
    "stats_life_table" ->
      s"""$survCtes,
         |byi AS (SELECT t // 168 AS wk,
         |    CAST(sum(observed) AS BIGINT) AS d,
         |    CAST(sum(1 - observed) AS BIGINT) AS c
         |  FROM s GROUP BY 1),
         |r AS (SELECT *, CAST(sum(d + c) OVER (ORDER BY wk
         |        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
         |        AS BIGINT) AS n_enter FROM byi),
         |r2 AS (SELECT *, 2 * n_enter - c AS n2 FROM r),
         |tm AS (SELECT *, CASE WHEN 2 * d < n2
         |    THEN CAST(round(ln(1.0 - CAST(2 * d AS DOUBLE) / n2), 9)
         |         AS DECIMAL(18,9)) END AS term FROM r2),
         |cm AS (SELECT *,
         |    sum(term) OVER (ORDER BY wk
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS cuml,
         |    COALESCE(max(CASE WHEN 2 * d >= n2 THEN 1 ELSE 0 END)
         |      OVER (ORDER BY wk
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS extinct
         |  FROM tm)
         |SELECT wk AS interval_wk, wk * 168 AS t_lo_hours, n_enter,
         |  d AS d_events, c AS c_censored,
         |  round(CAST(2 * d AS DOUBLE) / n2, 6) + 0.0 AS q_hat,
         |  round(CASE WHEN extinct = 1 THEN 0.0
         |    WHEN cuml IS NULL THEN 1.0
         |    ELSE exp(CAST(cuml AS DOUBLE)) END, 6) + 0.0 AS surv_start
         |FROM cm ORDER BY interval_wk""".stripMargin,
    "stats_cusum_chart" -> ("WITH RECURSIVE " + duckDailyTyped.drop(5) +
      duckZSeries +
      """rec AS (
        |  SELECT event_type, n, rn,
        |    CASE WHEN greatest(0.0, z - 0.5) > 4.0
        |      OR least(0.0, z + 0.5) < -4.0 THEN 0.0
        |      ELSE greatest(0.0, z - 0.5) END AS cp,
        |    CASE WHEN greatest(0.0, z - 0.5) > 4.0
        |      OR least(0.0, z + 0.5) < -4.0 THEN 0.0
        |      ELSE least(0.0, z + 0.5) END AS cn,
        |    CASE WHEN greatest(0.0, z - 0.5) > 4.0
        |      OR least(0.0, z + 0.5) < -4.0 THEN 1 ELSE 0 END
        |      AS al
        |  FROM zs WHERE rn = 1
        |  UNION ALL
        |  SELECT r.event_type, r.n, p.rn,
        |    CASE WHEN greatest(0.0, r.cp + p.z - 0.5) > 4.0
        |      OR least(0.0, r.cn + p.z + 0.5) < -4.0 THEN 0.0
        |      ELSE greatest(0.0, r.cp + p.z - 0.5) END,
        |    CASE WHEN greatest(0.0, r.cp + p.z - 0.5) > 4.0
        |      OR least(0.0, r.cn + p.z + 0.5) < -4.0 THEN 0.0
        |      ELSE least(0.0, r.cn + p.z + 0.5) END,
        |    r.al + CASE WHEN greatest(0.0, r.cp + p.z - 0.5) > 4.0
        |      OR least(0.0, r.cn + p.z + 0.5) < -4.0 THEN 1 ELSE 0 END
        |  FROM rec r JOIN zs p
        |    ON p.event_type = r.event_type AND p.rn = r.rn + 1
        |  WHERE r.rn < r.n)
        |SELECT event_type, n AS n_days,
        |  round(cp, 6) + 0.0 AS cusum_pos,
        |  round(cn, 6) + 0.0 AS cusum_neg,
        |  CAST(al AS BIGINT) AS n_alarms
        |FROM rec WHERE rn = n ORDER BY event_type""".stripMargin),
    "stats_page_hinkley" -> ("WITH RECURSIVE " + duckDailyTyped.drop(5) +
      duckZSeries +
      """rec AS (
        |  SELECT event_type, n, rn, CAST(1 AS BIGINT) AS i,
        |    z AS sm, z - z / 1 - 0.1 AS m,
        |    least(0.0, z - z / 1 - 0.1) AS mn,
        |    CAST(CASE WHEN z - z / 1 - 0.1
        |      - least(0.0, z - z / 1 - 0.1) > 5.0
        |      THEN 1 ELSE 0 END AS BIGINT) AS al
        |  FROM zs WHERE rn = 1
        |  UNION ALL
        |  SELECT r.event_type, r.n, p.rn, r.i + 1,
        |    r.sm + p.z,
        |    r.m + p.z - (r.sm + p.z) / (r.i + 1) - 0.1,
        |    least(r.mn, r.m + p.z - (r.sm + p.z) / (r.i + 1) - 0.1),
        |    r.al + CASE WHEN r.m + p.z - (r.sm + p.z) / (r.i + 1)
        |      - 0.1 - least(r.mn, r.m + p.z - (r.sm + p.z)
        |      / (r.i + 1) - 0.1) > 5.0 THEN 1 ELSE 0 END
        |  FROM rec r JOIN zs p
        |    ON p.event_type = r.event_type AND p.rn = r.rn + 1
        |  WHERE r.rn < r.n)
        |SELECT event_type, n AS n_days,
        |  round(m, 6) + 0.0 AS m_stat, round(mn, 6) + 0.0 AS m_min,
        |  round(m - mn, 6) + 0.0 AS ph_stat,
        |  round(m - mn, 6) + 0.0 > 5.0 AS drift_flag,
        |  al AS n_alarm_days
        |FROM rec WHERE rn = n ORDER BY event_type""".stripMargin),
    "stats_trimmed_mean" ->
      """WITH g AS (
        |  SELECT event_type,
        |    CAST(CAST("value" AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc,
        |    CAST(count(*) AS BIGINT) AS t
        |  FROM events GROUP BY 1, 2),
        |sp AS (SELECT *,
        |    COALESCE(sum(t) OVER (PARTITION BY event_type ORDER BY vc
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1
        |      AS lo,
        |    COALESCE(sum(t) OVER (PARTITION BY event_type ORDER BY vc
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + t
        |      AS hi
        |  FROM g),
        |tot AS (SELECT event_type, CAST(sum(t) AS BIGINT) AS n,
        |    CAST(sum(t * vc) AS BIGINT) AS sv,
        |    CAST(sum(t) AS BIGINT) // 10 AS k
        |  FROM g GROUP BY 1),
        |ov AS (SELECT sp.*, tot.n, tot.sv, tot.k,
        |    greatest(0, least(sp.hi, tot.n - tot.k)
        |      - greatest(sp.lo, tot.k + 1) + 1) AS ov
        |  FROM sp JOIN tot USING (event_type)),
        |a AS (SELECT event_type, n, k, sv,
        |    CAST(sum(ov * vc) AS BIGINT) AS trim_sum,
        |    CAST(sum(ov) AS BIGINT) AS n_kept,
        |    min(CASE WHEN hi >= k + 1 THEN vc END) AS v_lo,
        |    min(CASE WHEN hi >= n - k THEN vc END) AS v_hi
        |  FROM ov GROUP BY 1, 2, 3, 4)
        |SELECT event_type, n,
        |  round(CAST(sv AS DOUBLE) / (100 * n), 6) + 0.0 AS mean,
        |  round(CAST(trim_sum AS DOUBLE) / (100 * n_kept), 6) + 0.0
        |    AS trimmed_mean_10,
        |  round(CAST(trim_sum + k * (v_lo + v_hi) AS DOUBLE)
        |    / (100 * n), 6) + 0.0 AS winsor_mean_10,
        |  round(CAST(v_lo AS DOUBLE) / 100, 6) + 0.0 AS clamp_lo,
        |  round(CAST(v_hi AS DOUBLE) / 100, 6) + 0.0 AS clamp_hi
        |FROM a ORDER BY event_type""".stripMargin,
    "stats_iqr_fences" ->
      """WITH q AS (
        |  SELECT event_type,
        |    quantile_cont("value", 0.25) AS q1,
        |    quantile_cont("value", 0.75) AS q3
        |  FROM events GROUP BY 1),
        |f AS (SELECT *, q3 - q1 AS iqr,
        |    round(q1 - 1.5 * (q3 - q1), 6) + 0.0 AS lo_in,
        |    round(q3 + 1.5 * (q3 - q1), 6) + 0.0 AS hi_in,
        |    round(q1 - 3.0 * (q3 - q1), 6) + 0.0 AS lo_out,
        |    round(q3 + 3.0 * (q3 - q1), 6) + 0.0 AS hi_out
        |  FROM q)
        |SELECT e.event_type, CAST(count(*) AS BIGINT) AS n,
        |  round(f.q1, 6) + 0.0 AS q1, round(f.q3, 6) + 0.0 AS q3,
        |  f.lo_in AS fence_lo, f.hi_in AS fence_hi,
        |  CAST(sum(CASE WHEN e."value" < f.lo_in
        |    OR e."value" > f.hi_in THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_mild,
        |  CAST(sum(CASE WHEN e."value" < f.lo_out
        |    OR e."value" > f.hi_out THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_extreme
        |FROM events e JOIN f USING (event_type)
        |GROUP BY 1, 3, 4, 5, 6 ORDER BY e.event_type""".stripMargin,
    "stats_cpk" ->
      """WITH g AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS s1,
        |    CAST(sum(CAST("value" AS DECIMAL(18,2))
        |             * CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS s2
        |  FROM events GROUP BY 1),
        |v AS (SELECT *, s1 / n AS m,
        |        sqrt((n * s2 - s1 * s1)
        |          / (CAST(n AS DOUBLE) * (n - 1))) AS sd
        |      FROM g),
        |c AS (SELECT *,
        |        round(least((190.0 - m) / (3 * sd),
        |          (m - 10.0) / (3 * sd)), 6) + 0.0 AS cpk6
        |      FROM v)
        |SELECT event_type, n, round(m, 6) + 0.0 AS mean,
        |  round(sd, 6) + 0.0 AS sd,
        |  round((190.0 - 10.0) / (6 * sd), 6) + 0.0 AS cp,
        |  cpk6 AS cpk, cpk6 >= 1.33 AS capable
        |FROM c ORDER BY event_type""".stripMargin,
    "stats_xbar_chart" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS nd,
        |    CAST(sum(CAST("value" AS DECIMAL(18,2))) * 100 AS BIGINT)
        |      AS sc
        |  FROM events GROUP BY 1, 2),
        |g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS s1,
        |    CAST(sum(CAST("value" AS DECIMAL(18,2))
        |             * CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS s2
        |  FROM events GROUP BY 1),
        |gr AS (SELECT event_type, s1 / n AS gm,
        |    sqrt((n * s2 - s1 * s1) / (CAST(n AS DOUBLE) * (n - 1)))
        |      AS gsd
        |  FROM g),
        |z AS (SELECT d.*, gr.gm, gr.gsd,
        |    CAST(d.sc AS DOUBLE) / (100 * d.nd) AS xbar,
        |    round((CAST(d.sc AS DOUBLE) / (100 * d.nd) - gr.gm)
        |      / (gr.gsd / sqrt(CAST(d.nd AS DOUBLE))), 6) + 0.0 AS z6
        |  FROM daily d JOIN gr USING (event_type)),
        |zz AS (SELECT *, abs(z6) > 3.0 AS violation FROM z),
        |t AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |    CAST(sum(CASE WHEN violation THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_violations
        |  FROM zz GROUP BY 1)
        |SELECT zz.event_type, zz.day, zz.nd AS n_obs,
        |  round(zz.xbar, 6) + 0.0 AS xbar, zz.z6 AS z,
        |  zz.violation, t.n_days, t.n_violations
        |FROM zz JOIN t USING (event_type)
        |ORDER BY zz.event_type, zz.day""".stripMargin,
    "privacy_dp_mean" ->
      """WITH c AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN CAST("value" AS DECIMAL(18,2)) < 0
        |      THEN CAST(0 AS DECIMAL(18,2))
        |      WHEN CAST("value" AS DECIMAL(18,2)) > 200
        |      THEN CAST(200 AS DECIMAL(18,2))
        |      ELSE CAST("value" AS DECIMAL(18,2)) END) AS DOUBLE)
        |      AS clipped_sum
        |  FROM events GROUP BY 1),
        |j AS (SELECT *, CAST(row_number() OVER (ORDER BY event_type)
        |        AS BIGINT) AS j FROM c),
        |u AS (SELECT *,
        |    ((j * 2 + 0) % 2147483648 * 2654435761 % 2147483648 + 1)
        |      / 2147483649.0 AS u0,
        |    ((j * 2 + 1) % 2147483648 * 2654435761 % 2147483648 + 1)
        |      / 2147483649.0 AS u1
        |  FROM j),
        |n AS (SELECT *,
        |    clipped_sum + (CASE WHEN u0 < 0.5
        |      THEN 200.0 * round(ln(2.0 * u0), 9)
        |      ELSE -200.0 * round(ln(2.0 * (1.0 - u0)), 9) END)
        |      AS noisy_sum,
        |    c + (CASE WHEN u1 < 0.5 THEN 1.0 * round(ln(2.0 * u1), 9)
        |      ELSE -1.0 * round(ln(2.0 * (1.0 - u1)), 9) END)
        |      AS noisy_n
        |  FROM u)
        |SELECT event_type, CAST(1.0 AS DOUBLE) AS epsilon,
        |  CAST(200.0 AS DOUBLE) AS clip_bound,
        |  round(noisy_sum, 6) + 0.0 AS noisy_sum,
        |  round(noisy_n, 6) + 0.0 AS noisy_count,
        |  round(noisy_sum / noisy_n, 6) + 0.0 AS dp_mean
        |FROM n ORDER BY event_type""".stripMargin,
    "privacy_suppression" ->
      """WITH cells AS (
        |  SELECT event_type,
        |    (CAST(CAST(ts AS TIMESTAMP) AS DATE) - DATE '1970-01-01')
        |      % 7 AS dow,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT *, n < 10 AS primary_sup FROM cells),
        |w AS (SELECT *,
        |    sum(CASE WHEN primary_sup THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY event_type) AS n_sup,
        |    min(CASE WHEN NOT primary_sup THEN n END)
        |      OVER (PARTITION BY event_type) AS min_ok
        |  FROM m),
        |w2 AS (SELECT *,
        |    n_sup = 1 AND NOT primary_sup AND n = min_ok
        |      AS secondary_sup,
        |    min(CASE WHEN NOT primary_sup AND n = min_ok THEN dow END)
        |      OVER (PARTITION BY event_type) AS min_dow
        |  FROM w),
        |f AS (SELECT *, primary_sup OR
        |        (secondary_sup AND dow = min_dow) AS suppressed
        |      FROM w2)
        |SELECT event_type, CAST(dow AS BIGINT) AS dow,
        |  CASE WHEN NOT suppressed THEN n END AS released_n,
        |  suppressed, primary_sup AS is_primary
        |FROM f ORDER BY event_type, dow""".stripMargin,
    "stats_hurst" -> (duckDailyTyped +
      """dr AS (SELECT event_type, revc AS yc,
        |    CAST(row_number() OVER (PARTITION BY event_type
        |      ORDER BY day) AS BIGINT) AS rn
        |  FROM daily),
        |sz AS (SELECT dr.*, s.sz, (rn - 1) // s.sz AS b,
        |    (rn - 1) % s.sz + 1 AS k
        |  FROM dr, (SELECT unnest([8, 16]) AS sz) s),
        |bl AS (SELECT event_type, sz, b,
        |    CAST(count(*) AS BIGINT) AS nb,
        |    CAST(sum(yc) AS BIGINT) AS s1,
        |    sum(CAST(yc AS DECIMAL(28,0)) * yc) AS s2
        |  FROM sz GROUP BY 1, 2, 3),
        |bf AS (SELECT *, CAST(s1 AS DOUBLE) / sz AS mean,
        |    sqrt(CAST(sz * s2 - CAST(s1 AS DECIMAL(28,0)) * s1
        |      AS DOUBLE)) / sz AS sd
        |  FROM bl WHERE nb = sz),
        |wc AS (SELECT sz.event_type, sz.sz, sz.b, sz.k, sz.yc,
        |    bf.mean, bf.sd,
        |    sum(sz.yc) OVER (PARTITION BY sz.event_type, sz.sz, sz.b
        |      ORDER BY sz.k
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      - sz.k * bf.mean AS dev
        |  FROM sz JOIN bf ON sz.event_type = bf.event_type
        |    AND sz.sz = bf.sz AND sz.b = bf.b),
        |rb AS (SELECT event_type, sz, b,
        |    max(dev) - min(dev) AS r, max(sd) AS sd
        |  FROM wc GROUP BY 1, 2, 3),
        |rs AS (SELECT event_type, sz,
        |    CAST(count(*) AS BIGINT) AS n_blocks,
        |    CAST(sum(CAST(round(r / sd, 9) AS DECIMAL(18,9)))
        |      AS DOUBLE) / count(*) AS rs
        |  FROM rb WHERE sd > 0 GROUP BY 1, 2)
        |SELECT p16.event_type,
        |  p16.n_blocks AS blocks_8, p32.n_blocks AS blocks_16,
        |  round(p16.rs, 6) + 0.0 AS rs_8,
        |  round(p32.rs, 6) + 0.0 AS rs_16,
        |  round(ln(p32.rs / p16.rs) / ln(2.0), 6) + 0.0 AS hurst
        |FROM (SELECT * FROM rs WHERE sz = 8) p16
        |JOIN (SELECT * FROM rs WHERE sz = 16) p32
        |  USING (event_type)
        |ORDER BY event_type""".stripMargin),
    "stats_sample_entropy" -> (duckDailyTyped +
      """dr AS (SELECT event_type, revc AS yc,
        |    CAST(row_number() OVER w AS BIGINT) AS rn,
        |    lead(revc, 1) OVER w AS y1, lead(revc, 2) OVER w AS y2
        |  FROM daily
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day)),
        |df AS (SELECT * FROM dr WHERE y2 IS NOT NULL),
        |tol AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    round(0.2 * sqrt(CAST(count(*) *
        |      sum(CAST(yc AS DECIMAL(28,0)) * yc)
        |      - CAST(sum(yc) AS DECIMAL(28,0)) * sum(yc) AS DOUBLE))
        |      / count(*), 6) AS r_tol
        |  FROM df GROUP BY 1),
        |pr AS (SELECT a.event_type,
        |    abs(a.yc - b.yc) <= t.r_tol AS m0,
        |    abs(a.y1 - b.y1) <= t.r_tol AS m1,
        |    abs(a.y2 - b.y2) <= t.r_tol AS m2
        |  FROM df a JOIN df b
        |    ON a.event_type = b.event_type AND b.rn > a.rn
        |  JOIN tol t ON a.event_type = t.event_type),
        |c AS (SELECT event_type,
        |    CAST(sum(CASE WHEN m0 AND m1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS b_pairs,
        |    CAST(sum(CASE WHEN m0 AND m1 AND m2 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS a_pairs
        |  FROM pr GROUP BY 1)
        |SELECT c.event_type, tol.n AS n_templates,
        |  round(tol.r_tol / 100, 6) + 0.0 AS tolerance,
        |  c.b_pairs, c.a_pairs,
        |  round(CASE WHEN a_pairs > 0 AND b_pairs > 0
        |    THEN -ln(CAST(a_pairs AS DOUBLE) / b_pairs) END, 6) + 0.0
        |    AS sampen
        |FROM c JOIN tol USING (event_type)
        |ORDER BY event_type""".stripMargin),
    "stats_weibull_fit" ->
      """WITH e AS (SELECT user_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_type, "value"
        |  FROM events),
        |subj AS (SELECT user_id, min(us) AS t0,
        |    min(CASE WHEN event_type = 'purchase' AND "value" >= 80
        |        THEN us END) AS tp
        |  FROM e GROUP BY 1),
        |mx AS (SELECT max(us) AS mxus FROM e),
        |s AS (SELECT CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END
        |        AS observed,
        |    (COALESCE(tp, mxus) - t0) // 3600000000 AS t
        |  FROM subj, mx),
        |byt AS (SELECT t, CAST(sum(observed) AS BIGINT) AS d,
        |    CAST(sum(1 - observed) AS BIGINT) AS c
        |  FROM s GROUP BY 1),
        |cv AS (SELECT *,
        |    sum(d + c) OVER (ORDER BY t
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        |      AS n_risk
        |  FROM byt),
        |tm AS (SELECT *,
        |    CASE WHEN d > 0 AND d < n_risk
        |      THEN CAST(round(ln(1.0 - CAST(d AS DOUBLE) / n_risk), 9)
        |           AS DECIMAL(18,9)) END AS term
        |  FROM cv),
        |cm AS (SELECT *,
        |    sum(term) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuml
        |  FROM tm),
        |pt AS (SELECT ln(CAST(t AS DOUBLE)) AS x,
        |    ln(-ln(round(exp(CAST(cuml AS DOUBLE)), 6) + 0.0)) AS y
        |  FROM cm
        |  WHERE d > 0 AND d < n_risk AND t >= 1
        |    AND round(exp(CAST(cuml AS DOUBLE)), 6) + 0.0 > 0
        |    AND round(exp(CAST(cuml AS DOUBLE)), 6) + 0.0 < 1),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS n_points,
        |    sum(CAST(round(x, 9) AS DECIMAL(18,9))) AS sx,
        |    sum(CAST(round(y, 9) AS DECIMAL(18,9))) AS sy,
        |    sum(CAST(round(x * y, 9) AS DECIMAL(18,9))) AS sxy,
        |    sum(CAST(round(x * x, 9) AS DECIMAL(18,9))) AS sxx
        |  FROM pt),
        |k AS (SELECT *,
        |    (n_points * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
        |      * CAST(sy AS DOUBLE)) / (n_points * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS kk
        |  FROM agg),
        |a AS (SELECT *,
        |    (CAST(sy AS DOUBLE) - kk * CAST(sx AS DOUBLE)) / n_points
        |      AS aa
        |  FROM k)
        |SELECT n_points, round(kk, 6) + 0.0 AS shape_k,
        |  round(exp(-aa / kk), 6) + 0.0 AS scale_hours,
        |  round(aa, 6) + 0.0 AS intercept
        |FROM a""".stripMargin,
    "stats_negbin_fit" ->
      """WITH u AS (SELECT event_type, user_id,
        |    CAST(count(*) AS BIGINT) AS k
        |  FROM events GROUP BY 1, 2),
        |g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_users,
        |    CAST(sum(k) AS BIGINT) AS sk,
        |    CAST(sum(k * k) AS BIGINT) AS sk2
        |  FROM u GROUP BY 1),
        |m AS (SELECT *, CAST(sk AS DOUBLE) / n_users AS m,
        |    CAST(n_users * sk2 - CAST(sk AS DECIMAL(28,0)) * sk
        |      AS DOUBLE) / (CAST(n_users AS DOUBLE) * (n_users - 1))
        |      AS v
        |  FROM g)
        |SELECT event_type, n_users, round(m, 6) + 0.0 AS mean,
        |  round(v, 6) + 0.0 AS variance,
        |  round(v / m, 6) + 0.0 AS dispersion,
        |  round(CASE WHEN v > m THEN m * m / (v - m) END, 6) + 0.0
        |    AS r_fit,
        |  round(CASE WHEN v > m THEN m / v END, 6) + 0.0 AS p_fit
        |FROM m ORDER BY event_type""".stripMargin,
    "stats_tost" ->
      s"""WITH g AS (
         |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS s1,
         |    CAST(sum(CAST("value" AS DECIMAL(18,2))
         |             * CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS s2
         |  FROM events WHERE event_type IN ('click', 'purchase')
         |  GROUP BY 1),
         |v AS (SELECT *, s1 / n AS m,
         |        (n * s2 - s1 * s1) / (CAST(n AS DOUBLE) * (n - 1)) AS vi
         |      FROM g),
         |ab AS (SELECT
         |    max(CASE WHEN event_type = 'click' THEN n END) AS n1,
         |    max(CASE WHEN event_type = 'click' THEN m END) AS m1,
         |    max(CASE WHEN event_type = 'click' THEN vi END) AS v1,
         |    max(CASE WHEN event_type = 'purchase' THEN n END) AS n2,
         |    max(CASE WHEN event_type = 'purchase' THEN m END) AS m2,
         |    max(CASE WHEN event_type = 'purchase' THEN vi END) AS v2
         |  FROM v),
         |c AS (SELECT *, m1 - m2 AS d,
         |        abs(0.05 * (m1 + m2) / 2) AS delta,
         |        sqrt(v1 / n1 + v2 / n2) AS se
         |      FROM ab),
         |t AS (SELECT *, (d + delta) / se AS tl, (delta - d) / se AS tu
         |      FROM c),
         |p AS (SELECT *,
         |        round(greatest(1.0 - ${phiSql("tl")},
         |          1.0 - ${phiSql("tu")}), 6) + 0.0 AS pmax6
         |      FROM t)
         |SELECT n1, n2, round(d, 6) + 0.0 AS diff,
         |  round(delta, 6) + 0.0 AS margin, round(se, 6) + 0.0 AS se,
         |  round(tl, 6) + 0.0 AS t_lower, round(tu, 6) + 0.0 AS t_upper,
         |  pmax6 AS p_max, pmax6 < 0.05 AS equivalent
         |FROM p""".stripMargin,
    "ab_bayes_approx" ->
      s"""WITH u AS (
         |  SELECT user_id,
         |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |      AS converted,
         |    (user_id % 2147483648) * 2654435761 % 2147483648 % 2 AS arm
         |  FROM events GROUP BY user_id),
         |c AS (SELECT
         |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_a,
         |    CAST(sum(CASE WHEN arm = 0 THEN converted ELSE 0 END)
         |      AS BIGINT) AS x_a,
         |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_b,
         |    CAST(sum(CASE WHEN arm = 1 THEN converted ELSE 0 END)
         |      AS BIGINT) AS x_b
         |  FROM u),
         |m AS (SELECT *,
         |    CAST(x_a + 1 AS DOUBLE) / (n_a + 2) AS ma,
         |    CAST(x_b + 1 AS DOUBLE) / (n_b + 2) AS mb,
         |    CAST(x_a + 1 AS DOUBLE) * (n_a - x_a + 1)
         |      / (CAST(n_a + 2 AS DOUBLE) * (n_a + 2) * (n_a + 3)) AS va,
         |    CAST(x_b + 1 AS DOUBLE) * (n_b - x_b + 1)
         |      / (CAST(n_b + 2 AS DOUBLE) * (n_b + 2) * (n_b + 3)) AS vb
         |  FROM c),
         |z AS (SELECT *, (mb - ma) / sqrt(va + vb) AS zs FROM m)
         |SELECT n_a, x_a, n_b, x_b,
         |  round(CAST(x_a AS DOUBLE) / n_a, 6) + 0.0 AS cr_a,
         |  round(CAST(x_b AS DOUBLE) / n_b, 6) + 0.0 AS cr_b,
         |  round((CAST(x_b AS DOUBLE) / n_b)
         |    / (CAST(x_a AS DOUBLE) / n_a) - 1, 6) + 0.0 AS rel_lift,
         |  round(${phiSql("zs")}, 6) + 0.0 AS p_b_beats_a
         |FROM z""".stripMargin,
    "window_kama" -> ("WITH RECURSIVE " + duckDailyTyped.drop(5) +
      """s0 AS (SELECT event_type, day, revc AS yc,
        |    CAST(row_number() OVER w AS BIGINT) AS rn,
        |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT)
        |      AS n,
        |    abs(revc - lag(revc, 10) OVER w) AS net,
        |    abs(revc - lag(revc, 1) OVER w) AS d1
        |  FROM daily
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day)),
        |s AS (SELECT *, sum(d1) OVER (
        |    PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS vol
        |  FROM s0),
        |s2 AS (SELECT *, CASE WHEN rn >= 11 THEN
        |    pow((CASE WHEN vol > 0 THEN CAST(net AS DOUBLE) / vol
        |      ELSE 0.0 END) * (2.0 / 3 - 2.0 / 31) + 2.0 / 31, 2)
        |    END AS sc
        |  FROM s),
        |rec AS (
        |  SELECT event_type, n, rn, CAST(yc AS DOUBLE) AS kama
        |  FROM s2 WHERE rn = 11
        |  UNION ALL
        |  SELECT r.event_type, r.n, p.rn,
        |    r.kama + p.sc * (p.yc - r.kama)
        |  FROM rec r JOIN s2 p
        |    ON p.event_type = r.event_type AND p.rn = r.rn + 1
        |  WHERE r.rn < r.n),
        |lastbar AS (SELECT event_type, yc, sc FROM s2
        |            WHERE rn = n)
        |SELECT rec.event_type, rec.n AS n_days,
        |  round(lastbar.yc / 100.0, 6) + 0.0 AS last_close,
        |  round(lastbar.sc, 6) + 0.0 AS last_sc,
        |  round(rec.kama / 100.0, 6) + 0.0 AS kama
        |FROM rec JOIN lastbar USING (event_type)
        |WHERE rec.rn = rec.n AND rec.n >= 11
        |ORDER BY event_type""".stripMargin),
    "dq_gap_scan" -> (duckDailyTyped +
      """g AS (SELECT event_type, day,
        |    day - lag(day, 1) OVER (PARTITION BY event_type
        |      ORDER BY day) AS gap
        |  FROM daily),
        |a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |    min(day) AS first_day, max(day) AS last_day,
        |    CAST(sum(CASE WHEN gap > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_gaps,
        |    CAST(COALESCE(max(CASE WHEN gap > 1 THEN gap - 1 END), 0)
        |      AS BIGINT) AS longest_gap
        |  FROM g GROUP BY 1)
        |SELECT event_type, n_days, first_day, last_day,
        |  CAST(last_day - first_day + 1 AS BIGINT) AS span_days,
        |  CAST(last_day - first_day + 1 - n_days AS BIGINT) AS n_missing,
        |  n_gaps, longest_gap
        |FROM a ORDER BY event_type""".stripMargin),
    "forecast_theta" ->
      """WITH RECURSIVE d AS (
        |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    CAST(sum(CAST("value" AS DECIMAL(18,2))) * 100 AS BIGINT)
        |      AS yc
        |  FROM events GROUP BY 1, 2),
        |s AS (
        |  SELECT event_type, yc,
        |    CAST(row_number() OVER (PARTITION BY event_type
        |      ORDER BY day) AS BIGINT) AS t,
        |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
        |  FROM d),
        |m AS (
        |  SELECT event_type, n, CAST(sum(yc) AS BIGINT) AS syc,
        |    CAST(sum(t * yc) AS BIGINT) AS styc,
        |    n * (n + 1) // 2 AS stt,
        |    n * (n + 1) * (2 * n + 1) // 6 AS st2
        |  FROM s WHERE n >= 2 GROUP BY 1, 2),
        |coef AS (
        |  SELECT event_type, n,
        |    CAST(n * styc - stt * syc AS DOUBLE)
        |      / CAST(n * st2 - stt * stt AS DOUBLE) AS bc, syc, stt
        |  FROM m),
        |c2 AS (SELECT *, (syc - bc * stt) / n AS ac FROM coef),
        |rec AS (
        |  SELECT s.event_type, s.n, CAST(1 AS BIGINT) AS t,
        |    2.0 * s.yc - (c2.ac + c2.bc) AS l, c2.ac, c2.bc
        |  FROM s JOIN c2 USING (event_type) WHERE s.t = 1
        |  UNION ALL
        |  SELECT r.event_type, r.n, r.t + 1,
        |    0.3 * (2.0 * p.yc - (r.ac + r.bc * (r.t + 1)))
        |      + (1.0 - 0.3) * r.l, r.ac, r.bc
        |  FROM rec r JOIN s p
        |    ON p.event_type = r.event_type AND p.t = r.t + 1
        |  WHERE r.t < r.n)
        |SELECT event_type, n AS n_days,
        |  round(bc / 100, 6) + 0.0 AS slope,
        |  round(l / 100, 6) + 0.0 AS ses_level,
        |  round((0.5 * (ac + bc * (n + 7)) + 0.5 * l) / 100, 6) + 0.0
        |    AS forecast_7
        |FROM rec WHERE t = n ORDER BY event_type""".stripMargin,
    "forecast_damped" ->
      """WITH RECURSIVE d AS (
        |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    CAST(sum(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS y
        |  FROM events GROUP BY 1, 2),
        |s AS (
        |  SELECT event_type, y,
        |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS t,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM d),
        |rec AS (
        |  SELECT event_type, n, 2 AS t,
        |    max(CASE WHEN t = 1 THEN y END) AS l,
        |    max(CASE WHEN t = 2 THEN y END) -
        |      max(CASE WHEN t = 1 THEN y END) AS b
        |  FROM s GROUP BY event_type, n
        |  UNION ALL
        |  SELECT r.event_type, r.n, r.t + 1,
        |    0.5 * p.y + (1.0 - 0.5) * (r.l + 0.9 * r.b),
        |    0.3 * ((0.5 * p.y + (1.0 - 0.5) * (r.l + 0.9 * r.b)) - r.l)
        |      + (1.0 - 0.3) * 0.9 * r.b
        |  FROM rec r JOIN s p
        |    ON p.event_type = r.event_type AND p.t = r.t + 1
        |  WHERE r.t < r.n)
        |SELECT event_type, CAST(n AS BIGINT) AS n_days,
        |  round(l, 6) + 0.0 AS level, round(b, 6) + 0.0 AS trend,
        |  round(l + b * (0.9 * (1.0 - pow(0.9, 7)) / (1.0 - 0.9)), 6)
        |    + 0.0 AS forecast_7
        |FROM rec WHERE t = n ORDER BY event_type""".stripMargin,
    "stats_welch_anova" ->
      """WITH g AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS s1,
        |    CAST(sum(CAST("value" AS DECIMAL(18,2))
        |             * CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS s2
        |  FROM events GROUP BY 1),
        |v AS (SELECT *, s1 / n AS xb,
        |        (n * s2 - s1 * s1) / (CAST(n AS DOUBLE) * (n - 1)) AS vi
        |      FROM g),
        |w AS (SELECT *, CAST(CAST(round(n / vi, 9) AS DECIMAL(18,9))
        |        AS DOUBLE) AS wi FROM v),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |    sum(CAST(round(wi, 9) AS DECIMAL(18,9))) AS wsum,
        |    sum(CAST(round(wi * xb, 6) AS DECIMAL(28,6))) AS wxsum
        |  FROM w),
        |tm AS (SELECT *, CAST(wxsum AS DOUBLE) / CAST(wsum AS DOUBLE)
        |        AS mw FROM tot),
        |agg AS (SELECT k, wsum, mw,
        |    sum(CAST(round(wi * (xb - mw) * (xb - mw), 6)
        |        AS DECIMAL(28,6))) AS a_num,
        |    sum(CAST(round((1 - wi / CAST(wsum AS DOUBLE))
        |        * (1 - wi / CAST(wsum AS DOUBLE)) / (n - 1), 12)
        |        AS DECIMAL(18,12))) AS lam
        |  FROM w, tm GROUP BY 1, 2, 3)
        |SELECT k, round(mw, 6) + 0.0 AS weighted_mean,
        |  round((CAST(a_num AS DOUBLE) / (k - 1))
        |    / (1 + 2 * CAST(k - 2 AS DOUBLE)
        |       / (CAST(k AS DOUBLE) * k - 1) * CAST(lam AS DOUBLE)), 6)
        |    + 0.0 AS f_stat,
        |  k - 1 AS df1,
        |  round((CAST(k AS DOUBLE) * k - 1)
        |    / (3 * CAST(lam AS DOUBLE)), 6) + 0.0 AS df2
        |FROM agg""".stripMargin,
    "stats_ansari_bradley" ->
      """WITH g AS (
        |  SELECT "value" AS value,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS a,
        |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS b
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |  GROUP BY 1),
        |gt AS (SELECT *, a + b AS t FROM g),
        |tot AS (SELECT CAST(sum(a) AS BIGINT) AS n1,
        |          CAST(sum(b) AS BIGINT) AS n2,
        |          CAST(sum(a) + sum(b) AS BIGINT) AS nn FROM g),
        |r AS (SELECT *,
        |    COALESCE(sum(t) OVER (ORDER BY value
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1
        |      AS lo,
        |    COALESCE(sum(t) OVER (ORDER BY value
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + t
        |      AS hi
        |  FROM gt),
        |s AS (SELECT r.*, tot.n1, tot.n2, tot.nn,
        |    (tot.nn + 1) // 2 AS m FROM r, tot),
        |s2 AS (SELECT *, least(hi, m) AS ua,
        |    greatest(lo, m + 1) AS lb FROM s),
        |s3 AS (SELECT *,
        |    CASE WHEN ua >= lo THEN (lo + ua) * (ua - lo + 1) // 2
        |         ELSE 0 END
        |    + CASE WHEN hi >= lb THEN (nn + 1) * (hi - lb + 1)
        |        - (lb + hi) * (hi - lb + 1) // 2 ELSE 0 END AS sc
        |  FROM s2),
        |agg AS (SELECT n1, n2, nn,
        |    sum(CAST(round(a * (CAST(sc AS DOUBLE) / t), 9)
        |        AS DECIMAL(28,9))) AS t_a,
        |    CAST(sum(sc) AS BIGINT) AS s_all,
        |    sum(CAST(round(CAST(sc AS DOUBLE) * sc / t, 9)
        |        AS DECIMAL(28,9))) AS s2_all
        |  FROM s3 GROUP BY 1, 2, 3),
        |f AS (SELECT *, CAST(s_all AS DOUBLE) / nn AS sbar,
        |    CAST(s2_all AS DOUBLE) - nn * (CAST(s_all AS DOUBLE) / nn)
        |      * (CAST(s_all AS DOUBLE) / nn) AS varsum
        |  FROM agg)
        |SELECT n1, n2, round(CAST(t_a AS DOUBLE), 6) + 0.0 AS ab_stat,
        |  round(n1 * sbar, 6) + 0.0 AS expected,
        |  round((CAST(t_a AS DOUBLE) - n1 * sbar)
        |    / sqrt(CAST(n1 AS DOUBLE) * n2
        |      / (CAST(nn AS DOUBLE) * (nn - 1)) * varsum), 6) + 0.0 AS z
        |FROM f""".stripMargin,
    "window_obv" ->
      """WITH e AS (
        |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id,
        |    CAST(CAST("value" AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc
        |  FROM events),
        |bars AS (SELECT event_type, day,
        |    CAST(count(*) AS BIGINT) AS vol,
        |    max({'us': us, 'event_id': event_id, 'vc': vc}).vc AS c
        |  FROM e GROUP BY 1, 2),
        |fl AS (SELECT *,
        |    lag(c) OVER (PARTITION BY event_type ORDER BY day) AS pc
        |  FROM bars),
        |f2 AS (SELECT *,
        |    CASE WHEN pc IS NULL THEN 0
        |         WHEN c > pc THEN vol WHEN c < pc THEN -vol
        |         ELSE 0 END AS flow
        |  FROM fl)
        |SELECT event_type, day, vol,
        |  round(CAST(c AS DOUBLE) / 100, 6) + 0.0 AS close,
        |  CAST(flow AS BIGINT) AS flow,
        |  CAST(sum(flow) OVER (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS obv
        |FROM f2 ORDER BY event_type, day""".stripMargin,
    "window_vwap" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS vol,
        |    CAST(sum(CAST(CAST("value" AS DECIMAL(18,2)) * 100
        |      AS BIGINT)) AS BIGINT) AS pv
        |  FROM events GROUP BY 1, 2),
        |c AS (SELECT *,
        |    sum(pv) OVER w AS cum_pv, sum(vol) OVER w AS cum_vol
        |  FROM daily
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_type, day, vol,
        |  round(CAST(pv AS DOUBLE) / (100 * vol), 6) + 0.0 AS day_vwap,
        |  round(CAST(cum_pv AS DOUBLE) / (100 * cum_vol), 6) + 0.0
        |    AS cum_vwap
        |FROM c ORDER BY event_type, day""".stripMargin,
    "stats_cliff_delta" ->
      """WITH g AS (
        |  SELECT "value" AS value,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS a,
        |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS b
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |  GROUP BY 1),
        |c AS (SELECT *,
        |    COALESCE(sum(b) OVER (ORDER BY value
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cb_before,
        |    COALESCE(sum(b) OVER (ORDER BY value
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + b
        |      AS cb_thru
        |  FROM g),
        |tot AS (SELECT CAST(sum(a) AS BIGINT) AS n1,
        |          CAST(sum(b) AS BIGINT) AS n2 FROM g),
        |d AS (SELECT n1, n2,
        |        CAST(sum(a * cb_before) AS BIGINT) AS n_gt,
        |        CAST(sum(a * (n2 - cb_thru)) AS BIGINT) AS n_lt
        |      FROM c, tot GROUP BY 1, 2),
        |f AS (SELECT *,
        |        round(CAST(n_gt - n_lt AS DOUBLE) / (n1 * n2), 6) + 0.0
        |          AS delta
        |      FROM d)
        |SELECT n1, n2, n_gt, n_lt, delta,
        |  CASE WHEN abs(delta) < 0.147 THEN 'negligible'
        |       WHEN abs(delta) < 0.33 THEN 'small'
        |       WHEN abs(delta) < 0.474 THEN 'medium'
        |       ELSE 'large' END AS magnitude
        |FROM f""".stripMargin,
    "stats_mood_median" ->
      """WITH g AS (SELECT "value" AS value, count(*) AS t
        |           FROM events GROUP BY 1),
        |c AS (SELECT value,
        |        sum(t) OVER (ORDER BY value
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |          AS cum
        |      FROM g),
        |tot AS (SELECT CAST(sum(t) AS BIGINT) AS nn FROM g),
        |med AS (SELECT (min(CASE WHEN cum >= (nn + 1) // 2
        |            THEN value END)
        |          + min(CASE WHEN cum >= (nn + 2) // 2 THEN value END))
        |          / 2 AS med
        |        FROM c, tot),
        |cnt AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |          CAST(sum(CASE WHEN "value" > med.med THEN 1 ELSE 0 END)
        |            AS BIGINT) AS above
        |        FROM events, med GROUP BY 1),
        |ct AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |         CAST(sum(n) AS BIGINT) AS nn,
        |         CAST(sum(above) AS BIGINT) AS ta FROM cnt),
        |cell AS (SELECT k, nn, ta, n, above,
        |           CAST(n * ta AS DOUBLE) / nn AS e_above,
        |           CAST(n * (nn - ta) AS DOUBLE) / nn AS e_below
        |         FROM cnt, ct),
        |x AS (SELECT k, nn, ta,
        |        sum(CAST(round((above - e_above) * (above - e_above)
        |          / e_above + ((n - above) - e_below)
        |          * ((n - above) - e_below) / e_below, 9)
        |          AS DECIMAL(18,9))) AS chi2d
        |      FROM cell GROUP BY 1, 2, 3)
        |SELECT k, nn AS n, round(med.med, 6) + 0.0 AS grand_median,
        |  ta AS n_above, round(CAST(chi2d AS DOUBLE), 6) + 0.0 AS chi2,
        |  k - 1 AS df
        |FROM x, med""".stripMargin,
    "window_atr" ->
      """WITH e AS (
        |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id,
        |    CAST(CAST("value" AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc
        |  FROM events),
        |bars AS (SELECT event_type, day,
        |    CAST(max(vc) AS BIGINT) AS h, CAST(min(vc) AS BIGINT) AS l,
        |    max({'us': us, 'event_id': event_id, 'vc': vc}).vc AS c
        |  FROM e GROUP BY 1, 2),
        |tr AS (SELECT *,
        |    row_number() OVER (PARTITION BY event_type ORDER BY day)
        |      AS rn,
        |    lag(c) OVER (PARTITION BY event_type ORDER BY day) AS pc
        |  FROM bars),
        |t2 AS (SELECT *,
        |    greatest(h - l, abs(h - pc), abs(l - pc)) AS tr FROM tr),
        |t3 AS (SELECT *,
        |    sum(tr) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS atr_c
        |  FROM t2)
        |SELECT event_type, day,
        |  round(CAST(h AS DOUBLE) / 100, 6) + 0.0 AS high,
        |  round(CAST(l AS DOUBLE) / 100, 6) + 0.0 AS low,
        |  round(CAST(c AS DOUBLE) / 100, 6) + 0.0 AS close,
        |  round(CAST(tr AS DOUBLE) / 100, 6) + 0.0 AS true_range,
        |  round(CAST(atr_c AS DOUBLE) / 1400, 6) + 0.0 AS atr14
        |FROM t3 WHERE rn >= 15 ORDER BY event_type, day""".stripMargin,
    "window_ichimoku" ->
      """WITH e AS (
        |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id,
        |    CAST(CAST("value" AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc
        |  FROM events),
        |bars AS (SELECT event_type, day,
        |    CAST(max(vc) AS BIGINT) AS h, CAST(min(vc) AS BIGINT) AS l,
        |    max({'us': us, 'event_id': event_id, 'vc': vc}).vc AS c
        |  FROM e GROUP BY 1, 2),
        |w AS (SELECT *, row_number() OVER wo AS rn,
        |    max(h) OVER w9 AS th, min(l) OVER w9 AS tl,
        |    max(h) OVER w26 AS kh, min(l) OVER w26 AS kl
        |  FROM bars
        |  WINDOW wo AS (PARTITION BY event_type ORDER BY day),
        |    w9 AS (PARTITION BY event_type ORDER BY day
        |           ROWS BETWEEN 8 PRECEDING AND CURRENT ROW),
        |    w26 AS (PARTITION BY event_type ORDER BY day
        |            ROWS BETWEEN 25 PRECEDING AND CURRENT ROW)),
        |f AS (SELECT *,
        |    round(CAST(th + tl AS DOUBLE) / 200, 6) + 0.0 AS t6,
        |    round(CAST(kh + kl AS DOUBLE) / 200, 6) + 0.0 AS k6
        |  FROM w WHERE rn >= 26)
        |SELECT event_type, day,
        |  round(CAST(c AS DOUBLE) / 100, 6) + 0.0 AS close,
        |  t6 AS tenkan9, k6 AS kijun26,
        |  round((CAST(th + tl AS DOUBLE) / 200
        |    + CAST(kh + kl AS DOUBLE) / 200) / 2, 6) + 0.0 AS senkou_a,
        |  t6 > k6 AS bullish_cross
        |FROM f ORDER BY event_type, day""".stripMargin,
    "window_chandelier_exit" ->
      """WITH e AS (
        |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id,
        |    CAST(CAST("value" AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc
        |  FROM events),
        |bars AS (SELECT event_type, day,
        |    CAST(max(vc) AS BIGINT) AS h, CAST(min(vc) AS BIGINT) AS l,
        |    max({'us': us, 'event_id': event_id, 'vc': vc}).vc AS c
        |  FROM e GROUP BY 1, 2),
        |t1 AS (SELECT *, row_number() OVER wo AS rn, lag(c) OVER wo AS pc
        |  FROM bars WINDOW wo AS (PARTITION BY event_type ORDER BY day)),
        |t2 AS (SELECT *,
        |    greatest(h - l, abs(h - pc), abs(l - pc)) AS tr FROM t1),
        |t3 AS (SELECT *, max(h) OVER w22 AS hh, sum(tr) OVER w22 AS atr_c
        |  FROM t2
        |  WINDOW w22 AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 21 PRECEDING AND CURRENT ROW)),
        |f AS (SELECT *,
        |    round(CAST(hh AS DOUBLE) / 100
        |      - 3.0 * (CAST(atr_c AS DOUBLE) / 2200), 6) + 0.0 AS stop6
        |  FROM t3 WHERE rn >= 23)
        |SELECT event_type, day,
        |  round(CAST(c AS DOUBLE) / 100, 6) + 0.0 AS close,
        |  round(CAST(hh AS DOUBLE) / 100, 6) + 0.0 AS hh22,
        |  round(CAST(atr_c AS DOUBLE) / 2200, 6) + 0.0 AS atr22,
        |  stop6 AS chandelier_stop,
        |  CAST(c AS DOUBLE) / 100 < stop6 AS exit_long
        |FROM f ORDER BY event_type, day""".stripMargin,
    "window_williams_r" ->
      """WITH e AS (
        |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id,
        |    CAST(CAST("value" AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc
        |  FROM events),
        |bars AS (SELECT event_type, day,
        |    CAST(max(vc) AS BIGINT) AS h, CAST(min(vc) AS BIGINT) AS l,
        |    max({'us': us, 'event_id': event_id, 'vc': vc}).vc AS c
        |  FROM e GROUP BY 1, 2),
        |w AS (SELECT *,
        |    row_number() OVER wo AS rn,
        |    max(h) OVER w14 AS hh, min(l) OVER w14 AS ll
        |  FROM bars
        |  WINDOW wo AS (PARTITION BY event_type ORDER BY day),
        |    w14 AS (PARTITION BY event_type ORDER BY day
        |            ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
        |SELECT event_type, day,
        |  round(CAST(c AS DOUBLE) / 100, 6) + 0.0 AS close,
        |  round(CAST(hh AS DOUBLE) / 100, 6) + 0.0 AS hh14,
        |  round(CAST(ll AS DOUBLE) / 100, 6) + 0.0 AS ll14,
        |  round(-100.0 * CAST(hh - c AS DOUBLE)
        |    / CAST(hh - ll AS DOUBLE), 6) + 0.0 AS williams_r
        |FROM w WHERE rn >= 14 AND hh > ll
        |ORDER BY event_type, day""".stripMargin,
    "window_mfi" ->
      """WITH e AS (
        |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id,
        |    CAST(CAST("value" AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc
        |  FROM events),
        |bars AS (SELECT event_type, day,
        |    CAST(max(vc) AS BIGINT) AS h, CAST(min(vc) AS BIGINT) AS l,
        |    max({'us': us, 'event_id': event_id, 'vc': vc}).vc AS c,
        |    CAST(count(*) AS BIGINT) AS vol
        |  FROM e GROUP BY 1, 2),
        |tp AS (SELECT *, h + l + c AS tpc,
        |    row_number() OVER (PARTITION BY event_type ORDER BY day)
        |      AS rn,
        |    lag(h + l + c) OVER (PARTITION BY event_type ORDER BY day)
        |      AS ptpc
        |  FROM bars),
        |fl AS (SELECT *,
        |    CASE WHEN tpc > ptpc THEN tpc * vol ELSE 0 END AS pos,
        |    CASE WHEN tpc < ptpc THEN tpc * vol ELSE 0 END AS neg
        |  FROM tp),
        |s AS (SELECT *,
        |    sum(pos) OVER w14 AS p14, sum(neg) OVER w14 AS n14
        |  FROM fl
        |  WINDOW w14 AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
        |SELECT event_type, day, vol,
        |  round(CAST(tpc AS DOUBLE) / 300, 6) + 0.0 AS typical_price,
        |  round(100.0 * CAST(p14 AS DOUBLE) / CAST(p14 + n14 AS DOUBLE),
        |    6) + 0.0 AS mfi14,
        |  100.0 * CAST(p14 AS DOUBLE) / CAST(p14 + n14 AS DOUBLE) > 80.0
        |    AS overbought,
        |  100.0 * CAST(p14 AS DOUBLE) / CAST(p14 + n14 AS DOUBLE) < 20.0
        |    AS oversold
        |FROM s WHERE rn >= 15 AND p14 + n14 > 0
        |ORDER BY event_type, day""".stripMargin,
    "window_aroon" -> (duckDailyTyped +
      """r AS (SELECT event_type, day, revc,
        |    CAST(row_number() OVER (PARTITION BY event_type
        |      ORDER BY day) AS BIGINT) AS rn
        |  FROM daily),
        |w AS (SELECT *,
        |    max({'revc': revc, 'rn': rn}) OVER (PARTITION BY event_type
        |      ORDER BY rn ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
        |      AS hi,
        |    min({'revc': revc, 'nrn': -rn}) OVER (PARTITION BY event_type
        |      ORDER BY rn ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
        |      AS lo
        |  FROM r)
        |SELECT event_type, day, revc,
        |  rn - hi.rn AS ps_high, rn + lo.nrn AS ps_low,
        |  round(100 * CAST(14 - (rn - hi.rn) AS DOUBLE) / 14, 6) + 0.0
        |    AS aroon_up,
        |  round(100 * CAST(14 - (rn + lo.nrn) AS DOUBLE) / 14, 6) + 0.0
        |    AS aroon_down,
        |  round(100 * (CAST(14 - (rn - hi.rn) AS DOUBLE) / 14
        |    - CAST(14 - (rn + lo.nrn) AS DOUBLE) / 14), 6) + 0.0
        |    AS aroon_osc
        |FROM w WHERE rn >= 14 ORDER BY event_type, day""".stripMargin),
    "stats_bartlett" ->
      """WITH g AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS s1,
        |    CAST(sum(CAST("value" AS DECIMAL(18,2))
        |             * CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS s2
        |  FROM events GROUP BY 1),
        |v AS (SELECT *, (n * s2 - s1 * s1)
        |        / (CAST(n AS DOUBLE) * (n - 1)) AS vi FROM g),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |        CAST(sum(n) AS BIGINT) AS nn,
        |        sum(CAST(round((n - 1) * vi, 6) AS DECIMAL(18,6)))
        |          AS sp_num,
        |        sum(CAST(round((n - 1) * ln(vi), 9) AS DECIMAL(18,9)))
        |          AS t_lnv,
        |        sum(CAST(round(CAST(1 AS DOUBLE) / (n - 1), 12)
        |            AS DECIMAL(18,12))) AS c_sum
        |      FROM v),
        |s AS (SELECT *, CAST(sp_num AS DOUBLE) / (nn - k) AS sp2 FROM t)
        |SELECT k, nn AS n, round(sp2, 6) + 0.0 AS pooled_var,
        |  round((nn - k) * ln(sp2) - CAST(t_lnv AS DOUBLE), 6) + 0.0
        |    AS t_stat,
        |  round(1 + (CAST(c_sum AS DOUBLE) - CAST(1 AS DOUBLE) / (nn - k))
        |    / (3 * (k - 1)), 6) + 0.0 AS c_factor,
        |  round(((nn - k) * ln(sp2) - CAST(t_lnv AS DOUBLE))
        |    / (1 + (CAST(c_sum AS DOUBLE) - CAST(1 AS DOUBLE) / (nn - k))
        |       / (3 * (k - 1))), 6) + 0.0 AS stat
        |FROM s""".stripMargin,
    "stats_wasserstein" ->
      """WITH g AS (
        |  SELECT "value" AS value,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS a,
        |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS b
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |  GROUP BY 1),
        |c AS (SELECT value,
        |        sum(a) OVER (ORDER BY value
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
        |        sum(b) OVER (ORDER BY value
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb,
        |        lead(value) OVER (ORDER BY value) AS nextv
        |      FROM g),
        |tot AS (SELECT CAST(sum(a) AS BIGINT) AS n1,
        |          CAST(sum(b) AS BIGINT) AS n2 FROM g),
        |tm AS (SELECT n1, n2,
        |         CAST(round(abs(CAST(ca AS DOUBLE) / n1
        |           - CAST(cb AS DOUBLE) / n2) * (nextv - value), 9)
        |           AS DECIMAL(18,9)) AS term
        |       FROM c, tot WHERE nextv IS NOT NULL)
        |SELECT n1, n2,
        |  round(CAST(sum(term) AS DOUBLE), 6) + 0.0 AS w1_dist
        |FROM tm GROUP BY 1, 2""".stripMargin,
    "dist_theil" -> (duckUserSpendPos +
      """t AS (SELECT n, mu,
        |        CAST(round(xc / mu * ln(xc / mu), 9) AS DECIMAL(18,9))
        |          AS tt,
        |        CAST(round(ln(mu / xc), 9) AS DECIMAL(18,9)) AS tl
        |      FROM spend, tot)
        |SELECT n AS n_users, round(mu, 6) + 0.0 AS mean_cents,
        |  round(CAST(sum(tt) AS DOUBLE) / n, 6) + 0.0 AS theil_t,
        |  round(CAST(sum(tl) AS DOUBLE) / n, 6) + 0.0 AS theil_l
        |FROM t GROUP BY n, mu""".stripMargin),
    "dist_atkinson" -> (duckUserSpendPos +
      """t AS (SELECT n, mu,
        |        CAST(round(sqrt(xc / mu), 9) AS DECIMAL(18,9)) AS th,
        |        CAST(round(ln(CAST(xc AS DOUBLE)), 9) AS DECIMAL(18,9))
        |          AS tg,
        |        CAST(round(mu / xc, 9) AS DECIMAL(18,9)) AS tr
        |      FROM spend, tot)
        |SELECT n AS n_users, round(mu, 6) + 0.0 AS mean_cents,
        |  round(1 - CAST(sum(th) AS DOUBLE) / n
        |    * (CAST(sum(th) AS DOUBLE) / n), 6) + 0.0 AS a_eps_half,
        |  round(1 - exp(CAST(sum(tg) AS DOUBLE) / n) / mu, 6) + 0.0
        |    AS a_eps_1,
        |  round(1 - CAST(n AS DOUBLE) / CAST(sum(tr) AS DOUBLE), 6)
        |    + 0.0 AS a_eps_2
        |FROM t GROUP BY n, mu""".stripMargin),
    "stats_mann_kendall" -> (duckDailyTyped +
      """s AS (SELECT a.event_type,
        |        CAST(sum(CASE WHEN b.revc > a.revc THEN 1
        |                      WHEN b.revc < a.revc THEN -1
        |                      ELSE 0 END) AS BIGINT) AS s_stat
        |      FROM daily a JOIN daily b
        |        ON a.event_type = b.event_type AND b.dayno > a.dayno
        |      GROUP BY 1),
        |tg AS (SELECT event_type, revc, CAST(count(*) AS BIGINT) AS t
        |       FROM daily GROUP BY 1, 2),
        |ti AS (SELECT event_type, CAST(sum(t) AS BIGINT) AS n_days,
        |         CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT)
        |           AS tie_term
        |       FROM tg GROUP BY 1),
        |v AS (SELECT s.event_type, ti.n_days, s.s_stat,
        |        CAST(ti.n_days * (ti.n_days - 1) * (2 * ti.n_days + 5)
        |             - ti.tie_term AS DOUBLE) / 18 AS var_s
        |      FROM s JOIN ti USING (event_type))
        |SELECT event_type, n_days, s_stat,
        |  round(var_s, 6) + 0.0 AS var_s,
        |  round(CAST(2 * s_stat AS DOUBLE) / (n_days * (n_days - 1)), 6)
        |    + 0.0 AS tau_a,
        |  round(CASE WHEN s_stat > 0
        |          THEN CAST(s_stat - 1 AS DOUBLE) / sqrt(var_s)
        |        WHEN s_stat < 0
        |          THEN CAST(s_stat + 1 AS DOUBLE) / sqrt(var_s)
        |        ELSE 0.0 END, 6) + 0.0 AS z
        |FROM v ORDER BY event_type""".stripMargin),
    "stats_pettitt" -> (duckDailyTyped +
      """v AS (SELECT a.event_type, a.dayno,
        |        CAST(sum(CASE WHEN b.revc > a.revc THEN 1
        |                      WHEN b.revc < a.revc THEN -1
        |                      ELSE 0 END) AS BIGINT) AS vt
        |      FROM daily a JOIN daily b
        |        ON a.event_type = b.event_type AND b.dayno <> a.dayno
        |      GROUP BY 1, 2),
        |u AS (SELECT event_type, dayno,
        |        sum(vt) OVER (PARTITION BY event_type ORDER BY dayno
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |          AS ut
        |      FROM v),
        |n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
        |      FROM daily GROUP BY 1),
        |rk AS (SELECT event_type, dayno, abs(ut) AS k,
        |         row_number() OVER (PARTITION BY event_type
        |           ORDER BY abs(ut) DESC, dayno) AS rn
        |       FROM u)
        |SELECT rk.event_type, n.n_days, CAST(rk.k AS BIGINT) AS k_stat,
        |  DATE '1970-01-01' + CAST(rk.dayno AS INTEGER) AS cp_day,
        |  round(least(2 * exp(CAST(-6 * rk.k * rk.k AS DOUBLE)
        |    / (CAST(n.n_days AS DOUBLE) * n.n_days * n.n_days
        |       + CAST(n.n_days AS DOUBLE) * n.n_days)), 1.0), 6) + 0.0
        |    AS p_approx
        |FROM rk JOIN n USING (event_type) WHERE rk.rn = 1
        |ORDER BY event_type""".stripMargin),
    "stats_qq_normal" ->
      s"""WITH daily AS (
         |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
         |    CAST(sum(CAST("value" AS DECIMAL(18,2))) * 100 AS BIGINT)
         |      AS revc
         |  FROM events GROUP BY 1),
         |mo AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(revc) AS BIGINT) AS s,
         |    sum(CAST(revc AS DECIMAL(28,0)) * revc) AS s2
         |  FROM daily),
         |mm AS (SELECT *, CAST(s AS DOUBLE) / n AS m,
         |    sqrt(CAST(n * s2 - CAST(s AS DECIMAL(28,0)) * s AS DOUBLE)
         |      / (CAST(n AS DOUBLE) * (n - 1))) AS sd
         |  FROM mo),
         |qs AS (SELECT 1 AS decile, quantile_cont(revc, 0.1) AS q FROM daily
         |  UNION ALL SELECT 2 AS decile, quantile_cont(revc, 0.2) AS q FROM daily
         |  UNION ALL SELECT 3 AS decile, quantile_cont(revc, 0.3) AS q FROM daily
         |  UNION ALL SELECT 4 AS decile, quantile_cont(revc, 0.4) AS q FROM daily
         |  UNION ALL SELECT 5 AS decile, quantile_cont(revc, 0.5) AS q FROM daily
         |  UNION ALL SELECT 6 AS decile, quantile_cont(revc, 0.6) AS q FROM daily
         |  UNION ALL SELECT 7 AS decile, quantile_cont(revc, 0.7) AS q FROM daily
         |  UNION ALL SELECT 8 AS decile, quantile_cont(revc, 0.8) AS q FROM daily
         |  UNION ALL SELECT 9 AS decile, quantile_cont(revc, 0.9) AS q FROM daily),
         |zl AS (SELECT * FROM (VALUES $duckNormalDeciles)
         |       AS t(decile, z_normal))
         |SELECT CAST(q.decile AS INTEGER) AS decile,
         |  round((q.q - mm.m) / mm.sd, 6) + 0.0 AS z_empirical,
         |  round(zl.z_normal, 6) + 0.0 AS z_normal,
         |  round((q.q - mm.m) / mm.sd - zl.z_normal, 6) + 0.0 AS gap
         |FROM qs q JOIN zl ON q.decile = zl.decile CROSS JOIN mm
         |ORDER BY decile""".stripMargin,
    "stats_grubbs" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    CAST(CAST(ts AS TIMESTAMP) AS DATE) - DATE '1970-01-01'
        |      AS dayno,
        |    CAST(sum(CAST("value" AS DECIMAL(18,2))) * 100 AS BIGINT)
        |      AS revc
        |  FROM events GROUP BY 1, 2, 3),
        |mo AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(revc) AS BIGINT) AS s,
        |    sum(CAST(revc AS DECIMAL(28,0)) * revc) AS s2
        |  FROM daily GROUP BY 1),
        |mm AS (SELECT *, CAST(s AS DOUBLE) / n AS m,
        |    sqrt(CAST(n * s2 - CAST(s AS DECIMAL(28,0)) * s AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * (n - 1))) AS sd
        |  FROM mo),
        |dv AS (SELECT d.event_type, mm.n, d.dayno,
        |    round(abs(d.revc - mm.m) / mm.sd, 6) AS dev
        |  FROM daily d JOIN mm USING (event_type)),
        |rk AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |        ORDER BY dev DESC, dayno) AS rn FROM dv)
        |SELECT event_type, n AS n_days, round(dev, 6) + 0.0 AS g_stat,
        |  DATE '1970-01-01' + CAST(dayno AS INTEGER) AS outlier_day
        |FROM rk WHERE rn = 1 ORDER BY event_type""".stripMargin,
    "forecast_croston" ->
      s"""WITH RECURSIVE dem AS (
         |  SELECT l_partkey AS part,
         |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
         |         AS BIGINT) AS dayno,
         |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS d
         |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
         |  GROUP BY 1, 2),
         |s AS (SELECT part, dayno, d,
         |    row_number() OVER (PARTITION BY part ORDER BY dayno) AS t,
         |    count(*) OVER (PARTITION BY part) AS n
         |  FROM dem),
         |el AS (SELECT * FROM s WHERE n >= 3),
         |rec AS (
         |  SELECT part, n, 2 AS t,
         |    CAST($CrostonA AS DOUBLE) * max(CASE WHEN t = 2 THEN d END)
         |      + (1.0 - CAST($CrostonA AS DOUBLE))
         |        * max(CASE WHEN t = 1 THEN d END) AS z,
         |    CAST(max(CASE WHEN t = 2 THEN dayno END)
         |      - max(CASE WHEN t = 1 THEN dayno END) AS DOUBLE) AS p,
         |    max(CASE WHEN t = 2 THEN dayno END) AS pt
         |  FROM el GROUP BY part, n
         |  UNION ALL
         |  SELECT r.part, r.n, r.t + 1,
         |    CAST($CrostonA AS DOUBLE) * pp.d
         |      + (1.0 - CAST($CrostonA AS DOUBLE)) * r.z,
         |    CAST($CrostonA AS DOUBLE) * CAST(pp.dayno - r.pt AS DOUBLE)
         |      + (1.0 - CAST($CrostonA AS DOUBLE)) * r.p,
         |    pp.dayno
         |  FROM rec r JOIN el pp
         |    ON pp.part = r.part AND pp.t = r.t + 1
         |  WHERE r.t < r.n),
         |fin AS (SELECT part, CAST(n AS BIGINT) AS n_points,
         |    round(z, 6) + 0.0 AS z_size, round(p, 6) + 0.0 AS p_interval,
         |    round(z / p, 6) + 0.0 AS rate_per_day
         |  FROM rec WHERE t = n)
         |SELECT part, n_points, z_size, p_interval, rate_per_day
         |FROM fin ORDER BY n_points DESC, part LIMIT 50""".stripMargin,
    "forecast_sba" ->
      s"""WITH RECURSIVE dem AS (
         |  SELECT l_partkey AS part,
         |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
         |         AS BIGINT) AS dayno,
         |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS dd
         |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
         |  GROUP BY 1, 2),
         |s AS (SELECT part, dayno, CAST(dd AS DOUBLE) AS d,
         |    row_number() OVER (PARTITION BY part ORDER BY dayno) AS t,
         |    count(*) OVER (PARTITION BY part) AS n
         |  FROM dem),
         |el AS (SELECT * FROM s WHERE n >= 3),
         |rec AS (
         |  SELECT part, n, 2 AS t,
         |    CAST($CrostonA AS DOUBLE) * max(CASE WHEN t = 2 THEN d END)
         |      + (1.0 - CAST($CrostonA AS DOUBLE))
         |        * max(CASE WHEN t = 1 THEN d END) AS z,
         |    CAST(max(CASE WHEN t = 2 THEN dayno END)
         |      - max(CASE WHEN t = 1 THEN dayno END) AS DOUBLE) AS p,
         |    max(CASE WHEN t = 2 THEN dayno END) AS pt
         |  FROM el GROUP BY part, n
         |  UNION ALL
         |  SELECT r.part, r.n, r.t + 1,
         |    CAST($CrostonA AS DOUBLE) * pp.d
         |      + (1.0 - CAST($CrostonA AS DOUBLE)) * r.z,
         |    CAST($CrostonA AS DOUBLE) * CAST(pp.dayno - r.pt AS DOUBLE)
         |      + (1.0 - CAST($CrostonA AS DOUBLE)) * r.p,
         |    pp.dayno
         |  FROM rec r JOIN el pp
         |    ON pp.part = r.part AND pp.t = r.t + 1
         |  WHERE r.t < r.n),
         |mom AS (SELECT part, CAST(count(*) AS BIGINT) AS n,
         |    sum(dd) AS s1,
         |    sum(CAST(dd AS DECIMAL(18,2)) * CAST(dd AS DECIMAL(18,2)))
         |      AS s2,
         |    min(dayno) AS mn, max(dayno) AS mx
         |  FROM dem GROUP BY 1),
         |fin AS (SELECT r.part, CAST(r.n AS BIGINT) AS n_points,
         |    round(z / p, 6) + 0.0 AS croston_rate,
         |    round(0.95 * (z / p), 6) + 0.0 AS sba_rate,
         |    round(CAST(mx - mn AS DOUBLE) / (m.n - 1), 6) + 0.0
         |      AS mean_interval,
         |    round((CAST(m.n AS DOUBLE) * CAST(s2 AS DOUBLE)
         |        - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
         |      / (CAST(m.n AS DOUBLE) * (m.n - 1))
         |      / ((CAST(s1 AS DOUBLE) / m.n)
         |         * (CAST(s1 AS DOUBLE) / m.n)), 6) + 0.0 AS cv2_size
         |  FROM rec r JOIN mom m ON m.part = r.part
         |  WHERE r.t = r.n)
         |SELECT part, n_points, croston_rate, sba_rate, mean_interval,
         |  cv2_size,
         |  CASE WHEN mean_interval < 1.32 AND cv2_size < 0.49
         |         THEN 'smooth'
         |       WHEN mean_interval >= 1.32 AND cv2_size < 0.49
         |         THEN 'intermittent'
         |       WHEN mean_interval < 1.32 THEN 'erratic'
         |       ELSE 'lumpy' END AS demand_class
         |FROM fin ORDER BY n_points DESC, part LIMIT 50""".stripMargin,
    "forecast_drift" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    sum(CAST("value" AS DECIMAL(18,2))) AS v
        |  FROM events GROUP BY 1, 2),
        |p AS (SELECT *, row_number() OVER wo AS t,
        |    first_value(v) OVER wo2 AS v1
        |  FROM daily
        |  WINDOW wo AS (PARTITION BY event_type ORDER BY day),
        |    wo2 AS (PARTITION BY event_type ORDER BY day
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |f AS (SELECT event_type, day + 1 AS day,
        |    CAST(v AS DOUBLE)
        |      + (CAST(v AS DOUBLE) - CAST(v1 AS DOUBLE)) / (t - 1) AS f,
        |    v AS vprev
        |  FROM p WHERE t >= 2),
        |j AS (SELECT d.event_type,
        |    CAST(round(abs(CAST(d.v AS DOUBLE) - f.f), 9)
        |         AS DECIMAL(28,9)) AS ed,
        |    abs(d.v - f.vprev) AS en
        |  FROM daily d JOIN f
        |    ON f.event_type = d.event_type AND f.day = d.day),
        |g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_eval,
        |    sum(ed) AS sd, sum(en) AS sn
        |  FROM j GROUP BY 1)
        |SELECT event_type, n_eval,
        |  round(CAST(sd AS DOUBLE) / n_eval, 6) + 0.0 AS mae_drift,
        |  round(CAST(sn AS DOUBLE) / n_eval, 6) + 0.0 AS mae_naive,
        |  round(CAST(sd AS DOUBLE) / CAST(sn AS DOUBLE), 6) + 0.0
        |    AS rel_mae
        |FROM g ORDER BY event_type""".stripMargin,
    "stats_breusch_pagan" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS dayno,
        |    CAST(sum(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS v
        |  FROM events GROUP BY 1, 2),
        |fit AS (SELECT event_type,
        |    regr_slope(v, CAST(dayno AS DOUBLE)) AS b,
        |    regr_intercept(v, CAST(dayno AS DOUBLE)) AS a
        |  FROM daily GROUP BY 1),
        |e AS (SELECT d.event_type, d.dayno,
        |    CAST(round(d.v - (f.a + f.b * CAST(d.dayno AS DOUBLE)), 6)
        |         AS DECIMAL(24,6)) AS e
        |  FROM daily d JOIN fit f USING (event_type)),
        |m AS (SELECT event_type, dayno,
        |    CAST(round(CAST(e AS DOUBLE) * CAST(e AS DOUBLE) * 1000000,
        |               0) AS DECIMAL(18,0)) AS e2m
        |  FROM e),
        |s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(dayno AS DECIMAL(18,0))) AS sx,
        |    sum(CAST(dayno AS DECIMAL(18,0))
        |      * CAST(dayno AS DECIMAL(18,0))) AS sx2,
        |    sum(e2m) AS se,
        |    sum(CAST(e2m AS DECIMAL(28,0)) * e2m) AS se2,
        |    sum(CAST(dayno AS DECIMAL(18,0)) * e2m) AS sxe
        |  FROM m GROUP BY 1),
        |r AS (SELECT *,
        |    (CAST(n * sxe - sx * se AS DOUBLE)
        |      * CAST(n * sxe - sx * se AS DOUBLE))
        |    / (CAST(n * sx2 - sx * sx AS DOUBLE)
        |      * CAST(n * se2 - se * se AS DOUBLE)) AS r2
        |  FROM s)
        |SELECT event_type, n, round(n * r2, 6) + 0.0 AS lm_stat,
        |  n * r2 > 3.841459 AS heteroscedastic
        |FROM r ORDER BY event_type""".stripMargin,
    "window_macd" ->
      s"""WITH daily AS (
         |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
         |    CAST(sum(CAST("value" AS DECIMAL(18,2))) * 100 AS BIGINT)
         |      AS revc
         |  FROM events GROUP BY 1, 2),
         |h AS (SELECT event_type, day,
         |    list(CAST(revc AS DOUBLE))
         |      OVER (wo ROWS BETWEEN 11 PRECEDING AND CURRENT ROW)
         |      AS h12,
         |    list(CAST(revc AS DOUBLE))
         |      OVER (wo ROWS BETWEEN 25 PRECEDING AND CURRENT ROW)
         |      AS h26
         |  FROM daily
         |  WINDOW wo AS (PARTITION BY event_type ORDER BY day)),
         |m AS (SELECT event_type, day,
         |    round(${duckEma("h12", MacdD12, MacdA12)}
         |      - ${duckEma("h26", MacdD26, MacdA26)}, 6) + 0.0 AS macd
         |  FROM h),
         |s AS (SELECT event_type, day, macd,
         |    list(macd) OVER (wo ROWS BETWEEN 8 PRECEDING AND CURRENT ROW)
         |      AS h9
         |  FROM m WINDOW wo AS (PARTITION BY event_type ORDER BY day)),
         |f AS (SELECT event_type, day, macd,
         |    round(${duckEma("h9", MacdD9, MacdA9)}, 6) + 0.0 AS signal
         |  FROM s)
         |SELECT event_type, day, macd, signal,
         |  round(macd - signal, 6) + 0.0 AS histogram
         |FROM f ORDER BY event_type, day""".stripMargin,
    "window_keltner" ->
      s"""WITH e AS (
         |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
         |    epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id,
         |    CAST(CAST("value" AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc
         |  FROM events),
         |bars AS (SELECT event_type, day,
         |    CAST(max(vc) AS BIGINT) AS h, CAST(min(vc) AS BIGINT) AS l,
         |    max({'us': us, 'event_id': event_id, 'vc': vc}).vc AS c
         |  FROM e GROUP BY 1, 2),
         |t1 AS (SELECT *, row_number() OVER wo AS rn,
         |    lag(c) OVER wo AS pc, CAST(h + l + c AS DOUBLE) / 3 AS tpd
         |  FROM bars
         |  WINDOW wo AS (PARTITION BY event_type ORDER BY day)),
         |t2 AS (SELECT *,
         |    greatest(h - l, abs(h - pc), abs(l - pc)) AS tr FROM t1),
         |t3 AS (SELECT *, list(tpd) OVER w20 AS h20,
         |    sum(tr) OVER w10 AS atr_c
         |  FROM t2
         |  WINDOW w20 AS (PARTITION BY event_type ORDER BY day
         |      ROWS BETWEEN 19 PRECEDING AND CURRENT ROW),
         |    w10 AS (PARTITION BY event_type ORDER BY day
         |      ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)),
         |t4 AS (SELECT *,
         |    round((${duckEma("h20", KeltD, KeltA)}) / 100, 6) + 0.0
         |      AS mid6,
         |    round(CAST(atr_c AS DOUBLE) / 1000, 6) + 0.0 AS atr6
         |  FROM t3 WHERE rn >= 20),
         |t5 AS (SELECT *, round(mid6 + 2.0 * atr6, 6) + 0.0 AS up6,
         |    round(mid6 - 2.0 * atr6, 6) + 0.0 AS lo6
         |  FROM t4)
         |SELECT event_type, day,
         |  round(CAST(c AS DOUBLE) / 100, 6) + 0.0 AS close,
         |  mid6 AS mid_ema20, atr6 AS atr10, up6 AS upper, lo6 AS lower,
         |  CAST(c AS DOUBLE) / 100 > up6 AS above_upper,
         |  CAST(c AS DOUBLE) / 100 < lo6 AS below_lower
         |FROM t5 ORDER BY event_type, day""".stripMargin,
    "window_heikin_ashi" ->
      """WITH e AS (
        |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id,
        |    CAST(CAST("value" AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc
        |  FROM events),
        |bars AS (SELECT event_type, day,
        |    CAST(max(vc) AS BIGINT) AS h, CAST(min(vc) AS BIGINT) AS l,
        |    max({'us': us, 'event_id': event_id, 'vc': vc}).vc AS c
        |  FROM e GROUP BY 1, 2),
        |t1 AS (SELECT *, row_number() OVER wo AS rn,
        |    COALESCE(lag(c) OVER wo, c) AS o,
        |    first_value(c) OVER wo2 AS c1
        |  FROM bars
        |  WINDOW wo AS (PARTITION BY event_type ORDER BY day),
        |    wo2 AS (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |t2 AS (SELECT *, CAST(o + h + l + c AS DOUBLE) / 4 AS hc
        |  FROM t1),
        |t3 AS (SELECT *, list(hc) OVER (PARTITION BY event_type
        |    ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hist
        |  FROM t2),
        |t4 AS (SELECT *,
        |    CAST(c1 AS DOUBLE) * pow(0.5, rn - 1)
        |      + CASE WHEN rn = 1 THEN 0.0
        |          ELSE list_sum(list_transform(range(1, len(hist) + 1),
        |            k -> hist[k] * pow(0.5, len(hist) - k + 1))) END
        |      AS ho
        |  FROM t3),
        |t5 AS (SELECT *, round(ho / 100, 6) + 0.0 AS ho6,
        |    round(hc / 100, 6) + 0.0 AS hc6
        |  FROM t4)
        |SELECT event_type, day, ho6 AS ha_open, hc6 AS ha_close,
        |  round(greatest(CAST(h AS DOUBLE), ho, hc) / 100, 6) + 0.0
        |    AS ha_high,
        |  round(least(CAST(l AS DOUBLE), ho, hc) / 100, 6) + 0.0
        |    AS ha_low,
        |  hc6 > ho6 AS bullish
        |FROM t5 ORDER BY event_type, day""".stripMargin,
    "stats_two_prop_ci" ->
      """WITH g AS (
        |  SELECT ((user_id % 2147483648) * 2654435761 % 2147483648) % 2
        |      AS g,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |         AS BIGINT) AS r
        |  FROM events GROUP BY 1),
        |w AS (SELECT
        |    CAST(sum(CASE WHEN g = 0 THEN n END) AS BIGINT) AS n0,
        |    CAST(sum(CASE WHEN g = 0 THEN r END) AS BIGINT) AS r0,
        |    CAST(sum(CASE WHEN g = 1 THEN n END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN g = 1 THEN r END) AS BIGINT) AS r1
        |  FROM g),
        |p AS (SELECT *, CAST(r0 AS DOUBLE) / n0 AS p0,
        |    CAST(r1 AS DOUBLE) / n1 AS p1 FROM w),
        |se AS (SELECT *,
        |    sqrt(p0 * (1.0 - p0) / n0 + p1 * (1.0 - p1) / n1) AS se,
        |    (p0 + CAST(1.9208 AS DOUBLE) / n0
        |      - 1.96 * sqrt(p0 * (1.0 - p0) / n0
        |        + CAST(0.9604 AS DOUBLE) / (CAST(n0 AS DOUBLE) * n0)))
        |      / (1.0 + CAST(3.8416 AS DOUBLE) / n0) AS w0l,
        |    (p0 + CAST(1.9208 AS DOUBLE) / n0
        |      + 1.96 * sqrt(p0 * (1.0 - p0) / n0
        |        + CAST(0.9604 AS DOUBLE) / (CAST(n0 AS DOUBLE) * n0)))
        |      / (1.0 + CAST(3.8416 AS DOUBLE) / n0) AS w0u,
        |    (p1 + CAST(1.9208 AS DOUBLE) / n1
        |      - 1.96 * sqrt(p1 * (1.0 - p1) / n1
        |        + CAST(0.9604 AS DOUBLE) / (CAST(n1 AS DOUBLE) * n1)))
        |      / (1.0 + CAST(3.8416 AS DOUBLE) / n1) AS w1l,
        |    (p1 + CAST(1.9208 AS DOUBLE) / n1
        |      + 1.96 * sqrt(p1 * (1.0 - p1) / n1
        |        + CAST(0.9604 AS DOUBLE) / (CAST(n1 AS DOUBLE) * n1)))
        |      / (1.0 + CAST(3.8416 AS DOUBLE) / n1) AS w1u
        |  FROM p)
        |SELECT n0, r0, n1, r1,
        |  round(p1 - p0, 6) + 0.0 AS delta,
        |  round(p1 - p0 - 1.96 * se, 6) + 0.0 AS wald_lo,
        |  round(p1 - p0 + 1.96 * se, 6) + 0.0 AS wald_hi,
        |  round(p1 - p0 - sqrt((p1 - w1l) * (p1 - w1l)
        |    + (w0u - p0) * (w0u - p0)), 6) + 0.0 AS newcombe_lo,
        |  round(p1 - p0 + sqrt((w1u - p1) * (w1u - p1)
        |    + (p0 - w0l) * (p0 - w0l)), 6) + 0.0 AS newcombe_hi
        |FROM se""".stripMargin,
    "sample_neyman_alloc" ->
      """WITH s AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS nh,
        |    CAST(sum(CAST(CAST("value" AS DECIMAL(18,2)) * 100
        |         AS BIGINT)) AS BIGINT) AS sx,
        |    CAST(sum(CAST(CAST("value" AS DECIMAL(18,2)) * 100 AS BIGINT)
        |         * CAST(CAST("value" AS DECIMAL(18,2)) * 100 AS BIGINT))
        |         AS BIGINT) AS sx2
        |  FROM events GROUP BY 1),
        |d AS (SELECT *,
        |    sqrt(CAST(nh * sx2 - sx * sx AS DOUBLE)
        |      / (CAST(nh AS DOUBLE) * (nh - 1))) / 100 AS sh
        |  FROM s),
        |ww AS (SELECT *, CAST(round(nh * sh, 6) AS DECIMAL(28,6)) AS w
        |       FROM d),
        |t AS (SELECT sum(w) AS tw, CAST(sum(nh) AS BIGINT) AS tn FROM ww),
        |al AS (SELECT ww.*, t.tn,
        |    CAST(w AS DOUBLE) / CAST(tw AS DOUBLE) AS share
        |  FROM ww CROSS JOIN t),
        |ab AS (SELECT *, CAST(floor(1000 * share) AS BIGINT) AS n_base,
        |    1000 * share - CAST(floor(1000 * share) AS BIGINT) AS frac
        |  FROM al),
        |sh2 AS (SELECT CAST(1000 - sum(n_base) AS BIGINT) AS rem FROM ab),
        |rk AS (SELECT ab.*, sh2.rem,
        |    row_number() OVER (ORDER BY frac DESC, event_type) AS rk
        |  FROM ab CROSS JOIN sh2)
        |SELECT event_type, nh AS n_stratum,
        |  round(sh, 6) + 0.0 AS stddev_value,
        |  round(share, 6) + 0.0 AS neyman_share,
        |  n_base + CASE WHEN rk <= rem THEN 1 ELSE 0 END AS n_alloc,
        |  CAST(round(1000 * CAST(nh AS DOUBLE) / tn, 0) AS BIGINT)
        |    AS n_proportional
        |FROM rk ORDER BY event_type""".stripMargin,
    "window_ewma_timedecay" ->
      """WITH e AS (SELECT user_id, "value",
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |w AS (SELECT *, max(us) OVER (PARTITION BY user_id) AS last_us
        |      FROM e),
        |t AS (SELECT user_id,
        |    CAST(round("value"
        |      * exp(-(CAST(last_us - us AS DOUBLE) / 21600000000.0)), 9)
        |      AS DECIMAL(28,9)) AS term
        |  FROM w)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  round(CAST(sum(term) AS DOUBLE), 6) + 0.0 AS decayed_score
        |FROM t GROUP BY 1 ORDER BY user_id""".stripMargin,
    "stats_nelson_aalen" ->
      s"""$survCtes,
         |byt AS (SELECT t, CAST(sum(observed) AS BIGINT) AS d,
         |    CAST(sum(1 - observed) AS BIGINT) AS c
         |  FROM s GROUP BY 1),
         |r AS (SELECT *, CAST(sum(d + c) OVER (ORDER BY t
         |        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
         |      AS BIGINT) AS n_risk FROM byt),
         |tm AS (SELECT *, CASE WHEN d > 0
         |    THEN CAST(round(CAST(d AS DOUBLE) / n_risk, 9)
         |         AS DECIMAL(18,9))
         |    ELSE CAST(0 AS DECIMAL(18,9)) END AS h_term FROM r),
         |cm AS (SELECT *, sum(h_term) OVER (ORDER BY t
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ch
         |  FROM tm)
         |SELECT t AS t_hours, n_risk, d AS d_events,
         |  round(CAST(ch AS DOUBLE), 6) + 0.0 AS cum_hazard,
         |  round(exp(-CAST(ch AS DOUBLE)), 6) + 0.0 AS s_breslow
         |FROM cm WHERE d > 0 ORDER BY t_hours""".stripMargin,
    "stats_overdispersion" ->
      """WITH c AS (SELECT user_id, CAST(count(*) AS BIGINT) AS k
        |           FROM events GROUP BY 1),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(k) AS BIGINT) AS sk,
        |    CAST(sum(k * k) AS BIGINT) AS sk2 FROM c),
        |m AS (SELECT n, CAST(sk AS DOUBLE) / n AS m,
        |    CAST(n * sk2 - sk * sk AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * (n - 1)) AS s2
        |  FROM s)
        |SELECT n AS n_users, round(m, 6) + 0.0 AS mean_events,
        |  round(s2, 6) + 0.0 AS var_events,
        |  round(s2 / m, 6) + 0.0 AS dispersion,
        |  round(CASE WHEN s2 > m THEN m * m / (s2 - m) END, 6) + 0.0
        |    AS nb_r,
        |  round(CASE WHEN s2 > m THEN m / s2 END, 6) + 0.0 AS nb_p,
        |  s2 <= 1.5 * m AS near_poisson
        |FROM m""".stripMargin,
    "stats_lincoln_petersen" ->
      """WITH mn AS (SELECT min(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS d0
        |           FROM events),
        |f AS (
        |  SELECT user_id,
        |    CAST(max(CASE WHEN CAST(CAST(ts AS TIMESTAMP) AS DATE) - d0
        |        < 7 THEN 1 ELSE 0 END) AS BIGINT) AS in_a,
        |    CAST(max(CASE WHEN CAST(CAST(ts AS TIMESTAMP) AS DATE) - d0
        |        >= 7 THEN 1 ELSE 0 END) AS BIGINT) AS in_b
        |  FROM events CROSS JOIN mn
        |  WHERE CAST(CAST(ts AS TIMESTAMP) AS DATE) - d0 < 14
        |  GROUP BY user_id),
        |s AS (SELECT CAST(sum(in_a) AS BIGINT) AS n1,
        |    CAST(sum(in_b) AS BIGINT) AS n2,
        |    CAST(sum(in_a * in_b) AS BIGINT) AS m,
        |    CAST(count(*) AS BIGINT) AS n_seen
        |  FROM f)
        |SELECT n1, n2, m, n_seen,
        |  round(CASE WHEN m > 0 THEN CAST(n1 AS DOUBLE) * n2 / m END, 6)
        |    + 0.0 AS n_hat_lp,
        |  round(CAST((n1 + 1) AS DOUBLE) * (n2 + 1) / (m + 1) - 1.0, 6)
        |    + 0.0 AS n_hat_chapman,
        |  round(sqrt(CAST((n1 + 1) AS DOUBLE) * (n2 + 1) * (n1 - m)
        |    * (n2 - m) / (CAST((m + 1) AS DOUBLE) * (m + 1) * (m + 2))),
        |    6) + 0.0 AS se_chapman
        |FROM s""".stripMargin,
    "anomaly_pot" ->
      """WITH top AS (SELECT o_totalprice AS x, o_orderkey FROM orders
        |             ORDER BY x DESC, o_orderkey LIMIT 51),
        |r AS (SELECT x,
        |    row_number() OVER (ORDER BY x DESC, o_orderkey) AS rn,
        |    min(x) OVER () AS u
        |  FROM top),
        |c AS (SELECT u, CAST(round((x - u) * 100, 0) AS BIGINT) AS yc
        |      FROM r WHERE rn <= 50),
        |a AS (SELECT u, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(yc) AS BIGINT) AS sy,
        |    CAST(sum(yc * yc) AS BIGINT) AS sy2
        |  FROM c GROUP BY u),
        |m AS (SELECT *, CAST(sy AS DOUBLE) / 100 / n AS m,
        |    CAST(n * sy2 - sy * sy AS DOUBLE) / (n * (n - 1)) / 10000
        |      AS s2
        |  FROM a),
        |f AS (SELECT *, m * m / s2 AS rr FROM m)
        |SELECT n AS n_exceed, u AS threshold,
        |  round(m, 6) + 0.0 AS mean_excess,
        |  round(0.5 * (1.0 - rr), 6) + 0.0 AS xi,
        |  round(0.5 * m * (rr + 1.0), 6) + 0.0 AS sigma
        |FROM f""".stripMargin,
    "forecast_ses_grid" ->
      """WITH RECURSIVE d AS (
        |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    CAST(sum(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS y
        |  FROM events GROUP BY 1),
        |s AS (SELECT y, row_number() OVER (ORDER BY day) AS t,
        |    count(*) OVER () AS n
        |  FROM d),
        |al AS (SELECT CAST(a AS DOUBLE) AS alpha
        |       FROM (VALUES (0.2), (0.4), (0.6), (0.8)) AS v(a)),
        |rec AS (
        |  SELECT alpha, n, 1 AS t,
        |    (SELECT y FROM s WHERE s.t = 1) AS sv,
        |    CAST(0 AS DOUBLE) AS sse
        |  FROM al CROSS JOIN (SELECT DISTINCT n FROM s) q
        |  UNION ALL
        |  SELECT r.alpha, r.n, r.t + 1,
        |    r.alpha * p.y + (1.0 - r.alpha) * r.sv,
        |    r.sse + (p.y - r.sv) * (p.y - r.sv)
        |  FROM rec r JOIN s p ON p.t = r.t + 1
        |  WHERE r.t < r.n),
        |fin AS (
        |  SELECT alpha, CAST(n AS BIGINT) AS n_days,
        |    round(sv, 6) + 0.0 AS level, round(sse, 6) + 0.0 AS sse
        |  FROM rec WHERE t = n AND n >= 2),
        |rk AS (SELECT *, row_number() OVER (ORDER BY sse, alpha) AS rn
        |       FROM fin)
        |SELECT alpha, n_days, level, sse, rn = 1 AS is_best
        |FROM rk ORDER BY alpha""".stripMargin,
    "stats_prop_trend" ->
      """WITH g AS (
        |  SELECT ((CAST(CAST(ts AS TIMESTAMP) AS DATE)
        |       - DATE '1970-01-01') % 7 + 7) % 7 AS w,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |         AS BIGINT) AS r
        |  FROM events GROUP BY 1),
        |s AS (SELECT CAST(sum(n) AS BIGINT) AS nt,
        |    CAST(sum(r) AS BIGINT) AS rt,
        |    CAST(sum(w * n) AS BIGINT) AS swn,
        |    CAST(sum(w * w * n) AS BIGINT) AS sw2n,
        |    CAST(sum(w * r) AS BIGINT) AS swr
        |  FROM g),
        |t AS (SELECT *,
        |    CAST(nt AS DECIMAL(18,0)) * swr
        |      - CAST(rt AS DECIMAL(18,0)) * swn AS num,
        |    CAST(rt AS DECIMAL(18,0)) * (nt - rt) AS den1,
        |    CAST(nt AS DECIMAL(18,0)) * sw2n
        |      - CAST(swn AS DECIMAL(18,0)) * swn AS den2
        |  FROM s)
        |SELECT nt AS n_total, rt AS r_total,
        |  CAST(sign(CAST(num AS DOUBLE)) AS INTEGER) AS trend_dir,
        |  round(CAST(num AS DOUBLE) * CAST(num AS DOUBLE) * nt
        |    / (CAST(den1 AS DOUBLE) * CAST(den2 AS DOUBLE)), 6) + 0.0
        |    AS chi2_trend
        |FROM t""".stripMargin,
    "window_stochastic" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    CAST(sum(CAST("value" AS DECIMAL(18,2))) * 100 AS BIGINT)
        |      AS revc
        |  FROM events GROUP BY 1, 2),
        |w AS (SELECT event_type, day, revc,
        |    row_number() OVER wo AS rn,
        |    min(revc) OVER (wo ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
        |      AS l14,
        |    max(revc) OVER (wo ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
        |      AS h14
        |  FROM daily
        |  WINDOW wo AS (PARTITION BY event_type ORDER BY day)),
        |k AS (SELECT *,
        |    CASE WHEN h14 > l14 THEN
        |      CAST(round(100.0 * CAST(revc - l14 AS DOUBLE) / (h14 - l14),
        |                 6) AS DECIMAL(12,6)) END AS k6
        |  FROM w),
        |d AS (SELECT *,
        |    sum(k6) OVER (wo ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |      AS ks,
        |    count(k6) OVER (wo ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |      AS kn
        |  FROM k WINDOW wo AS (PARTITION BY event_type ORDER BY day))
        |SELECT event_type, day, round(CAST(k6 AS DOUBLE), 6) + 0.0
        |    AS pct_k,
        |  round(CASE WHEN kn > 0 THEN CAST(ks AS DOUBLE) / kn END, 6)
        |    + 0.0 AS pct_d
        |FROM d WHERE rn >= 14 ORDER BY event_type, day""".stripMargin,
    "privacy_dp_counts" ->
      """WITH c AS (SELECT event_type, CAST(count(*) AS BIGINT) AS c,
        |    CAST(row_number() OVER (ORDER BY event_type) AS BIGINT) AS j
        |  FROM events GROUP BY event_type),
        |u AS (SELECT *,
        |    ((j % 2147483648) * 2654435761 % 2147483648 + 1)
        |      / 2147483649.0 AS u
        |  FROM c),
        |n AS (SELECT *, CASE WHEN u < 0.5 THEN round(ln(2.0 * u), 9)
        |    ELSE -round(ln(2.0 * (1.0 - u)), 9) END AS noise
        |  FROM u)
        |SELECT event_type, CAST(1.0 AS DOUBLE) AS epsilon,
        |  round(c + noise, 6) + 0.0 AS noisy_count
        |FROM n ORDER BY event_type""".stripMargin,
    "stats_hill_tail" ->
      """WITH top AS (SELECT o_totalprice AS x, o_orderkey FROM orders
        |             ORDER BY x DESC, o_orderkey LIMIT 101),
        |r AS (SELECT x,
        |    row_number() OVER (ORDER BY x DESC, o_orderkey) AS rn,
        |    min(x) OVER () AS thr
        |  FROM top),
        |t AS (SELECT x, thr,
        |    CAST(round(ln(x / thr), 9) AS DECIMAL(18,9)) AS term
        |  FROM r WHERE rn <= 100)
        |SELECT CAST(count(*) AS BIGINT) AS k, min(thr) AS x_threshold,
        |  round(CAST(sum(term) AS DOUBLE) / count(*), 6) + 0.0 AS hill_h,
        |  round(CAST(count(*) AS DOUBLE) / CAST(sum(term) AS DOUBLE), 6)
        |    + 0.0 AS alpha
        |FROM t""".stripMargin,
    "stats_cochran_q" ->
      """WITH pres AS (SELECT DISTINCT user_id, event_type FROM events
        |             WHERE "value" > 150),
        |r AS (SELECT user_id, CAST(count(*) AS BIGINT) AS r
        |      FROM pres GROUP BY 1),
        |rs AS (SELECT CAST(sum(r) AS BIGINT) AS t,
        |    CAST(sum(r * r) AS BIGINT) AS sr2,
        |    CAST(count(*) AS BIGINT) AS n_subjects FROM r),
        |c AS (SELECT event_type, CAST(count(*) AS BIGINT) AS c
        |      FROM pres GROUP BY 1),
        |cs AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(c * c) AS BIGINT) AS sc2 FROM c)
        |SELECT n_subjects, k, t AS total_marks, k - 1 AS df,
        |  round(CASE WHEN k * t - sr2 > 0 THEN
        |      CAST((k - 1) * (k * sc2 - t * t) AS DOUBLE)
        |      / (k * t - sr2) END, 6) + 0.0 AS q_stat
        |FROM rs CROSS JOIN cs""".stripMargin,
    "stats_page_trend" ->
      """WITH rev AS (
        |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, event_type,
        |    CAST(sum(CAST("value" AS DECIMAL(18,2))) * 100 AS BIGINT)
        |      AS revc
        |  FROM events GROUP BY 1, 2),
        |days AS (SELECT DISTINCT day FROM rev),
        |types AS (SELECT event_type,
        |    CAST(row_number() OVER (ORDER BY event_type) AS BIGINT) AS j
        |  FROM (SELECT DISTINCT event_type FROM rev)),
        |grid AS (SELECT d.day, t.event_type, t.j,
        |    COALESCE(r.revc, 0) AS revc
        |  FROM days d CROSS JOIN types t
        |  LEFT JOIN rev r ON r.day = d.day AND r.event_type = t.event_type),
        |ranked AS (SELECT j,
        |    CAST(rank() OVER (PARTITION BY day ORDER BY revc) * 2
        |      + count(*) OVER (PARTITION BY day, revc) - 1 AS BIGINT)
        |      AS r2x
        |  FROM grid),
        |pt AS (SELECT j, CAST(sum(r2x) AS BIGINT) AS r2,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM ranked GROUP BY 1),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(min(n) AS BIGINT) AS n_blocks,
        |    CAST(sum(j * r2) AS BIGINT) AS l2 FROM pt)
        |SELECT n_blocks, k, round(CAST(l2 AS DOUBLE) / 2, 6) + 0.0
        |    AS l_stat,
        |  round((CAST(l2 AS DOUBLE) / 2
        |      - CAST(n_blocks * k * (k + 1) * (k + 1) AS DOUBLE) / 4)
        |    / sqrt(CAST(n_blocks * k * k * (k + 1) AS DOUBLE)
        |      * (k * k - 1) / 144), 6) + 0.0 AS z
        |FROM s""".stripMargin,
    "stats_kaplan_meier" ->
      s"""$survCtes,
         |byt AS (SELECT t, CAST(count(*) AS BIGINT) AS a,
         |    CAST(sum(observed) AS BIGINT) AS d,
         |    CAST(sum(1 - observed) AS BIGINT) AS c
         |  FROM s GROUP BY 1),
         |r AS (SELECT *, sum(a) OVER (ORDER BY t ROWS BETWEEN CURRENT ROW
         |        AND UNBOUNDED FOLLOWING) AS n_risk FROM byt),
         |tm AS (SELECT *, CASE WHEN d > 0 AND d < n_risk
         |    THEN CAST(round(ln(1.0 - CAST(d AS DOUBLE) / n_risk), 9)
         |         AS DECIMAL(18,9)) END AS term FROM r),
         |cm AS (SELECT *, sum(term) OVER (ORDER BY t
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuml
         |  FROM tm)
         |SELECT t AS t_hours, CAST(n_risk AS BIGINT) AS n_risk,
         |  d AS d_events, c AS c_censored,
         |  round(CASE WHEN d = n_risk THEN 0.0
         |    ELSE exp(CAST(cuml AS DOUBLE)) END, 6) + 0.0 AS survival
         |FROM cm WHERE d > 0 ORDER BY t_hours""".stripMargin,
    "stats_logrank" ->
      s"""$survCtes,
         |sg AS (SELECT *, ((user_id % 2147483648) * 2654435761
         |         % 2147483648) % 2 AS g FROM s),
         |byt AS (SELECT t, CAST(count(*) AS BIGINT) AS a,
         |    CAST(sum(observed) AS BIGINT) AS d,
         |    CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a1,
         |    CAST(sum(CASE WHEN g = 1 THEN observed ELSE 0 END) AS BIGINT)
         |      AS d1
         |  FROM sg GROUP BY 1),
         |r AS (SELECT *,
         |    sum(a) OVER (ORDER BY t ROWS BETWEEN CURRENT ROW
         |      AND UNBOUNDED FOLLOWING) AS n,
         |    sum(a1) OVER (ORDER BY t ROWS BETWEEN CURRENT ROW
         |      AND UNBOUNDED FOLLOWING) AS n1
         |  FROM byt),
         |tm AS (SELECT
         |    CAST(round(d1 - CAST(d AS DOUBLE) * n1 / n, 9)
         |      AS DECIMAL(18,9)) AS ome,
         |    CASE WHEN n > 1 THEN CAST(round(
         |      CAST(d AS DOUBLE) * n1 / n * (1.0 - CAST(n1 AS DOUBLE) / n)
         |        * (n - d) / (n - 1), 9) AS DECIMAL(18,9))
         |    ELSE CAST(0 AS DECIMAL(18,9)) END AS v
         |  FROM r WHERE d > 0),
         |grp AS (SELECT
         |    CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n1_subj,
         |    CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n0_subj,
         |    CAST(sum(CASE WHEN g = 1 THEN observed ELSE 0 END) AS BIGINT)
         |      AS o1,
         |    CAST(sum(CASE WHEN g = 0 THEN observed ELSE 0 END) AS BIGINT)
         |      AS o0
         |  FROM sg)
         |SELECT n1_subj, n0_subj, o1, o0,
         |  round(CAST(sum(ome) AS DOUBLE), 6) + 0.0 AS o_minus_e,
         |  round(CAST(sum(v) AS DOUBLE), 6) + 0.0 AS var_sum,
         |  round(CASE WHEN CAST(sum(v) AS DOUBLE) > 0 THEN
         |      CAST(sum(ome) AS DOUBLE) * CAST(sum(ome) AS DOUBLE)
         |      / CAST(sum(v) AS DOUBLE) END, 6) + 0.0 AS chi2
         |FROM tm CROSS JOIN grp
         |GROUP BY n1_subj, n0_subj, o1, o0""".stripMargin,
    "privacy_t_closeness" ->
      """WITH cells AS (
        |  SELECT ((CAST(ts AS DATE) - DATE '1970-01-01') % 7 + 7) % 7
        |      AS dow,
        |    CAST(floor("value" / 100) AS BIGINT) AS vb, event_type,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2, 3),
        |gtyp AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS ct
        |         FROM cells GROUP BY 1),
        |tot AS (SELECT CAST(sum(ct) AS BIGINT) AS n FROM gtyp),
        |groups AS (SELECT dow, vb, CAST(sum(c) AS BIGINT) AS ng
        |           FROM cells GROUP BY 1, 2),
        |grid AS (
        |  SELECT g.dow, g.vb, g.ng, gl.ct, COALESCE(c.c, 0) AS c, t.n
        |  FROM groups g CROSS JOIN gtyp gl
        |  LEFT JOIN cells c ON c.dow = g.dow AND c.vb = g.vb
        |    AND c.event_type = gl.event_type
        |  CROSS JOIN tot t),
        |tvd AS (SELECT dow, vb, any_value(ng) AS ng, any_value(n) AS n,
        |    CAST(sum(abs(c * n - ct * ng)) AS BIGINT) AS num
        |  FROM grid GROUP BY 1, 2),
        |s AS (SELECT ng, CAST(num AS DOUBLE) / (2 * ng * n) AS t
        |      FROM tvd)
        |SELECT CAST(count(*) AS BIGINT) AS n_groups,
        |  CAST(sum(ng) AS BIGINT) AS n_rows,
        |  round(max(t), 6) + 0.0 AS max_t,
        |  CAST(sum(CASE WHEN t > 0.2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS groups_gt_02,
        |  CAST(sum(CASE WHEN t > 0.2 THEN ng ELSE 0 END) AS BIGINT)
        |    AS rows_gt_02,
        |  round(CAST(sum(CASE WHEN t > 0.2 THEN ng ELSE 0 END) AS DOUBLE)
        |    / sum(ng), 6) + 0.0 AS pct_rows_gt_02
        |FROM s""".stripMargin,
    "window_ulcer" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    CAST(sum(CAST("value" AS DECIMAL(18,2))) * 100 AS BIGINT)
        |      AS revc
        |  FROM events GROUP BY 1, 2),
        |p AS (SELECT event_type, day, revc,
        |    max(revc) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
        |  FROM daily),
        |d AS (SELECT event_type,
        |    CAST(round(100 * CAST(peak - revc AS DOUBLE) / peak, 6)
        |      AS DECIMAL(12,6)) AS dd6
        |  FROM p)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |  round(CAST(max(dd6) AS DOUBLE), 6) + 0.0 AS max_drawdown_pct,
        |  round(sqrt(CAST(sum(dd6 * dd6) AS DOUBLE) / count(*)), 6) + 0.0
        |    AS ulcer_index
        |FROM d GROUP BY 1 ORDER BY event_type""".stripMargin,
    "stats_tukey" ->
      """WITH q AS (
        |  SELECT event_type,
        |    round(quantile_cont("value", 0.25), 6) AS q1,
        |    round(quantile_cont("value", 0.75), 6) AS q3
        |  FROM events GROUP BY 1),
        |f AS (SELECT event_type, q1, q3,
        |    round(q1 - CAST(1.5 AS DOUBLE) * (q3 - q1), 6) AS lo,
        |    round(q3 + CAST(1.5 AS DOUBLE) * (q3 - q1), 6) AS hi
        |  FROM q)
        |SELECT e.event_type, CAST(count(*) AS BIGINT) AS n,
        |  round(any_value(q1), 6) + 0.0 AS q1,
        |  round(any_value(q3), 6) + 0.0 AS q3,
        |  round(any_value(lo), 6) + 0.0 AS fence_lo,
        |  round(any_value(hi), 6) + 0.0 AS fence_hi,
        |  CAST(sum(CASE WHEN e."value" < lo OR e."value" > hi
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |  round(CAST(sum(CASE WHEN e."value" < lo OR e."value" > hi
        |      THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) + 0.0
        |    AS pct_outliers
        |FROM events e JOIN f ON e.event_type = f.event_type
        |GROUP BY 1 ORDER BY e.event_type""".stripMargin,
    "dist_hhi" ->
      """WITH r AS (
        |  SELECT p.p_brand, l.l_suppkey,
        |    CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)))
        |      AS DECIMAL(18,2)) AS r
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  GROUP BY 1, 2),
        |g AS (SELECT p_brand, CAST(count(*) AS BIGINT) AS n_suppliers,
        |    sum(r) AS tot, sum(r * r) AS sq
        |  FROM r GROUP BY 1)
        |SELECT p_brand, n_suppliers,
        |  CAST(tot AS DOUBLE) AS total_rev,
        |  round(CAST(sq AS DOUBLE)
        |    / (CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE)), 6) + 0.0
        |    AS hhi,
        |  CAST(sq AS DOUBLE)
        |    / (CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE)) > 0.25
        |    AS concentrated
        |FROM g ORDER BY p_brand""".stripMargin,
    "stats_mcnemar" ->
      """WITH p AS (
        |  SELECT user_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS dayno
        |  FROM events WHERE event_type = 'purchase'),
        |s AS (SELECT min(dayno) AS lo, max(dayno) AS hi FROM p),
        |f AS (SELECT user_id,
        |    max(CASE WHEN dayno < (lo + hi + 1) // 2 THEN 1 ELSE 0 END)
        |      AS p1,
        |    max(CASE WHEN dayno >= (lo + hi + 1) // 2 THEN 1 ELSE 0 END)
        |      AS p2
        |  FROM p CROSS JOIN s GROUP BY 1),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n_users,
        |    CAST(sum(CASE WHEN p1 = 1 AND p2 = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_both,
        |    CAST(sum(CASE WHEN p1 = 1 AND p2 = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS b,
        |    CAST(sum(CASE WHEN p1 = 0 AND p2 = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c
        |  FROM f)
        |SELECT n_users, n_both, b, c,
        |  round(CASE WHEN b + c > 0 THEN
        |      CAST((b - c) * (b - c) AS DOUBLE) / (b + c) END, 6) + 0.0
        |    AS chi2,
        |  CASE WHEN b + c > 0 THEN
        |      CAST((b - c) * (b - c) AS DOUBLE) / (b + c) > 3.841
        |    ELSE false END AS significant
        |FROM t""".stripMargin,
    "stats_circular" ->
      """WITH e AS (SELECT event_type,
        |    (epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) % 24 AS hr
        |  FROM events),
        |g AS (SELECT event_type, hr, count(*) AS c FROM e GROUP BY 1, 2),
        |w AS (SELECT event_type, c,
        |    CAST(round(sin(2 * pi() * hr / CAST(24 AS DOUBLE)), 9)
        |      AS DECIMAL(12,9)) AS s9,
        |    CAST(round(cos(2 * pi() * hr / CAST(24 AS DOUBLE)), 9)
        |      AS DECIMAL(12,9)) AS c9
        |  FROM g),
        |t AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n,
        |    sum(s9 * c) AS ss, sum(c9 * c) AS sc
        |  FROM w GROUP BY 1)
        |SELECT event_type, n,
        |  round(((atan2(CAST(ss AS DOUBLE), CAST(sc AS DOUBLE))
        |    / (2 * pi()) * 24) % 24 + 24) % 24, 6) + 0.0 AS mean_hour,
        |  round(sqrt(CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE)
        |    + CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE)) / n, 6) + 0.0
        |    AS r_bar
        |FROM t ORDER BY event_type""".stripMargin,
    "privacy_l_diversity" ->
      """WITH g AS (
        |  SELECT (CAST(CAST(ts AS TIMESTAMP) AS DATE)
        |      - DATE '1970-01-01') % 7 AS dow,
        |    CAST(floor("value" / 100) AS BIGINT) AS vb,
        |    CAST(count(*) AS BIGINT) AS k,
        |    CAST(count(DISTINCT event_type) AS BIGINT) AS l
        |  FROM events GROUP BY 1, 2)
        |SELECT CAST(count(*) AS BIGINT) AS n_groups,
        |  CAST(sum(k) AS BIGINT) AS n_rows,
        |  CAST(min(l) AS BIGINT) AS min_l,
        |  CAST(sum(CASE WHEN l < 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS groups_lt_2,
        |  CAST(sum(CASE WHEN l < 2 THEN k ELSE 0 END) AS BIGINT)
        |    AS rows_lt_2,
        |  CAST(sum(CASE WHEN l < 3 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS groups_lt_3,
        |  CAST(sum(CASE WHEN l < 3 THEN k ELSE 0 END) AS BIGINT)
        |    AS rows_lt_3,
        |  round(CAST(sum(CASE WHEN l < 3 THEN k ELSE 0 END) AS DOUBLE)
        |    / sum(k), 6) + 0.0 AS pct_rows_lt_3
        |FROM g""".stripMargin,
    "hist_2d" ->
      """WITH e AS (SELECT
        |    (epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 + 4) % 7 + 1
        |      AS dow,
        |    (epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) % 24 AS hr
        |  FROM events),
        |g AS (SELECT dow, hr, CAST(count(*) AS BIGINT) AS cnt
        |      FROM e GROUP BY 1, 2),
        |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM g)
        |SELECT dow, hr, cnt,
        |  round(CAST(cnt AS DOUBLE) / total, 6) + 0.0 AS share
        |FROM g CROSS JOIN t ORDER BY dow, hr""".stripMargin,
    "stats_friedman" ->
      """WITH rev AS (
        |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, event_type,
        |    CAST(sum(CAST("value" AS DECIMAL(18,2))) * 100 AS BIGINT)
        |      AS revc
        |  FROM events GROUP BY 1, 2),
        |grid AS (
        |  SELECT d.day, t.event_type, COALESCE(r.revc, 0) AS revc
        |  FROM (SELECT DISTINCT day FROM rev) d
        |  CROSS JOIN (SELECT DISTINCT event_type FROM rev) t
        |  LEFT JOIN rev r ON r.day = d.day AND r.event_type = t.event_type),
        |rk AS (SELECT event_type,
        |    rank() OVER (PARTITION BY day ORDER BY revc) * 2
        |      + count(*) OVER (PARTITION BY day, revc) - 1 AS r2x
        |  FROM grid),
        |s AS (SELECT event_type, CAST(sum(r2x) AS BIGINT) AS s2,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM rk GROUP BY 1),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(any_value(n) AS BIGINT) AS n_blocks,
        |    CAST(sum(s2 * s2) AS BIGINT) AS ss
        |  FROM s)
        |SELECT n_blocks, k,
        |  round(CAST(3 * ss AS DOUBLE)
        |    / (CAST(n_blocks AS DOUBLE) * k * (k + 1))
        |    - CAST(3 * n_blocks * (k + 1) AS DOUBLE), 6) + 0.0 AS q
        |FROM t""".stripMargin,
    "stats_influence" ->
      """WITH daily AS (
        |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    CAST(sum(CAST("value" AS DECIMAL(18,2))) * 100 AS BIGINT) AS y,
        |    CAST(CAST(CAST(ts AS TIMESTAMP) AS DATE) - DATE '1970-01-01'
        |      AS BIGINT) AS x
        |  FROM events GROUP BY 1, 3),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(x * y) AS BIGINT) AS sxy
        |  FROM daily),
        |f AS (SELECT day, x, y, n, sx, sxx,
        |    CAST(round((y - ((CAST(sy AS DOUBLE)
        |        - (CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx))
        |          * sx) / n
        |      + (CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx))
        |        * x)) * 1000000, 0) AS BIGINT) AS ei6,
        |    CAST(1 AS DOUBLE) / n
        |      + CAST((n * x - sx) * (n * x - sx) AS DOUBLE)
        |        / (CAST(n AS DOUBLE) * (n * sxx - sx * sx)) AS h
        |  FROM daily CROSS JOIN m),
        |sse AS (SELECT sum(CAST(ei6 AS DECIMAL(38,0)) * ei6) AS ssei
        |        FROM f),
        |g AS (SELECT day, x, y, n, h, ei6,
        |    (CAST(ssei AS DOUBLE) / 1000000000000) / (n - 2) AS s2,
        |    (CAST(ei6 AS DOUBLE) / 1000000)
        |      * (CAST(ei6 AS DOUBLE) / 1000000) AS e2
        |  FROM f CROSS JOIN sse)
        |SELECT day, x, y,
        |  round(CAST(ei6 AS DOUBLE) / 1000000, 6) + 0.0 AS resid,
        |  round(h, 6) + 0.0 AS leverage,
        |  round(e2 * h / (2 * s2 * (1 - h) * (1 - h)), 6) + 0.0 AS cooks_d,
        |  e2 * h / (2 * s2 * (1 - h) * (1 - h)) > CAST(4 AS DOUBLE) / n
        |    AS influential
        |FROM g ORDER BY day""".stripMargin,
    "stats_ols_multi" ->
      """WITH daily AS (
        |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    count(CASE WHEN event_type = 'click' THEN 1 END) AS x1,
        |    count(CASE WHEN event_type = 'view' THEN 1 END) AS x2,
        |    CAST(floor(sum(CAST("value" AS DECIMAL(18,2)))) AS BIGINT)
        |      AS y
        |  FROM events GROUP BY 1),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x1) AS BIGINT) AS sx1, CAST(sum(x2) AS BIGINT) AS sx2,
        |    CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x1 * x1) AS BIGINT) AS s11r,
        |    CAST(sum(x2 * x2) AS BIGINT) AS s22r,
        |    CAST(sum(x1 * x2) AS BIGINT) AS s12r,
        |    CAST(sum(x1 * y) AS BIGINT) AS s1yr,
        |    CAST(sum(x2 * y) AS BIGINT) AS s2yr,
        |    CAST(sum(y * y) AS BIGINT) AS syyr
        |  FROM daily),
        |c AS (SELECT n, sx1, sx2, sy,
        |    n * s11r - sx1 * sx1 AS c11, n * s22r - sx2 * sx2 AS c22,
        |    n * s12r - sx1 * sx2 AS c12, n * s1yr - sx1 * sy AS c1y,
        |    n * s2yr - sx2 * sy AS c2y, n * syyr - sy * sy AS cyy
        |  FROM m)
        |SELECT n,
        |  round((CAST(c1y AS DOUBLE) * c22 - CAST(c2y AS DOUBLE) * c12)
        |    / (CAST(c11 AS DOUBLE) * c22 - CAST(c12 AS DOUBLE) * c12), 6)
        |    + 0.0 AS b1,
        |  round((CAST(c2y AS DOUBLE) * c11 - CAST(c1y AS DOUBLE) * c12)
        |    / (CAST(c11 AS DOUBLE) * c22 - CAST(c12 AS DOUBLE) * c12), 6)
        |    + 0.0 AS b2,
        |  round((CAST(sy AS DOUBLE)
        |    - ((CAST(c1y AS DOUBLE) * c22 - CAST(c2y AS DOUBLE) * c12)
        |       / (CAST(c11 AS DOUBLE) * c22 - CAST(c12 AS DOUBLE) * c12))
        |      * sx1
        |    - ((CAST(c2y AS DOUBLE) * c11 - CAST(c1y AS DOUBLE) * c12)
        |       / (CAST(c11 AS DOUBLE) * c22 - CAST(c12 AS DOUBLE) * c12))
        |      * sx2) / n, 6) + 0.0 AS b0,
        |  round((((CAST(c1y AS DOUBLE) * c22 - CAST(c2y AS DOUBLE) * c12)
        |       / (CAST(c11 AS DOUBLE) * c22 - CAST(c12 AS DOUBLE) * c12))
        |      * c1y
        |    + ((CAST(c2y AS DOUBLE) * c11 - CAST(c1y AS DOUBLE) * c12)
        |       / (CAST(c11 AS DOUBLE) * c22 - CAST(c12 AS DOUBLE) * c12))
        |      * c2y) / CAST(cyy AS DOUBLE), 6) + 0.0 AS r2
        |FROM c""".stripMargin,
    "stats_wilson_ci" ->
      """WITH d AS (
        |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END)
        |      AS BIGINT) AS k
        |  FROM events GROUP BY 1)
        |SELECT day, n, k,
        |  round(CAST(k AS DOUBLE) / n, 6) + 0.0 AS p_hat,
        |  round((CAST(k AS DOUBLE) / n
        |      + (CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE)) / (2 * n)
        |      - CAST(1.96 AS DOUBLE)
        |        * sqrt((CAST(k AS DOUBLE) / n) * (1 - (CAST(k AS DOUBLE) / n)) / n
        |          + (CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE))
        |            / (4 * n * n)))
        |    / (1 + (CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE)) / n), 6)
        |    + 0.0 AS ci_lo,
        |  round((CAST(k AS DOUBLE) / n
        |      + (CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE)) / (2 * n)
        |      + CAST(1.96 AS DOUBLE)
        |        * sqrt((CAST(k AS DOUBLE) / n) * (1 - (CAST(k AS DOUBLE) / n)) / n
        |          + (CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE))
        |            / (4 * n * n)))
        |    / (1 + (CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE)) / n), 6)
        |    + 0.0 AS ci_hi
        |FROM d ORDER BY day""".stripMargin,
    "stats_kruskal" ->
      """WITH j AS (SELECT event_type,
        |    CAST(CAST("value" AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
        |    count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT cents, CAST(sum(c) AS BIGINT) AS t FROM j GROUP BY 1),
        |f AS (SELECT cents, t,
        |    CAST(sum(t) OVER (ORDER BY cents
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - t
        |      AS BIGINT) AS fb
        |  FROM t),
        |g AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n_g,
        |    CAST(sum(c * (fb * 2 + t + 1)) AS BIGINT) AS s2
        |  FROM j JOIN f USING (cents) GROUP BY 1),
        |tc AS (SELECT sum(CAST(t AS DECIMAL(38,0)) * t * t - t) AS tsum
        |       FROM t),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(n_g) AS BIGINT) AS n,
        |    sum(CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / n_g) AS q
        |  FROM g)
        |SELECT k, n,
        |  round(3.0 * q / (CAST(n AS DOUBLE) * (n + 1)) - 3.0 * (n + 1), 6)
        |    + 0.0 AS h,
        |  round(1.0 - CAST(tsum AS DOUBLE)
        |    / (CAST(n AS DOUBLE) * n * n - n), 6) + 0.0 AS tie_c,
        |  round((3.0 * q / (CAST(n AS DOUBLE) * (n + 1)) - 3.0 * (n + 1))
        |    / (1.0 - CAST(tsum AS DOUBLE)
        |       / (CAST(n AS DOUBLE) * n * n - n)), 6) + 0.0 AS h_adj
        |FROM tot, tc""".stripMargin,
    "dq_freshness" ->
      """WITH e AS (SELECT event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |w AS (SELECT max(us) AS wm FROM e)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(max(us) AS BIGINT) AS last_us,
        |  CAST((any_value(wm) - max(us)) // 60000000 AS BIGINT) AS lag_min,
        |  CAST(sum(CASE WHEN us >= wm - 86400000000 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_last_24h,
        |  (any_value(wm) - max(us)) // 60000000 >= 60 AS is_stale
        |FROM e CROSS JOIN w
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    // the stats_chi2 grid + V from the ROUNDED chi2
    "stats_cramers_v" ->
      """WITH e0 AS (
        |  SELECT event_type,
        |    ((CAST(ts AS DATE) - DATE '1970-01-01') % 7 + 7) % 7 AS dow
        |  FROM events),
        |o AS (SELECT event_type, CAST(dow AS INTEGER) AS dow,
        |        count(*) AS o FROM e0 GROUP BY 1, 2),
        |rt AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS rt FROM o GROUP BY 1),
        |ct AS (SELECT dow, CAST(sum(o) AS BIGINT) AS ct FROM o GROUP BY 1),
        |n AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM o),
        |grid AS (
        |  SELECT rt.event_type, ct.dow,
        |    CAST(COALESCE(o.o, 0) AS BIGINT) AS o,
        |    CAST(rt.rt AS DOUBLE) * ct.ct / n.n AS e
        |  FROM rt CROSS JOIN ct CROSS JOIN n
        |  LEFT JOIN o ON o.event_type = rt.event_type AND o.dow = ct.dow),
        |t AS (
        |  SELECT round(sum((o - e) * (o - e) / e), 6) + 0.0 AS chi2,
        |    count(DISTINCT event_type) AS r, count(DISTINCT dow) AS c,
        |    any_value(n.n) AS n
        |  FROM grid, n)
        |SELECT chi2, CAST(n AS BIGINT) AS n,
        |  round(sqrt(chi2 / (CAST(n AS DOUBLE) * least(r - 1, c - 1))), 6)
        |    + 0.0 AS v
        |FROM t""".stripMargin,
    // the identical grid-median + integer-deviation pipeline; HUGEINT
    // sums mirror DECIMAL(38,0)
    "stats_levene" ->
      """WITH b AS (
        |  SELECT event_type,
        |    CAST(CAST("value" AS DECIMAL(18,2)) * 100 AS BIGINT) AS iv
        |  FROM events),
        |grid AS (
        |  SELECT event_type, iv, count(*) AS c FROM b GROUP BY 1, 2),
        |g2 AS (
        |  SELECT event_type, iv, c,
        |    sum(c) OVER (PARTITION BY event_type ORDER BY iv) AS cum,
        |    sum(c) OVER (PARTITION BY event_type) AS n
        |  FROM grid),
        |meds AS (
        |  SELECT event_type,
        |    min(CASE WHEN cum >= (n + 1) // 2 THEN iv END) AS m1,
        |    min(CASE WHEN cum >= (n + 2) // 2 THEN iv END) AS m2
        |  FROM g2 GROUP BY 1),
        |z AS (
        |  SELECT b.event_type, abs(iv * 2 - (m1 + m2)) AS z
        |  FROM b JOIN meds USING (event_type)),
        |per AS (
        |  SELECT event_type, count(*) AS nj,
        |    sum(CAST(z AS HUGEINT)) AS sj,
        |    sum(CAST(z * z AS HUGEINT)) AS ssj
        |  FROM z GROUP BY 1),
        |p2 AS (
        |  SELECT nj, sj, ssj,
        |    CAST(round(CAST(sj AS DOUBLE) * CAST(sj AS DOUBLE) / nj, 6)
        |      AS DECIMAL(24,6)) AS tj
        |  FROM per),
        |t AS (
        |  SELECT count(*) AS k, sum(nj) AS n, sum(sj) AS s,
        |    sum(ssj) AS ss, sum(tj) AS b1
        |  FROM p2)
        |SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
        |  round(((CAST(b1 AS DOUBLE)
        |      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / (k - 1))
        |    / ((CAST(ss AS DOUBLE) - CAST(b1 AS DOUBLE)) / (n - k)),
        |    6) + 0.0 AS f_stat
        |FROM t""".stripMargin,
    "stats_jarque_bera" ->
      s"""WITH m AS ($MomentsSql)
         |SELECT event_type, n,
         |  round(CAST(n AS DOUBLE) / 6
         |      * (skewness * skewness + kurtosis * kurtosis / 4),
         |    6) + 0.0 AS jb,
         |  CAST(n AS DOUBLE) / 6
         |      * (skewness * skewness + kurtosis * kurtosis / 4) > 5.991
         |    AS reject_normal
         |FROM m ORDER BY event_type""".stripMargin,
    // residuals snapped to 6 dp then DECIMAL-summed — order-free; the
    // regr_* builtins agree cross-engine far inside the snap
    "stats_dw" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS dayno,
        |    CAST(sum(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS v
        |  FROM events GROUP BY 1, 2),
        |fit AS (SELECT event_type,
        |    regr_slope(v, CAST(dayno AS DOUBLE)) AS b,
        |    regr_intercept(v, CAST(dayno AS DOUBLE)) AS a,
        |    count(*) AS n
        |  FROM daily GROUP BY 1),
        |r AS (SELECT d.event_type, dayno, n,
        |    CAST(round(v - (a + b * CAST(dayno AS DOUBLE)), 6)
        |      AS DECIMAL(24,6)) AS e
        |  FROM daily d JOIN fit USING (event_type)),
        |x AS (SELECT event_type, n, e,
        |    e - lag(e) OVER (PARTITION BY event_type ORDER BY dayno) AS de
        |  FROM r)
        |SELECT event_type, CAST(max(n) AS BIGINT) AS n,
        |  round(CAST(sum(de * de) AS DOUBLE) / CAST(sum(e * e) AS DOUBLE),
        |    6) + 0.0 AS dw
        |FROM x GROUP BY 1 ORDER BY event_type""".stripMargin,
    // integer run/sign counts; one double division + sqrt at the end
    "stats_runs" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS dayno,
        |    CAST(sum(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS v
        |  FROM events GROUP BY 1, 2),
        |med AS (
        |  SELECT event_type, avg(v) AS med FROM (
        |    SELECT event_type, v,
        |      row_number() OVER (PARTITION BY event_type ORDER BY v) AS rn,
        |      count(*) OVER (PARTITION BY event_type) AS m
        |    FROM daily) t
        |  WHERE rn = (m + 1) // 2 OR rn = (m + 2) // 2
        |  GROUP BY 1),
        |f AS (SELECT d.event_type, dayno,
        |    CASE WHEN v > med THEN 1 ELSE 0 END AS s
        |  FROM daily d JOIN med USING (event_type)
        |  WHERE v <> med),
        |c AS (SELECT event_type, s,
        |    CASE WHEN lag(s) OVER w IS NULL OR lag(s) OVER w <> s
        |         THEN 1 ELSE 0 END AS chg
        |  FROM f WINDOW w AS (PARTITION BY event_type ORDER BY dayno)),
        |g AS (SELECT event_type, CAST(sum(chg) AS BIGINT) AS runs,
        |    CAST(sum(s) AS BIGINT) AS n_plus,
        |    CAST(count(*) - sum(s) AS BIGINT) AS n_minus
        |  FROM c GROUP BY 1)
        |SELECT event_type, runs, n_plus, n_minus,
        |  round((runs - (1 + CAST(2 * n_plus * n_minus AS DOUBLE)
        |      / (n_plus + n_minus)))
        |    / sqrt(CAST(2 * n_plus * n_minus
        |        * (2 * n_plus * n_minus - (n_plus + n_minus)) AS DOUBLE)
        |      / (CAST(n_plus + n_minus AS DOUBLE)
        |         * (n_plus + n_minus) * (n_plus + n_minus - 1))),
        |    6) + 0.0 AS z
        |FROM g ORDER BY event_type""".stripMargin,
    // the naive per-group cumulative-weight scan; the banded refine
    // picks the same first-qualifying row because band cums decompose
    "weighted_median" ->
      """WITH li AS (
        |  SELECT l_returnflag AS g,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS pc,
        |    CAST(l_quantity AS BIGINT) AS wt,
        |    l_orderkey * 8 + l_linenumber AS tb
        |  FROM lineitem),
        |t AS (SELECT g, sum(wt) AS tw FROM li GROUP BY 1),
        |c AS (SELECT g, pc, wt, tb,
        |    sum(wt) OVER (PARTITION BY g ORDER BY pc, tb) AS cum FROM li),
        |q AS (SELECT c.g, pc, cum, tw,
        |    row_number() OVER (PARTITION BY c.g ORDER BY pc, tb) AS rn
        |  FROM c JOIN t ON c.g = t.g WHERE 2 * cum >= tw)
        |SELECT g AS l_returnflag, CAST(pc AS DOUBLE) / 100 AS med_price,
        |  CAST(tw AS BIGINT) AS total_weight
        |FROM q WHERE rn = 1 ORDER BY l_returnflag""".stripMargin,
    // HUGEINT power sums = Spark's DECIMAL(38,0) (both exact 128-bit);
    // the double combination below is op-for-op the Spark expression
    "stats_moments" -> MomentsSql,
    // the identical Holt recursion replayed as a recursive CTE: same
    // init (l₁=y₁, b₁=y₂−y₁), same literals, same operation order — the
    // doubles stay bit-equal until the single boundary round
    "forecast_holt" ->
      """WITH RECURSIVE d AS (
        |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    CAST(sum(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS y
        |  FROM events GROUP BY 1, 2),
        |s AS (
        |  SELECT event_type, y,
        |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS t,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM d),
        |rec AS (
        |  -- base = the state AFTER the first two observations (they are
        |  -- consumed by the init), so the recursion's first update is y3
        |  SELECT event_type, n, 2 AS t,
        |    max(CASE WHEN t = 1 THEN y END) AS l,
        |    max(CASE WHEN t = 2 THEN y END) -
        |      max(CASE WHEN t = 1 THEN y END) AS b
        |  FROM s GROUP BY event_type, n
        |  UNION ALL
        |  SELECT r.event_type, r.n, r.t + 1,
        |    0.5 * p.y + (1.0 - 0.5) * (r.l + r.b),
        |    0.3 * ((0.5 * p.y + (1.0 - 0.5) * (r.l + r.b)) - r.l)
        |      + (1.0 - 0.3) * r.b
        |  FROM rec r JOIN s p
        |    ON p.event_type = r.event_type AND p.t = r.t + 1
        |  WHERE r.t < r.n)
        |SELECT event_type, CAST(n AS BIGINT) AS n_days,
        |  round(l, 6) + 0.0 AS level, round(b, 6) + 0.0 AS trend,
        |  round(l + 7.0 * b, 6) + 0.0 AS forecast_7
        |FROM rec WHERE t = n ORDER BY event_type""".stripMargin,
    // the triple-smoothing recursion replayed with the 7 seasonal slots
    // carried as columns; slot = epoch-day mod 7 (engine-neutral), init
    // left-associates the first-week mean exactly like the Spark fold,
    // arg_min pins the first-week slot value to the FIRST observation
    "forecast_holt_winters" ->
      """WITH RECURSIVE d AS (
        |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    CAST(sum(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS y
        |  FROM events GROUP BY 1, 2),
        |s AS (
        |  SELECT event_type, y,
        |    CAST(day - DATE '1970-01-01' AS INT) % 7 + 1 AS dw,
        |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS t,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM d),
        |base AS (
        |  SELECT event_type, n,
        |    (max(CASE WHEN t = 1 THEN y END) + max(CASE WHEN t = 2 THEN y END)
        |     + max(CASE WHEN t = 3 THEN y END) + max(CASE WHEN t = 4 THEN y END)
        |     + max(CASE WHEN t = 5 THEN y END) + max(CASE WHEN t = 6 THEN y END)
        |     + max(CASE WHEN t = 7 THEN y END)) / 7.0 AS l0,
        |    arg_min(y, t) FILTER (WHERE t <= 7 AND dw = 1) AS w1,
        |    arg_min(y, t) FILTER (WHERE t <= 7 AND dw = 2) AS w2,
        |    arg_min(y, t) FILTER (WHERE t <= 7 AND dw = 3) AS w3,
        |    arg_min(y, t) FILTER (WHERE t <= 7 AND dw = 4) AS w4,
        |    arg_min(y, t) FILTER (WHERE t <= 7 AND dw = 5) AS w5,
        |    arg_min(y, t) FILTER (WHERE t <= 7 AND dw = 6) AS w6,
        |    arg_min(y, t) FILTER (WHERE t <= 7 AND dw = 7) AS w7
        |  FROM s GROUP BY event_type, n),
        |rec AS (
        |  SELECT event_type, n, 7 AS t, l0 AS l, CAST(0.0 AS DOUBLE) AS b,
        |    coalesce(w1 - l0, 0.0) AS s1, coalesce(w2 - l0, 0.0) AS s2,
        |    coalesce(w3 - l0, 0.0) AS s3, coalesce(w4 - l0, 0.0) AS s4,
        |    coalesce(w5 - l0, 0.0) AS s5, coalesce(w6 - l0, 0.0) AS s6,
        |    coalesce(w7 - l0, 0.0) AS s7
        |  FROM base
        |  UNION ALL
        |  SELECT r.event_type, r.n, r.t + 1,
        |    0.3 * (p.y - CASE p.dw WHEN 1 THEN r.s1 WHEN 2 THEN r.s2
        |        WHEN 3 THEN r.s3 WHEN 4 THEN r.s4 WHEN 5 THEN r.s5
        |        WHEN 6 THEN r.s6 ELSE r.s7 END)
        |      + (1.0 - 0.3) * (r.l + r.b),
        |    0.1 * ((0.3 * (p.y - CASE p.dw WHEN 1 THEN r.s1 WHEN 2 THEN r.s2
        |        WHEN 3 THEN r.s3 WHEN 4 THEN r.s4 WHEN 5 THEN r.s5
        |        WHEN 6 THEN r.s6 ELSE r.s7 END)
        |      + (1.0 - 0.3) * (r.l + r.b)) - r.l) + (1.0 - 0.1) * r.b,
        |    CASE WHEN p.dw = 1
        |      THEN 0.2 * (p.y - r.l - r.b) + (1.0 - 0.2) * r.s1
        |      ELSE r.s1 END,
        |    CASE WHEN p.dw = 2
        |      THEN 0.2 * (p.y - r.l - r.b) + (1.0 - 0.2) * r.s2
        |      ELSE r.s2 END,
        |    CASE WHEN p.dw = 3
        |      THEN 0.2 * (p.y - r.l - r.b) + (1.0 - 0.2) * r.s3
        |      ELSE r.s3 END,
        |    CASE WHEN p.dw = 4
        |      THEN 0.2 * (p.y - r.l - r.b) + (1.0 - 0.2) * r.s4
        |      ELSE r.s4 END,
        |    CASE WHEN p.dw = 5
        |      THEN 0.2 * (p.y - r.l - r.b) + (1.0 - 0.2) * r.s5
        |      ELSE r.s5 END,
        |    CASE WHEN p.dw = 6
        |      THEN 0.2 * (p.y - r.l - r.b) + (1.0 - 0.2) * r.s6
        |      ELSE r.s6 END,
        |    CASE WHEN p.dw = 7
        |      THEN 0.2 * (p.y - r.l - r.b) + (1.0 - 0.2) * r.s7
        |      ELSE r.s7 END
        |  FROM rec r JOIN s p
        |    ON p.event_type = r.event_type AND p.t = r.t + 1
        |  WHERE r.t < r.n),
        |last AS (SELECT event_type, dw AS dwl FROM s WHERE t = n)
        |SELECT r.event_type, CAST(r.n AS BIGINT) AS n_days,
        |  round(r.l, 6) + 0.0 AS level, round(r.b, 6) + 0.0 AS trend,
        |  round(r.l + 7.0 * r.b + CASE l2.dwl WHEN 1 THEN r.s1
        |      WHEN 2 THEN r.s2 WHEN 3 THEN r.s3 WHEN 4 THEN r.s4
        |      WHEN 5 THEN r.s5 WHEN 6 THEN r.s6 ELSE r.s7 END, 6) + 0.0
        |    AS forecast_7,
        |  round(greatest(r.s1, r.s2, r.s3, r.s4, r.s5, r.s6, r.s7)
        |      - least(r.s1, r.s2, r.s3, r.s4, r.s5, r.s6, r.s7), 6) + 0.0
        |    AS amplitude
        |FROM rec r JOIN last l2 ON r.event_type = l2.event_type
        |WHERE r.t = r.n ORDER BY r.event_type""".stripMargin,
    // explicit middle-pair median on both sides — no engine quantile
    // implementation in the loop; the intercept pass reuses the
    // UNROUNDED slope exactly as the Spark plan does
    "stats_theilsen" ->
      """WITH d AS (
        |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    CAST(sum(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS y
        |  FROM events GROUP BY 1, 2),
        |xy AS (
        |  SELECT event_type,
        |    CAST(day - DATE '1970-01-01' AS DOUBLE) AS x, y
        |  FROM d),
        |p AS (
        |  SELECT a.event_type, (b.y - a.y) / (b.x - a.x) AS slope
        |  FROM xy a JOIN xy b
        |    ON a.event_type = b.event_type AND b.x > a.x),
        |pr AS (
        |  SELECT event_type, slope,
        |    row_number() OVER (PARTITION BY event_type ORDER BY slope) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS m
        |  FROM p),
        |sl AS (
        |  SELECT event_type, avg(slope) AS slope FROM pr
        |  WHERE rn = (m + 1) // 2 OR rn = (m + 2) // 2
        |  GROUP BY event_type),
        |res AS (
        |  SELECT xy.event_type, xy.y - sl.slope * xy.x AS icpt
        |  FROM xy JOIN sl ON xy.event_type = sl.event_type),
        |rr AS (
        |  SELECT event_type, icpt,
        |    row_number() OVER (PARTITION BY event_type ORDER BY icpt) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS m
        |  FROM res),
        |ic AS (
        |  SELECT event_type, avg(icpt) AS icpt FROM rr
        |  WHERE rn = (m + 1) // 2 OR rn = (m + 2) // 2
        |  GROUP BY event_type),
        |n AS (
        |  SELECT event_type, count(*) AS n_days FROM d GROUP BY event_type)
        |SELECT n.event_type, n.n_days,
        |  round(sl.slope, 6) + 0.0 AS slope,
        |  round(ic.icpt, 6) + 0.0 AS intercept
        |FROM n JOIN sl ON n.event_type = sl.event_type
        |  JOIN ic ON n.event_type = ic.event_type
        |ORDER BY n.event_type""".stripMargin,
    "stats_benford" ->
      """WITH c AS (
        |  SELECT CAST(CAST(abs("value") AS DECIMAL(18,2)) * 100 AS BIGINT)
        |    AS cents
        |  FROM events
        |  WHERE "value" IS NOT NULL AND abs("value") >= 0.01),
        |dg AS (
        |  SELECT CASE
        |    WHEN cents < 10 THEN cents
        |    WHEN cents < 100 THEN cents // 10
        |    WHEN cents < 1000 THEN cents // 100
        |    WHEN cents < 10000 THEN cents // 1000
        |    WHEN cents < 100000 THEN cents // 10000
        |    WHEN cents < 1000000 THEN cents // 100000
        |    WHEN cents < 10000000 THEN cents // 1000000
        |    WHEN cents < 100000000 THEN cents // 10000000
        |    WHEN cents < 1000000000 THEN cents // 100000000
        |    WHEN cents < 10000000000 THEN cents // 1000000000
        |    WHEN cents < 100000000000 THEN cents // 10000000000
        |    WHEN cents < 1000000000000 THEN cents // 100000000000
        |    WHEN cents < 10000000000000 THEN cents // 1000000000000
        |    WHEN cents < 100000000000000 THEN cents // 10000000000000
        |    ELSE cents // 100000000000000 END AS digit
        |  FROM c),
        |n AS (SELECT CAST(digit AS BIGINT) AS digit, count(*) AS n
        |      FROM dg GROUP BY 1)
        |SELECT digit, n,
        |  round(CAST(n AS DOUBLE) / sum(n) OVER (), 6) + 0.0 AS share,
        |  round(ln(1 + 1.0 / digit) / ln(10), 6) + 0.0 AS benford
        |FROM n ORDER BY digit""".stripMargin,
    "window_drawdown" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS v
        |  FROM orders GROUP BY 1),
        |r AS (SELECT day, v,
        |        max(v) OVER (ORDER BY day
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
        |      FROM daily)
        |SELECT day, CAST(v AS DOUBLE) AS revenue, CAST(peak AS DOUBLE) AS peak,
        |  round(CAST(peak - v AS DOUBLE) / CAST(peak AS DOUBLE), 6) + 0.0
        |    AS drawdown
        |FROM r ORDER BY day""".stripMargin,
    "stats_psi" -> {
      val edgeSel = (1 to 9)
        .map(i => s"round(quantile_cont(v, 0.$i), 6) AS e$i").mkString(",\n        |    ")
      val bucketSum = (1 to 9).map(i => s"CAST(v > e$i AS INT)").mkString(" + ")
      s"""WITH e AS (
        |  SELECT event_type, "value" AS v,
        |    epoch_us(CAST(ts AS TIMESTAMP)) < 1705363200000000 AS is_ref
        |  FROM events),
        |edges AS (
        |  SELECT event_type,
        |    $edgeSel
        |  FROM e WHERE is_ref GROUP BY 1),
        |bk AS (
        |  SELECT e.event_type, e.is_ref, $bucketSum AS b
        |  FROM e JOIN edges USING (event_type)),
        |counts AS (
        |  SELECT event_type, is_ref, b, count(*) AS c FROM bk GROUP BY 1, 2, 3),
        |grid AS (
        |  SELECT t.event_type, CAST(g.range AS INT) AS b
        |  FROM (SELECT DISTINCT event_type FROM counts) t, range(0, 10) g),
        |sh AS (
        |  SELECT g.event_type, g.b,
        |    COALESCE(cr.c, 0) AS cr, COALESCE(cc.c, 0) AS cc
        |  FROM grid g
        |  LEFT JOIN (SELECT * FROM counts WHERE is_ref) cr
        |    ON g.event_type = cr.event_type AND g.b = cr.b
        |  LEFT JOIN (SELECT * FROM counts WHERE NOT is_ref) cc
        |    ON g.event_type = cc.event_type AND g.b = cc.b),
        |pq AS (
        |  SELECT event_type, b,
        |    CAST(cr + 1 AS DOUBLE) /
        |      (sum(cr) OVER (PARTITION BY event_type) + 10) AS p,
        |    CAST(cc + 1 AS DOUBLE) /
        |      (sum(cc) OVER (PARTITION BY event_type) + 10) AS q
        |  FROM sh)
        |SELECT event_type, round(sum((p - q) * ln(p / q)), 6) + 0.0 AS psi
        |FROM pq GROUP BY event_type ORDER BY event_type""".stripMargin
    },
    "stats_gini" ->
      """WITH spend AS (
        |  SELECT user_id, sum(CAST("value" AS DECIMAL(18,2))) AS x
        |  FROM events GROUP BY 1),
        |r AS (SELECT x, row_number() OVER (ORDER BY x, user_id) AS i
        |      FROM spend)
        |SELECT CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(sum(x) AS DOUBLE) AS total_value,
        |  round(2.0 * CAST(sum(i * x) AS DOUBLE) /
        |          (count(*) * CAST(sum(x) AS DOUBLE))
        |        - CAST(count(*) + 1 AS DOUBLE) / count(*), 6) + 0.0 AS gini
        |FROM r""".stripMargin,
    "rolling_corr" ->
      """WITH daily AS (
        |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS x,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |m AS (
        |  SELECT day, x, y,
        |    count(*) OVER w AS n,
        |    sum(x) OVER w AS sx, sum(y) OVER w AS sy,
        |    sum(x * y) OVER w AS sxy,
        |    sum(x * x) OVER w AS sxx, sum(y * y) OVER w AS syy
        |  FROM daily
        |  WINDOW w AS (ORDER BY day ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
        |SELECT day, x, y,
        |  CASE WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) > 0
        |       THEN round(CAST(n * sxy - sx * sy AS DOUBLE) /
        |            sqrt(CAST((n * sxx - sx * sx) * (n * syy - sy * sy)
        |                 AS DOUBLE)), 6) + 0.0
        |  END AS r14
        |FROM m WHERE n = 14 ORDER BY day""".stripMargin,
    "stats_anova" ->
      """WITH g AS (
        |  SELECT event_type, count(*) AS n,
        |    CAST(sum(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS s1,
        |    CAST(sum(CAST("value" AS DECIMAL(18,2)) *
        |             CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS s2
        |  FROM events GROUP BY 1),
        |t AS (
        |  SELECT count(*) AS k, CAST(sum(n) AS BIGINT) AS nn, sum(s1) AS t,
        |    sum(s2) AS ss2, sum(s1 * s1 / n) AS sg
        |  FROM g)
        |SELECT k, nn AS n,
        |  round(sg - t * t / nn, 6) + 0.0 AS ss_between,
        |  round(ss2 - sg, 6) + 0.0 AS ss_within,
        |  k - 1 AS df1, nn - k AS df2,
        |  round(((sg - t * t / nn) / (k - 1)) /
        |        ((ss2 - sg) / (nn - k)), 6) + 0.0 AS f_stat
        |FROM t""".stripMargin,
    "stats_mutual_info" ->
      """WITH j AS (SELECT event_type,
        |    CAST(floor("value" / 100) AS BIGINT) AS vb, count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS r
        |      FROM j GROUP BY 1),
        |s AS (SELECT vb, CAST(sum(c) AS BIGINT) AS s FROM j GROUP BY 1),
        |n AS (SELECT CAST(sum(c) AS BIGINT) AS n, count(*) AS n_cells
        |      FROM j),
        |mi AS (SELECT round(sum((c / CAST(n.n AS DOUBLE)) *
        |         ln(CAST(c * n.n AS DOUBLE) /
        |            CAST(r.r * s.s AS DOUBLE))), 6) + 0.0 AS mi_nats
        |       FROM j JOIN r USING (event_type) JOIN s USING (vb)
        |       CROSS JOIN n),
        |ht AS (SELECT round(-sum((r / CAST(n.n AS DOUBLE)) *
        |         ln(r / CAST(n.n AS DOUBLE))), 6) + 0.0 AS h_type
        |       FROM r CROSS JOIN n),
        |hb AS (SELECT round(-sum((s / CAST(n.n AS DOUBLE)) *
        |         ln(s / CAST(n.n AS DOUBLE))), 6) + 0.0 AS h_bucket
        |       FROM s CROSS JOIN n)
        |SELECT n.n, n.n_cells, mi.mi_nats, ht.h_type, hb.h_bucket,
        |  round(mi.mi_nats / sqrt(ht.h_type * hb.h_bucket), 6) + 0.0
        |    AS nmi
        |FROM n CROSS JOIN mi CROSS JOIN ht CROSS JOIN hb""".stripMargin,
    "dist_lorenz" ->
      """WITH spend AS (SELECT user_id,
        |    sum(CAST("value" AS DECIMAL(18,2))) AS v
        |  FROM events GROUP BY 1),
        |r AS (SELECT v, row_number() OVER (ORDER BY v, user_id) AS rn,
        |        count(*) OVER () AS m, sum(v) OVER () AS tot
        |      FROM spend),
        |d AS (SELECT ((rn - 1) * 10) // m + 1 AS decile, v, tot FROM r),
        |g AS (SELECT decile, count(*) AS n_users, sum(v) AS spend,
        |        any_value(tot) AS tot
        |      FROM d GROUP BY 1)
        |SELECT CAST(decile AS INT) AS decile, n_users,
        |  CAST(spend AS DOUBLE) AS spend,
        |  round(CAST(spend AS DOUBLE) / CAST(tot AS DOUBLE), 6) + 0.0
        |    AS share,
        |  round(CAST(sum(spend) OVER (ORDER BY decile
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |        AS DOUBLE) / CAST(tot AS DOUBLE), 6) + 0.0 AS cum_share
        |FROM g ORDER BY decile""".stripMargin,
    "dist_palma" ->
      """WITH spend AS (SELECT user_id,
        |    sum(CAST("value" AS DECIMAL(18,2))) AS v
        |  FROM events GROUP BY 1),
        |r AS (SELECT v, row_number() OVER (ORDER BY v, user_id) AS rn,
        |        count(*) OVER () AS m
        |      FROM spend),
        |d AS (SELECT ((rn - 1) * 10) // m + 1 AS decile, v FROM r),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n_users, sum(v) AS tot,
        |        sum(CASE WHEN decile = 10 THEN v END) AS top10,
        |        sum(CASE WHEN decile <= 4 THEN v END) AS bot40
        |      FROM d)
        |SELECT n_users,
        |  round(CAST(top10 AS DOUBLE) / CAST(tot AS DOUBLE), 6) + 0.0
        |    AS top10_share,
        |  round(CAST(bot40 AS DOUBLE) / CAST(tot AS DOUBLE), 6) + 0.0
        |    AS bot40_share,
        |  round(CAST(top10 AS DOUBLE) / CAST(bot40 AS DOUBLE), 6) + 0.0
        |    AS palma_ratio
        |FROM a""".stripMargin,
    "dist_quintile_shares" ->
      """WITH spend AS (SELECT user_id,
        |    sum(CAST("value" AS DECIMAL(18,2))) AS v
        |  FROM events GROUP BY 1),
        |r AS (SELECT v, row_number() OVER (ORDER BY v, user_id) AS rn,
        |        count(*) OVER () AS m, sum(v) OVER () AS tot
        |      FROM spend),
        |d AS (SELECT ((rn - 1) * 5) // m + 1 AS quintile, v, tot FROM r),
        |g AS (SELECT quintile, CAST(count(*) AS BIGINT) AS n_users,
        |        sum(v) AS spend, any_value(tot) AS tot
        |      FROM d GROUP BY 1)
        |SELECT CAST(quintile AS INT) AS quintile, n_users,
        |  CAST(spend AS DOUBLE) AS spend,
        |  round(CAST(spend AS DOUBLE) / CAST(tot AS DOUBLE), 6) + 0.0
        |    AS share,
        |  round(CAST(sum(spend) OVER (ORDER BY quintile
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |        AS DOUBLE) / CAST(tot AS DOUBLE), 6) + 0.0 AS cum_share,
        |  round(CAST(max(CASE WHEN quintile = 5 THEN spend END) OVER ()
        |        AS DOUBLE)
        |    / CAST(max(CASE WHEN quintile = 1 THEN spend END) OVER ()
        |        AS DOUBLE), 6) + 0.0 AS s80_s20
        |FROM g ORDER BY quintile""".stripMargin,
    "stats_granger" ->
      """WITH daily AS (
        |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, event_type,
        |    CAST(sum(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS v
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |  GROUP BY 1, 2),
        |y AS (SELECT day, v AS y FROM daily WHERE event_type = 'purchase'),
        |x AS (SELECT day, v AS x FROM daily WHERE event_type = 'click'),
        |f AS (SELECT a.day, a.y, b.y AS ylag, c.x AS xlag
        |      FROM y a JOIN y b ON b.day = a.day - 1
        |      JOIN x c ON c.day = a.day - 1),
        |m AS (SELECT count(*) AS n,
        |    round(corr(y, xlag), 6) + 0.0 AS r_yx,
        |    round(corr(y, ylag), 6) + 0.0 AS r_yy,
        |    round(corr(xlag, ylag), 6) + 0.0 AS r_xy
        |  FROM f),
        |p AS (SELECT n, r_yx, r_yy,
        |    round((r_yx - r_yy * r_xy) /
        |          sqrt((1.0 - r_yy * r_yy) * (1.0 - r_xy * r_xy)), 6)
        |      + 0.0 AS r_partial
        |  FROM m),
        |q AS (SELECT *,
        |    round(CAST(n - 3 AS DOUBLE) * r_partial * r_partial /
        |          (1.0 - r_partial * r_partial), 6) + 0.0 AS f_stat
        |  FROM p)
        |SELECT n, r_yx, r_yy, r_partial, f_stat,
        |  f_stat > 4.0 AS reject_5pct
        |FROM q""".stripMargin,
    "dq_volume_anomaly" ->
      """WITH c AS (SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    CAST(count(*) AS DOUBLE) AS cnt FROM events GROUP BY 1),
        |mr AS (SELECT cnt, row_number() OVER (ORDER BY cnt) AS rn,
        |              count(*) OVER () AS m FROM c),
        |med AS (SELECT avg(cnt) AS med FROM mr
        |        WHERE rn = (m + 1) // 2 OR rn = (m + 2) // 2),
        |dv AS (SELECT abs(c.cnt - med.med) AS dev
        |       FROM c CROSS JOIN med),
        |dr AS (SELECT dev, row_number() OVER (ORDER BY dev) AS rn,
        |              count(*) OVER () AS m FROM dv),
        |mad AS (SELECT avg(dev) AS mad FROM dr
        |        WHERE rn = (m + 1) // 2 OR rn = (m + 2) // 2)
        |SELECT c.day, CAST(c.cnt AS BIGINT) AS n_rows,
        |  round(med.med, 6) + 0.0 AS med, round(mad.mad, 6) + 0.0 AS mad,
        |  abs(c.cnt - med.med) > round(3.5 * mad.mad, 6) + 0.0
        |    AS is_anomaly
        |FROM c CROSS JOIN med CROSS JOIN mad ORDER BY day""".stripMargin,
    "window_growth" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    CAST(sum(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS v
        |  FROM events GROUP BY 1, 2)
        |SELECT a.event_type, a.day, a.v AS rev,
        |  round((a.v - b.v) / b.v * 100, 6) + 0.0 AS dod_pct,
        |  round((a.v - c.v) / c.v * 100, 6) + 0.0 AS wow_pct
        |FROM daily a
        |LEFT JOIN daily b ON a.event_type = b.event_type
        |  AND b.day = a.day - 1
        |LEFT JOIN daily c ON a.event_type = c.event_type
        |  AND c.day = a.day - 7
        |ORDER BY a.event_type, a.day""".stripMargin,
    "backlog_curve" ->
      """WITH li AS (
        |  SELECT CAST(l.l_shipdate AS DATE) AS ship_d,
        |         CAST(o.o_orderdate AS DATE) AS ord_d
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |p AS (SELECT ord_d AS day, count(*) AS placed FROM li GROUP BY 1),
        |s AS (SELECT ship_d AS day, count(*) AS shipped FROM li GROUP BY 1),
        |j AS (SELECT COALESCE(p.day, s.day) AS day,
        |        COALESCE(p.placed, 0) AS placed,
        |        COALESCE(s.shipped, 0) AS shipped
        |      FROM p FULL OUTER JOIN s ON p.day = s.day)
        |SELECT day, placed, shipped,
        |  CAST(sum(placed) OVER w AS BIGINT) AS cum_placed,
        |  CAST(sum(shipped) OVER w AS BIGINT) AS cum_shipped,
        |  CAST(sum(placed) OVER w - sum(shipped) OVER w AS BIGINT)
        |    AS backlog
        |FROM j
        |WINDOW w AS (ORDER BY day
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY day""".stripMargin,
    "stats_ecdf" ->
      """WITH st AS (SELECT CAST(min("value") AS DOUBLE) AS lo,
        |                   CAST(max("value") AS DOUBLE) AS hi
        |            FROM events),
        |grid AS (SELECT CAST(j AS BIGINT) AS j,
        |    lo + (hi - lo) * CAST(j AS DOUBLE) / 20 AS gx
        |  FROM st CROSS JOIN (SELECT unnest(range(0, 21)) AS j))
        |SELECT event_type, CAST(j AS INT) AS grid_id,
        |  round(gx, 6) + 0.0 AS x,
        |  round(sum(CASE WHEN "value" <= gx THEN 1 ELSE 0 END)
        |        / CAST(count(*) AS DOUBLE), 6) + 0.0 AS ecdf
        |FROM events CROSS JOIN grid
        |GROUP BY event_type, j, gx
        |ORDER BY event_type, grid_id""".stripMargin,
    "sample_ess" ->
      """WITH c AS (SELECT event_type, count(*) AS ct
        |           FROM events GROUP BY 1),
        |tot AS (SELECT CAST(sum(ct) AS BIGINT) AS n, count(*) AS k
        |        FROM c),
        |w AS (SELECT c.ct, tot.n, tot.k,
        |    round(n / CAST(k * ct AS DOUBLE), 6) + 0.0 AS w
        |  FROM c CROSS JOIN tot),
        |w2 AS (SELECT *, least(w, 3.0) AS wc FROM w)
        |SELECT n, CAST(k AS INT) AS n_types,
        |  round(sum(ct * w) * sum(ct * w) / sum(ct * w * w), 6) + 0.0
        |    AS ess_raw,
        |  round(sum(ct * wc) * sum(ct * wc) / sum(ct * wc * wc), 6) + 0.0
        |    AS ess_clipped,
        |  round(sum(ct * w) * sum(ct * w) / sum(ct * w * w) / n, 6) + 0.0
        |    AS ess_frac
        |FROM w2 GROUP BY n, k""".stripMargin,
    "stats_cohens_d" ->
      """WITH m AS (
        |  SELECT event_type, count(*) AS n,
        |    CAST(sum(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST("value" AS DECIMAL(18,2)) *
        |             CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS sxx
        |  FROM events GROUP BY 1),
        |s AS (SELECT event_type, n, sx / n AS mean,
        |        (sxx - sx * sx / n) / (n - 1) AS var
        |      FROM m)
        |SELECT a.event_type AS type_a, b.event_type AS type_b,
        |  a.n AS na, b.n AS nb,
        |  round(a.mean, 6) + 0.0 AS mean_a,
        |  round(b.mean, 6) + 0.0 AS mean_b,
        |  round((a.mean - b.mean) /
        |        sqrt(((a.n - 1) * a.var + (b.n - 1) * b.var) /
        |             (a.n + b.n - 2)), 6) + 0.0 AS cohens_d
        |FROM s a JOIN s b ON a.event_type < b.event_type
        |ORDER BY type_a, type_b""".stripMargin,
    "stats_partial_corr" ->
      """WITH m AS (SELECT
        |    round(corr(l_quantity, l_extendedprice), 6) + 0.0 AS r_qp,
        |    round(corr(l_quantity, l_tax), 6) + 0.0 AS r_qt,
        |    round(corr(l_extendedprice, l_tax), 6) + 0.0 AS r_pt,
        |    round(corr(l_quantity, l_discount), 6) + 0.0 AS r_qd,
        |    round(corr(l_extendedprice, l_discount), 6) + 0.0 AS r_pd,
        |    round(corr(l_tax, l_discount), 6) + 0.0 AS r_td
        |  FROM lineitem),
        |rows_ AS (
        |  SELECT 'l_quantity' AS x, 'l_extendedprice' AS y,
        |    r_qp AS r_xy, r_qd AS r_xz, r_pd AS r_yz FROM m
        |  UNION ALL
        |  SELECT 'l_quantity', 'l_tax', r_qt, r_qd, r_td FROM m
        |  UNION ALL
        |  SELECT 'l_extendedprice', 'l_tax', r_pt, r_pd, r_td FROM m)
        |SELECT x, y, 'l_discount' AS control, r_xy,
        |  round((r_xy - r_xz * r_yz) /
        |        sqrt((1.0 - r_xz * r_xz) * (1.0 - r_yz * r_yz)), 6) + 0.0
        |    AS r_partial
        |FROM rows_ ORDER BY x, y""".stripMargin,
    "session_gap_hist" ->
      """WITH e AS (
        |  SELECT user_id, event_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us
        |  FROM events),
        |g0 AS (SELECT user_id, us,
        |    lag(us) OVER (PARTITION BY user_id
        |                  ORDER BY us, event_id) AS prev
        |  FROM e),
        |g AS (SELECT (us - prev) // 1000000 AS gap_s FROM g0
        |      WHERE prev IS NOT NULL),
        |b AS (SELECT CASE WHEN gap_s < 1 THEN 0 WHEN gap_s < 10 THEN 1
        |             WHEN gap_s < 60 THEN 2 WHEN gap_s < 600 THEN 3
        |             WHEN gap_s < 3600 THEN 4 ELSE 5 END AS b
        |      FROM g),
        |c AS (SELECT CAST(b AS INT) AS b, count(*) AS cnt
        |      FROM b GROUP BY 1)
        |SELECT b,
        |  CASE b WHEN 0 THEN 'lt_1s' WHEN 1 THEN 'lt_10s'
        |         WHEN 2 THEN 'lt_1m' WHEN 3 THEN 'lt_10m'
        |         WHEN 4 THEN 'lt_1h' ELSE 'ge_1h' END AS bucket,
        |  cnt,
        |  round(cnt / CAST(sum(cnt) OVER () AS DOUBLE), 6) + 0.0 AS share
        |FROM c ORDER BY b""".stripMargin,
    "stats_hodges_lehmann" ->
      """WITH daily AS (
        |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    CAST(sum(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS v
        |  FROM events GROUP BY 1),
        |p AS (SELECT (a.v + b.v) / 2 AS walsh
        |      FROM daily a JOIN daily b ON a.day <= b.day),
        |pr AS (SELECT walsh, row_number() OVER (ORDER BY walsh) AS rn,
        |              count(*) OVER () AS m FROM p),
        |med AS (SELECT avg(walsh) AS walsh FROM pr
        |        WHERE rn = (m + 1) // 2 OR rn = (m + 2) // 2),
        |n AS (SELECT count(*) AS n_days,
        |             CAST(count(*) * (count(*) + 1) / 2 AS BIGINT)
        |               AS n_pairs
        |      FROM daily)
        |SELECT n_days, n_pairs, round(walsh, 6) + 0.0 AS hl_estimate
        |FROM n CROSS JOIN med""".stripMargin,
    "forecast_mase" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    sum(CAST("value" AS DECIMAL(18,2))) AS v
        |  FROM events GROUP BY 1, 2),
        |j AS (SELECT a.event_type, a.v, b.v AS v1, c.v AS v7
        |      FROM daily a
        |      JOIN daily b ON a.event_type = b.event_type
        |        AND b.day = a.day - 1
        |      JOIN daily c ON a.event_type = c.event_type
        |        AND c.day = a.day - 7)
        |SELECT event_type, count(*) AS n_eval,
        |  round(CAST(sum(abs(v - v1)) AS DOUBLE) / count(*), 6) + 0.0
        |    AS mae_naive,
        |  round(CAST(sum(abs(v - v7)) AS DOUBLE) / count(*), 6) + 0.0
        |    AS mae_snaive,
        |  round(CAST(sum(abs(v - v7)) AS DOUBLE) /
        |        CAST(sum(abs(v - v1)) AS DOUBLE), 6) + 0.0 AS mase
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    "stats_changepoint" ->
      """WITH daily AS (
        |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    sum(CAST("value" AS DECIMAL(18,2))) AS v
        |  FROM events GROUP BY 1),
        |pre AS (SELECT day, v,
        |    row_number() OVER (ORDER BY day) AS t,
        |    sum(v) OVER (ORDER BY day
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS st
        |  FROM daily),
        |tot AS (SELECT count(*) AS n, sum(v) AS sn FROM daily)
        |SELECT day AS change_day, CAST(t AS BIGINT) AS t,
        |  n AS n_days,
        |  round(CAST(abs(st * n - sn * t) AS DOUBLE) / n, 6) + 0.0
        |    AS cusum_stat
        |FROM pre CROSS JOIN tot
        |WHERE t < n
        |ORDER BY abs(st * n - sn * t) DESC, day LIMIT 1""".stripMargin,
    "privacy_kanon" ->
      """WITH g AS (
        |  SELECT event_type,
        |    CAST(((CAST(ts AS DATE) - DATE '1970-01-01') % 7 + 7) % 7
        |         AS INTEGER) AS dow,
        |    CAST(floor("value" / 100) AS BIGINT) AS vb,
        |    count(*) AS k
        |  FROM events GROUP BY 1, 2, 3)
        |SELECT count(*) AS n_groups, CAST(sum(k) AS BIGINT) AS n_rows,
        |  CAST(sum(CASE WHEN k < 5 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS groups_lt_5,
        |  CAST(sum(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT)
        |    AS rows_lt_5,
        |  round(sum(CASE WHEN k < 5 THEN k ELSE 0 END)
        |        / CAST(sum(k) AS DOUBLE), 6) + 0.0 AS pct_rows_lt_5,
        |  CAST(sum(CASE WHEN k < 10 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS groups_lt_10,
        |  CAST(sum(CASE WHEN k < 10 THEN k ELSE 0 END) AS BIGINT)
        |    AS rows_lt_10,
        |  round(sum(CASE WHEN k < 10 THEN k ELSE 0 END)
        |        / CAST(sum(k) AS DOUBLE), 6) + 0.0 AS pct_rows_lt_10
        |FROM g""".stripMargin,
    "window_rsi" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    sum(CAST("value" AS DECIMAL(18,2))) AS v
        |  FROM events GROUP BY 1, 2),
        |d AS (SELECT *, v - lag(v) OVER wo AS delta FROM daily
        |      WINDOW wo AS (PARTITION BY event_type ORDER BY day)),
        |f AS (SELECT * FROM d WHERE delta IS NOT NULL),
        |r AS (SELECT event_type, day,
        |    row_number() OVER wo AS rn,
        |    sum(CASE WHEN delta > 0 THEN delta
        |             ELSE CAST(0 AS DECIMAL(18,2)) END) OVER w AS sg,
        |    sum(CASE WHEN delta < 0 THEN -delta
        |             ELSE CAST(0 AS DECIMAL(18,2)) END) OVER w AS sl
        |  FROM f
        |  WINDOW wo AS (PARTITION BY event_type ORDER BY day),
        |    w AS (PARTITION BY event_type ORDER BY day
        |          ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
        |SELECT event_type, day,
        |  CAST(sg AS DOUBLE) AS sum_gain, CAST(sl AS DOUBLE) AS sum_loss,
        |  round(100 * CAST(sg AS DOUBLE) / CAST(sg + sl AS DOUBLE), 6)
        |    + 0.0 AS rsi14
        |FROM r WHERE rn >= 14 AND sg + sl > 0
        |ORDER BY event_type, day""".stripMargin,
    "hist_kde" ->
      """WITH st AS (
        |  SELECT CAST(min("value") AS DOUBLE) AS lo,
        |    CAST(max("value") AS DOUBLE) AS hi, count(*) AS n,
        |    CAST(sum(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST("value" AS DECIMAL(18,2)) *
        |             CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS sxx
        |  FROM events),
        |p AS (SELECT *, round(1.06 * sqrt((sxx - sx * sx / n) / (n - 1)) *
        |                      pow(CAST(n AS DOUBLE), -0.2), 6) AS h
        |      FROM st),
        |grid AS (SELECT p.*, CAST(j AS BIGINT) AS j,
        |    lo + (hi - lo) * CAST(j AS DOUBLE) / 63 AS gx
        |  FROM p CROSS JOIN (SELECT unnest(range(0, 64)) AS j)),
        |terms AS (SELECT g.j, g.gx, g.n, g.h,
        |    CAST(round(exp((("value" - g.gx) / g.h) *
        |                   (("value" - g.gx) / g.h) / -2), 9)
        |         AS DECIMAL(18,9)) AS term
        |  FROM events CROSS JOIN grid g)
        |SELECT CAST(j AS INT) AS grid_id, round(gx, 6) + 0.0 AS x,
        |  round(CAST(sum(term) AS DOUBLE) /
        |        (CAST(n AS DOUBLE) * h * 2.5066282746310002), 6) + 0.0
        |    AS density
        |FROM terms GROUP BY j, gx, n, h ORDER BY grid_id""".stripMargin,
    "stats_qq" -> {
      val sq = (1 to 9)
        .map(i => s"round(quantile_cont(\"value\", 0.$i), 6) + 0.0 AS q$i")
        .mkString(",\n        |    ")
      val pick = (1 to 9).map(i => s"WHEN $i THEN q$i").mkString(" ")
      s"""WITH t AS (SELECT event_type,
        |    $sq
        |  FROM events GROUP BY 1),
        |g AS (SELECT
        |    $sq
        |  FROM events),
        |d AS (SELECT CAST(unnest(range(1, 10)) AS INT) AS decile),
        |ts AS (SELECT event_type, decile,
        |         CASE decile $pick END AS q_type
        |       FROM t CROSS JOIN d),
        |gs AS (SELECT decile, CASE decile $pick END AS q_global
        |       FROM g CROSS JOIN d)
        |SELECT ts.event_type, ts.decile, ts.q_type, gs.q_global,
        |  round(ts.q_type - gs.q_global, 6) + 0.0 AS shift
        |FROM ts JOIN gs USING (decile)
        |ORDER BY event_type, decile""".stripMargin
    },
    "stats_jsd" ->
      """WITH c AS (
        |  SELECT event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) < 1705363200000000 AS is_ref,
        |    count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT
        |    CAST(sum(CASE WHEN is_ref THEN c ELSE 0 END) AS BIGINT) AS tr,
        |    CAST(sum(CASE WHEN NOT is_ref THEN c ELSE 0 END) AS BIGINT) AS tc
        |  FROM c),
        |s AS (
        |  SELECT ty.event_type,
        |    COALESCE(r.c, 0) / CAST(t.tr AS DOUBLE) AS p,
        |    COALESCE(u.c, 0) / CAST(t.tc AS DOUBLE) AS q
        |  FROM (SELECT DISTINCT event_type FROM c) ty
        |  LEFT JOIN (SELECT event_type, c FROM c WHERE is_ref) r
        |    USING (event_type)
        |  LEFT JOIN (SELECT event_type, c FROM c WHERE NOT is_ref) u
        |    USING (event_type)
        |  CROSS JOIN t)
        |SELECT event_type, round(p, 6) + 0.0 AS p, round(q, 6) + 0.0 AS q,
        |  round(CASE WHEN p > 0 THEN p * ln(p / ((p + q) / 2))
        |             ELSE 0.0 END / 2 +
        |        CASE WHEN q > 0 THEN q * ln(q / ((p + q) / 2))
        |             ELSE 0.0 END / 2, 6) + 0.0 AS jsd_term
        |FROM s ORDER BY event_type""".stripMargin,
    "stats_ljung_box" ->
      """WITH daily AS (
        |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    CAST(sum(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS v
        |  FROM events GROUP BY 1),
        |lagged AS (
        |  SELECT l.lag, a.v, b.v AS pv
        |  FROM daily a
        |  CROSS JOIN (SELECT unnest(range(1, 8)) AS lag) l
        |  JOIN daily b ON b.day = a.day - CAST(l.lag AS INTEGER)),
        |m AS (
        |  SELECT CAST(lag AS BIGINT) AS lag, count(*) AS n,
        |    CAST(sum(CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(pv AS DECIMAL(18,2))) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(v AS DECIMAL(18,2)) * CAST(pv AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
        |    CAST(sum(CAST(v AS DECIMAL(18,2)) * CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
        |    CAST(sum(CAST(pv AS DECIMAL(18,2)) * CAST(pv AS DECIMAL(18,2))) AS DOUBLE) AS syy
        |  FROM lagged GROUP BY 1),
        |acf AS (
        |  SELECT lag,
        |    round((CAST(n AS DOUBLE) * sxy - sx * sy) /
        |          sqrt((CAST(n AS DOUBLE) * sxx - sx * sx) *
        |               (CAST(n AS DOUBLE) * syy - sy * sy)), 6) + 0.0 AS acf
        |  FROM m),
        |nd AS (SELECT count(*) AS n_days FROM daily)
        |SELECT n_days, count(*) AS df,
        |  round(CAST(n_days AS DOUBLE) * CAST(n_days + 2 AS DOUBLE) *
        |        sum(acf * acf / CAST(n_days - lag AS DOUBLE)), 6) + 0.0
        |    AS q_stat,
        |  (round(CAST(n_days AS DOUBLE) * CAST(n_days + 2 AS DOUBLE) *
        |         sum(acf * acf / CAST(n_days - lag AS DOUBLE)), 6) + 0.0
        |   > 14.06714) AS reject_5pct
        |FROM acf CROSS JOIN nd GROUP BY n_days""".stripMargin,
    "window_bollinger" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    CAST(sum(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS v
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT *,
        |    row_number() OVER wo AS rn,
        |    avg(v) OVER w AS m,
        |    stddev_samp(v) OVER w AS s
        |  FROM daily
        |  WINDOW wo AS (PARTITION BY event_type ORDER BY day),
        |    w AS (PARTITION BY event_type ORDER BY day
        |          ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
        |SELECT event_type, day, v,
        |  round(m, 6) + 0.0 AS ma7, round(s, 6) + 0.0 AS sd7,
        |  round(m + 2 * s, 6) + 0.0 AS upper,
        |  round(m - 2 * s, 6) + 0.0 AS lower,
        |  (v > round(m + 2 * s, 6) + 0.0 OR
        |   v < round(m - 2 * s, 6) + 0.0) AS is_break
        |FROM r WHERE rn >= 7 AND s > 0
        |ORDER BY event_type, day""".stripMargin,
    "stats_acf" ->
      """WITH daily AS (
        |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    CAST(sum(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS v
        |  FROM events GROUP BY 1),
        |lagged AS (
        |  SELECT l.lag, a.v, b.v AS pv
        |  FROM daily a
        |  CROSS JOIN (SELECT unnest(range(1, 8)) AS lag) l
        |  JOIN daily b ON b.day = a.day - CAST(l.lag AS INTEGER)),
        |m AS (
        |  SELECT CAST(lag AS BIGINT) AS lag, count(*) AS n,
        |    CAST(sum(CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(pv AS DECIMAL(18,2))) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(v AS DECIMAL(18,2)) * CAST(pv AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
        |    CAST(sum(CAST(v AS DECIMAL(18,2)) * CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
        |    CAST(sum(CAST(pv AS DECIMAL(18,2)) * CAST(pv AS DECIMAL(18,2))) AS DOUBLE) AS syy
        |  FROM lagged GROUP BY 1)
        |SELECT lag, n,
        |  round((CAST(n AS DOUBLE) * sxy - sx * sy) /
        |        sqrt((CAST(n AS DOUBLE) * sxx - sx * sx) *
        |             (CAST(n AS DOUBLE) * syy - sy * sy)), 6) + 0.0 AS acf
        |FROM m ORDER BY lag""".stripMargin,
    "window_rolling_zscore" ->
      """WITH e AS (
        |  SELECT event_id, user_id, "value" AS v,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us
        |  FROM events),
        |r AS (SELECT *,
        |        row_number() OVER wo AS rn,
        |        avg(v) OVER w AS m,
        |        stddev_samp(v) OVER w AS s
        |      FROM e
        |      WINDOW
        |        wo AS (PARTITION BY user_id ORDER BY us, event_id),
        |        w AS (PARTITION BY user_id ORDER BY us, event_id
        |              ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)),
        |z AS (SELECT event_id, user_id,
        |        round((v - m) / s, 6) + 0.0 AS z
        |      FROM r WHERE rn >= 20 AND s > 0)
        |SELECT event_id, user_id, z, abs(z) > 3 AS is_out
        |FROM z ORDER BY user_id, event_id""".stripMargin,
    "stats_ttest" ->
      """WITH m AS (
        |  SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
        |    avg("value") AS m, var_samp("value") AS v
        |  FROM events GROUP BY 1)
        |SELECT a.event_type AS type_a, b.event_type AS type_b,
        |  round((a.m - b.m) / sqrt(a.v / a.n + b.v / b.n), 6) + 0.0
        |    AS t_stat,
        |  round(pow(a.v / a.n + b.v / b.n, 2) /
        |    ((a.v / a.n) * (a.v / a.n) / (a.n - 1) +
        |     (b.v / b.n) * (b.v / b.n) / (b.n - 1)), 6) + 0.0 AS df
        |FROM m a, m b WHERE a.event_type < b.event_type
        |ORDER BY type_a, type_b""".stripMargin,
    "stats_chi2" ->
      """WITH e0 AS (
        |  SELECT event_type,
        |    ((CAST(ts AS DATE) - DATE '1970-01-01') % 7 + 7) % 7 AS dow
        |  FROM events),
        |o AS (SELECT event_type, CAST(dow AS INTEGER) AS dow,
        |        count(*) AS o FROM e0 GROUP BY 1, 2),
        |rt AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS rt FROM o GROUP BY 1),
        |ct AS (SELECT dow, CAST(sum(o) AS BIGINT) AS ct FROM o GROUP BY 1),
        |n AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM o),
        |grid AS (
        |  SELECT rt.event_type, ct.dow,
        |    CAST(COALESCE(o.o, 0) AS BIGINT) AS o,
        |    CAST(rt.rt AS DOUBLE) * ct.ct / n.n AS e
        |  FROM rt CROSS JOIN ct CROSS JOIN n
        |  LEFT JOIN o ON o.event_type = rt.event_type AND o.dow = ct.dow)
        |SELECT round(sum((o - e) * (o - e) / e), 6) + 0.0 AS chi2,
        |  CAST((count(DISTINCT event_type) - 1) * (count(DISTINCT dow) - 1)
        |       AS BIGINT) AS df,
        |  any_value(n.n) AS n
        |FROM grid, n""".stripMargin,
    "stats_corr_matrix" -> {
      val pairs = for {
        i <- CorrCols.indices; j <- (i + 1) until CorrCols.length
      } yield
        s"""SELECT '${CorrCols(i)}' AS col_a, '${CorrCols(j)}' AS col_b,
           |  round(corr(${CorrCols(i)}, ${CorrCols(j)}), 6) + 0.0 AS r
           |FROM lineitem""".stripMargin
      pairs.mkString("", "\nUNION ALL\n", "\nORDER BY col_a, col_b")
    },
    "regr_trend" ->
      """SELECT event_type,
        |  round(regr_slope("value", x), 6) + 0.0 AS slope,
        |  round(regr_intercept("value", x), 6) + 0.0 AS intercept,
        |  round(regr_r2("value", x), 6) + 0.0 AS r2,
        |  CAST(regr_count("value", x) AS BIGINT) AS n
        |FROM (SELECT event_type, "value",
        |        CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000
        |             AS DOUBLE) AS x
        |      FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "group_entropy" ->
      """WITH c AS (
        |  SELECT source, lang, count(*) AS cnt FROM documents GROUP BY 1, 2),
        |t AS (SELECT *, sum(cnt) OVER (PARTITION BY source) AS tot FROM c)
        |SELECT source, count(*) AS n_langs,
        |  CAST(any_value(tot) AS BIGINT) AS n_docs,
        |  round(-sum((cnt / CAST(tot AS DOUBLE)) *
        |             ln(cnt / CAST(tot AS DOUBLE))), 6) + 0.0 AS entropy
        |FROM t GROUP BY source ORDER BY source""".stripMargin,
    "hist_equidepth" ->
      """SELECT event_type, bucket, min("value") AS lo, max("value") AS hi,
        |  count(*) AS cnt
        |FROM (SELECT event_type, "value", event_id,
        |        ntile(10) OVER (PARTITION BY event_type
        |                        ORDER BY "value", event_id) AS bucket
        |      FROM events)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "window_ewma" ->
      """WITH e AS (
        |  SELECT event_id, user_id, "value" AS v,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us
        |  FROM events),
        |r AS (SELECT *, row_number() OVER (PARTITION BY user_id
        |        ORDER BY us, event_id) AS rn FROM e)
        |SELECT a.event_id, a.user_id,
        |  round(sum(b.v * pow(0.9, a.rn - b.rn)) /
        |        ((1 - pow(0.9, count(*))) / 0.1), 6) + 0.0 AS ewma
        |FROM r a JOIN r b
        |  ON a.user_id = b.user_id AND b.rn BETWEEN a.rn - 49 AND a.rn
        |GROUP BY a.event_id, a.user_id
        |ORDER BY a.user_id, a.event_id""".stripMargin,
    "window_streaks" ->
      """WITH d AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |i AS (SELECT user_id,
        |        (day - DATE '1970-01-01')
        |          - row_number() OVER (PARTITION BY user_id ORDER BY day)
        |          AS grp
        |      FROM d),
        |s AS (SELECT user_id, grp, count(*) AS len FROM i GROUP BY 1, 2)
        |SELECT user_id, max(len) AS longest_streak, count(*) AS n_streaks,
        |  CAST(sum(len) AS BIGINT) AS active_days
        |FROM s GROUP BY user_id ORDER BY user_id""".stripMargin,
    "resample_interp" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day, avg("value") AS v
        |  FROM events GROUP BY 1, 2),
        |grid AS (
        |  SELECT user_id, unnest(generate_series(d0, d1,
        |    INTERVAL 1 DAY))::DATE AS day
        |  FROM (SELECT user_id, min(day) AS d0, max(day) AS d1
        |        FROM daily GROUP BY 1)),
        |j AS (
        |  SELECT g.user_id, g.day, d.v FROM grid g
        |  LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day),
        |f AS (
        |  SELECT *,
        |    last_value(v IGNORE NULLS) OVER wp AS pv,
        |    last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
        |      OVER wp AS pd,
        |    first_value(v IGNORE NULLS) OVER wn AS nv,
        |    first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
        |      OVER wn AS nd
        |  FROM j
        |  WINDOW
        |    wp AS (PARTITION BY user_id ORDER BY day
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |    wn AS (PARTITION BY user_id ORDER BY day
        |           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
        |SELECT user_id, strftime(day, '%Y-%m-%d') AS day_s,
        |  CASE WHEN v IS NOT NULL THEN round(v, 6) + 0.0
        |       ELSE round(pv + (nv - pv) *
        |         ((day - pd) / CAST(nd - pd AS DOUBLE)), 6) + 0.0
        |  END AS val,
        |  v IS NULL AS is_gap
        |FROM f ORDER BY user_id, day_s""".stripMargin,
    "window_cusum" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |    CAST("value" AS DECIMAL(18,2)) AS v
        |  FROM events),
        |m AS (SELECT *, count(*) OVER wu AS n, sum(v) OVER wu AS sx,
        |        sum(v * v) OVER wu AS sxx
        |      FROM e WINDOW wu AS (PARTITION BY user_id)),
        |b AS (SELECT *,
        |        CAST(round(CAST(sx AS DOUBLE) / n, 6) + 0.0
        |             AS DECIMAL(24,6)) AS mu6,
        |        CAST(round(sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) /
        |              (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))), 6)
        |             + 0.0 AS DECIMAL(24,6)) AS sd6
        |      FROM m WHERE n >= 2),
        |d AS (SELECT *, v - mu6 - sd6 * CAST(0.5 AS DECIMAL(2,1)) AS dev
        |      FROM b WHERE sd6 > 0),
        |p AS (SELECT *, sum(dev) OVER (PARTITION BY user_id
        |        ORDER BY us, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
        |      FROM d),
        |s AS (SELECT event_id, user_id,
        |        round(CAST(p - min(p) OVER (PARTITION BY user_id
        |            ORDER BY us, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |          AS DOUBLE) / CAST(sd6 AS DOUBLE), 6) + 0.0 AS s
        |      FROM p)
        |SELECT event_id, user_id, s, s > 5 AS alarm
        |FROM s ORDER BY user_id, event_id""".stripMargin,
    "stats_ks" ->
      """WITH g AS (
        |  SELECT "value" AS value,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS a,
        |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS b
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |  GROUP BY 1),
        |c AS (SELECT *, sum(a) OVER w AS ca, sum(b) OVER w AS cb
        |      FROM g WINDOW w AS (ORDER BY value
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |t AS (SELECT CAST(sum(a) AS BIGINT) AS n1,
        |        CAST(sum(b) AS BIGINT) AS n2 FROM g),
        |d AS (SELECT n1, n2,
        |        max(abs(CAST(ca AS DOUBLE) / n1 - CAST(cb AS DOUBLE) / n2))
        |          AS d
        |      FROM c, t GROUP BY 1, 2)
        |SELECT n1, n2, round(d, 6) + 0.0 AS d_stat,
        |  round(d * sqrt(CAST(n1 AS DOUBLE) * n2 / (n1 + n2)), 6) + 0.0
        |    AS lambda
        |FROM d""".stripMargin,
    "stats_mannwhitney" ->
      """WITH g AS (
        |  SELECT "value" AS value,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS a,
        |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS b
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |  GROUP BY 1),
        |gt AS (SELECT *, a + b AS t FROM g),
        |r AS (SELECT *, COALESCE(sum(t) OVER (ORDER BY value
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |        AS cum_before
        |      FROM gt),
        |tot AS (SELECT CAST(sum(a) AS BIGINT) AS n1,
        |          CAST(sum(b) AS BIGINT) AS n2,
        |          CAST(sum(t * t * t - t) AS BIGINT) AS tie3 FROM gt),
        |agg AS (SELECT n1, n2, tie3,
        |          sum(CAST(a AS DOUBLE) *
        |              (cum_before + CAST(t + 1 AS DOUBLE) / 2)) AS r1
        |        FROM r, tot GROUP BY 1, 2, 3),
        |u AS (SELECT n1, n2, tie3,
        |        r1 - CAST(n1 AS DOUBLE) * (n1 + 1) / 2 AS u1 FROM agg)
        |SELECT n1, n2, round(u1, 6) + 0.0 AS u1,
        |  round(CAST(n1 AS DOUBLE) * n2 - u1, 6) + 0.0 AS u2,
        |  round((u1 - CAST(n1 AS DOUBLE) * n2 / 2) /
        |    sqrt(CAST(n1 AS DOUBLE) * n2 / 12 *
        |      (CAST(n1 + n2 + 1 AS DOUBLE) -
        |       CAST(tie3 AS DOUBLE) /
        |         (CAST(n1 + n2 AS DOUBLE) * (n1 + n2 - 1)))), 6) + 0.0 AS z
        |FROM u""".stripMargin,
    "stats_bootstrap" ->
      """WITH e AS (
        |  SELECT event_id, CAST("value" AS DECIMAL(18,2)) AS v FROM events),
        |x AS (SELECT event_id, v, CAST(i AS BIGINT) AS b
        |      FROM e CROSS JOIN (SELECT unnest(range(0, 32)) AS i)),
        |u AS (SELECT b, v,
        |        ((((event_id % 2147483648) * 32 + b) % 2147483648)
        |         * 2654435761 % 2147483648) % 1000000 AS u
        |      FROM x),
        |w AS (SELECT b, v,
        |        CASE WHEN u < 367879 THEN 0 WHEN u < 735759 THEN 1
        |             WHEN u < 919699 THEN 2 WHEN u < 981012 THEN 3
        |             WHEN u < 996340 THEN 4 ELSE 5 END AS w
        |      FROM u),
        |m AS (SELECT b, round(CAST(sum(v * w) AS DOUBLE) / sum(w), 6) + 0.0
        |        AS m FROM w GROUP BY 1)
        |SELECT CAST(count(*) AS BIGINT) AS n_resamples,
        |  round(quantile_cont(m, 0.025), 6) + 0.0 AS ci_lo,
        |  round(quantile_cont(m, 0.5), 6) + 0.0 AS ci_med,
        |  round(quantile_cont(m, 0.975), 6) + 0.0 AS ci_hi,
        |  round(min(m), 6) + 0.0 AS mn, round(max(m), 6) + 0.0 AS mx
        |FROM m""".stripMargin,
    // seasonal_decompose's residual pipeline + explicit middle-pair
    // median/MAD band; the flag compares the unrounded score exactly as
    // the Spark plan does
    "anomaly_seasonal" ->
      """WITH daily AS (
        |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    sum(CAST("value" AS DECIMAL(18,2))) AS vd
        |  FROM events GROUP BY 1),
        |t AS (SELECT *, count(*) OVER w7 AS cnt7,
        |        CAST(round(CAST(sum(vd) OVER w7 AS DOUBLE) / 7, 6) + 0.0
        |             AS DECIMAL(24,6)) AS trend6
        |      FROM daily
        |      WINDOW w7 AS (ORDER BY day
        |        ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |f AS (SELECT *, dayofweek(day) AS dow, vd - trend6 AS det
        |      FROM t WHERE cnt7 = 7),
        |s AS (SELECT dow,
        |        round(CAST(sum(det) AS DOUBLE) / count(*), 6) + 0.0
        |          AS seasonal
        |      FROM f GROUP BY 1),
        |r0 AS (
        |  SELECT day, CAST(vd AS DOUBLE) AS v,
        |    CAST(trend6 AS DOUBLE) AS trend, seasonal,
        |    round(CAST(det AS DOUBLE) - seasonal, 6) + 0.0 AS resid
        |  FROM f JOIN s USING (dow)),
        |mr AS (SELECT resid, row_number() OVER (ORDER BY resid) AS rn,
        |         count(*) OVER () AS m FROM r0),
        |med AS (SELECT avg(resid) AS med FROM mr
        |        WHERE rn = (m + 1) // 2 OR rn = (m + 2) // 2),
        |dv AS (SELECT abs(resid - med) AS dev FROM r0, med),
        |dr AS (SELECT dev, row_number() OVER (ORDER BY dev) AS rn,
        |         count(*) OVER () AS m FROM dv),
        |mad AS (SELECT avg(dev) AS mad FROM dr
        |        WHERE rn = (m + 1) // 2 OR rn = (m + 2) // 2)
        |SELECT day, v, round(trend + seasonal, 6) + 0.0 AS expected, resid,
        |  round(abs(resid - med) / nullif(mad, 0), 6) + 0.0 AS score,
        |  abs(resid - med) / nullif(mad, 0) > 3.5 AS is_anomaly
        |FROM r0, med, mad ORDER BY day""".stripMargin,
    "stats_stl_strength" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    sum(CAST("value" AS DECIMAL(18,2))) AS vd
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT *, count(*) OVER w7 AS cnt7,
        |        CAST(round(CAST(sum(vd) OVER w7 AS DOUBLE) / 7, 6) + 0.0
        |             AS DECIMAL(24,6)) AS trend6
        |      FROM daily
        |      WINDOW w7 AS (PARTITION BY event_type ORDER BY day
        |        ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |f AS (SELECT *, dayofweek(day) AS dow,
        |        CAST(vd - trend6 AS DECIMAL(18,6)) AS det
        |      FROM t WHERE cnt7 = 7),
        |s AS (SELECT event_type, dow,
        |        CAST(round(CAST(sum(det) AS DOUBLE) / count(*), 6) + 0.0
        |             AS DECIMAL(18,6)) AS seas
        |      FROM f GROUP BY 1, 2),
        |c AS (SELECT f.event_type,
        |        CAST(f.det - s.seas AS DECIMAL(18,6)) AS resid,
        |        f.det AS det,
        |        CAST(f.vd - s.seas AS DECIMAL(18,6)) AS des
        |      FROM f JOIN s
        |        ON s.event_type = f.event_type AND s.dow = f.dow),
        |m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    sum(resid) AS s_resid,
        |    sum(CAST(resid AS DECIMAL(24,6)) * resid) AS q_resid,
        |    sum(det) AS s_det,
        |    sum(CAST(det AS DECIMAL(24,6)) * det) AS q_det,
        |    sum(des) AS s_des,
        |    sum(CAST(des AS DECIMAL(24,6)) * des) AS q_des
        |  FROM c GROUP BY 1)
        |SELECT event_type, n AS n_days,
        |  round((n * CAST(q_resid AS DOUBLE)
        |    - CAST(s_resid AS DOUBLE) * CAST(s_resid AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * (n - 1)), 6) + 0.0 AS var_resid,
        |  round((n * CAST(q_det AS DOUBLE)
        |    - CAST(s_det AS DOUBLE) * CAST(s_det AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * (n - 1)), 6) + 0.0 AS var_detrended,
        |  round((n * CAST(q_des AS DOUBLE)
        |    - CAST(s_des AS DOUBLE) * CAST(s_des AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * (n - 1)), 6) + 0.0
        |    AS var_deseasonalized,
        |  round(greatest(CAST(0.0 AS DOUBLE), 1.0
        |    - ((n * CAST(q_resid AS DOUBLE)
        |        - CAST(s_resid AS DOUBLE) * CAST(s_resid AS DOUBLE))
        |       / (CAST(n AS DOUBLE) * (n - 1)))
        |      / ((n * CAST(q_des AS DOUBLE)
        |        - CAST(s_des AS DOUBLE) * CAST(s_des AS DOUBLE))
        |       / (CAST(n AS DOUBLE) * (n - 1)))), 6) + 0.0
        |    AS trend_strength,
        |  round(greatest(CAST(0.0 AS DOUBLE), 1.0
        |    - ((n * CAST(q_resid AS DOUBLE)
        |        - CAST(s_resid AS DOUBLE) * CAST(s_resid AS DOUBLE))
        |       / (CAST(n AS DOUBLE) * (n - 1)))
        |      / ((n * CAST(q_det AS DOUBLE)
        |        - CAST(s_det AS DOUBLE) * CAST(s_det AS DOUBLE))
        |       / (CAST(n AS DOUBLE) * (n - 1)))), 6) + 0.0
        |    AS seasonal_strength
        |FROM m ORDER BY event_type""".stripMargin,
    "window_pivot_points" ->
      """WITH e AS (
        |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id,
        |    CAST(CAST("value" AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc
        |  FROM events),
        |bars AS (SELECT event_type, day,
        |    CAST(max(vc) AS BIGINT) AS h, CAST(min(vc) AS BIGINT) AS l,
        |    max({'us': us, 'event_id': event_id, 'vc': vc}).vc AS c
        |  FROM e GROUP BY 1, 2),
        |p0 AS (SELECT *,
        |    lag(h) OVER wo AS ph, lag(l) OVER wo AS pl,
        |    lag(c) OVER wo AS pc
        |  FROM bars
        |  WINDOW wo AS (PARTITION BY event_type ORDER BY day)),
        |p1 AS (SELECT *, CAST(ph + pl + pc AS DOUBLE) / 3 AS p
        |       FROM p0 WHERE ph IS NOT NULL),
        |p2 AS (SELECT *, round(p / 100, 6) + 0.0 AS p6 FROM p1)
        |SELECT event_type, day,
        |  round(CAST(c AS DOUBLE) / 100, 6) + 0.0 AS close,
        |  p6 AS pivot,
        |  round((2 * p - pl) / 100, 6) + 0.0 AS r1,
        |  round((2 * p - ph) / 100, 6) + 0.0 AS s1,
        |  round((p + (ph - pl)) / 100, 6) + 0.0 AS r2,
        |  round((p - (ph - pl)) / 100, 6) + 0.0 AS s2,
        |  CAST(c AS DOUBLE) / 100 > p6 AS above_pivot
        |FROM p2 ORDER BY event_type, day""".stripMargin,
    "seasonal_decompose" ->
      """WITH daily AS (
        |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    sum(CAST("value" AS DECIMAL(18,2))) AS vd
        |  FROM events GROUP BY 1),
        |t AS (SELECT *, count(*) OVER w7 AS cnt7,
        |        CAST(round(CAST(sum(vd) OVER w7 AS DOUBLE) / 7, 6) + 0.0
        |             AS DECIMAL(24,6)) AS trend6
        |      FROM daily
        |      WINDOW w7 AS (ORDER BY day
        |        ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |f AS (SELECT *, dayofweek(day) AS dow, vd - trend6 AS det
        |      FROM t WHERE cnt7 = 7),
        |s AS (SELECT dow,
        |        round(CAST(sum(det) AS DOUBLE) / count(*), 6) + 0.0
        |          AS seasonal
        |      FROM f GROUP BY 1)
        |SELECT day, CAST(vd AS DOUBLE) AS v, CAST(trend6 AS DOUBLE) AS trend,
        |  seasonal, round(CAST(det AS DOUBLE) - seasonal, 6) + 0.0 AS resid
        |FROM f JOIN s USING (dow) ORDER BY day""".stripMargin,
  )
}
