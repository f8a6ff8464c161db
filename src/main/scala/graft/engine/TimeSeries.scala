package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.engine.{Tables => T}
import graft.engine.Exact._

/** Time-series regularization over the events stream: hourly
  * resampling with gap materialization and forward-fill. The reference
  * renders raw event rows only; an analytics engine needs the
  * dense-grid form for charting, rate computation, and feature
  * windows over irregular streams.
  *
  * Scale posture: the grid explode and the forward-fill window are
  * both PARTITIONED BY the series key (user), so a 100 TB run is
  * embarrassingly parallel per key — no global sort anywhere. Grid
  * size is bounded by span/granularity per key (here ~720 rows per
  * user-month), not by event count.
  */
object TimeSeries {
  type Q = (SparkSession, String) => DataFrame

  private val dailyCache = new SessionMemo[String]

  /** The per-shard daily revenue series the seasonality probes share
    * (q169 ACF, q172 OLS, q173 CUSUM, q180 weekday ANOVA): one
    * combine-able groupBy of events into (shard, day, exact cents),
    * memoized per (session, dir) and cached so one bench/service pass
    * scans events once, not once per probe. At 100 TB this IS the
    * nightly materialized view every downstream diagnostic reads. */
  private def dailySpine(s: SparkSession, dir: String): DataFrame =
    dailyCache.getOrElseUpdate(s, dir) {
      import s.implicits._
      T.events(s, dir)
        .groupBy(($"user_id" % 8L).as("shard"), to_date($"ts").as("d"))
        .agg(sum(Exact.scaled($"value", 100)).as("c"))
        .cache()
    }

  val queries: Map[String, Q] = Map(
    // Hourly resample of each user's value stream: materialize every
    // hour from the user's first to last event (sequence + explode —
    // map-side per key), left-join the actual hourly aggregates so
    // silent hours surface as n_events=0 rows, and forward-fill the
    // last observed hourly sum across the gap (the step-function
    // reading a dashboard or a feature pipeline wants). The exact
    // scaled-integer sum keeps the hourly values bit-stable under any
    // partitioning.
    "q94_gapfill_ffill" -> ((s, dir) => {
      import s.implicits._
      val ev = T.events(s, dir).filter($"user_id" < 10)
      val hourly = ev
        .groupBy($"user_id", date_trunc("hour", $"ts").as("h"))
        .agg(msum($"value").as("v_hour"), count(lit(1)).as("n_events"))
      val grid = ev
        .groupBy($"user_id")
        .agg(date_trunc("hour", min($"ts")).as("h0"),
          date_trunc("hour", max($"ts")).as("h1"))
        .select($"user_id",
          explode(sequence($"h0", $"h1", expr("interval 1 hour"))).as("h"))
      val w = Window.partitionBy($"user_id").orderBy($"h")
        .rowsBetween(Window.unboundedPreceding, 0)
      grid.join(hourly, Seq("user_id", "h"), "left")
        .select($"user_id", $"h",
          coalesce($"n_events", lit(0L)).as("n_events"),
          $"v_hour",
          last($"v_hour", ignoreNulls = true).over(w).as("v_ffill"))
        .orderBy($"user_id", $"h")
    }),

    // Rolling z-score anomaly detection: per user, mean/std of value
    // over the trailing 24 h computed from EXACT integer moments
    // (scaled sum + sum-of-squares are order-independent longs; the
    // double mean/variance derive from them in one fixed expression),
    // so the flag is bit-stable under any partitioning — the property
    // a re-run-to-reproduce incident pipeline needs. The frame is a
    // numeric RANGE over epoch micros partitioned by user: distributed
    // sort, no global window anywhere.
    "q98_zscore_anomaly" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts_us")
        .rangeBetween(-86400000000L, 0)
      val n = count(lit(1)).over(w)
      val s1 = sum($"sv").over(w)
      val s2 = sum($"sv" * $"sv").over(w)
      val mean = s1.cast("double") / 100.0 / n.cast("double")
      val msq = s2.cast("double") / 10000.0 / n.cast("double")
      val std = sqrt(greatest(lit(0.0), msq - mean * mean))
      val z = when(n >= 5L && std > 0.0,
        Exact.trunc6(($"value" - mean) / std))
      T.events(s, dir)
        .withColumn("ts_us", unix_micros($"ts"))
        .withColumn("sv", round($"value" * 100).cast("long"))
        .select($"user_id", $"event_id", $"ts", $"value",
          n.as("n_24h"), Exact.trunc6(mean).as("mean_24h"),
          z.as("z"),
          coalesce(abs(z) > 2.0, lit(false)).as("is_anomaly"))
        .orderBy($"user_id", $"ts", $"event_id")
    }),

    // Exponentially weighted moving average per user — the recursive
    // smoother (s₀ = x₀, sₜ = α·xₜ + (1−α)·sₜ₋₁) that windows can't
    // express and naive parallel sums get wrong. Each step is the
    // affine map acc → α·x + β·acc and affine composition is
    // associative, so a mergeable Aggregator carries just (m, b) per
    // key — O(1) state, no per-key history materialized (the
    // round-3 form collect_list'd the whole series into one row; a
    // hot key with millions of events would blow that bound). The
    // repartition + sortWithinPartitions child hands the aggregator
    // each key's rows contiguous and in (ts, event_id) order, so the
    // partial buffer is a single composed run and the post-shuffle
    // merge is trivial. Oracle bit-parity: the composition
    // reassociates IEEE arithmetic vs a plain value fold, so the
    // DuckDB oracle runs the SAME identity-seeded struct(m, b) fold,
    // operand order mirrored token for token (graft.functions
    // .EwmaAffine).
    "q103_ewma" -> ((s, dir) => {
      import s.implicits._
      val ewma = graft.functions.EwmaAffine.udafFor(0.2)
      T.events(s, dir)
        .select($"user_id", $"ts", unix_micros($"ts").as("ts_us"),
          $"event_id", $"value")
        .repartition($"user_id")
        .sortWithinPartitions($"user_id", $"ts_us", $"event_id")
        .groupBy($"user_id")
        .agg(
          count(lit(1)).as("n_events"),
          max($"ts").as("last_ts"),
          Exact.trunc6(ewma($"ts_us", $"event_id", $"value")).as("ewma"))
        .orderBy($"user_id")
    }),

    // Event-transition matrix (first-order Markov counts): per user,
    // consecutive event-type pairs via lead() inside the per-key
    // window, rolled up corpus-wide with transition probabilities.
    // The per-key sequence work shuffles once by user; the matrix is
    // |event_types|² rows — bounded regardless of event volume.
    // Sequential pattern matching with time bounds (the
    // MATCH_RECOGNIZE shape): count EVERY purchase completing a
    // view → click(≤ 1 h after the view) → purchase(≤ 24 h after the
    // click) chain — not just first-occurrence funnels (q69). One
    // pass of running conditional windows per user: carry the latest
    // view, flag clicks within the hour, carry the latest valid
    // click, match purchases within the day. All comparisons are
    // timestamp+INTERVAL arithmetic (µs-exact in any engine); the
    // row order (ts, event_id) is total. Scale shape: two window
    // passes over user-partitioned streams — one shuffle by user_id,
    // state O(1) per user, the same computation
    // mapGroupsWithState runs incrementally on the live stream.
    "q147_pattern_match" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val staged = T.events(s, dir)
        .select($"user_id", $"ts", $"event_id", $"event_type")
        .withColumn("last_view",
          max(when($"event_type" === "view", $"ts")).over(w))
        .withColumn("valid_click",
          $"event_type" === "click" && $"last_view".isNotNull &&
            $"ts" <= $"last_view" + expr("INTERVAL 1 HOUR"))
        .withColumn("last_click",
          max(when($"valid_click", $"ts")).over(w))
        .withColumn("matched",
          $"event_type" === "purchase" && $"last_click".isNotNull &&
            $"ts" <= $"last_click" + expr("INTERVAL 24 HOURS"))
      staged.groupBy($"user_id").agg(
        count(when($"event_type" === "view", true)).as("n_view"),
        count(when($"event_type" === "click", true)).as("n_click"),
        count(when($"valid_click", true)).as("n_valid_click"),
        count(when($"event_type" === "purchase", true)).as("n_purchase"),
        count(when($"matched", true)).as("n_matched"))
        .orderBy($"user_id")
    }),

    "q111_event_transitions" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val pairs = T.events(s, dir)
        .select($"user_id", $"ts", $"event_id", $"event_type")
        .withColumn("next_type", lead($"event_type", 1).over(w))
        .filter($"next_type".isNotNull)
        .groupBy($"event_type", $"next_type")
        .agg(count(lit(1)).as("n"))
      val wFrom = Window.partitionBy($"event_type")
      pairs
        .withColumn("p",
          Exact.trunc6($"n".cast("double") / sum($"n").over(wFrom).cast("double")))
        .orderBy($"event_type", $"next_type")
    }),

    // Date-dimension (calendar spine) generator: the warehouse utility
    // table every time-series join wants, derived from the data's own
    // span — a 1-row min/max aggregate exploded into one row per day
    // with the standard calendar attributes. Weekday convention pinned
    // to Monday=0 explicitly (Spark's dayofweek and DuckDB's dow
    // disagree on the week start; weekday()/isodow-1 agree).
    "q110_date_dim" -> ((s, dir) => {
      import s.implicits._
      T.events(s, dir)
        .agg(to_date(min($"ts")).as("d0"), to_date(max($"ts")).as("d1"))
        .select(explode(sequence($"d0", $"d1", expr("interval 1 day"))).as("d"))
        .select($"d",
          year($"d").cast("long").as("year"),
          quarter($"d").cast("long").as("quarter"),
          month($"d").cast("long").as("month"),
          dayofmonth($"d").cast("long").as("day"),
          weekday($"d").cast("long").as("weekday0"),
          weekofyear($"d").cast("long").as("iso_week"),
          (weekday($"d") >= 5).as("is_weekend"))
        .orderBy($"d")
    }),

    // Cohort retention matrix: users grouped by first-active day, each
    // cohort's daily-active counts at every day offset, normalized by
    // the cohort's day-0 size. Three combine-able aggregations (the
    // distinct day-grid, the per-user min, the per-cell count) and one
    // window over the tiny cohort×offset matrix — the corpus-sized
    // stages all reduce map-side, so the shape holds at 100 TB of
    // events (the matrix itself is |cohorts|×|horizon|, bounded).
    "q99_retention_cohorts" -> ((s, dir) => {
      import s.implicits._
      val days = T.events(s, dir)
        .select($"user_id", to_date($"ts").as("d")).distinct()
      val cohort = days.groupBy($"user_id").agg(min($"d").as("c0"))
      val cell = days.join(cohort, "user_id")
        .groupBy($"c0".as("cohort_day"),
          datediff($"d", $"c0").cast("long").as("day_offset"))
        .agg(count(lit(1)).as("n_active"))
      val w = Window.partitionBy($"cohort_day")
      cell
        .withColumn("cohort_size",
          max(when($"day_offset" === 0L, $"n_active")).over(w))
        .select($"cohort_day", $"day_offset", $"n_active",
          Exact.trunc6($"n_active".cast("double") / $"cohort_size".cast("double"))
            .as("retention"))
        .orderBy($"cohort_day", $"day_offset")
    }),

    // Holt level+trend smoothing per user series — q103's EWMA with a
    // trend state, via the mergeable 2×2 affine-matrix Aggregator
    // (functions/HoltAffine.scala: O(1) state per key, composition
    // associative, in-order contract enforced loudly). (α, γ) =
    // (0.5, 0.25) keeps every map constant dyadic. Output: final
    // level, trend, and the h=3 linear forecast — the "where is this
    // user's activity heading" read the raw EWMA can't give. Same
    // scale shape as q103: repartition by key + sortWithinPartitions,
    // one combine-able aggregation, no per-key history collected.
    "q170_holt_trend" -> ((s, dir) => {
      import s.implicits._
      val holt = graft.functions.HoltAffine.udafFor(0.5, 0.25)
      T.events(s, dir)
        .select($"user_id", $"ts", unix_micros($"ts").as("ts_us"),
          $"event_id", $"value")
        .repartition($"user_id")
        .sortWithinPartitions($"user_id", $"ts_us", $"event_id")
        .groupBy($"user_id")
        .agg(
          count(lit(1)).as("n_events"),
          holt($"ts_us", $"event_id", $"value").as("h"))
        .select($"user_id", $"n_events",
          Exact.trunc6($"h.level").as("level"),
          Exact.trunc6($"h.trend").as("trend"),
          Exact.trunc6($"h.fc3").as("fc3"))
        .orderBy($"user_id")
    }),

    // Autocorrelation (ACF lags 1–3) of the daily revenue series, one
    // series per user shard: the seasonality probe a forecasting
    // pipeline runs before model choice. Exactness device: with cents
    // c_t (ints), n days and S = Σc_t, the centered residual is
    // (x_t − x̄) = (c_t·n − S)/(100n) — the 100n denominator cancels
    // in the ratio, so r_k = Σeₜe₍ₜ₊ₖ₎ / Σeₜ² over PURE INTEGER
    // e_t = c_t·n − S (order-independent long sums) with ONE IEEE
    // divide at the end. Integer envelope: |e| ≤ S ≈ daily_cents·n;
    // Σe² ≤ n·S² — 3e17 at sf1 per 8-way shard; at larger scale the
    // shard count grows with the data (user_id % k, k ∝ sf) to keep
    // the envelope inside i64, the q165 sharding lever. Lags via
    // lead() inside the per-shard window: one shuffle by shard, no
    // global sort.
    "q169_acf" -> ((s, dir) => {
      import s.implicits._
      val daily = dailySpine(s, dir)
      val st = daily.groupBy($"shard")
        .agg(count(lit(1)).as("n"), sum($"c").as("s"))
      val w = Window.partitionBy($"shard").orderBy($"d")
      val e = daily.join(broadcast(st), "shard")
        .select($"shard", $"d", $"n", ($"c" * $"n" - $"s").as("e"))
        .withColumn("e1", lead($"e", 1).over(w))
        .withColumn("e2", lead($"e", 2).over(w))
        .withColumn("e3", lead($"e", 3).over(w))
      e.groupBy($"shard")
        .agg(max($"n").as("n_days"),
          Exact.trunc6(sum($"e" * $"e1").cast("double")
            / sum($"e" * $"e").cast("double")).as("acf1"),
          Exact.trunc6(sum($"e" * $"e2").cast("double")
            / sum($"e" * $"e").cast("double")).as("acf2"),
          Exact.trunc6(sum($"e" * $"e3").cast("double")
            / sum($"e" * $"e").cast("double")).as("acf3"))
        .orderBy($"shard")
    }),

    // Per-group OLS regression + Pearson correlation of daily revenue
    // against the day index — trend fitting as ONE combine-able
    // aggregation. All five moments (n, Σt, Σc, Σt², Σc², Σtc) are
    // exact integer sums, and the closed forms
    //   slope = (nΣtc − ΣtΣc) / (nΣt² − (Σt)²)
    //   icept = (ΣcΣt² − ΣtΣtc) / (nΣt² − (Σt)²)
    //   r     = (nΣtc − ΣtΣc) / (√(nΣt²−(Σt)²)·√(nΣc²−(Σc)²))
    // keep every data-dependent operation in integer space until a
    // fixed tail of IEEE divides/sqrts (correctly rounded, so
    // bit-identical cross-engine). The split √a·√b keeps each radicand
    // inside i64 where the product a·b would overflow. Scale shape:
    // pure map-side partial aggregation — the cheapest possible
    // distributed fit, no window, no shuffle beyond the group keys.
    "q172_linreg" -> ((s, dir) => {
      import s.implicits._
      val daily = dailySpine(s, dir)
        .withColumn("t",
          datediff($"d", lit(java.sql.Date.valueOf("2024-01-01"))).cast("long"))
      daily.groupBy($"shard")
        .agg(count(lit(1)).as("n"), sum($"t").as("st"), sum($"c").as("sc"),
          sum($"t" * $"t").as("stt"), sum($"c" * $"c").as("scc"),
          sum($"t" * $"c").as("stc"))
        .select($"shard", $"n".as("n_days"),
          Exact.trunc6(($"n" * $"stc" - $"st" * $"sc").cast("double")
            / ($"n" * $"stt" - $"st" * $"st").cast("double")).as("slope"),
          Exact.trunc6(($"sc" * $"stt" - $"st" * $"stc").cast("double")
            / ($"n" * $"stt" - $"st" * $"st").cast("double")).as("icept"),
          Exact.trunc6(($"n" * $"stc" - $"st" * $"sc").cast("double")
            / (sqrt(($"n" * $"stt" - $"st" * $"st").cast("double"))
              * sqrt(($"n" * $"scc" - $"sc" * $"sc").cast("double"))))
            .as("r"))
        .orderBy($"shard")
    }),

    // CUSUM changepoint detection over the same per-shard daily
    // series: the day where the running sum of centered residuals
    // peaks in magnitude is the classic single-changepoint estimate
    // (Page 1954). Reuses q169's integer residual e_t = c_t·n − S —
    // the running sum, the |·| and the (|cum| desc, day) argmax are
    // all integer/total-order operations, so the picked day is
    // bit-stable under any partitioning. Per-shard window, no global
    // sort; the argmax is a rank-1 pick inside each ≤|days| frame.
    "q173_cusum" -> ((s, dir) => {
      import s.implicits._
      val daily = dailySpine(s, dir)
      val st = daily.groupBy($"shard")
        .agg(count(lit(1)).as("n"), sum($"c").as("s"))
      val wRun = Window.partitionBy($"shard").orderBy($"d")
        .rowsBetween(Window.unboundedPreceding, 0)
      val wPick = Window.partitionBy($"shard")
        .orderBy(abs($"cum").desc, $"d")
      daily.join(broadcast(st), "shard")
        .select($"shard", $"d", $"n", ($"c" * $"n" - $"s").as("e"))
        .withColumn("cum", sum($"e").over(wRun))
        .withColumn("rn", row_number().over(wPick))
        .filter($"rn" === 1)
        .select($"shard", $"n".as("n_days"), $"d".as("cp_day"),
          abs($"cum").as("cusum_max"))
        .orderBy($"shard")
    }),

    // Weekday seasonal decomposition of the same per-shard daily
    // series: the one-way ANOVA every forecasting pipeline runs before
    // adding a weekly component (eta² = SS_weekday / SS_total answers
    // "how much of the daily variance is the day-of-week profile").
    // Determinism is the q162/q175 device applied to variance terms:
    // each weekday's between-group term n_w·(x̄_w − x̄)² equals
    // (s_w·n − s·n_w)²/(10⁴·n_w·n²) — a single IEEE expression over
    // EXACT INTEGERS, rounded to micro units — and each day's total
    // term (c·n − s)²/(10⁴·n²) likewise (q169's residual squared), so
    // both sums fold in integer space at any parallelism with ONE
    // divide for eta². Weekday convention pinned Monday=0 (q110).
    // Scale shape: the spine groupBy plus two bounded rollups (≤7 rows
    // per shard; |shards| grows with the data, the q169 envelope
    // lever) — nothing touches raw events twice.
    "q180_weekday_seasonal" -> ((s, dir) => {
      import s.implicits._
      val daily = dailySpine(s, dir).withColumn("w", weekday($"d").cast("long"))
      val st = daily.groupBy($"shard")
        .agg(count(lit(1)).as("n"), sum($"c").as("s"))
      val eD = ($"c" * $"n" - $"s").cast("double")
      val sst = daily.join(broadcast(st), "shard")
        .select($"shard", Exact.round0(eD * eD /
          ($"n".cast("double") * $"n".cast("double") * 1e4) * 1e6)
          .cast("long").as("t_micro"))
        .groupBy($"shard").agg(sum($"t_micro").as("sst_micro"))
      val dW = ($"s_w" * $"n" - $"s" * $"n_w").cast("double")
      daily.groupBy($"shard", $"w")
        .agg(count(lit(1)).as("n_w"), sum($"c").as("s_w"))
        .join(broadcast(st), "shard")
        .withColumn("ssb_term_micro", Exact.round0(dW * dW /
          ($"n_w".cast("double") * $"n".cast("double") * $"n".cast("double")
            * 1e4) * 1e6).cast("long"))
        .withColumn("ssb_micro",
          sum($"ssb_term_micro").over(Window.partitionBy($"shard")))
        .join(sst, "shard")
        .select($"shard", $"w".as("weekday0"), $"n_w".as("n_days"),
          Exact.trunc6($"s_w".cast("double") / ($"n_w".cast("double") * 100.0))
            .as("mean_day"),
          $"ssb_term_micro",
          when($"sst_micro" === 0, lit(0.0))
            .otherwise(Exact.trunc6($"ssb_micro".cast("double") /
              $"sst_micro".cast("double"))).as("eta2"))
        .orderBy($"shard", $"weekday0")
    }),

    // Sweep-line peak concurrency: the maximum number of shipments
    // simultaneously in flight per supplier shard (interval = shipdate
    // → shipdate + a deterministic 1-14-day transit derived from the
    // keys, so the oracle replays it). The sweep turns each interval
    // into ±1 boundary DELTAS, aggregates deltas per (shard, day) —
    // combine-able, one shuffle of |distinct days| rows — and takes a
    // running sum down the per-shard day axis: the classic O(n log n)
    // interval-overlap device, vs the quadratic count-per-candidate
    // join. Day rows are unique per shard after the aggregate, so the
    // running sum is total-ordered and the (open desc, day) argmax is
    // bit-stable at any parallelism. At 100 TB the window partitions
    // by shard (thousands of independent series) and each series is
    // |days| rows, not |intervals| — never a global sort. Oracle: the
    // quadratic formulation itself — count intervals covering each
    // candidate day via a range join — whose agreement proves the
    // sweep's running sum ≡ the direct overlap count at every
    // boundary, including the argmax row.
    "q192_peak_concurrency" -> ((s, dir) => {
      import s.implicits._
      val iv = T.lineitem(s, dir)
        .filter($"l_returnflag" === "R" && year($"l_shipdate") === 1996)
        .select(($"l_suppkey" % 8L).as("shard"),
          to_date($"l_shipdate").as("start"),
          expr("date_add(to_date(l_shipdate), CAST(1 + (l_suppkey + l_orderkey) % 14 AS INT))")
            .as("end"))
      val deltas = iv.select($"shard", $"start".as("day"), lit(1L).as("delta"))
        .unionByName(iv.select($"shard", $"end".as("day"), lit(-1L).as("delta")))
        .groupBy($"shard", $"day").agg(sum($"delta").as("delta"))
      val wRun = Window.partitionBy($"shard").orderBy($"day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wPick = Window.partitionBy($"shard").orderBy($"open".desc, $"day")
      deltas.withColumn("open", sum($"delta").over(wRun))
        .withColumn("rn", row_number().over(wPick))
        .filter($"rn" === 1)
        .select($"shard", $"open".as("peak_open"), $"day".as("peak_day"))
        .orderBy($"shard")
    }),

    // Inter-arrival time profile: per event type, the distribution of
    // gaps between a user's consecutive events of that type, bucketed
    // at EXPONENTIAL (power-of-two second) boundaries — the q195
    // bit-length device again, so the histogram is ≤ ~40 rows per
    // type at ANY corpus size and every count is a combine-able
    // integer. Inter-arrival spectra are the telemetry primitive
    // behind rate limiting, bot detection, and retention modeling
    // (human gaps pile up in the minutes-to-hours buckets; scripted
    // traffic in the sub-second ones). One lag window per (user,
    // type) series — partitioned by key, never global — then one
    // bounded aggregate; the per-type mean gap is an exact integer
    // sum with ONE final IEEE divide.
    "q197_interarrival" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id", $"event_type")
        .orderBy($"ts", $"event_id")
      val gaps = T.events(s, dir)
        .select($"user_id", $"event_type", $"ts", $"event_id")
        .withColumn("us", unix_micros($"ts"))
        .withColumn("prev_us", lag($"us", 1).over(w))
        .filter($"prev_us".isNotNull)
        .withColumn("gap_sec", expr("(us - prev_us) div 1000000"))
        .withColumn("gap_bucket",
          expr("CAST(length(bin(gap_sec + 1)) - 1 AS BIGINT)"))
      gaps.groupBy($"event_type", $"gap_bucket")
        .agg(count(lit(1)).as("n_gaps"), sum($"gap_sec").as("bucket_gap_sec"))
        .withColumn("type_gaps",
          sum($"n_gaps").over(Window.partitionBy($"event_type")))
        .withColumn("mean_gap_sec", Exact.trunc6(
          sum($"bucket_gap_sec").over(Window.partitionBy($"event_type"))
            .cast("double") / $"type_gaps".cast("double")))
        .orderBy($"event_type", $"gap_bucket")
    }),

    // Batch gap-based sessionization (the 30-minute-inactivity session
    // definition every web-analytics stack shares; the batch twin of
    // `Streams.sessionize`'s state machine): a session starts at the
    // first event or after a > 30 min silence — the classic
    // gaps-and-islands lag + running-flag-sum, both inside the
    // per-user window, so a 100 TB run is embarrassingly parallel per
    // user with ONE shuffle by user_id. Gap compares are integer
    // MICROsecond arithmetic (unix_micros/epoch_us — both engines
    // store µs), session revenue is the exact-cents sum, and the
    // (ts, event_id) ordering is total under duplicate timestamps.
    "q198_session_windows" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      T.events(s, dir)
        .select($"user_id", $"ts", $"event_id",
          Exact.scaled($"value", 100).as("cents"))
        .withColumn("us", unix_micros($"ts"))
        .withColumn("prev_us", lag($"us", 1).over(w))
        .withColumn("new_sess",
          when($"prev_us".isNull || $"us" - $"prev_us" > 1800000000L, 1L)
            .otherwise(0L))
        .withColumn("session_idx", sum($"new_sess").over(wRun))
        .groupBy($"user_id", $"session_idx")
        .agg(count(lit(1)).as("n_events"), min($"ts").as("t_start"),
          max($"ts").as("t_end"), sum($"cents").as("sum_cents"))
        .withColumn("duration_sec",
          expr("(unix_micros(t_end) - unix_micros(t_start)) div 1000000"))
        .select($"user_id", $"session_idx", $"n_events", $"t_start",
          $"t_end", $"duration_sec", $"sum_cents")
        .orderBy($"user_id", $"session_idx")
    }),

    // Linear-interpolation gap fill — q94's dense hourly grid with the
    // between-observations estimate a charting/feature layer actually
    // wants (forward-fill holds a stale level; lerp follows the
    // trend). Same per-user grid explode and windows; the
    // interpolation numerator pv·(nh−h) + nv·(h−ph) is EXACT INTEGER
    // cents × hour-index arithmetic, floored to micro-dollars by an
    // INTEGER division (values are non-negative, so div ≡ // — no
    // round() near a .5 boundary anywhere), so any partitioning and
    // both engines produce identical bits; the display double is one
    // exact int→double cast + one IEEE divide. Rows
    // before the first / after the last observation stay null — a
    // lerp has no data to anchor there, and surfacing the null is the
    // correct contract.
    "q199_linear_interp" -> ((s, dir) => {
      import s.implicits._
      val ev = T.events(s, dir).filter($"user_id" < 10)
      val hourly = ev
        .groupBy($"user_id", date_trunc("hour", $"ts").as("h"))
        .agg(sum(Exact.scaled($"value", 100)).as("v_cents"),
          count(lit(1)).as("n_events"))
      val grid = ev.groupBy($"user_id")
        .agg(date_trunc("hour", min($"ts")).as("h0"),
          date_trunc("hour", max($"ts")).as("h1"))
        .select($"user_id",
          explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
      val wb = Window.partitionBy($"user_id").orderBy($"hi")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wf = Window.partitionBy($"user_id").orderBy($"hi")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      grid.join(hourly, Seq("user_id", "h"), "left")
        .withColumn("hi", expr("unix_micros(h) div 3600000000"))
        .withColumn("pv", last($"v_cents", ignoreNulls = true).over(wb))
        .withColumn("ph",
          last(when($"v_cents".isNotNull, $"hi"), ignoreNulls = true).over(wb))
        .withColumn("nv", first($"v_cents", ignoreNulls = true).over(wf))
        .withColumn("nh",
          first(when($"v_cents".isNotNull, $"hi"), ignoreNulls = true).over(wf))
        .withColumn("interp_micro",
          when($"v_cents".isNotNull, $"v_cents" * 10000L)
            .otherwise(when($"pv".isNotNull && $"nv".isNotNull, expr(
              "((pv * (nh - hi) + nv * (hi - ph)) * 10000) div (nh - ph)"))))
        .withColumn("interp_value",
          $"interp_micro".cast("double") / lit(1000000.0))
        .select($"user_id", $"h", coalesce($"n_events", lit(0L)).as("n_events"),
          $"v_cents", $"interp_micro", $"interp_value")
        .orderBy($"user_id", $"h")
    }),

    // Seasonal-naive forecast backtest: predict each day's revenue as
    // the SAME WEEKDAY one week earlier (the baseline every serious
    // forecaster must beat — q180 already established the weekday
    // seasonality this exploits) and score MAE + sMAPE per shard over
    // the shared daily spine. The forecast "join" is calendar
    // arithmetic (d−7 equi-join on the spine — no windows, works
    // across gaps), and both error metrics stay EXACT INTEGERS until
    // one final divide each: per-day sMAPE is the integer floor-div
    // (2·|c−f|·1e6) div (c+f) and MAE folds |c−f| cents; means are
    // integer div to micro-units, display doubles are exact
    // int→double casts + one divide (no round() anywhere). Scale
    // shape: the spine is the memoized nightly view; the join and
    // aggregate are per-shard combine-able.
    "q203_seasonal_backtest" -> ((s, dir) => {
      import s.implicits._
      val spine = dailySpine(s, dir)
      val fc = spine.select($"shard", date_add($"d", 7).as("d"), $"c".as("f"))
      spine.join(fc, Seq("shard", "d"))
        .filter($"c" + $"f" > 0L) // sMAPE undefined at 0/0
        .withColumn("abs_err", abs($"c" - $"f"))
        .withColumn("smape_micro", expr("(2 * abs_err * 1000000) div (c + f)"))
        .groupBy($"shard")
        .agg(count(lit(1)).as("n_eval"), sum($"abs_err").as("sum_abs_err"),
          sum($"smape_micro").as("sum_smape_micro"))
        .withColumn("mae_micro", expr("(sum_abs_err * 10000) div n_eval"))
        .withColumn("smape_mean_micro", expr("sum_smape_micro div n_eval"))
        .withColumn("mae", $"mae_micro".cast("double") / lit(1000000.0))
        .withColumn("smape",
          $"smape_mean_micro".cast("double") / lit(1000000.0))
        .select($"shard", $"n_eval", $"sum_abs_err", $"mae_micro", $"mae",
          $"smape_mean_micro", $"smape")
        .orderBy($"shard")
    }),

    // Session-scoped ordered funnel — q69's conditional-min device
    // grouped by (user, session): within each 30-min-gap session
    // (q198's islands), the first view/click/purchase micro-times,
    // then strict-order stage counts per user shard. This is the
    // question product analytics actually asks ("does the journey
    // complete WITHIN a visit") — the all-time funnel (q69) can't
    // distinguish a same-session conversion from one weeks later. No
    // self-joins anywhere: one per-user window pass, two combine-able
    // aggregates.
    "q211_session_funnel" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      T.events(s, dir)
        .select($"user_id", $"ts", $"event_id", $"event_type")
        .withColumn("us", unix_micros($"ts"))
        .withColumn("prev_us", lag($"us", 1).over(w))
        .withColumn("new_sess",
          when($"prev_us".isNull || $"us" - $"prev_us" > 1800000000L, 1L)
            .otherwise(0L))
        .withColumn("session_idx", sum($"new_sess").over(wRun))
        .groupBy(($"user_id" % 8L).as("shard"), $"user_id", $"session_idx")
        .agg(min(when($"event_type" === "view", $"us")).as("t_view"),
          min(when($"event_type" === "click", $"us")).as("t_click"),
          min(when($"event_type" === "purchase", $"us")).as("t_buy"))
        .groupBy($"shard")
        .agg(count(lit(1)).as("n_sessions"),
          count($"t_view").as("n_view"),
          count(when($"t_click" > $"t_view", true)).as("n_view_click"),
          count(when($"t_buy" > $"t_click" && $"t_click" > $"t_view", true))
            .as("n_full"))
        .orderBy($"shard")
    }),

    // Top-10 three-step user journeys (event-type path n-grams) — the
    // "what do users actually do" analytics staple behind Sankey
    // charts and Markov attribution. Two lead() taps inside the
    // per-user window build the path strings map-side after ONE
    // shuffle by user; the census is a combine-able count and the
    // top-10 a TakeOrderedAndProject (per-partition heads → single
    // merge), never a full path-space sort — |event types|³ is
    // bounded, the corpus is not.
    "q212_event_paths" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      T.events(s, dir)
        .select($"user_id", $"ts", $"event_id", $"event_type")
        .withColumn("e2", lead($"event_type", 1).over(w))
        .withColumn("e3", lead($"event_type", 2).over(w))
        .filter($"e3".isNotNull)
        .select(concat_ws(">", $"event_type", $"e2", $"e3").as("path"))
        .groupBy($"path").agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"path").limit(10)
    }),

    // Calendar-correct lag/rolling features — the per-series feature
    // frame a forecasting model trains on: yesterday's value, the
    // same weekday last week, and the trailing-7-day mean, ALL as
    // RANGE frames over the integer day index (a row-based lag()
    // silently reads across gaps in the day axis; q208 established
    // the device). Missing calendar anchors surface as nulls — the
    // honest contract. The rolling mean is an exact integer floor-div
    // to micro-dollars; nothing accumulates in floats.
    "q213_lag_features" -> ((s, dir) => {
      import s.implicits._
      val spine = dailySpine(s, dir)
      def at(off: Int) = Window.partitionBy($"shard").orderBy($"di")
        .rangeBetween(off, off)
      val w7 = Window.partitionBy($"shard").orderBy($"di")
        .rangeBetween(-6, Window.currentRow)
      spine
        .withColumn("di", datediff($"d", lit("1970-01-01").cast("date")))
        .withColumn("lag1", max($"c").over(at(-1)))
        .withColumn("lag7", max($"c").over(at(-7)))
        .withColumn("roll7_sum", sum($"c").over(w7))
        .withColumn("roll7_n", count($"c").over(w7))
        .withColumn("roll7_mean_micro",
          expr("(roll7_sum * 10000) div roll7_n"))
        .select($"shard", $"d", $"c", $"lag1", $"lag7", $"roll7_n",
          $"roll7_mean_micro",
          ($"roll7_mean_micro".cast("double") / lit(1000000.0))
            .as("roll7_mean"))
        .orderBy($"shard", $"d")
    }),

    // SLO error-budget burn-rate alerting (the Google SRE multiwindow
    // multi-burn-rate recipe): per (shard, hour), the error fraction
    // against a 1% budget as an integer micro burn rate
    // (errors·100·10⁶ div events = rate/budget in micro-units), the
    // trailing-6-hour burn the same way over a CALENDAR RANGE frame
    // (hour index — the q208/q213 device), and the page-worthy alert
    // = fast burn > 14.4 AND slow burn > 6 — both pure integer
    // compares against folded micro literals. Everything is
    // combine-able counts + per-shard bounded windows; this is the
    // telemetry query an ops plane runs every minute at any scale.
    "q218_slo_burn" -> ((s, dir) => {
      import s.implicits._
      val hourly = T.events(s, dir)
        .groupBy(($"user_id" % 8L).as("shard"),
          date_trunc("hour", $"ts").as("h"))
        .agg(count(lit(1)).as("n_events"),
          sum(when($"event_type" === "error", 1L).otherwise(0L))
            .as("n_errors"))
      val w6 = Window.partitionBy($"shard").orderBy($"hi")
        .rangeBetween(-5, Window.currentRow)
      hourly
        .withColumn("hi", expr("unix_micros(h) div 3600000000"))
        .withColumn("burn1h_micro",
          expr("(n_errors * 100 * 1000000) div n_events"))
        .withColumn("n6", sum($"n_events").over(w6))
        .withColumn("e6", sum($"n_errors").over(w6))
        .withColumn("burn6h_micro", expr("(e6 * 100 * 1000000) div n6"))
        .withColumn("alert",
          $"burn1h_micro" > 14400000L && $"burn6h_micro" > 6000000L)
        .select($"shard", $"h", $"n_events", $"n_errors", $"burn1h_micro",
          $"n6", $"e6", $"burn6h_micro", $"alert")
        .orderBy($"shard", $"h")
    }),

    // Capacity-capped running stock (clamped cumulative sum): daily
    // inflow = revenue cents, constant demand = the shard's mean day,
    // warehouse capacity = 2 demands; stock_t = clamp(stock_{t−1} +
    // c_t − D, 0, CAP). The clamp makes this NON-AFFINE — unlike
    // EWMA/Holt there is no mergeable run state, and no window frame
    // expresses it — so it takes the per-key bounded ordered fold
    // (q188's device): one sorted day array per shard, one
    // higher-order fold emitting the whole trajectory, explode back
    // to rows. The day axis is calendar-bounded (the q208 argument),
    // and at unbounded-series scale this state machine is exactly
    // `mapGroupsWithState` (the streaming EWMA/Holt shape with a
    // clamped transition). All-integer arithmetic — bit-stable
    // everywhere.
    "q220_capped_runsum" -> ((s, dir) => {
      import s.implicits._
      val spine = dailySpine(s, dir)
      spine.groupBy($"shard")
        .agg(expr("sort_array(collect_list(struct(d, c)))").as("days"),
          sum($"c").as("tot"), count(lit(1)).as("nd"))
        .withColumn("dem", expr("tot div nd"))
        .withColumn("cap", expr("2 * (tot div nd)"))
        .withColumn("out", expr(
          """aggregate(days,
            |  named_struct('acc', CAST(0 AS BIGINT),
            |    'res', CAST(array() AS ARRAY<BIGINT>)),
            |  (st, x) -> named_struct(
            |    'acc', least(cap, greatest(CAST(0 AS BIGINT),
            |      st.acc + x.c - dem)),
            |    'res', array_append(st.res,
            |      least(cap, greatest(CAST(0 AS BIGINT), st.acc + x.c - dem)))),
            |  st -> st.res)""".stripMargin))
        .select($"shard", $"dem", $"cap",
          posexplode(expr("zip_with(days, out, (a, b) -> struct(a.d AS d, a.c AS c, b AS stock))")))
        .select($"shard", $"dem", $"cap", $"col.d".as("d"),
          $"col.c".as("c"), $"col.stock".as("stock"))
        .orderBy($"shard", $"d")
    }),

    // Interval coalescing (merge overlapping validity intervals):
    // q192's shipment intervals merged into maximal covered spans per
    // shard — the timeline-consolidation op behind SCD repair,
    // contract-coverage questions, and downtime accounting. Classic
    // gaps-and-islands: order intervals by (start, end), a new island
    // starts where start > the running max of PRIOR ends (strictly
    // after ⇒ abutting intervals merge), island id = running flag
    // sum. Both windows sit inside the per-shard partition — one
    // shuffle, no self-joins, and the quadratic "overlaps" join never
    // appears. Integer date arithmetic throughout.
    "q222_interval_merge" -> ((s, dir) => {
      import s.implicits._
      val iv = T.lineitem(s, dir)
        .filter($"l_returnflag" === "R" && year($"l_shipdate") === 1996)
        .select(($"l_suppkey" % 8L).as("shard"),
          to_date($"l_shipdate").as("s"),
          expr("date_add(to_date(l_shipdate), CAST(1 + (l_suppkey + l_orderkey) % 14 AS INT))")
            .as("e"))
      val w = Window.partitionBy($"shard").orderBy($"s", $"e")
      val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      iv.withColumn("max_prev_e", max($"e").over(wPrev))
        .withColumn("new_island",
          when($"max_prev_e".isNull || $"s" > $"max_prev_e", 1L)
            .otherwise(0L))
        .withColumn("island", sum($"new_island").over(wRun))
        .groupBy($"shard", $"island")
        .agg(min($"s").as("island_start"), max($"e").as("island_end"),
          count(lit(1)).as("n_intervals"))
        .withColumn("span_days", datediff($"island_end", $"island_start"))
        .orderBy($"shard", $"island")
    }),

    // Bounce rate + exit-type distribution — the session-quality
    // report beside q211's funnel: per user shard, how many sessions
    // end after ONE event (bounce) and what the LAST event of each
    // session was (exit page analysis). Rides q198's islands; the
    // exit pick is a per-session rank-1 window (total (us, event_id)
    // order), bounce a per-session count — both inside the per-user
    // shuffle; micro rates are integer floor-divs over bounded shard
    // folds.
    "q227_bounce_exit" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val sess = T.events(s, dir)
        .select($"user_id", $"ts", $"event_id", $"event_type")
        .withColumn("us", unix_micros($"ts"))
        .withColumn("prev_us", lag($"us", 1).over(w))
        .withColumn("new_sess",
          when($"prev_us".isNull || $"us" - $"prev_us" > 1800000000L, 1L)
            .otherwise(0L))
        .withColumn("session_idx", sum($"new_sess").over(wRun))
      val wLast = Window.partitionBy($"user_id", $"session_idx")
        .orderBy($"us".desc, $"event_id".desc)
      val wSess = Window.partitionBy($"user_id", $"session_idx")
      val perSess = sess
        .withColumn("rn", row_number().over(wLast))
        .withColumn("n_events", count(lit(1)).over(wSess))
        .filter($"rn" === 1)
        .select(($"user_id" % 8L).as("shard"),
          $"event_type".as("exit_type"), $"n_events")
      perSess.groupBy($"shard", $"exit_type")
        .agg(count(lit(1)).as("n_sessions"),
          sum(when($"n_events" === 1L, 1L).otherwise(0L)).as("n_bounce"))
        .withColumn("shard_sessions",
          sum($"n_sessions").over(Window.partitionBy($"shard")))
        .withColumn("shard_bounce_micro", expr(
          "(sum(n_bounce) OVER (PARTITION BY shard) * 1000000) div shard_sessions"))
        .select($"shard", $"exit_type", $"n_sessions", $"n_bounce",
          $"shard_sessions", $"shard_bounce_micro")
        .orderBy($"shard", $"exit_type")
    }),

    // First-touch vs last-touch attribution, side by side: purchase
    // sessions credit their revenue to (a) the session's FIRST event
    // type and (b) the LAST event type strictly before the first
    // purchase ('direct' if the purchase opened the session) — the
    // two models every marketing-mix debate compares. Rides q198's
    // islands; the picks are min/max over (us, event_id, type)
    // structs inside one per-session aggregate (total order ⇒
    // deterministic), revenue is the exact-cents purchase sum. Output
    // = bounded (model × event type) cells.
    "q231_attribution_compare" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wSess = Window.partitionBy($"user_id", $"session_idx")
      val sess = T.events(s, dir)
        .select($"user_id", $"ts", $"event_id", $"event_type",
          Exact.scaled($"value", 100).as("cents"))
        .withColumn("us", unix_micros($"ts"))
        .withColumn("prev_us", lag($"us", 1).over(w))
        .withColumn("new_sess",
          when($"prev_us".isNull || $"us" - $"prev_us" > 1800000000L, 1L)
            .otherwise(0L))
        .withColumn("session_idx", sum($"new_sess").over(wRun))
        .withColumn("fb_us",
          min(when($"event_type" === "purchase", $"us")).over(wSess))
        .filter($"fb_us".isNotNull)
      val perSess = sess
        .groupBy($"user_id", $"session_idx")
        .agg(
          sum(when($"event_type" === "purchase", $"cents").otherwise(0L))
            .as("rev"),
          min(struct($"us", $"event_id", $"event_type")).as("ft"),
          max(when($"us" < $"fb_us",
            struct($"us", $"event_id", $"event_type"))).as("lb"))
        .select($"ft.event_type".as("ft_type"),
          coalesce($"lb.event_type", lit("direct")).as("lb_type"), $"rev")
      perSess
        .select(lit("first_touch").as("model"), $"ft_type".as("credited"),
          $"rev")
        .unionByName(perSess.select(lit("last_touch").as("model"),
          $"lb_type".as("credited"), $"rev"))
        .groupBy($"model", $"credited")
        .agg(count(lit(1)).as("n_sessions"), sum($"rev").as("revenue_cents"))
        .orderBy($"model", $"credited")
    }),

    // Cross-correlation (lead-lag discovery) between the revenue and
    // event-volume daily series per shard — ACF's (q169) two-series
    // sibling: a peak at lag k > 0 means volume LEADS revenue by k
    // days, the causal-ordering hint every ops/finance dashboard
    // wants. Same integer-residual device (e_t = x_t·n − S, the n
    // denominator cancels in the ratio); lagged alignments are
    // window taps, cross-products sum as DECIMAL(38) (Σe² overflows
    // i64 at sf10), and each CCF is q172's √a·√b one-divide tail.
    "q232_ccf" -> ((s, dir) => {
      import s.implicits._
      val daily = T.events(s, dir)
        .groupBy(($"user_id" % 8L).as("shard"), to_date($"ts").as("d"))
        .agg(sum(Exact.scaled($"value", 100)).as("x"),
          count(lit(1)).as("y"))
      val st = daily.groupBy($"shard").agg(count(lit(1)).as("n"),
        sum($"x").as("sx"), sum($"y").as("sy"))
      val w = Window.partitionBy($"shard").orderBy($"d")
      val e = daily.join(st, "shard")
        .withColumn("ex", $"x" * $"n" - $"sx")
        .withColumn("ey", $"y" * $"n" - $"sy")
        .withColumn("ey_m2", lag($"ey", 2).over(w))
        .withColumn("ey_m1", lag($"ey", 1).over(w))
        .withColumn("ey_p1", lead($"ey", 1).over(w))
        .withColumn("ey_p2", lead($"ey", 2).over(w))
      // Each FACTOR is widened to decimal(38,0) BEFORE the multiply:
      // residuals scale with data volume (|ex| ~1.3e7 at sf0.1), so a
      // Long×Long product would wrap silently around sf100 — the cast
      // must protect the product, not just the sum.
      def dsum2(a: Column, b: Column) =
        sum((a.cast("decimal(38,0)") * b.cast("decimal(38,0)"))
          .cast("decimal(38,0)")).cast("double")
      val g = e.groupBy($"shard")
        .agg(max($"n").as("n_days"),
          dsum2($"ex", $"ex").as("sxx"), dsum2($"ey", $"ey").as("syy"),
          dsum2($"ex", $"ey_m2").as("n_m2"),
          dsum2($"ex", $"ey_m1").as("n_m1"),
          dsum2($"ex", $"ey").as("n_0"),
          dsum2($"ex", $"ey_p1").as("n_p1"),
          dsum2($"ex", $"ey_p2").as("n_p2"))
      val den = sqrt($"sxx") * sqrt($"syy")
      g.select($"shard", $"n_days",
        Exact.trunc6($"n_m2" / den).as("ccf_m2"),
        Exact.trunc6($"n_m1" / den).as("ccf_m1"),
        Exact.trunc6($"n_0" / den).as("ccf_0"),
        Exact.trunc6($"n_p1" / den).as("ccf_p1"),
        Exact.trunc6($"n_p2" / den).as("ccf_p2"))
        .orderBy($"shard")
    }))

  val oracle: Map[String, String] = Map(
    // The quadratic cross-formulation: count intervals covering each
    // boundary day directly (s <= d < e range join), then the same
    // (open desc, day) argmax — agreement proves the sweep exact.
    "q192_peak_concurrency" ->
      """WITH iv AS (
        |  SELECT CAST(l_suppkey % 8 AS BIGINT) AS shard,
        |    CAST(l_shipdate AS DATE) AS s,
        |    CAST(l_shipdate AS DATE) + CAST(1 + (l_suppkey + l_orderkey) % 14 AS INT) AS e
        |  FROM lineitem
        |  WHERE l_returnflag = 'R' AND year(l_shipdate) = 1996),
        |days AS (
        |  SELECT DISTINCT shard, s AS day FROM iv
        |  UNION SELECT DISTINCT shard, e AS day FROM iv),
        |cov AS (
        |  SELECT d.shard, d.day, CAST(count(i.s) AS BIGINT) AS open
        |  FROM days d LEFT JOIN iv i
        |    ON i.shard = d.shard AND i.s <= d.day AND d.day < i.e
        |  GROUP BY d.shard, d.day)
        |SELECT shard, open AS peak_open, day AS peak_day FROM (
        |  SELECT shard, day, open,
        |    row_number() OVER (PARTITION BY shard ORDER BY open DESC, day) AS rn
        |  FROM cov) t
        |WHERE rn = 1 ORDER BY shard""".stripMargin,

    // Identical per-(user, type) lag, integer µs → floor-second gaps,
    // identical bit-length buckets (printf('%b') mirrors bin()).
    "q197_interarrival" ->
      """WITH g AS (
        |  SELECT event_type,
        |    (epoch_us(ts) - lag(epoch_us(ts)) OVER (
        |      PARTITION BY user_id, event_type ORDER BY ts, event_id))
        |      // 1000000 AS gap_sec
        |  FROM events),
        |b AS (
        |  SELECT event_type,
        |    CAST(length(printf('%b', gap_sec + 1)) - 1 AS BIGINT) AS gap_bucket,
        |    CAST(count(*) AS BIGINT) AS n_gaps,
        |    CAST(sum(gap_sec) AS BIGINT) AS bucket_gap_sec
        |  FROM g WHERE gap_sec IS NOT NULL
        |  GROUP BY event_type, gap_bucket)
        |SELECT event_type, gap_bucket, n_gaps, bucket_gap_sec,
        |  CAST(sum(n_gaps) OVER (PARTITION BY event_type) AS BIGINT) AS type_gaps,
        |  floor((CAST(sum(bucket_gap_sec) OVER (PARTITION BY event_type) AS DOUBLE)
        |    / CAST(sum(n_gaps) OVER (PARTITION BY event_type) AS DOUBLE))
        |    * 1000000.0) / 1000000.0 AS mean_gap_sec
        |FROM b ORDER BY event_type, gap_bucket""".stripMargin,

    // Identical lag + running-flag-sum islands, integer µs compares,
    // exact-cents session revenue.
    "q198_session_windows" ->
      s"""WITH e AS (
         |  SELECT user_id, ts, event_id,
         |    CAST(round((value)*100) AS BIGINT) AS cents,
         |    epoch_us(ts) AS us
         |  FROM events),
         |f AS (
         |  SELECT *, CASE WHEN lag(us) OVER w IS NULL
         |      OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_sess
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |si AS (
         |  SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id
         |    ORDER BY ts, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS session_idx
         |  FROM f)
         |SELECT user_id, session_idx, CAST(count(*) AS BIGINT) AS n_events,
         |  min(ts) AS t_start, max(ts) AS t_end,
         |  (epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000 AS duration_sec,
         |  CAST(sum(cents) AS BIGINT) AS sum_cents
         |FROM si GROUP BY user_id, session_idx
         |ORDER BY user_id, session_idx""".stripMargin,

    // Identical grid, windows, and integer lerp numerator; one IEEE
    // divide per filled row.
    "q199_linear_interp" ->
      s"""WITH ev AS (
         |  SELECT user_id, ts, value FROM events WHERE user_id < 10),
         |hourly AS (
         |  SELECT user_id, date_trunc('hour', ts)::TIMESTAMP AS h,
         |    CAST(sum(CAST(round((value)*100) AS BIGINT)) AS BIGINT) AS v_cents,
         |    CAST(count(*) AS BIGINT) AS n_events
         |  FROM ev GROUP BY 1, 2),
         |grid AS (
         |  SELECT user_id, unnest(generate_series(
         |      date_trunc('hour', min(ts))::TIMESTAMP,
         |      date_trunc('hour', max(ts))::TIMESTAMP,
         |      INTERVAL 1 HOUR)) AS h
         |  FROM ev GROUP BY user_id),
         |j AS (
         |  SELECT g.user_id, g.h, hr.v_cents, hr.n_events,
         |    epoch_us(g.h) // 3600000000 AS hi
         |  FROM grid g LEFT JOIN hourly hr
         |    ON hr.user_id = g.user_id AND hr.h = g.h),
         |w AS (
         |  SELECT *,
         |    last_value(v_cents IGNORE NULLS) OVER wb AS pv,
         |    last_value(CASE WHEN v_cents IS NOT NULL THEN hi END IGNORE NULLS)
         |      OVER wb AS ph,
         |    first_value(v_cents IGNORE NULLS) OVER wf AS nv,
         |    first_value(CASE WHEN v_cents IS NOT NULL THEN hi END IGNORE NULLS)
         |      OVER wf AS nh
         |  FROM j
         |  WINDOW wb AS (PARTITION BY user_id ORDER BY hi
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |  wf AS (PARTITION BY user_id ORDER BY hi
         |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
         |SELECT user_id, h, coalesce(n_events, 0) AS n_events, v_cents,
         |  interp_micro,
         |  CAST(interp_micro AS DOUBLE) / 1000000.0 AS interp_value
         |FROM (
         |  SELECT *,
         |    CASE WHEN v_cents IS NOT NULL THEN v_cents * 10000
         |    WHEN pv IS NOT NULL AND nv IS NOT NULL
         |      THEN ((pv * (nh - hi) + nv * (hi - ph)) * 10000) // (nh - ph)
         |    END AS interp_micro
         |  FROM w) t
         |ORDER BY user_id, h""".stripMargin,

    // Identical daily spine, d−7 calendar join, integer error folds,
    // integer-division means — no float accumulates anywhere.
    "q203_seasonal_backtest" ->
      """WITH daily AS (
        |  SELECT user_id % 8 AS shard, date_trunc('day', ts)::DATE AS d,
        |    CAST(sum(CAST(round((value)*100) AS BIGINT)) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |j AS (
        |  SELECT a.shard, a.d, a.c, b.c AS f
        |  FROM daily a JOIN daily b
        |    ON b.shard = a.shard AND b.d + 7 = a.d
        |  WHERE a.c + b.c > 0),
        |e AS (
        |  SELECT shard, abs(c - f) AS abs_err,
        |    (2 * abs(c - f) * 1000000) // (c + f) AS smape_micro
        |  FROM j),
        |g AS (
        |  SELECT CAST(shard AS BIGINT) AS shard,
        |    CAST(count(*) AS BIGINT) AS n_eval,
        |    CAST(sum(abs_err) AS BIGINT) AS sum_abs_err,
        |    CAST(sum(smape_micro) AS BIGINT) AS sum_smape_micro
        |  FROM e GROUP BY shard)
        |SELECT shard, n_eval, sum_abs_err,
        |  (sum_abs_err * 10000) // n_eval AS mae_micro,
        |  CAST((sum_abs_err * 10000) // n_eval AS DOUBLE) / 1000000.0 AS mae,
        |  sum_smape_micro // n_eval AS smape_mean_micro,
        |  CAST(sum_smape_micro // n_eval AS DOUBLE) / 1000000.0 AS smape
        |FROM g ORDER BY shard""".stripMargin,

    // Identical session islands (q198's lag + flag-sum), q69's
    // conditional mins per session, strict-order stage counts.
    "q211_session_funnel" ->
      """WITH e AS (
        |  SELECT user_id, ts, event_id, event_type, epoch_us(ts) AS us
        |  FROM events),
        |f AS (
        |  SELECT *, CASE WHEN lag(us) OVER w IS NULL
        |      OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_sess
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |si AS (
        |  SELECT *, sum(new_sess) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        |  FROM f),
        |sess AS (
        |  SELECT CAST(user_id % 8 AS BIGINT) AS shard, user_id, session_idx,
        |    min(CASE WHEN event_type = 'view' THEN us END) AS t_view,
        |    min(CASE WHEN event_type = 'click' THEN us END) AS t_click,
        |    min(CASE WHEN event_type = 'purchase' THEN us END) AS t_buy
        |  FROM si GROUP BY 1, 2, 3)
        |SELECT shard, CAST(count(*) AS BIGINT) AS n_sessions,
        |  CAST(count(t_view) AS BIGINT) AS n_view,
        |  CAST(count(CASE WHEN t_click > t_view THEN 1 END) AS BIGINT)
        |    AS n_view_click,
        |  CAST(count(CASE WHEN t_buy > t_click AND t_click > t_view THEN 1 END)
        |    AS BIGINT) AS n_full
        |FROM sess GROUP BY shard ORDER BY shard""".stripMargin,

    // Identical per-user lead taps and count census; top-10 by
    // (n desc, path).
    "q212_event_paths" ->
      """WITH p AS (
        |  SELECT event_type || '>' ||
        |    lead(event_type, 1) OVER w || '>' ||
        |    lead(event_type, 2) OVER w AS path,
        |    lead(event_type, 2) OVER w AS e3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT path, CAST(count(*) AS BIGINT) AS n
        |FROM p WHERE e3 IS NOT NULL
        |GROUP BY path ORDER BY n DESC, path LIMIT 10""".stripMargin,

    // Identical daily spine and integer-keyed RANGE frames.
    "q213_lag_features" ->
      """WITH daily AS (
        |  SELECT user_id % 8 AS shard, date_trunc('day', ts)::DATE AS d,
        |    CAST(sum(CAST(round((value)*100) AS BIGINT)) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |dd AS (
        |  SELECT CAST(shard AS BIGINT) AS shard, d, c,
        |    d - DATE '1970-01-01' AS di
        |  FROM daily),
        |w AS (
        |  SELECT shard, d, c,
        |    max(c) OVER (PARTITION BY shard ORDER BY di
        |      RANGE BETWEEN 1 PRECEDING AND 1 PRECEDING) AS lag1,
        |    max(c) OVER (PARTITION BY shard ORDER BY di
        |      RANGE BETWEEN 7 PRECEDING AND 7 PRECEDING) AS lag7,
        |    CAST(sum(c) OVER (PARTITION BY shard ORDER BY di
        |      RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS roll7_sum,
        |    CAST(count(c) OVER (PARTITION BY shard ORDER BY di
        |      RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS roll7_n
        |  FROM dd)
        |SELECT shard, d, c, lag1, lag7, roll7_n,
        |  (roll7_sum * 10000) // roll7_n AS roll7_mean_micro,
        |  CAST((roll7_sum * 10000) // roll7_n AS DOUBLE) / 1000000.0
        |    AS roll7_mean
        |FROM w ORDER BY shard, d""".stripMargin,

    // Identical hourly counts, hour-index RANGE frame, integer micro
    // burn rates, literal threshold compares.
    "q218_slo_burn" ->
      """WITH hourly AS (
        |  SELECT CAST(user_id % 8 AS BIGINT) AS shard,
        |    date_trunc('hour', ts)::TIMESTAMP AS h,
        |    CAST(count(*) AS BIGINT) AS n_events,
        |    CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_errors
        |  FROM events GROUP BY 1, 2),
        |hi AS (
        |  SELECT *, epoch_us(h) // 3600000000 AS hix FROM hourly),
        |w AS (
        |  SELECT shard, h, n_events, n_errors,
        |    (n_errors * 100 * 1000000) // n_events AS burn1h_micro,
        |    CAST(sum(n_events) OVER (PARTITION BY shard ORDER BY hix
        |      RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS BIGINT) AS n6,
        |    CAST(sum(n_errors) OVER (PARTITION BY shard ORDER BY hix
        |      RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS BIGINT) AS e6
        |  FROM hi)
        |SELECT shard, h, n_events, n_errors, burn1h_micro, n6, e6,
        |  (e6 * 100 * 1000000) // n6 AS burn6h_micro,
        |  burn1h_micro > 14400000 AND (e6 * 100 * 1000000) // n6 > 6000000
        |    AS alert
        |FROM w ORDER BY shard, h""".stripMargin,

    // Identical daily spine and clamp fold — LIST state (growing
    // [acc, s1, s2, …], the struct_pack-pitfall-safe form), identical
    // integer clamp, positional unnest back to rows.
    "q220_capped_runsum" ->
      """WITH daily AS (
        |  SELECT CAST(user_id % 8 AS BIGINT) AS shard,
        |    date_trunc('day', ts)::DATE AS d,
        |    CAST(sum(CAST(round((value)*100) AS BIGINT)) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |g AS (
        |  SELECT shard, list(d ORDER BY d) AS dl, list(c ORDER BY d) AS cl,
        |    CAST(sum(c) AS BIGINT) AS tot, CAST(count(*) AS BIGINT) AS nd
        |  FROM daily GROUP BY shard),
        |f AS (
        |  SELECT shard, tot // nd AS dem, 2 * (tot // nd) AS cap, dl, cl,
        |    list_reduce(
        |      [[CAST(0 AS BIGINT)]] || list_transform(cl, x -> [x]),
        |      (acc, e) ->
        |        [least(2 * (tot // nd), greatest(CAST(0 AS BIGINT),
        |           acc[1] + e[1] - (tot // nd)))]
        |        || acc[2:]
        |        || [least(2 * (tot // nd), greatest(CAST(0 AS BIGINT),
        |             acc[1] + e[1] - (tot // nd)))]) AS r
        |  FROM g)
        |SELECT shard, dem, cap, unnest(dl) AS d, unnest(cl) AS c,
        |  unnest(r[2:]) AS stock
        |FROM f ORDER BY shard, d""".stripMargin,

    // Identical islands construction (running max of prior ends,
    // strict-gap island starts, flag-sum ids).
    "q222_interval_merge" ->
      """WITH iv AS (
        |  SELECT CAST(l_suppkey % 8 AS BIGINT) AS shard,
        |    CAST(l_shipdate AS DATE) AS s,
        |    CAST(l_shipdate AS DATE) + CAST(1 + (l_suppkey + l_orderkey) % 14 AS INT) AS e
        |  FROM lineitem
        |  WHERE l_returnflag = 'R' AND year(l_shipdate) = 1996),
        |m AS (
        |  SELECT shard, s, e,
        |    max(e) OVER (PARTITION BY shard ORDER BY s, e
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS max_prev_e
        |  FROM iv),
        |fl AS (
        |  SELECT shard, s, e,
        |    CASE WHEN max_prev_e IS NULL OR s > max_prev_e THEN 1 ELSE 0 END
        |      AS new_island
        |  FROM m),
        |isl AS (
        |  SELECT shard, s, e,
        |    CAST(sum(new_island) OVER (PARTITION BY shard ORDER BY s, e
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS island
        |  FROM fl)
        |SELECT shard, island, min(s) AS island_start, max(e) AS island_end,
        |  CAST(count(*) AS BIGINT) AS n_intervals,
        |  CAST(max(e) - min(s) AS INT) AS span_days
        |FROM isl GROUP BY shard, island
        |ORDER BY shard, island""".stripMargin,

    // Identical islands, per-session rank-1 exit pick, integer micro
    // bounce rates.
    "q227_bounce_exit" ->
      """WITH e AS (
        |  SELECT user_id, ts, event_id, event_type, epoch_us(ts) AS us
        |  FROM events),
        |f AS (
        |  SELECT *, CASE WHEN lag(us) OVER w IS NULL
        |      OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_sess
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |si AS (
        |  SELECT *, sum(new_sess) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        |  FROM f),
        |ps AS (
        |  SELECT CAST(user_id % 8 AS BIGINT) AS shard,
        |    event_type AS exit_type, n_events
        |  FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id, session_idx
        |      ORDER BY us DESC, event_id DESC) AS rn,
        |      count(*) OVER (PARTITION BY user_id, session_idx) AS n_events
        |    FROM si) t
        |  WHERE rn = 1),
        |g AS (
        |  SELECT shard, exit_type, CAST(count(*) AS BIGINT) AS n_sessions,
        |    CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_bounce
        |  FROM ps GROUP BY shard, exit_type)
        |SELECT shard, exit_type, n_sessions, n_bounce,
        |  CAST(sum(n_sessions) OVER (PARTITION BY shard) AS BIGINT)
        |    AS shard_sessions,
        |  CAST((sum(n_bounce) OVER (PARTITION BY shard) * 1000000)
        |    // sum(n_sessions) OVER (PARTITION BY shard) AS BIGINT)
        |    AS shard_bounce_micro
        |FROM g ORDER BY shard, exit_type""".stripMargin,

    // Identical islands; first/last picks replayed as rank-1 windows
    // (cross-formulation of the struct min/max), identical cents.
    "q231_attribution_compare" ->
      """WITH e AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    CAST(round((value)*100) AS BIGINT) AS cents, epoch_us(ts) AS us
        |  FROM events),
        |f AS (
        |  SELECT *, CASE WHEN lag(us) OVER w IS NULL
        |      OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_sess
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |si AS (
        |  SELECT *, sum(new_sess) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        |  FROM f),
        |sb AS (
        |  SELECT *, min(CASE WHEN event_type = 'purchase' THEN us END)
        |    OVER (PARTITION BY user_id, session_idx) AS fb_us
        |  FROM si),
        |ps AS (SELECT * FROM sb WHERE fb_us IS NOT NULL),
        |rev AS (
        |  SELECT user_id, session_idx,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN cents ELSE 0 END)
        |      AS BIGINT) AS rev
        |  FROM ps GROUP BY user_id, session_idx),
        |ft AS (
        |  SELECT user_id, session_idx, event_type AS ft_type FROM ps
        |  QUALIFY row_number() OVER (PARTITION BY user_id, session_idx
        |    ORDER BY us, event_id) = 1),
        |lb AS (
        |  SELECT user_id, session_idx, event_type AS lb_type FROM ps
        |  WHERE us < fb_us
        |  QUALIFY row_number() OVER (PARTITION BY user_id, session_idx
        |    ORDER BY us DESC, event_id DESC) = 1),
        |sess AS (
        |  SELECT r.user_id, r.session_idx, r.rev, ft.ft_type,
        |    coalesce(lb.lb_type, 'direct') AS lb_type
        |  FROM rev r
        |  JOIN ft ON ft.user_id = r.user_id AND ft.session_idx = r.session_idx
        |  LEFT JOIN lb ON lb.user_id = r.user_id
        |    AND lb.session_idx = r.session_idx),
        |credited AS (
        |  SELECT 'first_touch' AS model, ft_type AS credited, rev FROM sess
        |  UNION ALL
        |  SELECT 'last_touch', lb_type, rev FROM sess)
        |SELECT model, credited, CAST(count(*) AS BIGINT) AS n_sessions,
        |  CAST(sum(rev) AS BIGINT) AS revenue_cents
        |FROM credited GROUP BY model, credited
        |ORDER BY model, credited""".stripMargin,

    // Identical residuals, window taps, HUGEINT cross-products →
    // one double conversion each, identical √·√ tails.
    "q232_ccf" ->
      """WITH daily AS (
        |  SELECT CAST(user_id % 8 AS BIGINT) AS shard,
        |    date_trunc('day', ts)::DATE AS d,
        |    CAST(sum(CAST(round((value)*100) AS BIGINT)) AS BIGINT) AS x,
        |    CAST(count(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |st AS (
        |  SELECT shard, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy
        |  FROM daily GROUP BY shard),
        |e AS (
        |  SELECT daily.shard, n, x*n - sx AS ex, y*n - sy AS ey,
        |    lag(y*n - sy, 2) OVER w AS ey_m2,
        |    lag(y*n - sy, 1) OVER w AS ey_m1,
        |    lead(y*n - sy, 1) OVER w AS ey_p1,
        |    lead(y*n - sy, 2) OVER w AS ey_p2
        |  FROM daily JOIN st USING (shard)
        |  WINDOW w AS (PARTITION BY daily.shard ORDER BY d)),
        |g AS (
        |  SELECT shard, max(n) AS n_days,
        |    CAST(sum(CAST(ex AS HUGEINT) * CAST(ex AS HUGEINT)) AS DOUBLE) AS sxx,
        |    CAST(sum(CAST(ey AS HUGEINT) * CAST(ey AS HUGEINT)) AS DOUBLE) AS syy,
        |    CAST(sum(CAST(ex AS HUGEINT) * CAST(ey_m2 AS HUGEINT)) AS DOUBLE) AS n_m2,
        |    CAST(sum(CAST(ex AS HUGEINT) * CAST(ey_m1 AS HUGEINT)) AS DOUBLE) AS n_m1,
        |    CAST(sum(CAST(ex AS HUGEINT) * CAST(ey AS HUGEINT)) AS DOUBLE) AS n_0,
        |    CAST(sum(CAST(ex AS HUGEINT) * CAST(ey_p1 AS HUGEINT)) AS DOUBLE) AS n_p1,
        |    CAST(sum(CAST(ex AS HUGEINT) * CAST(ey_p2 AS HUGEINT)) AS DOUBLE) AS n_p2
        |  FROM e GROUP BY shard)
        |SELECT shard, n_days,
        |  floor((n_m2 / (sqrt(sxx) * sqrt(syy))) * 1000000.0) / 1000000.0 AS ccf_m2,
        |  floor((n_m1 / (sqrt(sxx) * sqrt(syy))) * 1000000.0) / 1000000.0 AS ccf_m1,
        |  floor((n_0 / (sqrt(sxx) * sqrt(syy))) * 1000000.0) / 1000000.0 AS ccf_0,
        |  floor((n_p1 / (sqrt(sxx) * sqrt(syy))) * 1000000.0) / 1000000.0 AS ccf_p1,
        |  floor((n_p2 / (sqrt(sxx) * sqrt(syy))) * 1000000.0) / 1000000.0 AS ccf_p2
        |FROM g ORDER BY shard""".stripMargin,

    "q94_gapfill_ffill" ->
      s"""WITH ev AS (
         |  SELECT user_id, ts, value FROM events WHERE user_id < 10),
         |hourly AS (
         |  SELECT user_id, date_trunc('hour', ts)::TIMESTAMP AS h,
         |    ${msumSql("value")} AS v_hour, count(*) AS n_events
         |  FROM ev GROUP BY user_id, date_trunc('hour', ts)::TIMESTAMP),
         |grid AS (
         |  SELECT user_id, unnest(generate_series(
         |      date_trunc('hour', min(ts))::TIMESTAMP,
         |      date_trunc('hour', max(ts))::TIMESTAMP,
         |      INTERVAL 1 HOUR)) AS h
         |  FROM ev GROUP BY user_id)
         |SELECT g.user_id, g.h, coalesce(hr.n_events, 0) AS n_events,
         |  hr.v_hour,
         |  last_value(hr.v_hour IGNORE NULLS) OVER (
         |    PARTITION BY g.user_id ORDER BY g.h
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ffill
         |FROM grid g LEFT JOIN hourly hr
         |  ON hr.user_id = g.user_id AND hr.h = g.h
         |ORDER BY g.user_id, g.h""".stripMargin,

    "q98_zscore_anomaly" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts, value,
        |    CAST(round(value*100) AS BIGINT) AS sv
        |  FROM events),
        |f AS (
        |  SELECT user_id, event_id, ts, value,
        |    count(*) OVER w AS n_24h,
        |    sum(sv) OVER w AS s1,
        |    sum(sv*sv) OVER w AS s2
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |    RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)),
        |g AS (
        |  SELECT user_id, event_id, ts, value, n_24h,
        |    CAST(s1 AS DOUBLE)/100.0/CAST(n_24h AS DOUBLE) AS mean_raw,
        |    sqrt(greatest(0.0,
        |      CAST(s2 AS DOUBLE)/10000.0/CAST(n_24h AS DOUBLE)
        |      - (CAST(s1 AS DOUBLE)/100.0/CAST(n_24h AS DOUBLE))
        |        * (CAST(s1 AS DOUBLE)/100.0/CAST(n_24h AS DOUBLE)))) AS std
        |  FROM f)
        |SELECT user_id, event_id, ts, value, n_24h,
        |  floor((mean_raw) * 1000000.0) / 1000000.0 AS mean_24h,
        |  CASE WHEN n_24h >= 5 AND std > 0.0
        |       THEN floor(((value - mean_raw)/std) * 1000000.0) / 1000000.0 END AS z,
        |  coalesce(abs(CASE WHEN n_24h >= 5 AND std > 0.0
        |       THEN floor(((value - mean_raw)/std) * 1000000.0) / 1000000.0 END) > 2.0, false)
        |    AS is_anomaly
        |FROM g ORDER BY user_id, ts, event_id""".stripMargin,

    // Mirrors the affine-map composition in graft.functions.EwmaAffine
    // step for step: identity-seeded (m, b) fold with b' = α·x + β·b
    // computed as e.b + e.m * acc.b (e.b = α·x at element build, the
    // same op placement as the Scala reduce), finish = m·x₁ + b.
    "q103_ewma" ->
      """WITH s AS (
        |  SELECT user_id, count(*) AS n_events, max(ts) AS last_ts,
        |         list(value ORDER BY ts, event_id) AS l
        |  FROM events GROUP BY user_id),
        |f AS (
        |  SELECT user_id, n_events, last_ts, l[1] AS x1,
        |    list_reduce(
        |      [struct_pack(m := CAST(1.0 AS DOUBLE), b := CAST(0.0 AS DOUBLE))] ||
        |      list_transform(l[2:], x -> struct_pack(m := CAST(0.8 AS DOUBLE),
        |                                             b := CAST(0.2 AS DOUBLE) * x)),
        |      (acc, e) -> struct_pack(m := e.m * acc.m, b := e.b + e.m * acc.b)) AS r
        |  FROM s)
        |SELECT user_id, n_events, last_ts,
        |  floor((r.m * x1 + r.b) * 1000000.0) / 1000000.0 AS ewma
        |FROM f ORDER BY user_id""".stripMargin,

    // Same staged running-window construction; timestamp+INTERVAL
    // comparisons are µs-exact in both engines.
    "q147_pattern_match" ->
      """WITH s1 AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    max(CASE WHEN event_type = 'view' THEN ts END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS last_view
        |  FROM events),
        |s2 AS (
        |  SELECT *, (event_type = 'click' AND last_view IS NOT NULL
        |             AND ts <= last_view + INTERVAL 1 HOUR) AS valid_click
        |  FROM s1),
        |s3 AS (
        |  SELECT *, max(CASE WHEN valid_click THEN ts END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS last_click
        |  FROM s2),
        |s4 AS (
        |  SELECT *, (event_type = 'purchase' AND last_click IS NOT NULL
        |             AND ts <= last_click + INTERVAL 24 HOURS) AS matched
        |  FROM s3)
        |SELECT user_id,
        |  count(CASE WHEN event_type = 'view' THEN 1 END) AS n_view,
        |  count(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
        |  count(CASE WHEN valid_click THEN 1 END) AS n_valid_click,
        |  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
        |  count(CASE WHEN matched THEN 1 END) AS n_matched
        |FROM s4 GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q111_event_transitions" ->
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |    lead(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS next_type
        |  FROM events),
        |m AS (
        |  SELECT event_type, next_type, count(*) AS n
        |  FROM seq WHERE next_type IS NOT NULL
        |  GROUP BY event_type, next_type)
        |SELECT event_type, next_type, CAST(n AS BIGINT) AS n,
        |  floor((CAST(n AS DOUBLE) /
        |    CAST(sum(n) OVER (PARTITION BY event_type) AS DOUBLE)) * 1000000.0)
        |    / 1000000.0 AS p
        |FROM m ORDER BY event_type, next_type""".stripMargin,

    "q110_date_dim" ->
      """WITH span AS (
        |  SELECT date_trunc('day', min(ts))::DATE AS d0,
        |         date_trunc('day', max(ts))::DATE AS d1
        |  FROM events),
        |days AS (
        |  SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS d
        |  FROM span)
        |SELECT d,
        |  CAST(year(d) AS BIGINT) AS year,
        |  CAST(quarter(d) AS BIGINT) AS quarter,
        |  CAST(month(d) AS BIGINT) AS month,
        |  CAST(day(d) AS BIGINT) AS day,
        |  CAST(isodow(d) - 1 AS BIGINT) AS weekday0,
        |  CAST(week(d) AS BIGINT) AS iso_week,
        |  isodow(d) - 1 >= 5 AS is_weekend
        |FROM days ORDER BY d""".stripMargin,

    "q99_retention_cohorts" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, date_trunc('day', ts)::DATE AS d FROM events),
        |coh AS (SELECT user_id, min(d) AS c0 FROM days GROUP BY user_id),
        |cell AS (
        |  SELECT c0 AS cohort_day, CAST(d - c0 AS BIGINT) AS day_offset,
        |         count(*) AS n_active
        |  FROM days JOIN coh USING (user_id)
        |  GROUP BY c0, CAST(d - c0 AS BIGINT))
        |SELECT cohort_day, day_offset, CAST(n_active AS BIGINT) AS n_active,
        |  floor((CAST(n_active AS DOUBLE) /
        |    CAST(max(CASE WHEN day_offset = 0 THEN n_active END)
        |      OVER (PARTITION BY cohort_day) AS DOUBLE)) * 1000000.0)
        |    / 1000000.0 AS retention
        |FROM cell ORDER BY cohort_day, day_offset""".stripMargin,

    // The q103 discipline lifted to 2×2: identity-seeded list_reduce
    // with the same operand order per IEEE multiply/add as
    // HoltAffine.step — the two engines run the same op sequence
    // token for token. Map constants are dyadic (0.5 / −0.125 /
    // 0.875 / 0.125), so no decimal-repr noise. State travels as a
    // 6-element LIST [m11,m12,m21,m22,b1,b2], NOT a struct: DuckDB
    // evaluates struct_pack fields sequentially inside a lambda (a
    // later field reading acc.m11 sees the already-updated m11 —
    // q103's scalar fold never reads an updated field, this matrix
    // fold would), while a list literal reads the incoming acc only.
    "q170_holt_trend" ->
      """WITH s AS (
        |  SELECT user_id, count(*) AS n_events,
        |         list(value ORDER BY ts, event_id) AS l
        |  FROM events GROUP BY user_id),
        |f AS (
        |  SELECT user_id, n_events, l[1] AS x1,
        |    list_reduce(
        |      [[CAST(1.0 AS DOUBLE), 0.0, 0.0, 1.0, 0.0, 0.0]] ||
        |      list_transform(l[2:], x -> [0.0, 0.0, 0.0, 0.0,
        |        CAST(0.5 AS DOUBLE) * x, CAST(0.125 AS DOUBLE) * x]),
        |      (acc, e) -> [0.5 * acc[1] + 0.5 * acc[3],
        |                   0.5 * acc[2] + 0.5 * acc[4],
        |                   -0.125 * acc[1] + 0.875 * acc[3],
        |                   -0.125 * acc[2] + 0.875 * acc[4],
        |                   0.5 * acc[5] + 0.5 * acc[6] + e[5],
        |                   -0.125 * acc[5] + 0.875 * acc[6] + e[6]]) AS r
        |  FROM s)
        |SELECT user_id, n_events,
        |  floor((r[1] * x1 + r[5]) * 1000000.0) / 1000000.0 AS level,
        |  floor((r[3] * x1 + r[6]) * 1000000.0) / 1000000.0 AS trend,
        |  floor(((r[1] * x1 + r[5]) + 3.0 * (r[3] * x1 + r[6])) * 1000000.0)
        |    / 1000000.0 AS fc3
        |FROM f ORDER BY user_id""".stripMargin,

    // Same integer-residual construction: e_t = c_t·n − S, ratio of
    // integer sums, one IEEE divide + round per lag.
    "q169_acf" ->
      """WITH daily AS (
        |  SELECT user_id % 8 AS shard, date_trunc('day', ts)::DATE AS d,
        |    CAST(sum(CAST(round((value)*100) AS BIGINT)) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |st AS (
        |  SELECT shard, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(c) AS BIGINT) AS s
        |  FROM daily GROUP BY shard),
        |e AS (
        |  SELECT daily.shard, n, c*n - s AS e,
        |    lead(c*n - s, 1) OVER (PARTITION BY daily.shard ORDER BY d) AS e1,
        |    lead(c*n - s, 2) OVER (PARTITION BY daily.shard ORDER BY d) AS e2,
        |    lead(c*n - s, 3) OVER (PARTITION BY daily.shard ORDER BY d) AS e3
        |  FROM daily JOIN st USING (shard))
        |SELECT shard, max(n) AS n_days,
        |  floor((CAST(sum(e*e1) AS DOUBLE)/CAST(sum(e*e) AS DOUBLE)) * 1000000.0)
        |    / 1000000.0 AS acf1,
        |  floor((CAST(sum(e*e2) AS DOUBLE)/CAST(sum(e*e) AS DOUBLE)) * 1000000.0)
        |    / 1000000.0 AS acf2,
        |  floor((CAST(sum(e*e3) AS DOUBLE)/CAST(sum(e*e) AS DOUBLE)) * 1000000.0)
        |    / 1000000.0 AS acf3
        |FROM e GROUP BY shard ORDER BY shard""".stripMargin,

    // Same integer moments, same fixed IEEE tail (two divides, two
    // sqrts) in the identical operand order.
    "q172_linreg" ->
      """WITH daily AS (
        |  SELECT user_id % 8 AS shard, date_trunc('day', ts)::DATE AS d,
        |    CAST(sum(CAST(round((value)*100) AS BIGINT)) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |m AS (
        |  SELECT shard,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(t) AS BIGINT) AS st, CAST(sum(c) AS BIGINT) AS sc,
        |    CAST(sum(t*t) AS BIGINT) AS stt, CAST(sum(c*c) AS BIGINT) AS scc,
        |    CAST(sum(t*c) AS BIGINT) AS stc
        |  FROM (SELECT shard, c,
        |          CAST(d - DATE '2024-01-01' AS BIGINT) AS t FROM daily) x
        |  GROUP BY shard)
        |SELECT shard, n AS n_days,
        |  floor((CAST(n*stc - st*sc AS DOUBLE)
        |    / CAST(n*stt - st*st AS DOUBLE)) * 1000000.0) / 1000000.0 AS slope,
        |  floor((CAST(sc*stt - st*stc AS DOUBLE)
        |    / CAST(n*stt - st*st AS DOUBLE)) * 1000000.0) / 1000000.0 AS icept,
        |  floor((CAST(n*stc - st*sc AS DOUBLE)
        |    / (sqrt(CAST(n*stt - st*st AS DOUBLE))
        |       * sqrt(CAST(n*scc - sc*sc AS DOUBLE)))) * 1000000.0)
        |    / 1000000.0 AS r
        |FROM m ORDER BY shard""".stripMargin,

    // q169's integer residual, a running integer window sum, and a
    // total-order (|cum| DESC, day) rank-1 pick.
    "q173_cusum" ->
      """WITH daily AS (
        |  SELECT user_id % 8 AS shard, date_trunc('day', ts)::DATE AS d,
        |    CAST(sum(CAST(round((value)*100) AS BIGINT)) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |st AS (
        |  SELECT shard, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(c) AS BIGINT) AS s
        |  FROM daily GROUP BY shard),
        |cum AS (
        |  SELECT daily.shard, d, n,
        |    CAST(sum(c*n - s) OVER (PARTITION BY daily.shard ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum
        |  FROM daily JOIN st USING (shard))
        |SELECT shard, n AS n_days, d AS cp_day, abs(cum) AS cusum_max
        |FROM cum
        |QUALIFY row_number() OVER (PARTITION BY shard
        |  ORDER BY abs(cum) DESC, d) = 1
        |ORDER BY shard""".stripMargin,

    // Same spine; micro-unit ANOVA terms from exact integers
    // (weekday = isodow-1 to match Spark's weekday(), Monday=0);
    // eta² is the one IEEE divide at the end.
    "q180_weekday_seasonal" ->
      """WITH daily AS (
        |  SELECT user_id % 8 AS shard, date_trunc('day', ts)::DATE AS d,
        |    CAST(sum(CAST(round((value)*100) AS BIGINT)) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |dw AS (SELECT shard, d, c, CAST(isodow(d) - 1 AS BIGINT) AS w
        |       FROM daily),
        |st AS (
        |  SELECT shard, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(c) AS BIGINT) AS s
        |  FROM dw GROUP BY shard),
        |sst AS (
        |  SELECT dw.shard,
        |    CAST(sum(CAST(floor(CAST(c*n - s AS DOUBLE) * CAST(c*n - s AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * 10000.0)
        |      * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS sst_micro
        |  FROM dw JOIN st USING (shard) GROUP BY dw.shard),
        |wk AS (
        |  SELECT shard, w, CAST(count(*) AS BIGINT) AS n_w,
        |    CAST(sum(c) AS BIGINT) AS s_w
        |  FROM dw GROUP BY shard, w),
        |terms AS (
        |  SELECT wk.shard, wk.w, wk.n_w, wk.s_w, st.n, st.s,
        |    CAST(floor(CAST(s_w*n - s*n_w AS DOUBLE) * CAST(s_w*n - s*n_w AS DOUBLE)
        |      / (CAST(n_w AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
        |         * 10000.0)
        |      * 1000000 + 0.5) AS BIGINT) AS ssb_term_micro
        |  FROM wk JOIN st USING (shard))
        |SELECT t.shard, t.w AS weekday0, t.n_w AS n_days,
        |  floor((CAST(t.s_w AS DOUBLE) / (CAST(t.n_w AS DOUBLE) * 100.0))
        |    * 1000000.0) / 1000000.0 AS mean_day,
        |  t.ssb_term_micro,
        |  CASE WHEN x.sst_micro = 0 THEN 0.0
        |    ELSE floor((CAST(sum(t.ssb_term_micro) OVER (PARTITION BY t.shard)
        |      AS DOUBLE) / CAST(x.sst_micro AS DOUBLE)) * 1000000.0)
        |      / 1000000.0 END AS eta2
        |FROM terms t JOIN sst x ON x.shard = t.shard
        |ORDER BY t.shard, weekday0""".stripMargin)
}
