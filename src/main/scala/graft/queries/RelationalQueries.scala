package graft.queries

import graft.core.TestData.read
import graft.operators.{AsOfJoin, CdcMerge, Funnel, RangeJoin}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** SURVEY.md §2B — the relational/analytical headline set (also the
  * bench suite). Plain declarative Dataset API: Catalyst owns join
  * order, broadcast of the small dims, pushdown into the parquet scans.
  *
  * All double aggregations route through decimal (exact) and convert to
  * double once — distributed sums are otherwise accumulation-order
  * dependent and can never hash-match an oracle (see
  * DatalogQueries "sum$exact" and SURVEY.md §3).
  */
object RelationalQueries {

  private def dsum(c: Column): Column = sum(c.cast(DecimalType(25, 6))).cast(DoubleType)
  /** Exact avg: exact sum / count, one double division at the end. */
  private def davg(c: Column): Column = dsum(c) / count(c)
  private def revenue: Column = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
  /** events with `ts_ns` epoch-nanos, whatever physical encoding the
    * parquet carries (see TestData.tsNs) — exact, and oracle-comparable
    * via DuckDB's epoch_us()/epoch_ns(). */
  private def events(s: SparkSession, dir: String): DataFrame =
    graft.core.TestData.events(s, dir)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> ((s, dir) =>
      read(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("2000-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(revenue).as("sum_disc_price"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))),

    "q3_topn" -> ((s, dir) => {
      val c = read(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = read(s, dir, "orders").filter(col("o_orderdate") < lit("1998-01-01"))
      val l = read(s, dir, "lineitem").filter(col("l_shipdate") > lit("1998-01-01"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(dsum(revenue).as("rev"))
        .orderBy(col("rev").desc, col("l_orderkey"))
        .limit(10)
    }),

    "q5_multijoin" -> ((s, dir) => {
      val r = read(s, dir, "region").filter(col("r_name") === "ASIA")
      val n = read(s, dir, "nation")
      val sup = read(s, dir, "supplier")
      val c = read(s, dir, "customer")
      val o = read(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1998-01-01"))
      val l = read(s, dir, "lineitem")
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(dsum(revenue).as("rev"))
    }),

    "q6_filter" -> ((s, dir) =>
      read(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01") && col("l_shipdate") < lit("1998-01-01") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(dsum(col("l_extendedprice") * col("l_discount")).as("rev"))),

    "q_semijoin" -> ((s, dir) => {
      val big = read(s, dir, "orders").filter(col("o_totalprice") > 450000.0)
      read(s, dir, "customer")
        .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
    }),

    "q_antijoin" -> ((s, dir) =>
      read(s, dir, "customer")
        .join(read(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))),

    "q_window" -> ((s, dir) => {
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_name"))
      read(s, dir, "customer")
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("c_nationkey"), col("c_name"), col("c_acctbal"), col("rnk"))
    }),

    "q_running" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      read(s, dir, "orders")
        .withColumn("run_total",
          sum(col("o_totalprice").cast(DecimalType(25, 6))).over(w).cast(DoubleType))
        .select(col("o_custkey"), col("o_orderkey"), col("run_total"))
    }),

    "q_rollup" -> ((s, dir) =>
      read(s, dir, "customer")
        .join(broadcast(read(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(read(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("sum_bal"))),

    "q_cube" -> ((s, dir) =>
      read(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))),

    // Arbitrary GROUPING SETS (not a rollup/cube lattice): the two
    // 1-D marginals plus the grand total in ONE pass — Spark expands
    // the sets inside a single Expand+HashAggregate, one shuffle, vs
    // three scans + a union if written naively.
    "q_grouping_sets" -> ((s, dir) =>
      read(s, dir, "orders")
        .groupingSets(
          Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq.empty[Column]),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))),

    // Gap-based sessionization (30-min inactivity): lag + cumulative
    // session counter per user — one shuffle on user_id, both windows
    // share the partitioning.
    "q_sessionize" -> ((s, dir) => {
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
      val gap = 30L * 60 * 1000 * 1000
      events(s, dir)
        .withColumn("ts_us", expr("ts_ns div 1000"))
        .withColumn("prev", lag(col("ts_us"), 1).over(byUser))
        .withColumn("new_sess",
          when(col("prev").isNull || col("ts_us") - col("prev") > gap, 1L).otherwise(0L))
        .withColumn("session_id", sum(col("new_sess")).over(byUser))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"), min(col("ts_us")).as("sess_start"))
    }),

    // typed extraction from the JSON-ish props column (regexp both
    // sides so the oracle is engine-neutral)
    "q_props_extract" -> ((s, dir) =>
      events(s, dir)
        .select(col("event_id"),
          regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long").as("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("n"))),

    // Correlated-min subquery shape (TPC-H Q2): lineitems priced at
    // their part's minimum price — window-min, no self-join.
    "q_corr_min" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_partkey"))
      read(s, dir, "lineitem")
        .withColumn("min_price", min(col("l_extendedprice")).over(w))
        .filter(col("l_extendedprice") === col("min_price"))
        .groupBy(col("l_partkey"))
        .agg(min(col("l_suppkey")).as("supp"), min(col("l_extendedprice")).as("price"))
    }),

    // Nation-pair trade volume by year (TPC-H Q7 shape)
    "q7_volume" -> ((s, dir) => {
      val n1 = read(s, dir, "nation").select(col("n_nationkey").as("ck"), col("n_name").as("cust_nation"))
      val n2 = read(s, dir, "nation").select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation"))
      read(s, dir, "lineitem")
        .join(read(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(read(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(read(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("c_nationkey") === col("ck"))
        .join(broadcast(n2), col("s_nationkey") === col("sk"))
        .filter(col("cust_nation") =!= col("supp_nation"))
        .groupBy(col("cust_nation"), col("supp_nation"),
          year(col("l_shipdate")).cast("long").as("l_year")) // DuckDB year() is BIGINT
        .agg(dsum(revenue).as("volume"))
    }),

    // Sketch aggregates — the interactive-analytics path at 100 TB where
    // exact distinct/percentile would shuffle every value: HLL++
    // (approx_count_distinct) and a quantile sketch (approx_percentile)
    // are map-side mergeable, so cost is one partial-agg pass. Approximate
    // results differ per engine → rows-only + an error-bound spec.
    "q_approx" -> ((s, dir) =>
      events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          approx_count_distinct(col("user_id")).as("approx_users"),
          percentile_approx(col("value"), lit(0.5), lit(10000)).as("approx_median"),
          count(lit(1)).as("n"))),

    // The exact slice of the sketch query under a hard oracle: same
    // grouping, exact COUNT(DISTINCT) + COUNT(*) — hash-checks against
    // DuckDB and doubles as the ground truth the q_approx error-bound
    // spec measures HLL drift against. This shrinks the rows-only set
    // to the genuinely non-replicable sketch columns. (At 100 TB you
    // run q_approx; this exists to certify it.)
    "q_approx_exact" -> ((s, dir) =>
      events(s, dir).groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("exact_users"),
          count(lit(1)).as("n"))),

    // Salted skew join: hot keys spread over (key, salt) reducers —
    // result must be IDENTICAL to the plain equi-join (the oracle is
    // exactly that), only the plan changes. Aggregated afterward so
    // the surface is the join, not a row dump.
    "q_skew_join" -> ((s, dir) => {
      val cust = read(s, dir, "customer")
        .select(col("c_custkey"), col("c_acctbal"), col("c_nationkey").as("key"))
      val nat = read(s, dir, "nation")
        .select(col("n_nationkey").as("key"), col("n_name"))
      graft.operators.SkewJoin.salted(cust, nat, "key", salts = 8)
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n"), dsum(col("c_acctbal")).as("total_bal"))
    }),

    // Time-interval moving window (RANGE frame): per event, the sum /
    // count of the user's events in the trailing hour — the rolling-
    // metric shape rows-based frames (q_running) can't express.
    "q_window_range" -> ((s, dir) => {
      val hour = 3600L * 1000 * 1000
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
        .rangeBetween(-hour, 0)
      events(s, dir)
        .withColumn("ts_us", expr("ts_ns div 1000"))
        .select(col("event_id"), col("user_id"), col("ts_us"),
          sum(col("value").cast(DecimalType(25, 6))).over(w)
            .cast(DoubleType).as("win_sum"),
          count(lit(1)).over(w).as("win_n"))
    }),

    // Quantile bucketing (NTILE): per event type, assign each event to
    // its value quartile — the binning step calibration/stratification
    // pipelines run. Total order (value, event_id) keeps bucket edges
    // engine-deterministic.
    "q_ntile" -> ((s, dir) => {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("value"), col("event_id"))
      events(s, dir)
        .withColumn("quartile", ntile(4).over(w))
        .groupBy(col("event_type"), col("quartile"))
        .agg(count(lit(1)).as("n"),
          round(min(col("value")), 6).as("lo"),
          round(max(col("value")), 6).as("hi"))
    }),

    // FULL OUTER join (the reconciliation shape): per-nation customer
    // vs supplier counts where either side may be absent — the join
    // family semi/anti don't cover. Aggregate-then-join: both inputs
    // reduce before the join, so the outer join is key-cardinality
    // sized, never row-sized.
    "q_outer_join" -> ((s, dir) => {
      val c = read(s, dir, "customer")
        .groupBy(col("c_nationkey").as("nk")).agg(count(lit(1)).as("n_cust"))
      val su = read(s, dir, "supplier")
        .groupBy(col("s_nationkey").as("nk")).agg(count(lit(1)).as("n_supp"))
      c.join(su, Seq("nk"), "full_outer")
        .select(col("nk").as("nationkey"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
    }),

    // Top-N per group (the "latest/k-best per key" shape): top-2
    // orders by price per customer. The rank filter compiles to
    // WindowGroupLimit — a MAP-SIDE per-group heap before the window
    // shuffle (plan-pinned), so the shuffle carries ≤ N rows per
    // (partition, key), not the whole history.
    "q_topk_group" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      read(s, dir, "orders")
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 2)
        .select(col("o_custkey"), col("rk"), col("o_orderkey"), col("o_totalprice"))
    }),

    // UNPIVOT wide→long (the inverse of q_pivot): part's numeric
    // measures stacked into (metric, value) rows — a map-only Expand,
    // no shuffle at all.
    "q_unpivot" -> ((s, dir) =>
      read(s, dir, "part")
        .select(col("p_partkey"), col("p_size").cast("double").as("size"),
          col("p_retailprice").cast("double").as("retailprice"))
        .unpivot(Array(col("p_partkey")),
          Array(col("size"), col("retailprice")), "metric", "value")),

    // Time-series RESAMPLE + gap-fill + LOCF: per user, every day
    // from first to last activity — silent days materialized with
    // zero counts and the last observed max carried forward. The
    // spine explode is bounded by span-days per user; the fill join
    // and LOCF window are both (user, day)-keyed, so no partition
    // ever exceeds one user's day span.
    "q_resample" -> ((s, dir) => {
      val dayUs = 86400L * 1000 * 1000
      val e = events(s, dir)
        .withColumn("day", expr(s"(ts_ns div 1000) div $dayUs"))
      val daily = e.groupBy(col("user_id"), col("day"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("vsum"),
          max(col("value")).as("maxv"))
      val spine = e.groupBy(col("user_id"))
        .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(col("user_id"), explode(sequence(col("d0"), col("d1"))).as("day"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(daily, Seq("user_id", "day"), "left")
        .select(col("user_id"), col("day"),
          coalesce(col("n"), lit(0L)).as("n"),
          coalesce(col("vsum"), lit(0.0)).as("vsum"),
          round(last(col("maxv"), ignoreNulls = true).over(w), 6).as("locf"))
    }),

    // LISTAGG / string_agg: suppliers rolled up to one sorted
    // name-list row per nation. sort_array(collect_list) is the
    // deterministic form (a SQL LISTAGG without ORDER BY is
    // unspecified); the group payload is the operator's inherent
    // memory shape — one nation's names must meet in one place.
    "q_string_agg" -> ((s, dir) =>
      read(s, dir, "supplier")
        .groupBy(col("s_nationkey"))
        .agg(concat_ws(",", sort_array(collect_list(col("s_name")))).as("names"),
          count(lit(1)).as("n"))),

    // INTERSECT / EXCEPT set semantics (distinct in both engines):
    // customers ordering in both of two years vs only the first.
    // Range-form date filters keep the predicate encoding-neutral
    // (string or DATE column both compare correctly).
    "q_setops" -> ((s, dir) => {
      val o = read(s, dir, "orders")
      def yr(y: Int) = o
        .filter(col("o_orderdate") >= lit(s"$y-01-01") &&
          col("o_orderdate") < lit(s"${y + 1}-01-01"))
        .select(col("o_custkey"))
      yr(1995).intersect(yr(1996)).withColumn("tag", lit("both"))
        .unionAll(yr(1995).except(yr(1996)).withColumn("tag", lit("only_1995")))
    }),

    // Exact interpolated percentiles per group (the SLA/latency-report
    // aggregate): Spark's percentile == DuckDB's quantile_cont. Exact
    // percentile needs the group's values together — one hash shuffle,
    // no sort of the whole relation (contrast q_approx's mergeable
    // sketch, the 100 TB path when error tolerance allows).
    "q_percentile" -> ((s, dir) =>
      events(s, dir).groupBy(col("event_type"))
        .agg(round(expr("percentile(value, 0.25)"), 6).as("p25"),
          round(expr("percentile(value, 0.5)"), 6).as("p50"),
          round(expr("percentile(value, 0.95)"), 6).as("p95"))),

    // PIVOT: long-form events to one wide row per user with a column
    // per event type, as declared-value conditional aggregates — ONE
    // groupBy shuffle. Deliberately NOT RelationalGroupedDataset.pivot:
    // even with declared values it plans a two-stage aggregation
    // (groupBy(user, type) Exchange, then a pivotfirst Exchange on
    // user) — double the shuffle for nothing at corpus scale
    // (plan-pinned in PlanAuditSpec). Exact decimal sums; a
    // (user, type) cell with no events is NULL here and in DuckDB's
    // FILTER alike (sum over an empty conditional group).
    "q_pivot" -> ((s, dir) => {
      val cols = Seq("click", "error", "purchase", "signup", "view").map(t =>
        sum(when(col("event_type") === t, col("value").cast(DecimalType(25, 6))))
          .cast(DoubleType).as(t))
      events(s, dir).groupBy(col("user_id")).agg(cols.head, cols.tail: _*)
    }),

    // Promo revenue share in a month (TPC-H Q14 shape): lineitem⋈part
    // with a conditional aggregate — part is broadcast-size at any SF
    // where it fits (AQE falls back to SMJ past the threshold).
    "q14_promo" -> ((s, dir) =>
      read(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-09-01") && col("l_shipdate") < lit("1997-10-01"))
        .join(read(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .agg((lit(100.0) *
            dsum(when(col("p_type").startsWith("PROMO"), revenue).otherwise(lit(0.0))) /
            dsum(revenue)).as("promo_revenue"))),

    // For each purchase event: the user's most recent signup at-or-before
    // it (custom as-of operator; oracle = DuckDB's native ASOF JOIN).
    "q_asof_join" -> ((s, dir) => {
      val ev = events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts_ns"))
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts_ns"), col("ts_ns").as("signup_ns"),
          col("event_id").as("signup_id"))
      AsOfJoin.leftAsOf(purchases, signups, key = "user_id",
          timeCol = "ts_ns", valueCols = Seq("signup_ns"), tieBreak = "signup_id")
        // DuckDB reads the nanos parquet timestamps at micro precision —
        // emit micros so the oracle can compare exactly.
        .select(col("event_id"), col("user_id"),
          expr("ts_ns div 1000").as("ts_us"),
          expr("asof_signup_ns div 1000").as("signup_us"))
    }),

    // As-of with a max-staleness TOLERANCE (pandas merge_asof
    // semantics): a signup older than 7 days nulls out, the purchase
    // row survives. Same single-shuffle union+window merge — the
    // matched right time rides the same carry.
    "q_asof_tolerance" -> ((s, dir) => {
      val ev = events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts_ns"))
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts_ns"), col("ts_ns").as("signup_ns"),
          col("event_id").as("signup_id"))
      AsOfJoin.leftAsOf(purchases, signups, key = "user_id",
          timeCol = "ts_ns", valueCols = Seq("signup_ns"), tieBreak = "signup_id",
          tolerance = Some(7L * 86400 * 1000 * 1000 * 1000))
        .select(col("event_id"), col("user_id"),
          expr("ts_ns div 1000").as("ts_us"),
          expr("asof_signup_ns div 1000").as("signup_us"))
    }),

    // For each error event: # of click events within ±5 minutes
    // (banded interval join; oracle = inequality join in DuckDB).
    "q_range_join" -> ((s, dir) => {
      // micro precision to match what DuckDB sees (nanos truncate).
      val ev = events(s, dir)
        .withColumn("ts_us", expr("ts_ns div 1000"))
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id"), col("ts_us"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("ts_us").as("click_us"))
      val radius = 300L * 1000 * 1000 // 5 min in micros
      RangeJoin.within(errors, clicks, "ts_us", "click_us", radius)
        .groupBy(col("event_id"))
        .agg(count(col("click_id")).as("n_clicks"))
    }),

    // CDC MERGE / upsert: apply the events changelog to a keyed base
    // snapshot — last event per user wins ('error' = DELETE, anything
    // else = UPSERT of its value). The changelog reduces to key
    // cardinality FIRST (max_by over (ts, event_id) — map-side
    // combinable, no per-key window over the raw stream), so the FULL
    // OUTER merge join is key-sized on both sides, never row-sized.
    // Base excludes user_id < 50 so all three MERGE actions (kept /
    // updated-or-deleted / inserted) fire on the test data.
    "q_merge_cdc" -> ((s, dir) => {
      val base = read(s, dir, "customer")
        .filter(col("c_custkey") >= 50)
        .select(col("c_custkey").as("user_id"), col("c_acctbal").as("bal"))
      val changes = events(s, dir)
        .select(col("user_id"),
          when(col("event_type") === "error", lit("D")).otherwise(lit("U")).as("op"),
          col("value").as("new_bal"),
          expr("ts_ns div 1000").as("ts_us"), col("event_id"))
      CdcMerge.applyLatest(base, CdcMerge.latestPerKey(changes))
    }),

    // ordered conversion FUNNEL (signup → click → purchase): each
    // stage's timestamp is the user's earliest qualifying event AFTER
    // the previous stage — three per-user min-reduces chained by
    // key-sized joins (never a per-user sort of the raw stream); a
    // click before signup does not count. stage = how far the user got.
    "q_funnel" -> ((s, dir) =>
      Funnel.stages(
        events(s, dir)
          .select(col("user_id"), col("event_type"),
            expr("ts_ns div 1000").as("ts_us")),
        Seq("signup", "click", "purchase"))),

    // cohort RETENTION matrix: users cohorted by first-activity day;
    // each active (user, day) lands in (cohort_day, day_offset) —
    // two reduces ((user,day) distinct, then per-user min) + one
    // key-sized join; the matrix is |days|² rows at most.
    "q_retention" -> ((s, dir) => {
      val dayUs = 86400L * 1000 * 1000
      val ud = events(s, dir)
        .select(col("user_id"), expr(s"(ts_ns div 1000) div $dayUs").as("day"))
        .distinct()
      val cohort = ud.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
      ud.join(cohort, Seq("user_id"))
        .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
        .agg(count(lit(1)).as("n_users"))
    }),

    // SCD TYPE-2 dimension build (the versioned-history complement of
    // q_merge_cdc's latest-wins): every change becomes a validity
    // interval [valid_from, valid_to) via lead() per key — the window
    // partition is ONE key's change history (dimension churn, never
    // fact volume); open intervals are the current rows.
    "q_scd2" -> ((s, dir) => {
      val ev = events(s, dir).select(col("user_id"),
        expr("ts_ns div 1000").as("ts_us"), col("event_id"),
        round(col("value"), 6).as("value"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      ev.withColumn("valid_to", lead(col("ts_us"), 1).over(w))
        .select(col("user_id"), col("value"), col("ts_us").as("valid_from"),
          col("valid_to"), col("valid_to").isNull.as("is_current"))
    }),

    // Deequ-style DATA-QUALITY constraint report over a table: null
    // checks, key uniqueness, value ranges fused into ONE scan (a
    // single conditional-aggregate pass, unpivoted to report rows);
    // referential integrity is the one extra anti-join (orphan
    // o_custkey vs customer). The report a pipeline gates a snapshot
    // on before admitting it downstream.
    "q_dq_report" -> ((s, dir) => {
      val o = read(s, dir, "orders")
      val fused = o.agg(
        count(lit(1)).as("total"),
        sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("null_custkey"),
        (count(col("o_orderkey")) - countDistinct(col("o_orderkey")))
          .as("dup_orderkey"),
        sum(when(col("o_totalprice") <= 0.0, 1L).otherwise(0L)).as("nonpos_price"),
        sum(when(col("o_orderdate") < lit("1990-01-01"), 1L).otherwise(0L))
          .as("ancient_date"))
      val scalarChecks = fused.select(col("total"), expr(
        """stack(4, 'null_custkey', null_custkey, 'dup_orderkey', dup_orderkey,
                    'nonpos_price', nonpos_price, 'ancient_date', ancient_date)
           AS (chk, violations)"""))
      val orphans = o.join(read(s, dir, "customer")
            .select(col("c_custkey").as("o_custkey")), Seq("o_custkey"), "left_anti")
        .agg(count(lit(1)).as("violations"))
        .crossJoin(broadcast(fused.select(col("total"))))
        .select(col("total"), lit("fk_orphan_custkey").as("chk"), col("violations"))
      scalarChecks.unionByName(orphans)
        .select(col("chk"), col("violations"), col("total"),
          (col("violations") === 0).as("pass"))
    }),

    // MAX CONCURRENCY (interval-overlap counting) by DISTRIBUTED
    // sweep-line: sessions (the q_sessionize derivation) become ±1
    // boundary events; the global running sum splits into a per-DAY
    // window (partition bounded by one day's boundary volume) plus
    // cumulative day offsets over the tiny per-day-totals relation —
    // the two-phase distributed prefix sum, never one global-order
    // window over all boundaries. RANGE-frame peer semantics make the
    // running sum deterministic under timestamp ties in both engines.
    "q_concurrency" -> ((s, dir) => {
      val dayUs = 86400L * 1000 * 1000
      val gapUs = 1800L * 1000 * 1000
      val ev = events(s, dir).select(col("user_id"), expr("ts_ns div 1000").as("ts_us"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
      val sess = ev
        .withColumn("prev", lag(col("ts_us"), 1).over(w))
        .withColumn("new_sess",
          when(col("prev").isNull || col("ts_us") - col("prev") > gapUs, 1)
            .otherwise(0))
        .withColumn("sid", sum(col("new_sess")).over(w))
        .groupBy(col("user_id"), col("sid"))
        .agg(min(col("ts_us")).as("t0"), max(col("ts_us")).as("t1"))
      // BOTH boundaries explode from one session row (a map-side
      // Expand) — the unionAll form re-derived the whole sessionize
      // subtree per branch: two corpus scans and two per-user window
      // passes for the same relation (caught by .explain). The two
      // downstream consumers (per-day running sums, per-day totals)
      // read a MATERIALIZED boundary relation — it is 2×sessions rows
      // (bounded, far below corpus), so one checkpoint beats
      // re-running the per-user sessionize windows per consumer.
      val bounds = sess.select(explode(array(
          struct(col("t0").as("t"), lit(1).as("delta")),
          struct((col("t1") + 1).as("t"), lit(-1).as("delta")))).as("b"))
        .select(col("b.t").as("t"), col("b.delta").as("delta"))
        .withColumn("day", expr(s"t div $dayUs"))
      // NOT checkpointed (r16): AQE exchange reuse serves both
      // consumers at runtime (see q_interval_coalesce below — same
      // boundary sweep, same audit), and the eager checkpoint
      // serialized the chain into an extra blocking job.
      val wd = Window.partitionBy(col("day"))
        .orderBy(col("t"), col("delta").desc) // RANGE default: peers share
      val local = bounds.withColumn("run", sum(col("delta")).over(wd))
      val wo = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = bounds.groupBy(col("day")).agg(sum(col("delta")).as("dtot"))
        .withColumn("off", coalesce(sum(col("dtot")).over(wo), lit(0L)))
        .select(col("day"), col("off"))
      local.join(offsets, Seq("day"))
        .groupBy(col("day"))
        .agg(max(col("run") + col("off")).as("max_conc"))
    }),

    // INTERVAL COALESCE (interval union): merge the overlapping/
    // adjacent session intervals of ALL users into maximal global
    // activity spans — the sibling of q_concurrency on the same
    // boundary sweep. Islands need TWO global prefix sums (running
    // active count; prefix count of zero-runs = island id), both
    // decomposed per-day + cumulative day offsets — never one
    // global-order window. The boundary order (t, delta desc,
    // user_id, sid) is TOTAL, so ROWS frames are deterministic in
    // both engines; a span closes where the running count returns to
    // zero, and every boundary's island id = zeros strictly before it.
    "q_interval_coalesce" -> ((s, dir) => {
      val dayUs = 86400L * 1000 * 1000
      val gapUs = 1800L * 1000 * 1000
      val ev = events(s, dir).select(col("user_id"), expr("ts_ns div 1000").as("ts_us"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
      val sess = ev
        .withColumn("prev", lag(col("ts_us"), 1).over(w))
        .withColumn("new_sess",
          when(col("prev").isNull || col("ts_us") - col("prev") > gapUs, 1)
            .otherwise(0))
        .withColumn("sid", sum(col("new_sess")).over(w))
        .groupBy(col("user_id"), col("sid"))
        .agg(min(col("ts_us")).as("t0"), max(col("ts_us")).as("t1"))
      val bounds = sess.select(col("user_id"), col("sid"), explode(array(
          struct(col("t0").as("t"), lit(1).as("delta")),
          struct((col("t1") + 1).as("t"), lit(-1).as("delta")))).as("b"))
        .select(col("b.t").as("t"), col("b.delta").as("delta"),
          col("user_id"), col("sid"))
        .withColumn("day", expr(s"t div $dayUs"))
      // bounds/zb are NOT checkpointed (r16): AQE exchange reuse serves
      // every multi-consumer subtree here at runtime (stage audit: ONE
      // parquet scan + ONE user-window exchange executed; only the
      // cheap post-exchange window passes run per branch), and the two
      // eager checkpoints serialized the 15-stage chain into extra
      // blocking jobs — 1.97 -> 1.51 s med at sf0.1/local[32] without
      // them. The chain stays two-level (per-day windows + day-offset
      // rollups), never one global-order window.
      val ord = Seq(col("t").asc, col("delta").desc, col("user_id").asc,
        col("sid").asc)
      val wd = Window.partitionBy(col("day")).orderBy(ord: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wo = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = bounds.groupBy(col("day")).agg(sum(col("delta")).as("dtot"))
        .withColumn("off", coalesce(sum(col("dtot")).over(wo), lit(0L)))
        .select(col("day"), col("off"))
      // broadcast keeps the day-partitioning from wd alive for wd2
      val zb = bounds.withColumn("runLoc", sum(col("delta")).over(wd))
        .join(broadcast(offsets), Seq("day"))
        .withColumn("z", when(col("runLoc") + col("off") === 0, 1L).otherwise(0L))
      val wd2 = Window.partitionBy(col("day")).orderBy(ord: _*)
        .rowsBetween(Window.unboundedPreceding, -1)
      val zoff = zb.groupBy(col("day")).agg(sum(col("z")).as("ztot"))
        .withColumn("zo", coalesce(sum(col("ztot")).over(wo), lit(0L)))
        .select(col("day"), col("zo"))
      zb.withColumn("zLoc", coalesce(sum(col("z")).over(wd2), lit(0L)))
        .join(broadcast(zoff), Seq("day"))
        .withColumn("island", col("zLoc") + col("zo"))
        .groupBy(col("island"))
        .agg(min(col("t")).as("span_start"),
          (max(col("t")) - 1L).as("span_end"),
          sum(when(col("delta") === 1, 1L).otherwise(0L)).as("n_sessions"))
        .select(col("span_start"), col("span_end"), col("n_sessions"))
    }),

    // data-profiling histogram: fixed-width value buckets with count /
    // exact sum / min / max per bucket — ONE map-side-combinable
    // shuffle of |buckets| groups. Bucket arithmetic is plain floor
    // division (engine-neutral; DuckDB lacks width_bucket).
    "q_histogram" -> ((s, dir) =>
      read(s, dir, "orders")
        .select(expr("cast(floor(o_totalprice / 30000.0) as bigint)").as("bucket"),
          col("o_totalprice"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"),
          round(min(col("o_totalprice")), 6).as("lo"),
          round(max(col("o_totalprice")), 6).as("hi")))
  )

  private val revSql = "l_extendedprice * (1.0 - l_discount)"
  private def dsumSql(x: String) = s"CAST(SUM(CAST($x AS DECIMAL(25,6))) AS DOUBLE)"
  private def davgSql(x: String) = s"${dsumSql(x)} / COUNT($x)"

  val oracle: Map[String, String] = Map(
    "q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
                 ${dsumSql("l_quantity")} AS sum_qty,
                 ${dsumSql("l_extendedprice")} AS sum_base_price,
                 ${dsumSql(revSql)} AS sum_disc_price,
                 ${davgSql("l_quantity")} AS avg_qty,
                 ${davgSql("l_discount")} AS avg_disc,
                 COUNT(*) AS count_order
          FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
          GROUP BY l_returnflag, l_linestatus""",
    "q3_topn" ->
      s"""SELECT l_orderkey, o_orderdate, o_orderpriority, ${dsumSql(revSql)} AS rev
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          WHERE c_mktsegment = 'BUILDING'
            AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
            AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
          GROUP BY l_orderkey, o_orderdate, o_orderpriority
          ORDER BY rev DESC, l_orderkey LIMIT 10""",
    "q5_multijoin" ->
      s"""SELECT n_name, ${dsumSql(revSql)} AS rev
          FROM customer
          JOIN orders ON c_custkey = o_custkey
          JOIN lineitem ON o_orderkey = l_orderkey
          JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          WHERE r_name = 'ASIA'
            AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          GROUP BY n_name""",
    "q6_filter" ->
      s"""SELECT ${dsumSql("l_extendedprice * l_discount")} AS rev
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
            AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
            AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""",
    "q_semijoin" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_totalprice > 450000.0)""",
    "q_antijoin" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey
                             AND o_orderpriority = '1-URGENT')""",
    "q_window" ->
      """SELECT c_nationkey, c_name, c_acctbal, rnk FROM (
           SELECT c_nationkey, c_name, c_acctbal,
                  row_number() OVER (PARTITION BY c_nationkey
                                     ORDER BY c_acctbal DESC, c_name) AS rnk
           FROM customer) t
         WHERE rnk <= 3""",
    "q_running" ->
      """SELECT o_custkey, o_orderkey,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6)))
                     OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
                     AS DOUBLE) AS run_total
         FROM orders""",
    "q_rollup" ->
      s"""SELECT r_name, n_name, COUNT(*) AS n_cust, ${dsumSql("c_acctbal")} AS sum_bal
          FROM customer
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          GROUP BY ROLLUP (r_name, n_name)""",
    "q_grouping_sets" ->
      s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
                 ${dsumSql("o_totalprice")} AS total
          FROM orders
          GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""",
    "q_sessionize" ->
      """SELECT user_id, session_id, COUNT(*) AS n_events, min(ts_us) AS sess_start
         FROM (
           SELECT user_id, ts_us,
                  CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us) AS BIGINT) AS session_id
           FROM (
             SELECT user_id, epoch_us(ts) AS ts_us,
                    CASE WHEN lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) IS NULL
                           OR epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts))
                              > 1800000000
                         THEN 1 ELSE 0 END AS new_sess
             FROM events) g) s
         GROUP BY user_id, session_id""",
    "q_props_extract" ->
      """SELECT CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS k,
                COUNT(*) AS n
         FROM events GROUP BY 1""",
    "q_corr_min" ->
      """SELECT l_partkey, min(l_suppkey) AS supp, min(l_extendedprice) AS price
         FROM lineitem l
         WHERE l_extendedprice = (SELECT min(l_extendedprice) FROM lineitem
                                  WHERE l_partkey = l.l_partkey)
         GROUP BY l_partkey""",
    "q7_volume" ->
      s"""SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
                 year(l_shipdate) AS l_year, ${dsumSql(revSql)} AS volume
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation n1 ON c_nationkey = n1.n_nationkey
          JOIN nation n2 ON s_nationkey = n2.n_nationkey
          WHERE n1.n_name <> n2.n_name
          GROUP BY 1, 2, 3""",
    "q_cube" ->
      s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
                 ${dsumSql("o_totalprice")} AS total
          FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""",
    "q14_promo" ->
      s"""SELECT 100.0 * ${dsumSql(s"CASE WHEN p_type LIKE 'PROMO%' THEN $revSql ELSE 0.0 END")}
                 / ${dsumSql(revSql)} AS promo_revenue
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
            AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'""",
    "q_approx_exact" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS exact_users,
                COUNT(*) AS n
         FROM events GROUP BY 1""",
    // the salted join MUST equal the plain join — the oracle is the
    // plain formulation
    "q_skew_join" ->
      """SELECT n_name, COUNT(*) AS n,
                CAST(SUM(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE) AS total_bal
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         GROUP BY 1""",
    "q_window_range" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
                CAST(SUM(CAST(value AS DECIMAL(25,6)))
                     OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                           RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
                     AS DOUBLE) AS win_sum,
                COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                               RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
                  AS win_n
         FROM events""",
    "q_ntile" ->
      """SELECT event_type, quartile, COUNT(*) AS n,
                round(MIN(value), 6) AS lo, round(MAX(value), 6) AS hi
         FROM (SELECT event_type, value,
                      ntile(4) OVER (PARTITION BY event_type
                                     ORDER BY value, event_id) AS quartile
               FROM events) t
         GROUP BY 1, 2""",
    "q_outer_join" ->
      """SELECT COALESCE(c.nk, s.nk) AS nationkey,
                COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
         FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_cust
               FROM customer GROUP BY 1) c
         FULL OUTER JOIN
              (SELECT s_nationkey AS nk, COUNT(*) AS n_supp
               FROM supplier GROUP BY 1) s
           ON c.nk = s.nk""",
    "q_topk_group" ->
      """SELECT o_custkey, rk, o_orderkey, o_totalprice FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
                  row_number() OVER (PARTITION BY o_custkey
                                     ORDER BY o_totalprice DESC, o_orderkey) AS rk
           FROM orders) r
         WHERE rk <= 2""",
    "q_unpivot" ->
      """SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
         UNION ALL
         SELECT p_partkey, 'retailprice' AS metric, CAST(p_retailprice AS DOUBLE) FROM part""",
    "q_resample" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day, value
                    FROM events),
              daily AS (SELECT user_id, day, COUNT(*) AS n,
                               CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS vsum,
                               MAX(value) AS maxv
                        FROM e GROUP BY 1, 2),
              span AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1
                       FROM e GROUP BY 1),
              spine AS (SELECT user_id, unnest(range(d0, d1 + 1)) AS day FROM span)
         SELECT s.user_id, s.day,
                COALESCE(n, 0) AS n, COALESCE(vsum, 0.0) AS vsum,
                round(last_value(maxv IGNORE NULLS)
                      OVER (PARTITION BY s.user_id ORDER BY s.day
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS locf
         FROM spine s LEFT JOIN daily d
           ON s.user_id = d.user_id AND s.day = d.day""",
    "q_string_agg" ->
      """SELECT s_nationkey,
                string_agg(s_name, ',' ORDER BY s_name) AS names,
                COUNT(*) AS n
         FROM supplier GROUP BY 1""",
    "q_setops" ->
      """WITH y95 AS (SELECT o_custkey FROM orders
                      WHERE o_orderdate >= '1995-01-01' AND o_orderdate < '1996-01-01'),
              y96 AS (SELECT o_custkey FROM orders
                      WHERE o_orderdate >= '1996-01-01' AND o_orderdate < '1997-01-01')
         SELECT o_custkey, 'both' AS tag
         FROM (SELECT o_custkey FROM y95 INTERSECT SELECT o_custkey FROM y96)
         UNION ALL
         SELECT o_custkey, 'only_1995' AS tag
         FROM (SELECT o_custkey FROM y95 EXCEPT SELECT o_custkey FROM y96)""",
    "q_percentile" ->
      """SELECT event_type,
                round(quantile_cont(value, 0.25), 6) AS p25,
                round(quantile_cont(value, 0.5), 6) AS p50,
                round(quantile_cont(value, 0.95), 6) AS p95
         FROM events GROUP BY 1""",
    "q_pivot" ->
      """SELECT user_id,
                CAST(SUM(CAST(value AS DECIMAL(25,6))) FILTER (WHERE event_type = 'click') AS DOUBLE) AS click,
                CAST(SUM(CAST(value AS DECIMAL(25,6))) FILTER (WHERE event_type = 'error') AS DOUBLE) AS error,
                CAST(SUM(CAST(value AS DECIMAL(25,6))) FILTER (WHERE event_type = 'purchase') AS DOUBLE) AS purchase,
                CAST(SUM(CAST(value AS DECIMAL(25,6))) FILTER (WHERE event_type = 'signup') AS DOUBLE) AS signup,
                CAST(SUM(CAST(value AS DECIMAL(25,6))) FILTER (WHERE event_type = 'view') AS DOUBLE) AS "view"
         FROM events GROUP BY 1""",
    "q_asof_join" ->
      """SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
                epoch_us(s.ts) AS signup_us
         FROM (SELECT * FROM events WHERE event_type = 'purchase') p
         ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
           ON p.user_id = s.user_id AND p.ts >= s.ts""",
    "q_asof_tolerance" ->
      """SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
                CASE WHEN epoch_us(p.ts) - epoch_us(s.ts) <= 604800000000
                     THEN epoch_us(s.ts) END AS signup_us
         FROM (SELECT * FROM events WHERE event_type = 'purchase') p
         ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
           ON p.user_id = s.user_id AND p.ts >= s.ts""",
    "q_range_join" ->
      """SELECT e.event_id, COUNT(c.event_id) AS n_clicks
         FROM events e
         JOIN events c
           ON c.event_type = 'click'
          AND abs(epoch_us(c.ts) - epoch_us(e.ts)) <= 300000000
         WHERE e.event_type = 'error'
         GROUP BY e.event_id""",
    "q_merge_cdc" ->
      """WITH ev AS (SELECT user_id, event_type, value, epoch_us(ts) AS ts_us, event_id
                     FROM events),
              last AS (SELECT user_id, event_type, value FROM (
                         SELECT *, row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts_us DESC, event_id DESC) AS rn
                         FROM ev) t WHERE rn = 1),
              ch AS (SELECT user_id,
                            CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
                            value AS new_bal
                     FROM last),
              b AS (SELECT c_custkey AS user_id, c_acctbal AS bal
                    FROM customer WHERE c_custkey >= 50),
              m AS (SELECT coalesce(b.user_id, ch.user_id) AS user_id,
                           b.bal, ch.op, ch.new_bal
                    FROM b FULL OUTER JOIN ch ON b.user_id = ch.user_id)
         SELECT user_id,
                round(CASE WHEN op = 'U' THEN new_bal ELSE bal END, 6) AS bal,
                CASE WHEN op IS NULL THEN 'kept'
                     WHEN bal IS NULL THEN 'inserted'
                     ELSE 'updated' END AS action
         FROM m WHERE op IS NULL OR op <> 'D'""",
    "q_histogram" ->
      s"""SELECT CAST(floor(o_totalprice / 30000.0) AS BIGINT) AS bucket,
                 COUNT(*) AS n, ${dsumSql("o_totalprice")} AS total,
                 round(min(o_totalprice), 6) AS lo,
                 round(max(o_totalprice), 6) AS hi
          FROM orders GROUP BY 1""",
    "q_scd2" ->
      """SELECT user_id, round(value, 6) AS value, ts_us AS valid_from,
                lead(ts_us) OVER (PARTITION BY user_id
                                  ORDER BY ts_us, event_id) AS valid_to,
                lead(ts_us) OVER (PARTITION BY user_id
                                  ORDER BY ts_us, event_id) IS NULL AS is_current
         FROM (SELECT user_id, value, epoch_us(ts) AS ts_us, event_id FROM events) t""",
    "q_dq_report" ->
      """WITH f AS (SELECT count(*) AS total,
                           SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS null_custkey,
                           count(o_orderkey) - count(DISTINCT o_orderkey) AS dup_orderkey,
                           SUM(CASE WHEN o_totalprice <= 0.0 THEN 1 ELSE 0 END) AS nonpos_price,
                           SUM(CASE WHEN o_orderdate < TIMESTAMP '1990-01-01 00:00:00'
                               THEN 1 ELSE 0 END) AS ancient_date
                    FROM orders),
              orph AS (SELECT count(*) AS violations FROM orders
                       WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)),
              rows_ AS (
                SELECT 'null_custkey' AS chk, null_custkey AS violations, total FROM f
                UNION ALL SELECT 'dup_orderkey', dup_orderkey, total FROM f
                UNION ALL SELECT 'nonpos_price', nonpos_price, total FROM f
                UNION ALL SELECT 'ancient_date', ancient_date, total FROM f
                UNION ALL SELECT 'fk_orphan_custkey', orph.violations, f.total
                          FROM orph, f)
         SELECT chk, CAST(violations AS BIGINT) AS violations, total,
                violations = 0 AS pass FROM rows_""",
    // the oracle states the sweep-line as ONE global running sum (the
    // semantic definition); the Spark side must decompose it into the
    // per-day + offset form and land on identical values
    "q_concurrency" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events),
              g AS (SELECT user_id, ts_us,
                      CASE WHEN lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) IS NULL
                             OR ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us)
                                > 1800000000
                           THEN 1 ELSE 0 END AS ns
                    FROM ev),
              s2 AS (SELECT user_id, ts_us,
                            SUM(ns) OVER (PARTITION BY user_id ORDER BY ts_us) AS sid
                     FROM g),
              sess AS (SELECT user_id, sid, min(ts_us) AS t0, max(ts_us) AS t1
                       FROM s2 GROUP BY 1, 2),
              b AS (SELECT t0 AS t, 1 AS delta FROM sess
                    UNION ALL SELECT t1 + 1, -1 FROM sess),
              r AS (SELECT t, delta,
                           SUM(delta) OVER (ORDER BY t, delta DESC) AS run
                    FROM b)
         SELECT t // 86400000000 AS day, CAST(max(run) AS BIGINT) AS max_conc
         FROM r GROUP BY 1""",
    // the oracle states both prefix sums as global-order windows (the
    // semantic definition); the Spark side decomposes each into the
    // per-day + day-offset form and must land on identical spans.
    // (t, delta DESC, user_id, sid) is a total order, so the ROWS
    // frames are deterministic in both engines; every SUM-derived
    // output is CAST to BIGINT (the audited HUGEINT class).
    "q_interval_coalesce" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events),
              g AS (SELECT user_id, ts_us,
                      CASE WHEN lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) IS NULL
                             OR ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us)
                                > 1800000000
                           THEN 1 ELSE 0 END AS ns
                    FROM ev),
              s2 AS (SELECT user_id, ts_us,
                            SUM(ns) OVER (PARTITION BY user_id ORDER BY ts_us) AS sid
                     FROM g),
              sess AS (SELECT user_id, sid, min(ts_us) AS t0, max(ts_us) AS t1
                       FROM s2 GROUP BY 1, 2),
              b AS (SELECT t0 AS t, 1 AS delta, user_id, sid FROM sess
                    UNION ALL SELECT t1 + 1, -1, user_id, sid FROM sess),
              r AS (SELECT t, delta, user_id, sid,
                           SUM(delta) OVER (ORDER BY t, delta DESC, user_id, sid
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
                    FROM b),
              i AS (SELECT t, delta,
                           COALESCE(SUM(CASE WHEN run = 0 THEN 1 ELSE 0 END)
                             OVER (ORDER BY t, delta DESC, user_id, sid
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS island
                    FROM r)
         SELECT CAST(min(t) AS BIGINT) AS span_start,
                CAST(max(t) - 1 AS BIGINT) AS span_end,
                CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
         FROM i GROUP BY island""",
    "q_funnel" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
              su AS (SELECT user_id, min(ts_us) AS signup_us FROM ev
                     WHERE event_type = 'signup' GROUP BY user_id),
              cl AS (SELECT e.user_id, min(e.ts_us) AS click_us
                     FROM ev e JOIN su ON e.user_id = su.user_id
                     WHERE e.event_type = 'click' AND e.ts_us > su.signup_us
                     GROUP BY e.user_id),
              pu AS (SELECT e.user_id, min(e.ts_us) AS purchase_us
                     FROM ev e JOIN cl ON e.user_id = cl.user_id
                     WHERE e.event_type = 'purchase' AND e.ts_us > cl.click_us
                     GROUP BY e.user_id)
         SELECT su.user_id, signup_us, click_us, purchase_us,
                1 + CASE WHEN click_us IS NOT NULL THEN 1 ELSE 0 END
                  + CASE WHEN purchase_us IS NOT NULL THEN 1 ELSE 0 END AS stage
         FROM su
         LEFT JOIN cl ON su.user_id = cl.user_id
         LEFT JOIN pu ON su.user_id = pu.user_id""",
    "q_retention" ->
      """WITH ud AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
                     FROM events),
              cohort AS (SELECT user_id, min(day) AS cohort_day FROM ud GROUP BY user_id)
         SELECT cohort_day, day - cohort_day AS day_offset, COUNT(*) AS n_users
         FROM ud JOIN cohort USING (user_id)
         GROUP BY 1, 2"""
  )
}
