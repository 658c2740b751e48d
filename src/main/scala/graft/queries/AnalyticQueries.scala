package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.CoreOps._
import graft.operators.Relational._
import graft.sources.Tables

/** SURVEY.md §2.2 — relational/analytic extensions + DuckDB oracles.
  *
  * Timestamp outputs are cast to TIMESTAMP_NTZ (UTC session) or epoch
  * micros so both engines serialize identical values.
  */
object AnalyticQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.2/16 star-schema join + agg: fact-fact shuffle joins up to
    // customer (which scales with SF — no forced broadcast; AQE picks
    // the strategy), then broadcast joins on the constant-size
    // nation/region dims, single hash aggregate.
    "q_star_join" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .keyedJoin(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .keyedJoin(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .keyedJoin(Tables.nation(s, dir), col("c_nationkey") === col("n_nationkey"), broadcastRight = true)
        .keyedJoin(Tables.region(s, dir), col("n_regionkey") === col("r_regionkey"), broadcastRight = true)
        .reduceByKey(
          Seq(col("r_name"), col("n_name")),
          Seq(
            sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100).cast("bigint"))
              .as("revenue_cents"),
            count(lit(1)).as("n_items")
          )
        )),

    // §2.2/17 window: top-3 orders per customer.
    "q_window" -> ((s, dir) =>
      Tables.orders(s, dir)
        .topKPerGroup(
          Seq(col("o_custkey")),
          Seq(col("o_totalprice").desc, col("o_orderkey").asc),
          3
        )
        .mapRecords(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))),

    // §2.2/22b2 analytic window-function breadth: rank family +
    // frame navigation in ONE window pass (one shuffle on the key, all
    // five functions share the sort). percent_rank/cume_dist are
    // single divisions of exact counts — engine-portable; the
    // (price, orderkey) ordering is total, so peer groups are
    // singletons and both ranks are deterministic.
    "q_rank_funcs" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
      Tables.orders(s, dir)
        .withColumn("cents", round(col("o_totalprice") * 100).cast("bigint"))
        .select(
          col("o_custkey"), col("o_orderkey"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"),
          lag(col("cents"), 1).over(w).as("prev_cents"),
          first(col("cents")).over(w).as("min_cents"))
    }),

    // §2.2/22r same result via the custom GroupTopK physical operator
    // (bounded heaps, partial-before-shuffle) instead of window rank.
    "q_group_topk" -> ((s, dir) =>
      org.apache.spark.sql.graft.GraftPlans.groupTopK(
          Tables.orders(s, dir),
          Seq(col("o_custkey")),
          Seq(col("o_totalprice").desc, col("o_orderkey").asc),
          3)
        .mapRecords(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))),

    // §2.2/18 global top-k over an aggregate.
    "q_topk" -> ((s, dir) =>
      Tables.orders(s, dir)
        .reduceByKey(Seq(col("o_custkey")), Seq(count(lit(1)).as("n")))
        .topK(5, col("n").desc, col("o_custkey").asc)),

    // §2.2/19a semi join: customers having at least one order.
    "q_semi_join" -> ((s, dir) =>
      Tables.customer(s, dir)
        .semiJoin(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"))
        .mapRecords(col("c_custkey"), col("c_name"))),

    // §2.2/19b anti join: parts never ordered in bulk (qty > 48).
    "q_anti_join" -> ((s, dir) =>
      Tables.part(s, dir)
        .antiJoin(
          Tables.lineitem(s, dir).filterRecords(col("l_quantity") > 48),
          col("p_partkey") === col("l_partkey")
        )
        .mapRecords(col("p_partkey"), col("p_name"))),

    // §2.2/20 rollup subtotals in one pass.
    "q_rollup" -> ((s, dir) =>
      Tables.lineitem(s, dir).rollupAgg(
        Seq(col("l_returnflag"), col("l_linestatus")),
        Seq(sum(col("l_quantity").cast("bigint")).as("sum_qty"), count(lit(1)).as("n"))
      )),

    // §2.2/21 time-bucketed aggregation over the event stream table.
    "q_time_bucket" -> ((s, dir) =>
      Tables.events(s, dir)
        .timeBucketAgg(
          col("ts"), "hour",
          Seq(col("event_type")),
          Seq(
            count(lit(1)).as("n"),
            sum(round(col("value") * 100).cast("bigint")).as("value_cents")
          )
        )
        .withColumn("bucket", col("bucket").cast("timestamp_ntz"))),

    // §2.2/22 gap-based sessionization (30 min) + per-session rollup.
    "q_sessionize" -> ((s, dir) =>
      Tables.events(s, dir)
        .sessionize(col("user_id"), col("ts"), 30L * 60 * 1000000)
        .reduceByKey(
          Seq(col("user_id"), col("session_id")),
          Seq(
            count(lit(1)).as("n_events"),
            min(unix_micros(col("ts"))).as("start_us"),
            max(unix_micros(col("ts"))).as("end_us")
          )
        )),

    // §2.2/22z built-in session_window (gap-merge semantics: a new
    // session starts when the gap is >= 30 min — note the strict-less
    // merge, unlike sessionize's <=); cross-checked against an
    // independent lag/cumsum SQL formulation.
    "q_session_window" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"), min(unix_micros(col("ts"))).as("start_us"))
        .mapRecords(col("user_id"), col("start_us"), col("n_events"))),

    // §2.2/22aa ntile quantile bucketing per group.
    "q_ntile" -> ((s, dir) =>
      Tables.orders(s, dir)
        .withColumn("q", ntile(4).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("o_orderpriority"))
            .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)))
        .mapRecords(col("o_orderkey"), col("o_orderpriority"), col("q"))),

    // §2.2/22x TPC-H Q3 (shipping priority): unshipped-order revenue,
    // top 10 — multi-way join, cents-exact revenue, deterministic sort.
    "q_tpch_q3" -> ((s, dir) => {
      val cust = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      val ord = Tables.orders(s, dir).filter(col("o_orderdate") < "1996-06-30")
      val li = Tables.lineitem(s, dir).filter(col("l_shipdate") > "1996-06-30")
        .withColumn("rev_cents", round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100).cast("bigint"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(col("rev_cents")).as("revenue_cents"))
        .topK(10, col("revenue_cents").desc, col("o_orderdate").asc, col("l_orderkey").asc)
        .mapRecords(col("l_orderkey"), col("revenue_cents"),
          col("o_orderdate").cast("string").as("o_orderdate"), col("o_orderpriority"))
    }),

    // §2.2/22y4 TPC-H Q4 (order priority): EXISTS → left-semi join on
    // the fact, then a small agg. The semi join shuffles only matching
    // orderkeys — no lineitem payload survives the probe.
    "q_tpch_q4" -> ((s, dir) => {
      val ord = Tables.orders(s, dir).filter(
        col("o_orderdate") >= "1996-07-01" && col("o_orderdate") < "1996-10-01")
      ord.join(Tables.lineitem(s, dir).select(col("l_orderkey")).distinct(),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
    }),

    // §2.2/22y5 TPC-H Q6 (forecast revenue): pure scan-filter-agg; the
    // three predicates all push to the parquet scan.
    "q_tpch_q6" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1997-01-01"
          && col("l_discount") >= 0.02 && col("l_discount") <= 0.04
          && col("l_quantity") < 10)
        .agg(sum(round(col("l_extendedprice") * col("l_discount") * 100).cast("bigint"))
          .as("revenue_cents"))),

    // §2.2/22y6 TPC-H Q12 (shipmode priority): fact-fact join + CASE
    // aggregation in exact integers.
    "q_tpch_q12" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1997-01-01")
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_linestatus"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
            .as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L).otherwise(1L))
            .as("low_line_count"))),

    // §2.2/22y11 TPC-H Q7 (volume shipping): bidirectional nation-pair
    // trade volume by year; only the constant-size nation dims are
    // broadcast — customer/supplier scale linearly with SF, so their
    // joins shuffle (AQE may still elect broadcast at small SF, which
    // is the right call *at runtime*, not a hard-coded hint).
    "q_tpch_q7" -> ((s, dir) => {
      val n1 = Tables.nation(s, dir).select(col("n_nationkey").as("__sk"), col("n_name").as("supp_nation"))
      val n2 = Tables.nation(s, dir).select(col("n_nationkey").as("__ck"), col("n_name").as("cust_nation"))
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1998-01-01")
        .withColumn("rev_cents",
          round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100).cast("bigint"))
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("s_nationkey") === col("__sk"))
        .join(broadcast(n2), col("c_nationkey") === col("__ck"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"), year(col("l_shipdate")).as("l_year"))
        .agg(sum(col("rev_cents")).as("revenue_cents"))
    }),

    // §2.2/22y12 TPC-H Q8 (market share): NATION_1's share of ASIA's
    // ECONOMY-part import volume per year — one division of exact cent
    // sums per year group.
    "q_tpch_q8" -> ((s, dir) => {
      val asiaNations = Tables.nation(s, dir)
        .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("__ck"))
      val suppNation = Tables.nation(s, dir)
        .select(col("n_nationkey").as("__sk"), col("n_name").as("supp_nation"))
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir).filter(col("p_type") === "ECONOMY")),
          col("l_partkey") === col("p_partkey"))
        .withColumn("rev_cents",
          round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100).cast("bigint"))
        .join(Tables.orders(s, dir).filter(
            col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1998-01-01"),
          col("l_orderkey") === col("o_orderkey"))
        // customer/supplier scale with SF: shuffle joins (AQE decides)
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(asiaNations), col("c_nationkey") === col("__ck"), "left_semi")
        .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(suppNation), col("s_nationkey") === col("__sk"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg((sum(when(col("supp_nation") === "NATION_1", col("rev_cents")).otherwise(0L))
          .cast("double") / sum(col("rev_cents"))).as("mkt_share"))
    }),

    // §2.2/22y13 TPC-H Q15 (top supplier): revenue "view" + global max
    // as a broadcast cross join — no correlated subquery, no collect.
    // The ≤handful of max-revenue winners is the broadcast side of the
    // supplier enrich join (supplier itself scales with SF — stream it).
    "q_tpch_q15" -> ((s, dir) => {
      val rev = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1996-04-01")
        .groupBy(col("l_suppkey"))
        .agg(sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
          .cast("bigint")).as("total_cents"))
      val best = rev.agg(max(col("total_cents")).as("__mx"))
      val winners = rev.crossJoin(broadcast(best))
        .filter(col("total_cents") === col("__mx"))
      Tables.supplier(s, dir)
        .join(broadcast(winners), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_cents"))
    }),

    // §2.2/22y7 TPC-H Q13 (order-count distribution): LEFT join keeps
    // zero-order customers, two stacked aggregations.
    "q_tpch_q13" -> ((s, dir) =>
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))),

    // §2.2/22y8 TPC-H Q14 (promo revenue share): ratio of two exact
    // cent sums — ONE double division, bit-stable.
    "q_tpch_q14" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1996-03-01")
        // unfiltered part scales with SF — no forced broadcast
        .join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
        .withColumn("rev_cents",
          round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100).cast("bigint"))
        .agg((sum(when(col("p_type") === "ECONOMY", col("rev_cents")).otherwise(0L))
          .cast("double") * 100 / sum(col("rev_cents"))).as("promo_share"))),

    // §2.2/22y9 TPC-H Q17 (small-quantity orders): the correlated avg
    // subquery becomes a per-part aggregate joined back; the threshold
    // compares exact integers (5·qty·cnt < sum_qty) — no avg doubles.
    "q_tpch_q17" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val perPart = li.groupBy(col("l_partkey").as("__pk"))
        .agg(sum(col("l_quantity").cast("bigint")).as("__sumq"),
          count(lit(1)).as("__cnt"))
      li.join(broadcast(Tables.part(s, dir).filter(col("p_brand") === "Brand#3")),
          col("l_partkey") === col("p_partkey"))
        .join(perPart, col("l_partkey") === col("__pk"))
        .filter(col("l_quantity").cast("bigint") * 5 * col("__cnt") < col("__sumq"))
        .agg(sum(round(col("l_extendedprice") * 100).cast("bigint")).as("total_cents"))
    }),

    // §2.2/22y10 TPC-H Q19 (disjunctive predicates): OR-of-conjunction
    // pushdown across a broadcast dim join.
    "q_tpch_q19" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        // unfiltered part scales with SF — no forced broadcast
        .join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 5) && col("l_quantity").between(1, 10)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(1, 10) && col("l_quantity").between(5, 20)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) && col("l_quantity").between(10, 30)))
        .agg(sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100).cast("bigint"))
          .as("revenue_cents"))),

    // §2.2/22y0 TPC-H Q1 (pricing summary): the canonical scan+agg —
    // one pass, map-side combined; sums in exact cents, averages as
    // single divisions of exact integers (engine-portable).
    "q_tpch_q1" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= "2000-09-02")
        .withColumn("price_cents", round(col("l_extendedprice") * 100).cast("bigint"))
        .withColumn("disc_cents",
          round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100).cast("bigint"))
        .withColumn("charge_cents",
          round(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * (lit(1.0) + col("l_tax")) * 100).cast("bigint"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("bigint")).as("sum_qty"),
          sum(col("price_cents")).as("sum_base_cents"),
          sum(col("disc_cents")).as("sum_disc_cents"),
          sum(col("charge_cents")).as("sum_charge_cents"),
          (sum(col("l_quantity").cast("bigint")).cast("double") / count(lit(1))).as("avg_qty"),
          (sum(col("price_cents")).cast("double") / count(lit(1))).as("avg_price_cents"),
          count(lit(1)).as("count_order"))),

    // §2.2/22y3 TPC-H Q18 (large-volume orders): aggregate-filter on
    // the fact (HAVING sum(qty) > T), then join the survivors back to
    // orders/customer — the "find the whales, then enrich" pattern.
    // The HAVING runs BEFORE the joins, so only qualifying orderkeys
    // (a tiny set) reach the join.
    "q_tpch_q18" -> ((s, dir) => {
      val big = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity").cast("bigint")).as("total_qty"))
        .filter(col("total_qty") > 150)
      big.join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        // customer scales with SF — shuffle join; at runtime AQE can
        // still broadcast the tiny `big` survivors side instead
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate").cast("string").as("o_orderdate"),
          round(col("o_totalprice") * 100).cast("bigint").as("price_cents"),
          col("total_qty"))
    }),

    // §2.2/22y2 TPC-H Q10 (returned-item report): customers ranked by
    // revenue lost to returns in one quarter. Fact-fact shuffle join
    // on orderkey, broadcast nation dim only (customer scales with SF
    // — that join shuffles; AQE picks broadcast at small SF if it
    // fits), cents-exact revenue, global top-20 via
    // TakeOrderedAndProject.
    "q_tpch_q10" -> ((s, dir) => {
      val ord = Tables.orders(s, dir).filter(
        col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1996-04-01")
      val li = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
        .withColumn("rev_cents",
          round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100).cast("bigint"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(sum(col("rev_cents")).as("revenue_cents"))
        .topK(20, col("revenue_cents").desc, col("c_custkey").asc)
    }),

    // §2.2/22y TPC-H Q5 (local supplier volume): six-way join with
    // broadcast dims, per-nation cents-exact revenue.
    "q_tpch_q5" -> ((s, dir) => {
      val region = Tables.region(s, dir).filter(col("r_name") === "ASIA")
      val nation = Tables.nation(s, dir)
      val li = Tables.lineitem(s, dir)
        .withColumn("rev_cents", round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100).cast("bigint"))
      li.join(Tables.orders(s, dir).filter(
            col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1997-01-01"),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(Tables.supplier(s, dir),
          col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("rev_cents")).as("revenue_cents"))
    }),

    // §2.2/22u trailing z-score anomaly screen over event values.
    "q_zscore" -> ((s, dir) =>
      Tables.events(s, dir)
        .withColumn("cents", round(col("value") * 100).cast("bigint"))
        .movingZScore(col("user_id"), Seq(unix_micros(col("ts")), col("event_id")), col("cents"), lookback = 10)
        .mapRecords(col("event_id"), col("cents"), col("z"))),

    // §2.2/22ba2 per-group OLS trend: slope/intercept of spend-cents
    // over the hour bucket per event type, exact integer numerators +
    // two deterministic double divisions (same order both engines).
    "q_ols_trend" -> ((s, dir) =>
      Tables.events(s, dir)
        .withColumn("cents", round(col("value") * 100).cast("bigint"))
        .withColumn("hour", expr(
          "(unix_micros(ts) div 3600000000L) - " +
            "(CASE WHEN unix_micros(ts) % 3600000000L < 0 THEN 1 ELSE 0 END)"))
        .groupOls(Seq(col("event_type")), col("hour"), col("cents"))),

    // §2.2/22h2 exact weighted (lower) median: median extended price
    // weighted by quantity per return flag — integer-exact, no
    // interpolation, replays on any engine.
    "q_weighted_median" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .withColumn("cents", round(col("l_extendedprice") * 100).cast("bigint"))
        .weightedMedian(Seq(col("l_returnflag")), col("cents"), col("l_quantity"))),

    // §2.2/22v2 exact Gini per source over doc lengths — the corpus
    // balance audit in integer per-mille.
    "q_gini" -> ((s, dir) =>
      Tables.documents(s, dir)
        .giniByGroup(Seq(col("source")), col("n_chars"))),

    // §2.2/22v fixed-width histogram of order totals per priority.
    "q_histogram" -> ((s, dir) =>
      Tables.orders(s, dir)
        .withColumn("cents", round(col("o_totalprice") * 100).cast("bigint"))
        .histogram(Seq(col("o_orderpriority")), col("cents"), binWidth = 2000000L)),

    // §2.2/22w Pearson correlation from exact integral sums.
    "q_corr" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .withColumn("qty", col("l_quantity").cast("bigint"))
        .withColumn("dollars", round(col("l_extendedprice")).cast("bigint"))
        .pearson(Seq(col("l_returnflag")), col("qty"), col("dollars"))),

    // §2.2/22w2 Spearman rank correlation per lang: monotone
    // association between doc length in chars and in tokens —
    // tie-averaged integer ranks (the aucExact 2× identity), decimal
    // sums, doubles only at the final sqrt/divide.
    "q_spearman" -> ((s, dir) =>
      Tables.documents(s, dir)
        .withColumn("toks", size(split(trim(col("text")), "\\s+")).cast("long"))
        .spearman(Seq(col("lang")), col("n_chars"), col("toks"))),

    // §2.2/22ab weekly cohort retention over events.
    "q_retention" -> ((s, dir) =>
      Tables.events(s, dir)
        .retention(col("user_id"), unix_micros(col("ts")), periodUs = 604800000000L)),

    // §2.2/22s ordered conversion funnel (signup → click → purchase).
    "q_funnel" -> ((s, dir) =>
      Tables.events(s, dir)
        .funnel(col("user_id"), unix_micros(col("ts")), col("event_type"),
          Seq("signup", "click", "purchase"))),

    // §2.2/22s2 multi-touch attribution: credit for each purchase to
    // the click/view/signup touches in the 24 h before it — first /
    // last / linear models in one pass, all exact integers (linear =
    // 1000000 div n micro-credits). Bucketed range join + one
    // conversion-keyed window; see TemporalJoins.attribution.
    "q_attribution" -> ((s, dir) =>
      graft.operators.TemporalJoins.attribution(Tables.events(s, dir),
        col("user_id"), col("event_type"), unix_micros(col("ts")), col("event_id"),
        convType = "purchase", touchTypes = Seq("click", "view", "signup"),
        windowUs = 86400000000L, bucketUs = 86400000000L)),

    // §2.2/22t deterministic hash sample (reproducible 25% subset).
    "q_sample" -> ((s, dir) =>
      Tables.documents(s, dir)
        .sampleByHash(col("doc_id"), 25)
        .mapRecords(col("doc_id"), col("source"))),

    // §2.1/15-adjacent: jsonl record parsing as a first-class column op
    // (shmr's default orjson deser_fn → get_json_object).
    "q_json_extract" -> ((s, dir) =>
      Tables.events(s, dir).mapRecords(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k")
      ))
  )

  val oracleSql: Map[String, String] = Map(
    "q_star_join" ->
      """SELECT r_name, n_name,
        |       CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
        |       count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,
    "q_window" ->
      """SELECT o_custkey, o_orderkey, o_totalprice
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |             row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |      FROM orders) WHERE rn <= 3""".stripMargin,
    "q_session_window" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS us,
        |         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 30*60*1000000 THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts))
        |), s AS (
        |  SELECT user_id, us,
        |         sum(brk) OVER (PARTITION BY user_id ORDER BY us
        |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM e
        |)
        |SELECT user_id, CAST(min(us) AS BIGINT) AS start_us, CAST(count(*) AS BIGINT) AS n_events
        |FROM s GROUP BY user_id, sid""".stripMargin,
    "q_ntile" ->
      """SELECT o_orderkey, o_orderpriority,
        |       ntile(4) OVER (PARTITION BY o_orderpriority
        |                      ORDER BY o_totalprice ASC, o_orderkey ASC) AS q
        |FROM orders""".stripMargin,
    "q_tpch_q3" ->
      """SELECT l_orderkey,
        |       CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
        |       CAST(o_orderdate AS VARCHAR) AS o_orderdate, o_orderpriority
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND o_orderdate < DATE '1996-06-30' AND l_shipdate > DATE '1996-06-30'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue_cents DESC, o_orderdate ASC, l_orderkey ASC
        |LIMIT 10""".stripMargin,
    "q_rank_funcs" ->
      """SELECT o_custkey, o_orderkey,
        |       percent_rank() OVER w AS pct_rank,
        |       cume_dist() OVER w AS cume,
        |       lag(CAST(round(o_totalprice * 100) AS BIGINT), 1) OVER w AS prev_cents,
        |       first_value(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w AS min_cents
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice ASC, o_orderkey ASC)""".stripMargin,
    "q_tpch_q7" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |       CAST(year(l_shipdate) AS INT) AS l_year,
        |       CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem, orders, customer, supplier, nation n1, nation n2
        |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey AND l_suppkey = s_suppkey
        |  AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
        |  AND l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1998-01-01'
        |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |GROUP BY 1, 2, 3""".stripMargin,
    "q_tpch_q8" ->
      """WITH j AS (
        |  SELECT CAST(year(o_orderdate) AS INT) AS o_year, n2.n_name AS supp_nation,
        |         CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT) AS rev_cents
        |  FROM lineitem, part, orders, customer, supplier, nation n1, region, nation n2
        |  WHERE l_partkey = p_partkey AND l_orderkey = o_orderkey AND o_custkey = c_custkey
        |    AND l_suppkey = s_suppkey AND c_nationkey = n1.n_nationkey
        |    AND n1.n_regionkey = r_regionkey AND r_name = 'ASIA'
        |    AND s_nationkey = n2.n_nationkey AND p_type = 'ECONOMY'
        |    AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1998-01-01')
        |SELECT o_year,
        |       CAST(SUM(CASE WHEN supp_nation = 'NATION_1' THEN rev_cents ELSE 0 END) AS DOUBLE)
        |       / SUM(rev_cents) AS mkt_share
        |FROM j GROUP BY o_year""".stripMargin,
    "q_tpch_q15" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |         CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS total_cents
        |  FROM lineitem
        |  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_cents
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_cents = (SELECT max(total_cents) FROM rev)""".stripMargin,
    "q_tpch_q13" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey)
        |GROUP BY c_count""".stripMargin,
    "q_tpch_q14" ->
      """WITH j AS (
        |  SELECT p_type,
        |         CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT) AS rev_cents
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-03-01')
        |SELECT CAST(SUM(CASE WHEN p_type = 'ECONOMY' THEN rev_cents ELSE 0 END) AS DOUBLE) * 100
        |       / SUM(rev_cents) AS promo_share
        |FROM j""".stripMargin,
    "q_tpch_q17" ->
      """WITH pp AS (
        |  SELECT l_partkey AS pk,
        |         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sumq,
        |         count(*) AS cnt
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |JOIN pp ON l_partkey = pk
        |WHERE p_brand = 'Brand#3' AND CAST(l_quantity AS BIGINT) * 5 * cnt < sumq""".stripMargin,
    "q_tpch_q19" ->
      """SELECT CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 10)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 5 AND 20)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 10 AND 30)""".stripMargin,
    "q_tpch_q4" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= DATE '1996-07-01' AND o_orderdate < DATE '1996-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
        |GROUP BY o_orderpriority""".stripMargin,
    "q_tpch_q6" ->
      """SELECT CAST(SUM(CAST(round(l_extendedprice * l_discount * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem
        |WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
        |  AND l_discount BETWEEN 0.02 AND 0.04 AND l_quantity < 10""".stripMargin,
    "q_tpch_q12" ->
      """SELECT l_linestatus,
        |       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
        |GROUP BY l_linestatus""".stripMargin,
    "q_tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
        |       CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
        |       CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) * 100) AS BIGINT)) AS BIGINT) AS sum_charge_cents,
        |       CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / count(*) AS avg_qty,
        |       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / count(*) AS avg_price_cents,
        |       count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= DATE '2000-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q_tpch_q18" ->
      """WITH big AS (
        |  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING SUM(CAST(l_quantity AS BIGINT)) > 150)
        |SELECT c_name, c_custkey, o_orderkey,
        |       CAST(o_orderdate AS VARCHAR) AS o_orderdate,
        |       CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
        |       total_qty
        |FROM big JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey""".stripMargin,
    "q_tpch_q10" ->
      """SELECT c_custkey, c_name, n_name,
        |       CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM customer, orders, lineitem, nation
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-04-01'
        |  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue_cents DESC, c_custkey ASC
        |LIMIT 20""".stripMargin,
    "q_tpch_q5" ->
      """SELECT n_name,
        |       CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
        |  AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
        |GROUP BY n_name""".stripMargin,
    "q_weighted_median" ->
      """WITH b AS (
        |  SELECT l_returnflag, CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
        |         CAST(l_quantity AS BIGINT) AS w
        |  FROM lineitem),
        |pv AS (SELECT l_returnflag, v, CAST(sum(w) AS BIGINT) AS wv FROM b GROUP BY 1, 2),
        |c AS (SELECT l_returnflag, v,
        |             CAST(sum(wv) OVER (PARTITION BY l_returnflag ORDER BY v
        |                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
        |             CAST(sum(wv) OVER (PARTITION BY l_returnflag) AS BIGINT) AS tot
        |      FROM pv)
        |SELECT l_returnflag, CAST(min(v) AS BIGINT) AS wmedian,
        |       CAST(max(tot) AS BIGINT) AS total_w
        |FROM c WHERE cum * 2 >= tot GROUP BY l_returnflag""".stripMargin,
    "q_gini" ->
      """WITH b AS (SELECT source, CAST(n_chars AS BIGINT) AS x FROM documents),
        |r AS (SELECT source, x, row_number() OVER (PARTITION BY source ORDER BY x) AS i FROM b),
        |s AS (SELECT source, CAST(count(*) AS BIGINT) AS n, sum(x) AS sx,
        |             sum(CAST(i AS HUGEINT) * x) AS six
        |      FROM r GROUP BY source)
        |SELECT source, n,
        |       CASE WHEN sx <= 0 THEN NULL
        |            ELSE CAST((1000 * (2 * six - (n + 1) * sx)) // (n * sx) AS BIGINT) END AS gini_pm
        |FROM s""".stripMargin,
    "q_ols_trend" ->
      """WITH e AS (
        |  SELECT event_type,
        |         ((epoch_us(ts) // 3600000000) - CASE WHEN epoch_us(ts) % 3600000000 < 0 THEN 1 ELSE 0 END) AS x,
        |         CAST(round(value * 100) AS BIGINT) AS y
        |  FROM events),
        |c AS (SELECT event_type, x, y, min(x) OVER (PARTITION BY event_type) AS x0 FROM e),
        |s AS (SELECT event_type, x0,
        |             CAST(count(*) AS BIGINT) AS n,
        |             CAST(sum(x - x0) AS BIGINT) AS sx,
        |             CAST(sum(y) AS BIGINT) AS sy,
        |             CAST(sum((x - x0) * y) AS BIGINT) AS sxy,
        |             CAST(sum((x - x0) * (x - x0)) AS BIGINT) AS sxx
        |      FROM c GROUP BY 1, 2)
        |SELECT event_type, x0, n,
        |       CASE WHEN n * sxx - sx * sx = 0 THEN NULL
        |            ELSE CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE) END AS slope,
        |       CASE WHEN n * sxx - sx * sx = 0 THEN NULL
        |            ELSE (CAST(sy AS DOUBLE)
        |                  - (CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE))
        |                    * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) END AS intercept,
        |       n * sxy - sx * sy AS sxy_num,
        |       n * sxx - sx * sx AS sxx_num
        |FROM s""".stripMargin,
    "q_zscore" ->
      """WITH e AS (
        |  SELECT event_id, epoch_us(ts) AS us, user_id,
        |         CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events
        |), w AS (
        |  SELECT event_id, cents,
        |         count(*) OVER win AS n,
        |         CAST(sum(cents) OVER win AS BIGINT) AS s,
        |         CAST(sum(cents * cents) OVER win AS BIGINT) AS ss
        |  FROM e
        |  WINDOW win AS (PARTITION BY user_id ORDER BY us, event_id
        |                 ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)
        |)
        |SELECT event_id, cents,
        |       (CAST(cents AS DOUBLE) - CAST(s AS DOUBLE) / n) /
        |         sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / (CAST(n AS DOUBLE) - 1.0)) AS z
        |FROM w
        |WHERE n >= 2 AND (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) > 0.0""".stripMargin,
    "q_histogram" ->
      """SELECT o_orderpriority, CAST(round(o_totalprice * 100) AS BIGINT) // 2000000 AS bin,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM orders GROUP BY 1, 2""".stripMargin,
    "q_corr" ->
      """WITH b AS (
        |  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty,
        |         CAST(round(l_extendedprice) AS BIGINT) AS dollars
        |  FROM lineitem
        |), s AS (
        |  SELECT l_returnflag,
        |         CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(qty) AS BIGINT) AS sx, CAST(sum(dollars) AS BIGINT) AS sy,
        |         CAST(sum(qty * dollars) AS BIGINT) AS sxy,
        |         CAST(sum(qty * qty) AS BIGINT) AS sxx,
        |         CAST(sum(dollars * dollars) AS BIGINT) AS syy
        |  FROM b GROUP BY l_returnflag
        |)
        |SELECT l_returnflag, n,
        |       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |       (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
        |        sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS r
        |FROM s""".stripMargin,
    "q_spearman" ->
      raw"""WITH b AS (
           |  SELECT lang, n_chars AS x,
           |         CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS y
           |  FROM documents
           |), r AS (
           |  SELECT lang,
           |         2 * rank() OVER (PARTITION BY lang ORDER BY x)
           |           + count(*) OVER (PARTITION BY lang, x) - 1 AS rx,
           |         2 * rank() OVER (PARTITION BY lang ORDER BY y)
           |           + count(*) OVER (PARTITION BY lang, y) - 1 AS ry
           |  FROM b
           |), a AS (
           |  SELECT lang, count(*) AS n, sum(rx) AS sx, sum(ry) AS sy,
           |         sum(rx * ry) AS sxy, sum(rx * rx) AS sxx, sum(ry * ry) AS syy
           |  FROM r GROUP BY lang
           |)
           |SELECT lang, CAST(n AS BIGINT) AS n,
           |       CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0 THEN NULL
           |            ELSE CAST(n * sxy - sx * sy AS DOUBLE) /
           |                 (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
           |                  sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
           |       END AS rho
           |FROM a""".stripMargin,
    "q_retention" ->
      """WITH ev AS (SELECT DISTINCT user_id AS e, epoch_us(ts) // 604800000000 AS p FROM events),
        |c AS (SELECT e, min(p) AS c FROM ev GROUP BY e)
        |SELECT c.c AS cohort, ev.p - c.c AS week_offset, CAST(count(*) AS BIGINT) AS users
        |FROM ev JOIN c ON ev.e = c.e
        |GROUP BY cohort, week_offset""".stripMargin,
    "q_funnel" ->
      """WITH ev AS (SELECT user_id AS e, epoch_us(ts) AS t, event_type AS s FROM events),
        |r1 AS (SELECT e, min(t) AS t FROM ev WHERE s = 'signup' GROUP BY e),
        |r2 AS (SELECT ev.e, min(ev.t) AS t FROM ev JOIN r1 ON ev.e = r1.e AND ev.t > r1.t
        |       WHERE ev.s = 'click' GROUP BY ev.e),
        |r3 AS (SELECT ev.e, min(ev.t) AS t FROM ev JOIN r2 ON ev.e = r2.e AND ev.t > r2.t
        |       WHERE ev.s = 'purchase' GROUP BY ev.e)
        |SELECT 'signup' AS stage, CAST(count(*) AS BIGINT) AS entities FROM r1
        |UNION ALL SELECT 'click', CAST(count(*) AS BIGINT) FROM r2
        |UNION ALL SELECT 'purchase', CAST(count(*) AS BIGINT) FROM r3""".stripMargin,
    "q_attribution" ->
      """WITH conv AS (
        |  SELECT user_id AS u, epoch_us(ts) AS cts, event_id AS cid
        |  FROM events WHERE event_type = 'purchase'
        |), touch AS (
        |  SELECT user_id AS u, event_type AS channel, epoch_us(ts) AS tts, event_id AS tid
        |  FROM events WHERE event_type IN ('click', 'view', 'signup')
        |), pairs AS (
        |  SELECT c.cid, t.channel, t.tts, t.tid
        |  FROM conv c JOIN touch t
        |    ON c.u = t.u AND t.tts >= c.cts - 86400000000 AND t.tts <= c.cts - 1
        |), tagged AS (
        |  SELECT channel,
        |         count(*) OVER (PARTITION BY cid) AS n,
        |         row_number() OVER (PARTITION BY cid ORDER BY tts, tid) AS rn
        |  FROM pairs
        |)
        |SELECT channel,
        |       CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS first_touch,
        |       CAST(sum(CASE WHEN rn = n THEN 1 ELSE 0 END) AS BIGINT) AS last_touch,
        |       CAST(count(*) AS BIGINT) AS n_pairs,
        |       CAST(sum(1000000 // n) AS BIGINT) AS linear_micro
        |FROM tagged GROUP BY channel""".stripMargin,
    "q_sample" ->
      """SELECT doc_id, source FROM documents
        |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 25""".stripMargin,
    "q_group_topk" ->
      """SELECT o_custkey, o_orderkey, o_totalprice
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |             row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |      FROM orders) WHERE rn <= 3""".stripMargin,
    "q_topk" ->
      """SELECT o_custkey, count(*) AS n FROM orders
        |GROUP BY 1 ORDER BY n DESC, o_custkey ASC LIMIT 5""".stripMargin,
    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "q_anti_join" ->
      """SELECT p_partkey, p_name FROM part
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem
        |                  WHERE l_partkey = p_partkey AND l_quantity > 48)""".stripMargin,
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |       count(*) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,
    "q_time_bucket" ->
      """SELECT date_trunc('hour', ts) AS bucket, event_type,
        |       count(*) AS n,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, ts,
        |         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |              THEN 1 ELSE 0 END AS is_new
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |), sessions AS (
        |  SELECT user_id, ts,
        |         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM flagged
        |)
        |SELECT user_id, session_id, count(*) AS n_events,
        |       min(epoch_us(ts)) AS start_us, max(epoch_us(ts)) AS end_us
        |FROM sessions GROUP BY user_id, session_id""".stripMargin,
    "q_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
        |FROM events""".stripMargin
  )
}
