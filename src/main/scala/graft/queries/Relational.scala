package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import Tables._

/** The standard relational query surface (SURVEY.md §2.7): aggregations,
  * joins (broadcast/shuffle/semi/anti), windows, sort/limit, set ops,
  * grouping sets, scalar functions — each Spark-first with a DuckDB
  * oracle twin.
  *
  * Scale notes baked into each plan:
  *  - dimension joins (region/nation/customer/part) are broadcast,
  *  - aggregations are partial (map-side) by construction (groupBy.agg),
  *  - double sums go through decimal so results are independent of
  *    partition/merge order (required for oracle equality AND for
  *    determinism on a 1000-executor cluster).
  */
object Relational {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "r01_pricing_summary" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0d) - col("l_discount")), 6)
            .as("sum_disc_price"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_discount"), 4).as("avg_disc"),
          cnt.as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    "r02_topk_orders" -> { (s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
    },
    "r03_segment_revenue" -> { (s, dir) =>
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(
          dsum(col("l_extendedprice") * (lit(1.0d) - col("l_discount")), 6)
            .as("revenue"),
          cnt.as("n_rows"))
        .orderBy(col("c_mktsegment"))
    },
    "r04_brand_volume" -> { (s, dir) =>
      val p = t(s, dir, "part")
      val l = t(s, dir, "lineitem")
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(dsum(col("l_quantity")).as("sum_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          cnt.as("n"))
        .orderBy(col("p_brand"))
    },
    "r05_customers_with_orders" -> { (s, dir) =>
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    },
    "r06_customers_without_orders" -> { (s, dir) =>
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        .orderBy(col("c_custkey"))
    },
    "r07_top3_orders_per_customer" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          col("rk"))
        .orderBy(col("o_custkey"), col("rk"))
    },
    "r08_running_user_value" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      t(s, dir, "events")
        .withColumn("running_value",
          sum(col("value").cast(DecimalType(20, 2))).over(w).cast("double"))
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("running_value"))
        .orderBy(col("user_id"), col("event_id"))
    },
    "r09_rollup_volume" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(cnt.as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(asc_nulls_first("l_returnflag"),
          asc_nulls_first("l_linestatus"))
    },
    // r10/r11 (set ops), r16 (fact join), r34 (keyed scalar subquery)
    // and r72 (cohort) read their fact tables through Tables.bucketed —
    // the one-time hash-bucketed store copies (r68's ingest-time
    // clustering generalized): the custkey/orderkey/user_id exchanges
    // that dominated these sub-second cells disappear because the scan
    // itself reports the required HashPartitioning. Same rows, same
    // oracles — bucketing must never change a result.
    "r10_setops_custkeys" -> { (s, dir) =>
      val c = Tables.bucketed(s, dir, "customer", "c_custkey")
      val o = Tables.bucketed(s, dir, "orders", "o_custkey")
      val building = c.filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("custkey"))
      val big = o.filter(col("o_totalprice") > 150000.0d)
        .select(col("o_custkey").as("custkey"))
      val negative = c.filter(col("c_acctbal") < 0.0d)
        .select(col("c_custkey").as("custkey"))
      building.union(big).distinct().except(negative).orderBy(col("custkey"))
    },
    "r11_intersect_custkeys" -> { (s, dir) =>
      val c = Tables.bucketed(s, dir, "customer", "c_custkey")
      val o = Tables.bucketed(s, dir, "orders", "o_custkey")
      o.select(col("o_custkey").as("custkey"))
        .intersect(c.filter(col("c_acctbal") > 5000.0d)
          .select(col("c_custkey").as("custkey")))
        .orderBy(col("custkey"))
    },
    "r12_scalar_functions" -> { (s, dir) =>
      t(s, dir, "orders")
        .filter(col("o_orderkey") % 100 === 0)
        .select(
          col("o_orderkey"),
          upper(col("o_orderpriority")).as("pri_upper"),
          substring(col("o_orderpriority"), 1, 1).as("pri_code"),
          concat(col("o_orderstatus"), lit("-"), col("o_orderpriority"))
            .as("status_pri"),
          year(col("o_orderdate")).cast("long").as("order_year"),
          month(col("o_orderdate")).cast("long").as("order_month"),
          round(col("o_totalprice"), 0).as("price_rounded"),
          abs(col("o_totalprice") - lit(100000.0d)).as("price_dist"),
          length(col("o_orderpriority")).cast("long").as("pri_len"))
        .orderBy(col("o_orderkey"))
    },
    "r13_conditional_agg" -> { (s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          sum(when(col("o_orderpriority").startsWith("1"), 1L).otherwise(0L))
            .as("n_urgent"),
          sum(when(col("o_totalprice") > 100000.0d, 1L).otherwise(0L))
            .as("n_big"),
          cnt.as("n"))
        .orderBy(col("o_orderstatus"))
    },
    "r14_distinct_agg" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"),
          cnt.as("n"))
        .orderBy(col("l_returnflag"))
    },
    "r15_repeat_customers" -> { (s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(cnt.as("n_orders"), dsum(col("o_totalprice")).as("total_spent"))
        .filter(col("n_orders") >= 15)
        .orderBy(col("o_custkey"))
    },
    "r16_nation_revenue" -> { (s, dir) =>
      val r = t(s, dir, "region")
      val n = t(s, dir, "nation")
      val c = t(s, dir, "customer")
      // the one non-broadcast join: both fact sides bucketed on the
      // order key, so the big l ⋈ o runs exchange-free off the scans
      val o = Tables.bucketed(s, dir, "orders", "o_orderkey")
      val l = Tables.bucketed(s, dir, "lineitem", "l_orderkey")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(dsum(col("l_extendedprice")).as("rev"), cnt.as("n_items"))
        .orderBy(col("r_name"), col("n_name"))
    },
    "r17_monthly_orders" -> { (s, dir) =>
      t(s, dir, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).as("month_start"))
        .agg(cnt.as("n_orders"), dsum(col("o_totalprice")).as("volume"))
        .orderBy(col("month_start"))
    },
    "r18_event_hourly" -> { (s, dir) =>
      t(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hour_start"),
          col("event_type"))
        .agg(cnt.as("n"), dsum(col("value")).as("total_value"))
        .orderBy(col("hour_start"), col("event_type"))
    },
    "r19_props_extract" -> { (s, dir) =>
      t(s, dir, "events")
        .select(col("event_id"),
          regexp_extract(col("props"), "\"k\": ([0-9]+)", 1).cast("long")
            .as("k"))
        .filter(col("k") % 10 === 0)
        .orderBy(col("event_id"))
    },
    "r20_pivot_qty" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_linestatus"))
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(sum(col("l_quantity").cast(DecimalType(20, 2))))
        .select(col("l_linestatus"),
          col("A").cast("double").as("qty_a"),
          col("N").cast("double").as("qty_n"),
          col("R").cast("double").as("qty_r"))
        .orderBy(col("l_linestatus"))
    },
    // R1/R2 latest-version dedup pattern (SURVEY.md §2.4) applied to the
    // events stream: argmax ts per user via one window shuffle
    "r22_latest_events" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      t(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
        .select(col("user_id"), col("event_id"), col("ts"),
          col("event_type"), col("value"))
        .orderBy(col("user_id"))
    },
    // V6-style flatten applied to text: inverted-index term statistics.
    // The within-document combine is FUSED into the scan (tokenize_tf
    // emits one map<token,tf> entry per distinct token per doc — the
    // codegen'd twin of explode + groupBy(token, doc_id)), so the only
    // aggregation keys directly on the vocabulary over per-doc
    // pre-counts; the raw occurrence stream never leaves the row.
    // countDistinct stays banished for the same reason as before: its
    // Expand plan would funnel raw rows through the 31 hot token keys
    // (measured 11 s vs 2 s at a 10× corpus).
    "r23_top_tokens" -> { (s, dir) =>
      val base = t(s, dir, "documents")
      val perDoc =
        if (s.catalog.functionExists("tokenize_tf"))
          base.selectExpr("doc_id",
            "explode(tokenize_tf(text)) as (token, n_in_doc)")
        else // composable twin when the extension isn't installed
          base.selectExpr("doc_id",
              "explode(split(trim(lower(text)), '\\\\s+')) as token")
            .groupBy(col("token"), col("doc_id")).agg(cnt.as("n_in_doc"))
      perDoc
        .groupBy(col("token"))
        .agg(sum(col("n_in_doc")).as("n"), cnt.as("n_docs"))
        .orderBy(col("n").desc, col("token"))
    },
    // correlated scalar subquery (Catalyst decorrelates it into a
    // join-aggregate): customers spending > 2× their segment's average.
    // Exact decimal arithmetic end-to-end so the correlated average is
    // engine-independent.
    "r34_scalar_subquery" -> { (s, dir) =>
      // Spark INLINES the shared CTE `j` into both the outer query and
      // the decorrelated correlated subquery, so the one-text form pays
      // the orders aggregation + customer join twice per run. Build `j`
      // once (same expressions verbatim), cache it, and run the
      // correlated compare over the cached frame — the oracle still
      // replays the single full r34Sql text, so the split is
      // hash-checked identical (the r47/r77 precedent).
      val j = Shared.temp(
        Tables.bucketed(s, dir, "customer", "c_custkey")
          .join(Tables.bucketed(s, dir, "orders", "o_custkey")
              .groupBy("o_custkey")
              .agg(expr("CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(20,2))) AS STRING) AS DOUBLE)").as("spend")),
            col("c_custkey") === col("o_custkey"))
          .select("c_custkey", "c_mktsegment", "spend"))
      j.createOrReplaceTempView("__j_r34")
      s.sql(
        """SELECT c_custkey, c_mktsegment, spend FROM __j_r34 a
          |WHERE spend > 2 * (
          |  SELECT CAST(CAST(SUM(CAST(spend AS DECIMAL(20,2))) AS STRING) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
          |  FROM __j_r34 b WHERE b.c_mktsegment = a.c_mktsegment)
          |ORDER BY c_custkey""".stripMargin)
    },
    // explicit window frame: 4-row moving average per user (decimal
    // accumulation inside the frame for cross-engine exactness)
    "r32_moving_average" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        .rowsBetween(-3, 0)
      t(s, dir, "events")
        .filter(col("user_id") < 10)
        .withColumn("ma4",
          (sum(col("value").cast(DecimalType(20, 2))).over(w).cast("double") /
            count(lit(1)).over(w).cast("double")))
        .select(col("user_id"), col("event_id"), col("value"), col("ma4"))
        .orderBy(col("user_id"), col("event_id"))
    },
    // lag/lead: inter-event gap seconds and next event type per user
    "r33_event_gaps" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      t(s, dir, "events")
        .filter(col("user_id") < 10)
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("gap_us",
          expr("unix_micros(ts) - unix_micros(prev_ts)"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .select(col("user_id"), col("event_id"), col("gap_us"), col("next_type"))
        .orderBy(col("user_id"), col("event_id"))
    },
    // the SQL front door: the same engine drives spark.sql text over
    // registered views (what a SQL-first user of the library sees)
    "r31_sql_interface" -> { (s, dir) =>
      t(s, dir, "orders").createOrReplaceTempView("v_orders")
      t(s, dir, "customer").createOrReplaceTempView("v_customer")
      s.sql("""
        SELECT c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(20,2))) AS STRING) AS DOUBLE) AS volume
        FROM v_orders JOIN v_customer ON o_custkey = c_custkey
        WHERE o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
        GROUP BY c_mktsegment ORDER BY c_mktsegment""")
    },
    // date/interval arithmetic suite
    "r29_date_arithmetic" -> { (s, dir) =>
      t(s, dir, "orders")
        .filter(col("o_orderkey") % 50 === 0)
        .selectExpr("o_orderkey",
          "timestampadd(DAY, 30, o_orderdate) as ship_deadline",
          "cast(datediff(o_orderdate, DATE '1990-01-01') as bigint) as days_since_1990",
          "cast(quarter(o_orderdate) as bigint) as q",
          "cast(weekofyear(o_orderdate) as bigint) as iso_week",
          "cast(dayofweek(o_orderdate) - 1 as bigint) as dow_sun0",
          "cast(last_day(o_orderdate) as timestamp) as month_end")
        .orderBy("o_orderkey")
    },
    // per-group ordered collection folded to scalars (collect_set /
    // array_join — one shuffle with partial aggregation)
    "r30_customer_year_profile" -> { (s, dir) =>
      t(s, dir, "orders")
        .selectExpr("o_custkey", "cast(year(o_orderdate) as bigint) as y",
          "o_totalprice")
        .groupBy("o_custkey")
        .agg(
          expr("array_join(sort_array(collect_set(y)), ',')").as("years_csv"),
          countDistinct(col("y")).as("n_years"),
          min(col("y")).as("first_year"),
          max(col("y")).as("last_year"),
          dsum(col("o_totalprice")).as("lifetime_value"))
        .orderBy("o_custkey")
    },
    // full CUBE with grouping_id disambiguation (NULL group vs NULL key)
    "r27_cube_volume" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().cast("long").as("gid"), cnt.as("n"),
          dsum(col("l_extendedprice")).as("volume"))
        .orderBy(col("gid"), asc_nulls_first("l_returnflag"),
          asc_nulls_first("l_linestatus"))
    },
    // JSON-path extraction from the events props payload
    "r28_json_path" -> { (s, dir) =>
      t(s, dir, "events")
        .selectExpr("event_id",
          "get_json_object(props, '$.k') as k_str",
          "cast(get_json_object(props, '$.k') as bigint) as k_num")
        .filter("k_num % 7 = 0")
        .orderBy("event_id")
    },
    // salted join over a pathologically skewed key (31 distinct tokens
    // across every document): the per-token dimension is replicated
    // ×16 with a salt column and the probe side keys on
    // (token, doc_id%16), spreading each hot key over 16 reducers —
    // the manual skew-mitigation pattern for when AQE's skew-join can't
    // help (e.g. aggregation-after-join). Result is provably identical
    // to the unsalted join, which is what the oracle computes.
    "r26_salted_token_join" -> { (s, dir) =>
      val Salts = 16
      val tok = t(s, dir, "documents")
        .selectExpr("doc_id", "explode(split(trim(lower(text)), '\\\\s+')) as token")
      val dim = tok.groupBy("token").agg(cnt.as("tok_freq"))
      val saltedDim = dim.selectExpr("token", "tok_freq",
        s"explode(sequence(0, ${Salts - 1})) as salt")
      tok.selectExpr("doc_id", "token", s"cast(doc_id % $Salts as int) as salt")
        .join(saltedDim, Seq("token", "salt"))
        .groupBy("doc_id")
        .agg(sum(col("tok_freq")).as("popularity"), cnt.as("n_tokens"))
        .orderBy("doc_id")
    },
    // rows-only (approximate — no exact oracle by construction)
    "r47_recursive_cte" -> { (s, dir) =>
      // the UnionLoop re-plans this relation EVERY iteration: a full
      // corpus-width scan (minPartitionNum tasks) per round is pure
      // overhead for a ~10-round recursion. Pre-project the one needed
      // column and cache it narrow so each round reads a 2-partition
      // in-memory relation (measured 2.6s → <1s at sf0.1); at real
      // scale the recursion input would be pre-filtered the same way.
      Shared.shared(s, dir, "docs_r47") {
        t(s, dir, "documents").select("doc_id").coalesce(2)
      }.createOrReplaceTempView("__docs_r47")
      s.sql(r47Sql("__docs_r47"))
    },
    // explicit GROUPING SETS — an arbitrary set list, not the rollup
    // (r09) / cube (r27) lattices: (flag, status), (flag), (status),
    // each tagged via grouping_id for disambiguation
    "r48_grouping_sets" -> { (s, dir) =>
      t(s, dir, "lineitem").createOrReplaceTempView("__li_r48")
      s.sql(
        """SELECT l_returnflag, l_linestatus,
          |  CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid,
          |  CAST(COUNT(*) AS BIGINT) AS n,
          |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(20,2))) AS STRING) AS DOUBLE) AS sum_qty
          |FROM __li_r48
          |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), (l_linestatus))
          |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)
    },
    // FULL OUTER join of two aggregates with disjoint-but-overlapping
    // key ranges — both sides keep unmatched keys (the one outer-join
    // variant the rest of the surface doesn't exercise). Aggregates are
    // tiny post-shuffle; the join is effectively broadcastable, and the
    // COALESCE presentation is the standard reconciliation-report shape.
    "r44_full_outer" -> { (s, dir) =>
      val c = t(s, dir, "customer").filter(col("c_nationkey") < 15)
        .groupBy(col("c_nationkey").as("nk")).agg(cnt.as("n_cust"))
      val sup = t(s, dir, "supplier").filter(col("s_nationkey") > 9)
        .groupBy(col("s_nationkey").as("nk")).agg(cnt.as("n_supp"))
      c.join(sup, Seq("nk"), "full_outer")
        .selectExpr("nk",
          "coalesce(n_cust, cast(0 as bigint)) as n_cust",
          "coalesce(n_supp, cast(0 as bigint)) as n_supp")
        .orderBy("nk")
    },
    // exact per-group percentiles with SQL-standard percentile_disc
    // semantics, hand-rolled (row ceil(p*n) of the value-ordered group)
    // so both engines pick the same physical row — built-in quantile
    // functions differ in index conventions across engines. Partitioned
    // ranking window: scales with groups.
    "r42_group_percentiles" -> { (s, dir) =>
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("c_acctbal"), col("c_custkey"))
      t(s, dir, "customer")
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("n", cnt.over(Window.partitionBy("c_mktsegment")))
        .selectExpr("c_mktsegment", "c_acctbal", "rn", "n",
          "explode(array(0.25d, 0.5d, 0.75d)) as p")
        .filter(col("rn") === ceil(col("p") * col("n")))
        .select(col("c_mktsegment"), col("p"), col("c_acctbal").as("pval"))
        .orderBy("c_mktsegment", "p")
    },
    "r21_approx_distinct" -> { (s, dir) =>
      // scalar columns only: the driver's rows-only compare sorts the
      // result in pandas, which cannot sort array cells
      t(s, dir, "lineitem")
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
          approx_count_distinct(col("l_orderkey")).as("approx_orders"),
          expr("approx_percentile(l_extendedprice, array(0.5, 0.95), 1000)")
            .as("__p"))
        .select(col("approx_parts"), col("approx_orders"),
          element_at(col("__p"), 1).as("price_p50"),
          element_at(col("__p"), 2).as("price_p95"))
    },

    // ordered string aggregation (Spark 4 LISTAGG WITHIN GROUP ≡ DuckDB
    // string_agg ORDER BY): deterministic because the intra-group order
    // is total (n_name unique per region); broadcast dim join, one
    // partial-aggregated shuffle on the 5 groups
    "r49_ordered_listagg" -> { (s, dir) =>
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(expr("listagg(n_name, ',') within group (order by n_name)")
          .as("nations"), cnt.as("n_nations"))
        .orderBy("r_name")
    },

    // interpolated percentiles (PERCENTILE_CONT WITHIN GROUP — the
    // continuous sibling of r42's percentile_disc): per-priority p50/p90
    // of order value; 6-dp presentation rounding absorbs any last-ulp
    // difference in the two engines' interpolation expression shape
    "r50_percentile_cont" -> { (s, dir) =>
      t(s, dir, "orders")
        .selectExpr("o_orderpriority", "cast(o_totalprice as double) as p")
        .groupBy("o_orderpriority")
        .agg(expr("percentile_cont(0.5) within group (order by p)").as("p50r"),
          expr("percentile_cont(0.9) within group (order by p)").as("p90r"),
          cnt.as("n"))
        .selectExpr("o_orderpriority", r6("p50r") + " as p50",
          r6("p90r") + " as p90", "n")
        .orderBy("o_orderpriority")
    },

    // corr / least-squares slope+intercept from DECIMAL-EXACT sufficient
    // statistics: the five sums are order-independent (decimal partials)
    // and bit-identical across engines, and the closed-form arithmetic is
    // the same expression tree on both sides. The built-in corr()/
    // regr_slope() streaming aggregates are merge-order-dependent in the
    // last ulp — on a 1000-executor cluster they aren't even
    // run-to-run deterministic, which is exactly what this sufficient-
    // statistics formulation fixes (same pattern as Tables.dsum).
    "r51_regression" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .selectExpr("l_returnflag", "cast(l_quantity as double) as x",
          "cast(l_extendedprice as double) as y")
        .groupBy("l_returnflag")
        .agg(cnt.cast("double").as("n"),
          sum(expr("cast(x as decimal(20,6))")).cast("double").as("sx"),
          sum(expr("cast(y as decimal(24,6))")).cast("double").as("sy"),
          sum(expr("cast(x * y as decimal(30,8))")).cast("double").as("sxy"),
          sum(expr("cast(x * x as decimal(24,8))")).cast("double").as("sxx"),
          sum(expr("cast(y * y as decimal(34,8))")).cast("double").as("syy"))
        .selectExpr("l_returnflag", "cast(n as bigint) as n",
          r6("(n * sxy - sx * sy) / (n * sxx - sx * sx)") + " as slope",
          r6("(sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n") + " as intercept",
          r6("(n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))") + " as corr_xy")
        .orderBy("l_returnflag")
    },

    // correlated LATERAL join through the SQL front door (one SQL text
    // on both engines, like r47): per region, the top-2 customers by
    // account balance — the lateral subquery sees the outer row
    "r52_lateral_topn" -> { (s, dir) =>
      t(s, dir, "region").createOrReplaceTempView("__r52_region")
      t(s, dir, "nation").createOrReplaceTempView("__r52_nation")
      t(s, dir, "customer").createOrReplaceTempView("__r52_customer")
      s.sql(r52Sql("__r52_region", "__r52_nation", "__r52_customer"))
    },

    // NOT IN three-valued logic through the SQL front door: against a
    // null-free subquery NOT IN is the anti-join; against the same
    // subquery with a NULL injected it returns ZERO rows (x <> NULL is
    // UNKNOWN) — the null-aware-anti-join semantics engines must get
    // right, exercised as actual subqueries on both engines
    "r55_not_in_nulls" -> { (s, dir) =>
      t(s, dir, "customer").createOrReplaceTempView("__r55_customer")
      t(s, dir, "orders").createOrReplaceTempView("__r55_orders")
      s.sql(r55Sql("__r55_customer", "__r55_orders"))
    },

    // moving aggregate over a CALENDAR interval (RANGE BETWEEN INTERVAL
    // … PRECEDING): the time-windowed frame includes all date peers, so
    // it is deterministic under any row order; decimal sum inside the
    // frame keeps it exact. One SQL text on both engines.
    "r56_interval_range" -> { (s, dir) =>
      t(s, dir, "orders").createOrReplaceTempView("__r56_orders")
      s.sql(r56Sql("__r56_orders"))
    },

    // equi-width histogram: bucket index is pure integer-floor
    // arithmetic (identical text both engines — no width_bucket
    // dialect differences), counts+sums aggregate map-side; the
    // distributed histogram every profiler/quantile-sketch UI needs
    "r54_histogram" -> { (s, dir) =>
      t(s, dir, "orders")
        .selectExpr(
          "least(cast(floor(cast(o_totalprice as double) / 25000.0) as bigint), 19) as bucket",
          "o_totalprice")
        .groupBy("bucket")
        .agg(cnt.as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy("bucket")
    },

    // WINDOWED DISTINCT COUNT — COUNT(DISTINCT) OVER is a genuine
    // dialect gap: the reference's warehouses (and DuckDB) run it
    // natively, Spark rejects DISTINCT in window aggregates. Engine
    // form: size(collect_set() OVER …) — per-row set state bounded by
    // the event-type cardinality (a handful), never the partition row
    // count, so the running variant stays O(types) per row. One
    // shuffle on user_id serves both the whole-partition count and the
    // running prefix count.
    "r57_window_distinct" -> { (s, dir) =>
      val wAll = Window.partitionBy("user_id")
      val wRun = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
        .withColumn("n_types_user",
          size(collect_set(col("event_type")).over(wAll)).cast("long"))
        .withColumn("n_types_seen",
          size(collect_set(col("event_type")).over(wRun)).cast("long"))
        .select("event_id", "user_id", "event_type", "n_types_user",
          "n_types_seen")
        .orderBy("event_id")
    },

    // GROUPS-MODE WINDOW FRAME — the second window dialect gap after
    // r57 (DuckDB/postgres run GROUPS BETWEEN 1 PRECEDING AND CURRENT
    // ROW natively; Spark has no GROUPS frames): emulated exactly as
    // dense_rank over the order key, then a RANGE frame on the rank —
    // rank distance 1 IS one peer group. Both windows share the
    // user_id partition, so the emulation costs one exchange total,
    // same as a native GROUPS frame would.
    "r58_groups_frame" -> { (s, dir) =>
      val byUser = Window.partitionBy("user_id")
      val byG = byUser.orderBy(col("g")).rangeBetween(-1, 0)
      t(s, dir, "events")
        .selectExpr("event_id", "user_id", "cast(ts as date) as day", "value")
        .withColumn("g", dense_rank().over(byUser.orderBy(col("day"))))
        .withColumn("sum2d",
          sum(expr("cast(value as decimal(20,2))")).over(byG).cast("double"))
        .withColumn("n2d", cnt.over(byG))
        .selectExpr("event_id", "user_id",
          "cast(day as timestamp) as day",
          "cast(n2d as bigint) as n_2days", "sum2d as sum_2days")
        .orderBy("event_id")
    },

    // WINDOW FRAME EXCLUDE — the third window dialect gap (after r57
    // DISTINCT-in-window and r58 GROUPS frames): DuckDB/postgres run
    // `ROWS … EXCLUDE CURRENT ROW` and `RANGE … EXCLUDE TIES` natively,
    // Spark has no EXCLUDE clause at all. Emulation is frame algebra —
    // subtract what EXCLUDE removes from the inclusive frame:
    //   EXCLUDE CURRENT ROW: frame_sum − own value, frame_count − 1
    //     (the "peer-neighborhood mean" anomaly-score pattern: compare
    //     each event to its ±3 neighbors WITHOUT self-contamination);
    //   EXCLUDE TIES: running range_sum − ties_group_sum + own value
    //     (keeps the current row, drops its order-key peers).
    // All sums ride one decimal(20,2) cast, so subtraction is exact and
    // both engines see identical values. Everything shares the user_id
    // partition exchange — the emulation costs no extra shuffle, same
    // as a native EXCLUDE would.
    "r59_window_exclude" -> { (s, dir) =>
      val byEvt = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
      val wN = byEvt.rowsBetween(-3, 3)
      val wRun = Window.partitionBy("user_id").orderBy(col("day"))
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      val wDay = Window.partitionBy("user_id", "day")
      t(s, dir, "events")
        .selectExpr("event_id", "user_id", "ts", "cast(ts as date) as day",
          "cast(value as decimal(20,2)) as vdec")
        .withColumn("sum_incl", sum(col("vdec")).over(wN))
        .withColumn("n_incl", cnt.over(wN))
        .withColumn("run_incl", sum(col("vdec")).over(wRun))
        .withColumn("ties_sum", sum(col("vdec")).over(wDay))
        .selectExpr("event_id", "user_id",
          "cast(n_incl - 1 as bigint) as n_nbr",
          "case when n_incl > 1 then cast(sum_incl - vdec as double) end as sum_nbr",
          r6("case when n_incl > 1 then cast(sum_incl - vdec as double) / cast(n_incl - 1 as double) end") + " as avg_nbr",
          "cast(run_incl - ties_sum + vdec as double) as sum_upto_excl_ties")
        .orderBy("event_id")
    },

    // bitwise + boolean aggregates (integer/boolean lattices are exact —
    // no floating-point, engine-order-free by algebra)
    "r53_bit_bool_agg" -> { (s, dir) =>
      t(s, dir, "customer")
        .groupBy("c_mktsegment")
        .agg(expr("bit_and(c_custkey)").as("band"),
          expr("bit_or(c_custkey)").as("bor"),
          expr("bit_xor(c_custkey)").as("bxor"),
          expr("bool_and(c_acctbal > 0)").as("all_pos"),
          expr("bool_or(c_acctbal > 9000)").as("any_rich"),
          cnt.as("n"))
        .orderBy("c_mktsegment")
    },

    // quantified comparisons — `> ALL` / `> ANY` correlated subqueries
    // (the remaining subquery dialect gap after r05 EXISTS / r34 scalar
    // / r55 NOT IN): Spark-first as extreme-value algebra — ALL ≡
    // compare against the group max, ANY ≡ against the group min, with
    // the vacuous-truth edge (a nation with NO suppliers ⇒ ALL true,
    // ANY false) carried by the left join's null. The 25-row extreme
    // table broadcasts; the oracle runs the REAL quantified subqueries.
    // Doubles pass through untouched (max/min are order-free selections
    // of input values — no arithmetic, no rounding needed).
    "r67_quantified_compare" -> { (s, dir) =>
      val sup = t(s, dir, "supplier")
        .groupBy(col("s_nationkey").as("nk"))
        .agg(max(col("s_acctbal")).as("mx"), min(col("s_acctbal")).as("mn"))
      t(s, dir, "customer")
        .join(broadcast(sup), col("c_nationkey") === col("nk"), "left")
        .selectExpr("c_custkey", "c_nationkey", "c_acctbal",
          "coalesce(c_acctbal > mx, true) as beats_all",
          "coalesce(c_acctbal > mn, false) as beats_any")
        .orderBy("c_custkey")
    },

    // windowed event funnel (view → click within 6 h → purchase within
    // 6 h, strictly increasing timestamps, earliest-completion
    // semantics) — the product-analytics staple neither engine ships
    // as a primitive. Stage k's frame is the user-keyed min over
    // events inside stage k-1's window, so the plan is three
    // user-keyed aggregations chained by user-keyed joins: every frame
    // past the first filter is user-sized, nothing broadcasts the
    // corpus, and the event scan is shared (cached table). Timestamps
    // compare at micros on both engines (ns truncated identically).
    "r71_event_funnel" -> { (s, dir) =>
      val ev = t(s, dir, "events").select("user_id", "event_type", "ts")
      val s1 = ev.filter("event_type = 'view'")
        .groupBy("user_id").agg(min("ts").as("ts_view"))
      val s2 = ev.filter("event_type = 'click'")
        .join(s1, "user_id")
        .filter(col("ts") > col("ts_view") &&
          col("ts") <= col("ts_view") + expr("interval 6 hours"))
        .groupBy("user_id").agg(min("ts").as("ts_click"))
      val s3 = ev.filter("event_type = 'purchase'")
        .join(s2, "user_id")
        .filter(col("ts") > col("ts_click") &&
          col("ts") <= col("ts_click") + expr("interval 6 hours"))
        .groupBy("user_id").agg(min("ts").as("ts_purchase"))
      ev.select("user_id").distinct()
        .join(s1, Seq("user_id"), "left")
        .join(s2, Seq("user_id"), "left")
        .join(s3, Seq("user_id"), "left")
        .selectExpr("user_id", "ts_view", "ts_click", "ts_purchase",
          """cast(case when ts_purchase is not null then 3
            |  when ts_click is not null then 2
            |  when ts_view is not null then 1
            |  else 0 end as bigint) as stage_reached""".stripMargin)
        .orderBy("user_id")
    },

    // weekly cohort retention matrix (cohort = ISO week of first
    // activity; cell = fraction of the cohort active k weeks later) —
    // the second product-analytics staple. Two user-keyed aggregations
    // + one (cohort, offset)-keyed count; the cohort-size join is
    // against a weeks-sized frame. date_trunc('week') is ISO-Monday in
    // both engines; the offset is integer day arithmetic.
    "r72_cohort_retention" -> { (s, dir) =>
      val ev = Tables.bucketed(s, dir, "events", "user_id")
        .selectExpr("user_id", "cast(date_trunc('week', ts) as date) as wk")
      val cohort = ev.groupBy("user_id").agg(min(col("wk")).as("cohort_week"))
      val n = cohort.groupBy("cohort_week").agg(cnt.as("n_cohort"))
      ev.distinct()
        .join(cohort, "user_id")
        .selectExpr("cohort_week",
          "cast(datediff(wk, cohort_week) div 7 as bigint) as week_offset")
        .groupBy("cohort_week", "week_offset").agg(cnt.as("n_active"))
        .join(broadcast(n), "cohort_week")
        .selectExpr("cast(cohort_week as timestamp) as cohort_week",
          "week_offset", "n_active", "n_cohort",
          r6("cast(n_active as double) / cast(n_cohort as double)") + " as retention_r")
        .orderBy("cohort_week", "week_offset")
    },
  )

  /** Bit-exact 6-dp presentation rounding (same contract as
    * graft.llm.Frag.sRound6). */
  private def r6(x: String): String = s"cast(cast($x as decimal(16,6)) as double)"

  /** r55 — one SQL text drives both engines (only table names differ). */
  def r55Sql(customer: String, orders: String): String =
    s"""SELECT
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM $customer
       |   WHERE c_custkey NOT IN
       |     (SELECT o_custkey FROM $orders WHERE o_orderkey % 3 = 0)) AS n_clean,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM $customer
       |   WHERE c_custkey NOT IN
       |     (SELECT nullif(o_custkey, o_custkey) FROM $orders WHERE o_orderkey % 3 = 0)) AS n_poisoned""".stripMargin

  /** r56 — one SQL text drives both engines. */
  def r56Sql(orders: String): String =
    s"""SELECT o_custkey, o_orderkey, o_orderdate,
       |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(20,2))) OVER (
       |    PARTITION BY o_custkey ORDER BY o_orderdate
       |    RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW) AS STRING) AS DOUBLE) AS spend_30d,
       |  CAST(COUNT(*) OVER (
       |    PARTITION BY o_custkey ORDER BY o_orderdate
       |    RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW) AS BIGINT) AS n_30d
       |FROM $orders WHERE o_custkey < 100
       |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin

  /** r52 — one SQL text drives both engines (only table names differ). */
  def r52Sql(region: String, nation: String, customer: String): String =
    s"""SELECT r.r_name, l.c_custkey, l.c_acctbal
       |FROM $region r JOIN LATERAL (
       |  SELECT c_custkey, c_acctbal
       |  FROM $customer c JOIN $nation n ON c.c_nationkey = n.n_nationkey
       |  WHERE n.n_regionkey = r.r_regionkey
       |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2
       |) l ON true
       |ORDER BY r.r_name, l.c_acctbal DESC, l.c_custkey""".stripMargin

  /** r47 — RECURSIVE CTE through the SQL front door (Spark 4's
    * UnionLoop execution): walk the synthetic doc_id → 2·id+1 chain
    * from roots < 10 while the successor exists; one SQL text drives
    * both engines, so the iterative-union semantics (depth, fixpoint,
    * dedup-free UNION ALL) are cross-checked end-to-end. */
  def r47Sql(documents: String): String =
    s"""WITH RECURSIVE chain AS (
       |  SELECT doc_id AS root, doc_id AS cur, 0 AS depth
       |  FROM $documents WHERE doc_id < 10
       |  UNION ALL
       |  SELECT c.root, d.doc_id, c.depth + 1
       |  FROM chain c JOIN $documents d ON d.doc_id = c.cur * 2 + 1
       |)
       |SELECT root, CAST(MAX(depth) AS BIGINT) AS chain_len,
       |  MAX(cur) AS tip, CAST(COUNT(*) AS BIGINT) AS n_nodes
       |FROM chain GROUP BY root ORDER BY root""".stripMargin

  /** One SQL text drives both engines (only the table names differ). */
  def r34Sql(orders: String, customer: String): String =
    s"""WITH cust AS (
       |  SELECT o_custkey, CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(20,2))) AS STRING) AS DOUBLE) AS spend
       |  FROM $orders GROUP BY o_custkey),
       |j AS (SELECT c_custkey, c_mktsegment, spend
       |      FROM $customer JOIN cust ON c_custkey = o_custkey)
       |SELECT c_custkey, c_mktsegment, spend FROM j a
       |WHERE spend > 2 * (
       |  SELECT CAST(CAST(SUM(CAST(spend AS DECIMAL(20,2))) AS STRING) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
       |  FROM j b WHERE b.c_mktsegment = a.c_mktsegment)
       |ORDER BY c_custkey""".stripMargin

  private val sumQty = "CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(20,2))) AS STRING) AS DOUBLE)"

  val oracleSql: Map[String, String] = Map(
    "r71_event_funnel" ->
      """WITH ev AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |s1 AS (SELECT user_id, MIN(ts) AS ts_view FROM ev
        |       WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, MIN(e.ts) AS ts_click FROM ev e JOIN s1 USING (user_id)
        |       WHERE e.event_type = 'click' AND e.ts > s1.ts_view
        |         AND e.ts <= s1.ts_view + INTERVAL 6 HOUR GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, MIN(e.ts) AS ts_purchase FROM ev e JOIN s2 USING (user_id)
        |       WHERE e.event_type = 'purchase' AND e.ts > s2.ts_click
        |         AND e.ts <= s2.ts_click + INTERVAL 6 HOUR GROUP BY e.user_id),
        |u AS (SELECT DISTINCT user_id FROM ev)
        |SELECT u.user_id, s1.ts_view, s2.ts_click, s3.ts_purchase,
        |  CAST(CASE WHEN s3.user_id IS NOT NULL THEN 3
        |            WHEN s2.user_id IS NOT NULL THEN 2
        |            WHEN s1.user_id IS NOT NULL THEN 1
        |            ELSE 0 END AS BIGINT) AS stage_reached
        |FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
        |       LEFT JOIN s3 USING (user_id)
        |ORDER BY u.user_id""".stripMargin,
    "r72_cohort_retention" ->
      """WITH ev AS (SELECT DISTINCT user_id,
        |         CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS wk
        |       FROM events),
        |c AS (SELECT user_id, MIN(wk) AS cohort_week FROM ev GROUP BY user_id),
        |n AS (SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS n_cohort
        |      FROM c GROUP BY cohort_week),
        |x AS (SELECT c.cohort_week,
        |        CAST(date_diff('day', c.cohort_week, ev.wk) // 7 AS BIGINT) AS week_offset
        |      FROM ev JOIN c USING (user_id)),
        |g AS (SELECT cohort_week, week_offset, CAST(COUNT(*) AS BIGINT) AS n_active
        |      FROM x GROUP BY 1, 2)
        |SELECT CAST(g.cohort_week AS TIMESTAMP) AS cohort_week,
        |  g.week_offset, g.n_active, n.n_cohort,
        |  CAST(CAST(CAST(g.n_active AS DOUBLE) / CAST(n.n_cohort AS DOUBLE) AS DECIMAL(16,6)) AS DOUBLE) AS retention_r
        |FROM g JOIN n USING (cohort_week)
        |ORDER BY 1, 2""".stripMargin,
    "r01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  $sumQty AS sum_qty,
         |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,2))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
         |  CAST(CAST(SUM(CAST(l_extendedprice * (CAST(1 AS DOUBLE) - l_discount) AS DECIMAL(24,6))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
         |  $sumQty / CAST(COUNT(l_quantity) AS DOUBLE) AS avg_qty,
         |  CAST(CAST(SUM(CAST(l_discount AS DECIMAL(22,4))) AS VARCHAR) AS DOUBLE) / CAST(COUNT(l_discount) AS DOUBLE) AS avg_disc,
         |  CAST(COUNT(*) AS BIGINT) AS count_order
         |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "r02_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "r03_segment_revenue" ->
      """SELECT c_mktsegment,
        |  CAST(CAST(SUM(CAST(l_extendedprice * (CAST(1 AS DOUBLE) - l_discount) AS DECIMAL(24,6))) AS VARCHAR) AS DOUBLE) AS revenue,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "r04_brand_volume" ->
      s"""SELECT p_brand, $sumQty AS sum_qty,
         |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,2))) AS VARCHAR) AS DOUBLE) / CAST(COUNT(l_extendedprice) AS DOUBLE) AS avg_price,
         |  CAST(COUNT(*) AS BIGINT) AS n
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "r05_customers_with_orders" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "r06_customers_without_orders" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "r07_top3_orders_per_customer" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rk
        |  FROM orders) x
        |WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin,
    "r08_running_user_value" ->
      """SELECT user_id, event_id, event_type,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(20,2))) OVER (PARTITION BY user_id ORDER BY event_id) AS VARCHAR) AS DOUBLE) AS running_value
        |FROM events ORDER BY user_id, event_id""".stripMargin,
    "r09_rollup_volume" ->
      s"""SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n,
         |  $sumQty AS sum_qty
         |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "r10_setops_custkeys" ->
      """SELECT custkey FROM (
        |  SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |  UNION
        |  SELECT o_custkey FROM orders WHERE o_totalprice > 150000.0
        |  EXCEPT
        |  SELECT c_custkey FROM customer WHERE c_acctbal < 0.0) x
        |ORDER BY custkey""".stripMargin,
    "r11_intersect_custkeys" ->
      """SELECT custkey FROM (
        |  SELECT o_custkey AS custkey FROM orders
        |  INTERSECT
        |  SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0) x
        |ORDER BY custkey""".stripMargin,
    "r12_scalar_functions" ->
      """SELECT o_orderkey,
        |  UPPER(o_orderpriority) AS pri_upper,
        |  SUBSTRING(o_orderpriority, 1, 1) AS pri_code,
        |  CONCAT(o_orderstatus, '-', o_orderpriority) AS status_pri,
        |  CAST(YEAR(o_orderdate) AS BIGINT) AS order_year,
        |  CAST(MONTH(o_orderdate) AS BIGINT) AS order_month,
        |  ROUND(o_totalprice, 0) AS price_rounded,
        |  ABS(o_totalprice - 100000.0) AS price_dist,
        |  CAST(LENGTH(o_orderpriority) AS BIGINT) AS pri_len
        |FROM orders WHERE o_orderkey % 100 = 0 ORDER BY o_orderkey""".stripMargin,
    "r13_conditional_agg" ->
      """SELECT o_orderstatus,
        |  CAST(SUM(CASE WHEN o_orderpriority LIKE '1%' THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
        |  CAST(SUM(CASE WHEN o_totalprice > 100000.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "r14_distinct_agg" ->
      """SELECT l_returnflag,
        |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
        |  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_part,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "r15_repeat_customers" ->
      """SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(20,2))) AS VARCHAR) AS DOUBLE) AS total_spent
        |FROM orders GROUP BY 1 HAVING COUNT(*) >= 15 ORDER BY o_custkey""".stripMargin,
    "r16_nation_revenue" ->
      """SELECT r_name, n_name,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,2))) AS VARCHAR) AS DOUBLE) AS rev,
        |  CAST(COUNT(*) AS BIGINT) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "r17_monthly_orders" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(20,2))) AS VARCHAR) AS DOUBLE) AS volume
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "r18_event_hourly" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start, event_type,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(20,2))) AS VARCHAR) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "r19_props_extract" ->
      """SELECT event_id, k FROM (
        |  SELECT event_id, CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS k
        |  FROM events) x
        |WHERE k % 10 = 0 ORDER BY event_id""".stripMargin,
    "r34_scalar_subquery" -> r34Sql("orders", "customer"),
    "r32_moving_average" ->
      """SELECT user_id, event_id, value,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(20,2)))
        |         OVER (PARTITION BY user_id ORDER BY event_id
        |               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE)
        |  / CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY event_id
        |               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE) AS ma4
        |FROM events WHERE user_id < 10 ORDER BY user_id, event_id""".stripMargin,
    "r33_event_gaps" ->
      """SELECT user_id, event_id,
        |  CAST(epoch_us(ts) - epoch_us(LAG(ts, 1) OVER (PARTITION BY user_id ORDER BY event_id)) AS BIGINT) AS gap_us,
        |  LEAD(event_type, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS next_type
        |FROM events WHERE user_id < 10 ORDER BY user_id, event_id""".stripMargin,
    "r31_sql_interface" ->
      """SELECT c_mktsegment,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(20,2))) AS VARCHAR) AS DOUBLE) AS volume
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "r29_date_arithmetic" ->
      """SELECT o_orderkey,
        |  CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP) AS ship_deadline,
        |  CAST(date_diff('day', DATE '1990-01-01', o_orderdate) AS BIGINT) AS days_since_1990,
        |  CAST(quarter(o_orderdate) AS BIGINT) AS q,
        |  CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week,
        |  CAST(dayofweek(o_orderdate) AS BIGINT) AS dow_sun0,
        |  CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end
        |FROM orders WHERE o_orderkey % 50 = 0 ORDER BY o_orderkey""".stripMargin,
    "r30_customer_year_profile" ->
      """WITH oy AS (SELECT o_custkey, CAST(year(o_orderdate) AS BIGINT) AS y, o_totalprice
        |            FROM orders)
        |SELECT o_custkey,
        |  (SELECT string_agg(y, ',' ORDER BY y)
        |   FROM (SELECT DISTINCT y FROM oy i WHERE i.o_custkey = oy.o_custkey) d) AS years_csv,
        |  CAST(COUNT(DISTINCT y) AS BIGINT) AS n_years,
        |  MIN(y) AS first_year, MAX(y) AS last_year,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(20,2))) AS VARCHAR) AS DOUBLE) AS lifetime_value
        |FROM oy GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "r27_cube_volume" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,2))) AS VARCHAR) AS DOUBLE) AS volume
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "r28_json_path" ->
      """SELECT event_id, k_str, k_num FROM (
        |  SELECT event_id, json_extract_string(props, '$.k') AS k_str,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num
        |  FROM events) x
        |WHERE k_num % 7 = 0 ORDER BY event_id""".stripMargin,
    "r26_salted_token_join" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
        |            FROM documents),
        |dim AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS tok_freq FROM tok GROUP BY token)
        |SELECT doc_id, CAST(SUM(tok_freq) AS BIGINT) AS popularity,
        |  CAST(COUNT(*) AS BIGINT) AS n_tokens
        |FROM tok JOIN dim USING (token)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "r22_latest_events" ->
      """SELECT user_id, event_id, ts, event_type, value FROM (
        |  SELECT user_id, event_id, ts, event_type, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) x
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "r23_top_tokens" ->
      """SELECT token, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
        |FROM (SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
        |      FROM documents) x
        |GROUP BY token ORDER BY n DESC, token""".stripMargin,
    "r20_pivot_qty" ->
      """SELECT l_linestatus,
        |  CAST(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS DECIMAL(20,2)) END) AS DOUBLE) AS qty_a,
        |  CAST(SUM(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS DECIMAL(20,2)) END) AS DOUBLE) AS qty_n,
        |  CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(20,2)) END) AS DOUBLE) AS qty_r
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "r47_recursive_cte" -> r47Sql("documents"),
    "r48_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(20,2))) AS VARCHAR) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), (l_linestatus))
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "r44_full_outer" ->
      """SELECT COALESCE(c.nk, s.nk) AS nk,
        |  COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
        |FROM (SELECT c_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS n_cust
        |      FROM customer WHERE c_nationkey < 15 GROUP BY 1) c
        |FULL OUTER JOIN
        |     (SELECT s_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS n_supp
        |      FROM supplier WHERE s_nationkey > 9 GROUP BY 1) s
        |  ON c.nk = s.nk
        |ORDER BY nk""".stripMargin,
    "r42_group_percentiles" ->
      """SELECT c_mktsegment, p, c_acctbal AS pval FROM (
        |  SELECT c_mktsegment, c_acctbal,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY c_mktsegment
        |      ORDER BY c_acctbal, c_custkey) AS BIGINT) AS rn,
        |    CAST(COUNT(*) OVER (PARTITION BY c_mktsegment) AS BIGINT) AS n
        |  FROM customer) x, (SELECT unnest([0.25, 0.5, 0.75]) AS p) ps
        |WHERE rn = CAST(ceil(p * n) AS BIGINT)
        |ORDER BY c_mktsegment, p""".stripMargin,
    "r49_ordered_listagg" ->
      """SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations,
        |  CAST(COUNT(*) AS BIGINT) AS n_nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "r50_percentile_cont" ->
      """SELECT o_orderpriority,
        |  CAST(CAST(percentile_cont(0.5) WITHIN GROUP (ORDER BY CAST(o_totalprice AS DOUBLE)) AS DECIMAL(16,6)) AS DOUBLE) AS p50,
        |  CAST(CAST(percentile_cont(0.9) WITHIN GROUP (ORDER BY CAST(o_totalprice AS DOUBLE)) AS DECIMAL(16,6)) AS DOUBLE) AS p90,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "r51_regression" ->
      """WITH st AS (
        |  SELECT l_returnflag,
        |    CAST(COUNT(*) AS DOUBLE) AS n,
        |    CAST(CAST(SUM(CAST(x AS DECIMAL(20,6))) AS VARCHAR) AS DOUBLE) AS sx,
        |    CAST(CAST(SUM(CAST(y AS DECIMAL(24,6))) AS VARCHAR) AS DOUBLE) AS sy,
        |    CAST(CAST(SUM(CAST(x * y AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS sxy,
        |    CAST(CAST(SUM(CAST(x * x AS DECIMAL(24,8))) AS VARCHAR) AS DOUBLE) AS sxx,
        |    CAST(CAST(SUM(CAST(y * y AS DECIMAL(34,8))) AS VARCHAR) AS DOUBLE) AS syy
        |  FROM (SELECT l_returnflag, CAST(l_quantity AS DOUBLE) AS x,
        |               CAST(l_extendedprice AS DOUBLE) AS y FROM lineitem)
        |  GROUP BY l_returnflag)
        |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
        |  CAST(CAST((n * sxy - sx * sy) / (n * sxx - sx * sx) AS DECIMAL(16,6)) AS DOUBLE) AS slope,
        |  CAST(CAST((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n AS DECIMAL(16,6)) AS DOUBLE) AS intercept,
        |  CAST(CAST((n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) AS DECIMAL(16,6)) AS DOUBLE) AS corr_xy
        |FROM st ORDER BY l_returnflag""".stripMargin,
    "r52_lateral_topn" -> r52Sql("region", "nation", "customer"),
    "r55_not_in_nulls" -> r55Sql("customer", "orders"),
    "r56_interval_range" -> r56Sql("orders"),
    // oracle is a structurally different algorithm (per-day pre-agg +
    // LAG + join back) than the engine's dense_rank+RANGE emulation —
    // DuckDB has not implemented GROUPS frames either, which is rather
    // the point of shipping this operator
    "r58_groups_frame" ->
      """WITH d AS (SELECT user_id, CAST(ts AS DATE) AS day,
        |             SUM(CAST(value AS DECIMAL(20,2))) AS dsum, COUNT(*) AS dn
        |           FROM events GROUP BY 1, 2),
        |f AS (SELECT user_id, day,
        |        CAST(dsum + COALESCE(LAG(dsum) OVER w, 0) AS DOUBLE) AS sum_2days,
        |        CAST(dn + COALESCE(LAG(dn) OVER w, 0) AS BIGINT) AS n_2days
        |      FROM d WINDOW w AS (PARTITION BY user_id ORDER BY day))
        |SELECT event_id, e.user_id, CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day, n_2days, sum_2days
        |FROM events e JOIN f ON e.user_id = f.user_id AND CAST(e.ts AS DATE) = f.day
        |ORDER BY event_id""".stripMargin,
    // the oracle runs the REAL EXCLUDE clause (DuckDB implements it) —
    // the frame-algebra emulation above is cross-checked against native
    // EXCLUDE semantics, not against a re-statement of itself
    "r59_window_exclude" ->
      s"""WITH e AS (SELECT event_id, user_id, ts, CAST(ts AS DATE) AS day,
         |             CAST(value AS DECIMAL(20,2)) AS vdec FROM events)
         |SELECT event_id, user_id,
         |  CAST(COUNT(*) OVER wn AS BIGINT) AS n_nbr,
         |  CAST(SUM(vdec) OVER wn AS DOUBLE) AS sum_nbr,
         |  ${r6("CAST(SUM(vdec) OVER wn AS DOUBLE) / CAST(COUNT(*) OVER wn AS DOUBLE)")} AS avg_nbr,
         |  CAST(SUM(vdec) OVER wt AS DOUBLE) AS sum_upto_excl_ties
         |FROM e
         |WINDOW
         |  wn AS (PARTITION BY user_id ORDER BY ts, event_id
         |         ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING EXCLUDE CURRENT ROW),
         |  wt AS (PARTITION BY user_id ORDER BY day
         |         RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW EXCLUDE TIES)
         |ORDER BY event_id""".stripMargin,
    "r57_window_distinct" ->
      """SELECT event_id, user_id, event_type,
        |  CAST(COUNT(DISTINCT event_type) OVER (PARTITION BY user_id) AS BIGINT) AS n_types_user,
        |  CAST(COUNT(DISTINCT event_type) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_types_seen
        |FROM events ORDER BY event_id""".stripMargin,
    "r54_histogram" ->
      """SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(20,2))) AS VARCHAR) AS DOUBLE) AS total
        |FROM (SELECT least(CAST(floor(CAST(o_totalprice AS DOUBLE) / 25000.0) AS BIGINT), 19) AS bucket,
        |             o_totalprice
        |      FROM orders)
        |GROUP BY bucket ORDER BY bucket""".stripMargin,
    "r53_bit_bool_agg" ->
      """SELECT c_mktsegment,
        |  CAST(bit_and(c_custkey) AS BIGINT) AS band,
        |  CAST(bit_or(c_custkey) AS BIGINT) AS bor,
        |  CAST(bit_xor(c_custkey) AS BIGINT) AS bxor,
        |  bool_and(c_acctbal > 0) AS all_pos,
        |  bool_or(c_acctbal > 9000) AS any_rich,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "r67_quantified_compare" ->
      """SELECT c_custkey, c_nationkey, c_acctbal,
        |  c_acctbal > ALL (SELECT s_acctbal FROM supplier
        |                   WHERE s_nationkey = c_nationkey) AS beats_all,
        |  c_acctbal > ANY (SELECT s_acctbal FROM supplier
        |                   WHERE s_nationkey = c_nationkey) AS beats_any
        |FROM customer ORDER BY c_custkey""".stripMargin,
  )
}
