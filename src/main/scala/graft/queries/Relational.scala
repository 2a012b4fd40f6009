package graft.queries

import graft.Tables
import graft.functions.ScalarFns
import graft.operators.TopK
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational surface (SURVEY.md §2.3–§2.8): projection, filter,
  * CASE WHEN, all four join types + semi/anti, hash aggregation,
  * conditional measures, window functions, top-k, set ops, datetime and
  * JSON scalar functions.
  *
  * Every query is declarative DataFrame API — Catalyst handles pushdown,
  * pruning, join strategy (dims under the broadcast threshold become
  * BroadcastHashJoin automatically), partial aggregation, and
  * TakeOrderedAndProject for order+limit.
  */
object Relational {

  /** q1: TPC-H Q1-style pricing summary — multi-measure hash aggregation
    * with map-side partial agg (reference A1/A2, agg.scala:59-63). */
  private val q1 = QuerySpec(
    "q01_pricing_summary",
    (s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          // avg = integer-valued qty sum / count → exact integer rounding
          // (float round-half sits exactly on engine-divergent boundaries)
          ScalarFns.roundFrac(sum(col("l_quantity")).cast("long"),
            count(lit(1)), 4).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    oracle = Some("""
      SELECT l_returnflag, l_linestatus,
             round(sum(l_quantity), 2) AS sum_qty,
             round(sum(l_extendedprice), 2) AS sum_base_price,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
             CAST((CAST(sum(l_quantity) AS BIGINT) * 20000 + count(*))
                  // (count(*) * 2) AS DOUBLE) / 10000.0 AS avg_qty,
             count(*) AS count_order
      FROM lineitem
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""),
    bench = true)

  /** q2: filter + narrow projection — predicates and ReadSchema reach the
    * parquet scan (reference P1/P5). */
  private val q2 = QuerySpec(
    "q02_filter_project",
    (s, dir) => {
      Tables.events(s, dir)
        .filter(col("event_type") === "purchase" && col("value") > 50.0)
        .select(col("event_id"), col("user_id"), round(col("value"), 2).as("value"))
        .orderBy(col("event_id"))
    },
    oracle = Some("""
      SELECT event_id, user_id, round(value, 2) AS value
      FROM events
      WHERE event_type = 'purchase' AND value > 50.0
      ORDER BY event_id"""))

  /** q3: 5-branch CASE WHEN bucketing (reference P6,
    * data_mart.scala:58-63 age buckets). */
  private val q3 = QuerySpec(
    "q03_case_when_bucket",
    (s, dir) => {
      Tables.customer(s, dir)
        .withColumn("bal_bucket",
          when(col("c_acctbal") < 0, "negative")
            .when(col("c_acctbal") < 1000, "low")
            .when(col("c_acctbal") < 5000, "mid")
            .when(col("c_acctbal") < 9000, "high")
            .otherwise("top"))
        .groupBy(col("c_mktsegment"), col("bal_bucket"))
        .agg(count(lit(1)).as("n_customers"),
          // exact integer cents, no float average (see ScalarFns.cents)
          sum(ScalarFns.cents(col("c_acctbal"))).as("sum_bal_cents"))
        .orderBy(col("c_mktsegment"), col("bal_bucket"))
    },
    oracle = Some("""
      SELECT c_mktsegment,
             CASE WHEN c_acctbal < 0 THEN 'negative'
                  WHEN c_acctbal < 1000 THEN 'low'
                  WHEN c_acctbal < 5000 THEN 'mid'
                  WHEN c_acctbal < 9000 THEN 'high'
                  ELSE 'top' END AS bal_bucket,
             count(*) AS n_customers,
             CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS sum_bal_cents
      FROM customer
      GROUP BY 1, 2
      ORDER BY c_mktsegment, bal_bucket"""))

  /** q4: multi-way inner join — revenue by region/nation. nation and
    * region are broadcast by Catalyst (well under the 10 MB threshold);
    * orders⋈customer shuffles on the key (reference J1). */
  private val q4 = QuerySpec(
    "q04_join_inner_revenue",
    (s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir)
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(round(sum(col("o_totalprice")), 2).as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("r_name"), col("n_name"))
    },
    oracle = Some("""
      SELECT r_name, n_name,
             round(sum(o_totalprice), 2) AS revenue,
             count(*) AS n_orders
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name
      ORDER BY r_name, n_name"""),
    bench = true)

  /** q5: left outer join keeping customers with zero orders
    * (reference J2). */
  private val q5 = QuerySpec(
    "q05_join_left_outer",
    (s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          coalesce(round(sum(col("o_totalprice")), 2), lit(0.0)).as("total_spend"))
        .orderBy(col("c_custkey"))
    },
    oracle = Some("""
      SELECT c_custkey,
             count(o_orderkey) AS n_orders,
             coalesce(round(sum(o_totalprice), 2), 0.0) AS total_spend
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
      ORDER BY c_custkey"""))

  /** q6: full outer join merging two per-user aggregate blocks
    * (reference J3, features.scala:99,107). */
  private val q6 = QuerySpec(
    "q06_join_full_outer",
    (s, dir) => {
      val e = Tables.events(s, dir)
      val buys = e.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(round(sum(col("value")), 2).as("purchase_value"))
      val views = e.filter(col("event_type") === "view")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_views"))
      buys.join(views, Seq("user_id"), "outer")
        .na.fill(0.0, Seq("purchase_value"))
        .na.fill(0L, Seq("n_views"))
        .orderBy(col("user_id"))
    },
    oracle = Some("""
      WITH buys AS (
        SELECT user_id, round(sum(value), 2) AS purchase_value
        FROM events WHERE event_type = 'purchase' GROUP BY user_id),
      views AS (
        SELECT user_id, count(*) AS n_views
        FROM events WHERE event_type = 'view' GROUP BY user_id)
      SELECT coalesce(buys.user_id, views.user_id) AS user_id,
             coalesce(purchase_value, 0.0) AS purchase_value,
             coalesce(n_views, 0) AS n_views
      FROM buys FULL OUTER JOIN views ON buys.user_id = views.user_id
      ORDER BY user_id"""))

  /** q7: left-semi join — EXISTS without duplicating rows (idiomatic form
    * of reference J4 per SURVEY §2.5). */
  private val q7 = QuerySpec(
    "q07_join_semi",
    (s, dir) => {
      val c = Tables.customer(s, dir)
      val big = Tables.orders(s, dir).filter(col("o_totalprice") > 300000.0)
      c.join(big, c("c_custkey") === big("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },
    oracle = Some("""
      SELECT c_custkey, c_name FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
      ORDER BY c_custkey"""))

  /** q8: left-anti join — NOT EXISTS. */
  private val q8 = QuerySpec(
    "q08_join_anti",
    (s, dir) => {
      val c = Tables.customer(s, dir)
      val big = Tables.orders(s, dir).filter(col("o_totalprice") > 450000.0)
      c.join(big, c("c_custkey") === big("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    },
    oracle = Some("""
      SELECT c_custkey, c_mktsegment FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey AND o_totalprice > 450000.0)
      ORDER BY c_custkey"""))

  /** q9: global top-k → TakeOrderedAndProject, never a full sort
    * (reference O2, features.scala:31-38). */
  private val q9 = QuerySpec(
    "q09_topk_global",
    (s, dir) => {
      val counts = Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"))
      TopK.global(counts, 25, col("n_events").desc, col("user_id").asc)
    },
    oracle = Some("""
      SELECT user_id, count(*) AS n_events
      FROM events GROUP BY user_id
      ORDER BY n_events DESC, user_id ASC
      LIMIT 25"""))

  /** q10: top-k per group via ranked window (SURVEY §2.7 capability
    * superset). */
  private val q10 = QuerySpec(
    "q10_topk_per_group",
    (s, dir) => {
      TopK.perGroup(Tables.customer(s, dir), Seq("c_mktsegment"), 3,
          col("c_acctbal").desc, col("c_custkey").asc)
        .select(col("c_mktsegment"), col("c_custkey"),
          round(col("c_acctbal"), 2).as("c_acctbal"))
        .orderBy(col("c_mktsegment"), col("c_acctbal").desc, col("c_custkey"))
    },
    oracle = Some("""
      SELECT c_mktsegment, c_custkey, round(c_acctbal, 2) AS c_acctbal
      FROM (SELECT c_mktsegment, c_custkey, c_acctbal,
                   row_number() OVER (PARTITION BY c_mktsegment
                     ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
            FROM customer)
      WHERE rn <= 3
      ORDER BY c_mktsegment, c_acctbal DESC, c_custkey"""))

  /** q11: window frames — running sum + lag over a per-customer order
    * timeline. Explicit ROWS frame (the default RANGE frame treats ties
    * as peers; (date, orderkey) is unique so either works, but explicit
    * is deterministic by construction). */
  private val q11 = QuerySpec(
    "q11_window_running",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("running_spend",
          round(sum(col("o_totalprice"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2))
        .withColumn("prev_price", round(lag(col("o_totalprice"), 1).over(w), 2))
        .withColumn("order_rank", row_number().over(w))
        .select(col("o_custkey"), col("o_orderkey"), col("order_rank"),
          col("running_spend"), col("prev_price"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    oracle = Some("""
      SELECT o_custkey, o_orderkey,
             CAST(row_number() OVER w AS INTEGER) AS order_rank,
             round(sum(o_totalprice) OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend,
             round(lag(o_totalprice, 1) OVER w, 2) AS prev_price
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      ORDER BY o_custkey, o_orderkey"""),
    bench = true)

  /** q12: union (position-based, reference O3) + re-aggregation. */
  private val q12 = QuerySpec(
    "q12_union",
    (s, dir) => {
      val e = Tables.events(s, dir)
      val a = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), lit("commerce").as("src"))
      val b = e.filter(col("event_type") === "view" || col("event_type") === "click")
        .select(col("user_id"), lit("browse").as("src"))
      a.unionByName(b)
        .groupBy(col("user_id"), col("src"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("user_id"), col("src"))
    },
    oracle = Some("""
      SELECT user_id, src, count(*) AS n FROM (
        SELECT user_id, 'commerce' AS src FROM events WHERE event_type = 'purchase'
        UNION ALL
        SELECT user_id, 'browse' AS src FROM events WHERE event_type IN ('view', 'click'))
      GROUP BY user_id, src
      ORDER BY user_id, src"""))

  /** q13: distinct over a column pair (reference A5/A6). */
  private val q13 = QuerySpec(
    "q13_distinct",
    (s, dir) =>
      Tables.events(s, dir)
        .select(col("user_id"), col("event_type"))
        .distinct()
        .orderBy(col("user_id"), col("event_type")),
    oracle = Some("""
      SELECT DISTINCT user_id, event_type FROM events
      ORDER BY user_id, event_type"""))

  /** q16: string scalar functions (reference F4/F6/F18/P8). */
  private val q16 = QuerySpec(
    "q16_string_fns",
    (s, dir) =>
      Tables.part(s, dir)
        .select(
          col("p_partkey"),
          lower(col("p_type")).as("type_lc"),
          upper(col("p_brand")).as("brand_uc"),
          length(col("p_name")).as("name_len"),
          concat(col("p_brand"), lit(":"), col("p_type")).as("brand_tag"),
          regexp_replace(col("p_name"), "\\s+", "_").as("name_snake"))
        .orderBy(col("p_partkey")),
    oracle = Some("""
      SELECT p_partkey,
             lower(p_type) AS type_lc,
             upper(p_brand) AS brand_uc,
             CAST(length(p_name) AS INTEGER) AS name_len,
             p_brand || ':' || p_type AS brand_tag,
             regexp_replace(p_name, '\s+', '_', 'g') AS name_snake
      FROM part
      ORDER BY p_partkey"""))

  /** q17: regexp_extract with capture group (reference F5,
    * data_mart.scala:102-107). */
  private val q17 = QuerySpec(
    "q17_regex_extract",
    (s, dir) =>
      Tables.part(s, dir)
        .withColumn("first_word", regexp_extract(col("p_name"), "^([a-z]+)", 1))
        .groupBy(col("first_word"))
        .agg(count(lit(1)).as("n_parts"))
        .orderBy(col("first_word")),
    oracle = Some("""
      SELECT regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
             count(*) AS n_parts
      FROM part
      GROUP BY 1
      ORDER BY first_word"""))

  /** q18: JSON parsing with explicit schema (reference F1,
    * filter.scala:51). Oracle uses a regex so it holds even where
    * DuckDB's json extension is unavailable. */
  private val q18 = QuerySpec(
    "q18_json_parse",
    (s, dir) => {
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(StructField("k", LongType)))
      Tables.events(s, dir)
        .withColumn("k", from_json(col("props"), schema).getField("k"))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .orderBy(col("k"))
    },
    oracle = Some("""
      SELECT CAST(regexp_extract(props, '(\d+)', 1) AS BIGINT) AS k,
             count(*) AS n,
             round(sum(value), 2) AS sum_value
      FROM events
      GROUP BY 1
      ORDER BY k"""))

  /** q19: datetime functions — day/hour extraction under the UTC session
    * (reference F9-F12; timestamps emitted as strings per parity rules). */
  private val q19 = QuerySpec(
    "q19_datetime",
    (s, dir) =>
      Tables.events(s, dir)
        .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
        .withColumn("hr", hour(col("ts")))
        .groupBy(col("day"), col("hr"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .orderBy(col("day"), col("hr")),
    oracle = Some("""
      SELECT strftime(ts, '%Y-%m-%d') AS day,
             CAST(extract(hour FROM ts) AS INTEGER) AS hr,
             count(*) AS n,
             round(sum(value), 2) AS sum_value
      FROM events
      GROUP BY 1, 2
      ORDER BY day, hr"""))

  /** q20: explode/generator + top-k (reference F14; token frequency over
    * documents). */
  private val q20 = QuerySpec(
    "q20_explode_tokens",
    (s, dir) => {
      import graft.functions.TextFns
      val tok = Tables.documents(s, dir)
        .select(explode(TextFns.tokens(col("text"))).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("n"))
      TopK.global(tok, 100, col("n").desc, col("token").asc)
    },
    oracle = Some("""
      SELECT token, count(*) AS n
      FROM (SELECT unnest(string_split_regex(text, '\s+')) AS token FROM documents)
      WHERE token <> ''
      GROUP BY token
      ORDER BY n DESC, token ASC
      LIMIT 100"""),
    bench = true)

  /** q21: collect_set → sorted string (reference A8/F16 made
    * deterministic: collect_list order is undefined in both engines, so
    * the oracle-able form is the sorted, comma-joined set). */
  private val q21 = QuerySpec(
    "q21_collect_sorted",
    (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(array_join(array_sort(collect_set(col("event_type"))), ",").as("types_seen"))
        .orderBy(col("user_id")),
    oracle = Some("""
      SELECT user_id,
             string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types_seen
      FROM events
      GROUP BY user_id
      ORDER BY user_id"""))

  /** q22: dataset-wide max broadcast onto rows (reference W1 rebuilt
    * idiomatically: scalar aggregate + broadcast cross join instead of an
    * empty-partitionBy window, which would single-partition the data —
    * SURVEY §2.7). */
  private val q22 = QuerySpec(
    "q22_latest_day",
    (s, dir) => {
      val e = Tables.events(s, dir).withColumn("day", to_date(col("ts")))
      val maxDay = e.agg(max(col("day")).as("max_day"))
      e.join(broadcast(maxDay), e("day") === maxDay("max_day"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    },
    oracle = Some("""
      SELECT event_type, count(*) AS n
      FROM events
      WHERE CAST(ts AS DATE) = (SELECT max(CAST(ts AS DATE)) FROM events)
      GROUP BY event_type
      ORDER BY event_type"""))

  /** q39: URL scalar functions (reference F4/F5/F7, domain handling) on
    * URLs synthesized from part attributes — the testdata carries no URL
    * column, so the query constructs one deterministically first. */
  private val q39 = QuerySpec(
    "q39_url_fns",
    (s, dir) => {
      val p = Tables.part(s, dir)
        .withColumn("url",
          concat(lit("https://WWW."), lower(col("p_brand")), lit(".com/"),
            regexp_replace(lower(col("p_type")), " ", "-"),
            lit("?q="), col("p_partkey")))
      p.select(
        col("p_partkey"),
        ScalarFns.extractDomain(col("url")).as("domain"),
        ScalarFns.normalizeDomain(col("url")).as("norm"))
        .orderBy(col("p_partkey"))
    },
    oracle = Some("""
      WITH u AS (
        SELECT p_partkey,
               'https://WWW.' || lower(p_brand) || '.com/' ||
               replace(lower(p_type), ' ', '-') || '?q=' || p_partkey AS url
        FROM part)
      SELECT p_partkey,
             regexp_extract(url, '^(?i)(?:https?://)?(?:www\.)?([^:/\n?]+)', 1) AS domain,
             regexp_replace(regexp_replace(lower(url), '^https?://', ''),
                            '^www\.', '') AS norm
      FROM u
      ORDER BY p_partkey"""))

  /** q40: ROLLUP — hierarchical subtotals incl. grand total (capability
    * superset of A1-A3: grouping sets compile to one shuffle with a
    * grouping-id expand, not one scan per level). */
  private val q40 = QuerySpec(
    "q40_rollup",
    (s, dir) =>
      Tables.lineitem(s, dir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"), col("l_linestatus")),
    oracle = Some("""
      SELECT l_returnflag, l_linestatus,
             round(sum(l_quantity), 2) AS sum_qty,
             count(*) AS n
      FROM lineitem
      GROUP BY ROLLUP(l_returnflag, l_linestatus)
      ORDER BY l_returnflag, l_linestatus"""))

  /** q41: set operations — INTERSECT / EXCEPT (set semantics) over user
    * id sets by behavior. */
  private val q41 = QuerySpec(
    "q41_setops",
    (s, dir) => {
      val e = Tables.events(s, dir)
      val buyers = e.filter(col("event_type") === "purchase").select(col("user_id"))
      val errorers = e.filter(col("event_type") === "error").select(col("user_id"))
      val both = buyers.intersect(errorers).withColumn("rel", lit("both"))
      val buyOnly = buyers.distinct().exceptAll(errorers.distinct())
        .withColumn("rel", lit("buy_only"))
      both.unionByName(buyOnly).orderBy(col("rel"), col("user_id"))
    },
    oracle = Some("""
      WITH b AS (SELECT user_id FROM events WHERE event_type = 'purchase'),
           e AS (SELECT user_id FROM events WHERE event_type = 'error')
      SELECT user_id, 'both' AS rel FROM (SELECT user_id FROM b INTERSECT SELECT user_id FROM e)
      UNION ALL
      SELECT user_id, 'buy_only' AS rel
      FROM (SELECT DISTINCT user_id FROM b EXCEPT ALL SELECT DISTINCT user_id FROM e)
      ORDER BY rel, user_id"""))

  /** q43: deterministic collect_list — sorted event-id journal per user
    * (A8 made oracle-able via array_sort; collect_list order itself is
    * undefined in both engines). */
  private val q43 = QuerySpec(
    "q43_collect_sorted_list",
    (s, dir) =>
      Tables.events(s, dir)
        .filter(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(array_join(
          transform(array_sort(collect_list(col("event_id"))),
            x => x.cast("string")), ",").as("purchase_ids"))
        .orderBy(col("user_id")),
    oracle = Some("""
      SELECT user_id,
             string_agg(CAST(event_id AS VARCHAR), ',' ORDER BY event_id) AS purchase_ids
      FROM events
      WHERE event_type = 'purchase'
      GROUP BY user_id
      ORDER BY user_id"""))

  /** q46: ranking/navigation window functions — dense_rank, ntile,
    * lead, first_value over per-customer order timelines (§2.7
    * capability superset beyond q11's frames). */
  private val q46 = QuerySpec(
    "q46_rank_fns",
    (s, dir) => {
      val byPrice = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      val byDate = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, dir)
        .select(
          col("o_custkey"), col("o_orderkey"),
          dense_rank().over(byPrice).as("price_rank"),
          ntile(4).over(byPrice).as("quartile"),
          date_format(lead(col("o_orderdate"), 1).over(byDate),
            "yyyy-MM-dd").as("next_order_day"),
          date_format(first_value(col("o_orderdate")).over(byDate),
            "yyyy-MM-dd").as("first_order_day"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    oracle = Some("""
      SELECT o_custkey, o_orderkey,
             CAST(dense_rank() OVER wp AS INTEGER) AS price_rank,
             CAST(ntile(4) OVER wp AS INTEGER) AS quartile,
             strftime(lead(o_orderdate, 1) OVER wd, '%Y-%m-%d') AS next_order_day,
             strftime(first_value(o_orderdate) OVER wd, '%Y-%m-%d') AS first_order_day
      FROM orders
      WINDOW wp AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC),
             wd AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      ORDER BY o_custkey, o_orderkey"""))

  /** q52: CUBE — all grouping-set combinations (completes the
    * grouping-sets family next to q40's ROLLUP). */
  private val q52 = QuerySpec(
    "q52_cube",
    (s, dir) =>
      Tables.orders(s, dir)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("o_totalprice")), 2).as("total"))
        .orderBy(col("o_orderstatus"), col("o_orderpriority")),
    oracle = Some("""
      SELECT o_orderstatus, o_orderpriority,
             count(*) AS n, round(sum(o_totalprice), 2) AS total
      FROM orders
      GROUP BY CUBE(o_orderstatus, o_orderpriority)
      ORDER BY o_orderstatus, o_orderpriority"""))

  /** q53: exact continuous percentiles — both engines use the same
    * linear interpolation at p·(n−1); money as exact cents keeps the
    * interpolated midpoints bit-identical. */
  private val q53 = QuerySpec(
    "q53_percentile",
    (s, dir) =>
      Tables.events(s, dir)
        .filter(col("event_type") === "purchase")
        .withColumn("cents", ScalarFns.cents(col("value")))
        .groupBy(col("user_id"))
        .agg(
          (expr("percentile(cents, 0.5)") / 100.0).as("median_value"),
          (expr("percentile(cents, 0.9)") / 100.0).as("p90_value"))
        .orderBy(col("user_id")),
    oracle = Some("""
      SELECT user_id,
             quantile_cont(CAST(round(value * 100) AS BIGINT), 0.5) / 100.0
               AS median_value,
             quantile_cont(CAST(round(value * 100) AS BIGINT), 0.9) / 100.0
               AS p90_value
      FROM events
      WHERE event_type = 'purchase'
      GROUP BY user_id
      ORDER BY user_id"""))

  /** q54: supplier roster per nation — covers the one testdata table
    * the rest of the catalog doesn't touch. */
  private val q54 = QuerySpec(
    "q54_supplier_nation",
    (s, dir) => {
      val sup = Tables.supplier(s, dir)
      val n = Tables.nation(s, dir)
      sup.join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_suppliers"),
          sum(ScalarFns.cents(col("s_acctbal"))).as("total_bal_cents"))
        .orderBy(col("n_name"))
    },
    oracle = Some("""
      SELECT n_name, count(*) AS n_suppliers,
             CAST(sum(CAST(round(s_acctbal * 100) AS BIGINT)) AS BIGINT)
               AS total_bal_cents
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      GROUP BY n_name
      ORDER BY n_name"""))

  /** q55: TPC-H Q6 shape — date-range + between predicates reaching the
    * scan, single-scalar forecast revenue. */
  private val q55 = QuerySpec(
    "q55_forecast_revenue",
    (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1996-01-01").cast("timestamp")
          && col("l_discount").between(0.02, 0.06)
          && col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2)
          .as("revenue")),
    oracle = Some("""
      SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        AND l_shipdate < TIMESTAMP '1996-01-01'
        AND l_discount BETWEEN 0.02 AND 0.06
        AND l_quantity < 24"""),
    bench = true)

  val specs: Seq[QuerySpec] = Seq(
    q1, q2, q3, q4, q5, q6, q7, q8, q9, q10, q11, q12, q13,
    q16, q17, q18, q19, q20, q21, q22, q39, q40, q41, q43, q46, q52, q53,
    q54, q55)
}
