package graft.queries

import graft.Tables
import graft.functions.ScalarFns
import graft.operators.PivotMatrix
import org.apache.spark.sql.functions._

/** The reference's pipeline shapes re-expressed over testdata
  * (SURVEY.md §2.6 A3/A4 pivot/unpivot, §7 architecture layer 4):
  * users×items matrices, feature fractions, the data-mart join, and the
  * streaming window aggregate in its batch form.
  *
  * Pivot values are explicit sorted constants (event types) — no hidden
  * distinct-collect on the driver, deterministic columns (SURVEY §7
  * "hard parts").
  */
object MatrixPipelines {

  /** The testdata event-type domain, sorted. Fixed at authoring time the
    * way the reference fixes its view/buy domain; rediscover with
    * [[PivotMatrix.distinctValues]] when the domain drifts. */
  val EventTypes: Seq[String] = Seq("click", "error", "purchase", "signup", "view")

  private def pivotOracle(expr: String => String): String =
    EventTypes.map(t => expr(t)).mkString(", ")

  /** q14: count pivot — user × event_type crosstab
    * (reference A3, data_mart.scala:114,126). */
  private val q14 = QuerySpec(
    "q14_pivot_counts",
    (s, dir) =>
      PivotMatrix.countMatrix(Tables.events(s, dir), "user_id", "event_type", EventTypes)
        .orderBy(col("user_id")),
    oracle = Some(s"""
      SELECT user_id,
             ${pivotOracle(t => s"count(CASE WHEN event_type = '$t' THEN 1 END) AS \"$t\"")}
      FROM events
      GROUP BY user_id
      ORDER BY user_id"""),
    bench = true)

  /** q15: unpivot back to long form (reference A4,
    * users_items.scala:59-73 `stack`) — native df.unpivot; zero rows are
    * dropped like the reference's `filter(value === "1")`. */
  private val q15 = QuerySpec(
    "q15_unpivot",
    (s, dir) => {
      val wide = PivotMatrix.countMatrix(
        Tables.events(s, dir), "user_id", "event_type", EventTypes)
      PivotMatrix.unpivotMatrix(wide, "user_id", EventTypes, "item", "value")
        .filter(col("value") > 0)
        .orderBy(col("user_id"), col("item"))
    },
    oracle = Some("""
      SELECT user_id, event_type AS item, count(*) AS value
      FROM events
      GROUP BY user_id, event_type
      ORDER BY user_id, item"""))

  /** q23: 0/1 presence matrix — the users×items shape
    * (users_items.scala:77-80). */
  private val q23 = QuerySpec(
    "q23_presence_matrix",
    (s, dir) =>
      PivotMatrix.presenceMatrix(
          Tables.events(s, dir), "user_id", "event_type", EventTypes, "seen_")
        .orderBy(col("user_id")),
    oracle = Some(s"""
      SELECT user_id,
             ${pivotOracle(t =>
        s"CASE WHEN count(CASE WHEN event_type = '$t' THEN 1 END) > 0 THEN 1 ELSE 0 END AS seen_$t")}
      FROM events
      GROUP BY user_id
      ORDER BY user_id"""))

  /** q24: work/evening-hour visit fractions per user — the features
    * module's marquee derivation (features.scala:71-76), conditional
    * counts over hour-of-day. */
  private val q24 = QuerySpec(
    "q24_hour_fractions",
    (s, dir) => {
      val hr = hour(col("ts"))
      Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("n_events"),
          ScalarFns.roundFrac(ScalarFns.countIf(hr >= 9 && hr < 18),
            count(lit(1)), 4).as("work_frac"),
          ScalarFns.roundFrac(ScalarFns.countIf(hr >= 18 && hr < 24),
            count(lit(1)), 4).as("evening_frac"))
        .orderBy(col("user_id"))
    },
    oracle = Some("""
      SELECT user_id, count(*) AS n_events,
             CAST((count(CASE WHEN extract(hour FROM ts) BETWEEN 9 AND 17
                   THEN 1 END) * 20000 + count(*))
                  // (count(*) * 2) AS DOUBLE) / 10000.0 AS work_frac,
             CAST((count(CASE WHEN extract(hour FROM ts) BETWEEN 18 AND 23
                   THEN 1 END) * 20000 + count(*))
                  // (count(*) * 2) AS DOUBLE) / 10000.0 AS evening_frac
      FROM events
      GROUP BY user_id
      ORDER BY user_id"""))

  /** q25: the data-mart — dimension joins + CASE bucketing + pivoted
    * activity counts in one wide table (data_mart.scala:111-135).
    * Dimensions broadcast; the single shuffle is the user-key
    * aggregation. */
  private val q25 = QuerySpec(
    "q25_datamart",
    (s, dir) => {
      val activity = PivotMatrix.countMatrix(
        Tables.events(s, dir), "user_id", "event_type", EventTypes, "ev_")
      val c = Tables.customer(s, dir)
        .withColumn("bal_bucket",
          when(col("c_acctbal") < 0, "negative")
            .when(col("c_acctbal") < 5000, "standard")
            .otherwise("premium"))
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir)
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .join(activity, c("c_custkey") === activity("user_id"))
        .select(Seq(col("c_custkey"), col("r_name"), col("n_name"), col("bal_bucket"))
          ++ EventTypes.map(t => col(s"ev_$t")): _*)
        .orderBy(col("c_custkey"))
    },
    oracle = Some(s"""
      SELECT c_custkey, r_name, n_name,
             CASE WHEN c_acctbal < 0 THEN 'negative'
                  WHEN c_acctbal < 5000 THEN 'standard'
                  ELSE 'premium' END AS bal_bucket,
             ${pivotOracle(t => s"count(CASE WHEN event_type = '$t' THEN 1 END) AS ev_$t")}
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      JOIN events ON c_custkey = user_id
      GROUP BY c_custkey, r_name, n_name, bal_bucket
      ORDER BY c_custkey"""),
    bench = true)

  /** q38: the streaming job's tumbling-window aggregate in batch form
    * (agg.scala:58-67: revenue / visitors / purchases / AOV per 60-min
    * window). The streaming variant with watermark lives in
    * graft.streaming; this batch twin is the oracle-checkable one. */
  private val q38 = QuerySpec(
    "q38_tumbling_window",
    (s, dir) => {
      val isPurchase = col("event_type") === "purchase"
      // money → exact cents so revenue and AOV are integer-derived:
      // engines summing doubles in different orders otherwise straddle
      // round-half boundaries like 391.55/8 (ScalarFns.roundFrac).
      val centsSum = sum(when(isPurchase, ScalarFns.cents(col("value")))
        .otherwise(lit(0L)))
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "60 minutes").as("w"))
        .agg(
          (centsSum.cast("double") / 100.0).as("revenue"),
          countDistinct(col("user_id")).as("visitors"),
          ScalarFns.countIf(isPurchase).as("purchases"),
          ScalarFns.roundFrac(centsSum,
            ScalarFns.countIf(isPurchase) * 100L, 4).as("aov"))
        .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
          col("revenue"), col("visitors"), col("purchases"), col("aov"))
        .orderBy(col("window_start"))
    },
    oracle = Some("""
      SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
             CAST(CAST(sum(CASE WHEN event_type = 'purchase'
                   THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
                  AS DOUBLE) / 100.0 AS revenue,
             count(DISTINCT user_id) AS visitors,
             count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchases,
             CASE WHEN count(CASE WHEN event_type = 'purchase' THEN 1 END) > 0
                  THEN CAST((CAST(sum(CASE WHEN event_type = 'purchase'
                         THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
                         * 20000
                         + count(CASE WHEN event_type = 'purchase' THEN 1 END) * 100)
                       // (count(CASE WHEN event_type = 'purchase' THEN 1 END) * 200)
                       AS DOUBLE) / 10000.0
                  END AS aov
      FROM events
      GROUP BY 1
      ORDER BY window_start"""),
    bench = true)

  /** q42: incremental matrix update — the users_items "update mode"
    * (users_items.scala:85-101, SURVEY C4): the event log is split into
    * two disjoint date halves, each pivoted independently (yesterday's
    * snapshot + today's delta), then merged by summing per-key columns.
    * Result must equal pivoting the whole log at once (the oracle). */
  private val q42 = QuerySpec(
    "q42_matrix_merge",
    (s, dir) => {
      val e = Tables.events(s, dir).withColumn("d", dayofmonth(col("ts")))
      val early = PivotMatrix.countMatrix(
        e.filter(col("d") <= 15), "user_id", "event_type", EventTypes)
      val late = PivotMatrix.countMatrix(
        e.filter(col("d") > 15), "user_id", "event_type", EventTypes)
      PivotMatrix.mergeMatrices(early, late, "user_id")
        .orderBy(col("user_id"))
    },
    oracle = Some(s"""
      SELECT user_id,
             ${pivotOracle(t => s"count(CASE WHEN event_type = '$t' THEN 1 END) AS \"$t\"")}
      FROM events
      GROUP BY user_id
      ORDER BY user_id"""))

  /** q47: dense feature-vector packing — the features module's marquee
    * output (features.scala:55-59 packs ~1000 pivot counts into one
    * ArrayType column via `array(cols: _*)`): per-user event-type count
    * vector (deterministic column order) + day-of-week pivot counts,
    * ready for CountVectorizer-free ML consumption (F15, A3). */
  private val q47 = QuerySpec(
    "q47_feature_vector",
    (s, dir) => {
      // BOTH vectors from ONE aggregation — 12 conditional counts in a
      // single scan and single user_id shuffle (two countMatrix calls
      // would scan and shuffle the events twice, then join).
      val dows = (1 to 7).map(d => s"dow_$d")
      val measures =
        EventTypes.map(t =>
          count(when(col("event_type") === t, 1)).as(s"et_$t")) ++
        (1 to 7).map(d =>
          count(when(dayofweek(col("ts")) === d, 1)).as(s"dow_$d"))
      // The packed array is rendered as a comma-joined STRING for the
      // oracle compare: the driver's pandas row-sort cannot order list
      // columns (factorize on ndarray throws), so the vector payload
      // crosses the compare boundary as a scalar. q50 keeps the true
      // ArrayType form for in-engine consumers.
      Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(measures.head, measures.tail: _*)
        .select(col("user_id"),
          array_join(array(EventTypes.map(t => col(s"et_$t").cast("string")): _*), ",").as("type_vec"),
          array_join(array(dows.map(c => col(c).cast("string")): _*), ",").as("dow_vec"))
        .orderBy(col("user_id"))
    },
    oracle = Some(s"""
      SELECT user_id,
             array_to_string([${EventTypes.map(t => s"count(CASE WHEN event_type = '$t' THEN 1 END)").mkString(", ")}], ',') AS type_vec,
             array_to_string([${(1 to 7).map(d => s"count(CASE WHEN dayofweek(ts) + 1 = $d THEN 1 END)").mkString(", ")}], ',') AS dow_vec
      FROM events
      GROUP BY user_id
      ORDER BY user_id"""))

  val specs: Seq[QuerySpec] = Seq(q14, q15, q23, q24, q25, q38, q42, q47)
}
