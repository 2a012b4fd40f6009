package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Approximate aggregates — differential-tested against their exact
  * counterparts (no oracle: sketch outputs aren't cross-engine
  * reproducible). These are the mergeable-state forms the streaming and
  * 100 TB paths rely on (HLL++ for distincts, GK quantile sketches).
  */
class ApproxSpec extends SparkSpec {

  test("approx_count_distinct within rsd of exact on events user_id") {
    val e = Tables.events(spark, sfDir)
    val r = e.agg(
      countDistinct(col("user_id")).as("exact"),
      approx_count_distinct(col("user_id"), 0.05).as("approx")).collect()(0)
    val (exact, approx) = (r.getLong(0), r.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact <= 0.15,
      s"approx $approx vs exact $exact")
  }

  test("percentile_approx brackets the exact median") {
    val e = Tables.events(spark, sfDir).filter(col("event_type") === "purchase")
    val r = e.agg(
      percentile_approx(col("value"), lit(0.5), lit(1000)).as("approx"),
      expr("percentile(value, 0.5)").as("exact")).collect()(0)
    val approx = r.getDouble(0); val exact = r.getDouble(1)
    assert(math.abs(approx - exact) / math.max(exact, 1e-9) <= 0.05,
      s"approx median $approx vs exact $exact")
  }

  test("HLL sketches merge: union of per-type sketches ~ whole-table distinct") {
    val e = Tables.events(spark, sfDir)
    // hll_sketch_agg / hll_union_agg: the partial-mergeable path a
    // 1000-executor rollup uses (Spark 3.5+ datasketches functions)
    val perType = e.groupBy(col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    val merged = perType.agg(
      hll_sketch_estimate(hll_union_agg(col("sk"))).as("est")).collect()(0).getLong(0)
    val exact = e.select(countDistinct(col("user_id"))).collect()(0).getLong(0)
    assert(math.abs(merged - exact).toDouble / exact <= 0.1,
      s"merged HLL $merged vs exact $exact")
  }
}
