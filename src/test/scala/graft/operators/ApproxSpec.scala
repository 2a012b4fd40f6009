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

  test("sketchProfile tracks distinctProfile per source (q112 vs q113 twin)") {
    val docs = Tables.documents(spark, sfDir)
    val approx = CorpusStats.sketchProfile(docs, "source", "text")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val exact = CorpusStats.distinctProfile(docs, "source", "text")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    approx.keySet shouldBe exact.keySet
    // ±2%: a PINNED measurement, not a statistical claim — HLL++/GK are
    // deterministic on fixed input, so the sketch path carries a
    // quantified error bound vs the exact twin (q112 is rows-only in
    // the oracle harness; this is its correctness gate).
    // per-source sorted length vectors, for the p90 rank bracket below
    val lens: Map[String, Seq[Int]] = docs
      .groupBy(coalesce(col("source").cast("string"), lit("(none)")).as("source"))
      .agg(sort_array(collect_list(
        org.apache.spark.sql.functions.length(
          coalesce(col("text"), lit(""))))).as("ls"))
      .collect().map(r => r.getString(0) -> r.getSeq[Int](1)).toMap
    exact.foreach { case (src, (nDocs, nDistinct, p90)) =>
      val (aDocs, aDistinct, aP90) = approx(src)
      aDocs shouldBe nDocs // doc count is exact in both forms
      // granularity floor: at tiny cardinalities (sf0.001 has ~30
      // distinct/source) one count is already >2% — allow ±1 absolute
      assert(math.abs(aDistinct - nDistinct).toDouble <=
        math.max(0.02 * nDistinct, 1.0),
        s"$src: approx distinct $aDistinct vs exact $nDistinct")
      // p90: the sketch returns a REAL order statistic while the exact
      // twin interpolates between ranks — so the deterministic bound is
      // a one-rank bracket: approx must lie within the two order
      // statistics the interpolated exact value sits between (stronger
      // than a % bound at small n, and implies ≤1-rank sketch error)
      val ls = lens(src)
      val pos = 0.9 * (ls.size - 1)
      val (lo, hi) = (ls(pos.floor.toInt).toDouble, ls(pos.ceil.toInt).toDouble)
      assert(aP90 >= lo && aP90 <= hi,
        s"$src: approx p90 $aP90 outside rank bracket [$lo,$hi] (exact $p90)")
    }
  }

  test("sketchProfile: all-empty source reports 0 distinct tokens; NULL source groups") {
    import spark.implicits._
    val docs = Seq((1L, "", "s1"), (2L, "a b", null.asInstanceOf[String]))
      .toDF("doc_id", "text", "source")
    val r = CorpusStats.sketchProfile(docs, "source", "text")
      .orderBy("source")
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    r shouldBe Array(("(none)", 1L, 2L), ("s1", 1L, 0L))
  }
}
