package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.sql.Timestamp

class AsOfRangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof join picks the latest right row at or before each left ts") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 11:00:00"), 110.0),
      (2L, ts("2024-01-01 10:30:00"), 50.0)
    ).toDF("key", "ts", "price")
    val trades = Seq(
      (1L, ts("2024-01-01 10:30:00"), "t1"), // after 10:00 quote → 100
      (1L, ts("2024-01-01 11:00:00"), "t2"), // equal ts → 110 (>= semantics)
      (2L, ts("2024-01-01 10:00:00"), "t3"), // before any quote → null
      (2L, ts("2024-01-01 23:00:00"), "t4")  // → 50
    ).toDF("key", "ts", "trade_id")

    val out = AsOfJoin.asof(trades, quotes, Seq("key"), "ts", Seq("price"))
      .orderBy("trade_id")
    rows(out.select("trade_id", "price")).map(r =>
      (r.getString(0), Option(r.get(1)))) shouldBe Seq(
      ("t1", Some(100.0)), ("t2", Some(110.0)), ("t3", None), ("t4", Some(50.0)))
  }

  test("asof join matches NULL payload values and never mixes right rows") {
    // right row at 11:00 has price=NULL, note set; at 10:00 both set.
    // DuckDB/pandas ASOF semantics: a left row at 11:30 matches the
    // 11:00 row WHOLE — price must be NULL (not inherited from 10:00)
    // and note must be "late" (same row, not a mix).
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), Option(100.0), Option("early")),
      (1L, ts("2024-01-01 11:00:00"), Option.empty[Double], Option("late"))
    ).toDF("key", "ts", "price", "note")
    val left = Seq(
      (1L, ts("2024-01-01 10:30:00"), "t1"), // → (100.0, early)
      (1L, ts("2024-01-01 11:30:00"), "t2")  // → (NULL, late) — one row
    ).toDF("key", "ts", "trade_id")

    val out = rows(
      AsOfJoin.asof(left, right, Seq("key"), "ts", Seq("price", "note"))
        .orderBy("trade_id").select("trade_id", "price", "note"))
    out.map(r => (r.getString(0), Option(r.get(1)), Option(r.get(2)))) shouldBe Seq(
      ("t1", Some(100.0), Some("early")),
      ("t2", None, Some("late")))
  }

  test("asof join preserves left row count exactly") {
    val left = (1 to 200).map(i => (i.toLong % 5, ts(f"2024-01-01 ${10 + i % 10}%02d:00:00"), i))
      .toDF("key", "ts", "n")
    val right = (1 to 50).map(i => (i.toLong % 5, ts(f"2024-01-01 ${i % 20}%02d:30:00"), i * 1.0))
      .toDF("key", "ts", "payload")
    AsOfJoin.asof(left, right, Seq("key"), "ts", Seq("payload"))
      .count() shouldBe 200L
  }

  test("asofBroadcast equals the shuffle as-of join, without shuffling the left side") {
    val left = (1 to 300).map(i =>
      (i.toLong % 7, ts(f"2024-01-01 ${i % 24}%02d:${i % 60}%02d:00"), i))
      .toDF("key", "ts", "n")
    val right = (1 to 60).map(i =>
      (i.toLong % 7, ts(f"2024-01-01 ${(i * 3) % 24}%02d:30:00"), i * 1.0, s"v$i"))
      .toDF("key", "ts", "price", "tag")
      .groupBy("key", "ts").agg(max("price").as("price"), max("tag").as("tag"))

    val viaShuffle = AsOfJoin.asof(left, right, Seq("key"), "ts", Seq("price", "tag"))
    val viaBroadcast = AsOfJoin.asofBroadcast(left, right, Seq("key"), "ts", Seq("price", "tag"))
    rows(viaBroadcast.exceptAll(viaShuffle)) shouldBe empty
    rows(viaShuffle.exceptAll(viaBroadcast)) shouldBe empty

    // NULL keys: the window form groups them together; the broadcast
    // form's null-safe join (<=>) must agree, not drop the match
    val ln = Seq((Option.empty[Long], ts("2024-01-01 12:00:00"), 1))
      .toDF("key", "ts", "n")
    val rn = Seq((Option.empty[Long], ts("2024-01-01 11:00:00"), 5.0, "n"))
      .toDF("key", "ts", "price", "tag")
    val sn = rows(AsOfJoin.asof(ln, rn, Seq("key"), "ts", Seq("price", "tag")))
    val bn = rows(AsOfJoin.asofBroadcast(ln, rn, Seq("key"), "ts", Seq("price", "tag")))
    sn shouldBe bn
    bn.head.getDouble(bn.head.fieldIndex("price")) shouldBe 5.0

    // the fact side must reach the join without an Exchange: the only
    // shuffle permitted is the small side's groupBy feeding broadcast
    val plan = viaBroadcast.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("binned range join equals the naive theta join") {
    val fact = (1 to 500).map(i => (i.toLong, (i % 130) + 0.5)).toDF("id", "value")
    val dim = Seq(
      (0.0, 10.0, "bronze"), (10.0, 50.0, "silver"),
      (50.0, 100.0, "gold"), (100.0, 1000.0, "platinum")
    ).toDF("lo", "hi", "tier")
    val naive = fact.join(dim, col("value") >= col("lo") && col("value") < col("hi"))
      .select("id", "tier")
    val fast = RangeJoin.binned(fact, dim, "value", "lo", "hi", binWidth = 25.0)
      .select("id", "tier")
    rows(fast.exceptAll(naive)) shouldBe empty
    rows(naive.exceptAll(fast)) shouldBe empty
  }

  test("binned range join: interval ending on a bin edge excludes the edge bin") {
    val fact = Seq((1L, 10.0)).toDF("id", "value")
    val dim = Seq((0.0, 10.0, "a"), (10.0, 20.0, "b")).toDF("lo", "hi", "tier")
    val out = rows(RangeJoin.binned(fact, dim, "value", "lo", "hi", 5.0)
      .select("tier"))
    out.map(_.getString(0)) shouldBe Seq("b") // 10.0 ∈ [10,20), not [0,10)
  }

  test("binned range join is planned as an equi-join, not nested-loop") {
    val fact = (1 to 100).map(i => (i.toLong, i * 1.0)).toDF("id", "value")
    val dim = Seq((0.0, 50.0, "lo"), (50.0, 200.0, "hi")).toDF("lo", "hi", "tier")
    val plan = RangeJoin.binned(fact, dim, "value", "lo", "hi", 10.0)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
