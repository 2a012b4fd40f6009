package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Partition-elimination audits — at 100 TB the difference between
  * scanning a day and scanning the lake. Static pruning (a literal
  * date predicate reaches the directory listing) and DYNAMIC pruning
  * (the fact side pruned at runtime by a subquery on the filtered
  * dimension, Spark 3+ DPP) both asserted on a Hive-layout table.
  *
  * DPP footgun pinned here: the filtering dimension must be a
  * FILE-BACKED relation — a local (in-memory) dimension gets its
  * filter constant-folded into the LocalRelation during optimization,
  * so PartitionPruning finds no selective predicate and inserts
  * nothing.
  */
class PartitionPruningSpec extends SparkSpec {
  import spark.implicits._

  private lazy val warehouse = {
    val dir = Files.createTempDirectory("graft_dpp").toString
    (1 to 2000).map(i =>
      (i.toLong, s"2024-01-${"%02d".format(i % 28 + 1)}", i * 1.0))
      .toDF("id", "p_date", "amount")
      .write.partitionBy("p_date").parquet(s"$dir/fact")
    Seq(("2024-01-03", "promo"), ("2024-01-04", "promo"),
      ("2024-01-05", "regular")).toDF("p_date", "kind")
      .withColumn("p_date", col("p_date").cast("date"))
      .write.parquet(s"$dir/dim")
    dir
  }

  test("static pruning: a literal partition predicate reaches the partition filters") {
    val df = spark.read.parquet(s"$warehouse/fact")
      .filter(col("p_date") === "2024-01-03")
    df.count() shouldBe (1 to 2000).count(i => i % 28 + 1 == 3).toLong
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(p_date"), plan)
    assert(plan.contains("= 2024-01-03"), plan)
  }

  test("dynamic partition pruning: a filtered file-backed dim prunes the fact scan at runtime") {
    val joined = spark.read.parquet(s"$warehouse/fact")
      .join(spark.read.parquet(s"$warehouse/dim")
        .filter(col("kind") === "promo"), Seq("p_date"))
      .agg(sum(col("amount")).as("s"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      "no dynamic pruning subquery in:\n" + plan)
  }
}
