package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketing: pre-partitioned co-located joins — the zero-shuffle join
  * path for repeatedly-joined big tables (SCALE.md relational core).
  * Writes two tables bucketed by the join key and asserts the join plan
  * has NO exchange on either side.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("join of co-bucketed tables runs without a shuffle exchange") {
    val warehouse = java.nio.file.Files.createTempDirectory("graft_wh")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_bkt LOCATION '$warehouse'")
    try {
      val facts = (1L to 1000L).map(i => (i % 100, i, i * 1.5)).toDF("key", "id", "v")
      val dims = (0L until 100L).map(i => (i, s"label_$i")).toDF("key", "label")
      facts.write.mode("overwrite")
        .bucketBy(8, "key").sortBy("key")
        .saveAsTable("graft_bkt.facts_b")
      dims.write.mode("overwrite")
        .bucketBy(8, "key").sortBy("key")
        .saveAsTable("graft_bkt.dims_b")

      // disable broadcast so the join would otherwise shuffle both sides
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = spark.table("graft_bkt.facts_b")
          .join(spark.table("graft_bkt.dims_b"), "key")
        val plan = joined.queryExecution.executedPlan.toString
        assert(plan.contains("SortMergeJoin"), plan)
        assert(!plan.contains("Exchange hashpartitioning"),
          "bucketed join should not shuffle:\n" + plan)
        // correctness unchanged
        joined.count() shouldBe 1000L
      } finally
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    } finally {
      spark.sql("DROP DATABASE IF EXISTS graft_bkt CASCADE")
    }
  }

  test("bucketed aggregation on the bucket key avoids the shuffle too") {
    val warehouse = java.nio.file.Files.createTempDirectory("graft_wh2")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_bkt2 LOCATION '$warehouse'")
    try {
      (1L to 1000L).map(i => (i % 50, i)).toDF("key", "id")
        .write.mode("overwrite").bucketBy(8, "key")
        .saveAsTable("graft_bkt2.t")
      val agg = spark.table("graft_bkt2.t").groupBy("key").agg(count(lit(1)).as("n"))
      agg.collect()
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        "bucketed agg should not shuffle:\n" + plan)
    } finally spark.sql("DROP DATABASE IF EXISTS graft_bkt2 CASCADE")
  }
}
