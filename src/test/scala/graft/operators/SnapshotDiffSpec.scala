package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  private def statuses(df: org.apache.spark.sql.DataFrame): Map[Long, String] =
    rows(df).map(r => r.getLong(0) -> r.getString(1)).toMap

  test("diff classifies added/removed/changed/unchanged exactly") {
    val prev = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val cur = Seq((2L, "b"), (3L, "c2"), (4L, "d")).toDF("doc_id", "text")
    statuses(SnapshotDiff.diff(prev, cur, "doc_id", "text")) shouldBe Map(
      1L -> "removed", 2L -> "unchanged", 3L -> "changed", 4L -> "added")
  }

  test("NULL text fingerprints as empty — presence is never misread") {
    val prev = Seq((1L, null: String), (2L, null: String), (3L, "x"))
      .toDF("doc_id", "text")
    val cur = Seq((1L, ""), (2L, "now present"), (3L, null: String))
      .toDF("doc_id", "text")
    // NULL ≡ "" (unchanged), NULL → text (changed), text → NULL
    // (changed) — none of them ever added/removed
    statuses(SnapshotDiff.diff(prev, cur, "doc_id", "text")) shouldBe Map(
      1L -> "unchanged", 2L -> "changed", 3L -> "changed")
  }

  test("empty sides degrade to all-added / all-removed") {
    val docs = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val empty = docs.filter(lit(false))
    statuses(SnapshotDiff.diff(empty, docs, "doc_id", "text"))
      .values.toSet shouldBe Set("added")
    statuses(SnapshotDiff.diff(docs, empty, "doc_id", "text"))
      .values.toSet shouldBe Set("removed")
  }

  test("production xxhash64 fingerprint agrees with the portable md5 form") {
    val docs = graft.Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val prev = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
    val cur = docs.filter(pmod(col("doc_id"), lit(10)) =!= 3)
      .withColumn("text", when(pmod(col("doc_id"), lit(7)) === 0,
          concat(col("text"), lit(" v2"))).otherwise(col("text")))
    val fast = statuses(SnapshotDiff.diff(prev, cur, "doc_id", "text"))
    val portable = statuses(SnapshotDiff.diff(prev, cur, "doc_id", "text", md5(_)))
    fast shouldBe portable
  }

  test("summary counts equal a groupBy over diff") {
    val docs = graft.Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val prev = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
    val cur = docs.filter(pmod(col("doc_id"), lit(10)) =!= 3)
    val viaDiff = rows(SnapshotDiff.diff(prev, cur, "doc_id", "text")
      .groupBy("status").agg(count(lit(1)).as("n_docs")).orderBy("status"))
    val viaSummary = rows(SnapshotDiff.summary(prev, cur, "doc_id", "text")
      .orderBy("status"))
    viaSummary shouldBe viaDiff
  }
}
