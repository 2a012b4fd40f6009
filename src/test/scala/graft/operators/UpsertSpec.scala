package graft.operators

import graft.SparkSpec

class UpsertSpec extends SparkSpec {
  import spark.implicits._

  test("lastWriteWins keeps the highest version; the update batch wins ties") {
    val snapshot = Seq(
      ("a", 3L, "snap-a3"), // beaten by update v5
      ("b", 7L, "snap-b7"), // survives: update only has v6
      ("c", 2L, "snap-c2"), // tie at v2 → update must win
      ("d", 1L, "snap-d1")  // no update at all
    ).toDF("key", "version", "payload")
    val updates = Seq(
      ("a", 5L, "upd-a5"),
      ("b", 6L, "upd-b6"),
      ("c", 2L, "upd-c2"),
      ("e", 9L, "upd-e9")   // brand-new key
    ).toDF("key", "version", "payload")

    val out = rows(Upsert.lastWriteWins(snapshot, updates, Seq("key"), "version")
      .orderBy("key"))
    out.map(r => (r.getString(0), r.getString(2))) shouldBe Seq(
      ("a", "upd-a5"), ("b", "snap-b7"), ("c", "upd-c2"),
      ("d", "snap-d1"), ("e", "upd-e9"))
  }

  test("lastWriteWins is idempotent: re-applying the same batch changes nothing") {
    val snapshot = (1 to 50).map(i => (s"k${i % 10}", i.toLong, s"s$i"))
      .toDF("key", "version", "payload")
    val updates = (30 to 70).map(i => (s"k${i % 13}", i.toLong, s"u$i"))
      .toDF("key", "version", "payload")
    val once = Upsert.lastWriteWins(snapshot, updates, Seq("key"), "version")
    val twice = Upsert.lastWriteWins(once, updates, Seq("key"), "version")
    rows(twice.exceptAll(once)) shouldBe empty
    rows(once.exceptAll(twice)) shouldBe empty
  }
}
