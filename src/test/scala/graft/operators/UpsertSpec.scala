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
}
