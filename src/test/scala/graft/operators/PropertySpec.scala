package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY.md §5 test strategy #3): pivot ∘
  * unpivot round-trips, union count preservation, split
  * complementarity — over ScalaCheck-generated event logs.
  *
  * Sampling is manual (Gen.apply with fixed seeds) because only raw
  * scalacheck is on the test classpath; seeds are fixed so failures
  * reproduce.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val eventTypes = Seq("buy", "click", "view")

  private val eventsGen: Gen[List[(Long, String)]] =
    Gen.listOfN(60, for {
      uid <- Gen.choose(1L, 8L)
      t <- Gen.oneOf(eventTypes)
    } yield (uid, t))

  private def samples(n: Int): Seq[List[(Long, String)]] =
    (1 to n).flatMap(i => eventsGen(Gen.Parameters.default, Seed(i.toLong)))

  test("pivot ∘ unpivot round-trips to grouped counts for arbitrary logs") {
    samples(5).foreach { events =>
      val df = events.toDF("uid", "etype")
      val wide = PivotMatrix.countMatrix(df, "uid", "etype", eventTypes)
      val back = PivotMatrix.unpivotMatrix(wide, "uid", eventTypes, "etype", "n")
        .filter(col("n") > 0)
      val expected = df.groupBy("uid", "etype").agg(count(lit(1)).as("n"))
      rows(back.exceptAll(expected)) shouldBe empty
      rows(expected.exceptAll(back)) shouldBe empty
    }
  }

  test("split by type is complementary: branch counts sum to filtered total") {
    samples(5).foreach { events =>
      val df = events.toDF("uid", "etype")
      val total = df.filter(col("etype").isin(eventTypes: _*)).count()
      eventTypes.map(t => df.filter(col("etype") === t).count()).sum shouldBe total
    }
  }

  test("matrix merge of any disjoint split equals the whole-log matrix") {
    samples(3).zipWithIndex.foreach { case (events, i) =>
      val pivotUid = (i % 8) + 1L
      val df = events.toDF("uid", "etype")
      val a = PivotMatrix.countMatrix(
        df.filter(col("uid") <= pivotUid), "uid", "etype", eventTypes)
      val b = PivotMatrix.countMatrix(
        df.filter(col("uid") > pivotUid), "uid", "etype", eventTypes)
      val merged = PivotMatrix.mergeMatrices(a, b, "uid")
      val whole = PivotMatrix.countMatrix(df, "uid", "etype", eventTypes)
      rows(merged.exceptAll(whole)) shouldBe empty
      rows(whole.exceptAll(merged)) shouldBe empty
    }
  }
}
