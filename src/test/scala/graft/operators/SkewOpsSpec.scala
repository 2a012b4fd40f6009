package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewOpsSpec extends SparkSpec {
  import spark.implicits._

  // skewed fact: one hot key with 900 rows, tail keys with a few
  private lazy val fact = (
    (1 to 900).map(i => ("hot", i.toLong)) ++
    (1 to 30).map(i => (s"k${i % 5}", i.toLong))
  ).toDF("key", "v")
  private lazy val dim = Seq(
    ("hot", "H"), ("k0", "A"), ("k1", "B"), ("k2", "C"), ("k3", "D"), ("k4", "E")
  ).toDF("key", "label")

  test("saltedJoin equals the plain inner join") {
    val plain = fact.join(dim, Seq("key")).select("key", "v", "label")
    val salted = SkewOps.saltedJoin(fact, dim, "key", salts = 8)
      .select("key", "v", "label")
    rows(salted.exceptAll(plain)) shouldBe empty
    rows(plain.exceptAll(salted)) shouldBe empty
    salted.count() shouldBe plain.count()
  }

  test("saltedJoin spreads the hot key across salt buckets") {
    val salteds = fact.withColumn("__salt",
      pmod(xxhash64(struct(fact.columns.map(col): _*)), lit(8)).cast("int"))
      .filter(col("key") === "hot")
      .select("__salt").distinct().count()
    assert(salteds >= 6, s"hot key landed in only $salteds/8 salt buckets")
  }

  test("twoPhaseCountDistinct equals countDistinct") {
    val direct = fact.groupBy("key").agg(countDistinct(col("v")).as("n_distinct_v"))
    val phased = SkewOps.twoPhaseCountDistinct(fact, "key", "v")
    rows(phased.exceptAll(direct)) shouldBe empty
    rows(direct.exceptAll(phased)) shouldBe empty
  }

  test("twoPhaseCountDistinct ignores NULL values like countDistinct") {
    // countDistinct skips NULLs; a key whose values are ALL null must
    // still appear, with count 0 (ADVICE r1: distinct used to keep the
    // (key, NULL) row and count it as a distinct value).
    val withNulls = Seq(
      ("a", Option("x")), ("a", Option("x")), ("a", Option.empty[String]),
      ("b", Option.empty[String]), ("b", Option.empty[String])
    ).toDF("key", "v")
    val direct = withNulls.groupBy("key")
      .agg(countDistinct(col("v")).as("n_distinct_v"))
    val phased = SkewOps.twoPhaseCountDistinct(withNulls, "key", "v")
    rows(phased.exceptAll(direct)) shouldBe empty
    rows(direct.exceptAll(phased)) shouldBe empty
    rows(phased.orderBy("key")).map(r => (r.getString(0), r.getLong(1))) shouldBe
      Seq(("a", 1L), ("b", 0L))
  }

  test("saltedSum equals plain sum") {
    val direct = fact.groupBy("key").agg(sum(col("v")).as("sum_v"))
    val salted = SkewOps.saltedSum(fact, "key", "v", salts = 8)
    rows(salted.exceptAll(direct)) shouldBe empty
    rows(direct.exceptAll(salted)) shouldBe empty
  }
}
