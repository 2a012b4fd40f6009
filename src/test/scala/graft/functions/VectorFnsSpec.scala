package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorFnsSpec extends SparkSpec {
  import spark.implicits._

  test("native cosine matches hand-computed values") {
    val df = Seq(
      (Array(1f, 0f), Array(0f, 1f), 0.0),        // orthogonal
      (Array(1f, 2f, 3f), Array(1f, 2f, 3f), 1.0), // identical
      (Array(1f, 0f), Array(-1f, 0f), -1.0)        // opposite
    ).toDF("a", "b", "expected")
    rows(df.select(col("expected"), VectorFns.cosine(col("a"), col("b")).as("got")))
      .foreach(r => r.getDouble(1) shouldBe r.getDouble(0) +- 1e-12)
  }

  test("native cosine: zero vector → 0.0; length mismatch and null → NULL") {
    eval1(Seq((Array(0f, 0f), Array(1f, 2f))).toDF("a", "b")
      .select(VectorFns.cosine(col("a"), col("b")))) shouldBe 0.0
    // mismatched dims: NULL, matching the HOF fold's zip_with padding
    eval1(Seq((Array(1f), Array(1f, 2f))).toDF("a", "b")
      .select(VectorFns.cosine(col("a"), col("b")))) shouldBe null.asInstanceOf[Any]
    val withNull = Seq((Some(Array(1f)), Option.empty[Array[Float]]))
      .toDF("a", "b").select(VectorFns.cosine(col("a"), col("b")))
    eval1(withNull) shouldBe null.asInstanceOf[Any]
  }

  test("differential: native expression == higher-order composition on real embeddings") {
    val e = graft.Tables.embeddings(spark, sfDir)
    val a = e.select(col("vec_id").as("ia"), col("embedding").as("va")).limit(40)
    val b = e.select(col("vec_id").as("ib"), col("embedding").as("vb")).limit(40)
    val diff = a.crossJoin(b)
      .select(abs(VectorFns.cosine(col("va"), col("vb"))
        - VectorFns.cosineHof(col("va"), col("vb"))).as("d"))
      .agg(max(col("d")))
    assert(rows(diff).head.getDouble(0) < 1e-9)
  }

  test("sq_dist_micro: native == HOF bitwise on real micro vectors; NULL/mismatch rules") {
    // the assignment kernel under the whole vector-index family —
    // exact integers, so native and HOF must agree BITWISE
    val e = graft.Tables.embeddings(spark, sfDir)
    val m = e.select(col("vec_id").as("ia"),
      graft.operators.KMeans.microVec(col("embedding")).as("va")).limit(30)
    val n = e.select(col("vec_id").as("ib"),
      graft.operators.KMeans.microVec(col("embedding")).as("vb")).limit(30)
    val diff = m.crossJoin(n)
      .select((VectorFns.sqDistMicro(col("va"), col("vb"))
        =!= VectorFns.sqDistMicroHof(col("va"), col("vb"))).as("ne"))
      .agg(sum(when(col("ne"), 1L).otherwise(0L)))
    rows(diff).head.getLong(0) shouldBe 0L
    // hand values + the NULL rules (mismatched length, NULL element)
    eval1(Seq((Array(1L, 5L), Array(4L, 1L))).toDF("a", "b")
      .select(VectorFns.sqDistMicro(col("a"), col("b"))))
      .asInstanceOf[Long] shouldBe 25L // 9 + 16
    assert(eval1(Seq((Array(1L, 5L), Array(4L))).toDF("a", "b")
      .select(VectorFns.sqDistMicro(col("a"), col("b")))) == null)
    assert(eval1(Seq((Seq(Some(1L), None), Seq(Some(1L), Some(2L))))
      .toDF("a", "b")
      .select(VectorFns.sqDistMicro(col("a"), col("b")))) == null)
    // SQL-registered through the extension surface like its siblings
    graft.GraftExtensions.register(spark)
    Seq((Array(1L, 5L), Array(4L, 1L))).toDF("a", "b")
      .createOrReplaceTempView("sqd_v")
    spark.sql("SELECT sq_dist_micro(a, b) AS d FROM sqd_v")
      .collect().head.getLong(0) shouldBe 25L
  }

  test("native cosine accepts array<double> too") {
    eval1(Seq((Array(1.0, 2.0), Array(1.0, 2.0))).toDF("a", "b")
      .select(VectorFns.cosine(col("a"), col("b"))))
      .asInstanceOf[Double] shouldBe 1.0 +- 1e-12
  }

  test("interpreted eval path agrees with codegen (expression used inside a non-codegen context)") {
    // Window partitioning forces some exprs through interpreted eval;
    // simpler: disable WSCG for one query and compare.
    val e = graft.Tables.embeddings(spark, sfDir).limit(10)
    val pairs = e.select(col("vec_id").as("i"), col("embedding").as("va"))
      .crossJoin(e.select(col("vec_id").as("j"), col("embedding").as("vb")))
    val expr = round(VectorFns.cosine(col("va"), col("vb")), 9).as("sim")
    val on = pairs.select(col("i"), col("j"), expr).orderBy("i", "j").collect()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val off = pairs.select(col("i"), col("j"), expr).orderBy("i", "j").collect()
      on.toSeq shouldBe off.toSeq
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("dotHof and l2Norm") {
    eval1(Seq((Array(1f, 2f), Array(3f, 4f))).toDF("a", "b")
      .select(VectorFns.dotHof(col("a"), col("b")))) shouldBe 11.0
    eval1(Seq(Array(3f, 4f)).toDF("a")
      .select(VectorFns.l2Norm(col("a")))) shouldBe 5.0
  }

  test("native dot product == HOF fold bitwise on real embeddings; SQL-registered") {
    val e = graft.Tables.embeddings(spark, sfDir)
    val a = e.select(col("vec_id").as("ia"), col("embedding").as("va")).limit(40)
    val b = e.select(col("vec_id").as("ib"), col("embedding").as("vb")).limit(40)
    // identical sequential fold → identical doubles, so EXACT equality
    val diff = a.crossJoin(b)
      .filter(VectorFns.dot(col("va"), col("vb"))
        =!= VectorFns.dotHof(col("va"), col("vb")))
    diff.count() shouldBe 0L

    eval1(Seq((Array(1f, 2f), Array(3f, 4f))).toDF("a", "b")
      .select(VectorFns.dot(col("a"), col("b")))) shouldBe 11.0
    // length mismatch is NULL (= the HOF fold), not a scan-poisoning throw
    eval1(Seq((Array(1f, 2f, 3f), Array(1f, 2f))).toDF("a", "b")
      .select(VectorFns.dot(col("a"), col("b")))) shouldBe null.asInstanceOf[Any]

    graft.GraftExtensions.register(spark)
    Seq((Array(1f, 2f), Array(3f, 4f))).toDF("a", "b").createOrReplaceTempView("dot_v")
    spark.sql("SELECT dot_product(a, b) AS d FROM dot_v")
      .collect().head.getDouble(0) shouldBe 11.0
  }

  test("NULL array elements yield NULL, never a silently-zeroed score (native == HOF)") {
    val df = Seq((Array[java.lang.Float](1f, null), Array[java.lang.Float](2f, 3f)))
      .toDF("a", "b")
    for (e <- Seq(VectorFns.dot(col("a"), col("b")),
                  VectorFns.dotHof(col("a"), col("b")),
                  VectorFns.cosine(col("a"), col("b")),
                  VectorFns.cosineHof(col("a"), col("b")))) {
      val r = df.select(e.as("v")).collect().head
      assert(r.isNullAt(0), s"expected NULL for $e, got ${r.get(0)}")
    }
  }
}
