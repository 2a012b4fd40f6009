package graft.io

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import java.nio.file.Files

class IoSpec extends SparkSpec {
  import spark.implicits._

  test("parquet/json/csv sources round-trip through their sinks") {
    val dir = Files.createTempDirectory("graft_io").toString
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "name", "x")

    ParquetSink(s"$dir/p").write(df)
    rows(ParquetSource(s"$dir/p").read(spark).orderBy("id")) shouldBe rows(df.orderBy("id"))

    df.write.json(s"$dir/j")
    val j = JsonSource(s"$dir/j", Some(df.schema)).read(spark)
    rows(j.select("id", "name", "x").orderBy("id")) shouldBe rows(df.orderBy("id"))

    df.write.option("header", "true").csv(s"$dir/c")
    val c = CsvSource(s"$dir/c", header = true, Some(df.schema)).read(spark)
    rows(c.select("id", "name", "x").orderBy("id")) shouldBe rows(df.orderBy("id"))
  }

  test("ORC round-trips through the generic format source/sink") {
    // Spark's second columnar format needs no dedicated classes: the
    // generic connector pair covers it via the path option.
    val dir = Files.createTempDirectory("graft_io_orc").toString
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "name", "x")
    FormatSink("orc", Map("path" -> s"$dir/o"),
      org.apache.spark.sql.SaveMode.Overwrite).write(df)
    rows(FormatSource("orc", Map("path" -> s"$dir/o")).read(spark)
      .orderBy("id")) shouldBe rows(df.orderBy("id"))
  }

  test("dedicated ORC source/sink: parquet-equal pushdown and pruning reach the scan") {
    val dir = Files.createTempDirectory("graft_io_orc2").toString
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5))
      .toDF("id", "name", "x")
    OrcSink(s"$dir/o", coalesceTo = Some(1)).write(df)
    val q = OrcSource(s"$dir/o").read(spark)
      .filter(org.apache.spark.sql.functions.col("id") > 1)
      .select("name")
    rows(q.orderBy("name")).map(_.getString(0)) shouldBe Seq("b", "c")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThan(id,1)"), plan)
    assert(!plan.contains("ReadSchema: struct<id:bigint,name:string,x"),
      "x column not pruned:\n" + plan)
  }

  test("binaryFile source: one row per file, exact bytes, glob filter — feeds multimodal dedup") {
    val dir = Files.createTempDirectory("graft_io_bin")
    def put(name: String, bytes: Array[Byte]): Unit =
      Files.write(dir.resolve(name), bytes)
    put("a.img", Array[Byte](1, 2, 3))
    put("b.img", Array[Byte](9, 9))
    put("dup.img", Array[Byte](1, 2, 3)) // byte-identical to a.img
    put("skip.txt", Array[Byte](7))      // filtered out by the glob
    val df = BinaryFileSource(dir.toString, pathGlobFilter = Some("*.img"))
      .read(spark)
    df.count() shouldBe 3
    // the oversize guard DROPS big objects (never truncates, never
    // fails the scan): only b.img is within 2 bytes
    BinaryFileSource(dir.toString, pathGlobFilter = Some("*.img"),
      maxBytes = Some(2L)).read(spark).count() shouldBe 1
    val byName = df.collect().map(r =>
      r.getString(r.fieldIndex("path")).split('/').last ->
        r.getAs[Array[Byte]]("content")).toMap
    byName("a.img").toSeq shouldBe Seq[Byte](1, 2, 3)
    byName("b.img").toSeq shouldBe Seq[Byte](9, 9)
    // composes with the multimodal payload dedup: the byte-identical
    // pair collapses
    import spark.implicits._
    val media = df.select(
      org.apache.spark.sql.functions
        .row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy("path")).cast("long").as("media_id"),
      org.apache.spark.sql.functions.lit("image").as("kind"),
      org.apache.spark.sql.functions.col("content").as("payload"))
      .as[graft.multimodal.Multimodal.Media]
    val groups = rows(graft.multimodal.Multimodal.dedupePayloads(media))
    groups.map(_.getLong(2)).sorted shouldBe Seq(1L, 2L)
  }

  test("fromBinaryFiles: real on-disk media (PNG/BMP/WAV) → Media shape → unified originality gate, end to end") {
    import graft.multimodal.{AudioWave, Multimodal, PerceptualHash}
    import org.apache.spark.sql.functions.{col, xxhash64, lit}
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_io_media")
    def put(name: String, bytes: Array[Byte]): java.nio.file.Path =
      Files.write(dir.resolve(name), bytes)
    // a REAL rendered image, its BMP re-encode (zero shared bytes),
    // a REAL 16-bit WAV, its 8-bit re-master, and a non-media file
    put("orig.png", PerceptualHash.renderGrayImage(16, 16, 28, 5, 5, 1, 0, "png"))
    put("copy.bmp", PerceptualHash.renderGrayImage(16, 16, 28, 5, 5, 1, 0, "bmp"))
    val samples = Array.tabulate(1024) { t =>
      val w = t / 16
      (t % 64 - 32) * (if ((w * w + 5 * w) % 97 < 32) 4 else 1) * 256
    }
    put("orig.wav", AudioWave.writeWav(samples, 16000, 16))
    put("remaster.wav", AudioWave.writeWav(samples, 16000, 8))
    def vid(range: Range) = Multimodal.packImageFrames(range.map(f =>
      PerceptualHash.renderGrayImage(16, 16, 7, f % 5 + 1,
        (2 * f) % 11 + 1, f % 3, 0, "png")))
    put("orig.gfv", vid(0 to 5))
    put("trimmed.gfv", vid(1 to 5))
    put("notes.txt", "just text".getBytes("UTF-8"))
    val media = Multimodal.fromBinaryFiles(
      BinaryFileSource(dir.toString).read(spark))
    // kind comes from the payload's OWN magic, never the extension;
    // mtime rides along (the event-time column a stream watermarks)
    val byName = media.collect().map(r => (
      r.getAs[String]("path").split('/').last,
      (r.getAs[Long]("media_id"), r.getAs[String]("kind"),
        r.getAs[java.sql.Timestamp]("mtime")))).toMap
    byName("orig.png")._2 shouldBe "image"
    byName("copy.bmp")._2 shouldBe "image"
    byName("orig.wav")._2 shouldBe "audio"
    byName("remaster.wav")._2 shouldBe "audio"
    byName("orig.gfv")._2 shouldBe "video"
    byName("trimmed.gfv")._2 shouldBe "video"
    byName("notes.txt")._2 shouldBe "bin"
    byName.values.foreach(_._3 should not be null)
    byName.values.map(_._1).toSet should have size 7 // distinct ids
    // end to end: each file is its own doc; exactly ONE of each
    // re-encode pair survives the unified gate (keep-smallest elects
    // by the hashed id — which member wins is arbitrary but unique),
    // and the non-media file passes (a 'bin' kind has no perceptual
    // leg — byte election alone judges it)
    val docs = media.select(col("media_id").as("doc_id"), col("path"))
    val kept = Multimodal.dropAllDuplicateMediaDocs(docs, "doc_id",
        media, "media_id", "media_id", "kind", "payload")
      .select(col("path")).as[String].collect()
      .map(_.split('/').last).sorted
    kept should have size 4
    kept should contain ("notes.txt")
    kept.count(_.matches("(orig\\.png|copy\\.bmp)")) shouldBe 1
    kept.count(_.endsWith(".wav")) shouldBe 1
    kept.count(_.endsWith(".gfv")) shouldBe 1
  }

  test("partitioned JSON sink lays out Hive-style partition dirs") {
    val dir = Files.createTempDirectory("graft_io_part").toString
    val df = Seq(("20240101", 1L), ("20240101", 2L), ("20240102", 3L))
      .toDF("p_date", "id")
    PartitionedJsonSink(s"$dir/out", Seq("p_date")).write(df)
    val subdirs = new java.io.File(s"$dir/out").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    subdirs shouldBe Array("p_date=20240101", "p_date=20240102")
    // partition pruning: reading one partition touches only that dir
    val back = spark.read.json(s"$dir/out").filter(col("p_date") === "20240101")
    back.count() shouldBe 2
    val scanned = back.queryExecution.executedPlan.toString
    assert(scanned.contains("PartitionFilters"), scanned)
  }

  test("parquet sink coalesceTo compacts to N files") {
    val dir = Files.createTempDirectory("graft_io_coal").toString
    val df = spark.range(0, 1000, 1, 8).toDF("id")
    ParquetSink(s"$dir/one", coalesceTo = Some(1)).write(df)
    new java.io.File(s"$dir/one").listFiles()
      .count(_.getName.endsWith(".parquet")) shouldBe 1
  }

  test("kafka source option assembly incl. per-partition offsets JSON") {
    val s = KafkaSource("broker:9092", "events", streaming = false,
      perPartitionOffsets = Map(0 -> 100L, 1 -> 250L))
    s.options("startingOffsets") shouldBe """{"events":{"0":100,"1":250}}"""
    s.options("subscribe") shouldBe "events"
    s.options("kafka.bootstrap.servers") shouldBe "broker:9092"
    KafkaSource("b", "t", streaming = true).options("startingOffsets") shouldBe "earliest"
    // failOnDataLoss is a SOURCE option (the sink API has no such knob)
    KafkaSource("b", "t", streaming = true, failOnDataLoss = false)
      .options("failOnDataLoss") shouldBe "false"
    KafkaStreamSink("b", "t", "/tmp/c").options should not contain key("failOnDataLoss")
  }

  test("jdbc source/sink option assembly incl. partitioned read") {
    val src = JdbcSource("jdbc:postgresql://h/db", "clients", "u", "p",
      "org.postgresql.Driver", Some("id"), Some(0L), Some(1000L), Some(8))
    src.options("partitionColumn") shouldBe "id"
    src.options("numPartitions") shouldBe "8"
    JdbcSink("jdbc:postgresql://h/db", "out", "u", "p", "d")
      .options("dbtable") shouldBe "out"
  }

  test("JdbcDdl executes out-of-band statements on a live JDBC session (K6)") {
    // Derby ships with Spark, so the helper is exercised against a real
    // database: DDL + DML through JdbcDdl, then the table read back
    // through the ordinary Spark JDBC source — proving the statements
    // committed in the same database the engine would then scan.
    val url = "jdbc:derby:memory:graftddl;create=true"
    val drv = "org.apache.derby.jdbc.EmbeddedDriver"
    JdbcDdl.execute(url, "", "", drv,
      "CREATE TABLE marts (id INT PRIMARY KEY, name VARCHAR(32))") shouldBe false
    JdbcDdl.execute(url, "", "", drv,
      "INSERT INTO marts VALUES (1, 'clients'), (2, 'features')") shouldBe false
    val back = spark.read.format("jdbc")
      .options(Map("url" -> url, "dbtable" -> "marts", "driver" -> drv))
      .load().orderBy("id")
    rows(back).map(r => (r.getInt(0), r.getString(1))) shouldBe
      Seq((1, "clients"), (2, "features"))
    // the reference's GRANT shape (data_mart.scala:149-151); Derby needs
    // sqlAuthorization to accept GRANTs so the statement text is pinned
    // rather than executed
    JdbcDdl.grantSelect("clients_mart", "checker") shouldBe
      "GRANT SELECT ON clients_mart TO checker"
  }

  test("kafka stream sink serializes whole rows to a JSON value column") {
    val sink = KafkaStreamSink("b:9092", "out", "/tmp/ckpt")
    val df = Seq((1L, "x", 2.5)).toDF("id", "name", "v")
    val ser = sink.serialize(df)
    ser.columns.toSeq shouldBe Seq("value")
    eval1(ser) shouldBe """{"id":1,"name":"x","v":2.5}"""
    an[UnsupportedOperationException] should be thrownBy sink.write(df)
  }

  test("source substitution redirects a connector source to parquet") {
    val dir = Files.createTempDirectory("graft_io_sub").toString
    Seq((1L, "a")).toDF("id", "v").write.parquet(s"$dir/standin")
    spark.conf.set("spark.graft.io.substitute.kafka_events", s"$dir/standin")
    try {
      val df = Source.substituted(spark, "kafka_events",
        KafkaSource("unreachable:9092", "t", streaming = false))
      rows(df).map(_.getLong(0)) shouldBe Seq(1L)
    } finally spark.conf.unset("spark.graft.io.substitute.kafka_events")
  }

  test("EventLogSplit writes complementary date-partitioned branches (filter.scala semantics)") {
    val dir = Files.createTempDirectory("graft_els").toString
    val out = EventLogSplit.run(spark, sfDir, dir.toString)
    out.keySet shouldBe Set("view", "purchase")
    val events = Tables.events(spark, sfDir)
    val nView = events.filter(col("event_type") === "view").count()
    val nBuy = events.filter(col("event_type") === "purchase").count()
    spark.read.json(out("view")).count() shouldBe nView
    spark.read.json(out("purchase")).count() shouldBe nBuy
    // partition layout present
    assert(new java.io.File(out("view")).listFiles()
      .exists(f => f.isDirectory && f.getName.startsWith("p_date=")))
  }
}
