package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}

/** [[WarcRecords]] — the archive mouth of the crawl-to-tensor story.
  * q180 proves engine parity on the well-formed ASCII fixture; this
  * spec pins the byte-true behavior SQL replay cannot reach:
  * content-length-driven payload cuts on adversarial and multibyte
  * payloads, the fail-soft boundary rule, and the binaryFile
  * integration. */
class WarcRecordsSpec extends SparkSpec {
  import spark.implicits._

  private def record(uri: String, payload: Array[Byte],
                     warcType: String = "response",
                     declaredLen: Option[Long] = None): Array[Byte] = {
    val hdr = (s"WARC/1.0\r\nWARC-Type: $warcType\r\n" +
      s"WARC-Target-URI: $uri\r\n" +
      s"Content-Length: ${declaredLen.getOrElse(payload.length.toLong)}\r\n" +
      "\r\n").getBytes("ISO-8859-1")
    hdr ++ payload ++ "\r\n\r\n".getBytes("ISO-8859-1")
  }

  private def split(bytes: Array[Byte]) =
    WarcRecords.splitRecords(
      Seq(("a1", bytes)).toDF("path", "content"), "path", "content")

  test("records split on declared Content-Length; headers parse; order is byte order") {
    val bytes = record("https://x.example/1", "<p>one</p>".getBytes("UTF-8")) ++
      record("https://x.example/2", "<p>two</p>".getBytes("UTF-8"),
        warcType = "metadata")
    val rows = split(bytes)
      .orderBy("record_idx")
      .select("record_idx", "warc_type", "target_uri", "content_length")
      .as[(Int, String, String, Long)].collect()
    rows shouldBe Array(
      (0, "response", "https://x.example/1", 10L),
      (1, "metadata", "https://x.example/2", 10L))
  }

  test("a payload CONTAINING the record marker stays ONE payload (content-length, not delimiter)") {
    // the adversarial case a split-on-marker parser mis-splits: a page
    // quoting a WARC record verbatim
    val evil = "<pre>WARC/1.0\r\nContent-Length: 0\r\n\r\n</pre>"
      .getBytes("UTF-8")
    val bytes = record("https://x.example/evil", evil) ++
      record("https://x.example/after", "<p>ok</p>".getBytes("UTF-8"))
    val rows = split(bytes).orderBy("record_idx")
      .select(col("target_uri"), col("payload").cast("string"))
      .as[(String, String)].collect()
    rows.length shouldBe 2
    rows(0)._2 should include("WARC/1.0")
    rows(1) shouldBe ("https://x.example/after", "<p>ok</p>")
  }

  test("Content-Length counts OCTETS: multibyte payloads cut on the byte, decode intact") {
    val multi = "héllo — ünïcode"
    val p = multi.getBytes("UTF-8")
    p.length should be > multi.length // multibyte for real
    val bytes = record("https://x.example/m", p) ++
      record("https://x.example/n", "tail".getBytes("UTF-8"))
    val rows = split(bytes).orderBy("record_idx")
      .select(col("content_length"), col("payload").cast("string"))
      .as[(Long, String)].collect()
    rows(0) shouldBe (p.length.toLong, multi)
    rows(1)._2 shouldBe "tail"
  }

  test("fail-soft: records before structural damage emit, nothing after invents rows") {
    // damage class 1: declared length past end-of-file (truncated tail)
    val truncated = record("https://x.example/1", "ok".getBytes("UTF-8")) ++
      record("https://x.example/2", "lost".getBytes("UTF-8"),
        declaredLen = Some(10000L))
    split(truncated).count() shouldBe 1L
    // damage class 2: garbage between records stops the scan
    val garbage = record("https://x.example/1", "ok".getBytes("UTF-8")) ++
      "not a record".getBytes("UTF-8") ++
      record("https://x.example/2", "x".getBytes("UTF-8"))
    split(garbage).count() shouldBe 1L
    // damage class 3: missing Content-Length
    val noLen = ("WARC/1.0\r\nWARC-Type: response\r\n\r\npayload"
      ).getBytes("ISO-8859-1")
    split(noLen).count() shouldBe 0L
    // null/empty archives yield zero rows, not a crash
    split(Array.empty[Byte]).count() shouldBe 0L
    WarcRecords.splitRecords(
      Seq(("p", null.asInstanceOf[Array[Byte]])).toDF("path", "content"),
      "path", "content").count() shouldBe 0L
  }

  test("toCrawlDocs: response/NULL-type records with URIs become (doc_id, url, html); bookkeeping drops") {
    val bytes =
      ("WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\ninfo\r\n\r\n"
        ).getBytes("ISO-8859-1") ++
      record("https://x.example/1", "<p>doc</p>".getBytes("UTF-8")) ++
      // minimal writer: no WARC-Type, EOF right after the payload
      ("WARC/1.0\r\nWARC-Target-URI: https://x.example/2\r\n" +
        "Content-Length: 8\r\n\r\n<p>b</p>").getBytes("ISO-8859-1")
    val docs = WarcRecords.toCrawlDocs(
      Seq(("a", bytes)).toDF("path", "content"))
    val rows = docs.orderBy("url").select("url", "html")
      .as[(String, String)].collect()
    rows.map(_._1) shouldBe Array("https://x.example/1", "https://x.example/2")
    rows(0)._2 shouldBe "<p>doc</p>"
    // ids are the deterministic (archive, record position) hash —
    // integral, stable across runs
    docs.select(col("doc_id")).as[Long].collect() should have size 2
  }

  test("toCrawlDocs: HTTP envelopes strip to the body; bare HTML passes; duplicate URIs keep distinct ids") {
    val uri = "https://x.example/page"
    val envBody = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
      "X-Crawler: bot\r\n\r\n<p>env</p>"
    val headerOnly = "HTTP/1.1 304 Not Modified\r\nETag: \"x\""
    val bytes =
      record(uri, envBody.getBytes("UTF-8")) ++
      record(uri, "<p>bare</p>".getBytes("UTF-8")) ++ // re-crawl, bare HTML
      record("https://x.example/304", headerOnly.getBytes("UTF-8"))
    val docs = WarcRecords.toCrawlDocs(
        Seq(("a", bytes)).toDF("path", "content"))
      .orderBy("doc_id")
    val rows = docs.select("doc_id", "url", "html")
      .as[(Long, String, String)].collect()
    rows should have size 3
    // the application/http envelope never reaches the html column...
    rows.map(_._3).sorted shouldBe Array("", "<p>bare</p>", "<p>env</p>")
    rows.map(_._3).foreach(h => h should not include "HTTP/1.1")
    // ...and the SAME uri crawled twice yields two DISTINCT doc ids
    // (the advice-flagged collision source: uri-keyed hashing)
    rows.filter(_._2 == uri).map(_._1).distinct should have size 2
  }

  test("toCrawlDocs under readStream: file-backed stream output ≡ batch output") {
    // the scaladoc's claim, proven: the scanner is a stateless
    // mapPartitions over binaryFile rows, so the SAME code path serves
    // batch backfill and live ingest — record for record
    val dir = Files.createTempDirectory("graft_warc_stream")
    Files.write(Paths.get(dir.toString, "a.warc"),
      record("https://s.example/1", "<p>a</p>".getBytes("UTF-8")) ++
        record("https://s.example/1", // re-crawl in the same archive
          ("HTTP/1.1 200 OK\r\n\r\n<p>a2</p>").getBytes("UTF-8")))
    Files.write(Paths.get(dir.toString, "b.warc"),
      record("https://s.example/2", "<p>b</p>".getBytes("UTF-8")))
    // binaryFile's FIXED source schema, stated explicitly (streaming
    // file sources never infer)
    val binSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "path STRING, modificationTime TIMESTAMP, length LONG, content BINARY")
    val streamed = WarcRecords.toCrawlDocs(
      spark.readStream.format("binaryFile").schema(binSchema)
        .option("pathGlobFilter", "*.warc").load(dir.toString))
    val q = streamed.writeStream.format("memory")
      .queryName("warc_stream_docs").outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("ckpt_warc_stream").toString)
      .start()
    try q.processAllAvailable() finally q.stop()
    val live = spark.table("warc_stream_docs")
      .select("doc_id", "url", "html").as[(Long, String, String)]
      .collect().sortBy(_._1)
    val batch = WarcRecords.toCrawlDocs(
        BinaryFileSource(dir.toString, pathGlobFilter = Some("*.warc"))
          .read(spark))
      .select("doc_id", "url", "html").as[(Long, String, String)]
      .collect().sortBy(_._1)
    live should have size 3
    live shouldBe batch
  }

  test("binaryFile → splitRecords: archives read from disk, one scan per file, no shuffle") {
    val dir = Files.createTempDirectory("graft_warc")
    Files.write(Paths.get(dir.toString, "a.warc"),
      record("https://x.example/1", "<p>a</p>".getBytes("UTF-8")))
    Files.write(Paths.get(dir.toString, "b.warc"),
      record("https://x.example/2", "<p>b</p>".getBytes("UTF-8")) ++
        record("https://x.example/3", "<p>c</p>".getBytes("UTF-8")))
    val archives = BinaryFileSource(dir.toString,
      pathGlobFilter = Some("*.warc")).read(spark)
    val recs = WarcRecords.splitRecords(archives, "path", "content")
    recs.count() shouldBe 3L
    // narrow pass: the physical plan has no exchange before the scan
    val plan = recs.queryExecution.executedPlan.toString
    plan should not include "Exchange"
  }
}
