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
    // damage class 1b, hostile: a tiny archive DECLARING a huge
    // payload must cost its real few bytes, not a declared-length
    // pre-allocation (the streaming parser grows by bytes received)
    val hostile = record("https://x.example/1", "ok".getBytes("UTF-8")) ++
      record("https://x.example/2", "tiny".getBytes("UTF-8"),
        declaredLen = Some(900L * 1024 * 1024))
    split(hostile).count() shouldBe 1L
    // and a length past the absurdity cap is a structural violation
    val absurd = record("https://x.example/1", "ok".getBytes("UTF-8")) ++
      record("https://x.example/2", "tiny".getBytes("UTF-8"),
        declaredLen = Some(3L * 1024 * 1024 * 1024))
    split(absurd).count() shouldBe 1L
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

  test("chunked HTTP payloads de-chunk: no hex framing, no trailers, byte-accurate across chunk splits") {
    def chunk(data: Array[Byte], ext: String = ""): Array[Byte] =
      (data.length.toHexString + ext + "\r\n").getBytes("ISO-8859-1") ++
        data ++ "\r\n".getBytes("ISO-8859-1")
    val body = "<p>héllo — chunked</p>"
    val full = body.getBytes("UTF-8")
    full.length should be > body.length // multibyte for real
    // split INSIDE the 2-byte é (bytes 4..5 of "<p>h é ..."): chunk
    // sizes count octets, so a string-domain de-chunker would corrupt
    // this boundary
    val (c1, rest) = full.splitAt(5)
    val (c2, c3) = rest.splitAt(7)
    val msg =
      ("HTTP/1.1 200 OK\r\ncontent-type: text/html\r\n" +
        "Transfer-Encoding: CHUNKED\r\n\r\n").getBytes("ISO-8859-1") ++
      chunk(c1) ++ chunk(c2, ext = ";ext=v") ++ chunk(c3) ++
      "0\r\nX-Trailer: t\r\n\r\n".getBytes("ISO-8859-1")
    val docs = WarcRecords.toCrawlDocs(
      Seq(("a", record("https://x.example/c", msg))).toDF("path", "content"))
    val html = docs.select("html").as[String].collect()
    html shouldBe Array(body)
    html.head should not include "Transfer"
    html.head should not include "Trailer"
    // a 'gzip, chunked' value list also triggers; a NON-chunked
    // envelope still takes the plain-cut path
    val msg2 = ("HTTP/1.1 200 OK\r\nTransfer-Encoding: gzip, chunked\r\n" +
      "\r\n").getBytes("ISO-8859-1") ++ chunk("<p>x</p>".getBytes("UTF-8")) ++
      "0\r\n\r\n".getBytes("ISO-8859-1")
    val plain = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
      "5\r\nnot-a-chunk").getBytes("UTF-8")
    val both = WarcRecords.toCrawlDocs(Seq(
        ("b", record("https://x.example/g", msg2) ++
          record("https://x.example/p", plain))).toDF("path", "content"))
      .orderBy("url").select("html").as[String].collect()
    both shouldBe Array("<p>x</p>", "5\r\nnot-a-chunk")
  }

  test("chunked de-chunk is fail-soft: malformed framing keeps the good prefix") {
    // malformed size line after one good chunk → good chunk survives
    val msg = ("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" +
      "4\r\ngood\r\nZZZZ\r\nnever").getBytes("ISO-8859-1")
    // declared-past-end chunk → available prefix survives
    val msg2 = ("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" +
      "ff\r\npartial").getBytes("ISO-8859-1")
    val docs = WarcRecords.toCrawlDocs(Seq(
        ("a", record("https://x.example/1", msg) ++
          record("https://x.example/2", msg2))).toDF("path", "content"))
      .orderBy("url").select("html").as[String].collect()
    docs shouldBe Array("good", "partial")
  }

  test("already-decoded body under a chunked header falls back to the plain cut") {
    // a real WARC-writer pattern: the body was stored decoded but the
    // 'Transfer-Encoding: chunked' header preserved — the first 'size
    // line' is HTML, not hex, and the old empty-prefix rule lost the
    // whole document
    val body = "<html>\r\n<p>decoded already</p>\r\n</html>"
    val msg = ("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" +
      body).getBytes("UTF-8")
    // same pattern without any CRLF inside the body (the walk finds no
    // size-line terminator at all)
    val msg2 = ("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" +
      "<p>one line, no crlf</p>").getBytes("UTF-8")
    val docs = WarcRecords.toCrawlDocs(Seq(
        ("a", record("https://x.example/1", msg) ++
          record("https://x.example/2", msg2))).toDF("path", "content"))
      .orderBy("url").select("html").as[String].collect()
    docs shouldBe Array(body, "<p>one line, no crlf</p>")
  }

  test("Content-Encoding: gzip bodies gunzip — alone, composed with chunked, and fail-soft without the magic") {
    def gz(data: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.util.zip.GZIPOutputStream(bos)
      out.write(data); out.close()
      bos.toByteArray
    }
    def chunk(data: Array[Byte]): Array[Byte] =
      (data.length.toHexString + "\r\n").getBytes("ISO-8859-1") ++
        data ++ "\r\n".getBytes("ISO-8859-1")
    val body = "<p>gzipped — prose</p>"
    // gzip alone
    val msg1 = ("HTTP/1.1 200 OK\r\nContent-Encoding: GZIP\r\n\r\n")
      .getBytes("ISO-8859-1") ++ gz(body.getBytes("UTF-8"))
    // chunked + gzip: transfer coding frames the gzip stream, and the
    // chunk boundary lands mid-stream — de-chunk MUST run first
    val gzBytes = gz(body.getBytes("UTF-8"))
    val (g1, g2) = gzBytes.splitAt(7)
    val msg2 = ("HTTP/1.1 200 OK\r\nContent-Encoding: x-gzip\r\n" +
      "Transfer-Encoding: chunked\r\n\r\n").getBytes("ISO-8859-1") ++
      chunk(g1) ++ chunk(g2) ++ "0\r\n\r\n".getBytes("ISO-8859-1")
    // declared gzip but stored decoded (no magic) → passthrough
    val msg3 = ("HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n" +
      "<p>not actually gzip</p>").getBytes("UTF-8")
    val docs = WarcRecords.toCrawlDocs(Seq(
        ("a", record("https://x.example/1", msg1) ++
          record("https://x.example/2", msg2) ++
          record("https://x.example/3", msg3))).toDF("path", "content"))
      .orderBy("url").select("html").as[String].collect()
    docs shouldBe Array(body, body, "<p>not actually gzip</p>")
    docs.foreach(h => h should not include "Encoding")
  }

  test("Content-Encoding: deflate bodies inflate — zlib-wrapped, raw, composed with chunked, and mislabeled-identity") {
    def zlib(data: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      d.setInput(data); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](256)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end(); out.toByteArray
    }
    def raw(data: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater(
        java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
      d.setInput(data); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](256)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end(); out.toByteArray
    }
    def chunk(data: Array[Byte]): Array[Byte] =
      (data.length.toHexString + "\r\n").getBytes("ISO-8859-1") ++
        data ++ "\r\n".getBytes("ISO-8859-1")
    val body = "<p>deflated — prose with ünïcode</p>"
    // zlib-wrapped (the RFC 9110 spelling)
    val msg1 = "HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n\r\n"
      .getBytes("ISO-8859-1") ++ zlib(body.getBytes("UTF-8"))
    // RAW deflate under the same label (the well-known server bug)
    val msg2 = "HTTP/1.1 200 OK\r\nContent-Encoding: Deflate\r\n\r\n"
      .getBytes("ISO-8859-1") ++ raw(body.getBytes("UTF-8"))
    // chunked + deflate, chunk boundary mid-stream: de-chunk first
    val zb = zlib(body.getBytes("UTF-8"))
    val (z1, z2) = zb.splitAt(5)
    val msg3 = ("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n" +
      "Content-Encoding: deflate\r\n\r\n").getBytes("ISO-8859-1") ++
      chunk(z1) ++ chunk(z2) ++ "0\r\n\r\n".getBytes("ISO-8859-1")
    // declared deflate but stored decoded: neither leg can start
    // decoding plain text → passthrough (no magic proves compression,
    // so the de-chunk recover-the-text rule applies — NOT gzip's
    // empty-on-magic rule)
    val msg4 = ("HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n\r\n" +
      "<p>not actually deflate</p>").getBytes("UTF-8")
    // a zlib-compressed EMPTY body: success is the stream ending
    // CLEANLY, not output being non-empty — the raw zlib bytes must
    // never ship as mojibake
    val msg5 = "HTTP/1.1 204 No Content\r\nContent-Encoding: deflate\r\n\r\n"
      .getBytes("ISO-8859-1") ++ zlib(Array.emptyByteArray)
    // a RAW-deflated empty body (0x03 0x00 — no zlib wrapper): the
    // strict finished+consumed signal trusts the clean empty decode
    val msg6 = "HTTP/1.1 204 No Content\r\nContent-Encoding: deflate\r\n\r\n"
      .getBytes("ISO-8859-1") ++ raw(Array.emptyByteArray)
    // mislabeled TEXT whose first two bytes ("x ") pass the 2-byte
    // zlib-header check (0x7820 % 31 == 0): both legs fail to decode,
    // the document must pass through, never ship as empty
    val fake = "x marks the spot — plain prose, not a zlib stream"
    val msg7 = ("HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n\r\n" +
      fake).getBytes("UTF-8")
    // the known broken-server class: zlib header STRIPPED but the
    // 4-byte Adler-32 trailer kept — a completed raw stream with a
    // checksum-sized residue is a real deflate body, not text
    val msg8 = "HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n\r\n"
      .getBytes("ISO-8859-1") ++ raw(body.getBytes("UTF-8")) ++
      Array[Byte](0x12, 0x34, 0x56, 0x78)
    val docs = WarcRecords.toCrawlDocs(Seq(
        ("a", record("https://x.example/1", msg1) ++
          record("https://x.example/2", msg2) ++
          record("https://x.example/3", msg3) ++
          record("https://x.example/4", msg4) ++
          record("https://x.example/5", msg5) ++
          record("https://x.example/6", msg6) ++
          record("https://x.example/7", msg7) ++
          record("https://x.example/8", msg8))).toDF("path", "content"))
      .orderBy("url").select("html").as[String].collect()
    docs shouldBe Array(body, body, body, "<p>not actually deflate</p>",
      "", "", fake, body)
    docs.foreach(h => h should not include "Encoding")
  }

  test("a raw-deflate body whose first bytes pass the zlib header check still decodes via the raw leg (clean second leg beats a dirty first-leg prefix)") {
    // Hand-crafted RAW deflate stream legal under RFC 1951 but NOT
    // zlib-producible: a stored non-final block with a NONZERO padding
    // bit (readers must ignore padding content), sized so the first
    // two bytes (0x08, 0x1D) pass the 2-byte zlib header check
    // (CM=8, (0x081D % 31) == 0, FDICT clear) AND the zlib
    // misinterpretation emits a non-empty garbage prefix before dying
    // (its view reads a 65506-byte stored block whose NLEN check
    // passes by construction, copies the remaining ~29 bytes as
    // "output", then exhausts input). The old dirty-prefix rule
    // returned that garbage without ever trying the raw leg; the raw
    // leg decodes the whole stream CLEANLY and must win.
    val payload = Array[Byte](0x1D, 0x00) ++
      "quietly rescued raw deflate".getBytes("ISO-8859-1") // 29 bytes
    payload.length shouldBe 29
    val stream = Array[Byte](0x08, 0x1D, 0x00, 0xE2.toByte, 0xFF.toByte) ++
      payload ++ Array[Byte](0x03, 0x00) // final empty fixed block
    // the fixture really does decode as raw deflate
    val inf = new java.util.zip.Inflater(true)
    inf.setInput(stream)
    val buf = new Array[Byte](64)
    val n = inf.inflate(buf)
    inf.finished() shouldBe true
    buf.take(n) shouldBe payload
    inf.end()
    // and the operator now recovers it instead of shipping garbage
    WarcRecords.inflateBytes(stream) shouldBe payload
  }

  test("an early-abandoned record iterator (limit) over compressed archives still yields correct rows (task-completion close covers the abandonment path)") {
    def gzMember(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val o = new java.util.zip.GZIPOutputStream(bos)
      o.write(b); o.close(); bos.toByteArray
    }
    val archive = (1 to 50).map(i => gzMember(
      record(s"https://x.example/$i", s"<p>$i</p>".getBytes("UTF-8"))))
      .reduce(_ ++ _)
    // limit() abandons the scanner mid-archive: the record must still
    // be right, and the task-completion listener (not finish(), which
    // never runs here) closes the decompressor
    val first = split(archive).limit(1)
      .select(col("payload").cast("string")).as[String].collect()
    first shouldBe Array("<p>1</p>")
  }

  test("decompression output is capped per record (zip-bomb guard) keeping the good prefix") {
    // ~256 MiB of zeros compresses to ~256 KB of gzip — uncapped, the
    // decode UDF would buffer all 256 MiB per record in executor heap
    val bombPlain = 256L * 1024 * 1024
    def gzZeros(total: Long): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.util.zip.GZIPOutputStream(bos)
      val block = new Array[Byte](1 << 20) // zeros
      var left = total
      while (left > 0) {
        val n = math.min(left, block.length.toLong).toInt
        out.write(block, 0, n); left -= n
      }
      out.close(); bos.toByteArray
    }
    val gunzipped = WarcRecords.gunzipBytes(gzZeros(bombPlain))
    gunzipped.length shouldBe WarcRecords.MaxDecodedBodyBytes
    gunzipped.forall(_ == 0) shouldBe true
    // deflate leg honors the same cap
    val d = new java.util.zip.Deflater()
    val bos = new java.io.ByteArrayOutputStream()
    val block = new Array[Byte](1 << 20)
    var left = bombPlain
    while (left > 0) {
      val n = math.min(left, block.length.toLong).toInt
      d.setInput(block, 0, n)
      if (n == left) d.finish()
      val buf = new Array[Byte](1 << 16)
      var k = d.deflate(buf)
      while (k > 0) { bos.write(buf, 0, k); k = d.deflate(buf) }
      left -= n
    }
    d.end()
    val inflated = WarcRecords.inflateBytes(bos.toByteArray)
    inflated.length shouldBe WarcRecords.MaxDecodedBodyBytes
    // a legitimate body far below the cap is untouched
    val small = "<p>small</p>".getBytes("UTF-8")
    val gz = {
      val b = new java.io.ByteArrayOutputStream()
      val o = new java.util.zip.GZIPOutputStream(b)
      o.write(small); o.close(); b.toByteArray
    }
    WarcRecords.gunzipBytes(gz) shouldBe small
  }

  test(".warc.gz and .warc.zst archives inflate transparently: member-per-record gzip, single- and multi-frame zstd, corrupt tails keep the prefix, plain archives untouched") {
    val r1 = record("https://z.example/1", "<p>one</p>".getBytes("UTF-8"))
    val r2 = record("https://z.example/2", "<p>two</p>".getBytes("UTF-8"))
    def gzMember(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val o = new java.util.zip.GZIPOutputStream(bos)
      o.write(b); o.close(); bos.toByteArray
    }
    val archives = Seq(
      // the ISO-28500 convention: ONE gzip member per record,
      // concatenated — the stream must read across member boundaries
      ("a.warc.gz", gzMember(r1) ++ gzMember(r2)),
      ("b.warc.zst", com.github.luben.zstd.Zstd.compress(r1 ++ r2)),
      ("c.warc.zst", com.github.luben.zstd.Zstd.compress(r1) ++
        com.github.luben.zstd.Zstd.compress(r2)),
      ("d.warc", r1 ++ r2), // plain passes through
      // corrupt second member: every record before it survives
      ("e.warc.gz", gzMember(r1) ++ "garbage".getBytes("UTF-8")),
      // the established .warc.zst convention: a LEADING SKIPPABLE
      // frame (magic 0x184D2A5x + LE size) carries the dictionary —
      // an unsniffed skippable start read the whole archive as
      // "plain" and produced zero records
      ("f.warc.zst", {
        val dict = "not really a dictionary".getBytes("UTF-8")
        val skip = Array[Byte](0x5E.toByte, 0x2A, 0x4D, 0x18.toByte,
          (dict.length & 0xff).toByte, 0, 0, 0) ++ dict
        skip ++ com.github.luben.zstd.Zstd.compress(r1 ++ r2)
      }))
      .toDF("path", "content")
    val docs = WarcRecords.toCrawlDocs(archives)
      .select("url", "html").as[(String, String)].collect()
    // r1 rides all six archives; r2 all but the corrupt-tail one
    docs.count(_ == ("https://z.example/1", "<p>one</p>")) shouldBe 6
    docs.count(_ == ("https://z.example/2", "<p>two</p>")) shouldBe 5
    docs should have size 11
    // ids keep the (archive, record position) rule through inflation
    WarcRecords.toCrawlDocs(archives).select("doc_id").distinct()
      .count() shouldBe 11L
  }

  test("toCrawlMedia: the media leg routes records by BODY magic — bytes intact, envelope stripped, html left to the doc leg") {
    import graft.multimodal.{AudioWave, Multimodal, PerceptualHash}
    val png = PerceptualHash.renderGrayImage(16, 16, 9, 2, 3, 0, 0, "png")
    val wav = AudioWave.writeWav(
      Array.tabulate(256)(t => ((t % 64 - 32) * 256)), 16000, 16)
    val html = "<html><body><p>a page</p></body></html>".getBytes("UTF-8")
    // the envelope case: a full HTTP message wrapping GZIPPED png
    // bytes — strip must run on BYTES (a string cast corrupts the
    // payload) and decompress per the declared coding
    val gz = {
      val b = new java.io.ByteArrayOutputStream()
      val o = new java.util.zip.GZIPOutputStream(b)
      o.write(png); o.close(); b.toByteArray
    }
    val enveloped = ("HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n")
      .getBytes("ISO-8859-1") ++ gz
    def rec(uri: String, p: Array[Byte]): Array[Byte] =
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
        "WARC-Date: 2026-02-03T04:05:06Z\r\n" +
        s"Content-Length: ${p.length}\r\n\r\n").getBytes("ISO-8859-1") ++
        p ++ "\r\n\r\n".getBytes("ISO-8859-1")
    val archive = rec("https://m.example/img", png) ++
      rec("https://m.example/wav", wav) ++
      rec("https://m.example/page", html) ++
      rec("https://m.example/wrapped", enveloped)
    val archives = Seq(("a1", archive)).toDF("path", "content")
    val media = graft.io.WarcRecords.toCrawlMedia(archives)
      .orderBy("url")
      .select(col("url"), col("kind"), col("payload"), col("mtime"))
      .as[(String, String, Array[Byte], java.sql.Timestamp)].collect()
    // html is NOT media — the doc leg owns it (both legs partition
    // the same archive by content)
    media.map(_._1) shouldBe Array("https://m.example/img",
      "https://m.example/wav", "https://m.example/wrapped")
    media.map(_._2) shouldBe Array("image", "audio", "image")
    // payload bytes survive EXACTLY (the byte-level strip rule): the
    // bare record untouched, the enveloped record stripped+gunzipped
    // back to the identical png
    media(0)._3 shouldBe png
    media(1)._3 shouldBe wav
    media(2)._3 shouldBe png
    // per-record WARC-Date became the event time
    media.map(_._4.getTime).distinct shouldBe
      Array(java.sql.Timestamp.valueOf("2026-02-03 04:05:06").getTime)
    // the DOC leg of the same archive sees the html record (and
    // UTF-8-mangles the binary ones — which is why the media leg
    // exists); ids agree across legs by the shared (archive,
    // position) rule
    val docs = graft.io.WarcRecords.toCrawlDocs(archives)
    docs.count() shouldBe 4L
    val mediaIds = graft.io.WarcRecords.toCrawlMedia(archives)
      .select("media_id").as[Long].collect().toSet
    val docIds = docs.select("doc_id").as[Long].collect().toSet
    mediaIds.subsetOf(docIds) shouldBe true
    // a record with NO WARC-Date yields NULL mtime, not a crash
    val undated =
      ("WARC/1.0\r\nWARC-Type: response\r\n" +
        "WARC-Target-URI: https://m.example/nodate\r\n" +
        s"Content-Length: ${png.length}\r\n\r\n").getBytes("ISO-8859-1") ++
        png ++ "\r\n\r\n".getBytes("ISO-8859-1")
    val row = graft.io.WarcRecords.toCrawlMedia(
        Seq(("a2", undated)).toDF("path", "content"))
      .select(col("kind"), col("mtime").isNull).as[(String, Boolean)]
      .collect()
    row shouldBe Array(("image", true))
  }

  test("toCrawlRecordsRouted: ONE scanner pass partitions the archive — media rows ≡ toCrawlMedia byte for byte, doc rows carry toCrawlDocs' text, ids shared") {
    import graft.multimodal.{AudioWave, PerceptualHash}
    val png = PerceptualHash.renderGrayImage(16, 16, 9, 2, 3, 0, 0, "png")
    val wav = AudioWave.writeWav(
      Array.tabulate(256)(t => ((t % 64 - 32) * 256)), 16000, 16)
    val html = "<html><body><p>a routed page</p></body></html>"
    val gz = {
      val b = new java.io.ByteArrayOutputStream()
      val o = new java.util.zip.GZIPOutputStream(b)
      o.write(png); o.close(); b.toByteArray
    }
    val envImg = "HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n"
      .getBytes("ISO-8859-1") ++ gz
    val envDoc = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
      html).getBytes("ISO-8859-1")
    def rec(uri: String, p: Array[Byte]): Array[Byte] =
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
        "WARC-Date: 2026-02-03T04:05:06Z\r\n" +
        s"Content-Length: ${p.length}\r\n\r\n").getBytes("ISO-8859-1") ++
        p ++ "\r\n\r\n".getBytes("ISO-8859-1")
    val archive = rec("https://r.example/img", png) ++
      rec("https://r.example/wav", wav) ++
      rec("https://r.example/page", html.getBytes("UTF-8")) ++
      rec("https://r.example/wrapped", envImg) ++
      rec("https://r.example/envpage", envDoc)
    val archives = Seq(("a1", archive)).toDF("path", "content")
    val routed = graft.io.WarcRecords.toCrawlRecordsRouted(archives)
      .orderBy("url").collect()
    routed.map(_.getAs[String]("kind")) shouldBe
      Array("doc", "image", "doc", "audio", "image")
    // media rows are BYTE-identical to the single-leg operator —
    // same strip, same sniff, same (archive, position) ids
    val viaRouted = routed.filter(_.getAs[String]("kind") != "doc")
      .map(r => (r.getAs[Long]("rec_id"), r.getAs[String]("kind"),
        r.getAs[Array[Byte]]("payload").toSeq,
        r.getAs[java.sql.Timestamp]("mtime"))).sortBy(_._1)
    val viaLeg = graft.io.WarcRecords.toCrawlMedia(archives)
      .select("media_id", "kind", "payload", "mtime")
      .as[(Long, String, Array[Byte], java.sql.Timestamp)]
      .collect().map(r => (r._1, r._2, r._3.toSeq, r._4)).sortBy(_._1)
    viaRouted shouldBe viaLeg
    // doc rows' text ≡ toCrawlDocs' html for the SAME ids (the doc
    // leg's envelope cut, byte-level then decoded), payload NULL —
    // and the routed split carries event time on docs too
    val docRows = routed.filter(_.getAs[String]("kind") == "doc")
    docRows.foreach(_.getAs[Array[Byte]]("payload") shouldBe null)
    docRows.foreach(
      _.getAs[java.sql.Timestamp]("mtime") should not be null)
    val routedDocs = docRows.map(r =>
      (r.getAs[Long]("rec_id"), r.getAs[String]("text"))).sortBy(_._1)
    val legDocs = graft.io.WarcRecords.toCrawlDocs(archives)
      .select("doc_id", "html").as[(Long, String)].collect()
      .filter(d => routedDocs.map(_._1).contains(d._1)).sortBy(_._1)
    routedDocs shouldBe legDocs
    routedDocs.map(_._2).toSet shouldBe Set(html)
    // the partition is exhaustive: every toCrawlDocs record lands in
    // exactly one leg of the routed split
    routed.length shouldBe 5
  }

  test("toCrawlDocsTimed carries modificationTime LOSSLESSLY (microseconds) and ids match the untimed read") {
    val bytes = record("https://t.example/1", "<p>t</p>".getBytes("UTF-8"))
    // a microsecond-precision mtime: the old JSON round-trip truncated
    // to milliseconds (and was session-timezone-dependent)
    val mt = java.sql.Timestamp.valueOf("2026-03-01 10:20:30.123456")
    val archives = Seq(("a1", mt, bytes))
      .toDF("path", "modificationTime", "content")
    val timed = WarcRecords.toCrawlDocsTimed(archives)
      .select("doc_id", "url", "ts")
      .as[(Long, String, java.sql.Timestamp)].collect()
    timed should have size 1
    timed.head._3 shouldBe mt
    val untimed = WarcRecords.toCrawlDocs(
        archives.select(col("path"), col("content")))
      .select("doc_id").as[Long].collect()
    timed.head._1 shouldBe untimed.head
    // NULL mtime: ts is NULL but the path must still parse back whole
    // (concat_ws skips nulls — without the coalesce the key lost its
    // separator and every null-mtime archive's record N collided)
    val nullMt = Seq(
      ("x1", null.asInstanceOf[java.sql.Timestamp],
        record("https://t.example/a", "<p>a</p>".getBytes("UTF-8"))),
      ("x2", null.asInstanceOf[java.sql.Timestamp],
        record("https://t.example/b", "<p>b</p>".getBytes("UTF-8"))))
      .toDF("path", "modificationTime", "content")
    val nt = WarcRecords.toCrawlDocsTimed(nullMt)
      .select("doc_id", "url", "ts")
      .as[(Long, String, Option[java.sql.Timestamp])].collect()
    nt.map(_._3) shouldBe Array(None, None)
    nt.map(_._1).distinct should have size 2 // ids hash the real paths
    nt.map(_._1).toSet shouldBe WarcRecords.toCrawlDocs(
        nullMt.select(col("path"), col("content")))
      .select("doc_id").as[Long].collect().toSet
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
