package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WARC-shaped crawl-archive record ingestion — the step at the very
  * MOUTH of the crawl-to-tensor story: real crawl data arrives as
  * multi-record archive files (ISO 28500: each record is a
  * `WARC/x.y` version line, `Name: value` header lines, a blank
  * line, then exactly `Content-Length` octets of payload), and this
  * operator splits those bytes into one row per record so
  * [[graft.pipelines.TrainingCorpusPipeline]]'s URL/HTML front
  * stages can start from raw archives instead of an assumed
  * (url, html) relation.
  *
  * The scanner is CONTENT-LENGTH-DRIVEN, not delimiter-driven: the
  * payload is cut at exactly the declared octet count, so a payload
  * that itself contains a `WARC/1.0` line (quoted markup, nested
  * archives — the adversarial case a split-on-marker parser
  * mis-splits) stays one payload (spec-proven). Headers are parsed
  * as ISO-8859-1 (WARC headers are ASCII by spec); payloads stay
  * raw bytes — decode where consumed (`payload.cast("string")` is
  * the UTF-8 read).
  *
  * Fail-soft boundary rule: records parse sequentially until the
  * first structural violation (missing version marker, unparseable
  * or missing Content-Length, declared length past end-of-file);
  * everything before the damage is emitted, everything after is
  * dropped — a truncated tail must not invent records, and a
  * crawl ingest wants the good prefix, not a failed file.
  *
  * Scale shape: a pure narrow per-row pass (`mapPartitions` over the
  * archive rows — genuinely imperative byte scanning, the documented
  * last-resort case), no shuffle, no driver materialization; records
  * stream out of a lazy iterator, and compressed archives inflate AS
  * A STREAM — executor memory is bounded by the COMPRESSED file
  * (binaryFile's content, capped by [[BinaryFileSource]]'s `maxBytes`
  * guard) plus ONE record in flight, never the inflated archive
  * (real `.warc.gz` segments inflate to multiple GiB). Works
  * identically under `readStream` (the binaryFile streaming source +
  * a stateless mapPartitions), so the same scanner serves batch
  * backfill and live ingest.
  */
object WarcRecords {

  /** Header-block size bound: a WARC header block is a handful of
    * short ASCII lines; 1 MiB of bytes without the blank-line
    * terminator is structural damage, not a header. */
  private val MaxHeaderBytes: Int = 1 << 20

  /** Per-RECORD payload bound for the STREAMING scanner: the byte
    * scanner was implicitly bounded by the archive file's size, but a
    * compressed archive can declare any Content-Length it likes and
    * the streaming parser must allocate the buffer BEFORE reading.
    * 1 GiB is ~1000× the largest records real crawls carry; a larger
    * declaration is treated as the structural violation it is
    * (fail-soft: everything before it was already emitted). */
  private[io] val MaxRecordPayloadBytes: Long = 1L << 30

  /** Sequentially scan one archive's bytes into
    * (record_idx, warc_type, target_uri, warc_date, content_length,
    * payload) tuples — lazy, fail-soft (class doc). Delegates to the
    * streaming scanner: ONE parser, no drift between byte and stream
    * paths. */
  private[io] def scan(bytes: Array[Byte])
      : Iterator[(Int, String, String, String, Long, Array[Byte])] =
    if (bytes == null) Iterator.empty
    else scanStream(new java.io.ByteArrayInputStream(bytes))

  /** The streaming record parser: reads records straight off an
    * InputStream, so a COMPRESSED archive never materializes its
    * inflated copy — task memory is bounded by ONE record
    * (header ≤ [[MaxHeaderBytes]] + payload ≤
    * [[MaxRecordPayloadBytes]]), not the archive's inflated size
    * (real `.warc.gz` segments inflate to multiple GiB — a
    * whole-buffer design either truncates them or pins
    * archive-sized byte arrays per task). Decompressor errors
    * mid-stream read as EOF: every record fully parsed before the
    * damage is emitted (the fail-soft rule). */
  private[io] def scanStream(in0: java.io.InputStream)
      : Iterator[(Int, String, String, String, Long, Array[Byte])] =
    new Iterator[(Int, String, String, String, Long, Array[Byte])] {
      private val in = new java.io.BufferedInputStream(in0, 65536)
      private var idx = 0
      private var nextRec: (Int, String, String, String, Long, Array[Byte]) = _
      private var done = false

      /** Terminal state: the parse is over — release the stream NOW
        * (gzip Inflater / zstd native contexts hold off-heap window
        * buffers that otherwise wait for finalization; a partition of
        * thousands of archives must not accumulate them). */
      private def finish(): Unit = {
        done = true
        try in.close()
        catch { case scala.util.control.NonFatal(_) => }
      }

      private def read1(): Int =
        try in.read()
        catch { case scala.util.control.NonFatal(_) => -1 }

      /** Read exactly `n` payload bytes, growing in bounded chunks —
        * allocation tracks bytes actually RECEIVED, never the
        * declared length (a tiny hostile archive declaring
        * Content-Length: 1 GiB must cost its real few bytes, not a
        * 1 GiB pre-allocation per task). None on EOF before `n`. */
      private def readPayload(n: Long): Option[Array[Byte]] = {
        val out = new java.io.ByteArrayOutputStream(
          math.min(n, 65536L).toInt)
        val buf = new Array[Byte](65536)
        var left = n
        while (left > 0) {
          val r =
            try in.read(buf, 0, math.min(left, buf.length.toLong).toInt)
            catch { case scala.util.control.NonFatal(_) => -1 }
          if (r < 0) return None // truncated
          out.write(buf, 0, r)
          left -= r
        }
        Some(out.toByteArray)
      }

      private def advance(): Unit = {
        nextRec = null
        if (done) return
        // tolerate any CR/LF run between records (the spec's two
        // CRLFs, or a sloppy writer's extra blank lines)
        var b = read1()
        while (b == '\r' || b == '\n') b = read1()
        if (b < 0) { finish(); return }
        // header block: everything up to the first CRLF-CRLF
        val hdr = new java.io.ByteArrayOutputStream(512)
        hdr.write(b)
        var run = 0 // progress through \r\n\r\n
        while (run < 4 && hdr.size() <= MaxHeaderBytes) {
          val c = read1()
          if (c < 0) { finish(); return } // EOF mid-header
          hdr.write(c)
          run = (run, c) match {
            case (0, '\r') | (2, '\r') => run + 1
            case (1, '\n') | (3, '\n') => run + 1
            case (_, '\r') => 1
            case _ => 0
          }
        }
        if (run < 4) { finish(); return } // unterminated giant header
        val block = new String(hdr.toByteArray, 0, hdr.size() - 4,
          "ISO-8859-1")
        if (!block.startsWith("WARC/")) { finish(); return }
        val headers = block.split("\r\n").drop(1).iterator
          .map(_.split(":", 2))
          .collect { case Array(k, v) => k.trim.toLowerCase -> v.trim }
          .toMap
        headers.get("content-length").flatMap(_.toLongOption) match {
          case Some(n) if n >= 0 && n <= MaxRecordPayloadBytes =>
            readPayload(n) match {
              case Some(payload) =>
                nextRec = (idx, headers.getOrElse("warc-type", null),
                  headers.getOrElse("warc-target-uri", null),
                  headers.getOrElse("warc-date", null), n, payload)
                idx += 1
              case None => finish() // truncated payload
            }
          case _ => finish() // no/bad/absurd length
        }
      }

      advance()
      override def hasNext: Boolean = nextRec != null
      override def next(): (Int, String, String, String, Long, Array[Byte]) = {
        val r = nextRec; advance(); r
      }
    }

  /** Total-inflation budget per archive: the STREAMING scanner keeps
    * memory bounded by one record, so this cap guards CPU, not heap —
    * a zstd bomb at ~1000:1 could otherwise stream terabytes out of
    * one small file. 16 GiB is ~4× the largest real crawl segments
    * (Common Crawl runs ~1 GiB compressed / 3–5 GiB inflated);
    * records before the cap survive (good prefix). */
  private[io] val MaxInflatedArchiveBytes: Long = 16L << 30

  private def limited(in: java.io.InputStream,
                      limit: Long): java.io.InputStream =
    new java.io.InputStream {
      private var left = limit
      override def read(): Int =
        if (left <= 0) -1
        else { val b = in.read(); if (b >= 0) left -= 1; b }
      override def read(b: Array[Byte], off: Int, len: Int): Int =
        if (left <= 0) -1
        else {
          val n = in.read(b, off, math.min(len.toLong, left).toInt)
          if (n > 0) left -= n
          n
        }
      override def close(): Unit = in.close()
    }

  /** Open an archive's bytes as a DECOMPRESSING stream when they
    * carry a compression magic — real crawls ship `.warc.gz` (the
    * ISO-28500 convention: one gzip member per record, concatenated —
    * the JDK stream reads members sequentially) and increasingly
    * `.warc.zst` (zstd frames; zstd-jni ships with Spark). A
    * `.warc.zst` may legally LEAD with skippable frames (magic
    * 0x184D2A50–5F — the established convention stores the
    * decompression dictionary there, itself possibly zstd-compressed):
    * leading skippables are walked off, their LAST content is offered
    * to the decoder as a dictionary (frames that don't reference a
    * dictionary ignore it), and decoding starts at the first standard
    * frame — without this, the most common real `.warc.zst` variant
    * reads as zero records. Plain bytes stream through untouched.
    * Streaming (never a whole inflated buffer) is what keeps task
    * memory record-bounded on multi-GiB archives; inflation is
    * CPU-capped at [[MaxInflatedArchiveBytes]]. Corrupt streams EOF
    * mid-read and the scanner keeps the good prefix. */
  private[io] def decompressStream(content: Array[Byte])
      : java.io.InputStream = {
    val empty = new java.io.ByteArrayInputStream(Array.emptyByteArray)
    if (content == null) return empty
    if (content.length < 4)
      return new java.io.ByteArrayInputStream(content)
    def u(i: Int) = content(i) & 0xff
    def zstdAt(p: Int) = p + 4 <= content.length &&
      u(p) == 0x28 && u(p + 1) == 0xb5 && u(p + 2) == 0x2f &&
      u(p + 3) == 0xfd
    def skippableAt(p: Int) = p + 8 <= content.length &&
      (u(p) & 0xf0) == 0x50 && u(p + 1) == 0x2a && u(p + 2) == 0x4d &&
      u(p + 3) == 0x18
    try {
      if (u(0) == 0x1f && u(1) == 0x8b)
        limited(new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(content)),
          MaxInflatedArchiveBytes)
      else if (zstdAt(0) || skippableAt(0)) {
        var pos = 0
        var dict: Array[Byte] = null
        while (skippableAt(pos)) {
          val sz = u(pos + 4).toLong | (u(pos + 5).toLong << 8) |
            (u(pos + 6).toLong << 16) | (u(pos + 7).toLong << 24)
          if (pos + 8 + sz > content.length) return empty // corrupt frame
          dict = java.util.Arrays.copyOfRange(content, pos + 8,
            (pos + 8 + sz).toInt)
          pos += (8 + sz).toInt
        }
        // a compressed dictionary is itself a zstd frame
        if (dict != null && dict.length >= 4 &&
            (dict(0) & 0xff) == 0x28 && (dict(1) & 0xff) == 0xb5 &&
            (dict(2) & 0xff) == 0x2f && (dict(3) & 0xff) == 0xfd)
          dict = try {
            val sz = com.github.luben.zstd.Zstd
              .getFrameContentSize(dict)
            if (sz > 0 && sz <= (64L << 20))
              com.github.luben.zstd.Zstd.decompress(dict, sz.toInt)
            else dict
          } catch { case scala.util.control.NonFatal(_) => dict }
        val z = new com.github.luben.zstd.ZstdInputStream(
          new java.io.ByteArrayInputStream(content, pos,
            content.length - pos))
        z.setContinuous(false)
        if (dict != null && dict.nonEmpty)
          try z.setDict(dict)
          catch { case scala.util.control.NonFatal(_) => } // bad dict: try without
        limited(z, MaxInflatedArchiveBytes)
      } else new java.io.ByteArrayInputStream(content)
    } catch {
      case scala.util.control.NonFatal(_) => empty // bad magic header
    }
  }

  /** One row per archive record:
    * (keyCol: string, record_idx, warc_type, target_uri,
    * warc_date: string — the record's own ISO-8601 `WARC-Date`
    * header, NULL when the writer omitted it,
    * content_length, payload: binary). `keyCol` (the archive's
    * identity — binaryFile's `path`) is carried through as a string;
    * `contentCol` may be binary (binaryFile) or string (cast is the
    * UTF-8 encode). Compressed archives (`.warc.gz` member streams,
    * `.warc.zst` incl. leading skippable/dictionary frames) inflate
    * transparently AS A STREAM ([[decompressStream]] — magic-sniffed,
    * so plain archives pay nothing, and task memory stays bounded by
    * one record, never the inflated archive). Record order within an
    * archive is its physical byte order (`record_idx` 0-based). */
  def splitRecords(df: DataFrame, keyCol: String,
                   contentCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string"), col(contentCol).cast("binary"))
      .as[(String, Array[Byte])]
      .mapPartitions { rows =>
        // The scanner closes its decompressor on normal exhaustion or
        // parse failure (finish()), but a consumer that ABANDONS the
        // iterator early (limit/take, a downstream error) would leave
        // the current gzip Inflater / zstd native context open until
        // finalization — the accumulation finish() exists to prevent,
        // multiplied across partitions of thousands of archives. The
        // pull model keeps at most ONE archive's stream open per task
        // (flatMap drains each sub-iterator before opening the next),
        // so a single task-completion hook closing the ACTIVE stream
        // covers every abandonment path; double-close after a normal
        // finish() is a no-op on these streams.
        var active: java.io.InputStream = null
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit] { _ =>
            if (active != null)
              try active.close()
              catch { case scala.util.control.NonFatal(_) => }
          })
        rows.flatMap { case (k, bytes) =>
          val in = decompressStream(bytes)
          active = in
          scanStream(in)
            .map { case (i, t, u, d, n, p) => (k, i, t, u, d, n, p) }
        }
      }
      .toDF(keyCol, "record_idx", "warc_type", "target_uri", "warc_date",
        "content_length", "payload")
  }

  /** `Transfer-Encoding: chunked` header present in an HTTP header
    * block (any case, any position in the value list — `gzip,
    * chunked`). Multi-line match over CRLF-separated header lines. */
  private val ChunkedHdrPat =
    "(?im)^transfer-encoding[ \\t]*:[^\\r\\n]*chunked"

  /** `Content-Encoding: gzip` (or the RFC 9110 `x-gzip` alias) header
    * present in an HTTP header block — real archives carry
    * gzip-encoded bodies routinely, and a gzip body UTF-8-decoded raw
    * is mojibake in the corpus. */
  private val GzipHdrPat =
    "(?im)^content-encoding[ \\t]*:[^\\r\\n]*gzip"

  /** `Content-Encoding: deflate` — the next-most-common coding real
    * archives carry after gzip; matches `deflate` anywhere in the
    * value list (same any-position rule as the gzip pattern). */
  private val DeflateHdrPat =
    "(?im)^content-encoding[ \\t]*:[^\\r\\n]*deflate"

  /** Routing union of the coding patterns: ONE regex scan per row
    * decides whether the decode UDF runs at all; the UDF re-derives
    * the individual flags from the header bytes it already holds
    * (repeating each rlike as a UDF argument would pay both scans
    * twice per encoded row in interpreted/fallback contexts — the
    * HtmlExtract letBound lesson). */
  private val EncodedHdrPat =
    "(?im)^(transfer-encoding[ \\t]*:[^\\r\\n]*chunked" +
      "|content-encoding[ \\t]*:[^\\r\\n]*(gzip|deflate))"
  private lazy val ChunkedRe = java.util.regex.Pattern.compile(ChunkedHdrPat)
  private lazy val GzipRe = java.util.regex.Pattern.compile(GzipHdrPat)
  private lazy val DeflateRe =
    java.util.regex.Pattern.compile(DeflateHdrPat)

  /** Index of the first CRLF-CRLF (header/body separator), or -1. */
  private def crlfCrlfAt(msg: Array[Byte]): Int = {
    var hdrEnd = -1
    var i = 0
    while (hdrEnd < 0 && i + 3 < msg.length) {
      if (msg(i) == '\r' && msg(i + 1) == '\n' &&
          msg(i + 2) == '\r' && msg(i + 3) == '\n') hdrEnd = i
      i += 1
    }
    hdrEnd
  }

  /** De-chunk the body bytes starting at `bodyStart`, BYTE-accurately:
    * chunk sizes count OCTETS (RFC 9112 §7.1), and a multi-byte UTF-8
    * character may straddle a chunk boundary, so the walk happens on
    * the raw bytes and any charset decode runs ONCE over the
    * reassembled body. Chunk extensions (`;ext=v` after the hex size)
    * and trailers after the terminal 0-chunk are dropped per spec.
    * Fail-soft (the scanner's good-prefix rule): a malformed size
    * line ends the walk with everything de-chunked so far; a chunk
    * declared past end-of-data contributes its available prefix. A
    * malformed FIRST size line (nothing de-chunked yet) returns the
    * raw body unchanged — some WARC writers store the already-decoded
    * body while preserving the `Transfer-Encoding: chunked` header,
    * and there the "size line" is the document's first text; the
    * empty prefix would lose the whole document. */
  private def dechunkBodyBytes(msg: Array[Byte],
                               bodyStart: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var pos = bodyStart
    var done = false
    var sawValidSize = false
    while (!done) {
      var le = pos
      while (le + 1 < msg.length &&
          !(msg(le) == '\r' && msg(le + 1) == '\n')) le += 1
      if (le + 1 >= msg.length) done = true // no CRLF-terminated size line
      else {
        val sizeStr = new String(msg, pos, le - pos, "ISO-8859-1")
          .split(";", 2)(0).trim
        val size =
          try java.lang.Long.parseLong(sizeStr, 16)
          catch { case _: NumberFormatException => -1L }
        if (size < 0) done = true // malformed framing
        else if (size == 0) { sawValidSize = true; done = true } // 0-chunk
        else {
          sawValidSize = true
          val start = le + 2
          if (start + size > msg.length) {
            out.write(msg, start, msg.length - start)
            done = true
          } else {
            out.write(msg, start, size.toInt)
            pos = (start + size + 2).toInt // skip the chunk-data CRLF
          }
        }
      }
    }
    if (out.size() == 0 && !sawValidSize)
      java.util.Arrays.copyOfRange(msg, bodyStart, msg.length)
    else out.toByteArray
  }

  /** Decompression budget per RECORD: untrusted crawl bytes include
    * zip bombs (a few KB of input expanding to GBs), and the decode
    * UDF buffers its output in executor heap — an uncapped inflate is
    * an OOM any adversarial archive can trigger at will. 64 MiB is
    * ~30× the largest text documents real crawls carry (HTML pages
    * top out in low single-digit MiB; Common Crawl truncates records
    * at 1 MiB) while costing nothing legitimate. The walk stops AT
    * the cap and keeps the good prefix (the fail-soft rule): a
    * capped document is a quality-gate signal, a dead executor is
    * not. */
  private[io] val MaxDecodedBodyBytes: Int = 64 * 1024 * 1024

  /** Drain `in` into a buffer, stopping at [[MaxDecodedBodyBytes]].
    * Fail-soft: a decompressor error mid-stream keeps the good prefix
    * already written to `out` (the gzip leg's walk — the deflate legs
    * use [[inflateLeg]], whose strict completion signal needs Inflater
    * state this stream-level drain cannot see). */
  private def drainCapped(in: java.io.InputStream,
                          out: java.io.ByteArrayOutputStream): Unit =
    try {
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n > 0 && out.size() < MaxDecodedBodyBytes) {
        out.write(buf, 0, math.min(n, MaxDecodedBodyBytes - out.size()))
        n = if (out.size() < MaxDecodedBodyBytes) in.read(buf) else -1
      }
    } catch { case scala.util.control.NonFatal(_) => }

  /** Gunzip a body, fail-soft: bytes without the gzip magic pass
    * through unchanged (writers that store the already-decoded body
    * while preserving the `Content-Encoding: gzip` header — the
    * de-chunk fallback's sibling pattern), and a truncated/corrupt
    * stream keeps whatever decompressed cleanly (the good-prefix
    * rule). Magic-but-nothing-decoded yields EMPTY on purpose — the
    * asymmetry with the de-chunk fallback is deliberate: a mislabeled
    * chunked body is plain text worth recovering, but a body that
    * really starts with the gzip magic IS compressed, so its raw
    * bytes are never the document — passing them through would feed
    * mojibake to the corpus, strictly worse than an empty record the
    * quality gates can count. Output is capped at
    * [[MaxDecodedBodyBytes]] (gzip-bomb guard — the prefix up to the
    * cap is kept). JDK GZIPInputStream; no external codec. */
  private[io] def gunzipBytes(body: Array[Byte]): Array[Byte] = {
    if (body.length < 2 || (body(0) & 0xff) != 0x1f ||
        (body(1) & 0xff) != 0x8b) return body
    val out = new java.io.ByteArrayOutputStream()
    try drainCapped(new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(body)), out)
    catch { case scala.util.control.NonFatal(_) => } // header parse throw
    out.toByteArray
  }

  /** One Inflater pass over `body`: (finishedCleanly — the stream
    * reached a valid final-block end with at most `trailerSlack`
    * trailing bytes (or hit the bomb cap), decoded bytes). The strict
    * completion signal is what separates a real deflate stream from
    * plain text whose first bytes happen to start a decodable block:
    * text emits garbage and then errors / runs off the end / leaves a
    * long unconsumed tail — it essentially never ends a valid final
    * block within a few bytes of end-of-input. The slack exists for
    * the raw leg: a known broken-server class strips the zlib header
    * but keeps the 4-byte Adler-32 trailer (and captures append
    * CRLF padding), so a completed stream with a checksum-sized
    * residue is a real deflate body, not text. */
  private def inflateLeg(body: Array[Byte], nowrap: Boolean,
                         trailerSlack: Int = 0): (Boolean, Array[Byte]) = {
    val inf = new java.util.zip.Inflater(nowrap)
    val out = new java.io.ByteArrayOutputStream()
    var error = false
    var capped = false
    try {
      inf.setInput(body)
      val buf = new Array[Byte](8192)
      while (!inf.finished() && !error && !capped) {
        val n =
          try inf.inflate(buf)
          catch { case _: java.util.zip.DataFormatException =>
            error = true; 0 }
        if (n > 0) {
          out.write(buf, 0, math.min(n, MaxDecodedBodyBytes - out.size()))
          capped = out.size() >= MaxDecodedBodyBytes
        } else if (!error && !inf.finished() &&
            (inf.needsInput() || inf.needsDictionary()))
          // truncated (input exhausted mid-stream) or FDICT-bearing
          // zlib (we have no preset dictionary) — either way dirty;
          // without this arm a needsDictionary stall would spin
          error = true
      }
      val clean = capped ||
        (!error && inf.finished() && inf.getRemaining <= trailerSlack)
      (clean, out.toByteArray)
    } finally inf.end()
  }

  /** Inflate a `Content-Encoding: deflate` body, fail-soft. The wire
    * reality this handles: spec-conforming writers send a ZLIB-wrapped
    * stream (RFC 9110 §8.4.1.2), a well-known population of servers
    * sends RAW deflate under the same label, and some writers store
    * the already-decoded body while keeping the header. Deflate has
    * no real magic — the 2-byte zlib header check false-positives on
    * real text (e.g. a body starting "x ") about 1 in 500 — so unlike
    * gzip the header only picks which leg runs FIRST; what decides is
    * the decode outcome ([[inflateLeg]]'s strict completion signal):
    *  - a leg that finishes cleanly is trusted, INCLUDING an empty
    *    result (a deflated empty body must become '', never its raw
    *    compressed bytes as mojibake);
    *  - a DIRTY leg's non-empty prefix is kept only after the OTHER
    *    leg also fails to finish cleanly, and only under a zlib
    *    header (by then the header plus working blocks are real
    *    evidence of compression — the good-prefix rule). Running the
    *    second leg even when the first produced a prefix is what
    *    saves the ~1-in-500 raw-deflate body whose first two bytes
    *    coincidentally pass the zlib check and whose zlib leg emits
    *    garbage before erroring: its raw leg finishes cleanly and
    *    wins;
    *  - anything else passes through unchanged (mislabeled-identity:
    *    recover the text). The cost, documented: a body whose stream
    *    is corrupt before its first decoded byte under BOTH legs
    *    ships raw; corrupt bodies (rare) pay both inflate passes. */
  private[io] def inflateBytes(body: Array[Byte]): Array[Byte] = {
    if (body.length < 2) return body
    val zlibHdr = (body(0) & 0x0f) == 8 &&
      (((body(0) & 0xff) << 8) | (body(1) & 0xff)) % 31 == 0
    // raw legs tolerate a checksum-trailer-sized residue (8 bytes:
    // Adler-32/CRC + CRLF padding); the zlib leg consumes its own
    // trailer, so its clean end is exact
    def leg(nowrap: Boolean) =
      inflateLeg(body, nowrap, trailerSlack = if (nowrap) 8 else 0)
    val (firstClean, firstOut) = leg(nowrap = !zlibHdr)
    if (firstClean) firstOut
    else {
      val (secondClean, secondOut) = leg(nowrap = zlibHdr)
      if (secondClean) secondOut
      else if (zlibHdr && firstOut.nonEmpty) firstOut
      else body
    }
  }

  /** Decode the body after a KNOWN header/body split: de-chunk and/or
    * decompress per the declared transfer/content codings — in that
    * order (RFC 9112: transfer coding frames the message, content
    * coding wraps the representation, so a chunked gzip body
    * de-chunks first and gunzips the reassembled bytes). A body
    * declaring BOTH content codings (`gzip, deflate` — vanishingly
    * rare, and writers disagree on list order) takes the gzip leg
    * alone: gzip IS deflate plus a framing wrapper, its magic-sniffed
    * passthrough makes the choice self-correcting for mislabels, and
    * chaining both would double-decode single-coded bodies. BYTES
    * out — the text path UTF-8-decodes once at the end; the media
    * path ([[toCrawlMedia]]) consumes the bytes raw. */
  private def decodeBodyBytesFrom(msg: Array[Byte], hdrEnd: Int,
                                  chunked: Boolean, gzipped: Boolean,
                                  deflated: Boolean): Array[Byte] = {
    var body: Array[Byte] =
      if (chunked) dechunkBodyBytes(msg, hdrEnd + 4)
      else java.util.Arrays.copyOfRange(msg, hdrEnd + 4, msg.length)
    if (gzipped) body = gunzipBytes(body)
    else if (deflated) body = inflateBytes(body)
    body
  }

  private def decodeBodyFrom(msg: Array[Byte], hdrEnd: Int,
                             chunked: Boolean, gzipped: Boolean,
                             deflated: Boolean): String =
    new String(decodeBodyBytesFrom(msg, hdrEnd, chunked, gzipped, deflated),
      java.nio.charset.StandardCharsets.UTF_8)

  /** [[decodeBodyFrom]] with its own separator scan — the
    * explicit-flags entry point. */
  private[io] def decodeHttpBody(msg: Array[Byte], chunked: Boolean,
                                 gzipped: Boolean,
                                 deflated: Boolean = false): String = {
    if (msg == null) return null
    val hdrEnd = crlfCrlfAt(msg)
    if (hdrEnd < 0) return ""
    decodeBodyFrom(msg, hdrEnd, chunked, gzipped, deflated)
  }

  /** [[decodeHttpBody]] for chunked-only messages — kept as the
    * spec-pinned de-chunk entry point. */
  private[io] def dechunkHttpBody(msg: Array[Byte]): String =
    decodeHttpBody(msg, chunked = true, gzipped = false)

  /** [[decodeBodyFrom]] deriving the coding flags ITSELF from the
    * header block — the UDF entry point, so the column side pays
    * exactly one routing regex per row instead of re-evaluating each
    * header rlike as a UDF argument, and the separator scan runs ONCE
    * (the flag derivation and the body cut share the same hdrEnd). */
  private[io] def decodeHttpBodyAuto(msg: Array[Byte]): String = {
    if (msg == null) return null
    val hdrEnd = crlfCrlfAt(msg)
    if (hdrEnd < 0) return ""
    val hdr = new String(msg, 0, hdrEnd, "ISO-8859-1")
    decodeBodyFrom(msg, hdrEnd, ChunkedRe.matcher(hdr).find(),
      GzipRe.matcher(hdr).find(), DeflateRe.matcher(hdr).find())
  }

  private lazy val decodeBodyUdf =
    org.apache.spark.sql.functions.udf(decodeHttpBodyAuto _)

  /** Strip a leading HTTP message envelope from a raw (binary)
    * payload: in real ISO-28500 crawls a response record's payload is
    * the FULL HTTP message (Content-Type: application/http — status
    * line, headers, CRLF-CRLF, body), and feeding that to text
    * extraction leaks header lines into the corpus as prose. A
    * payload starting with `HTTP/` is cut at its first CRLF-CRLF
    * (header-only messages — no blank line or nothing after it —
    * yield ''); when the header block declares `Transfer-Encoding:
    * chunked` and/or `Content-Encoding: gzip`/`deflate`, the body
    * additionally DE-CHUNKS then DECOMPRESSES ([[decodeHttpBody]] —
    * hex chunk-size framing lines are exactly the header-leak failure
    * mode this strip exists for, a raw compressed body is mojibake,
    * and real archives carry all three routinely). Anything else passes through unchanged
    * (writers that store bare HTML, the spec-pinned minimal-fixture
    * case). HTTP/1.x mandates CRLF line endings, so no LF-only
    * fallback is attempted — a nonconforming envelope passes through
    * visibly rather than being half-stripped. The plain path stays a
    * pure codegen expression; only chunked/gzipped rows pay the UDF
    * (genuinely sequential byte framing / a codec call — no Catalyst
    * expression exists, and CaseWhen evaluates branches lazily). */
  private[io] def stripHttpEnvelope(payloadBin: Column): Column = {
    val payload = payloadBin.cast("string")
    val sep = locate("\r\n\r\n", payload)
    val hdr = payload.substr(lit(1), sep - 1)
    when(payload.startsWith("HTTP/"),
      when(sep > 0,
        when(hdr.rlike(EncodedHdrPat), decodeBodyUdf(payloadBin))
          .otherwise(payload.substr(sep + lit(4), length(payload))))
        .otherwise(lit("")))
      .otherwise(payload)
  }

  /** Archive rows → the (doc_id, url, html) relation
    * [[graft.pipelines.TrainingCorpusPipeline]]'s crawl front
    * consumes (`Config.urlCol`/`htmlCol`): response records with a
    * target URI, payload UTF-8-decoded with any HTTP envelope
    * stripped ([[stripHttpEnvelope]]), and
    * `doc_id = xxhash64(archive key, record_idx)` — deterministic,
    * well-spread, integral (the LSH stages' id contract), and UNIQUE
    * per record position: a URI crawled twice (re-crawls, revisits,
    * the same page in two archives) keeps two distinct ids instead of
    * silently colliding, leaving residual collision odds at the
    * corpus-negligible 64-bit birthday bound. Re-crawl DEDUP is a
    * policy decision downstream (`dropDuplicates("url")`, or the
    * near-dup family), not an accident of id derivation.
    * Non-response records (warcinfo, request, metadata) drop here —
    * they are archive bookkeeping, not documents. A NULL warc_type is
    * KEPT (minimal writers omit it; a payload with a URI is a
    * document until proven otherwise). */
  def toCrawlDocs(archives: DataFrame, keyCol: String = "path",
                  contentCol: String = "content"): DataFrame =
    splitRecords(archives, keyCol, contentCol)
      .filter(col("target_uri").isNotNull &&
        (col("warc_type").isNull || col("warc_type") === "response"))
      .select(xxhash64(col(keyCol), col("record_idx")).as("doc_id"),
        col("target_uri").as("url"),
        stripHttpEnvelope(col("payload")).as("html"))

  /** [[toCrawlDocs]] for a binaryFile ARCHIVE relation (streaming or
    * batch) that also carries the archive's `modificationTime`: the
    * output keeps it as event-time column `tsCol` — the only
    * timestamp a raw archive row has — which is what lets a crawl
    * stream watermark and flow straight into
    * [[graft.pipelines.StreamingIngestPipeline]]. Record semantics,
    * envelope strip, and the (archive, position) id rule are
    * byte-identical to [[toCrawlDocs]] (the (path, mtime) pair
    * threads through the scanner as path + U+0001 + `unix_micros` —
    * LOSSLESS, unlike a JSON round-trip, whose default timestamp
    * format is millisecond-precision and session-timezone-dependent
    * — and ids hash the path component alone, so timed and untimed
    * reads of the same archive agree). The timestamp splits back off
    * at the LAST separator, so a pathological path containing U+0001
    * still round-trips. */
  /** [[stripHttpEnvelope]] for BINARY payloads — the media leg's
    * strip: a payload starting with the ASCII `HTTP/` prefix is cut
    * at its first CRLF-CRLF and the body de-chunked/decompressed per
    * the declared codings, all at the BYTE level (casting media bytes
    * through a string, as the text strip's column form does, corrupts
    * every non-UTF-8 byte — the exact payloads this leg exists for).
    * Anything else passes through untouched. Header-only messages
    * yield empty. */
  private[io] def stripHttpEnvelopeBytes(msg: Array[Byte]): Array[Byte] = {
    if (msg == null) return null
    if (msg.length < 5 || msg(0) != 'H' || msg(1) != 'T' || msg(2) != 'T' ||
        msg(3) != 'P' || msg(4) != '/') return msg
    val hdrEnd = crlfCrlfAt(msg)
    if (hdrEnd < 0) return Array.emptyByteArray
    val hdr = new String(msg, 0, hdrEnd, "ISO-8859-1")
    decodeBodyBytesFrom(msg, hdrEnd, ChunkedRe.matcher(hdr).find(),
      GzipRe.matcher(hdr).find(), DeflateRe.matcher(hdr).find())
  }

  /** The MEDIA leg of the crawl scanner: archive rows → the Media
    * relation ([[graft.multimodal.Multimodal.Media]] shape +
    * url/mtime lineage) for response records whose payload BYTES
    * carry an image/audio/video magic — so crawl archives feed the
    * media gate end-to-end (archive → scanner → media → index judge)
    * instead of media entering only via `binaryFile` trees.
    *
    *  - Routing is by the payload's OWN magic
    *    ([[graft.multimodal.Multimodal.kindOf]] — never a declared
    *    Content-Type, which real crawls get wrong routinely), applied
    *    AFTER the HTTP envelope strip ([[stripHttpEnvelopeBytes]] —
    *    response payloads are full HTTP messages in real ISO-28500
    *    crawls, and the magic sits on the BODY). Records whose body
    *    is not a recognized media kind (html/text/unknown — the
    *    document leg's material) are dropped here: [[toCrawlDocs]]
    *    owns them, and the two legs partition the archive between
    *    them by content, not by guess.
    *  - `media_id = xxhash64(archive key, record_idx)` — the
    *    [[toCrawlDocs]] id rule (deterministic, well-spread,
    *    re-crawl-distinct), NOT a URI hash: the same image fetched
    *    twice keeps two ids and byte-dedup collapses them by
    *    CONTENT, the same policy split as text re-crawls.
    *  - `mtime` = the record's own `WARC-Date` (ISO-8601, cast; NULL
    *    when the writer omitted it) — the event time a media stream
    *    watermarks on, per-record rather than per-archive.
    *
    * Scale shape: splitRecords' narrow streaming scan + EXACTLY one
    * byte-level strip/sniff per record (a typed mapPartitions pass —
    * a UDF-column formulation lets deterministic-filter pushdown
    * duplicate the strip below the projection, paying every kept
    * body's decompress twice); payloads never shuffle. The output
    * feeds [[graft.multimodal.MediaIndex]] directly:
    * `.select("media_id", "kind", "payload").as[Media]`. */
  def toCrawlMedia(archives: DataFrame, keyCol: String = "path",
                   contentCol: String = "content"): DataFrame = {
    val spark = archives.sparkSession
    import spark.implicits._
    splitRecords(archives, keyCol, contentCol)
      .filter(col("target_uri").isNotNull &&
        (col("warc_type").isNull || col("warc_type") === "response"))
      .select(xxhash64(col(keyCol), col("record_idx")).as("media_id"),
        col("payload"), col("target_uri").as("url"), col("warc_date"))
      .as[(Long, Array[Byte], String, String)]
      .mapPartitions(_.flatMap { case (id, raw, url, date) =>
        val body = stripHttpEnvelopeBytes(raw)
        graft.multimodal.Multimodal.sniffKind(body) match {
          case "bin" => None // html/text/unknown — the doc leg's material
          case kind => Some((id, kind, body, url, date))
        }
      })
      .toDF("media_id", "kind", "payload", "url", "warc_date")
      .select(col("media_id"), col("kind"), col("payload"), col("url"),
        col("warc_date").cast("timestamp").as("mtime"))
  }

  /** The SHARED single-pass splitter: archive rows → EVERY routable
    * response record, each routed by its stripped body's content into
    * doc-or-media territory — (rec_id, kind ∈ {'doc','image','audio',
    * 'video'}, url, mtime, text — the UTF-8 body for docs / NULL for
    * media, payload — the body bytes for media / NULL for docs).
    *
    * Why this exists when [[toCrawlDocs]] and [[toCrawlMedia]] already
    * partition the archive by content: each calls [[splitRecords]]
    * itself, so a pipeline consuming BOTH legs pays the archive
    * inflate + record parse TWICE — and at crawl scale decompression
    * is the dominant ingest cost. This operator runs the scanner
    * ONCE and routes every record in the same narrow pass that strips
    * its HTTP envelope and sniffs its magic; the doc and media legs
    * are then column selections of one relation (one scan subtree in
    * the plan — the [[graft.pipelines.StreamingIngestPipeline
    * .runArchiveIngest]] shape).
    *
    * Semantics are EXACTLY the two legs' (spec-pinned): media rows ≡
    * [[toCrawlMedia]] (strip-then-sniff routing, body bytes out,
    * per-record `WARC-Date` as `mtime`); doc rows carry the UTF-8
    * decode of the stripped body — [[toCrawlDocs]]' text for every
    * record whose body is not a recognized media kind (cutting bytes
    * then decoding equals decoding then cutting: the CRLF-CRLF
    * separator bytes can never sit inside a multi-byte UTF-8
    * sequence, continuation bytes are ≥ 0x80). `rec_id` is the
    * shared (archive, position) id rule, so doc/media relations
    * derived here agree id-for-id with the single-leg operators.
    * Docs get the per-record event time too — what lets the routed
    * stream watermark both legs off one column.
    *
    * Scale shape: [[splitRecords]]' narrow streaming scan + exactly
    * ONE byte-level strip/sniff per record (typed mapPartitions — the
    * toCrawlMedia pushdown lesson); payloads never shuffle. */
  def toCrawlRecordsRouted(archives: DataFrame, keyCol: String = "path",
                           contentCol: String = "content"): DataFrame = {
    val spark = archives.sparkSession
    import spark.implicits._
    splitRecords(archives, keyCol, contentCol)
      .filter(col("target_uri").isNotNull &&
        (col("warc_type").isNull || col("warc_type") === "response"))
      .select(xxhash64(col(keyCol), col("record_idx")).as("rec_id"),
        col("payload"), col("target_uri").as("url"), col("warc_date"))
      .as[(Long, Array[Byte], String, String)]
      .mapPartitions(_.map { case (id, raw, url, date) =>
        val body = stripHttpEnvelopeBytes(raw)
        graft.multimodal.Multimodal.sniffKind(body) match {
          case "bin" =>
            (id, "doc", url, date,
              if (body == null) null
              else new String(body, java.nio.charset.StandardCharsets.UTF_8),
              null: Array[Byte])
          case kind => (id, kind, url, date, null: String, body)
        }
      })
      .toDF("rec_id", "kind", "url", "warc_date", "text", "payload")
      .select(col("rec_id"), col("kind"), col("url"),
        col("warc_date").cast("timestamp").as("mtime"), col("text"),
        col("payload"))
  }

  def toCrawlDocsTimed(archives: DataFrame, tsCol: String = "ts"): DataFrame = {
    // a NULL mtime must still contribute the separator (concat_ws
    // SKIPS nulls — the path would then parse back empty and every
    // null-mtime archive's record N would collide on one doc_id):
    // coalesce to '' keeps the separator; it splits back as ts = NULL
    val keyed = archives.select(
      concat_ws("\u0001", col("path"),
        coalesce(unix_micros(col("modificationTime")).cast("string"),
          lit(""))).as("__akey"),
      col("content"))
    val tsStr = element_at(split(col("__akey"), "\u0001"), -1)
    splitRecords(keyed, "__akey", "content")
      .withColumn("__p", col("__akey").substr(
        lit(1), length(col("__akey")) - length(tsStr) - 1))
      .filter(col("target_uri").isNotNull &&
        (col("warc_type").isNull || col("warc_type") === "response"))
      .select(xxhash64(col("__p"), col("record_idx")).as("doc_id"),
        col("target_uri").as("url"),
        stripHttpEnvelope(col("payload")).as("html"),
        timestamp_micros(nullif(tsStr, lit("")).cast("long")).as(tsCol))
  }
}
