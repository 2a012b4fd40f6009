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
  * stream out of a lazy iterator. Executor memory is bounded by the
  * archive-file size, which [[BinaryFileSource]]'s `maxBytes` guard
  * caps at read time. Works identically under `readStream` (the
  * binaryFile streaming source + a stateless mapPartitions), so the
  * same scanner serves batch backfill and live ingest.
  */
object WarcRecords {

  private val Crlf = "\r\n".getBytes("ISO-8859-1")

  /** Sequentially scan one archive's bytes into
    * (record_idx, warc_type, target_uri, content_length, payload)
    * tuples — lazy, fail-soft (class doc). */
  private[io] def scan(bytes: Array[Byte])
      : Iterator[(Int, String, String, Long, Array[Byte])] =
    new Iterator[(Int, String, String, Long, Array[Byte])] {
      private var pos = 0
      private var idx = 0
      private var nextRec: (Int, String, String, Long, Array[Byte]) = _
      private var done = bytes == null

      private def startsWith(p: Int, s: String): Boolean = {
        val m = s.getBytes("ISO-8859-1")
        p + m.length <= bytes.length &&
          java.util.Arrays.equals(bytes, p, p + m.length, m, 0, m.length)
      }

      private def indexOfCrlfCrlf(from: Int): Int = {
        var i = from
        while (i + 3 < bytes.length) {
          if (bytes(i) == '\r' && bytes(i + 1) == '\n' &&
              bytes(i + 2) == '\r' && bytes(i + 3) == '\n') return i
          i += 1
        }
        -1
      }

      private def advance(): Unit = {
        nextRec = null
        if (done) return
        // tolerate any CR/LF run between records (the spec's two
        // CRLFs, or a sloppy writer's extra blank lines)
        while (pos < bytes.length &&
            (bytes(pos) == '\r' || bytes(pos) == '\n')) pos += 1
        if (pos >= bytes.length) { done = true; return }
        if (!startsWith(pos, "WARC/")) { done = true; return }
        val hdrEnd = indexOfCrlfCrlf(pos)
        if (hdrEnd < 0) { done = true; return }
        val block = new String(bytes, pos, hdrEnd - pos, "ISO-8859-1")
        val headers = block.split("\r\n").drop(1).iterator
          .map(_.split(":", 2))
          .collect { case Array(k, v) => k.trim.toLowerCase -> v.trim }
          .toMap
        val cl = headers.get("content-length").flatMap(_.toLongOption)
        cl match {
          case Some(n) if n >= 0 && hdrEnd + 4 + n <= bytes.length =>
            val payload = java.util.Arrays.copyOfRange(
              bytes, hdrEnd + 4, (hdrEnd + 4 + n).toInt)
            nextRec = (idx, headers.getOrElse("warc-type", null),
              headers.getOrElse("warc-target-uri", null), n, payload)
            idx += 1
            pos = hdrEnd + 4 + n.toInt
          case _ => done = true // no/bad length, or declared past EOF
        }
      }

      advance()
      override def hasNext: Boolean = nextRec != null
      override def next(): (Int, String, String, Long, Array[Byte]) = {
        val r = nextRec; advance(); r
      }
    }

  /** Whole-archive decompression budget: archives legitimately
    * expand 3–10× (Common Crawl segments run ~1 GiB decompressed), so
    * the cap sits far above the record-level
    * [[MaxDecodedBodyBytes]] — it exists to bound what one
    * adversarial archive-file bomb can pin in a task's heap; records
    * before the cap survive (good prefix). */
  private[io] val MaxDecodedArchiveBytes: Int = 1 << 30

  /** Decompress a whole ARCHIVE's bytes when they carry a compression
    * magic — real crawls ship `.warc.gz` (the ISO-28500 convention:
    * one gzip member per record, concatenated — the JDK stream reads
    * members sequentially, so the whole file inflates in one pass)
    * and increasingly `.warc.zst` (zstd frames; zstd-jni ships with
    * Spark). Plain bytes pass through untouched; magic-but-corrupt
    * keeps whatever inflated cleanly (every record before the
    * corruption — the scanner's good-prefix rule composes, because
    * the scan stops at the first unparsable record anyway). */
  private[io] def decompressArchive(content: Array[Byte]): Array[Byte] = {
    if (content == null || content.length < 4) return content
    def u(i: Int) = content(i) & 0xff
    val gz = u(0) == 0x1f && u(1) == 0x8b
    val zst = u(0) == 0x28 && u(1) == 0xb5 && u(2) == 0x2f && u(3) == 0xfd
    if (!gz && !zst) return content
    val out = new java.io.ByteArrayOutputStream()
    try {
      val in: java.io.InputStream =
        if (gz) new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(content))
        else {
          val z = new com.github.luben.zstd.ZstdInputStream(
            new java.io.ByteArrayInputStream(content))
          z.setContinuous(false)
          z
        }
      try {
        val buf = new Array[Byte](65536)
        var n = in.read(buf)
        while (n > 0 && out.size() < MaxDecodedArchiveBytes) {
          out.write(buf, 0,
            math.min(n, MaxDecodedArchiveBytes - out.size()))
          n = if (out.size() < MaxDecodedArchiveBytes) in.read(buf) else -1
        }
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => } // good prefix
    out.toByteArray
  }

  /** One row per archive record:
    * (keyCol: string, record_idx, warc_type, target_uri,
    * content_length, payload: binary). `keyCol` (the archive's
    * identity — binaryFile's `path`) is carried through as a string;
    * `contentCol` may be binary (binaryFile) or string (cast is the
    * UTF-8 encode). Compressed archives (`.warc.gz` member streams,
    * `.warc.zst`) inflate transparently per archive
    * ([[decompressArchive]] — magic-sniffed, so plain archives pay
    * nothing). Record order within an archive is its physical byte
    * order (`record_idx` 0-based). */
  def splitRecords(df: DataFrame, keyCol: String,
                   contentCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string"), col(contentCol).cast("binary"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (k, bytes) =>
        scan(decompressArchive(bytes))
          .map { case (i, t, u, n, p) => (k, i, t, u, n, p) }
      })
      .toDF(keyCol, "record_idx", "warc_type", "target_uri",
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
    * Returns TRUE when the stream ended cleanly (end-of-stream, or
    * the cap was hit before any error) — the deflate legs route on
    * it; decompressor errors keep the good prefix and return false
    * (shared fail-soft walk of the gzip and deflate legs). */
  private def drainCapped(in: java.io.InputStream,
                          out: java.io.ByteArrayOutputStream): Boolean =
    try {
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n > 0 && out.size() < MaxDecodedBodyBytes) {
        out.write(buf, 0, math.min(n, MaxDecodedBodyBytes - out.size()))
        n = if (out.size() < MaxDecodedBodyBytes) in.read(buf) else -1
      }
      true
    } catch { case scala.util.control.NonFatal(_) => false }

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

  /** Inflate a `Content-Encoding: deflate` body, fail-soft. The wire
    * reality this handles: spec-conforming writers send a ZLIB-wrapped
    * stream (RFC 9110 §8.4.1.2), a well-known population of servers
    * sends RAW deflate under the same label, and some writers store
    * the already-decoded body while keeping the header. Routing rests
    * on how much evidence of compression the bytes carry:
    *  - A valid ZLIB header (low CMF nibble 8 = deflate, CMF·256+FLG
    *    divisible by 31) is treated like gzip's magic: the body IS
    *    compressed, so a clean decode returns its output (INCLUDING a
    *    legitimately-empty body — success is the stream ENDING
    *    CLEANLY, never output being non-empty) and a corrupt stream
    *    keeps the good prefix; raw bytes are never the document.
    *  - NO zlib header: raw deflate has no magic at all, so the
    *    raw-inflate leg is accepted ONLY when it consumes the stream
    *    cleanly — a plain-text body mislabeled deflate whose first
    *    bytes happen to start a decodable fixed-Huffman block emits
    *    garbage and then ERRORS, and must pass through unchanged
    *    (the de-chunk recover-the-text rule), not ship its garbage
    *    prefix. The cost: a TRUNCATED raw-deflate body (no header,
    *    corrupt tail) is indistinguishable from text and passes
    *    through raw — the price of a magic-less format.
    * Output capped at [[MaxDecodedBodyBytes]] (bomb guard — hitting
    * the cap counts as clean). JDK Inflater only. */
  private[io] def inflateBytes(body: Array[Byte]): Array[Byte] = {
    if (body.length < 2) return body
    def leg(nowrap: Boolean): (Boolean, Array[Byte]) = {
      val inf = new java.util.zip.Inflater(nowrap)
      val out = new java.io.ByteArrayOutputStream()
      val clean =
        try drainCapped(new java.util.zip.InflaterInputStream(
            new java.io.ByteArrayInputStream(body), inf), out)
        finally inf.end()
      (clean, out.toByteArray)
    }
    val zlibHdr = (body(0) & 0x0f) == 8 &&
      (((body(0) & 0xff) << 8) | (body(1) & 0xff)) % 31 == 0
    if (zlibHdr) {
      val (clean, zOut) = leg(nowrap = false)
      if (clean || zOut.nonEmpty) zOut
      else {
        // zlib header but nothing decoded: one raw retry (a text
        // body can fake the 1-in-31 header check), else empty — the
        // header is evidence of compression, like gzip's magic
        val (rawClean, rawOut) = leg(nowrap = true)
        if (rawClean && rawOut.nonEmpty) rawOut else zOut
      }
    } else {
      val (rawClean, rawOut) = leg(nowrap = true)
      if (rawClean && rawOut.nonEmpty) rawOut else body
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
    * chaining both would double-decode single-coded bodies. One UTF-8
    * decode at the end. */
  private def decodeBodyFrom(msg: Array[Byte], hdrEnd: Int,
                             chunked: Boolean, gzipped: Boolean,
                             deflated: Boolean): String = {
    var body: Array[Byte] =
      if (chunked) dechunkBodyBytes(msg, hdrEnd + 4)
      else java.util.Arrays.copyOfRange(msg, hdrEnd + 4, msg.length)
    if (gzipped) body = gunzipBytes(body)
    else if (deflated) body = inflateBytes(body)
    new String(body, java.nio.charset.StandardCharsets.UTF_8)
  }

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
