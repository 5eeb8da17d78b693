package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.{DataOutputBuffer, LongWritable, Text}
import org.apache.hadoop.io.compress.CompressionCodecFactory
import org.apache.hadoop.mapreduce.{InputSplit, JobContext, RecordReader, TaskAttemptContext}
import org.apache.hadoop.mapreduce.lib.input.{FileInputFormat, FileSplit}

/** Splittable WARC input format: one record per `WARC/1.0` record from
  * (possibly) one huge uncompressed WARC file — the CommonCrawl
  * container, read in place ([[graft.osm.XmlElementInputFormat]]'s
  * split contract applied to the crawl-archive tier).
  *
  * The split contract: a record BELONGS to the split in which its
  * `WARC/1.0\r\n` magic begins; a reader positioned mid-file scans
  * forward to the first magic at or after its split start (bytes before
  * it belong to the previous split's reader, which reads past its own
  * end to finish its last record). Unlike the XML case, the PAYLOAD is
  * never delimiter-scanned — `Content-Length` directs an exact byte
  * read, so payloads freely contain the magic, markup, or binary.
  *
  * False-sync discipline: the magic can occur inside a payload, so a
  * mid-file sync is VALIDATED — the candidate must present parseable
  * headers (terminated by CRLFCRLF within 64 KiB) carrying BOTH a
  * WARC-Type header and a plausible numeric Content-Length; otherwise
  * the scan continues. An embedded HTTP response (the common payload —
  * it has Content-Length and CRLFCRLF but no WARC-Type) therefore does
  * not validate. A payload that embeds a complete well-formed WARC
  * record (a WARC-of-WARCs) is genuinely ambiguous to any mid-stream
  * reader and documented unsupported.
  *
  * Compressed archives (the shipped `.warc.gz` form) are supported as
  * WHOLE-FILE streams: a codec path is never split (`isSplitable`), its
  * reader decompresses the full stream and parses records sequentially
  * — parallelism equals file count, which is exactly how crawl dumps
  * shard (thousands of ~1 GB .warc.gz files). Splittable in-place scans
  * need the uncompressed form.
  */
class WarcInputFormat extends FileInputFormat[LongWritable, Text] {
  override def isSplitable(ctx: JobContext, file: Path): Boolean =
    new CompressionCodecFactory(ctx.getConfiguration).getCodec(file) == null

  override def createRecordReader(split: InputSplit, ctx: TaskAttemptContext)
      : RecordReader[LongWritable, Text] = new WarcRecordReader
}

object WarcInputFormat {
  val Magic: Array[Byte] = "WARC/1.0\r\n".getBytes(StandardCharsets.US_ASCII)
  val HeaderEnd: Array[Byte] = "\r\n\r\n".getBytes(StandardCharsets.US_ASCII)
  val MaxHeaderBytes: Int = 64 * 1024
  /** Plausibility ceiling on a single record's Content-Length (1 TiB):
    * a garbage or overflowing length rejects the sync candidate instead
    * of directing a near-infinite read.
    */
  val MaxRecordBytes: Long = 1L << 40
  /** A VALID record larger than this is skipped with exact framing (the
    * payload is consumed, nothing is emitted) instead of buffered:
    * DataOutputBuffer/Text are int-indexed, so a 2 GiB+ record would
    * otherwise pass sync validation and then crash the task mid-buffer.
    * Configurable (tests shrink it); clamped below Int.MaxValue.
    */
  val MaxBufferedBytesKey = "graft.warc.max.buffered.bytes"
  val MaxBufferedBytesDefault: Long = 1L << 30
  /** Task counters: salvaged compressed streams (records after a
    * corruption point dropped) and skipped oversized records — both
    * observable per job instead of silently indistinguishable from a
    * short file.
    */
  val CounterGroup = "graft.warc"
  val SalvagedStreams = "salvaged_compressed_streams"
  val SkippedOversized = "skipped_oversized_records"
  val RejectedMalformedHeaders = "rejected_malformed_headers"
  private[sources] val log =
    org.slf4j.LoggerFactory.getLogger(classOf[WarcInputFormat])

  /** Is this the DECOMPRESSOR reporting a corrupt/truncated stream (vs a
    * transient filesystem fault, which must still fail the task)? Keyed
    * on exception ORIGIN first: the raw filesystem stream is tagged
    * ([[TaggingInputStream]]), so an [[UpstreamIOException]] — or one
    * anywhere in the cause chain — is a filesystem fault REGARDLESS of
    * its message text ("...Invalid token..." auth faults, messages
    * containing "crc"). Only exceptions that arose inside the
    * decompressor fall through to the type/message classification:
    * truncation as EOFException, framing/CRC damage as ZipException or
    * an IOException naming the format.
    */
  private[sources] def isCorruptStream(e: java.io.IOException): Boolean = e match {
    case _ if {
      var t: Throwable = e
      var upstream = false
      while (t != null && !upstream) {
        upstream = t.isInstanceOf[UpstreamIOException]
        t = t.getCause
      }
      upstream
    } => false
    case _: java.io.EOFException => true
    case _: java.util.zip.ZipException => true
    case _ =>
      val m = if (e.getMessage == null) "" else e.getMessage.toLowerCase(java.util.Locale.ROOT)
      m.contains("gzip") || m.contains("zlib") || m.contains("deflate") ||
        m.contains("crc") || m.contains("decompress") ||
        // the inflater's own corruption vocabulary, wrapped as plain
        // IOException by Hadoop's built-in gzip codec. SPECIFIC phrases,
        // not bare "invalid"/"incorrect": a transient auth/filesystem
        // fault ("Invalid token", "token ... otherwise invalid") must
        // still fail the task, not read as a salvage.
        m.contains("invalid distance") || m.contains("invalid code") ||
        m.contains("invalid block") || m.contains("invalid stored block") ||
        m.contains("invalid literal") || m.contains("invalid window size") ||
        m.contains("incorrect header check") || m.contains("incorrect data check") ||
        m.contains("incorrect length check") ||
        m.contains("unknown compression") || m.contains("too many length")
  }

  /** An IOException that originated in the RAW FILESYSTEM stream under
    * the decompressor — a transient HDFS/network/auth fault, never
    * archive corruption. [[WarcRecordReader.isCorruptStream]] keys its
    * salvage decision on this tag FIRST: a filesystem error whose
    * message happens to contain a corruption token ("...crc...") must
    * still fail the task, and an inflater message variant missing from
    * the heuristic list still salvages, because anything the tagged
    * stream did NOT throw arose inside the decompressor.
    */
  private[sources] final class UpstreamIOException(cause: java.io.IOException)
    extends java.io.IOException(cause.getMessage, cause)

  /** Wraps the raw filesystem stream and tags every IOException it
    * throws as [[UpstreamIOException]], so exception ORIGIN (filesystem
    * vs decompressor) is structural instead of message-text guesswork.
    */
  private[sources] final class TaggingInputStream(in: java.io.InputStream)
    extends java.io.FilterInputStream(in) {
    private def tag[A](body: => A): A =
      try body catch { case e: java.io.IOException => throw new UpstreamIOException(e) }
    override def read(): Int = tag(super.read())
    override def read(b: Array[Byte], off: Int, len: Int): Int =
      tag(super.read(b, off, len))
    override def skip(n: Long): Long = tag(super.skip(n))
    override def available(): Int = tag(super.available())
  }
}

class WarcRecordReader extends RecordReader[LongWritable, Text] {
  import WarcInputFormat._

  private var start = 0L
  private var end = 0L
  private var pos = 0L
  private var compressed = false
  private var compressedLen = 0L
  private var maxBuffered = MaxBufferedBytesDefault
  private var ctx: TaskAttemptContext = _
  private var salvaged = false
  private var in: java.io.DataInputStream = _
  private var fsIn: org.apache.hadoop.fs.FSDataInputStream = _
  private val key = new LongWritable
  private val value = new Text
  private val buffer = new DataOutputBuffer

  override def initialize(genericSplit: InputSplit, ctx: TaskAttemptContext): Unit = {
    this.ctx = ctx
    val split = genericSplit.asInstanceOf[FileSplit]
    start = split.getStart
    end = start + split.getLength
    // clamp below Int.MaxValue: the buffer and Text are int-indexed
    maxBuffered = math.min(
      ctx.getConfiguration.getLong(MaxBufferedBytesKey, MaxBufferedBytesDefault),
      (Int.MaxValue - 16).toLong)
    val codec = new CompressionCodecFactory(ctx.getConfiguration)
      .getCodec(split.getPath)
    val fs = split.getPath.getFileSystem(ctx.getConfiguration)
    fsIn = fs.open(split.getPath)
    try {
      if (codec != null) {
        // compressed archives (the shipped .warc.gz form) are NOT
        // byte-seekable — isSplitable already pinned one split per file,
        // so this reader owns the WHOLE decompressed stream: positions
        // below are decompressed-stream offsets and `end` is unbounded
        // (parallelism = file count, which is how crawl dumps shard).
        require(start == 0L,
          s"compressed ${split.getPath} must be a single split (got start=$start)")
        compressed = true
        compressedLen = split.getLength
        end = Long.MaxValue
        // the raw stream is TAGGED before the codec wraps it: an
        // IOException surfacing from readByte() is then structurally
        // attributable — UpstreamIOException = filesystem fault (fail
        // the task), anything else arose inside the decompressor
        in = new java.io.DataInputStream(new java.io.BufferedInputStream(
          codec.createInputStream(new TaggingInputStream(fsIn)), 1 << 20))
        pos = 0L
      } else {
        fsIn.seek(start)
        in = new java.io.DataInputStream(new java.io.BufferedInputStream(fsIn, 1 << 20))
        pos = start
      }
    } catch {
      case e: Throwable =>
        fsIn.close() // `close()` only closes `in`, which is still null here
        throw e
    }
  }

  private def count(name: String): Unit =
    if (ctx != null) ctx.getCounter(CounterGroup, name).increment(1L)

  private def isCorruptStream(e: java.io.IOException): Boolean =
    WarcInputFormat.isCorruptStream(e)

  private def readByte(): Int = {
    // a truncated/corrupt gzip stream surfaces from the DECOMPRESSOR
    // mid-read; treat it as EOF so the malformed TAIL drops (the plain
    // path's truncated-record semantics) instead of failing the task —
    // salvage every complete record before the corruption. The catch is
    // NARROW: a transient filesystem fault still fails the task rather
    // than silently truncating the archive, and a salvage is observable
    // (one log line + a task counter), never indistinguishable from a
    // genuinely short file.
    val b =
      try in.read()
      catch {
        case e: java.io.IOException if compressed && isCorruptStream(e) =>
          if (!salvaged) {
            salvaged = true
            count(SalvagedStreams)
            log.warn(s"corrupt compressed WARC stream salvaged at pos=$pos: ${e.getMessage}")
          }
          -1
      }
    if (b >= 0) pos += 1
    b
  }

  /** Scan forward for the record magic. Returns false at EOF, or when
    * no magic can still BEGIN before the split end — a match is accepted
    * only if its first byte lies before `end` (the ownership contract:
    * a record belongs to the split its magic begins in; a magic starting
    * at or after `end` is the next split's record, even when the scan
    * reached it through a partial-match run crossing the boundary).
    */
  private def scanToMagic(): Boolean = {
    var i = 0
    var matchStart = 0L
    while (true) {
      val b = readByte()
      if (b == -1) return false
      if (b == Magic(i)) {
        if (i == 0) matchStart = pos - 1
        i += 1
        if (i >= Magic.length) {
          if (matchStart < end) return true
          return false // magic begins in the next split: not ours
        }
      } else {
        if (b == Magic(0)) { i = 1; matchStart = pos - 1 } else i = 0
        if (i == 0 && pos >= end) return false
      }
    }
    false
  }

  /** Read header bytes (recording) through CRLFCRLF, capped. */
  private def readHeaders(): Boolean = {
    var i = 0
    var n = 0
    while (n < MaxHeaderBytes) {
      val b = readByte()
      if (b == -1) return false
      buffer.write(b)
      n += 1
      if (b == HeaderEnd(i)) {
        i += 1
        if (i >= HeaderEnd.length) return true
      } else i = if (b == HeaderEnd(0)) 1 else 0
    }
    false
  }

  /** Header resolution from the buffered candidate bytes (ASCII),
    * relative to the LAST `WARC/1.0\r\n` occurrence in the buffer: a
    * false sync whose junk prefix carries a stray Content-Length line
    * (with no CRLFCRLF before a real record's headers) must not have
    * that junk length applied to the real record — the headers that
    * validate the candidate and the length that frames it must come
    * from the SAME (last) magic. Returns (magicIdx, contentLength):
    * `magicIdx` is the byte offset of that last magic within the buffer
    * (0 when the sync was genuine), `contentLength` the leading digits
    * of its Content-Length value, or -1 when the candidate lacks a
    * WARC-Type or Content-Length after the last magic, or the length is
    * implausibly large (beyond [[WarcInputFormat.MaxRecordBytes]] — a
    * wrapped or garbage length must reject the candidate, never direct
    * a near-infinite read). The WARC-Type requirement is what separates
    * a real record from the most common false sync: an HTTP response
    * embedded in a payload has Content-Length + CRLFCRLF but no
    * WARC-Type.
    */
  private def resolveHeaders(): (Int, Long) = {
    // ISO-8859-1 maps one byte to one char, so char index == byte index.
    // The RAW string anchors the magic CASE-EXACTLY (scanToMagic is
    // byte-exact; a lowercased search would let 'Warc/1.0' in a header
    // value mis-anchor); the lowercased copy serves header-NAME lookups,
    // which are case-insensitive per the spec.
    val hRaw = new String(buffer.getData, 0, buffer.getLength,
      StandardCharsets.ISO_8859_1)
    val h = hRaw.toLowerCase(java.util.Locale.ROOT)
    // Anchor selection: the EARLIEST magic whose following block is a
    // WELL-FORMED header run (every CRLF-delimited line up to the final
    // CRLFCRLF is `field-name: value` — WARC field names are tokens —
    // or an obs-fold continuation) carrying a WARC-Type and a plausible
    // Content-Length. This rejects BOTH false-sync shapes at once:
    //   - a junk-prefixed sync (the junk line before the real record
    //     has no colon → anchor 0 is malformed → the real magic, found
    //     next, anchors the record with the real Content-Length), and
    //   - a decorative magic inside genuine headers ('WARC-Conformance:
    //     WARC/1.0' at ANY position relative to WARC-Type): the true
    //     magic at index 0 is well-formed and EARLIER, so it wins and
    //     no header is clipped.
    // Cost: a record whose headers contain a colon-less line (a
    // non-conformant writer) now rejects as a false sync — stricter
    // than before, and exactly what the spec requires of headers.
    def wellFormed(magicIdx: Int): Boolean = {
      var lineStart = magicIdx + "WARC/1.0\r\n".length
      val end = hRaw.length - 4 // the final CRLFCRLF
      while (lineStart < end) {
        var eol = hRaw.indexOf("\r\n", lineStart)
        if (eol < 0 || eol > end) eol = end
        val c0 = hRaw.charAt(lineStart)
        if (c0 != ' ' && c0 != '\t') { // not an obs-fold continuation
          val colon = hRaw.indexOf(':', lineStart)
          if (colon < 0 || colon >= eol) return false
          var i = lineStart
          while (i < colon) { // token field-name: printable, no space
            val c = hRaw.charAt(i)
            if (c <= ' ' || c > '~') return false
            i += 1
          }
        }
        lineStart = eol + 2
      }
      true
    }
    def resolveAt(magicIdx: Int): Long = {
      val from = magicIdx + "WARC/1.0".length // include the magic's own \r\n
      if (h.indexOf("\r\nwarc-type:", from) < 0) return -1L
      val k = h.indexOf("\r\ncontent-length:", from)
      if (k < 0) return -1L
      var i = k + "\r\ncontent-length:".length
      while (i < h.length && h.charAt(i) == ' ') i += 1
      var v = -1L
      while (i < h.length && h.charAt(i) >= '0' && h.charAt(i) <= '9') {
        v = (if (v < 0) 0L else v) * 10 + (h.charAt(i) - '0')
        if (v > WarcInputFormat.MaxRecordBytes) return -1L
        i += 1
      }
      v
    }
    var magicIdx = 0
    // observability for the wellFormed cost documented above: a synced
    // candidate with a WARC-Type AND a plausible Content-Length that is
    // rejected SOLELY by header well-formedness (a colon-less line, a
    // space in a field name — non-conformant but previously framable
    // writers) is counted and logged, so the drop is distinguishable
    // from a genuinely short file. Pure false syncs (no WARC-Type — the
    // embedded-HTTP shape) resolve to -1 and are not counted.
    var rejectedResolvable = false
    while (magicIdx >= 0) {
      if (wellFormed(magicIdx)) {
        val v = resolveAt(magicIdx)
        if (v >= 0) return (magicIdx, v)
      } else if (!rejectedResolvable && resolveAt(magicIdx) >= 0) {
        // count/log AT detection — a later well-formed sync in the same
        // window returns early from this loop, and deferring the count
        // to the no-record exit would leave that dropped record
        // invisible to the very counter that exists to surface it
        rejectedResolvable = true
        count(RejectedMalformedHeaders)
        log.warn(s"rejected WARC sync candidate at pos=$pos: plausible " +
          "WARC-Type/Content-Length but malformed header lines")
      }
      magicIdx = hRaw.indexOf("WARC/1.0\r\n", magicIdx + 1)
    }
    (0, -1L)
  }

  override def nextKeyValue(): Boolean = {
    while (true) {
      buffer.reset()
      if (!scanToMagic()) return false
      val recordStart = pos - Magic.length
      buffer.write(Magic)
      if (readHeaders()) {
        val (magicIdx, cl) = resolveHeaders()
        if (cl >= 0 && cl > maxBuffered) {
          // a VALID record too large to buffer: consume its payload with
          // exact framing (so the scan resumes at the next record), emit
          // nothing, and make the skip observable
          count(SkippedOversized)
          log.warn(s"skipping oversized WARC record at $recordStart: " +
            s"Content-Length=$cl > maxBuffered=$maxBuffered")
          var i = 0L
          while (i < cl && readByte() != -1) i += 1
        } else if (cl >= 0) {
          var i = 0L
          var truncated = false
          while (i < cl && !truncated) {
            val b = readByte()
            if (b == -1) truncated = true
            else { buffer.write(b); i += 1 }
          }
          if (!truncated) {
            // emit from the LAST magic: on a junk-prefixed sync the bytes
            // before it are noise, and the reported offset must point at
            // the record's real magic (split-invariant). Ownership is
            // re-checked against THAT magic: if the junk prefix straddles
            // the split end, the real record begins in the next split and
            // its reader (scanning from `end`) will claim it — emitting
            // here would double-count it.
            if (recordStart + magicIdx >= end) return false
            key.set(recordStart + magicIdx)
            value.set(buffer.getData, magicIdx, buffer.getLength - magicIdx)
            return true
          }
          return false // EOF inside a payload: malformed tail, drop it
        }
      }
      // false sync (no parseable headers / no Content-Length): keep
      // scanning, unless we are already past the split end
      if (pos >= end) return false
    }
    false
  }

  override def getCurrentKey: LongWritable = key
  override def getCurrentValue: Text = value
  override def getProgress: Float =
    if (compressed)
      // decompressed `pos` has no meaningful ceiling; report the
      // COMPRESSED bytes consumed against the file length instead of a
      // permanently-0 pos/Long.MaxValue (which starves the Spark UI and
      // trips speculative-execution stall heuristics)
      if (compressedLen == 0L) 1.0f
      else math.min(1.0f, fsIn.getPos.toFloat / compressedLen)
    else if (end == start) 1.0f
    else math.min(1.0f, (pos - start).toFloat / (end - start))
  override def close(): Unit = if (in != null) in.close()
}
