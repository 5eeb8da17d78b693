package graft.osm

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.{DataOutputBuffer, LongWritable, Text}
import org.apache.hadoop.io.compress.CompressionCodecFactory
import org.apache.hadoop.mapreduce.{InputSplit, JobContext, RecordReader, TaskAttemptContext}
import org.apache.hadoop.mapreduce.lib.input.{FileInputFormat, FileSplit}

/** Splittable XML-element input format: one record per `<rowTag ...>`
  * element, from a SINGLE (possibly huge) uncompressed XML file.
  *
  * The split contract (the same one every line-based Hadoop reader uses):
  * a record BELONGS to the split in which its start tag begins; a reader
  * positioned mid-file scans forward to the first start tag at or after
  * its split start (bytes before it belong to the previous split's reader,
  * which reads past its own end to finish its last element). Memory is
  * O(single element), never O(split) — this is what makes an in-place scan
  * of a 100 GB .osm parallelize, where delimiter-record tricks blow up on
  * sparse row tags (the text before the first `</way>` is the entire
  * nodes section).
  *
  * XML assumptions (hold for any conformant writer, incl. OSM exports):
  * `<` is escaped inside attribute values, so raw `<rowTag` / `</rowTag>`
  * byte sequences only occur as real markup; elements of the same name do
  * not nest (true for OSM node/way/relation). Attribute values MAY contain
  * unescaped `>`, so root-tag scanning tracks quote state. The scanner
  * does NOT skip XML comments or CDATA sections — a literal `<rowTag` /
  * `</rowTag>` inside `<!-- -->` or `<![CDATA[ ]]>` would yield a phantom
  * or truncated record. Machine-generated OSM exports contain neither;
  * for hand-edited inputs use the stock (non-splittable) XML source,
  * whose parser handles them.
  */
class XmlElementInputFormat extends FileInputFormat[LongWritable, Text] {
  override def isSplitable(ctx: JobContext, file: Path): Boolean =
    new CompressionCodecFactory(ctx.getConfiguration).getCodec(file) == null

  override def createRecordReader(split: InputSplit, ctx: TaskAttemptContext)
      : RecordReader[LongWritable, Text] = new XmlElementRecordReader
}

object XmlElementInputFormat {
  /** Configuration key naming the element to extract (e.g. "node"). */
  val ROW_TAG_KEY = "graft.xml.rowtag"
}

class XmlElementRecordReader extends RecordReader[LongWritable, Text] {
  private var startTag: Array[Byte] = _
  private var endTag: Array[Byte] = _
  private var start = 0L
  private var end = 0L
  private var pos = 0L
  private var in: java.io.DataInputStream = _
  private var fsIn: org.apache.hadoop.fs.FSDataInputStream = _
  private val key = new LongWritable
  private val value = new Text
  private val buffer = new DataOutputBuffer

  override def initialize(genericSplit: InputSplit, ctx: TaskAttemptContext): Unit = {
    val split = genericSplit.asInstanceOf[FileSplit]
    val rowTag = ctx.getConfiguration.get(XmlElementInputFormat.ROW_TAG_KEY)
    require(rowTag != null && rowTag.nonEmpty, s"${XmlElementInputFormat.ROW_TAG_KEY} not set")
    startTag = ("<" + rowTag).getBytes(StandardCharsets.UTF_8)
    endTag = ("</" + rowTag + ">").getBytes(StandardCharsets.UTF_8)
    start = split.getStart
    end = start + split.getLength
    // the reader scans RAW bytes: on compressed input the tag scan would
    // silently find nothing and yield an empty (not failed!) DataFrame
    val codec = new CompressionCodecFactory(ctx.getConfiguration)
      .getCodec(split.getPath)
    if (codec != null)
      throw new UnsupportedOperationException(
        s"XmlElementInputFormat reads raw XML bytes; ${split.getPath} is " +
        s"${codec.getClass.getSimpleName}-compressed — decompress or shard it first")
    val fs = split.getPath.getFileSystem(ctx.getConfiguration)
    fsIn = fs.open(split.getPath)
    fsIn.seek(start)
    in = new java.io.DataInputStream(new java.io.BufferedInputStream(fsIn, 1 << 20))
    pos = start
  }

  private def readByte(): Int = {
    val b = in.read()
    if (b >= 0) pos += 1
    b
  }

  /** Scan forward for `tag`; when `record` is true, copy scanned bytes into
    * `buffer`. Returns false at EOF, or — when not recording — once the
    * scan position passes the split end with no match in progress (the next
    * element belongs to the next split). In non-recording (start-tag
    * search) mode a match is accepted only if its FIRST byte lies before
    * the split end: a start tag beginning at/after `end`, reached through
    * a partial-match run crossing the boundary (e.g. "<nod<node"), is the
    * next split's element — emitting it here would duplicate it.
    */
  private def readUntilMatch(tag: Array[Byte], record: Boolean): Boolean = {
    var i = 0
    var matchStart = 0L
    while (true) {
      val b = readByte()
      if (b == -1) return false
      if (record) buffer.write(b)
      if (b == tag(i)) {
        if (i == 0) matchStart = pos - 1
        i += 1
        if (i >= tag.length) {
          if (record || matchStart < end) return true
          return false // tag begins in the next split: not ours
        }
      } else {
        if (b == tag(0)) { i = 1; matchStart = pos - 1 } else i = 0
        if (!record && i == 0 && pos >= end) return false
      }
    }
    false
  }

  /** After the start-tag bytes matched: boundary byte must terminate the
    * tag name ("<node" must not match "<nodeset").
    */
  private def boundaryOk(b: Int): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '>' || b == '/'

  override def nextKeyValue(): Boolean = {
    while (true) {
      buffer.reset()
      if (!readUntilMatch(startTag, record = false)) return false
      val elementStart = pos - startTag.length
      val b0 = readByte()
      if (b0 == -1) return false
      if (boundaryOk(b0)) {
        buffer.write(startTag)
        buffer.write(b0)
        // phase 1: the root tag itself, quote-aware ('>' is legal inside
        // attribute values). Ends at '>' — "/>" completes the element.
        var rootClosed = b0 == '>'
        var selfClosed = false
        var prev = b0
        var inQuote = 0 // 0 = none, else the active quote char
        while (!rootClosed && !selfClosed) {
          val b = readByte()
          if (b == -1) return false // malformed tail: drop it
          buffer.write(b)
          if (inQuote != 0) { if (b == inQuote) inQuote = 0 }
          else if (b == '"' || b == '\'') inQuote = b
          else if (b == '>') { if (prev == '/') selfClosed = true else rootClosed = true }
          prev = b
        }
        // phase 2 (open element): copy bytes through the matching end tag.
        // Same-name elements do not nest and '<' is escaped in values, so a
        // raw end-tag byte match is the element end.
        if (selfClosed || readUntilMatch(endTag, record = true)) {
          key.set(elementStart)
          value.set(buffer.getData, 0, buffer.getLength)
          return true
        }
        return false // EOF inside an element: malformed tail, drop it
      }
      // not a real start tag (e.g. "<nodeset"): keep scanning, unless we
      // are already past the split end
      if (pos >= end) return false
    }
    false
  }

  override def getCurrentKey: LongWritable = key
  override def getCurrentValue: Text = value
  override def getProgress: Float =
    if (end == start) 1.0f else math.min(1.0f, (pos - start).toFloat / (end - start))
  override def close(): Unit = if (in != null) in.close()
}
