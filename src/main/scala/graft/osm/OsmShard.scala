package graft.osm

import java.io.{BufferedReader, BufferedWriter}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** One-pass, constant-memory sharder for a monolithic .osm file.
  *
  * Spark's XML source does not split a single file (observed in
  * OsmScaleSpec): one 100 GB .osm would be one task. This utility is the
  * ingest-side fix — stream the file once, cut element-aligned shards, and
  * every downstream scan parallelizes per shard. The single sequential
  * pass is unavoidable for one file (you cannot know element boundaries
  * without reading), but it is IO-bound line copying with O(1) memory —
  * the same shape as the reference's iterparse + root.clear() (Step_2:191-199).
  *
  * Boundary rule: shards are only cut immediately BEFORE a line that opens
  * a new top-level element (<node/<way/<relation), which is how OSM
  * exports (and Overpass output) are laid out. Each shard is wrapped as a
  * complete <osm> document.
  */
object OsmShard {

  private val opensElement = raw"""^\s*<(node|way|relation)[\s>/].*""".r

  /** Split `inPath` into element-aligned shards of ~`bytesPerShard`.
    * Returns the shard paths.
    */
  def shard(inPath: String, outDir: String, bytesPerShard: Long): Seq[String] = {
    new java.io.File(outDir).mkdirs()
    val header = "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n<osm version=\"0.6\">\n"
    val footer = "</osm>\n"

    // Explicit UTF-8: the platform default charset can be US-ASCII (LANG
    // unset), which would silently mangle multi-byte OSM tag values to '?'.
    // Single 1 MB buffer layer (newBufferedReader's own default is 8 KB).
    val in = new BufferedReader(new java.io.InputStreamReader(
      Files.newInputStream(Paths.get(inPath)), StandardCharsets.UTF_8), 1 << 20)
    val shards = scala.collection.mutable.ListBuffer.empty[String]
    var out: BufferedWriter = null
    var written = 0L
    var idx = 0

    def open(): Unit = {
      val p = f"$outDir/shard_$idx%05d.osm"
      shards += p
      out = new BufferedWriter(new java.io.OutputStreamWriter(
        Files.newOutputStream(Paths.get(p)), StandardCharsets.UTF_8), 1 << 20)
      out.write(header)
      written = 0L
      idx += 1
    }
    def close(): Unit = if (out != null) { out.write(footer); out.close(); out = null }

    try {
      open()
      var line = in.readLine()
      while (line != null) {
        val isTopLevelOpen = opensElement.pattern.matcher(line).matches()
        // never emit the source doc's own header/root lines into shards
        val skip = line.contains("<?xml") || line.contains("<osm") ||
          line.contains("</osm>") || line.contains("<bounds")
        if (!skip) {
          if (isTopLevelOpen && written >= bytesPerShard) { close(); open() }
          out.write(line); out.write('\n')
          // byte-accurate shard sizing (line.length counts chars, not bytes)
          written += line.getBytes(StandardCharsets.UTF_8).length + 1
        }
        line = in.readLine()
      }
    } finally { close(); in.close() }
    shards.toSeq
  }
}
