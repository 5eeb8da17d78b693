package graft.ext

import graft.{Probe, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column conventions: media as opaque BINARY content plus a
  * typed metadata struct, with decode/feature-extract as batched
  * per-partition transforms.
  *
  * Two regimes:
  *   - PNG (round 7): a REAL codec path — `pngTable` encodes actual PNG
  *     bytes (javax.imageio, public JDK) from a closed-form pixel
  *     function of doc_id, and `decodePngStats` decodes them back and
  *     computes exact integer pixel statistics. PNG being lossless,
  *     decode(encode(gen)) ≡ gen, which is what lets a real binary codec
  *     round-trip be hash-checked against a relational oracle that
  *     recomputes the closed form (x_mm2b).
  *   - WAV/PCM (round 9): also REAL — `wavTable` encodes RIFF/WAVE bytes
  *     via javax.sound.sampled (public JDK) from a closed-form sample
  *     function, and `decodeWavStats` parses them back with a
  *     from-scratch RIFF chunk walker and computes exact integer signal
  *     statistics (x_mm4).
  *   - multi-frame GIF video (round 10): REAL — `gifTable` encodes
  *     ANIMATED GIF bytes (javax.imageio with an explicit 256-gray
  *     palette, public JDK) from a closed-form per-frame pixel function,
  *     and `decodeGifFrameStats` walks every stored frame back out and
  *     computes exact integer per-frame statistics with temporal frame
  *     sampling (x_mm5) — the frame-fan-out plumbing of x_mm3, now
  *     pixel-backed.
  *   - heavyweight video codecs (H.264 etc.) are NOT in this container,
  *     so the generic `extractFeatures`/`resizeStub` remain
  *     clearly-marked deterministic fakes — but the Spark-side plumbing
  *     is real: the schema convention, the Dataset[MediaRow] encoder,
  *     the mapPartitions batch shape (one codec init per partition, NOT
  *     per row — the pattern that matters at 100 TB), and the
  *     metadata-only pushdown path.
  */
object Multimodal {

  /** The encoded fixture staged train-once per corpus dir: encoding the
    * synthetic media is FIXTURE CONSTRUCTION, not the operator under
    * test (decode is), so bench steady-state times decoding alone.
    */
  private def stagedFixture(spark: SparkSession, dir: String, tag: String,
      build: => Dataset[MediaRow]): Dataset[MediaRow] = {
    import spark.implicits._
    val path = graft.util.TrainOnce(s"${tag}_fixture:$dir") {
      val p = graft.util.TempDirs.scratch(s"graft_${tag}_fx")
      build.write.mode("overwrite").parquet(p)
      p
    }
    // NOT partition-floored (measured, round 16): spreading this read to
    // local[32] made x_mm2b 1.17→5.36 s and x_mm5 2.31→3.99 s — the
    // javax.imageio/javax.sound decoders serialize on the JDK's global
    // synchronized plugin registry, so 32 concurrent decode tasks contend
    // instead of scaling. Single-task decode is faster at this fixture
    // size; a real binary corpus arrives in many splits and would need
    // per-executor reader instances, not more partitions.
    spark.read.parquet(path).as[MediaRow]
  }

  /** Schema convention for a multimodal column bundle. */
  case class MediaMeta(mime: String, n_bytes: Long, sha_prefix: String)
  case class MediaRow(doc_id: Long, content: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(doc_id: Long, mime: String, n_bytes: Long, feature: Array[Double])

  /** Build the binary bundle from the documents table (UTF-8 bytes stand in
    * for real media content; at 100 TB this is `spark.read.format("binaryFile")`
    * or parquet with a BINARY column).
    */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables(spark, dir, "documents")
      .select(col("doc_id"),
        encode(col("text"), "utf-8").as("content"),
        struct(
          lit("text/plain").as("mime"),
          octet_length(col("text")).cast("long").as("n_bytes"),
          substring(md5(col("text")), 1, 8).as("sha_prefix")).as("meta"))
      .as[MediaRow]
  }

  /** STUB decode: a real codec would parse `content` here. Deterministic
    * fake: 4 "features" derived from byte statistics. Batched per
    * partition so a real codec is initialized once per task.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init would go here (codec handles, model weights, ...)
      rows.map { r =>
        val bytes = r.content
        val n = bytes.length.max(1)
        val sum = bytes.foldLeft(0L)((a, b) => a + (b & 0xff))
        val feature = Array[Double](
          n.toDouble,
          sum.toDouble / n,
          bytes.count(_ == ' '.toByte).toDouble,
          (sum % 251).toDouble)
        MediaFeatures(r.doc_id, r.meta.mime, r.meta.n_bytes, feature)
      }
    }
  }

  /** X-MM1 — metadata-only path (oracle-checked): byte length, content
    * hash prefix, mime. The scan should never materialize `content` when
    * only metadata is projected.
    */
  private val mm1 = Probe(
    "x_mm1_binary_metadata",
    """SELECT doc_id, 'text/plain' AS mime,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  substr(md5(text), 1, 8) AS sha_prefix,
      |  lang, source
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Tables(s, dir, "documents").select(
      col("doc_id"), lit("text/plain").as("mime"),
      octet_length(col("text")).cast("long").as("n_bytes"),
      substring(md5(col("text")), 1, 8).as("sha_prefix"),
      col("lang"), col("source"))
      .orderBy("doc_id")
  }

  /** X-MM2 — the full binary pipeline: binary bundle → batched feature
    * extraction (stubbed decode) → aggregate. The feature math is integer
    * / exact, so even the stub is oracle-checkable.
    */
  private val mm2 = Probe(
    "x_mm2_binary_features",
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  CAST(len(string_split(text, ' ')) - 1 AS BIGINT) AS n_spaces,
      |  CAST(list_sum(list_transform(range(1, length(text) + 1),
      |       i -> ascii(substr(text, CAST(i AS INT), 1)))) % 251 AS BIGINT) AS byte_mod
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    extractFeatures(mediaTable(s, dir))
      .select(col("doc_id"),
        element_at(col("feature"), 1).cast("long").as("n_bytes"),
        element_at(col("feature"), 3).cast("long").as("n_spaces"),
        element_at(col("feature"), 4).cast("long").as("byte_mod"))
      .orderBy("doc_id")
  }

  /** X-MM3 — frame sampling: treat each document as a fake "video" whose
    * frame count derives from its metadata; emit every 5th frame as its own
    * row with a per-frame fingerprint. The plumbing is the real thing —
    * sequence + explode fans one media row out to per-frame records that
    * downstream decode/embed stages consume in parallel; only the frame
    * bytes are faked (no codecs in this container).
    */
  private val mm3 = Probe(
    "x_mm3_frame_sample",
    """SELECT doc_id, CAST(f AS BIGINT) AS frame_idx,
      |       md5(doc_id || ':' || f) AS frame_fp
      |FROM (SELECT doc_id, unnest(range(0, (n_chars % 50) + 1, 5)) AS f
      |      FROM documents)
      |ORDER BY doc_id, frame_idx""".stripMargin) { (s, dir) =>
    Tables(s, dir, "documents")
      .withColumn("n_frames", (col("n_chars") % 50 + 1).cast("int"))
      .select(col("doc_id"),
        explode(expr("sequence(0, n_frames - 1, 5)")).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        md5(concat(col("doc_id").cast("string"), lit(":"),
          col("frame_idx").cast("string"))).as("frame_fp"))
      .orderBy("doc_id", "frame_idx")
  }

  case class PixelStats(doc_id: Long, width: Long, height: Long,
      n_pixels: Long, sum_gray: Long, n_bright: Long)

  /** Deterministic 8-bit grayscale image per document, as REAL PNG bytes
    * (javax.imageio): width 8 + doc_id%9, height 8 + doc_id%7, pixel
    * value v(x,y) = (doc_id*31 + x*7 + y*13) % 256. The closed form is
    * what makes a genuine binary codec oracle-checkable — the DuckDB
    * side recomputes the same arithmetic with no PNG in sight, and PNG's
    * losslessness guarantees the decoded raster equals the generator.
    * Encoding is batched per partition (ImageIO writer machinery warmed
    * once per task); at 100 TB the equivalent is
    * `spark.read.format("binaryFile")` over an image lake.
    */
  def pngTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables(spark, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        val digest = java.security.MessageDigest.getInstance("MD5")
        ids.map { id =>
          val w = (8 + id % 9).toInt
          val h = (8 + id % 7).toInt
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val raster = img.getRaster
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              raster.setSample(x, y, 0, ((id * 31 + x * 7 + y * 13) % 256).toInt)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          val bytes = bos.toByteArray
          digest.reset()
          val sha = digest.digest(bytes).take(4).map("%02x".format(_)).mkString
          MediaRow(id, bytes, MediaMeta("image/png", bytes.length.toLong, sha))
        }
      }
  }

  /** REAL decode: parse each row's PNG bytes back to a raster
    * (javax.imageio, one reader init per partition) and compute exact
    * integer pixel statistics — dimensions, total gray mass, count of
    * bright (≥128) pixels. Exact integers so the result is
    * partitioning-independent and hash-checkable; reads the raster's
    * stored samples directly (no getRGB color-profile conversion).
    */
  def decodePngStats(media: Dataset[MediaRow]): Dataset[PixelStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // ONE reader instance per task, and a memory-backed input stream
      // constructed directly: ImageIO.read does a synchronized plugin-
      // registry scan per CALL and ImageIO.createImageInputStream spools
      // every payload to a temp FILE (useCache default) — both serialize
      // concurrent decode tasks on JDK-global state (r16 measured the
      // spread pessimization this caused; guide §4.5 init-once-per-task).
      val reader = javax.imageio.ImageIO.getImageReadersByFormatName("png").next()
      rows.map { r =>
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(r.content))
        reader.setInput(iis, true)
        val img = reader.read(0)
        iis.close()
        require(img != null, s"doc ${r.doc_id}: content is not a decodable image")
        val raster = img.getRaster
        val w = img.getWidth
        val h = img.getHeight
        var sum = 0L
        var bright = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = raster.getSample(x, y, 0)
            sum += v
            if (v >= 128) bright += 1
            x += 1
          }
          y += 1
        }
        PixelStats(r.doc_id, w.toLong, h.toLong, w.toLong * h, sum, bright)
      }
    }
  }

  /** X-MM2B — the PIXEL-BACKED binary pipeline (vs x_mm2's stub): real
    * PNG encode → real javax.imageio decode → exact integer pixel stats,
    * hash-matched against a DuckDB oracle that recomputes the generating
    * closed form relationally (no codec on the oracle side — PNG
    * losslessness is the bridge). This is the concrete form of the
    * multimodal-column claim: a genuine binary codec runs inside the
    * batched mapPartitions contract and its output survives the same
    * oracle gate as every relational operator.
    */
  private val mm2b = Probe(
    "x_mm2b_png_pixel_stats",
    """WITH dims AS (
      |  SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h FROM documents),
      |px AS (
      |  SELECT doc_id, w, h, (doc_id * 31 + x * 7 + y * 13) % 256 AS v
      |  FROM dims,
      |       UNNEST(generate_series(0, w - 1)) AS tx(x),
      |       UNNEST(generate_series(0, h - 1)) AS ty(y))
      |SELECT doc_id,
      |  CAST(max(w) AS BIGINT) AS width, CAST(max(h) AS BIGINT) AS height,
      |  CAST(count(*) AS BIGINT) AS n_pixels,
      |  CAST(sum(v) AS BIGINT) AS sum_gray,
      |  CAST(count(CASE WHEN v >= 128 THEN 1 END) AS BIGINT) AS n_bright
      |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
    decodePngStats(stagedFixture(s, dir, "png", pngTable(s, dir))).toDF().orderBy("doc_id")
  }

  case class WavStats(doc_id: Long, sample_rate: Long, n_samples: Long,
      duration_us: Long, sum_abs: Long, peak_abs: Long, n_rail: Long,
      n_zero_cross: Long)

  /** Deterministic 16-bit mono PCM clip per document, as REAL RIFF/WAVE
    * bytes encoded by `javax.sound.sampled.AudioSystem` (public JDK — the
    * audio analogue of x_mm2b's ImageIO): n = 64 + doc_id%97 samples at
    * 8/16/24 kHz, sample s(i) = (doc_id·131 + i·17) % 65536 − 32768. The
    * closed form is the oracle bridge: PCM is lossless, so the decoded
    * samples equal the generator and DuckDB recomputes the statistics
    * with no codec in sight. Encoding batched per partition (format
    * objects reused per task).
    */
  def wavTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables(spark, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        val digest = java.security.MessageDigest.getInstance("MD5")
        ids.map { id =>
          val n = (64 + id % 97).toInt
          val sr = (8000 * (1 + id % 3)).toInt
          val pcm = new Array[Byte](n * 2)
          val bb = java.nio.ByteBuffer.wrap(pcm).order(java.nio.ByteOrder.LITTLE_ENDIAN)
          var i = 0
          while (i < n) {
            bb.putShort((((id * 131 + i * 17) % 65536) - 32768).toShort)
            i += 1
          }
          val fmt = new javax.sound.sampled.AudioFormat(
            sr.toFloat, 16, 1, /*signed*/ true, /*bigEndian*/ false)
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(
            ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          val bytes = bos.toByteArray
          digest.reset()
          val sha = digest.digest(bytes).take(4).map("%02x".format(_)).mkString
          MediaRow(id, bytes, MediaMeta("audio/wav", bytes.length.toLong, sha))
        }
      }
  }

  /** REAL decode: a from-scratch RIFF chunk walker (no JDK audio classes
    * on the read side) — verifies RIFF/WAVE magic, walks chunks honoring
    * sizes and odd-size pad bytes, reads `fmt ` (PCM, mono, 16-bit
    * enforced loudly), decodes the `data` chunk's little-endian int16
    * samples, and computes exact integer signal statistics: duration
    * (truncating µs), total |s| mass, peak, rail-clipped count, and
    * zero crossings (sign changes, zero counted as non-negative). Exact
    * integers → partitioning-independent and hash-checkable.
    */
  def decodeWavStats(media: Dataset[MediaRow]): Dataset[WavStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val b = java.nio.ByteBuffer.wrap(r.content).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        def tag4(): String = {
          val a = new Array[Byte](4); b.get(a); new String(a, "US-ASCII")
        }
        require(tag4() == "RIFF", s"doc ${r.doc_id}: not a RIFF container")
        b.getInt // RIFF payload size (trust chunk walk, not this header)
        require(tag4() == "WAVE", s"doc ${r.doc_id}: not a WAVE form")
        var sampleRate = -1
        var pcmOff = -1
        var pcmLen = -1
        while (b.remaining() >= 8 && (sampleRate < 0 || pcmOff < 0)) {
          val id = tag4()
          val size = b.getInt
          id match {
            case "fmt " =>
              val fmtCode = b.getShort; val channels = b.getShort
              sampleRate = b.getInt
              b.getInt; b.getShort // byte rate, block align
              val bits = b.getShort
              require(fmtCode == 1 && channels == 1 && bits == 16,
                s"doc ${r.doc_id}: only PCM mono 16-bit supported " +
                  s"(fmt=$fmtCode ch=$channels bits=$bits)")
              b.position(b.position() + (size - 16) + (size & 1))
            case "data" =>
              pcmOff = b.position(); pcmLen = size
              b.position(b.position() + size + (size & 1))
            case _ => // LIST/INFO/fact/...: skip content + odd-size pad
              b.position(b.position() + size + (size & 1))
          }
        }
        require(sampleRate > 0 && pcmOff >= 0,
          s"doc ${r.doc_id}: missing fmt or data chunk")
        val n = pcmLen / 2
        val s = java.nio.ByteBuffer.wrap(r.content, pcmOff, pcmLen)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN).asShortBuffer()
        var sumAbs = 0L; var peak = 0L; var rail = 0L; var zc = 0L
        var prevNeg = false
        var i = 0
        while (i < n) {
          val v = s.get(i).toLong
          val a = Math.abs(v)
          sumAbs += a
          if (a > peak) peak = a
          if (v == -32768L || v == 32767L) rail += 1
          val neg = v < 0
          if (i > 0 && neg != prevNeg) zc += 1
          prevNeg = neg
          i += 1
        }
        WavStats(r.doc_id, sampleRate.toLong, n.toLong,
          n.toLong * 1000000L / sampleRate, sumAbs, peak, rail, zc)
      }
    }
  }

  /** X-MM4 — the SAMPLE-BACKED audio pipeline (vs the former stub): real
    * JDK WAVE encode → from-scratch RIFF/PCM chunk-walk decode → exact
    * integer signal stats, hash-matched against a DuckDB oracle that
    * recomputes the generating closed form relationally (PCM
    * losslessness is the bridge, as PNG's was for x_mm2b). The audio
    * claim in SURVEY §2 is sample-backed from this round.
    */
  private val mm4 = Probe(
    "x_mm4_wav_pcm_stats",
    """WITH dims AS (
      |  SELECT doc_id, 64 + doc_id % 97 AS n, 8000 * (1 + doc_id % 3) AS sr
      |  FROM documents),
      |sm AS (
      |  SELECT doc_id, n, sr, i,
      |    (doc_id * 131 + i * 17) % 65536 - 32768 AS v
      |  FROM dims, UNNEST(generate_series(0, n - 1)) AS t(i)),
      |sgn AS (
      |  SELECT doc_id, n, sr, v,
      |    CASE WHEN (v < 0) <> (lag(v) OVER (PARTITION BY doc_id ORDER BY i) < 0)
      |         THEN 1 ELSE 0 END AS flip
      |  FROM sm)
      |SELECT doc_id,
      |  CAST(max(sr) AS BIGINT) AS sample_rate,
      |  CAST(max(n) AS BIGINT) AS n_samples,
      |  CAST(max(n) * 1000000 // max(sr) AS BIGINT) AS duration_us,
      |  CAST(sum(abs(v)) AS BIGINT) AS sum_abs,
      |  CAST(max(abs(v)) AS BIGINT) AS peak_abs,
      |  CAST(count(CASE WHEN v = -32768 OR v = 32767 THEN 1 END) AS BIGINT) AS n_rail,
      |  CAST(sum(flip) AS BIGINT) AS n_zero_cross
      |FROM sgn GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
    decodeWavStats(stagedFixture(s, dir, "wav", wavTable(s, dir))).toDF().orderBy("doc_id")
  }

  case class GifFrameStats(doc_id: Long, n_frames: Long, frame_idx: Long,
      width: Long, height: Long, sum_gray: Long, n_bright: Long)

  /** Deterministic multi-frame (animated) GIF per document, as REAL GIF
    * bytes written frame-by-frame through `ImageIO`'s sequence writer —
    * the video analogue of x_mm2b's PNG and x_mm4's WAV: F = 2 + id%4
    * frames of (8 + id%5) × (8 + id%3) 8-bit pixels, frame f's pixel
    * v(f,x,y) = (id·31 + f·59 + x·7 + y·13) % 256. The palette is an
    * EXPLICIT 256-entry grayscale IndexColorModel, so the palette-indexed
    * LZW encoding is lossless in gray value regardless of how the writer
    * organizes indices — the closed form survives the codec and the
    * oracle recomputes it relationally. One writer init per partition.
    */
  def gifTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables(spark, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        val grays = Array.tabulate(256)(_.toByte)
        val cm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
        val digest = java.security.MessageDigest.getInstance("MD5")
        ids.map { id =>
          val w = (8 + id % 5).toInt
          val h = (8 + id % 3).toInt
          val nf = (2 + id % 4).toInt
          val bos = new java.io.ByteArrayOutputStream()
          val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
          val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
          writer.setOutput(ios)
          writer.prepareWriteSequence(null)
          var f = 0
          while (f < nf) {
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
            val raster = img.getRaster
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                raster.setSample(x, y, 0, ((id * 31 + f * 59 + x * 7 + y * 13) % 256).toInt)
                x += 1
              }
              y += 1
            }
            writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
            f += 1
          }
          writer.endWriteSequence()
          writer.dispose()
          ios.close()
          val bytes = bos.toByteArray
          digest.reset()
          val sha = digest.digest(bytes).take(4).map("%02x".format(_)).mkString
          MediaRow(id, bytes, MediaMeta("image/gif", bytes.length.toLong, sha))
        }
      }
  }

  /** REAL multi-frame decode with temporal sampling: open each row's GIF
    * with `ImageIO`'s reader, count the STORED frames, decode every
    * `step`-th frame, and compute exact integer per-frame gray
    * statistics. Gray values are read through `getRGB` (palette →
    * color → gray), so the stats are index-layout-independent — only
    * the 256-gray palette matters, not how the encoder ordered it.
    * One reader init per partition; one media row fans out to its
    * sampled frames (the x_mm3 explode shape, pixel-backed).
    */
  def decodeGifFrameStats(media: Dataset[MediaRow], step: Int = 2): Dataset[GifFrameStats] = {
    import media.sparkSession.implicits._
    require(step >= 1, s"step must be >= 1; got $step")
    media.mapPartitions { rows =>
      val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      rows.flatMap { r =>
        // memory-backed stream, constructed directly: the ImageIO factory
        // spools to a temp FILE per call (useCache default) and consults
        // the global registry — serial bottlenecks under concurrent tasks
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(r.content))
        reader.setInput(iis, false)
        val nf = reader.getNumImages(true)
        require(nf >= 1, s"doc ${r.doc_id}: no GIF frames")
        val out = (0 until nf by step).map { f =>
          val img = reader.read(f)
          val w = img.getWidth
          val h = img.getHeight
          var sum = 0L
          var bright = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val v = img.getRGB(x, y) & 0xff // gray palette: r == g == b
              sum += v
              if (v >= 128) bright += 1
              x += 1
            }
            y += 1
          }
          GifFrameStats(r.doc_id, nf.toLong, f.toLong, w.toLong, h.toLong, sum, bright)
        }
        iis.close()
        out
      }
    }
  }

  /** X-MM5 — the FRAME-BACKED video pipeline (the last multimodal stub
    * falls): real animated-GIF encode → real multi-frame decode with
    * temporal sampling (every 2nd frame) → exact integer per-frame
    * pixel stats, hash-matched against a DuckDB oracle recomputing the
    * generating closed form relationally (indexed-GIF losslessness over
    * a grayscale palette is the bridge, as PNG's and PCM's were).
    */
  private val mm5 = Probe(
    "x_mm5_gif_frame_stats",
    """WITH dims AS (
      |  SELECT doc_id, 8 + doc_id % 5 AS w, 8 + doc_id % 3 AS h,
      |         2 + doc_id % 4 AS nf
      |  FROM documents),
      |fr AS (
      |  SELECT doc_id, w, h, nf, f
      |  FROM dims, UNNEST(generate_series(0, nf - 1, 2)) AS t(f)),
      |px AS (
      |  SELECT doc_id, nf, f, w, h,
      |         (doc_id * 31 + f * 59 + x * 7 + y * 13) % 256 AS v
      |  FROM fr,
      |       UNNEST(generate_series(0, w - 1)) AS tx(x),
      |       UNNEST(generate_series(0, h - 1)) AS ty(y))
      |SELECT doc_id,
      |  CAST(nf AS BIGINT) AS n_frames, CAST(f AS BIGINT) AS frame_idx,
      |  CAST(max(w) AS BIGINT) AS width, CAST(max(h) AS BIGINT) AS height,
      |  CAST(sum(v) AS BIGINT) AS sum_gray,
      |  CAST(count(CASE WHEN v >= 128 THEN 1 END) AS BIGINT) AS n_bright
      |FROM px GROUP BY doc_id, nf, f ORDER BY doc_id, frame_idx""".stripMargin) { (s, dir) =>
    decodeGifFrameStats(stagedFixture(s, dir, "gif", gifTable(s, dir))).toDF().orderBy("doc_id", "frame_idx")
  }

  /** STUB resize: a real implementation decodes, scales, re-encodes. The
    * deterministic fake preserves the plumbing contract: metadata-driven,
    * per-row, output carries the requested dimensions plus a content tag.
    */
  def resizeStub(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition scaler init would go here
      rows.map { r =>
        MediaFeatures(r.doc_id, r.meta.mime, r.meta.n_bytes,
          Array(w.toDouble, h.toDouble, r.content.length.toDouble))
      }
    }
  }

  val all: Seq[Probe] = Seq(mm1, mm2, mm2b, mm3, mm4, mm5)
}
