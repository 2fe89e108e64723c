package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column operators (north-star surface): image/audio/video
  * handled as OPAQUE `binary` payloads with typed metadata, exactly as a
  * 100 TB training-data pipeline carries them — the engine never interprets
  * media bytes except inside an explicit decode stage.
  *
  * IMAGE and AUDIO decode are REAL: [[decodeImageFeatures]] runs the JDK's
  * own `javax.imageio.ImageIO` (PNG/JPEG/BMP/GIF readers ship with Java —
  * zero external dependencies) and emits true pixel dimensions + channel
  * statistics; [[decodeAudioFeatures]] runs `javax.sound.sampled` (WAV/
  * AIFF/AU readers likewise ship with the JDK) and emits the true sample
  * rate, channel count, and exact-integer RMS. VIDEO remains the one
  * stubbed modality (no JDK codec). Payloads in formats the runtime has no
  * reader for fall back to DETERMINISTIC byte-stat pseudo-features flagged
  * `decoded = false`, and the Spark-side plumbing —
  * schema, encoders, batched `mapPartitions` (the JVM analog of
  * `mapInPandas`: one iterator per partition, processed in fixed-size
  * batches as a vectorized codec would), partition sizing, frame explosion
  * — is identical on both paths.
  *
  * Scale notes: payloads never enter a shuffle key; metadata-only transforms
  * are pure column expressions (codegen); decode is per-partition streaming
  * with bounded memory (`batchSize` rows in flight).
  */
object MultimodalOps {

  /** One media row: opaque payload + typed metadata. */
  case class MediaRow(doc_id: Long, modality: String, payload: Array[Byte],
                      format: String, width: Int, height: Int,
                      duration_ms: Long)

  /** Stub decode output: per-payload pseudo-features. */
  case class MediaFeatures(doc_id: Long, modality: String, n_bytes: Int,
                           mean_byte: Double, checksum: Long)

  /** A sampled video frame (plumbing for frame-level training data). */
  case class Frame(doc_id: Long, frame_idx: Int, offset_ms: Long,
                   payload: Array[Byte])

  /** STUB — deterministic pseudo-decode: byte statistics standing in for
    * pixel statistics. Replace with a real codec (jpeg/PNG) to productionize;
    * signature and batch shape stay identical. */
  def decodeStub(row: MediaRow): MediaFeatures = {
    val bytes = row.payload
    var sum = 0L
    var crc = 1L
    var i = 0
    while (i < bytes.length) {
      sum += bytes(i) & 0xff
      crc = crc * 31 + (bytes(i) & 0xff)
      i += 1
    }
    MediaFeatures(row.doc_id, row.modality, bytes.length,
      if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length, crc)
  }

  /** Batched per-partition decode: the mapInPandas-shaped entry point. The
    * iterator is consumed in `batchSize` groups so a vectorized codec can
    * process arrays-of-payloads without materializing the partition. */
  def extractFeatures(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // batch boundary = where a real codec would run one vectorized call
        batch.iterator.map(decodeStub)
      }
    }
  }

  /** Real image decode output: true pixel dimensions + channel mean when the
    * JDK carries a reader for the format (`decoded = true`), byte-stat
    * fallback otherwise (img_width/img_height = -1, mean = mean byte). */
  case class ImageFeatures(doc_id: Long, decoded: Boolean, img_width: Int,
                           img_height: Int, mean_luma: Double, n_bytes: Int)

  /** REAL decode via `javax.imageio.ImageIO` — PNG/JPEG/BMP/GIF/WBMP readers
    * ship with the JDK. `mean_luma` is the mean of (r+g+b)/3 over all pixels
    * computed in exact integer sums (so a solid-color fixture decodes to its
    * exact channel value — oracle-derivable without a decoder on the oracle
    * side). Undecodable payloads (absent codec, truncated file) keep the
    * deterministic stub path with `decoded = false`. */
  def decodeImageFeatures(row: MediaRow): ImageFeatures = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(row.payload))
      catch { case _: Exception => null }
    if (img == null) {
      val f = decodeStub(row)
      ImageFeatures(row.doc_id, decoded = false, -1, -1, f.mean_byte, f.n_bytes)
    } else {
      val w = img.getWidth
      val h = img.getHeight
      var sum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      ImageFeatures(row.doc_id, decoded = true, w, h,
        if (n == 0) 0.0 else sum.toDouble / (3.0 * n), row.payload.length)
    }
  }

  /** Batched per-partition REAL image decode — same batch shape as
    * [[extractFeatures]], kernel swapped for ImageIO. */
  def decodeImages(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.iterator.map(decodeImageFeatures))
    }
  }

  /** Deterministic grayscale-pattern PNG encoder: `lumas` is the row-major
    * w×h luma grid (0–255; pixel rgb = c·0x010101). PNG is lossless, so
    * decode recovers every pixel exactly — the q67 fixture idea extended
    * from solid colors to arbitrary patterns, which is what a PERCEPTUAL
    * hash needs (a solid image hashes to all-zero bits). */
  def encodePngGray(w: Int, h: Int, lumas: Array[Int]): Array[Byte] = {
    require(lumas.length == w * h, "encodePngGray: lumas must be w*h")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val c = lumas(y * w + x) & 0xff
        img.setRGB(x, y, (c << 16) | (c << 8) | c)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** dHash output: the 64-bit difference hash carried as FOUR 16-bit band
    * ints (b0..b3, bit i = y·8+x lives in band i/16 at offset i%16) —
    * sign-free on both engines, and the bands ARE the LSH blocking keys:
    * by pigeonhole, two hashes within Hamming distance 3 agree on at least
    * one of the 4 bands, so the banded candidate join is EXACT (zero
    * recall loss) for the ≤3 near-dup contract. */
  case class DHashRow(doc_id: Long, decoded: Boolean,
                      b0: Int, b1: Int, b2: Int, b3: Int)

  /** REAL perceptual difference-hash (dHash) via ImageIO: decode the 9×8
    * grayscale fixture, bit (y·8+x) = 1 iff the 3-channel pixel sum grows
    * left→right — pure integer comparisons on losslessly-recovered pixels,
    * so a deterministic fixture's hash is oracle-derivable arithmetically.
    * Non-9×8 or undecodable payloads return decoded = false with -1 bands
    * (strict: the hash contract is defined on the canonical dHash grid;
    * resampling arbitrary sizes would put a float resize kernel between
    * the oracle and the bits). */
  def decodeDHash(row: MediaRow): DHashRow = {
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(row.payload))
      if (img == null || img.getWidth != 9 || img.getHeight != 8)
        throw new IllegalArgumentException("not a 9x8 dHash grid")
      def sum3(x: Int, y: Int): Int = {
        val rgb = img.getRGB(x, y)
        ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
      }
      val bands = new Array[Int](4)
      var i = 0
      while (i < 64) {
        val x = i % 8
        val y = i / 8
        if (sum3(x + 1, y) > sum3(x, y)) bands(i / 16) |= (1 << (i % 16))
        i += 1
      }
      DHashRow(row.doc_id, decoded = true, bands(0), bands(1), bands(2), bands(3))
    } catch {
      case _: Exception => DHashRow(row.doc_id, decoded = false, -1, -1, -1, -1)
    }
  }

  /** Batched per-partition dHash — the q67/q132/q144 batch shape. */
  def decodeDHashes(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[DHashRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.iterator.map(decodeDHash))
    }
  }

  /** Real audio decode output: container-reported format + exact sample
    * statistics when the JDK carries a reader (`decoded = true`), byte-stat
    * fallback otherwise (sample_rate/channels = -1, rms = mean byte). */
  case class AudioFeatures(doc_id: Long, decoded: Boolean, sample_rate: Int,
                           channels: Int, n_samples: Long, rms: Double)

  /** REAL decode via `javax.sound.sampled.AudioSystem` — WAV/AIFF/AU
    * readers ship with the JDK (zero external dependencies), mirroring the
    * ImageIO image path. 16-bit PCM samples are squared and summed as exact
    * BIGINTs, so a deterministic fixture's RMS is oracle-derivable
    * arithmetically: the integer sum is order-free and exact (< 2^53), and
    * `sqrt` of the same double is correctly rounded on both engines.
    * Undecodable payloads (absent codec, truncated header, non-16-bit
    * encodings) keep the deterministic stub path with `decoded = false`. */
  def decodeAudioFeatures(row: MediaRow): AudioFeatures = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    val in =
      try AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(row.payload))
      catch { case _: Exception => null }
    def fallback = {
      val f = decodeStub(row)
      AudioFeatures(row.doc_id, decoded = false, -1, -1, f.n_bytes.toLong, f.mean_byte)
    }
    if (in == null) fallback
    else try {
      val fmt = in.getFormat
      if (fmt.getEncoding != AudioFormat.Encoding.PCM_SIGNED ||
          fmt.getSampleSizeInBits != 16) fallback
      else {
        val bytes = in.readAllBytes()
        val n = bytes.length / 2
        var ss = 0L
        var i = 0
        while (i < n) {
          val s =
            if (fmt.isBigEndian) (bytes(2 * i) << 8) | (bytes(2 * i + 1) & 0xff)
            else (bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)
          ss += s.toLong * s
          i += 1
        }
        AudioFeatures(row.doc_id, decoded = true,
          fmt.getSampleRate.toInt, fmt.getChannels,
          if (fmt.getChannels == 0) 0L else n.toLong / fmt.getChannels,
          if (n == 0) 0.0 else math.sqrt(ss.toDouble / n))
      }
    } finally in.close()
  }

  /** Batched per-partition REAL audio decode — same batch shape as
    * [[extractFeatures]], kernel swapped for the sampled-audio reader. */
  def decodeAudio(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.iterator.map(decodeAudioFeatures))
    }
  }

  /** Audio fingerprint output: 64 energy-envelope difference bits carried
    * as FOUR 16-bit band ints — the audio twin of [[DHashRow]], with the
    * same pigeonhole blocking contract: two fingerprints within Hamming
    * distance 3 agree on at least one of the 4 bands, so a banded candidate
    * join is EXACT (zero recall loss) for the ≤3 near-dup threshold. */
  case class AudioFingerprintRow(doc_id: Long, decoded: Boolean,
                                 b0: Int, b1: Int, b2: Int, b3: Int)

  /** REAL energy-envelope fingerprint via the JDK's sampled-audio reader:
    * decode the mono 16-bit PCM stream, partition it into 65 frames of
    * `frameSize` samples, frame energy = exact BIGINT sum of squared
    * samples, bit f = 1 iff E(f+1) > E(f) — difference-coding of a frame
    * feature in the Haitsma–Kalker (2002) audio-fingerprint shape, with
    * the exact integer frame energy standing in for the filterbank band
    * energy (an FFT is a float transform that would put a numeric kernel
    * between the oracle and the bits; the envelope keeps every bit
    * arithmetically derivable from the encoded samples, the same
    * loss-free-oracle rule as [[decodeDHash]]'s 9×8 grid). Strict grid
    * contract: exactly 65·frameSize mono 16-bit samples, else
    * decoded = false with -1 bands. */
  def decodeAudioFingerprint(row: MediaRow, frameSize: Int = 4): AudioFingerprintRow = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    val in =
      try AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(row.payload))
      catch { case _: Exception => null }
    def fail = AudioFingerprintRow(row.doc_id, decoded = false, -1, -1, -1, -1)
    if (in == null) fail
    else try {
      val fmt = in.getFormat
      if (fmt.getEncoding != AudioFormat.Encoding.PCM_SIGNED ||
          fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1) fail
      else {
        val bytes = in.readAllBytes()
        val n = bytes.length / 2
        if (n != 65 * frameSize) fail
        else {
          val energies = new Array[Long](65)
          var i = 0
          while (i < n) {
            val s =
              if (fmt.isBigEndian) (bytes(2 * i) << 8) | (bytes(2 * i + 1) & 0xff)
              else (bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)
            energies(i / frameSize) += s.toLong * s
            i += 1
          }
          val bands = new Array[Int](4)
          var f = 0
          while (f < 64) {
            if (energies(f + 1) > energies(f)) bands(f / 16) |= (1 << (f % 16))
            f += 1
          }
          AudioFingerprintRow(row.doc_id, decoded = true,
            bands(0), bands(1), bands(2), bands(3))
        }
      }
    } finally in.close()
  }

  /** Batched per-partition audio fingerprinting — the q67/q132/q144 batch
    * shape with the envelope-fingerprint kernel. */
  def decodeAudioFingerprints(media: Dataset[MediaRow],
                              batchSize: Int = 64): Dataset[AudioFingerprintRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.iterator.map(r => decodeAudioFingerprint(r)))
    }
  }

  /** Deterministic WAV fixture encoder: mono 16-bit little-endian PCM.
    * WAV is lossless, so decode recovers every sample exactly — letting a
    * DuckDB oracle predict real-decode RMS arithmetically (the audio twin
    * of [[encodePng]]). */
  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val bytes = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      bytes(2 * i) = (samples(i) & 0xff).toByte
      bytes(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, samples.length.toLong)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Deterministic PNG fixture encoder: a solid-color `w`×`h` RGB image.
    * PNG is lossless, so decode recovers width/height/color exactly —
    * letting a DuckDB oracle predict real-decode output arithmetically. */
  def encodePng(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Real video decode output: frame count + per-frame-exact statistics
    * when the payload is a multi-frame format the JDK can read
    * (`decoded = true`), byte-stat fallback otherwise. */
  case class VideoFeatures(doc_id: Long, decoded: Boolean, n_frames: Int,
                           vid_width: Int, vid_height: Int,
                           mean_luma: Double, n_bytes: Int)

  /** REAL multi-frame decode via `javax.imageio` — the JDK ships no
    * MP4/H.264 codec (that share of the modality stays a documented
    * stub), but it DOES fully decode animated GIF, a real, lossless,
    * multi-frame motion format — so the frame-sequence plumbing
    * (demux → per-frame decode → cross-frame statistics) runs against a
    * true codec with an arithmetic oracle, exactly like q67's image path
    * and q132's audio path. Frame pixel sums are exact integers across
    * ALL frames; payloads without a multi-frame reader fall back to the
    * deterministic stub with `decoded = false`. */
  def decodeVideoFeatures(row: MediaRow): VideoFeatures = {
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(row.payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) throw new IllegalArgumentException("no reader")
        val r = readers.next()
        try {
          r.setInput(iis, false)
          val nf = r.getNumImages(true)
          if (nf < 1) throw new IllegalArgumentException("no frames")
          var sum = 0L
          var npix = 0L
          var w0 = 0
          var h0 = 0
          var k = 0
          while (k < nf) {
            val img = r.read(k)
            if (k == 0) { w0 = img.getWidth; h0 = img.getHeight }
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                val rgb = img.getRGB(x, y)
                sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
                x += 1
              }
              y += 1
            }
            npix += img.getWidth.toLong * img.getHeight
            k += 1
          }
          VideoFeatures(row.doc_id, decoded = true, nf, w0, h0,
            if (npix == 0) 0.0 else sum.toDouble / (3.0 * npix),
            row.payload.length)
        } finally r.dispose()
      } finally iis.close()
    } catch {
      case _: Exception =>
        val f = decodeStub(row)
        VideoFeatures(row.doc_id, decoded = false, -1, -1, -1,
          f.mean_byte, f.n_bytes)
    }
  }

  /** Batched per-partition REAL video decode — the q67/q132 batch shape. */
  def decodeVideos(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[VideoFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.iterator.map(decodeVideoFeatures))
    }
  }

  /** Deterministic animated-GIF fixture encoder: `frameColors(k)` is frame
    * k's solid RGB. GIF palettes are lossless for solid frames, so decode
    * recovers every frame's exact color — the oracle predicts cross-frame
    * means arithmetically, no decoder needed on the oracle side. Each
    * frame carries a GraphicControlExtension delay so the payload is a
    * well-formed animation, not just a multi-image container. */
  def encodeAnimatedGif(w: Int, h: Int, frameColors: Array[Int],
                        delayCs: Int): Array[Byte] = {
    import javax.imageio.{IIOImage, ImageIO, ImageTypeSpecifier}
    import javax.imageio.metadata.IIOMetadataNode
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val out = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frameColors.foreach { rgb =>
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { img.setRGB(x, y, rgb); x += 1 }
          y += 1
        }
        val meta = writer.getDefaultImageMetadata(
          new ImageTypeSpecifier(img), writer.getDefaultWriteParam)
        val fmt = meta.getNativeMetadataFormatName
        val root = meta.getAsTree(fmt).asInstanceOf[IIOMetadataNode]
        val gce = {
          var found: IIOMetadataNode = null
          val kids = root.getChildNodes
          var i = 0
          while (i < kids.getLength && found == null) {
            if (kids.item(i).getNodeName == "GraphicControlExtension")
              found = kids.item(i).asInstanceOf[IIOMetadataNode]
            i += 1
          }
          if (found == null) {
            val n = new IIOMetadataNode("GraphicControlExtension")
            root.appendChild(n); n
          } else found
        }
        gce.setAttribute("disposalMethod", "none")
        gce.setAttribute("userInputFlag", "FALSE")
        gce.setAttribute("transparentColorFlag", "FALSE")
        gce.setAttribute("transparentColorIndex", "0")
        gce.setAttribute("delayTime", delayCs.toString)
        meta.setFromTree(fmt, root)
        writer.writeToSequence(new IIOImage(img, null, meta), null)
      }
      writer.endWriteSequence()
    } finally { ios.close(); writer.dispose() }
    out.toByteArray
  }

  /** Metadata-only resize: pure expression work, payload untouched (a real
    * resize would pair this with a decode→scale→encode kernel). */
  def resizeMeta(media: DataFrame, maxDim: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxDim) / greatest(col("width"), col("height"), lit(1)))
    media
      .withColumn("out_width", ceil(col("width") * scale).cast("int"))
      .withColumn("out_height", ceil(col("height") * scale).cast("int"))
  }

  /** Frame sampling plumbing: one row per sampled frame every `everyMs`
    * (payload sliced deterministically as the stub "frame"). */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Long): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.modality == "video").flatMap { row =>
      val n = math.max(1L, row.duration_ms / everyMs).toInt
      (0 until n).iterator.map { i =>
        val off = i * everyMs
        val b = row.payload
        val slice = if (b.isEmpty) b
          else b.slice((i * 4) % b.length, math.min(b.length, (i * 4) % b.length + 4))
        Frame(row.doc_id, i, off, slice)
      }
    }
  }

  /** Deterministic synthetic media table derived from `documents` — the
    * fixture builder for environments with no real media: payload = md5
    * bytes of the text (16-byte "image"), metadata derived from doc stats.
    * Mirrored 1:1 by the DuckDB oracle (unhex(md5(text))). */
  def syntheticMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("modality"),
      unhex(md5(col("text"))).as("payload"),
      lit("fake").as("format"),
      (col("n_chars") % 640).cast("int").as("width"),
      (col("n_chars") % 480).cast("int").as("height"),
      (col("n_chars") * 10).cast("long").as("duration_ms"))
}
