package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus batch-shaped decode / feature
  * extraction (north-star in BASELINE.json).
  *
  * IMAGE decode/resize is REAL (pure-JDK `javax.imageio`:
  * [[Multimodal.ImageIoDecoder]] / [[Multimodal.ImageIoResizer]]), so
  * is AUDIO decode (pure-JDK `javax.sound.sampled` WAV/PCM:
  * [[Multimodal.WavDecoder]]), and so is VIDEO frame extraction for
  * MJPEG-in-AVI ([[Multimodal.sampleVideoFrames]] — RIFF container
  * parse, each frame a standalone JPEG the image codec decodes) AND
  * for a real TEMPORAL codec — Microsoft RLE8 delta video in AVI
  * ([[Multimodal.sampleRle8VideoFrames]]), where frame N is defined
  * relative to frame N-1 via skip/delta escapes and reconstruction
  * folds the stream onto a carried canvas. Transform-coded temporal
  * codecs (H.264 etc.) have no JDK decoder and remain out of scope;
  * `StubDecoder` produces a deterministic fake feature vector from
  * payload bytes and doubles as the hermetic-test codec. Everything
  * Spark-side — schema, batching, partitioning, the mapPartitions
  * pipeline shape — is real and is what matters at scale:
  *
  *  - payloads stay opaque binary end-to-end (never stringified);
  *  - decode runs per PARTITION in bounded-size batches (the JVM
  *    analogue of a Pandas-UDF `mapInPandas` batch loop): one decoder
  *    init per partition, amortized over rows;
  *  - output is (id, meta, features) — the decoded payload is NOT
  *    retained, so the shuffle after feature extraction carries
  *    ~dim*4 bytes per row instead of megabytes of media.
  */
object Multimodal {

  /** Typed media row: opaque payload + metadata. */
  final case class MediaRecord(
      media_id: Long,
      media_type: String,
      payload: Array[Byte],
      width: Int,
      height: Int)

  final case class MediaFeatures(
      media_id: Long,
      media_type: String,
      n_bytes: Int,
      features: Array[Float])

  /** The decode seam. Real pipelines plug an image/audio codec in
    * here; the stub derives `featureDim` floats deterministically from
    * the payload via an FNV-1a rolling hash (so tests are stable and
    * the full pipeline is exercised).
    */
  trait Decoder extends Serializable {
    def featureDim: Int
    def decode(payload: Array[Byte]): Array[Float]
  }

  final class StubDecoder(val featureDim: Int = 8) extends Decoder {
    def decode(payload: Array[Byte]): Array[Float] = {
      // real image codec: ImageIoDecoder below; audio/video codecs
      // would plug in here — deterministic fake for hermetic tests
      var h = 0xcbf29ce484222325L
      val out = new Array[Float](featureDim)
      var i = 0
      while (i < payload.length) {
        h = (h ^ (payload(i) & 0xffL)) * 0x100000001b3L
        out(i % featureDim) += ((h % 1000L) / 1000.0f)
        i += 1
      }
      out
    }
  }

  /** REAL image codec behind the same [[Decoder]] seam — pure JDK
    * `javax.imageio` (PNG/JPEG/GIF/BMP), no new dependencies. Features
    * are an `grid x grid` mean-pooled grayscale thumbnail (gray =
    * (299r + 587g + 114b)/1000, integer weights), the classic
    * perceptual-hash front end: all pixel math is integer accumulation
    * followed by one float division, so decoded features are
    * bit-deterministic for a given payload. Throws
    * `IllegalArgumentException` on an undecodable payload — at
    * pipeline scale wrap rows in a quarantine filter rather than
    * silently zero-filling corrupt media.
    *
    * The [[StubDecoder]] above stays the hermetic-test codec (and the
    * seam documentation for audio/video codecs this container lacks).
    */
  final class ImageIoDecoder(val grid: Int = 8) extends Decoder {
    def featureDim: Int = grid * grid
    def decode(payload: Array[Byte]): Array[Float] = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null)
        throw new IllegalArgumentException(
          s"undecodable image payload (${payload.length} bytes)")
      val (w, h) = (img.getWidth, img.getHeight)
      val sums = new Array[Long](grid * grid)
      val counts = new Array[Long](grid * grid)
      var y = 0
      while (y < h) {
        val cy = math.min(y * grid / h, grid - 1)
        var x = 0
        while (x < w) {
          val cx = math.min(x * grid / w, grid - 1)
          val rgb = img.getRGB(x, y)
          val gray = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
            114 * (rgb & 0xff)) / 1000
          sums(cy * grid + cx) += gray
          counts(cy * grid + cx) += 1
          x += 1
        }
        y += 1
      }
      Array.tabulate(grid * grid) { i =>
        if (counts(i) == 0) 0f else sums(i).toFloat / counts(i)
      }
    }
  }

  /** REAL audio codec behind the same [[Decoder]] seam — pure JDK
    * `javax.sound.sampled` (WAV/AIFF/AU containers, PCM encodings).
    * Features are per-window RMS energy over `windows` equal slices
    * of the channel-averaged sample stream — the classic
    * voice-activity / silence-trim front end. Sample decode is exact
    * integer math (16/8-bit PCM -> int, channel mean by integer
    * division) and the RMS accumulates sequentially in doubles, so
    * features are bit-deterministic for a given payload. Undecodable
    * payloads throw, like [[ImageIoDecoder]].
    */
  final class WavDecoder(val windows: Int = 8) extends Decoder {
    def featureDim: Int = windows
    def decode(payload: Array[Byte]): Array[Float] = {
      val samples = decodePcmSamples(payload)
      val nFrames = samples.length
      // per-window RMS (empty windows -> 0, matching the image codec's
      // empty-cell convention)
      Array.tabulate(windows) { w =>
        val from = (w.toLong * nFrames / windows).toInt
        val until = ((w + 1).toLong * nFrames / windows).toInt
        if (until <= from) 0f
        else {
          var ss = 0.0
          var i = from
          while (i < until) { ss += samples(i).toDouble * samples(i); i += 1 }
          math.sqrt(ss / (until - from)).toFloat
        }
      }
    }
  }

  /** Shared PCM container decode: WAV/AIFF/AU via `javax.sound`,
    * channel-averaged signed integer samples. Exact integer math
    * (16/8-bit PCM -> int, channel mean by integer division), so two
    * decodes of the same payload are bit-identical — the property the
    * audio fingerprint's cross-engine oracle rests on. Used by
    * [[WavDecoder]] (RMS features) and [[audioHaarDeltaBandsOf]]
    * (near-dup fingerprints).
    */
  private[graft] def decodePcmSamples(payload: Array[Byte]): Array[Int] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    val ais =
      try AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      catch {
        case e: javax.sound.sampled.UnsupportedAudioFileException =>
          throw new IllegalArgumentException(
            s"undecodable audio payload (${payload.length} bytes)", e)
      }
    val fmt = ais.getFormat
    require(fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED ||
      fmt.getEncoding == AudioFormat.Encoding.PCM_UNSIGNED,
      s"unsupported encoding ${fmt.getEncoding}")
    val bytesPerSample = fmt.getSampleSizeInBits / 8
    require(bytesPerSample == 1 || bytesPerSample == 2,
      s"unsupported sample size ${fmt.getSampleSizeInBits} bits")
    // 16-bit unsigned PCM would decode WRONG through the signed
    // path below — unheard-of in WAV (unsigned is 8-bit by spec
    // convention), so fail loudly rather than emit garbage features
    require(!(bytesPerSample == 2 &&
      fmt.getEncoding == AudioFormat.Encoding.PCM_UNSIGNED),
      "16-bit unsigned PCM is not supported")
    val raw = ais.readAllBytes()
    val channels = fmt.getChannels
    val frameBytes = bytesPerSample * channels
    val nFrames = raw.length / frameBytes
    // channel-averaged signed samples
    val samples = new Array[Int](nFrames)
    var f = 0
    while (f < nFrames) {
      var acc = 0
      var c = 0
      while (c < channels) {
        val off = f * frameBytes + c * bytesPerSample
        val s =
          if (bytesPerSample == 2) {
            val lo = raw(off) & 0xff
            val hi = raw(off + 1)
            if (fmt.isBigEndian) (raw(off) << 8) | (raw(off + 1) & 0xff)
            else (hi << 8) | lo
          } else if (fmt.getEncoding == AudioFormat.Encoding.PCM_UNSIGNED)
            (raw(off) & 0xff) - 128
          else raw(off).toInt
        acc += s
        c += 1
      }
      samples(f) = acc / channels
      f += 1
    }
    samples
  }

  /** Wrap a text table as a binary media table (UTF-8 payloads) — the
    * test harness for the plumbing; real sources would read raw bytes
    * (`spark.read.format("binaryFile")`).
    */
  def documentsAsMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      lit("text/plain").as("media_type"),
      encode(col("text"), "UTF-8").as("payload"),
      lit(0).as("width"),
      lit(0).as("height"))

  /** Batch-shaped feature extraction: mapPartitions with an explicit
    * batch size. The decoder is constructed once per partition.
    */
  def extractFeatures(
      spark: SparkSession,
      media: DataFrame,
      decoder: Decoder,
      batchSize: Int = 256): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // one "model invocation" per batch — the mapInPandas shape
        batch.iterator.map { r =>
          MediaFeatures(r.media_id, r.media_type, r.payload.length,
            decoder.decode(r.payload))
        }
      }
    }
  }

  // ---- resize (binary -> binary transform) --------------------------

  /** The resize seam (real codecs plug in here; the stub keeps a
    * deterministic byte-stride downsample so tests are stable).
    */
  trait Resizer extends Serializable {
    def resize(payload: Array[Byte], targetW: Int, targetH: Int): Array[Byte]
  }

  final class StubResizer extends Resizer {
    def resize(payload: Array[Byte], targetW: Int, targetH: Int): Array[Byte] = {
      // real image resize: ImageIoResizer below; deterministic stride
      // stub: output size = min(len, targetW*targetH), sampled evenly
      val target = math.min(payload.length, targetW * targetH)
      if (target <= 0) Array.emptyByteArray
      else {
        val out = new Array[Byte](target)
        var i = 0
        while (i < target) {
          out(i) = payload((i.toLong * payload.length / target).toInt)
          i += 1
        }
        out
      }
    }
  }

  /** REAL image resize behind the same [[Resizer]] seam: ImageIO
    * decode -> exact nearest-neighbor pixel remap (src index =
    * floor(dst * src/target) — pure integer math, no rendering-engine
    * interpolation, so resized pixels are bit-deterministic across
    * JVMs) -> lossless PNG re-encode. Undecodable payloads throw, as
    * in [[ImageIoDecoder]].
    */
  final class ImageIoResizer extends Resizer {
    def resize(payload: Array[Byte], targetW: Int, targetH: Int): Array[Byte] = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null)
        throw new IllegalArgumentException(
          s"undecodable image payload (${payload.length} bytes)")
      val out = new java.awt.image.BufferedImage(
        targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < targetH) {
        val sy = (y.toLong * img.getHeight / targetH).toInt
        var x = 0
        while (x < targetW) {
          val sx = (x.toLong * img.getWidth / targetW).toInt
          out.setRGB(x, y, img.getRGB(sx, sy) & 0xffffff)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      bos.toByteArray
    }
  }

  /** Binary-in/binary-out transform with the same per-partition batch
    * shape as [[extractFeatures]]; metadata (width/height) updated
    * alongside the payload so downstream stages trust the schema.
    */
  def resizeMedia(
      spark: SparkSession,
      media: DataFrame,
      targetW: Int,
      targetH: Int,
      resizer: Resizer,
      batchSize: Int = 256): Dataset[MediaRecord] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          MediaRecord(r.media_id, r.media_type,
            resizer.resize(r.payload, targetW, targetH), targetW, targetH)
        }
      }
    }
  }

  // ---- perceptual hash (dHash) for image near-dup --------------------

  /** Pixel row for [[encodeGrayPng]]: media id + row-major grayscale
    * pixel values in [0, 256).
    */
  final case class PixelRecord(media_id: Long, pixels: Seq[Int])

  /** dHash band row: the 64-bit difference hash split into four
    * 16-bit bands (b0 = bit rows 0-1 … b3 = bit rows 6-7) — kept as
    * four ints rather than one long so band-bucket LSH joins and
    * cross-engine duals never touch the sign bit.
    */
  final case class DhashBands(
      media_id: Long, b0: Int, b1: Int, b2: Int, b3: Int)

  /** Encode grayscale pixel arrays as REAL PNG binary payloads.
    * Pixels write as TYPE_INT_RGB with r = g = b = p — NOT
    * TYPE_BYTE_GRAY, whose `getRGB` round-trips through the
    * linear-gray → sRGB color transform and comes back nonlinear; the
    * RGB path is lossless, and the decoder's integer luma
    * (299p + 587p + 114p) / 1000 = p recovers the pixel EXACTLY, so
    * formula-derived fixtures stay bit-identical through a real
    * encode/decode cycle.
    */
  /** Row-major grayscale pixels -> real PNG bytes (the shared kernel
    * of [[encodeGrayPng]] and the per-video-frame hash path).
    */
  private[graft] def grayPngBytes(
      pixels: Seq[Int], w: Int, h: Int): Array[Byte] = {
    require(pixels.length == w * h,
      s"${pixels.length} pixels != $w x $h")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var i = 0
    while (i < pixels.length) {
      val p = pixels(i) & 0xff
      img.setRGB(i % w, i / w, (p << 16) | (p << 8) | p)
      i += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  def encodeGrayPng(
      spark: SparkSession,
      pixels: DataFrame,
      w: Int,
      h: Int,
      batchSize: Int = 256): Dataset[MediaRecord] = {
    import spark.implicits._
    pixels.as[PixelRecord].mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val bytes =
            try grayPngBytes(r.pixels, w, h)
            catch {
              case e: IllegalArgumentException =>
                throw new IllegalArgumentException(
                  s"media ${r.media_id}: ${e.getMessage}")
            }
          MediaRecord(r.media_id, "image/png", bytes, w, h)
        }
      }
    }
  }

  /** Difference-hash (dHash) of one decoded image: pool to
    * `cols x rows` integer block SUMS (exact — block means would
    * reintroduce float division), emit bit (r, c) = 1 iff
    * sum(r, c) > sum(r, c+1), pack the rows*(cols-1) = 64 bits into
    * four 16-bit bands. Image dimensions must divide evenly into the
    * grid — a mismatched payload is a silently wrong hash, so throw.
    */
  private[graft] def dhashBandsOf(
      payload: Array[Byte], cols: Int, rows: Int): Array[Int] = {
    require((cols - 1) * rows == 64,
      s"dhash grid must yield 64 bits, got (${cols} - 1) x $rows")
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    if (img == null)
      throw new IllegalArgumentException(
        s"undecodable image payload (${payload.length} bytes)")
    val (w, h) = (img.getWidth, img.getHeight)
    require(w % cols == 0 && h % rows == 0,
      s"image ${w}x$h does not tile a ${cols}x$rows dhash grid")
    val (bw, bh) = (w / cols, h / rows)
    val sums = new Array[Long](cols * rows)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val gray = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
          114 * (rgb & 0xff)) / 1000
        sums((y / bh) * cols + (x / bw)) += gray
        x += 1
      }
      y += 1
    }
    val bands = new Array[Int](4)
    var r = 0
    while (r < rows) {
      var c = 0
      while (c < cols - 1) {
        if (sums(r * cols + c) > sums(r * cols + c + 1)) {
          val bit = r * (cols - 1) + c
          bands(bit / 16) |= 1 << (bit % 16)
        }
        c += 1
      }
      r += 1
    }
    bands
  }

  /** Batch-shaped dHash extraction over a binary media table — the
    * perceptual-hash front end of image near-dup (LAION-style): the
    * wide payload column reduces to four 16-bit band ints per image,
    * and everything downstream (band-bucket join, Hamming verify)
    * moves 20-byte rows.
    */
  def imageDhashBands(
      spark: SparkSession,
      media: DataFrame,
      cols: Int = 9,
      rows: Int = 8,
      batchSize: Int = 256): Dataset[DhashBands] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val b = dhashBandsOf(r.payload, cols, rows)
          DhashBands(r.media_id, b(0), b(1), b(2), b(3))
        }
      }
    }
  }

  // ---- audio fingerprint (chromaprint-shaped) for audio near-dup ----

  /** Sample row for [[encodePcm16Wav]]: media id + signed 16-bit
    * sample values in [-32768, 32768).
    */
  final case class SampleRecord(media_id: Long, samples: Seq[Int])

  /** Encode integer sample arrays as REAL mono 16-bit PCM WAV binary
    * payloads — the canonical 44-byte RIFF/fmt/data layout
    * `javax.sound` reads back exactly. PCM16 is lossless for integer
    * samples, so formula-derived fixtures stay bit-identical through a
    * real encode/decode cycle (the audio analogue of
    * [[encodeGrayPng]]'s RGB-not-gray discipline).
    */
  def encodePcm16Wav(
      spark: SparkSession,
      samples: DataFrame,
      sampleRate: Int = 8000,
      batchSize: Int = 256): Dataset[MediaRecord] = {
    import spark.implicits._
    samples.as[SampleRecord].mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val n = r.samples.length
          val bytes = new Array[Byte](44 + 2 * n)
          val bb = java.nio.ByteBuffer.wrap(bytes)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + 2 * n)
            .put("WAVE".getBytes("US-ASCII"))
            .put("fmt ".getBytes("US-ASCII")).putInt(16)
            .putShort(1) // PCM
            .putShort(1) // mono
            .putInt(sampleRate)
            .putInt(sampleRate * 2) // byte rate
            .putShort(2) // block align
            .putShort(16) // bits per sample
            .put("data".getBytes("US-ASCII")).putInt(2 * n)
          var i = 0
          while (i < n) {
            val s = r.samples(i)
            require(s >= Short.MinValue && s <= Short.MaxValue,
              s"media ${r.media_id}: sample $i = $s outside 16-bit PCM")
            bb.putShort(s.toShort)
            i += 1
          }
          MediaRecord(r.media_id, "audio/wav", bytes, 0, 0)
        }
      }
    }
  }

  /** Chromaprint-shaped fingerprint of one decoded PCM stream: split
    * the samples into `windows` equal windows, compute per-window
    * LOW/HIGH Haar sub-band energies (low = Σ (s₂ᵢ + s₂ᵢ₊₁)², high =
    * Σ (s₂ᵢ - s₂ᵢ₊₁)² — a 2-tap filterbank, all exact integer
    * accumulation), and emit the temporal delta bits
    * bit(2w) = low(w) > low(w+1), bit(2w+1) = high(w) > high(w+1),
    * packed into four 16-bit bands. With the default 33 windows that
    * is 64 bits — the same band layout as the image dHash, so the
    * band-bucket join and Hamming verify are shared machinery.
    *
    * Reduced fidelity vs real chromaprint, by design: a 16-bin FFT
    * filterbank would be float math no second engine replays
    * bit-identically; the Haar pair IS a genuine spectral split
    * (DC vs Nyquist energy) with exact integer arithmetic, keeping the
    * whole fingerprint DuckDB-replayable — the mm3 discipline, which
    * is what lets the green oracle row PROVE the WAV codec roundtrip
    * is sample-exact.
    *
    * Window geometry must divide evenly (`nSamples = windows × even`)
    * — a ragged split is a silently wrong fingerprint, so throw.
    */
  private[graft] def audioHaarDeltaBandsOf(
      payload: Array[Byte], windows: Int): Array[Int] = {
    require((windows - 1) * 2 == 64,
      s"audio fingerprint needs 33 windows for 64 bits, got $windows")
    val samples = decodePcmSamples(payload)
    val n = samples.length
    require(n > 0 && n % windows == 0 && (n / windows) % 2 == 0,
      s"$n samples do not split into $windows even-sized windows")
    val ws = n / windows
    val low = new Array[Long](windows)
    val high = new Array[Long](windows)
    var w = 0
    while (w < windows) {
      var i = 0
      while (i < ws) {
        val a = samples(w * ws + i).toLong
        val b = samples(w * ws + i + 1).toLong
        low(w) += (a + b) * (a + b)
        high(w) += (a - b) * (a - b)
        i += 2
      }
      w += 1
    }
    val bands = new Array[Int](4)
    w = 0
    while (w < windows - 1) {
      if (low(w) > low(w + 1)) bands((2 * w) / 16) |= 1 << ((2 * w) % 16)
      if (high(w) > high(w + 1))
        bands((2 * w + 1) / 16) |= 1 << ((2 * w + 1) % 16)
      w += 1
    }
    bands
  }

  /** Batch-shaped audio-fingerprint extraction over a binary media
    * table — the perceptual front end of audio near-dup: the payload
    * column reduces to four 16-bit band ints per recording, and
    * everything downstream (band-bucket join, Hamming verify) moves
    * 20-byte rows, never audio bytes.
    */
  def audioFingerprintBands(
      spark: SparkSession,
      media: DataFrame,
      windows: Int = 33,
      batchSize: Int = 256): Dataset[DhashBands] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val b = audioHaarDeltaBandsOf(r.payload, windows)
          DhashBands(r.media_id, b(0), b(1), b(2), b(3))
        }
      }
    }
  }

  // ---- frame sampling (one -> many generator shape) -----------------

  final case class MediaFrame(
      media_id: Long,
      frame_idx: Int,
      payload: Array[Byte])

  /** REAL video frame extraction for MJPEG-in-AVI — the one video
    * format a zero-dependency JVM can fully handle: the AVI container
    * is plain RIFF (4cc + little-endian size chunks, 'RIFF'/'LIST'
    * nesting, frame payloads in 'NNdc'/'NNdb' chunks) and each MJPEG
    * frame is a standalone JPEG that [[ImageIoDecoder]] decodes. The
    * parser walks the chunk tree linearly, tolerates unknown chunks
    * (hdrl, idx1, junk padding), and stops at any malformed size
    * instead of over-reading. Returns the raw frame payloads in
    * stream order.
    */
  private[graft] def aviFrames(payload: Array[Byte]): Seq[Array[Byte]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    def le32(i: Int): Long =
      (payload(i) & 0xffL) | ((payload(i + 1) & 0xffL) << 8) |
        ((payload(i + 2) & 0xffL) << 16) | ((payload(i + 3) & 0xffL) << 24)
    def walk(from: Int, until: Int): Unit = {
      var i = from
      while (i + 8 <= until) {
        val id = new String(payload, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
        val size = le32(i + 4)
        if (size < 0 || i + 8 + size > until) return // malformed: stop
        if (id == "RIFF" || id == "LIST") {
          if (size >= 4) walk(i + 12, (i + 8 + size).toInt)
        } else if (id.length == 4 && id(0).isDigit && id(1).isDigit &&
            id(2) == 'd' && (id(3) == 'c' || id(3) == 'b') && size > 0) {
          out += java.util.Arrays.copyOfRange(payload, i + 8, (i + 8 + size).toInt)
        }
        i += (8 + size + (size & 1)).toInt // chunks pad to even
      }
    }
    if (payload.length >= 12 &&
        new String(payload, 0, 4, java.nio.charset.StandardCharsets.US_ASCII) == "RIFF")
      walk(0, payload.length)
    else
      throw new IllegalArgumentException(
        s"not a RIFF/AVI payload (${payload.length} bytes)")
    out.toSeq
  }

  /** REAL TEMPORAL (inter-frame) video decode: Microsoft RLE8
    * (biCompression = BI_RLE8, the `msrle` codec AVI has carried
    * since Video for Windows) — a delta-coded format a zero-dependency
    * JVM can decode exactly. Unlike MJPEG's independent frames, an
    * RLE8 frame is DEFINED relative to its predecessor: the escape
    * codes 00 00 (end of line), 00 02 dx dy (cursor delta), and any
    * implicit skip leave the underlying pixels at their PREVIOUS
    * frame's values, so reconstructing frame N requires decoding
    * frames 0..N-1 onto a carried canvas — the defining property of a
    * temporal codec, and why [[decodeRle8Video]] is a stateful fold,
    * not a per-frame map.
    *
    * Wire format per frame (8-bit indexed, bottom-up row order, per
    * the public BMP/AVI spec):
    *   `c d`  with c>0          -> run: c pixels of palette index d
    *   `00 00`                  -> end of line (x=0, y+=1)
    *   `00 01`                  -> end of bitmap
    *   `00 02 dx dy`            -> cursor delta (skipped pixels RETAIN)
    *   `00 n  p1..pn [pad]`     -> absolute: n literal pixels, padded
    *                               to an even byte count
    * Decoding is bounds-guarded: out-of-canvas writes are dropped and
    * a malformed stream terminates the frame, never over-reads.
    */
  private[graft] def decodeRle8Frame(
      data: Array[Byte], canvas: Array[Byte], w: Int, h: Int): Unit = {
    var x = 0
    var y = 0 // row from the BOTTOM (BMP convention)
    var i = 0
    def put(v: Byte): Unit = {
      if (x >= 0 && x < w && y >= 0 && y < h) canvas((h - 1 - y) * w + x) = v
      x += 1
    }
    var done = false
    while (!done && i + 1 < data.length) {
      val c = data(i) & 0xff
      val d = data(i + 1) & 0xff
      i += 2
      if (c > 0) {
        var k = 0
        while (k < c) { put(d.toByte); k += 1 }
      } else d match {
        case 0 => x = 0; y += 1
        case 1 => done = true
        case 2 =>
          if (i + 1 < data.length) {
            x += data(i) & 0xff; y += data(i + 1) & 0xff; i += 2
          } else done = true
        case n =>
          if (i + n <= data.length) {
            var k = 0
            while (k < n) { put(data(i + k)); k += 1 }
            i += n + (n & 1)
          } else done = true
      }
    }
  }

  /** Temporal reconstruction of an RLE8 frame sequence: fold the
    * frames onto one carried canvas (initially all index 0) and
    * snapshot after each — output k is the FULL image at time k, with
    * every skipped/delta'd region inherited from earlier frames.
    */
  private[graft] def decodeRle8Video(
      frames: Seq[Array[Byte]], w: Int, h: Int): Seq[Array[Byte]] = {
    val canvas = new Array[Byte](w * h)
    frames.map { f =>
      decodeRle8Frame(f, canvas, w, h)
      canvas.clone()
    }
  }

  /** RLE8 DELTA-encode one frame against its predecessor — the
    * inverse of [[decodeRle8Frame]], emitting the same public BMP/AVI
    * wire format: unchanged pixel runs become cursor-delta skips
    * (`00 02 dx 00`, the pixels RETAIN their previous-frame values —
    * the defining temporal property), changed pixels become literal
    * runs (`c d`, split at 255), every row ends with `00 00` and the
    * frame with `00 01`. Rows walk BOTTOM-UP to match the decoder's
    * BMP row convention. `prev = null` encodes frame 0 against the
    * decoder's initial all-zero canvas.
    */
  private[graft] def encodeRle8Frame(
      prev: Array[Byte], cur: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var yBottom = 0
    while (yBottom < h) {
      val row = (h - 1 - yBottom) * w
      var x = 0
      while (x < w) {
        val same = prev != null && cur(row + x) == prev(row + x)
        if (same || (prev == null && cur(row + x) == 0)) {
          // skip run: pixels already correct on the carried canvas
          var x1 = x
          while (x1 < w && (if (prev != null) cur(row + x1) == prev(row + x1)
            else cur(row + x1) == 0)) x1 += 1
          if (x1 < w) { // trailing skips are absorbed by the EOL
            var dx = x1 - x
            while (dx > 0) {
              val step = math.min(dx, 255)
              out.write(0); out.write(2); out.write(step); out.write(0)
              dx -= step
            }
          }
          x = x1
        } else {
          // literal run of one repeated value (split at the 255 cap)
          val v = cur(row + x)
          var x1 = x
          while (x1 < w && cur(row + x1) == v &&
            !(prev != null && cur(row + x1) == prev(row + x1)) &&
            !(prev == null && cur(row + x1) == 0)) x1 += 1
          var n = x1 - x
          while (n > 0) {
            val step = math.min(n, 255)
            out.write(step); out.write(v & 0xff)
            n -= step
          }
          x = x1
        }
      }
      out.write(0); out.write(0) // end of line
      yBottom += 1
    }
    out.write(0); out.write(1) // end of bitmap
    out.toByteArray
  }

  /** Frame-sequence row for [[encodeRle8Avi]]: media id + per-frame
    * row-major grayscale pixel values in [0, 256).
    */
  final case class FrameSeqRecord(media_id: Long, frames: Seq[Seq[Int]])

  /** Encode per-video pixel-frame sequences as REAL temporal RLE8
    * video in a minimal RIFF/AVI container (one `00dc` chunk per
    * frame inside a `movi` LIST — the layout [[aviFrames]] parses).
    * Each frame is delta-coded against its predecessor by
    * [[encodeRle8Frame]], so a payload round-tripped through
    * [[sampleRle8VideoFrames]] reconstructs every canvas EXACTLY —
    * the property mm5's cross-engine oracle proves end to end.
    */
  def encodeRle8Avi(
      spark: SparkSession,
      frames: DataFrame,
      w: Int,
      h: Int,
      batchSize: Int = 256): Dataset[MediaRecord] = {
    import spark.implicits._
    frames.as[FrameSeqRecord].mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          var prev: Array[Byte] = null
          val chunks = r.frames.map { f =>
            require(f.length == w * h,
              s"media ${r.media_id}: ${f.length} pixels != $w x $h")
            val canvas = new Array[Byte](w * h)
            var i = 0
            while (i < f.length) { canvas(i) = (f(i) & 0xff).toByte; i += 1 }
            val enc = encodeRle8Frame(prev, canvas, w, h)
            prev = canvas
            enc
          }
          val movi = new java.io.ByteArrayOutputStream()
          movi.write("movi".getBytes("US-ASCII"))
          chunks.foreach { c =>
            movi.write("00dc".getBytes("US-ASCII"))
            val sz = c.length
            movi.write(sz & 0xff); movi.write((sz >> 8) & 0xff)
            movi.write((sz >> 16) & 0xff); movi.write((sz >> 24) & 0xff)
            movi.write(c)
            if ((sz & 1) == 1) movi.write(0) // chunks pad to even
          }
          val m = movi.toByteArray
          val riff = new java.io.ByteArrayOutputStream()
          riff.write("RIFF".getBytes("US-ASCII"))
          val rsz = 4 + 8 + m.length // 'AVI ' + LIST header + movi list
          riff.write(rsz & 0xff); riff.write((rsz >> 8) & 0xff)
          riff.write((rsz >> 16) & 0xff); riff.write((rsz >> 24) & 0xff)
          riff.write("AVI ".getBytes("US-ASCII"))
          riff.write("LIST".getBytes("US-ASCII"))
          riff.write(m.length & 0xff); riff.write((m.length >> 8) & 0xff)
          riff.write((m.length >> 16) & 0xff)
          riff.write((m.length >> 24) & 0xff)
          riff.write(m)
          MediaRecord(r.media_id, "video/avi", riff.toByteArray, w, h)
        }
      }
    }
  }

  /** dHash band row per sampled video frame. */
  final case class FrameBands(
      media_id: Long, frame_idx: Int, b0: Int, b1: Int, b2: Int, b3: Int)

  /** Per-frame perceptual hash over reconstructed video frames: each
    * raw canvas (palette-index grayscale bytes) re-encodes as a real
    * PNG and runs through the image dHash kernel
    * ([[dhashBandsOf]]) — the codec → fingerprint composition, so the
    * video family shares the image family's band layout and the
    * downstream band-bucket join / Hamming verify machinery. The wide
    * frame payload reduces to 24 B/row here; video bytes never reach
    * a shuffle.
    */
  def frameDhashBands(
      spark: SparkSession,
      frames: DataFrame,
      w: Int,
      h: Int,
      cols: Int = 9,
      rows: Int = 8,
      batchSize: Int = 256): Dataset[FrameBands] = {
    import spark.implicits._
    frames.as[MediaFrame].mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          require(r.payload.length == w * h,
            s"media ${r.media_id} frame ${r.frame_idx}: " +
              s"${r.payload.length} canvas bytes != $w x $h")
          val px = r.payload.map(_ & 0xff).toSeq
          val b = dhashBandsOf(grayPngBytes(px, w, h), cols, rows)
          FrameBands(r.media_id, r.frame_idx, b(0), b(1), b(2), b(3))
        }
      }
    }
  }

  /** Sample every `everyNth` RECONSTRUCTED frame from RLE8-AVI
    * payloads. The flatMap still emits only sampled frames, but —
    * temporal dependency — every PRIOR frame must be decoded onto the
    * carried canvas to make a sampled frame's pixels right; that
    * sequential prefix is inherent to inter-frame coding (a real
    * pipeline seeks the nearest KEYFRAME first; RLE8 streams are
    * typically all-delta after frame 0, the worst case, decoded here
    * exactly).
    */
  def sampleRle8VideoFrames(
      spark: SparkSession,
      media: DataFrame,
      w: Int,
      h: Int,
      everyNth: Int = 2): Dataset[MediaFrame] = {
    import spark.implicits._
    media.as[MediaRecord].flatMap { r =>
      decodeRle8Video(aviFrames(r.payload), w, h).iterator.zipWithIndex
        .collect { case (frame, idx) if idx % everyNth == 0 =>
          MediaFrame(r.media_id, idx, frame)
        }
    }
  }

  /** Sample every `everyNth` REAL video frame from MJPEG-AVI payloads
    * — the codec-backed counterpart of the byte-window
    * [[sampleFrames]]: same one-to-many flatMap generator shape, same
    * (media_id, frame_idx) provenance, but frames are the container's
    * actual JPEG frame payloads (each decodable by
    * [[ImageIoDecoder]]), and frames NOT sampled are never copied out
    * of the source buffer.
    */
  def sampleVideoFrames(
      spark: SparkSession,
      media: DataFrame,
      everyNth: Int = 2): Dataset[MediaFrame] = {
    import spark.implicits._
    media.as[MediaRecord].flatMap { r =>
      aviFrames(r.payload).iterator.zipWithIndex.collect {
        case (frame, idx) if idx % everyNth == 0 =>
          MediaFrame(r.media_id, idx, frame)
      }
    }
  }

  /** Sample every `everyNth` fixed-size frame from each payload — the
    * video-frame-extraction shape: a one-to-many flatMap that NEVER
    * materializes all frames of a row in driver memory, emits only the
    * sampled frames (the dominated cost at 100 TB is the frames you
    * DON'T keep), and preserves provenance via (media_id, frame_idx).
    * The stub "frame" is a fixed byte window; a real codec would seek
    * keyframes.
    */
  def sampleFrames(
      spark: SparkSession,
      media: DataFrame,
      frameBytes: Int = 1024,
      everyNth: Int = 2): Dataset[MediaFrame] = {
    import spark.implicits._
    media.as[MediaRecord].flatMap { r =>
      val n = (r.payload.length + frameBytes - 1) / frameBytes
      Iterator.range(0, n).filter(_ % everyNth == 0).map { idx =>
        val from = idx * frameBytes
        val until = math.min(from + frameBytes, r.payload.length)
        MediaFrame(r.media_id, idx,
          java.util.Arrays.copyOfRange(r.payload, from, until))
      }
    }
  }
}
