package graft

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {

  test("media plumbing: schema, byte lengths, deterministic stub features") {
    val media = Multimodal.documentsAsMedia(Tables.documents(spark, sf))
    assert(media.schema.fieldNames.toSeq ===
      Seq("media_id", "media_type", "payload", "width", "height"))
    assert(media.schema("payload").dataType ===
      org.apache.spark.sql.types.BinaryType)

    val feats = Multimodal.extractFeatures(spark, media,
      new Multimodal.StubDecoder(8), batchSize = 64)
    val rows = feats.collect()
    assert(rows.length === 500)
    assert(rows.forall(_.features.length === 8))
    assert(rows.forall(r => r.n_bytes > 0))

    // determinism: a second run produces identical features
    val again = Multimodal.extractFeatures(spark, media,
      new Multimodal.StubDecoder(8), batchSize = 7).collect()
    val byId = rows.map(r => r.media_id -> r.features.toSeq).toMap
    assert(again.forall(r => byId(r.media_id) == r.features.toSeq))
  }

  test("stub decoder is a pure function of payload bytes") {
    val d = new Multimodal.StubDecoder(4)
    val a = d.decode("hello world".getBytes("UTF-8")).toSeq
    val b = d.decode("hello world".getBytes("UTF-8")).toSeq
    val c = d.decode("hello worle".getBytes("UTF-8")).toSeq
    assert(a === b)
    assert(a !== c)
  }

  test("resizeMedia: binary->binary with updated metadata, bounded size") {
    val media = Multimodal.documentsAsMedia(Tables.documents(spark, sf))
    val resized = Multimodal.resizeMedia(spark, media, 16, 16,
      new Multimodal.StubResizer, batchSize = 32).collect()
    assert(resized.length === 500)
    assert(resized.forall(r => r.width == 16 && r.height == 16))
    assert(resized.forall(r => r.payload.length <= 16 * 16))
    // deterministic
    val again = Multimodal.resizeMedia(spark, media, 16, 16,
      new Multimodal.StubResizer, batchSize = 7).collect()
    val byId = resized.map(r => r.media_id -> r.payload.toSeq).toMap
    assert(again.forall(r => byId(r.media_id) == r.payload.toSeq))
  }

  test("sampleFrames: every-nth fixed windows with provenance, exact bytes") {
    import spark.implicits._
    val payload = Array.tabulate[Byte](2500)(i => (i % 127).toByte)
    val one = Seq(Multimodal.MediaRecord(7L, "video/stub", payload, 0, 0))
      .toDF()
    val frames = Multimodal.sampleFrames(spark, one,
      frameBytes = 1000, everyNth = 2).collect().sortBy(_.frame_idx)
    // 3 frames of (1000, 1000, 500); sampled idx 0 and 2
    assert(frames.map(_.frame_idx).toSeq === Seq(0, 2))
    assert(frames.map(_.payload.length).toSeq === Seq(1000, 500))
    assert(frames(0).payload.toSeq === payload.slice(0, 1000).toSeq)
    assert(frames(1).payload.toSeq === payload.slice(2000, 2500).toSeq)
  }

  // ---- real (pure-JDK ImageIO) image codec ---------------------------

  /** 4x4 RGB image with constant-gray 2x2 quadrants (10, 40, 90, 160),
    * PNG-encoded. Gray weights (299,587,114)/1000 make gray(v,v,v)=v
    * exactly, so expected pooled features are the quadrant constants.
    */
  private def quadrantPng(): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val q = Array(Array(10, 40), Array(90, 160))
    for (y <- 0 until 4; x <- 0 until 4) {
      val v = q(y / 2)(x / 2)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("ImageIoDecoder decodes a real PNG byte-exactly: pooled features " +
      "equal the known quadrant grays") {
    val d = new Multimodal.ImageIoDecoder(grid = 2)
    assert(d.featureDim === 4)
    val feats = d.decode(quadrantPng()).toSeq
    assert(feats === Seq(10f, 40f, 90f, 160f))
    // undecodable payloads fail loudly, never zero-fill
    intercept[IllegalArgumentException] {
      d.decode("not an image".getBytes("UTF-8"))
    }
  }

  test("ImageIoResizer: real decode -> exact NN remap -> lossless PNG; " +
      "resized pixels are the mapped source pixels") {
    val resized = new Multimodal.ImageIoResizer()
      .resize(quadrantPng(), 2, 2)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(resized))
    assert(img.getWidth === 2 && img.getHeight === 2)
    // NN maps dst(0,0)->src(0,0) etc. at stride 2: quadrant corners
    val got = for (y <- 0 until 2; x <- 0 until 2)
      yield img.getRGB(x, y) & 0xff
    assert(got === Seq(10, 40, 90, 160))
  }

  test("real-codec pipeline: extractFeatures over PNG payloads keeps " +
      "the same batched mapPartitions shape") {
    import spark.implicits._
    val png = quadrantPng()
    val media = (1L to 10L)
      .map(i => Multimodal.MediaRecord(i, "image/png", png, 4, 4)).toDF()
    val rows = Multimodal.extractFeatures(spark, media,
      new Multimodal.ImageIoDecoder(2), batchSize = 3).collect()
    assert(rows.length === 10)
    assert(rows.forall(_.features.toSeq == Seq(10f, 40f, 90f, 160f)))
  }

  /** 16-bit mono PCM WAV: first half silence, second half a constant
    * +1000 amplitude — RMS of a constant is the constant, exactly.
    */
  private def halfToneWav(nFrames: Int = 800): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val pcm = new Array[Byte](nFrames * 2)
    for (i <- nFrames / 2 until nFrames) {
      pcm(2 * i) = (1000 & 0xff).toByte
      pcm(2 * i + 1) = ((1000 >> 8) & 0xff).toByte
    }
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("WavDecoder decodes a real WAV byte-exactly: window RMS equals " +
      "the known amplitudes") {
    val d = new Multimodal.WavDecoder(windows = 4)
    assert(d.featureDim === 4)
    val feats = d.decode(halfToneWav()).toSeq
    assert(feats === Seq(0f, 0f, 1000f, 1000f))
    intercept[IllegalArgumentException] {
      d.decode("definitely not audio".getBytes("UTF-8"))
    }
  }

  test("real-audio pipeline: extractFeatures over WAV payloads") {
    import spark.implicits._
    val wav = halfToneWav()
    val media = (1L to 6L)
      .map(i => Multimodal.MediaRecord(i, "audio/wav", wav, 0, 0)).toDF()
    val rows = Multimodal.extractFeatures(spark, media,
      new Multimodal.WavDecoder(4), batchSize = 2).collect()
    assert(rows.length === 6)
    assert(rows.forall(_.features.toSeq == Seq(0f, 0f, 1000f, 1000f)))
  }

  /** Minimal MJPEG-AVI: RIFF('AVI ' LIST('movi' 00dc(jpeg)...)) —
    * frame k is a solid-gray JPEG of value 32*(k+1).
    */
  private def mjpegAvi(nFrames: Int): Array[Byte] = {
    def jpegGray(v: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 8)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpeg", bos)
      bos.toByteArray
    }
    def le32(v: Int) = Array[Byte](
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(id: String, body: Array[Byte]): Array[Byte] =
      id.getBytes("US-ASCII") ++ le32(body.length) ++ body ++
        (if (body.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray)
    val frames = (0 until nFrames)
      .flatMap(k => chunk("00dc", jpegGray(32 * (k + 1)))).toArray
    val movi = "movi".getBytes("US-ASCII") ++ frames
    val lst = chunk("LIST", movi)
    val body = "AVI ".getBytes("US-ASCII") ++ lst
    chunk("RIFF", body)
  }

  test("sampleVideoFrames: REAL MJPEG-AVI parse -> every-nth JPEG " +
      "frame, each decodable by the real image codec") {
    import spark.implicits._
    val avi = mjpegAvi(5)
    val media = Seq(Multimodal.MediaRecord(9L, "video/avi", avi, 8, 8)).toDF()
    val frames = Multimodal.sampleVideoFrames(spark, media, everyNth = 2)
      .collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq === Seq(0, 2, 4))
    // frames are REAL JPEGs: decode each and check the solid gray
    // level (JPEG is lossy -> small tolerance)
    val dec = new Multimodal.ImageIoDecoder(1)
    frames.foreach { f =>
      val gray = dec.decode(f.payload)(0)
      val want = 32f * (f.frame_idx + 1)
      assert(math.abs(gray - want) < 4f, s"frame ${f.frame_idx}: $gray vs $want")
    }
    // non-RIFF payloads fail loudly
    intercept[IllegalArgumentException] {
      Multimodal.aviFrames("not a container".getBytes("UTF-8"))
    }
  }

  /** RLE8-AVI fixture: the same RIFF shell as [[mjpegAvi]] around
    * hand-assembled BI_RLE8 frame payloads.
    */
  private def rle8Avi(frames: Seq[Array[Byte]]): Array[Byte] = {
    def le32(v: Int) = Array[Byte](
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(id: String, body: Array[Byte]): Array[Byte] =
      id.getBytes("US-ASCII") ++ le32(body.length) ++ body ++
        (if (body.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray)
    val movi = "movi".getBytes("US-ASCII") ++
      frames.flatMap(f => chunk("00dc", f)).toArray
    chunk("RIFF", "AVI ".getBytes("US-ASCII") ++ chunk("LIST", movi))
  }

  test("RLE8 temporal decode: delta frames inherit prior-frame pixels " +
      "byte-exactly (committed 4x4 fixture, hand-computed canvases)") {
    import spark.implicits._
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    // frame 0: four bottom-up rows of runs (7,8,9,10), then EOB
    val f0 = b(4, 7, 0, 0, 4, 8, 0, 0, 4, 9, 0, 0, 4, 10, 0, 1)
    // frame 1: PURE DELTA — cursor jump (dx=1, dy=1), 2-px run of 5,
    // EOB. Every other pixel must come from frame 0's canvas.
    val f1 = b(0, 2, 1, 1, 2, 5, 0, 1)
    // frame 2: absolute mode, 3 literal pixels (1,2,3) + pad at the
    // bottom-left, EOB — again everything else inherited
    val f2 = b(0, 3, 1, 2, 3, 0, 0, 1)
    // hand-computed expected canvases, stored top-down (row y from the
    // TOP; decode writes bottom-up per the BMP convention)
    val e0 = b(10, 10, 10, 10, 9, 9, 9, 9, 8, 8, 8, 8, 7, 7, 7, 7)
    val e1 = b(10, 10, 10, 10, 9, 9, 9, 9, 8, 5, 5, 8, 7, 7, 7, 7)
    val e2 = b(10, 10, 10, 10, 9, 9, 9, 9, 8, 5, 5, 8, 1, 2, 3, 7)
    val got = Multimodal.decodeRle8Video(Seq(f0, f1, f2), 4, 4)
    assert(got(0).toSeq === e0.toSeq)
    assert(got(1).toSeq === e1.toSeq)
    assert(got(2).toSeq === e2.toSeq)
    // end-to-end through the AVI container + Spark generator, every
    // frame sampled: reconstruction matches the local fold bit-exactly
    val media = Seq(Multimodal.MediaRecord(11L, "video/avi",
      rle8Avi(Seq(f0, f1, f2)), 4, 4)).toDF()
    val out = Multimodal.sampleRle8VideoFrames(spark, media, 4, 4,
      everyNth = 1).collect().sortBy(_.frame_idx)
    assert(out.map(_.frame_idx).toSeq === Seq(0, 1, 2))
    assert(out(0).payload.toSeq === e0.toSeq)
    assert(out(1).payload.toSeq === e1.toSeq)
    assert(out(2).payload.toSeq === e2.toSeq)
    // sampling still pays the temporal prefix: every-2nd emits frames
    // 0 and 2, and frame 2 must still carry frame 1's delta pixels
    val sampled = Multimodal.sampleRle8VideoFrames(spark, media, 4, 4,
      everyNth = 2).collect().sortBy(_.frame_idx)
    assert(sampled.map(_.frame_idx).toSeq === Seq(0, 2))
    assert(sampled(1).payload.toSeq === e2.toSeq)
    // malformed stream: truncated delta escape terminates cleanly
    val trunc = b(0, 2, 1) // delta escape missing dy
    val canvas = new Array[Byte](16)
    Multimodal.decodeRle8Frame(trunc, canvas, 4, 4)
    assert(canvas.toSeq === Seq.fill(16)(0.toByte))
  }

  test("codec properties over seeded random inputs: WAV RMS of a " +
      "constant-amplitude signal is the amplitude; image pooling of a " +
      "solid color is the color's gray") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      amp <- Gen.choose(1, 32000)
      n <- Gen.choose(4, 2000)
      gray <- Gen.choose(0, 255)
      w <- Gen.choose(1, 40)
      h <- Gen.choose(1, 40)
    } yield (amp, n, gray, w, h)
    (1 to 25).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))
      .foreach { case (amp, n, gray, w, h) =>
        // WAV: constant signed amplitude -> every window RMS == amp
        val pcm = new Array[Byte](n * 2)
        for (i <- 0 until n) {
          pcm(2 * i) = (amp & 0xff).toByte
          pcm(2 * i + 1) = ((amp >> 8) & 0xff).toByte
        }
        val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(
          new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        val wavFeats = new Multimodal.WavDecoder(4).decode(bos.toByteArray)
        // windows narrower than the signal may be empty (n < windows)
        wavFeats.filter(_ != 0f).foreach(f =>
          assert(math.abs(f - amp) < 0.5f, s"amp=$amp n=$n got $f"))
        // PNG: solid gray(v,v,v) -> every populated cell == v exactly
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        for (y <- 0 until h; x <- 0 until w)
          img.setRGB(x, y, (gray << 16) | (gray << 8) | gray)
        val pb = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", pb)
        val cells = new Multimodal.ImageIoDecoder(4).decode(pb.toByteArray)
        // cells with no pixels (image smaller than the grid) are 0
        cells.filter(_ != 0f).foreach(c =>
          assert(c == gray.toFloat, s"gray=$gray ${w}x$h got $c"))
        // the all-black image is all-zero cells by BOTH rules — fine
        if (gray != 0) assert(cells.exists(_ != 0f))
      }
  }

  test("SplitFrames generator == sampleFrames flatMap dual, byte for byte") {
    import org.apache.spark.sql.functions._
    val media = Multimodal.documentsAsMedia(Tables.documents(spark, sf))
    val viaGenerator = media
      .select(col("media_id"),
        graft.functions.GeneratorFunctions.split_frames(
          col("payload"), 1024, 2))
      .select(col("media_id"), col("frame_idx"),
        xxhash64(col("frame")).as("h"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val viaFlatMap = Multimodal.sampleFrames(spark, media,
        frameBytes = 1024, everyNth = 2)
      .toDF()
      .select(col("media_id"), col("frame_idx"),
        xxhash64(col("payload")).as("h"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(viaGenerator === viaFlatMap)
    assert(viaGenerator.nonEmpty)
  }

  // ---- dHash image near-dup ------------------------------------------

  import spark.implicits._

  private def pngOf(id: Long, px: Seq[Int], w: Int = 18, h: Int = 16) =
    Multimodal.encodeGrayPng(spark,
      Seq(Multimodal.PixelRecord(id, px)).toDS().toDF(), w, h)
      .collect().head.payload

  test("encodeGrayPng -> ImageIO decode is PIXEL-EXACT (the RGB-path " +
      "roundtrip the TYPE_BYTE_GRAY colorspace transform would break)") {
    val px = (0 until 288).map(i => (i * 37 + 11) % 256)
    val bytes = pngOf(7L, px)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    assert(img.getWidth === 18 && img.getHeight === 16)
    val decoded = for (y <- 0 until 16; x <- 0 until 18) yield {
      val rgb = img.getRGB(x, y)
      (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
        114 * (rgb & 0xff)) / 1000
    }
    assert(decoded === px)
  }

  test("dhashBandsOf matches a hand-rolled block-sum reference and a " +
      "band-0-confined perturbation only changes b0") {
    val px = (0 until 288).map(i => (i * 131 + 17) % 256)
    val bands = Multimodal.dhashBandsOf(pngOf(1L, px), 9, 8)
    // independent reference: 2x2 block sums, adjacent-column compare
    val sums = Array.ofDim[Long](8, 9)
    for (y <- 0 until 16; x <- 0 until 18)
      sums(y / 2)(x / 2) += px(y * 18 + x)
    val ref = new Array[Int](4)
    for (r <- 0 until 8; c <- 0 until 8)
      if (sums(r)(c) > sums(r)(c + 1)) {
        val bit = r * 8 + c
        ref(bit / 16) |= 1 << (bit % 16)
      }
    assert(bands.toSeq === ref.toSeq)
    // perturb rows 0-3 only (bit rows 0-1 = band 0)
    val px2 = px.zipWithIndex.map { case (p, i) =>
      if (i < 72 && i % 7 == 0) (p + 73) % 256 else p }
    val bands2 = Multimodal.dhashBandsOf(pngOf(2L, px2), 9, 8)
    assert(bands2.drop(1).toSeq === bands.drop(1).toSeq)
    // identical images hash identically (hamming 0)
    assert(Multimodal.dhashBandsOf(pngOf(3L, px), 9, 8).toSeq ===
      bands.toSeq)
  }

  test("dhashBandsOf rejects non-tiling dimensions, non-64-bit grids, " +
      "and undecodable payloads") {
    val px = Seq.fill(100)(5)
    intercept[IllegalArgumentException](
      Multimodal.dhashBandsOf(pngOf(1L, px, 10, 10), 9, 8))
    intercept[IllegalArgumentException](
      Multimodal.dhashBandsOf(pngOf(1L, (0 until 288).toSeq), 8, 8))
    intercept[IllegalArgumentException](
      Multimodal.dhashBandsOf("not a png".getBytes("UTF-8"), 9, 8))
  }

  // ---- chromaprint-shaped audio near-dup -----------------------------

  private def wavOf(id: Long, samples: Seq[Int]) =
    Multimodal.encodePcm16Wav(spark,
      Seq(Multimodal.SampleRecord(id, samples)).toDS().toDF())
      .collect().head.payload

  test("encodePcm16Wav -> javax.sound decode is SAMPLE-EXACT (PCM16 " +
      "roundtrip), and the header parses as canonical mono WAV") {
    val samples = (0 until 528).map(i => ((i * 131 + 17) % 4096) - 2048)
    val bytes = wavOf(7L, samples)
    assert(bytes.length === 44 + 2 * 528)
    assert(new String(bytes, 0, 4, "US-ASCII") === "RIFF")
    assert(new String(bytes, 8, 4, "US-ASCII") === "WAVE")
    val decoded = Multimodal.decodePcmSamples(bytes)
    assert(decoded.toSeq === samples)
    // full 16-bit extremes survive too
    val extremes = Seq(-32768, 32767, 0, -1, 1) ++ Seq.fill(27)(123)
    assert(Multimodal.decodePcmSamples(wavOf(8L, extremes)).toSeq ===
      extremes)
    // out-of-range samples raise inside the task (surfaced wrapped)
    val oob = intercept[Exception](wavOf(9L, Seq(40000)))
    assert(oob.toString.contains("16-bit PCM") ||
      Option(oob.getCause).exists(_.toString.contains("16-bit PCM")), oob)
  }

  test("audioHaarDeltaBandsOf matches a hand-rolled Haar-energy " +
      "reference and a window-0-4 perturbation only changes b0") {
    val samples = (0 until 528).map(i => ((i * 997 + 31) % 4096) - 2048)
    val bands = Multimodal.audioHaarDeltaBandsOf(wavOf(1L, samples), 33)
    // independent reference: per-window low/high Haar energies, then
    // temporal delta bits
    val lo = new Array[Long](33); val hi = new Array[Long](33)
    for (w <- 0 until 33; i <- 0 until 16 by 2) {
      val a = samples(w * 16 + i).toLong
      val b = samples(w * 16 + i + 1).toLong
      lo(w) += (a + b) * (a + b); hi(w) += (a - b) * (a - b)
    }
    val ref = new Array[Int](4)
    for (w <- 0 until 32) {
      if (lo(w) > lo(w + 1)) ref((2 * w) / 16) |= 1 << ((2 * w) % 16)
      if (hi(w) > hi(w + 1))
        ref((2 * w + 1) / 16) |= 1 << ((2 * w + 1) % 16)
    }
    assert(bands.toSeq === ref.toSeq)
    // perturb samples in windows 0-4 only (fingerprint bits 0-9 =
    // band 0): bands 1-3 must be untouched
    val s2 = samples.zipWithIndex.map { case (s, j) =>
      if (j < 80 && j % 5 == 0) ((s + 1991) % 4096) - 2048 else s }
    val bands2 = Multimodal.audioHaarDeltaBandsOf(wavOf(2L, s2), 33)
    assert(bands2.drop(1).toSeq === bands.drop(1).toSeq)
    // identical audio hashes identically
    assert(Multimodal.audioHaarDeltaBandsOf(wavOf(3L, samples), 33).toSeq
      === bands.toSeq)
  }

  test("audioHaarDeltaBandsOf rejects ragged windows, non-64-bit " +
      "window counts, and undecodable payloads") {
    intercept[IllegalArgumentException](
      Multimodal.audioHaarDeltaBandsOf(wavOf(1L, Seq.fill(500)(5)), 33))
    intercept[IllegalArgumentException](
      Multimodal.audioHaarDeltaBandsOf(wavOf(1L, Seq.fill(528)(5)), 32))
    intercept[IllegalArgumentException](
      Multimodal.audioHaarDeltaBandsOf("not a wav".getBytes("UTF-8"), 33))
  }

  test("mm4 query: every re-encoded twin pairs with its original " +
      "within the radius; ids are ordered; nothing self-pairs") {
    val d = "/root/testdata/sf0.001"
    val got = graft.queries.Extensions.mm4AudioNeardup(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.nonEmpty)
    assert(got.forall { case (a, b, hm) => a < b && hm >= 0 && hm <= 10 })
    val nDocs = Tables.documents(spark, d).count()
    val twins = (0L until nDocs).filter(id => id % 11 == 5 && id > 0)
      .map(id => (id - 1, id)).toSet
    val gotPairs = got.map(p => (p._1, p._2)).toSet
    assert(twins.subsetOf(gotPairs),
      s"missing twins: ${(twins -- gotPairs).take(5)}")
  }

  // ---- RLE8 temporal encode -> decode roundtrip ----------------------

  test("encodeRle8Avi -> sampleRle8VideoFrames reconstructs every " +
      "canvas EXACTLY — skips retain, literals overwrite, row order " +
      "matches the BMP bottom-up convention") {
    val (w, h) = (9, 8)
    val rnd = new scala.util.Random(5)
    // frame sequences with heavy inter-frame redundancy (the delta
    // codec's skip path) plus full redraws and all-equal rows (run
    // splitting), and a frame IDENTICAL to its predecessor (pure-skip)
    val vids = (0L until 6L).map { id =>
      var cur = Array.fill(w * h)(rnd.nextInt(256))
      val frames = (0 until 5).map { k =>
        if (k == 2) () // identical frame: all rows skip
        else if (k == 3) cur = Array.fill(w * h)(7) // constant canvas
        else if (k > 0) {
          cur = cur.clone()
          for (_ <- 0 until 9)
            cur(rnd.nextInt(w * h)) = rnd.nextInt(256)
        }
        cur.toSeq
      }
      Multimodal.FrameSeqRecord(id, frames)
    }
    val media = Multimodal.encodeRle8Avi(spark,
      vids.toDS().toDF(), w, h)
    // EVERY frame (everyNth = 1), compared to the source canvases
    val got = Multimodal.sampleRle8VideoFrames(spark, media.toDF(),
        w, h, everyNth = 1)
      .collect().map(f => (f.media_id, f.frame_idx) -> f.payload.toSeq)
      .toMap
    for (v <- vids; (frame, k) <- v.frames.zipWithIndex)
      assert(got((v.media_id, k)) === frame.map(_.toByte),
        s"video ${v.media_id} frame $k")
    // sampling really subsets: everyNth = 2 keeps frames 0, 2, 4
    val sampled = Multimodal.sampleRle8VideoFrames(spark, media.toDF(),
        w, h, everyNth = 2)
      .collect().map(f => f.frame_idx).toSet
    assert(sampled === Set(0, 2, 4))
  }

  test("encodeRle8Frame emits genuine DELTA frames: an unchanged " +
      "pixel is encoded as a skip (never re-painted), so decoding " +
      "against the WRONG predecessor shows through") {
    val (w, h) = (4, 2)
    val f0 = Array.tabulate(w * h)(i => (i * 31 + 5) % 256)
    val f1 = f0.updated(3, 99) // one changed pixel
    val c0 = f0.map(_.toByte)
    val enc = Multimodal.encodeRle8Frame(c0, f1.map(_.toByte), w, h)
    // decode against the true predecessor: exact
    val canvas = c0.clone()
    Multimodal.decodeRle8Frame(enc, canvas, w, h)
    assert(canvas.toSeq === f1.map(_.toByte).toSeq)
    // decode against a zero canvas: only the changed pixel appears —
    // proof the encoder skipped (temporal dependency), not re-painted
    val zero = new Array[Byte](w * h)
    Multimodal.decodeRle8Frame(enc, zero, w, h)
    assert((zero(3) & 0xff) === 99)
    assert(zero.count(_ == 0) === w * h - 1,
      "encoder re-painted pixels it should have skipped")
  }

  test("mm5 query: every re-encoded twin pairs with its original " +
      "(all sampled frames within radius); ids ordered") {
    val d = "/root/testdata/sf0.001"
    val got = graft.queries.Extensions.mm5VideoNeardup(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.nonEmpty)
    assert(got.forall { case (a, b, tot) =>
      a < b && tot >= 0 && tot <= 24 })
    val nDocs = Tables.documents(spark, d).count()
    val twins = (0L until nDocs).filter(id => id % 13 == 7 && id > 0)
      .map(id => (id - 1, id)).toSet
    val gotPairs = got.map(p => (p._1, p._2)).toSet
    assert(twins.subsetOf(gotPairs),
      s"missing twins: ${(twins -- gotPairs).take(5)}")
  }

  test("mm6 cross-modal gate is genuinely CONJUNCTIVE: joint twins " +
      "survive, image-only and caption-only twins are both rejected") {
    val d = "/root/testdata/sf0.001"
    val got = graft.queries.Extensions.mm6CrossModalNeardup(spark, d)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getInt(2), r.getDouble(3))))
      .toMap
    assert(got.nonEmpty)
    assert(got.forall { case ((a, b), (hm, j)) =>
      a < b && hm <= 10 && j >= 0.8 })
    val nDocs = Tables.documents(spark, d).count()
    val twinsByClass = (0L until nDocs)
      .filter(id => id % 9 == 4 && id > 0)
      .groupBy(id => (id / 9) % 3)
      .map { case (c, ids) => c -> ids.map(id => (id - 1, id)).toSet }
    // class 0 (both modalities agree) all present...
    assert(twinsByClass(0L).subsetOf(got.keySet),
      s"missing joint twins: ${(twinsByClass(0L) -- got.keySet).take(5)}")
    // ...class 1 (caption redrawn) and class 2 (image redrawn) all out
    assert((twinsByClass(1L) & got.keySet).isEmpty, "image-only leaked")
    assert((twinsByClass(2L) & got.keySet).isEmpty, "caption-only leaked")
  }

  test("mm3 query: every retouched twin pairs with its original " +
      "within the radius; ids are ordered; nothing self-pairs") {
    val d = "/root/testdata/sf0.001"
    val got = graft.queries.Extensions.mm3ImageDhashNeardup(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.nonEmpty)
    assert(got.forall { case (a, b, hm) => a < b && hm >= 0 && hm <= 10 })
    val nDocs = Tables.documents(spark, d).count()
    val twins = (0L until nDocs).filter(id => id % 7 == 3 && id > 0)
      .map(id => (id - 1, id)).toSet
    val gotPairs = got.map(p => (p._1, p._2)).toSet
    assert(twins.subsetOf(gotPairs),
      s"missing twins: ${(twins -- gotPairs).take(5)}")
  }
}
