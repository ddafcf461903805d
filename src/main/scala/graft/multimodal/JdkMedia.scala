package graft.multimodal

/** REAL media codecs from the JDK itself — no external jar needed:
  * `javax.imageio` (PNG encode/decode) and `javax.sound.sampled` (WAV
  * encode/decode) ship with Java 17. This upgrades the multimodal decode
  * path from the md5-arithmetic stand-in ([[MultimodalPipeline.decodeStub]],
  * which now covers only formats with NO JVM codec in this environment,
  * i.e. video/compressed audio): for PNG images and PCM WAV audio the
  * payload bytes genuinely pass through a codec on BOTH sides —
  * `BufferedImage`→PNG→`ImageIO.read` and PCM→WAV→`AudioSystem`.
  *
  * Payload generation is a pure integer function of doc_id (no hashing),
  * so the decoded truth is SQL-expressible: the DuckDB oracle recomputes
  * the expected dimensions / pixel sums / sample sums from the same
  * integer rule, which verifies the decode output AND that the PNG/WAV
  * roundtrip is lossless, end to end through two real codec calls.
  * Compressed payload LENGTH is deliberately NOT part of any oracle
  * output — it depends on the encoder build, not on the data contract.
  *
  * Scale shape: encode/decode run inside `Dataset.mapPartitions` (one
  * codec setup per partition batch, the same batch position a
  * libjpeg/ffmpeg-backed decoder would occupy); everything that crosses
  * a shuffle is extracted metadata columns, never pixel buffers.
  */
object JdkMedia {

  // all payloads live in heap byte-array streams — without this, every
  // ImageIO write/read spins up a disk-backed FileCache temp file per
  // payload (the JDK default), hundreds of pointless create/delete
  // syscalls per query (r16 review finding). NOTE (r16 ADVICE): this is
  // a PROCESS-GLOBAL ImageIO mutation — any other ImageIO user in the
  // JVM is switched to heap-backed streams too. It is therefore invoked
  // explicitly from every codec entry point below (idempotent), not as a
  // class-load side effect, so the effect is attributable and future
  // ImageIO users can see where it comes from.
  private def ensureHeapStreams(): Unit =
    if (javax.imageio.ImageIO.getUseCache) javax.imageio.ImageIO.setUseCache(false)

  // ---- integer generation rules (mirrored in the DuckDB oracles) ----

  /** Image dims: 8..16 × 8..16 — tiny, the codec path is the point. */
  def imageDims(docId: Long): (Int, Int) =
    (8 + (docId % 9).toInt, 8 + ((docId / 9) % 9).toInt)

  /** Per-pixel channel rule, each channel 0..255. */
  def pixelRgb(docId: Long, x: Int, y: Int): Int = {
    val r = ((docId * 37 + x * 11 + y * 7) % 256).toInt
    val g = ((docId * 59 + x * 13 + y * 5) % 256).toInt
    val b = ((docId * 83 + x * 17 + y * 3) % 256).toInt
    (r << 16) | (g << 8) | b
  }

  /** Audio: 8 kHz mono unsigned 8-bit PCM, 64..127 frames. */
  def audioFrames(docId: Long): Int = 64 + (docId % 64).toInt

  /** Per-sample amplitude rule, 0..255 (unsigned 8-bit PCM). */
  def sampleAmp(docId: Long, i: Int): Int = ((docId * 31 + i * 17) % 256).toInt

  // ---- real encoders (payload construction) ----

  /** The pixel-rule BufferedImage both container encoders share — the
    * "same pixels" guarantee between PNG and BMP payloads is by
    * construction, not by a PNG decode roundtrip.
    */
  private def imageOf(docId: Long): java.awt.image.BufferedImage = {
    val (w, h) = imageDims(docId)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, pixelRgb(docId, x, y)); x += 1 }
      y += 1
    }
    img
  }

  private def encodeAs(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
    ensureHeapStreams()
    val bos = new java.io.ByteArrayOutputStream()
    if (!javax.imageio.ImageIO.write(img, fmt, bos))
      throw new java.io.IOException(s"no $fmt writer available")
    bos.toByteArray
  }

  /** A real PNG: fill a BufferedImage by the pixel rule, compress with
    * the JDK's ImageIO PNG writer.
    */
  def pngPayload(docId: Long): Array[Byte] = encodeAs(imageOf(docId), "png")

  /** The SAME pixels as [[pngPayload]] in a different container (the
    * JDK's BMP writer): byte-level dedup cannot see these are the same
    * image, a perceptual fingerprint over the DECODED pixels can — the
    * planted truth for q_image_dhash.
    */
  def bmpPayload(docId: Long): Array[Byte] = encodeAs(imageOf(docId), "bmp")

  /** Near-silent amplitude rule (126..130), mirrored in the energy-gate
    * oracle — docs ≡3 mod 7 get this payload so the gate has truth.
    */
  def sampleAmpQuiet(docId: Long, i: Int): Int =
    126 + ((docId * 31 + i * 17) % 5).toInt

  private def wavOf(pcm: Array[Byte]): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      8000f, 8, 1, /* signed = */ false, /* bigEndian = */ false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, pcm.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** A real near-silent WAV by the quiet rule. */
  def wavQuietPayload(docId: Long): Array[Byte] =
    wavOf(Array.tabulate(audioFrames(docId))(i => sampleAmpQuiet(docId, i).toByte))

  /** A real WAV: unsigned 8-bit PCM frames by the sample rule, wrapped
    * with the JDK's AudioSystem WAVE writer.
    */
  def wavPayload(docId: Long): Array[Byte] =
    wavOf(Array.tabulate(audioFrames(docId))(i => sampleAmp(docId, i).toByte))

  /** A real lossy JPEG re-encode of the SAME pixels (the JDK's own JPEG
    * writer at an explicit quality): unlike [[bmpPayload]] the decoded
    * pixels CHANGE, so dHash equality with the PNG original is no longer
    * guaranteed by construction — exactly the robustness claim worth
    * measuring. MultimodalSpec reports the measured hamming distribution
    * (r16 verdict #3): lossy re-encodes group with their originals at
    * small hamming distance while byte-level and pixel-sum dedup both
    * find zero pairs.
    */
  def jpegPayload(docId: Long, quality: Float = 0.7f): Array[Byte] = {
    ensureHeapStreams()
    val img = imageOf(docId)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
    } finally { ios.close(); writer.dispose() }
    bos.toByteArray
  }

  /** Hamming distance between two equal-length '0'/'1' fingerprints. */
  def hamming(a: String, b: String): Int = {
    require(a.length == b.length, s"fingerprint length mismatch ${a.length}/${b.length}")
    var (d, i) = (0, 0)
    while (i < a.length) { if (a.charAt(i) != b.charAt(i)) d += 1; i += 1 }
    d
  }

  // ---- MJPEG-style video container (r17) ----
  //
  // No true video codec exists in this environment (no ffmpeg-class jar —
  // re-probed each round, still zero), but the JDK's image codec is real:
  // define the video payload as N length-prefixed PNG frames in a tiny
  // container, so per-FRAME decode genuinely passes through ImageIO on
  // both sides. This is the MJPEG idea (a video stream whose frames are
  // independently compressed images); only inter-frame-compressed formats
  // (H.264 etc.) remain stubbed.

  /** Frames per video: 2..8 — enough to exercise per-frame fan-out. */
  def videoFrames(docId: Long): Int = 2 + (docId % 7).toInt

  /** Per-frame pixel identity: frames reuse the image generation rules
    * under a derived pix id (f < 8, so ids never collide across docs) —
    * the oracle re-derives every frame's dims and channel sums from the
    * same pure integers.
    */
  def framePixId(docId: Long, f: Int): Long = docId * 8 + f

  private val VideoMagic: Array[Byte] = Array('G', 'V', 'I', 'D').map(_.toByte)

  /** A real MJPEG-style video payload: 4-byte magic, big-endian frame
    * count, then per frame a big-endian length prefix and a genuine
    * ImageIO-encoded PNG of that frame's pixel rule.
    */
  def videoPayload(docId: Long): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.write(VideoMagic)
    val n = videoFrames(docId)
    out.writeInt(n)
    var f = 0
    while (f < n) {
      val png = pngPayload(framePixId(docId, f))
      out.writeInt(png.length)
      out.write(png)
      f += 1
    }
    out.flush()
    bos.toByteArray
  }

  case class VideoFrameFeatures(doc_id: Long, frame_idx: Int, width: Int,
      height: Int, sum_r: Long, sum_g: Long, sum_b: Long)

  /** Decode an MJPEG-style payload: validate the magic, walk the
    * length-prefixed frames, ImageIO-decode each, emit per-frame integer
    * features. Fails loudly on a corrupt container or undecodable frame.
    */
  def decodeVideo(docId: Long, payload: Array[Byte]): Seq[VideoFrameFeatures] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(payload))
    val magic = new Array[Byte](4)
    in.readFully(magic)
    if (!java.util.Arrays.equals(magic, VideoMagic))
      throw new java.io.IOException(s"bad video container magic for doc $docId")
    val n = in.readInt()
    if (n < 0 || n > 1024)
      throw new java.io.IOException(s"implausible frame count $n for doc $docId")
    (0 until n).map { f =>
      val len = in.readInt()
      if (len < 0 || len > payload.length)
        throw new java.io.IOException(s"corrupt frame length $len for doc $docId")
      val png = new Array[Byte](len)
      in.readFully(png)
      val feat = decodeImage(framePixId(docId, f), png)
      VideoFrameFeatures(docId, f, feat.width, feat.height,
        feat.sum_r, feat.sum_g, feat.sum_b)
    }
  }

  // ---- real decoders (feature extraction) ----

  case class ImageFeatures(doc_id: Long, width: Int, height: Int,
      sum_r: Long, sum_g: Long, sum_b: Long)

  /** Decode a PNG payload with ImageIO and extract integer channel sums
    * (the exact-arithmetic stand-in for a mean-pixel embedding stage).
    */
  def decodeImage(docId: Long, png: Array[Byte]): ImageFeatures = {
    ensureHeapStreams()
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    if (img == null)
      throw new java.io.IOException(s"undecodable image payload for doc $docId")
    var (sr, sg, sb) = (0L, 0L, 0L)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val p = img.getRGB(x, y)
        sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
        x += 1
      }
      y += 1
    }
    ImageFeatures(docId, img.getWidth, img.getHeight, sr, sg, sb)
  }

  /** Difference-hash (dHash) perceptual fingerprint over a REAL decoded
    * image: nearest-neighbor-sample the decoded pixels onto a 9×8
    * grayscale grid (srcX = c·w/9, srcY = r·h/8, integer division;
    * gray = (299r+587g+114b)/1000 — all integer, so the oracle can
    * re-derive the same 64 bits from the generation rule), then emit one
    * bit per horizontally adjacent pair (left<right). Returned as a
    * 64-char '0'/'1' string — cross-engine-safe (a 64-bit integer would
    * overflow DuckDB's checked BIGINT arithmetic on bit 63). The classic
    * near-dup fingerprint for image corpora: byte-level dedup misses
    * re-encoded copies, dHash groups them.
    */
  def dHash(png: Array[Byte]): String = {
    ensureHeapStreams()
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    if (img == null) throw new java.io.IOException("undecodable image payload")
    val (w, h) = (img.getWidth, img.getHeight)
    def gray(c: Int, r: Int): Int = {
      val p = img.getRGB(c * w / 9, r * h / 8)
      (299 * ((p >> 16) & 0xff) + 587 * ((p >> 8) & 0xff) + 114 * (p & 0xff)) / 1000
    }
    val sb = new java.lang.StringBuilder(64)
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        sb.append(if (gray(c, r) < gray(c + 1, r)) '1' else '0')
        c += 1
      }
      r += 1
    }
    sb.toString
  }

  case class AudioFeatures(doc_id: Long, sample_rate: Int, channels: Int,
      bits: Int, n_frames: Long, sum_amp: Long)

  /** Decode a WAV payload with AudioSystem and extract the format plus
    * the integer amplitude sum over all frames.
    */
  def decodeAudio(docId: Long, wav: Array[Byte]): AudioFeatures = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    try {
      val fmt = ais.getFormat
      require(fmt.getSampleSizeInBits == 8 && fmt.getChannels == 1,
        s"unexpected WAV shape for doc $docId: $fmt")
      val pcm = ais.readAllBytes()
      var s = 0L
      var i = 0
      while (i < pcm.length) { s += pcm(i) & 0xff; i += 1 }
      AudioFeatures(docId, fmt.getSampleRate.toInt, fmt.getChannels,
        fmt.getSampleSizeInBits, ais.getFrameLength, s)
    } finally ais.close()
  }

  case class AudioEnergy(doc_id: Long, n_frames: Long, ss_dev: Long)

  /** Energy of a REAL decoded WAV: the sum of squared deviations from
    * the unsigned-8-bit midpoint (128) over all frames — the integer
    * stand-in for RMS loudness, exact so a silence/energy gate on it is
    * oracle-checkable.
    */
  def audioEnergy(docId: Long, wav: Array[Byte]): AudioEnergy = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    try {
      val pcm = ais.readAllBytes()
      var ss = 0L
      var i = 0
      while (i < pcm.length) {
        val d = (pcm(i) & 0xff) - 128
        ss += d.toLong * d
        i += 1
      }
      AudioEnergy(docId, pcm.length.toLong, ss)
    } finally ais.close()
  }
}
