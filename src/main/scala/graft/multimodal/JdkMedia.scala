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
  // syscalls per query (r16 review finding)
  javax.imageio.ImageIO.setUseCache(false)

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

  // ---- real decoders (feature extraction) ----

  case class ImageFeatures(doc_id: Long, width: Int, height: Int,
      sum_r: Long, sum_g: Long, sum_b: Long)

  /** Decode a PNG payload with ImageIO and extract integer channel sums
    * (the exact-arithmetic stand-in for a mean-pixel embedding stage).
    */
  def decodeImage(docId: Long, png: Array[Byte]): ImageFeatures = {
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
