package graft

import graft.multimodal.MultimodalPipeline
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The multimodal plumbing: binary payloads survive the round trip, the
  * partition-batched decode is deterministic and partition-count-invariant,
  * and frame fan-out matches the declared frame counts.
  */
class MultimodalSpec extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.001"

  test("decode is deterministic and invariant to partitioning") {
    val media = MultimodalPipeline.mediaTable(spark, sf)
    val a = MultimodalPipeline.extractFeatures(media)
      .select("doc_id", "width", "height", "n_frames")
      .collect().map(_.toSeq).sortBy(_.head.toString)
    val b = MultimodalPipeline.extractFeatures(media.repartition(7))
      .select("doc_id", "width", "height", "n_frames")
      .collect().map(_.toSeq).sortBy(_.head.toString)
    assert(a.toSeq == b.toSeq)
  }

  test("payload bytes round-trip (binary column is opaque, not re-encoded)") {
    val media = MultimodalPipeline.mediaTable(spark, sf)
    val mismatches = media.toDF()
      .join(Tables.documents(spark, sf), "doc_id")
      .filter(col("payload") =!= encode(col("text"), "UTF-8"))
      .count()
    assert(mismatches == 0)
  }

  test("frame fan-out produces exactly n_frames rows per object") {
    val feats = MultimodalPipeline.extractFeatures(
      MultimodalPipeline.mediaTable(spark, sf).filter(col("doc_id") < 50))
    val frames = MultimodalPipeline.sampleFrames(feats)
    val counts = frames.groupBy("doc_id").count()
      .join(feats.select(col("doc_id"), col("n_frames")), "doc_id")
      .filter(col("count") =!= col("n_frames")).count()
    assert(counts == 0)
    assert(frames.select("frame_hash").distinct().count() == frames.count())
  }

  test("media_type routing covers all three modalities") {
    val types = MultimodalPipeline.mediaTable(spark, sf)
      .toDF().select("media_type").distinct()
      .collect().map(_.getString(0)).toSet
    assert(types == Set("image", "audio", "video"))
  }

  // ---- the REAL JDK codecs (r16): PNG via ImageIO, WAV via javax.sound ----

  test("PNG payloads are real images: magic bytes, ImageIO roundtrip, partition-invariant") {
    import graft.multimodal.JdkMedia
    import spark.implicits._
    val ids = Tables.documents(spark, sf).filter(col("doc_id") < 60)
      .select(col("doc_id")).as[Long]
    val payloads = ids.mapPartitions(_.map(id => (id, JdkMedia.pngPayload(id))))
      .toDF("doc_id", "payload").as[(Long, Array[Byte])]
    // every payload starts with the 8-byte PNG signature — these are
    // genuine container files, not tagged blobs
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val badSig = payloads.collect().count { case (_, png) => !png.take(8).sameElements(sig) }
    assert(badSig == 0, s"$badSig payloads lack the PNG signature")
    val a = payloads.mapPartitions(_.map { case (id, p) => JdkMedia.decodeImage(id, p) })
      .collect().sortBy(_.doc_id).toSeq
    val b = payloads.repartition(7)
      .mapPartitions(_.map { case (id, p) => JdkMedia.decodeImage(id, p) })
      .collect().sortBy(_.doc_id).toSeq
    assert(a == b, "decode must be partition-invariant")
    // decoded features equal the generation rule (lossless roundtrip)
    a.foreach { f =>
      val (w, h) = JdkMedia.imageDims(f.doc_id)
      assert((f.width, f.height) == (w, h), s"dims diverge for doc ${f.doc_id}")
      val want = (for (y <- 0 until h; x <- 0 until w) yield {
        val p = JdkMedia.pixelRgb(f.doc_id, x, y)
        ((p >> 16) & 0xff).toLong
      }).sum
      assert(f.sum_r == want, s"sum_r diverges for doc ${f.doc_id}")
    }
  }

  test("WAV payloads are real audio files: RIFF magic, AudioSystem roundtrip") {
    import graft.multimodal.JdkMedia
    import spark.implicits._
    val ids = Tables.documents(spark, sf).filter(col("doc_id") < 60)
      .select(col("doc_id")).as[Long]
    val feats = ids
      .mapPartitions(_.map(id => (id, JdkMedia.wavPayload(id))))
      .toDF("doc_id", "payload").as[(Long, Array[Byte])]
    val rows = feats.collect()
    val badSig = rows.count { case (_, wav) =>
      !(wav.take(4).sameElements("RIFF".getBytes) && wav.slice(8, 12).sameElements("WAVE".getBytes))
    }
    assert(badSig == 0, s"$badSig payloads lack the RIFF/WAVE header")
    rows.foreach { case (id, wav) =>
      val f = JdkMedia.decodeAudio(id, wav)
      assert(f.n_frames == JdkMedia.audioFrames(id).toLong)
      assert(f.sample_rate == 8000 && f.channels == 1 && f.bits == 8)
      val want = (0 until JdkMedia.audioFrames(id)).map(i => JdkMedia.sampleAmp(id, i).toLong).sum
      assert(f.sum_amp == want, s"amplitude sum diverges for doc $id")
    }
  }

  test("BMP re-encode defeats byte dedup but not the perceptual dHash") {
    import graft.multimodal.JdkMedia
    (0L until 10L).foreach { id =>
      val png = JdkMedia.pngPayload(id)
      val bmp = JdkMedia.bmpPayload(id)
      assert(!png.sameElements(bmp),
        s"containers must differ at the byte level for doc $id")
      assert(JdkMedia.dHash(png) == JdkMedia.dHash(bmp),
        s"same pixels must give the same perceptual fingerprint for doc $id")
    }
  }

  test("quiet WAVs decode below the energy gate, normal ones above") {
    import graft.multimodal.JdkMedia
    (0L until 10L).foreach { id =>
      val loud = JdkMedia.audioEnergy(id, JdkMedia.wavPayload(id))
      val quiet = JdkMedia.audioEnergy(id, JdkMedia.wavQuietPayload(id))
      assert(100 * loud.ss_dev / loud.n_frames >= 100000, s"doc $id loud arm under gate")
      assert(100 * quiet.ss_dev / quiet.n_frames < 100000, s"doc $id quiet arm over gate")
    }
  }

  // ---- r17: MJPEG-style video container + the lossy JPEG dedup arm ----

  test("video payloads are real MJPEG-style containers of genuine PNG frames") {
    import graft.multimodal.JdkMedia
    import spark.implicits._
    val ids = Tables.documents(spark, sf).filter(col("doc_id") < 60)
      .select(col("doc_id")).as[Long]
    val payloads = ids.mapPartitions(_.map(id => (id, JdkMedia.videoPayload(id))))
      .toDF("doc_id", "payload").as[(Long, Array[Byte])]
    val rows = payloads.collect()
    // container magic + frame count by the integer rule
    rows.foreach { case (id, v) =>
      assert(v.take(4).sameElements("GVID".getBytes), s"bad magic for doc $id")
      val n = java.nio.ByteBuffer.wrap(v, 4, 4).getInt
      assert(n == JdkMedia.videoFrames(id), s"frame count diverges for doc $id")
      // the first frame's bytes are a genuine PNG (signature check)
      val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
      assert(v.slice(12, 20).sameElements(sig), s"frame 0 is not a PNG for doc $id")
    }
    // per-frame decode equals the generation rule, partition-invariant
    val a = payloads.mapPartitions(_.flatMap { case (id, v) => JdkMedia.decodeVideo(id, v) })
      .collect().sortBy(f => (f.doc_id, f.frame_idx)).toSeq
    val b = payloads.repartition(7)
      .mapPartitions(_.flatMap { case (id, v) => JdkMedia.decodeVideo(id, v) })
      .collect().sortBy(f => (f.doc_id, f.frame_idx)).toSeq
    assert(a == b, "video decode must be partition-invariant")
    a.foreach { f =>
      val pix = JdkMedia.framePixId(f.doc_id, f.frame_idx)
      val (w, h) = JdkMedia.imageDims(pix)
      assert((f.width, f.height) == (w, h), s"frame dims diverge for doc ${f.doc_id}/${f.frame_idx}")
      val want = (for (y <- 0 until h; x <- 0 until w)
        yield ((JdkMedia.pixelRgb(pix, x, y) >> 16) & 0xff).toLong).sum
      assert(f.sum_r == want, s"frame sum_r diverges for doc ${f.doc_id}/${f.frame_idx}")
    }
    assert(a.map(_.doc_id).distinct.size == 60)
  }

  test("corrupt video containers fail loudly: bad magic, bad count, truncated frame") {
    import graft.multimodal.JdkMedia
    intercept[java.io.IOException] {
      JdkMedia.decodeVideo(1L, "XVIDxxxxxxxx".getBytes)
    }
    val good = JdkMedia.videoPayload(3L)
    // corrupt the frame count field
    val badCount = good.clone(); badCount(4) = 0x7f.toByte
    intercept[java.io.IOException] { JdkMedia.decodeVideo(3L, badCount) }
    intercept[Exception] { JdkMedia.decodeVideo(3L, good.take(good.length / 2)) }
  }

  test("lossy JPEG re-encodes: byte and pixel-sum dedup find zero, dHash groups them") {
    // r16 verdict #3: the BMP plants are lossless (pixels identical), so
    // dHash equality was guaranteed by construction. The JDK's real JPEG
    // encoder at quality 0.7 CHANGES pixels — measured here: byte-level
    // and pixel-sum dedup find zero of the 50 planted re-encode pairs,
    // while the perceptual fingerprint still puts 47/50 re-encodes
    // strictly nearest their own original. Measured distribution
    // (one-time probe, Scratch jpeg_probe, deterministic JDK codec):
    // pair hamming min=0 max=20 median=6; cross-image hamming median=20
    // (min=0 — tiny 8..16px noise-rule images can collide outright, so
    // the fingerprint is recall-oriented, not a unique id; the 3
    // non-strict ids trace to exactly those collisions).
    import graft.multimodal.JdkMedia
    val n = 50
    val pngs = (0L until n.toLong).map(JdkMedia.pngPayload)
    val jpgs = (0L until n.toLong).map(id => JdkMedia.jpegPayload(id, 0.7f))
    val origHash = pngs.map(JdkMedia.dHash)
    // byte dedup: zero pairs (every container differs)
    assert((0 until n).forall(i => !pngs(i).sameElements(jpgs(i))))
    // pixel-sum dedup: zero pairs (lossy — decoded channel sums moved)
    val sumPairs = (0 until n).count { i =>
      val a = JdkMedia.decodeImage(i.toLong, pngs(i))
      val b = JdkMedia.decodeImage(i.toLong, jpgs(i))
      (a.sum_r, a.sum_g, a.sum_b) == (b.sum_r, b.sum_g, b.sum_b)
    }
    assert(sumPairs == 0, s"$sumPairs lossy re-encodes kept identical pixel sums")
    // perceptual grouping: pair distances small (≤24, median ≤12), cross
    // distances large in aggregate (median ≥16), own-original strictly
    // nearest for ≥44/50 — all with margin over the measured values
    val pairDists = (0 until n).map(i => JdkMedia.hamming(origHash(i), JdkMedia.dHash(jpgs(i))))
    info(s"pair hamming: min=${pairDists.min} max=${pairDists.max} " +
      s"median=${pairDists.sorted.apply(n / 2)}")
    assert(pairDists.max <= 24, s"pair hamming max ${pairDists.max} > 24")
    assert(pairDists.sorted.apply(n / 2) <= 12)
    val cross = for (i <- 0 until n; j <- i + 1 until n)
      yield JdkMedia.hamming(origHash(i), origHash(j))
    assert(cross.sorted.apply(cross.size / 2) >= 16)
    val correct = (0 until n).count { i =>
      val jh = JdkMedia.dHash(jpgs(i))
      val own = JdkMedia.hamming(jh, origHash(i))
      (0 until n).filter(_ != i).forall(j => own < JdkMedia.hamming(jh, origHash(j)))
    }
    info(s"nearest-original strictly-correct: $correct / $n")
    assert(correct >= 44, s"only $correct/$n re-encodes nearest their own original")
  }

  test("corrupted payloads fail the decode loudly, not silently") {
    import graft.multimodal.JdkMedia
    intercept[java.io.IOException] {
      JdkMedia.decodeImage(1L, Array[Byte](1, 2, 3, 4))
    }
    intercept[Exception] {
      JdkMedia.decodeAudio(1L, Array[Byte](1, 2, 3, 4))
    }
    // a PNG with flipped payload bytes after the header must not decode
    // to the original's features
    val png = JdkMedia.pngPayload(7L)
    val truncated = png.take(png.length / 2)
    intercept[Exception] { JdkMedia.decodeImage(7L, truncated) }
  }
}
