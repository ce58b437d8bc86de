package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{ImageHeaders, Multimodal, Tables}

/** Pins the multimodal plumbing: typed Dataset schema, per-partition feature
  * extraction, stub-decode determinism. */
class MultimodalSpec extends AnyFunSuite with SharedSparkSpec {

  test("media pipeline: binary payloads → per-partition features") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val media = Multimodal.asMedia(spark, docs)
    val feats = Multimodal.extractFeatures(media).cache()

    assert(feats.count() == docs.count())
    val f = feats.filter(_.doc_id == 0).head()
    val text = docs.filter("doc_id = 0").head().getAs[String]("text")
    assert(f.n_bytes == text.getBytes("UTF-8").length)
    assert(f.checksum == text.getBytes("UTF-8").take(8).map(_ & 0xff).sum)
    val (w, h, fr) = Multimodal.decodeStub(text.getBytes("UTF-8"))
    assert(f.width == w && f.height == h && f.n_frames == fr)
    assert(f.width >= 1 && f.width <= 64 && f.n_frames >= 1 && f.n_frames <= 10)
  }

  test("frame sampler: stride, byte round-trip, corrupt-clip drop") {
    import spark.implicits._
    val good = Multimodal.VideoRecord(7L, Multimodal.videoBytes(7L, 8))
    val badMagic = Multimodal.VideoRecord(8L,
      Multimodal.videoBytes(8L, 3).updated(0, 'X'.toByte))
    val truncated = Multimodal.VideoRecord(9L,
      Multimodal.videoBytes(9L, 5).take(8 + 2 * Multimodal.FrameLen))
    val out = Multimodal
      .sampleFrames(Seq(good, badMagic, truncated).toDS(), 3)
      .collect().sortBy(_.frame_idx)
    // 8 frames, stride 3 → indices 0,3,6; corrupt/truncated clips drop
    assert(out.map(_.doc_id).distinct.toSeq == Seq(7L))
    assert(out.map(_.frame_idx).toSeq == Seq(0, 3, 6))
    assert(out.forall(_.n_frames == 8))
    // checksum must equal the synthesis formula, recovered via byte parse
    for (s <- out)
      assert(s.frame_checksum ==
        (0 until Multimodal.FrameLen).map(j => (7L * 31 + s.frame_idx * 17 + j) % 256).sum)
  }

  test("frame sampler: hostile frame counts drop cleanly; stride validated") {
    import spark.implicits._
    // count field claims 0x7FFFFFFF frames: 8 + n*16 overflows Int to a
    // negative number — the Long-arithmetic bound must still reject it
    val hugeCount = Multimodal.VideoRecord(10L,
      Multimodal.videoBytes(10L, 2)
        .updated(4, 0xff.toByte).updated(5, 0xff.toByte)
        .updated(6, 0xff.toByte).updated(7, 0x7f.toByte))
    // negative count (sign bit set)
    val negCount = Multimodal.VideoRecord(11L,
      Multimodal.videoBytes(11L, 2).updated(7, 0x80.toByte))
    val good = Multimodal.VideoRecord(12L, Multimodal.videoBytes(12L, 4))
    val out = Multimodal
      .sampleFrames(Seq(hugeCount, negCount, good).toDS(), 2)
      .collect()
    assert(out.map(_.doc_id).distinct.toSeq == Seq(12L))
    assert(out.map(_.frame_idx).sorted.toSeq == Seq(0, 2))
    intercept[IllegalArgumentException] {
      Multimodal.sampleFrames(Seq(good).toDS(), 0)
    }
  }

  test("wav header codec: synth→decode round-trip; hostile lengths drop") {
    import graft.engine.AudioHeaders
    val good = AudioHeaders.wavBytes(2, 16000, 16, 100)
    assert(good.length == 44 + 100 * 2 * 2)
    assert(AudioHeaders.decode(good) == Some((2, 16000, 16, 100L)))
    // mono 8-bit at 8kHz
    assert(AudioHeaders.decode(AudioHeaders.wavBytes(1, 8000, 8, 30)) ==
      Some((1, 8000, 8, 30L)))
    // data-chunk length claiming ~2 GiB past the buffer: drop, don't throw
    val lied = good.clone()
    lied(40) = 0xff.toByte; lied(41) = 0xff.toByte
    lied(42) = 0xff.toByte; lied(43) = 0x7f.toByte
    assert(AudioHeaders.decode(lied).isEmpty)
    assert(AudioHeaders.decode(good.take(20)).isEmpty)
    assert(AudioHeaders.decode("definitely not RIFF audio bytes!".getBytes("UTF-8")).isEmpty)
  }

  test("wav header codec: property round-trip across the PCM parameter space") {
    import graft.engine.AudioHeaders
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val ch = rnd.nextInt(8) + 1
      val rate = Seq(8000, 11025, 16000, 22050, 44100, 48000)(rnd.nextInt(6))
      val bits = Seq(8, 16, 24, 32)(rnd.nextInt(4))
      val n = rnd.nextInt(500)
      assert(AudioHeaders.decode(AudioHeaders.wavBytes(ch, rate, bits, n)) ==
        Some((ch, rate, bits, n.toLong)),
        s"round-trip failed for ch=$ch rate=$rate bits=$bits n=$n")
    }
  }

  test("samples16: sign-extended int16 decode; non-16-bit and corrupt clips drop") {
    import graft.engine.AudioHeaders
    // LE byte pairs (lo, hi): (00,01)→256, (ff,7f)→32767, (00,80)→-32768, (ff,ff)→-1
    val b = AudioHeaders.wavBytes(1, 8000, 16, 4)
    val data = Array[Byte](0x00, 0x01, 0xff.toByte, 0x7f, 0x00, 0x80.toByte, 0xff.toByte, 0xff.toByte)
    System.arraycopy(data, 0, b, AudioHeaders.WavHeaderLen, 8)
    assert(AudioHeaders.samples16(b).get.toSeq == Seq(256, 32767, -32768, -1))
    assert(AudioHeaders.samples16(AudioHeaders.wavBytes(1, 8000, 8, 4)).isEmpty,
      "8-bit clips must not decode through the int16 path")
    assert(AudioHeaders.samples16("not a wav".getBytes("UTF-8")).isEmpty)
  }

  test("jpeg header codec: segment walk recovers dims; hostile/corrupt drop") {
    import graft.engine.{ImageHeaders, JpegHeaders}
    val base = JpegHeaders.jpegBytes(640, 480, 5, progressive = false)
    assert(base.length == JpegHeaders.JpegHeaderLen + 5)
    assert(JpegHeaders.decode(base) == Some((false, 640, 480)))
    assert(JpegHeaders.decode(JpegHeaders.jpegBytes(31, 4095, 0, progressive = true)) ==
      Some((true, 31, 4095)))
    // ImageHeaders integration: jpeg recognized alongside png/bmp
    assert(ImageHeaders.decode(base) == Some(("jpeg", 640, 480)))
    // truncated mid-APP0: the walker's bounds check must reject it
    assert(JpegHeaders.decode(base.take(6)).isEmpty)
    // hostile segment length pointing past the buffer
    val lied = base.clone()
    lied(4) = 0x7f.toByte; lied(5) = 0xff.toByte
    assert(JpegHeaders.decode(lied).isEmpty)
    // SOS before any SOF (scan data with no frame header): corrupt
    val sos = base.clone()
    sos(21) = 0xda.toByte
    assert(JpegHeaders.decode(sos).isEmpty)
    // not a JPEG at all
    assert(JpegHeaders.decode("definitely not jpeg bytes".getBytes("UTF-8")).isEmpty)
  }

  test("jpeg header codec: property round-trip, dims up to 16 bits") {
    import graft.engine.JpegHeaders
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val w = rnd.nextInt(65535) + 1
      val h = rnd.nextInt(65535) + 1
      val prog = rnd.nextBoolean()
      assert(JpegHeaders.decode(JpegHeaders.jpegBytes(w, h, rnd.nextInt(64), prog)) ==
        Some((prog, w, h)), s"round-trip failed for w=$w h=$h prog=$prog")
    }
  }

  test("exif codec: IFD walk in both byte orders; hostile offsets/counts drop") {
    import graft.engine.JpegHeaders
    for (big <- Seq(false, true)) {
      val b = JpegHeaders.jpegExifBytes(640, 480, 1920, 1080, 6, big, 7)
      assert(JpegHeaders.exifMeta(b) == Some((big, 6, 1920L, 1080L)),
        s"round-trip failed for bigEndian=$big")
      // the SOF dims must still come from the frame header, not EXIF
      assert(JpegHeaders.decode(b) == Some((false, 640, 480)))
    }
    // orientation SHORT is left-justified: all 8 values survive both orders
    for (o <- 1 to 8; big <- Seq(false, true))
      assert(JpegHeaders.exifMeta(
        JpegHeaders.jpegExifBytes(8, 8, 16, 16, o, big, 0)).get._2 == o)
    // hostile IFD offset pointing past the segment: drop, don't throw
    val base = JpegHeaders.jpegExifBytes(640, 480, 1920, 1080, 1, false, 0)
    val badIfd = base.clone()
    badIfd(16) = 0x7f; badIfd(17) = 0x7f; badIfd(18) = 0x7f; badIfd(19) = 0x7f
    assert(JpegHeaders.exifMeta(badIfd).isEmpty)
    // hostile entry count claiming more entries than the segment holds
    val badCount = base.clone()
    badCount(20) = 0xff.toByte; badCount(21) = 0x7f
    assert(JpegHeaders.exifMeta(badCount).isEmpty)
    // plain EXIF-less JPEG and non-JPEG bytes: no EXIF to report
    assert(JpegHeaders.exifMeta(JpegHeaders.jpegBytes(64, 64, 4, progressive = false)).isEmpty)
    assert(JpegHeaders.exifMeta("not a jpeg at all".getBytes("UTF-8")).isEmpty)
  }

  test("repartition by byte budget keeps batches balanced") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val media = Multimodal.asMedia(spark, docs).repartition(8)
    val perPart = media.rdd.mapPartitions(it => Iterator(it.map(_.payload.length).sum)).collect()
    assert(perPart.length == 8)
    assert(perPart.sum > 0)
  }

  test("bmp pixel codec: synth→decode round-trip undoes bottom-up rows and stride") {
    def pix(x: Int, y: Int): Int = (x * 40 + y * 3 + 11) % 256
    // 8x8 (stride 24, no pad) and 5x3 (row 15 bytes → stride 16, 1 pad byte)
    for ((w, h) <- Seq((8, 8), (5, 3))) {
      val bytes = ImageHeaders.bmpPixelBytes(w, h, pix)
      val Some((dw, dh, gray)) = ImageHeaders.bmpGray(bytes)
      assert(dw == w && dh == h)
      for (y <- 0 until h; x <- 0 until w)
        assert(gray(y * w + x) == pix(x, y), s"pixel ($x,$y) in ${w}x$h")
    }
    // hostile: declared dims larger than the payload must drop, not read OOB
    val short = ImageHeaders.bmpPixelBytes(8, 8, pix).take(60)
    assert(ImageHeaders.bmpGray(short).isEmpty)
    // non-24bpp declared must drop
    val b = ImageHeaders.bmpPixelBytes(8, 8, pix); b(28) = 8
    assert(ImageHeaders.bmpGray(b).isEmpty)
  }

  test("dHash56: one-pixel perturbation flips at most 2 bits, shift-invariance holds") {
    def base(x: Int, y: Int): Int = ((x * 13 + y * 31) * (x + 8 * y + 3)) % 251
    val Some((_, _, g0)) = ImageHeaders.bmpGray(ImageHeaders.bmpPixelBytes(8, 8, base))
    val h0 = ImageHeaders.dHash56(8, 8, g0)
    assert(h0 >= 0L, "56-bit hash stays positive in a signed lane")
    // perturb one pixel → Hamming ≤ 2 (the two comparisons it touches)
    val Some((_, _, g1)) = ImageHeaders.bmpGray(ImageHeaders.bmpPixelBytes(8, 8,
      (x, y) => if (x == 3 && y == 4) (base(x, y) + 97) % 251 else base(x, y)))
    val h1 = ImageHeaders.dHash56(8, 8, g1)
    assert(java.lang.Long.bitCount(h0 ^ h1) <= 2)
    // uniform brightness shift → identical hash (why the planted groups
    // must vary their GRADIENT, not their level). base() is % 251, so a +5
    // shift never needs clamping — a clamp could equalize two unequal
    // adjacent pixels and flip a strict-greater bit, voiding the claim.
    assert(ImageHeaders.dHash56(8, 8, g0.map(_ + 5)) == h0)
  }

  test("mm_audio_segments: island merge is non-trivial and internally consistent") {
    val rows = SparkEntry.queries("mm_audio_segments")(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 500)
    for (r <- rows) {
      val (nf, sp, seg, lng) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(sp <= nf && lng <= sp, s"bounds: $r")
      assert(seg >= 1 && sp >= 1, "the quadratic silence rule never silences a whole clip")
      assert(lng * seg >= sp / seg || seg * lng >= sp - seg + 1 || lng <= sp,
        s"longest run must cover its share: $r")
      assert(seg <= (nf + 1) / 2 + 1, s"segments bounded by alternation: $r")
    }
    // the quadratic silence pattern must produce VARIABLE run lengths —
    // a periodic rule (the first draft) made every segment length 2 and
    // the island merge untestable
    assert(rows.map(_.getLong(4)).distinct.length >= 3,
      "expected at least 3 distinct longest-run lengths across clips")
  }

  test("mm_image_dedup: banded pipeline finds every planted pair at full purity (sf0.001)") {
    val r = SparkEntry.queries("mm_image_dedup")(spark, "/root/testdata/sf0.001").collect().head
    assert(r.getLong(0) == 500, "one image per document")
    assert(r.getLong(3) == r.getLong(4), "every planted pair recovered (n_true == n_planted)")
    assert(r.getDouble(5) == 1.0 && r.getDouble(6) == 1.0, "purity and recall 1.0 at this SF")
    assert(r.getLong(1) < 10000, "banding keeps candidates near the planted count, not all-pairs")
  }
}
