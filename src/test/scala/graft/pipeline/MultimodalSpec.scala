package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** The BMP codec pair: [[Multimodal.encodeBmp]] must emit spec-conformant
  * files and [[Multimodal.decodeBmp]] must read features back through the
  * header alone — including the row padding only a real parser skips.
  */
class MultimodalSpec extends AnyFunSuite {
  import Multimodal._
  private lazy val spark = graft.TestSpark.spark

  test("encodeBmp emits a well-formed 24-bit BMP (header + padded rows)") {
    val src = (1 to 100).map(_.toByte).toArray // n=100 → w=8, h=16
    val bmp = encodeBmp(src)
    assert(bmp(0) == 'B'.toByte && bmp(1) == 'M'.toByte)
    def i32(off: Int): Int =
      (bmp(off) & 0xff) | ((bmp(off + 1) & 0xff) << 8) |
        ((bmp(off + 2) & 0xff) << 16) | ((bmp(off + 3) & 0xff) << 24)
    val w = 1 + 100 % 31 // 8
    val h = 1 + 100 % 17 // 16
    val pad = (4 - (3 * w) % 4) % 4
    assert(i32(18) == w && i32(22) == h)
    assert(i32(10) == 54)                              // pixel offset
    assert(i32(2) == bmp.length)                       // file size field
    assert(bmp.length == 54 + (3 * w + pad) * h)
    // padding bytes are zero and sit where the stride says they sit
    for (y <- 0 until h; k <- 0 until pad)
      assert(bmp(54 + y * (3 * w + pad) + 3 * w + k) == 0)
  }

  test("decodeBmp reads geometry from the header and skips row padding") {
    // w=2 → rowBytes=6, pad=2: mean over pixels only — the zero padding
    // bytes must NOT drag the mean down
    val n = 32 // w = 1 + 32 % 31 = 2, h = 1 + 32 % 17 = 16
    val src = Array.fill[Byte](n)(100)
    val f = decodeBmp(MediaRow(7L, "image/bmp", encodeBmp(src)))
    assert(f.width == 2 && f.height == 16)
    assert(f.mean_intensity == 100, "padding leaked into the mean")
    assert(f.n_bytes == 54 + (3 * 2 + 2) * 16)
    // checksum = fold over the 3*2*16 cycled pixel bytes, all 100
    val expected = (1 to 3 * 2 * 16).foldLeft(0L)((a, _) => (a * 31 + 100) % 9007199254740881L)
    assert(f.checksum == expected)
  }

  test("decodeBmp honors a non-standard pixel-data offset") {
    val src = (1 to 50).map(_.toByte).toArray
    val bmp = encodeBmp(src)
    // splice 8 junk bytes between header and pixels, fix the offset field
    val spliced = bmp.take(54) ++ Array.fill[Byte](8)(-1) ++ bmp.drop(54)
    val off = 54 + 8
    spliced(10) = (off & 0xff).toByte
    val viaOffset = decodeBmp(MediaRow(1L, "image/bmp", spliced))
    val direct = decodeBmp(MediaRow(1L, "image/bmp", bmp))
    assert(viaOffset.copy(n_bytes = direct.n_bytes) == direct,
      "decoder must locate pixels through the offset field, not assume 54")
  }

  test("encodeWav/decodeWav round-trip: header fields and sample stats") {
    for (n <- Seq(1, 2, 7, 8, 255, 256, 1000)) {
      val src = Array.tabulate(n)(i => ((i * 37 + 11) % 256).toByte)
      val wav = Multimodal.encodeWav(src)
      val f = Multimodal.decodeWav(Multimodal.MediaRow(n.toLong, "audio/wav", wav))
      assert(f.n_bytes == 44 + 2 * n)
      assert(f.sample_rate == 8000 + 1000 * (n % 8))
      assert(f.n_samples == n)
      assert(f.duration_ms == n * 1000L / f.sample_rate)
      val abses = src.map(b => math.abs((b & 0xff) - 128) * 256)
      assert(f.sum_abs == abses.map(_.toLong).sum && f.peak == abses.max)
    }
  }

  test("decodeWav rejects malformed RIFF payloads") {
    val good = Multimodal.encodeWav(Array[Byte](1, 2, 3, 4))
    def broken(mutate: Array[Byte] => Unit): Array[Byte] = {
      val b = good.clone(); mutate(b); b
    }
    // wrong magic, non-PCM format word, truncated data chunk
    for (bad <- Seq(
        broken(_(0) = 'X'.toByte),
        broken(_(20) = 2.toByte),
        broken(b => java.nio.ByteBuffer.wrap(b).order(
          java.nio.ByteOrder.LITTLE_ENDIAN).putInt(40, 9999))))
      assertThrows[IllegalArgumentException] {
        Multimodal.decodeWav(Multimodal.MediaRow(0L, "audio/wav", bad))
      }
  }

  test("decodeBmp rejects non-BMP and unsupported variants") {
    intercept[IllegalArgumentException] {
      decodeBmp(MediaRow(1L, "image/bmp", Array.fill[Byte](60)(7)))
    }
    val bmp = encodeBmp((1 to 40).map(_.toByte).toArray)
    bmp(28) = 8 // claim 8 bits per pixel
    intercept[IllegalArgumentException] {
      decodeBmp(MediaRow(1L, "image/bmp", bmp))
    }
    val bmp2 = encodeBmp((1 to 40).map(_.toByte).toArray)
    bmp2(30) = 1 // claim RLE compression
    intercept[IllegalArgumentException] {
      decodeBmp(MediaRow(1L, "image/bmp", bmp2))
    }
  }

  test("encodeAvi emits a well-formed RIFF-AVI (magics, list walk, sizes)") {
    val src = (1 to 200).map(_.toByte).toArray
    val avi = encodeAvi(src)
    def cc(off: Int) = new String(avi, off, 4, "US-ASCII")
    def i32(off: Int) =
      (avi(off) & 0xff) | ((avi(off + 1) & 0xff) << 8) |
        ((avi(off + 2) & 0xff) << 16) | ((avi(off + 3) & 0xff) << 24)
    assert(cc(0) === "RIFF" && cc(8) === "AVI ")
    assert(8 + i32(4) === avi.length) // RIFF size spans the whole file
    assert(cc(12) === "LIST" && cc(20) === "hdrl")
    assert(cc(24) === "avih" && i32(28) === 56)
    // the movi list follows the hdrl list immediately
    val moviOff = 20 + i32(16)
    assert(cc(moviOff) === "LIST" && cc(moviOff + 8) === "movi")
  }

  test("demuxAvi round trip: frame count, geometry, distinct rolling frames") {
    val src = (1 to 200).map(_.toByte).toArray
    val n = src.length
    val frames = demuxAvi(MediaRow(3L, "video/x-msvideo", encodeAvi(src))).toSeq
    assert(frames.length === 2 + n % 5)
    assert(frames.forall(f => f.width === 1 + n % 19 && f.height === 1 + n % 13))
    assert(frames.map(_.frame_no) === frames.indices)
    // pixels cycle continuously, so consecutive frames differ
    assert(frames.map(_.checksum).distinct.length === frames.length)
  }

  test("demuxAvi rejects malformed containers") {
    intercept[IllegalArgumentException] { // not RIFF
      demuxAvi(MediaRow(1L, "video/x-msvideo", Array.fill[Byte](64)(9))).toSeq
    }
    val avi = encodeAvi((1 to 100).map(_.toByte).toArray)
    avi(36) = 0 // zero out part of dwMicroSecPerFrame — harmless field
    demuxAvi(MediaRow(1L, "video/x-msvideo", avi)).toSeq // still parses
    val bad = encodeAvi((1 to 100).map(_.toByte).toArray)
    // corrupt the strf bit depth (strf data starts after hdrl/strl headers)
    val strfData = 12 + 8 + 4 + 64 + 8 + 4 + 64 + 8
    assert(new String(bad, strfData - 8, 4, "US-ASCII") === "strf")
    bad(strfData + 14) = 8 // claim 8 bpp
    intercept[IllegalArgumentException] {
      demuxAvi(MediaRow(1L, "video/x-msvideo", bad)).toSeq
    }
  }

  test("resizeBmp identity: same geometry reproduces the source pixels exactly") {
    val src = MediaRow(9L, "image/bmp", encodeBmp((1 to 173).map(_.toByte).toArray))
    val f = decodeBmp(src)
    val same = decodeBmp(resizeBmp(src, f.width, f.height))
    assert(same.width === f.width && same.height === f.height)
    assert(same.checksum === f.checksum) // pixel-exact, padding re-derived
    assert(same.mean_intensity === f.mean_intensity)
  }

  test("resizeBmp nearest-neighbor picks floor-sampled pixels") {
    // 2×2 image with distinct per-pixel colors, downsampled to 1×1: NN must
    // keep exactly the stored-first pixel (sy = sx = 0)
    val px = Array[Byte](
      10, 11, 12,  20, 21, 22,   // stored row 0: pixels (0,0) (0,1)
      30, 31, 32,  40, 41, 42)   // stored row 1
    val src = MediaRow(5L, "image/bmp", encodeBmpRaw(2, 2, px))
    val out = resizeBmp(src, 1, 1)
    val g = decodeBmp(out)
    assert(g.width === 1 && g.height === 1)
    // checksum over exactly bytes 10,11,12
    val expect = ((10L * 31 + 11) * 31 + 12) % 9007199254740881L
    assert(g.checksum === expect)
    assert(g.mean_intensity === (10 + 11 + 12) / 3)
  }

  test("ahashBmp: bright-top image sets exactly the top-half bits") {
    // 8×8 image, rows 0-3 white (s=765), rows 4-7 black (s=0); identity
    // sampling, mean = 765/2 → bits 0..31 set, 32..63 clear
    val px = new Array[Byte](3 * 8 * 8)
    java.util.Arrays.fill(px, 0, 3 * 8 * 4, 0xFF.toByte)
    val h = ahashBmp(MediaRow(7L, "image/bmp", encodeBmpRaw(8, 8, px)))
    assert(h.ahash_lo === 0xFFFFFFFFL && h.ahash_hi === 0L)
  }

  test("ahashBmp: constant image hashes to zero (strict mean threshold)") {
    val px = Array.fill(3 * 8 * 8)(42.toByte)
    val h = ahashBmp(MediaRow(8L, "image/bmp", encodeBmpRaw(8, 8, px)))
    assert(h.ahash_lo === 0L && h.ahash_hi === 0L)
  }

  test("ahashWav: rising energy sets all bits, constant energy none") {
    // 66 source bytes → 66 samples, 33 windows of exactly 2: strictly
    // rising |byte − 128| → every adjacent window pair increases
    val rising = (0 until 66).map(i => (128 + 2 * i / 2).toByte).toArray
    val hUp = ahashWav(MediaRow(1L, "audio/wav", encodeWav(rising)))
    assert(hUp.ahash === 0xFFFFFFFFL)
    val flat = Array.fill(66)(200.toByte)
    val hFlat = ahashWav(MediaRow(2L, "audio/wav", encodeWav(flat)))
    assert(hFlat.ahash === 0L)
  }

  test("ahashWav is invariant under uniform amplitude change (near-dup property)") {
    // halving every amplitude preserves the energy CONTOUR, hence the hash
    val rnd = new scala.util.Random(11)
    val loud = Array.fill(200)((128 + rnd.nextInt(100)).toByte)
    val quiet = loud.map(b => (128 + ((b & 0xff) - 128) / 2).toByte)
    val hL = ahashWav(MediaRow(3L, "audio/wav", encodeWav(loud)))
    val hQ = ahashWav(MediaRow(4L, "audio/wav", encodeWav(quiet)))
    assert(hL.ahash === hQ.ahash)
  }

  test("ahashBmp is invariant under NN upscale (the near-dup property)") {
    // the perceptual contract: a 2× upscaled image must hash identically,
    // because every 8×8 sample lands on the same source pixel
    val rnd = new scala.util.Random(7)
    val px = Array.fill(3 * 8 * 8)(rnd.nextInt(256).toByte)
    val base = MediaRow(9L, "image/bmp", encodeBmpRaw(8, 8, px))
    val up = resizeBmp(base, 16, 16)
    assert(ahashBmp(base).copy(doc_id = 0) === ahashBmp(up).copy(doc_id = 0))
  }

  // ---------------------------------------------------------- near-dup pairs

  test("neardupOf finds a planted upscaled copy through the real decode path") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(21)
    val px = Array.fill(3 * 8 * 8)(rnd.nextInt(256).toByte)
    val orig = MediaRow(1L, "image/bmp", encodeBmpRaw(8, 8, px))
    // doc 2 = the 2× NN-upscaled re-encode of doc 1 (hamming 0); doc 3 =
    // an unrelated image (far); docs never pair with themselves
    val copy = resizeBmp(orig, 16, 16).copy(doc_id = 2L)
    val far = MediaRow(3L, "image/bmp",
      encodeBmpRaw(8, 8, Array.fill(3 * 8 * 8)(rnd.nextInt(256).toByte)))
    val fp = Seq(orig, copy, far).map(ahashBmp).toDF()
      .select($"doc_id", $"ahash_hi".as("h1"), $"ahash_lo".as("h2"))
    val got = Multimodal.neardupOf(spark, fp, Multimodal.ImageBands, Multimodal.ImageTau)
      .as[(Long, Long, Int)].collect().toSeq
    assert(got.exists { case (a, b, h) => a == 1L && b == 2L && h == 0 })
    assert(got.forall { case (a, b, _) => a < b })
  }

  test("a pair sharing every band appears exactly once (no multi-band dup)") {
    import spark.implicits._
    val fp = Seq((1L, 5L, 7L), (2L, 5L, 7L)).toDF("doc_id", "h1", "h2")
    val got = Multimodal.neardupOf(spark, fp, 8, 7).collect()
    assert(got.length == 1 && got.head.getInt(2) == 0)
  }

  test("hot-bucket guard drops degenerate buckets (adversarial constant corpus)") {
    import spark.implicits._
    // 30 identical hashes: every band bucket holds 30 > maxBucket=8 rows,
    // so ALL pairs drop — the quadratic cell never forms. One near pair
    // with a distinct hash survives untouched.
    val degenerate = (1L to 30L).map(i => (i, 0L, 0L))
    val near = Seq((100L, 0x0101010101010101L, 3L), (101L, 0x0101010101010101L, 1L))
    val fp = (degenerate ++ near).toDF("doc_id", "h1", "h2")
    val got = Multimodal.neardupOf(spark, fp, 8, 7, maxBucket = 8)
      .as[(Long, Long, Int)].collect().toSeq
    assert(got == Seq((100L, 101L, 1)))
  }

  test("video near-dup: a byte-identical re-upload shares every frame hash") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumped over the lazy dog tonight"),
      (2L, "the quick brown fox jumped over the lazy dog tonight"), // re-upload
      (3L, "completely different content with no shared footage at all"))
      .toDF("doc_id", "text")
    val fp = Multimodal.videoHashOf(docs)
    val nFrames1 = fp.filter($"doc_id" === 1L)
      .select($"ahash_hi", $"ahash_lo").distinct().count()
    val got = Multimodal.neardupVideoOf(fp)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.contains((1L, 2L, nFrames1)), s"got $got")
  }

  test("banded pair join is exact vs brute force under the pigeonhole bound") {
    import spark.implicits._
    // clustered random hashes so some pairs land under the threshold
    val rnd = new scala.util.Random(42)
    val centers = Array.fill(6)(rnd.nextLong())
    val hashes = (1L to 120L).map { i =>
      var h = centers(rnd.nextInt(centers.length))
      (0 until rnd.nextInt(6)).foreach(_ => h ^= 1L << rnd.nextInt(64))
      (i, (h >>> 32) & 0xFFFFFFFFL, h & 0xFFFFFFFFL)
    }
    def ham(x: (Long, Long, Long), y: (Long, Long, Long)): Int =
      java.lang.Long.bitCount(x._2 ^ y._2) + java.lang.Long.bitCount(x._3 ^ y._3)
    val brute = (for {
      a <- hashes; b <- hashes if a._1 < b._1 && ham(a, b) <= 7
    } yield (a._1, b._1, ham(a, b))).sorted
    val got = Multimodal.neardupOf(
        spark, hashes.toDF("doc_id", "h1", "h2"), 8, 7, maxBucket = 1000)
      .as[(Long, Long, Int)].collect().toSeq.sorted
    assert(brute.nonEmpty && got == brute)
  }

  test("sceneCuts == the window spelling over videoHashOf (cross-impl)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.table(spark, "/root/testdata/sf0.001", "documents")
    // independent spelling: per-doc lag window over the frame-hash table
    val w = Window.partitionBy($"doc_id").orderBy($"frame_no")
    val viaWindow = Multimodal.videoHashOf(docs)
      .withColumn("ph", lag($"ahash_hi", 1).over(w))
      .withColumn("pl", lag($"ahash_lo", 1).over(w))
      .filter($"ph".isNotNull)
      .withColumn("hamming",
        expr("bit_count(ahash_hi ^ ph) + bit_count(ahash_lo ^ pl)").cast("long"))
      .filter($"hamming" >= Multimodal.SceneCutHamming)
      .select($"doc_id", $"frame_no", $"hamming")
      .as[(Long, Int, Long)].collect().toSeq.sorted
    val got = Multimodal.sceneCutsOf(docs)
      .as[(Long, Int, Long)].collect().toSeq.sorted
    assert(got.nonEmpty && got == viaWindow)
    // hamming is a 0..64 bit count and every cut clears the threshold
    assert(got.forall(c => c._3 >= Multimodal.SceneCutHamming && c._3 <= 64L))
  }

  test("keyframes tile the frame range; one per shot; hash = the start frame's") {
    import spark.implicits._
    val docs = graft.sources.Tables.table(spark, "/root/testdata/sf0.001", "documents")
    val kf = Multimodal.keyframesOf(docs)
      .as[(Long, Long, Int, Long, Long, Long)].collect().toSeq
      .sortBy(k => (k._1, k._2))
    assert(kf.nonEmpty)
    val cuts = Multimodal.sceneCutsOf(docs)
      .as[(Long, Int, Long)].collect().toSeq
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val frames = Multimodal.videoHashOf(docs)
      .as[(Long, Int, Long, Long)].collect().toSeq
    val nFrames = frames.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val hashAt = frames.map(f => (f._1, f._2) -> ((f._3, f._4))).toMap
    kf.groupBy(_._1).foreach { case (doc, shots) =>
      // shots = cuts + 1, numbered 1..n, spans tile [0, nFrames)
      assert(shots.map(_._2) == (1L to (cuts.getOrElse(doc, Nil).size + 1L)))
      assert(shots.map(_._4).sum == nFrames(doc))
      assert(shots.head._3 == 0)
      shots.sliding(2).foreach {
        case Seq(a, b) => assert(a._3 + a._4 == b._3) // abutting spans
        case _ =>
      }
      // each shot after the first starts AT a cut frame, and the keyframe
      // hash is exactly the start frame's hash
      shots.drop(1).foreach(s => assert(cuts(doc).contains(s._3)))
      shots.foreach(s => assert(hashAt((doc, s._3)) == ((s._5, s._6))))
    }
  }

  test("temporal near-dup pairs a TRIMMED copy; one shared still does not pair") {
    import spark.implicits._
    // planted at the frame-hash level (videoSeqFpOfFrames): video 2 is
    // video 1 with the intro frame dropped and positions renumbered — the
    // shifted/trimmed re-encode exact positional equality misses; video 3
    // shares exactly ONE isolated frame (h3) with video 1 — a coincidental
    // still, not aligned footage
    val h = (i: Long) => (100L + i, 200L + i)
    val v1 = (0 until 6).map(i => (1L, i, h(i)._1, h(i)._2))
    val v2 = (1 until 6).zipWithIndex.map { case (src, pos) =>
      (2L, pos, h(src)._1, h(src)._2) }
    val v3 = Seq((3L, 0, 901L, 902L), (3L, 1, h(3)._1, h(3)._2), (3L, 2, 903L, 904L))
    val frames = (v1 ++ v2 ++ v3)
      .toDF("doc_id", "frame_no", "ahash_hi", "ahash_lo")
    val pairs = Multimodal.videoSeqPairsOf(Multimodal.videoSeqFpOfFrames(frames))
      .as[(Long, Long, Long)].collect().toSeq
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 >= 1L),
      s"trimmed copy must pair: $pairs")
    assert(!pairs.exists(p => p._2 == 3L || p._1 == 3L),
      s"an isolated shared still must NOT pair temporally: $pairs")
    // ...while the exact-frame tier DOES pair video 3 (the recall/precision
    // split between the two tiers)
    val exact = Multimodal.neardupVideoOf(
        frames.select($"doc_id", $"ahash_hi", $"ahash_lo"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(exact.contains((1L, 3L, 1L)), s"exact tier should see the still: $exact")
  }

  test("frame-table fingerprint path == decode-path fingerprints (real corpus)") {
    import spark.implicits._
    val docs = graft.sources.Tables
      .table(spark, "/root/testdata/sf0.001", "documents").limit(50)
    val direct = Multimodal.videoSeqFingerprintsOf(docs)
      .orderBy($"doc_id", $"pos").collect().map(_.toSeq).toSeq
    val viaFrames = Multimodal.videoSeqFpOfFrames(Multimodal.videoHashOf(docs))
      .orderBy($"doc_id", $"pos").collect().map(_.toSeq).toSeq
    assert(direct.nonEmpty && direct == viaFrames)
  }
}
