package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.Tables

class MultimodalSpec extends SparkSpec {

  private def media = Multimodal.fromText(
    Tables.documents(spark, sf), "doc_id", "text")

  test("media schema contract holds") {
    assert(media.schema("content").dataType ==
      org.apache.spark.sql.types.BinaryType)
    assert(media.schema("meta").dataType.isInstanceOf[org.apache.spark.sql.types.StructType])
  }

  test("feature extraction: histogram sums to byte count") {
    val f = Multimodal.extractFeatures(media)
    val bad = f.filter(
      aggregate(col("features"), lit(0L), (a, x) => a + x) =!= col("n_bytes"))
    assert(bad.count() == 0)
  }

  test("feature extraction: array contract — array<bigint> of length 16") {
    // the mm2 driver oracle verifies a CSV-string projection (pandas
    // canonicalizer limitation); this keeps the ARRAY shape covered
    val f = Multimodal.extractFeatures(media)
    assert(f.schema("features").dataType ==
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType, containsNull = false))
    assert(f.filter(size(col("features")) =!= 16).count() == 0)
  }

  test("frame sampling: indices stride correctly and slices are uniform") {
    val frames = Multimodal.sampleFrames(
      Multimodal.fromText(Tables.documents(spark, sf), "doc_id", "text", "video"),
      stride = 5)
    assert(frames.filter(pmod(col("frame_idx"), lit(5)) =!= 0).count() == 0)
    assert(frames.count() > 0)
  }

  test("blob repartitioning bounds rows per partition") {
    val parts = Multimodal.repartitionForBlobs(media, rowsPerPartition = 100)
      .rdd.glom().map(_.length).collect()
    assert(parts.max <= 220, s"max partition ${parts.max}") // range split slack
  }

  test("ivf similarity: recall scales with probed fraction; results rank correctly") {
    // synthetic embeddings are isotropic-random (no cluster structure), the
    // worst case for sign-LSH: with 3 planes + Hamming-1 probes each query
    // scans ~half the corpus, so recall must beat a corpus-fraction bound.
    val e = Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < 10)
    val brute = Similarity.bruteForceTopK(e, q, "embedding", "vec_id", 10)
      .select("query_id", "corpus_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(e, q, "embedding", "vec_id", 10, planes = 3, probes = 2)
      .select("query_id", "corpus_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.3, s"recall $recall")
    // and every IVF hit is a genuine corpus neighbor of its query (sane ids)
    assert(ivf.forall { case (qid, cid) => qid != cid })
  }

  test("sniffHeader parses real PNG/JPEG/GIF/BMP/WAV headers from raw bytes") {
    import spark.implicits._
    def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    val png = bytes(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A, // signature
      0, 0, 0, 13) ++ "IHDR".getBytes ++
      bytes(0, 0, 2, 0x80, 0, 0, 1, 0xE0, 8, 6, 0, 0, 0) // 640x480
    val jpeg = bytes(0xFF, 0xD8, // SOI
      0xFF, 0xE0, 0, 4, 0, 0, // APP0 (len 4)
      0xFF, 0xC0, 0, 11, 8, 0, 0xF0, 1, 0x40, 1, 0, 0, 0) // SOF0 h=240 w=320
    val gif = "GIF89a".getBytes ++ bytes(0x20, 0x01, 0xC8, 0x00, 0, 0) // 288x200
    val bmp = "BM".getBytes ++ new Array[Byte](16) ++
      bytes(0x64, 0, 0, 0) ++ bytes(0x32, 0, 0, 0) ++ bytes(0, 0) // 100x50
    val wav = "RIFF".getBytes ++ bytes(0, 0, 0, 0) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ bytes(16, 0, 0, 0, 1, 0, 2, 0, 0x44, 0xAC, 0, 0) ++
      new Array[Byte](8) // stereo 44100
    val txt = "just some text, no media header".getBytes
    val df = Seq((1L, png), (2L, jpeg), (3L, gif), (4L, bmp), (5L, wav), (6L, txt))
      .toDF("media_id", "content")
    val got = Multimodal.describeMedia(df).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2), r.getInt(3))).toMap
    assert(got(1L) == ("png", 640, 480))
    assert(got(2L) == ("jpeg", 320, 240))
    assert(got(3L) == ("gif", 288, 200))
    assert(got(4L) == ("bmp", 100, 50))
    assert(got(5L) == ("wav", 2, 44100))
    assert(got(6L) == ("unknown", 0, 0))
  }

  test("REAL image decode: PNG round trip recovers exact pixels; JPEG decodes; resize rescales") {
    // solid-color PNG: lossless, so channel means are exact
    val png = Multimodal.syntheticPng(3L, 8, 6) // color (21, 39, 87)
    val Some((w, h, mr, mg, mb, hist)) = Multimodal.decodeImage(png)
    assert((w, h) == (8, 6))
    assert((mr, mg, mb) == (21.0, 39.0, 87.0))
    assert(hist.sum == 48L) // every pixel lands in exactly one luma bin
    // JPEG: lossy, but dimensions and approximate color must survive
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    val jbos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", jbos)
    val Some((jw, jh, jr, _, _, _)) = Multimodal.decodeImage(jbos.toByteArray)
    assert((jw, jh) == (8, 6) && math.abs(jr - 21.0) < 16.0)
    // real resize: new dimensions, solid color preserved exactly
    val Some(small) = Multimodal.resizeImageBytes(png, 4, 3)
    val Some((rw, rh, rr, rg, rb, _)) = Multimodal.decodeImage(small)
    assert((rw, rh) == (4, 3) && (rr, rg, rb) == (21.0, 39.0, 87.0))
    // non-image bytes decode to None, never throw
    assert(Multimodal.decodeImage("not an image".getBytes).isEmpty)
    assert(Multimodal.decodeImage(null).isEmpty)
  }

  test("REAL audio decode: synthesized 16-bit PCM WAV round-trips format and amplitude") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // 100 frames of a constant +1000 sample, mono 8kHz 16-bit LE PCM
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val pcm = new Array[Byte](200)
    var i = 0
    while (i < 200) { pcm(i) = (1000 & 0xFF).toByte; pcm(i + 1) = (1000 >> 8).toByte; i += 2 }
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, 100), AudioFileFormat.Type.WAVE, bos)
    val Some((ch, rate, frames, meanAbs)) = Multimodal.decodeWav(bos.toByteArray)
    assert(ch == 1 && rate == 8000f && frames == 100L && meanAbs == 1000.0)
    assert(Multimodal.decodeWav("not audio".getBytes).isEmpty)
  }

  test("decodeMedia runs the real decode through the partition seam") {
    import spark.implicits._
    val media = spark.range(5).as[Long].mapPartitions { it =>
      it.map(id => (id, Multimodal.syntheticPng(id, 8, 6)))
    }.toDF("media_id", "content")
    val got = Multimodal.decodeMedia(media).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2), r.getInt(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap
    (0L until 5L).foreach { id =>
      assert(got(id) == ("png", 8, 6, (id * 7 % 256).toDouble,
        (id * 13 % 256).toDouble, (id * 29 % 256).toDouble), s"id $id: ${got(id)}")
    }
  }

  test("parseMp4 walks real ISO-BMFF boxes: mvhd, tracks, dimensions, handlers") {
    val b = Multimodal.syntheticMp4(durationMs = 2500, w = 320, h = 180,
      withAudio = true)
    val Some(m) = Multimodal.parseMp4(b)
    assert(m.brand == "isom" && m.timescale == 1000 && m.durationMs == 2500)
    assert(m.nTracks == 2 && m.width == 320 && m.height == 180)
    assert(m.hasVideo && m.hasAudio)
    val Some(v) = Multimodal.parseMp4(
      Multimodal.syntheticMp4(100, 64, 36, withAudio = false))
    assert(v.nTracks == 1 && v.hasVideo && !v.hasAudio)
  }

  test("parseMp4 rejects non-MP4 and survives truncated/corrupt boxes") {
    assert(Multimodal.parseMp4(null).isEmpty)
    assert(Multimodal.parseMp4("plainly not a video file".getBytes).isEmpty)
    assert(Multimodal.parseMp4(Multimodal.syntheticPng(1, 4, 4)).isEmpty)
    // truncate mid-moov: the walk stops without throwing
    val whole = Multimodal.syntheticMp4(1000, 32, 18, withAudio = false)
    for (cut <- Seq(17, 40, whole.length / 2))
      Multimodal.parseMp4(whole.take(cut)) // must not throw
  }

  test("describeVideo surfaces container facts per row; non-MP4 rows null out") {
    import spark.implicits._
    val media = spark.range(4).as[Long].mapPartitions { it =>
      it.map { id =>
        val bytes = if (id == 3) "junk".getBytes
          else Multimodal.syntheticMp4((id + 1) * 100, 16, 9, id % 2 == 0)
        (id, bytes)
      }
    }.toDF("media_id", "content")
    val got = Multimodal.describeVideo(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(0L).getLong(2) == 100 && got(0L).getBoolean(7))
    assert(got(1L).getLong(2) == 200 && !got(1L).getBoolean(7))
    assert(got(3L).isNullAt(1) && got(3L).isNullAt(2))
  }

  test("parseExif: both byte orders round-trip; corrupt/absent nulls out") {
    def build(little: Boolean) = Multimodal.syntheticJpegExif(
      6, 4032, 3024, "CamX", "2026:08:14 07:15:00", little)
    for (little <- Seq(true, false)) {
      val m = Multimodal.parseExif(build(little)).get
      assert(m == Multimodal.ExifMeta(6, 4032, 3024, "CamX",
        "2026:08:14 07:15:00"), s"little=$little -> $m")
    }
    assert(Multimodal.parseExif(null).isEmpty)
    assert(Multimodal.parseExif("nope".getBytes).isEmpty)
    // JPEG without an APP1 segment (straight to EOI)
    assert(Multimodal.parseExif(Array(0xFF, 0xD8, 0xFF, 0xD9)
      .map(_.toByte)).isEmpty)
    // truncated mid-TIFF: parser must not throw
    val t = build(little = true)
    assert(Multimodal.parseExif(t.take(t.length / 2)).isEmpty)
  }

  /** Build a PNG from an explicit 9x8 grid of gray values. */
  private def gridPng(v: (Int, Int) => Int, w: Int = 9, h: Int = 8): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val g = v(x, y) & 0xFF
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("dHash: hand-computed gradient bits; brightness shift is invariant") {
    // left half dark, right half bright: bit set only at the x=3->4 step
    val step = gridPng((x, _) => if (x <= 3) 40 else 200)
    val h = Multimodal.dHash64(step).get
    val expected = (0 until 8).foldLeft(0L)((acc, y) => acc | (1L << (y * 8 + 3)))
    assert(h == expected, s"got ${h.toBinaryString}")
    // +25 on every pixel: gradient SIGNS unchanged -> identical hash
    val brighter = gridPng((x, _) => (if (x <= 3) 40 else 200) + 25)
    assert(Multimodal.dHash64(brighter).get == h)
    assert(Multimodal.dHash64(null).isEmpty)
    assert(Multimodal.dHash64("not an image".getBytes).isEmpty)
  }

  test("dHash: integer pixel-doubling survives the box-filter downsample") {
    def v(x: Int, y: Int) = ((x * 37 + y * 91 + 13) * 53) % 256
    val small = gridPng(v)
    val doubled = gridPng((x, y) => v(x / 2, y / 2), w = 18, h = 16)
    assert(Multimodal.dHash64(small).get == Multimodal.dHash64(doubled).get,
      "2x upscale must hash identically (exact box-filter means)")
  }

  test("phashPairs: planted near-dups found, rotation is NOT a near-dup") {
    import spark.implicits._
    def v(x: Int, y: Int) = ((x * 29 + y * 67 + 7) * 41 + x * y * 3) % 256
    val base = gridPng(v)
    // one perturbed cell — a near-dup; 90-degree rotation — not one
    val nearDup = gridPng((x, y) => if (x == 5 && y == 2) 255 - v(x, y) else v(x, y))
    val rotated = gridPng((x, y) => v(y % 9, x % 8), w = 8, h = 9)
    val media = Seq((0L, base), (1L, nearDup), (2L, rotated))
      .toDF("media_id", "content")
    val pairs = Multimodal.phashPairs(media, maxDist = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.contains((0L, 1L)), s"planted near-dup missed: $pairs")
    assert(pairs((0L, 1L)) <= 2L, "one cell touches at most two gradient bits")
    assert(!pairs.contains((0L, 2L)) && !pairs.contains((1L, 2L)),
      s"rotation must not band as a near-dup: $pairs")
    // undecodable rows drop out of the signature frame, not into pairs
    val withJunk = media.unionByName(
      Seq((3L, "junk".getBytes)).toDF("media_id", "content"))
    assert(Multimodal.phashSignatures(withJunk).count() == 3)
  }

  test("phashDedup: planted triangles collapse to one canonical image each") {
    import spark.implicits._
    val media = spark.range(60).as[Long].mapPartitions { it =>
      it.map(id => (id, Multimodal.syntheticGridPng(id)))
    }.toDF("media_id", "content").repartition(9)
    val out = Multimodal.phashDedup(media, maxDist = 8).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out.size == 60)
    for (i <- 0L until 10L) {
      assert(out(i) == (i, true), s"base $i: ${out(i)}")
      assert(out(i + 40) == (i, false), s"dup ${i + 40}: ${out(i + 40)}")
      assert(out(i + 50) == (i, false), s"dup ${i + 50}: ${out(i + 50)}")
    }
    for (i <- 10L until 40L)
      assert(out(i) == (i, true), s"singleton $i: ${out(i)}")
    assert(out.values.count(_._2) == 40, "10 cluster canonicals + 30 singletons")
  }

  test("audioFingerprint64: gradient bits hand-check, gain invariance, " +
    "real-WAV interop, junk rejection") {
    // synthesized WAV parses with the JDK audio stack too (honest RIFF)
    val wav = Multimodal.syntheticWav(3L)
    val jdk = Multimodal.decodeWav(wav)
    assert(jdk.exists(m => m._1 == 1 && m._2 == 8000f),
      s"syntheticWav must be a real mono 8kHz WAV, got $jdk")
    val fp = Multimodal.audioFingerprint64(wav).get
    // replay the amplitude rule: bit f = amp(f+1) > amp(f)
    def amp(f: Int) = ((3 * 41 + f * 13 + 3) * (f * 7 + 11)) % 1000
    val expected = (0 until 64).foldLeft(0L)((acc, f) =>
      if (amp(f + 1) > amp(f)) acc | (1L << f) else acc)
    assert(fp == expected, s"got ${fp.toBinaryString}")
    // uniform gain: tripling every sample preserves every energy gradient
    val louder = wav.clone()
    var o = 44
    while (o + 1 < louder.length) {
      val s = ((louder(o) & 0xFF) | (louder(o + 1).toInt << 8)).toShort
      val t = (s * 3).toShort
      louder(o) = (t & 0xFF).toByte
      louder(o + 1) = ((t >> 8) & 0xFF).toByte
      o += 2
    }
    assert(Multimodal.audioFingerprint64(louder).get == fp,
      "gain change must not move the fingerprint")
    assert(Multimodal.audioFingerprint64(null).isEmpty)
    assert(Multimodal.audioFingerprint64("RIFFjunk".getBytes).isEmpty)
    // a PNG is not audio
    assert(Multimodal.audioFingerprint64(Multimodal.syntheticPng(1, 8, 6)).isEmpty)
    // too short for 65 frames
    assert(Multimodal.audioFingerprint64(wav.take(44 + 60)).isEmpty)
  }

  test("video near-dup (mm11): planted edit pairs at 5/9, reordered cut " +
    "does not pair, padding/short/undecodable frames handled") {
    import spark.implicits._
    import graft.queries.MultimodalQueries.mm11Pid
    val frames = (for { v <- 0L until 30L; f <- 0 until 8 }
      yield (v, f.toLong, Multimodal.patternPng(mm11Pid(v, f))))
      .toDF("media_id", "frame_idx", "frame_bytes")
    val pairs = Multimodal.videoNearDupPairs(frames, window = 2, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // exactly the 5 planted one-frame edits; jaccard = 5 shared of 9 union
    assert(pairs.map(p => (p._1, p._2)).toSet ==
      (0L until 5L).map(v => (v, v + 20)).toSet, pairs.mkString(","))
    pairs.foreach(p => assert(math.abs(p._3 - 5.0 / 9.0) < 1e-9, p.toString))
    // the reordered re-cuts (25..29) share every frame HASH with 0..4 —
    // a set-level fingerprint would pair them; ordered shingles must not
    assert(!pairs.exists(p => p._1 >= 25 || p._2 >= 25))
    // a zero-padded frame block (the packed-container slice) decodes to
    // the same dHash as the raw PNG — the mm11 query's framing contract
    val png = Multimodal.patternPng(7L)
    assert(Multimodal.dHash64(java.util.Arrays.copyOf(png, 512)) ==
      Multimodal.dHash64(png))
    // a video shorter than the window emits no shingles (cannot pair)
    val short = Seq((99L, 0L, png)).toDF("media_id", "frame_idx", "frame_bytes")
    assert(Multimodal.videoShingles(short, window = 2).count() == 0)
    // an undecodable frame drops out; the remaining ORDERED sequence
    // still shingles (frames 0,2 become adjacent)
    val holed = Seq(
      (7L, 0L, Multimodal.patternPng(100L)),
      (7L, 1L, Array[Byte](1, 2, 3)),
      (7L, 2L, Multimodal.patternPng(101L)))
      .toDF("media_id", "frame_idx", "frame_bytes")
    assert(Multimodal.videoShingles(holed, window = 2).count() == 1)
  }

  test("audioFingerprint64: adversarial chunk sizes terminate (r11 ADVICE)") {
    // a junk chunk whose LE32 size is 0xFFFFFFF8 used to wrap negative
    // and advance the RIFF walk by 0/negative -> infinite loop
    def riff(chunks: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write("RIFF".getBytes("US-ASCII"))
      val total = 4 + chunks.length
      out.write(Array[Byte](total.toByte, (total >> 8).toByte,
        (total >> 16).toByte, (total >> 24).toByte))
      out.write("WAVE".getBytes("US-ASCII"))
      out.write(chunks)
      out.toByteArray
    }
    def chunk(id: String, szLe: Long, body: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(id.getBytes("US-ASCII"))
      out.write(Array[Byte](szLe.toByte, (szLe >> 8).toByte,
        (szLe >> 16).toByte, (szLe >> 24).toByte))
      out.write(body)
      out.toByteArray
    }
    val pad = new Array[Byte](200)
    // size wraps to a negative Int (would advance pos by ~0)
    assert(Multimodal.audioFingerprint64(
      riff(chunk("junk", 0xFFFFFFF8L, pad))).isEmpty)
    // size 0 on a junk chunk: strictly-increasing pos still terminates
    // (advance is 8), and the walk reaches nothing valid after it
    assert(Multimodal.audioFingerprint64(
      riff(chunk("junk", 0L, Array.empty) ++ chunk("junk", 0L, pad))).isEmpty)
    // size larger than the buffer: rejected, not walked past the end
    assert(Multimodal.audioFingerprint64(
      riff(chunk("junk", 1000000L, pad))).isEmpty)
    // a valid WAV preceded by a max-size junk chunk is rejected loudly
    // (malformed) rather than hanging
    val good = Multimodal.syntheticWav(3L)
    val tail = java.util.Arrays.copyOfRange(good, 12, good.length)
    assert(Multimodal.audioFingerprint64(
      riff(chunk("junk", 0xFFFFFFFFL, pad) ++ tail)).isEmpty)
  }

  test("aHash: solid image is degenerate-stable, contrast pattern splits") {
    // solid color: every cell equals the mean -> all bits set
    assert(Multimodal.aHash64(gridPng((_, _) => 77)).get == -1L)
    // half dark / half bright: exactly the bright half at/above mean
    val split = Multimodal.aHash64(
      gridPng((x, _) => if (x < 4) 0 else 200, w = 8, h = 8)).get
    assert(java.lang.Long.bitCount(split) == 32)
  }
}
