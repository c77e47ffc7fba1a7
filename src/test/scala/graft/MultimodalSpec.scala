package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{MediaMeta, MediaRow}

/** Multimodal plumbing: binary payloads, typed metadata, partition-
  * batched decode, metadata transforms, frame fan-out. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  def media = Seq(
    MediaRow(1, "image", "hello world".getBytes("UTF-8"),
      MediaMeta("png", 64, 48, 3, 0, 1)),
    MediaRow(2, "video", "frame data bytes".getBytes("UTF-8"),
      MediaMeta("mp4", 320, 240, 3, 0, 9)),
    MediaRow(3, "audio", Array[Byte](), MediaMeta("wav", 0, 0, 1, 16000, 1)))

  test("feature extraction is deterministic and schema-typed") {
    val f = Multimodal.extractFeatures(media.toDS()).orderBy("media_id")
      .collect()
    assert(f(0).n_bytes == 11)
    assert(f(0).checksum ==
      "5eb63bbbe01eeed093cb22bb8f5acdc3") // md5("hello world")
    assert(f(0).features.length == 8)
    assert(f(2).features.forall(_ == 0f)) // empty payload
    // determinism: second run bit-identical
    val f2 = Multimodal.extractFeatures(media.toDS()).orderBy("media_id")
      .collect()
    assert(f.zip(f2).forall { case (a, b) =>
      a.features.sameElements(b.features) })
  }

  /** Encode a solid-color PNG in memory — real bytes, no fixtures. */
  private def pngBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("real PNG bytes round-trip through the partition-batch decode") {
    val red = pngBytes(6, 4, 0xff0000)
    val gray = pngBytes(3, 3, 0x808080)
    val rows = Seq(
      MediaRow(10, "image", red, MediaMeta("png", 6, 4, 3, 0, 1)),
      MediaRow(11, "image", gray, MediaMeta("png", 3, 3, 3, 0, 1)),
      // an "image" payload no reader understands falls back to the stub
      MediaRow(12, "image", "not an image".getBytes("UTF-8"),
        MediaMeta("png", 1, 1, 3, 0, 1)))
    val f = Multimodal.extractFeatures(rows.toDS()).orderBy("media_id")
      .collect()
    // pure red 6x4: dims, meanR=1, meanG=meanB=0, luma=0.299
    val fr = f(0).features
    assert(fr(0) == 6 / 4096f && fr(1) == 4 / 4096f)
    assert(fr(3) == 1f && fr(4) == 0f && fr(5) == 0f)
    assert(math.abs(fr(6) - 0.299f) < 1e-4)
    // mid-gray 3x3: all channels 128/255
    val fg = f(1).features
    assert(math.abs(fg(3) - 128 / 255f) < 1e-4)
    assert(fg(3) == fg(4) && fg(4) == fg(5))
    // undecodable bytes: identical to the stub digest
    assert(f(2).features.sameElements(
      Multimodal.fakeDecode("not an image".getBytes("UTF-8"))))
    // decode is deterministic: re-encoding the same pixels yields the
    // same features
    val again = Multimodal.extractFeatures(
      Seq(MediaRow(10, "image", pngBytes(6, 4, 0xff0000),
        MediaMeta("png", 6, 4, 3, 0, 1))).toDS()).collect()(0)
    assert(again.features.sameElements(fr))
  }

  /** Grayscale image whose pixel at (x, y) is `f(x, y)` — built
    * directly (aHash64 unit tests) or PNG-encoded (pipeline tests). */
  private def grayImg(w: Int, h: Int)(f: (Int, Int) => Int) = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val r = img.getRaster
    for (y <- 0 until h; x <- 0 until w) r.setSample(x, y, 0, f(x, y))
    img
  }

  private def pngOf(img: java.awt.image.BufferedImage): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("aHash64: half-split image sets exactly the bright nibbles") {
    // left half 40, right half 200: every row's right 4 cells exceed
    // the mean -> per-row byte 0x0F
    val img = grayImg(16, 16)((x, _) => if (x < 8) 40 else 200)
    assert(Multimodal.aHash64(img) === 0x0F0F0F0F0F0F0F0FL)
  }

  test("aHash64 is resolution- and color-model-invariant for the " +
      "same content") {
    def half(w: Int, h: Int) =
      grayImg(w, h)((x, _) => if (x * 2 < w) 40 else 200)
    val base = Multimodal.aHash64(half(16, 16))
    assert(Multimodal.aHash64(half(64, 32)) === base)
    assert(Multimodal.aHash64(half(8, 40)) === base)
    // same gray content through the RGB luma path
    val rgb = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16) {
      val v = if (x < 8) 40 else 200
      rgb.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    assert(Multimodal.aHash64(rgb) === base)
  }

  test("aHash64: flat image has no cell above the mean -> hash 0") {
    assert(Multimodal.aHash64(grayImg(24, 24)((_, _) => 128)) === 0L)
  }

  test("imageAHashes decodes real PNG bytes; undecodable -> null row") {
    val a = pngOf(grayImg(32, 32)((x, _) => if (x < 16) 40 else 200))
    val got = Multimodal.imageAHashes(
        Seq((1L, a), (2L, "not an image".getBytes("UTF-8")))
          .toDF("media_id", "content"))
      .orderBy("media_id")
      .as[(Long, Option[Int], Option[Int], Option[Long])].collect()
    assert(got(0) === ((1L, Some(32), Some(32),
      Some(0x0F0F0F0F0F0F0F0FL))))
    assert(got(1) === ((2L, None, None, None)))
  }

  test("hamming64NearDups matches brute force exactly at <= 3") {
    import graft.analytics.Dedup
    // deterministic spread plus implanted near pairs at 1/2/3 bits
    val base = (1 to 40).map(i => i.toLong * 0x9E3779B97F4A7C15L)
    val hs = (base :+ (base(0) ^ 1L) :+
      (base(5) ^ (1L << 63) ^ (1L << 2)) :+
      (base(9) ^ (1L << 40) ^ (1L << 23) ^ 1L)).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }
    val want = (for {
      (ia, va) <- hs; (ib, vb) <- hs
      if ia < ib && java.lang.Long.bitCount(va ^ vb) <= 3
    } yield (ia, ib, java.lang.Long.bitCount(va ^ vb))).toSet
    // a null fingerprint (undecodable image) must pair with nothing
    val withNull = hs.map { case (i, v) => (i, Option(v)) } :+
      ((99L, Option.empty[Long]))
    val got = Dedup.hamming64NearDups(
        withNull.toDF("id", "h"), "id", "h")
      .as[(Long, Long, Int)].collect().toSet
    assert(got === want && want.size >= 3)
  }
  private def wavBytes(sampleRate: Float,
      samples: Array[Short]): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(sampleRate, 16, 1, true, false)
    val raw = new Array[Byte](samples.length * 2)
    for (i <- samples.indices) {
      raw(2 * i) = (samples(i) & 0xff).toByte
      raw(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
    }
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, samples.length)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("audioHash64: half-quiet half-loud clip sets the low 32 bits") {
    // cells 0..31 amplitude 1024, cells 32..63 amplitude 20480
    val s = Array.tabulate(6400)(i =>
      (if (i < 3200) 1024 else 20480).toShort)
    val floats = s.map(v => v / 32768f)
    assert(Multimodal.audioHash64(floats) === 0x00000000FFFFFFFFL)
  }

  test("audioHash64 is duration- and sign-invariant for the same " +
      "content") {
    def clip(n: Int) = Array.tabulate(n) { i =>
      val a = if (64 * i / n < 32) 1024 else 20480
      (if (i % 2 == 0) a else -a) / 32768f
    }
    val base = Multimodal.audioHash64(clip(6400))
    assert(Multimodal.audioHash64(clip(12800)) === base)
    assert(Multimodal.audioHash64(clip(640)) === base)
  }

  test("audioHash64: flat amplitude hashes to 0, empty to 0") {
    assert(Multimodal.audioHash64(
      Array.fill(640)(0.25f)) === 0L)
    assert(Multimodal.audioHash64(Array.empty[Float]) === 0L)
  }

  test("audioHashes decodes real WAV bytes; undecodable -> null row") {
    val s = Array.tabulate(6400)(i =>
      (if (i < 3200) 1024 else 20480).toShort)
    val got = Multimodal.audioHashes(
        Seq((1L, wavBytes(8000f, s)),
          (2L, "not audio".getBytes("UTF-8")))
          .toDF("media_id", "content"))
      .orderBy("media_id")
      .as[(Long, Option[Long], Option[Long])].collect()
    assert(got(0) === ((1L, Some(6400L), Some(0x00000000FFFFFFFFL))))
    assert(got(1) === ((2L, None, None)))
  }

  test("real WAV bytes round-trip through the partition-batch decode") {
    // half-amplitude square wave: every statistic has a closed form
    val square = Array.tabulate(800)(i =>
      if (i % 2 == 0) (16384: Short) else (-16384: Short))
    val wav = wavBytes(8000f, square)
    val decoded = Multimodal.decodeAudio(wav)
    assert(decoded.isDefined)
    val (fmt, pcm) = decoded.get
    assert(fmt.getSampleRate == 8000f && fmt.getChannels == 1 &&
      fmt.getSampleSizeInBits == 16)
    assert(pcm.length == 800)
    assert(pcm.forall(s => math.abs(s) == 0.5f))
    val rows = Seq(
      MediaRow(30, "audio", wav, MediaMeta("wav", 0, 0, 1, 8000, 1)),
      // an "audio" payload JavaSound cannot parse falls back to the stub
      MediaRow(31, "audio", "not audio".getBytes("UTF-8"),
        MediaMeta("wav", 0, 0, 1, 0, 1)))
    val f = Multimodal.extractFeatures(rows.toDS()).orderBy("media_id")
      .collect()
    val fa = f(0).features
    assert(fa(0) == 8000 / 48000f)            // sample rate
    assert(fa(1) == 0.25f && fa(2) == 0.5f)   // mono, 16-bit
    assert(math.abs(fa(4) - 0.5f) < 1e-6)     // mean |amplitude|
    assert(math.abs(fa(5) - 0.5f) < 1e-6)     // RMS
    assert(math.abs(fa(6) - 799 / 800f) < 1e-6) // zero-crossing rate
    assert(fa(7) == 0.5f)                     // peak
    assert(f(1).features.sameElements(
      Multimodal.fakeDecode("not audio".getBytes("UTF-8"))))
    // deterministic: re-encoding the same samples yields the same vector
    val again = Multimodal.extractFeatures(Seq(MediaRow(30, "audio",
      wavBytes(8000f, square), MediaMeta("wav", 0, 0, 1, 8000, 1)))
      .toDS()).collect()(0)
    assert(again.features.sameElements(fa))
  }

  test("an oversized declared audio frame count is rejected before " +
      "sample allocation") {
    // hand-build a WAV header declaring ~2^31 frames with no data
    val bos = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(bos)
    def le32(v: Int): Unit = { d.write(v); d.write(v >> 8)
      d.write(v >> 16); d.write(v >> 24) }
    def le16(v: Int): Unit = { d.write(v); d.write(v >> 8) }
    d.writeBytes("RIFF"); le32(0x7ffffff0); d.writeBytes("WAVE")
    d.writeBytes("fmt "); le32(16); le16(1); le16(1)
    le32(8000); le32(16000); le16(2); le16(16)
    d.writeBytes("data"); le32(0x7ffffff0)
    assert(Multimodal.decodeAudio(bos.toByteArray).isEmpty)
  }

  /** A valid PNG signature + IHDR (correct CRC) declaring huge
    * dimensions, with no pixel data — the classic few-bytes
    * decompression-bomb header. */
  private def bombPng(w: Int, h: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt,
      0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    val data = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8.toByte).put(2.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    val typeAndData = "IHDR".getBytes("US-ASCII") ++ data
    val crc = new java.util.zip.CRC32()
    crc.update(typeAndData)
    out.write(java.nio.ByteBuffer.allocate(4).putInt(13).array())
    out.write(typeAndData)
    out.write(java.nio.ByteBuffer.allocate(4)
      .putInt(crc.getValue.toInt).array())
    out.toByteArray
  }

  test("a decompression-bomb header is rejected before raster " +
      "allocation and falls back to the stub") {
    val bomb = bombPng(100000, 100000) // 10 Gpx declared in ~33 bytes
    assert(Multimodal.decodeImage(bomb).isEmpty)
    // and through the pipeline: the row degrades to the stub digest,
    // it does not kill the task
    val f = Multimodal.extractFeatures(Seq(
      MediaRow(20, "image", bomb, MediaMeta("png", 0, 0, 3, 0, 1)))
      .toDS()).collect()(0)
    assert(f.features.sameElements(Multimodal.fakeDecode(bomb)))
    // a sane image of the same format still decodes
    assert(Multimodal.decodeImage(pngBytes(2, 2, 0x123456)).isDefined)
  }

  test("resize rewrites metadata only") {
    val r = Multimodal.resize(media.toDF(), 128, 96)
      .filter(col("media_id") === 1)
      .select("meta.width", "meta.height", "meta.format").collect()(0)
    assert(r.getInt(0) == 128 && r.getInt(1) == 96 &&
      r.getString(2) == "png")
  }

  test("frame sampling fans out every stride-th frame of videos only") {
    val frames = Multimodal.sampleFrames(media.toDF(), stride = 4)
      .orderBy("media_id", "frame_idx")
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(frames.toSeq == Seq((2L, 0), (2L, 4), (2L, 8)))
  }

  test("synthesized corpus from documents has valid media schema") {
    val docs = Seq((1L, "abc def", 7L), (2L, "xyz", 3L))
      .toDF("doc_id", "text", "n_chars")
    val m = Multimodal.synthesizeCorpus(docs)
    assert(m.schema("content").dataType ==
      org.apache.spark.sql.types.BinaryType)
    val kinds = m.select("kind").collect().map(_.getString(0)).toSet
    assert(kinds.subsetOf(Set("image", "audio", "video")))
  }

  // ---- video container metadata (MP4 box / Matroska EBML) ----

  private def be32(v: Long): Array[Byte] = Array(
    (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)

  /** ISO-BMFF box: u32 size (incl. 8-byte header) + fourcc + payload. */
  private def mp4Box(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val p = payload.flatten.toArray
    be32(8L + p.length) ++ typ.getBytes("US-ASCII") ++ p
  }

  /** Minimal MP4: ftyp + moov(mvhd v0 + video trak(tkhd 320x240 +
    * mdia/minf/stbl/stsd avc1) + audio trak(tkhd 0x0 + stsd mp4a)). */
  private def mp4Bytes: Array[Byte] = {
    // mvhd v0: v/flags, ctime, mtime, timescale 600, duration 3000 = 5 s
    val mvhd = mp4Box("mvhd", be32(0), be32(0), be32(0), be32(600),
      be32(3000))
    def tkhd(w: Int, h: Int) = mp4Box("tkhd",
      Array.fill(76)(0.toByte), // v/flags..matrix of the v0 layout
      be32(w.toLong << 16), be32(h.toLong << 16))
    def stsdTrak(wh: (Int, Int), codec: String) = mp4Box("trak",
      tkhd(wh._1, wh._2),
      mp4Box("mdia", mp4Box("minf", mp4Box("stbl",
        mp4Box("stsd", be32(0), be32(1), // v/flags, entry_count
          be32(16), codec.getBytes("US-ASCII"), // sample entry header
          Array.fill(8)(0.toByte))))))
    mp4Box("ftyp", "isom".getBytes("US-ASCII"), be32(512)) ++
      mp4Box("moov", mvhd,
        stsdTrak((320, 240), "avc1"), stsdTrak((0, 0), "mp4a"))
  }

  /** EBML element: registry id bytes + 1-byte size vint + payload. */
  private def ebmlEl(id: Array[Byte], payload: Array[Byte]*): Array[Byte] = {
    val p = payload.flatten.toArray
    assert(p.length < 127)
    id ++ Array((0x80 | p.length).toByte) ++ p
  }

  /** Minimal WebM: EBML(DocType webm) + Segment(Info(scale, duration)
    * + Tracks(TrackEntry(type video, V_VP9, 1920x1080))). */
  private def mkvBytes: Array[Byte] = {
    def id(bs: Int*) = bs.map(_.toByte).toArray
    val header = ebmlEl(id(0x1a, 0x45, 0xdf, 0xa3),
      ebmlEl(id(0x42, 0x82), "webm".getBytes("US-ASCII")))
    val info = ebmlEl(id(0x15, 0x49, 0xa9, 0x66),
      ebmlEl(id(0x2a, 0xd7, 0xb1), Array(0x0f.toByte, 0x42.toByte,
        0x40.toByte)), // 1_000_000 ns/tick
      ebmlEl(id(0x44, 0x89), be32( // float32 12345.0 ticks = 12.345 s
        java.lang.Float.floatToIntBits(12345f).toLong & 0xffffffffL)))
    val track = ebmlEl(id(0xae),
      ebmlEl(id(0x83), Array(1.toByte)), // TrackType video
      ebmlEl(id(0x86), "V_VP9".getBytes("US-ASCII")),
      ebmlEl(id(0xe0),
        ebmlEl(id(0xb0), Array(0x07.toByte, 0x80.toByte)), // 1920
        ebmlEl(id(0xba), Array(0x04.toByte, 0x38.toByte)))) // 1080
    val tracks = ebmlEl(id(0x16, 0x54, 0xae, 0x6b), track)
    header ++ ebmlEl(id(0x18, 0x53, 0x80, 0x67), info, tracks)
  }

  test("MP4 box structure round-trips duration/codec/dims/tracks") {
    val m = graft.multimodal.VideoContainers.parse(mp4Bytes).get
    assert(m.container == "mp4/isom")
    assert(m.durationS == 5.0)
    assert(m.codec == "avc1")
    assert(m.width == 320 && m.height == 240)
    assert(m.nTracks == 2) // the audio track counts, dims pick video
  }

  test("Matroska EBML structure round-trips duration/codec/dims/tracks") {
    val m = graft.multimodal.VideoContainers.parse(mkvBytes).get
    assert(m.container == "webm")
    assert(math.abs(m.durationS - 12.345) < 1e-9)
    assert(m.codec == "V_VP9")
    assert(m.width == 1920 && m.height == 1080)
    assert(m.nTracks == 1)
  }

  test("malformed/truncated containers degrade to None, never throw") {
    val vc = graft.multimodal.VideoContainers
    assert(vc.parse(null).isEmpty)
    assert(vc.parse("random text bytes".getBytes("UTF-8")).isEmpty)
    assert(vc.parse(mp4Bytes.take(20)).isEmpty) // ftyp but no moov
    assert(vc.parse(mkvBytes.take(6)).isEmpty)
    // a crafted box whose size overruns the payload ends the walk
    val overrun = mp4Box("ftyp", "isom".getBytes("US-ASCII"), be32(0)) ++
      be32(0xffffffffL) ++ "moov".getBytes("US-ASCII")
    assert(vc.parse(overrun).isEmpty)
  }

  /** The committed cross-language fixture (tools/gen_media_fixture.py):
    * media_id → payload bytes. */
  private lazy val fixtureRows: Map[Long, Array[Byte]] = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/fixtures/media.jsonl"), "UTF-8")
    try src.getLines().map { line =>
      val id = """"media_id": (\d+)""".r.findFirstMatchIn(line)
        .get.group(1).toLong
      val b64 = """"payload_b64": "([^"]*)"""".r.findFirstMatchIn(line)
        .get.group(1)
      id -> java.util.Base64.getDecoder.decode(b64)
    }.toMap
    finally src.close()
  }

  test("AVI RIFF structure round-trips duration/codec/dims/tracks") {
    val m = graft.multimodal.VideoContainers.parse(fixtureRows(9L)).get
    assert(m.container == "avi")
    assert(m.durationS == 0.12) // 3 frames × 40000 µs
    assert(m.codec == "MJPG")
    assert(m.width == 16 && m.height == 16)
    assert(m.nTracks == 1)
    val xvid = graft.multimodal.VideoContainers.parse(fixtureRows(11L)).get
    assert(xvid.codec == "xvid" && xvid.width == 32)
    // malformed: truncation and garbage degrade to None / no frames
    assert(graft.multimodal.VideoContainers
      .parse(fixtureRows(9L).take(16)).isEmpty)
    assert(graft.multimodal.VideoContainers
      .aviFrames("RIFFxxxx".getBytes("US-ASCII")).isEmpty)
  }

  test("MJPEG-in-AVI frames decode to the exact fixture lumas") {
    val vc = graft.multimodal.VideoContainers
    val frames = vc.aviFrames(fixtureRows(9L)).get
    assert(frames.length == 3)
    val lumas = frames.map { fb =>
      val img = Multimodal.decodeImage(fb).get
      val r = img.getRaster
      assert(r.getNumBands == 1, "grayscale JPEG must decode to 1 band")
      var sum = 0L
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
        sum += r.getSample(x, y, 0)
      sum.toDouble / (img.getWidth * img.getHeight)
    }
    // flat DC-only blocks with quant step 8 reconstruct EXACTLY: the
    // means are the generator's closed-form values, no tolerance
    assert(lumas == Vector(96.0, 128.0, 200.0))
    // non-JPEG frame payloads (xvid AVI) are extracted but skip decode
    val xvidFrames = vc.aviFrames(fixtureRows(11L)).get
    assert(xvidFrames.length == 2)
    assert(xvidFrames.forall(Multimodal.decodeImage(_).isEmpty))
  }

  test("videoFrames emits one exact row per decodable MJPEG frame") {
    val media = Seq(
      (9L, "video", fixtureRows(9L)),
      (10L, "video", fixtureRows(10L)),
      (11L, "video", fixtureRows(11L)), // xvid: no decodable frames
      (7L, "video", fixtureRows(7L)))   // garbage: not an AVI
      .toDF("media_id", "kind", "content")
    val rows = Multimodal.videoFrames(media).orderBy("media_id", "frame_idx")
      .collect()
      .map(r => (r.media_id, r.frame_idx, r.width, r.height, r.mean_luma))
    assert(rows.toSeq == Seq(
      (9L, 0, 16, 16, 96.0), (9L, 1, 16, 16, 128.0),
      (9L, 2, 16, 16, 200.0), (10L, 0, 8, 8, 77.0)))
  }

  test("videoFrameAHashes: per-frame fingerprints match the block " +
      "pattern in closed form") {
    val media = Seq(
      (9L, "video", fixtureRows(9L)),   // non-uniform f0, uniform f1/f2
      (12L, "video", fixtureRows(12L)), // checker, inverse, gradient
      (11L, "video", fixtureRows(11L)), // xvid: no decodable frames
      (7L, "video", fixtureRows(7L)))   // garbage: not an AVI
      .toDF("media_id", "kind", "content")
    val rows = Multimodal.videoFrameAHashes(media)
      .orderBy("media_id", "frame_idx").collect()
      .map(r => (r.media_id, r.frame_idx, r.ahash))
    // closed form for block-aligned frames: cell (cy, cx) takes its
    // block's value, bit 63-(cy*8+cx) set iff value > frame mean
    def hashOf(blocks: Seq[Seq[Int]]): Long = {
      val mean = blocks.flatten.sum.toDouble / blocks.flatten.size
      (0 until 64).map { i =>
        val (cy, cx) = (i / 8, i % 8)
        val v = blocks(cy * blocks.size / 8)(cx * blocks.head.size / 8)
        if (v > mean) 1L << (63 - i) else 0L
      }.sum
    }
    assert(rows.length === 6)
    assert(rows(0) === ((9L, 0, hashOf(Seq(Seq(60, 68), Seq(124, 132))))))
    assert(rows(1) === ((9L, 1, 0L))) // uniform: nothing STRICTLY above
    assert(rows(2) === ((9L, 2, 0L)))
    val checker = hashOf(Seq(Seq(10, 200), Seq(200, 10)))
    val inverse = hashOf(Seq(Seq(200, 10), Seq(10, 200)))
    assert(rows(3) === ((12L, 0, checker)))
    assert(rows(4) === ((12L, 1, inverse)))
    // complementary patterns: together they set all 64 bits
    assert((checker | inverse) === -1L && (checker & inverse) === 0L)
    assert(rows(5) === ((12L, 2, hashOf(Seq(Seq(50, 60), Seq(70, 80))))))
  }

  test("videoNearDups: a 2x re-encode pairs at jaccard 1.0") {
    val media = Seq(
      (9L, "video", fixtureRows(9L)),
      (10L, "video", fixtureRows(10L)),
      (12L, "video", fixtureRows(12L)),
      (13L, "video", fixtureRows(13L)), // media 12 at 2x resolution
      (11L, "video", fixtureRows(11L))) // xvid: no frames, no pairs
      .toDF("media_id", "kind", "content")
    val rows = Multimodal.videoNearDups(media)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Double]("jaccard")))
    // the aHash is resolution-invariant for block-constant content,
    // so the re-encoded copy carries the IDENTICAL fingerprint set
    assert(rows.contains((12L, 13L, 1.0)))
    // uniform frames hash 0 on any video — the degenerate overlap
    // surfaces as a LOW-jaccard pair, never as 1.0
    assert(rows.contains((9L, 10L, 0.5)))
    assert(rows.filter { case (a, b, _) => (a, b) != ((12L, 13L)) }
      .forall(_._3 <= 0.5))
  }

  test("videoMetadata yields typed filterable columns; unparseable " +
      "payloads keep all-null metadata rows") {
    val rows = Seq(
      MediaRow(30, "video", mp4Bytes, MediaMeta("mp4", 0, 0, 0, 0, 1)),
      MediaRow(31, "video", mkvBytes, MediaMeta("mkv", 0, 0, 0, 0, 1)),
      MediaRow(32, "video", "not a container".getBytes("UTF-8"),
        MediaMeta("raw", 0, 0, 0, 0, 1)),
      MediaRow(33, "image", mp4Bytes, MediaMeta("mp4", 0, 0, 0, 0, 1)))
    val vm = Multimodal.videoMetadata(rows.toDF()).orderBy("media_id")
      .collect()
    assert(vm.length == 3) // image row excluded
    assert(vm(0).getString(1) == "mp4/isom" && vm(0).getInt(4) == 320)
    assert(vm(1).getString(3) == "V_VP9" && vm(1).getInt(5) == 1080)
    assert(vm(2).isNullAt(1) && vm(2).isNullAt(2) && vm(2).isNullAt(3))
    // and the feature path: parseable video -> header features;
    // unparseable -> byte-statistics stub
    val f = Multimodal.extractFeatures(rows.take(3).toDS())
      .orderBy("media_id").collect()
    val expected = Multimodal.videoFeatures(
      graft.multimodal.VideoContainers.parse(mp4Bytes).get,
      mp4Bytes.length)
    assert(f(0).features.sameElements(expected))
    assert(f(2).features.sameElements(
      Multimodal.fakeDecode("not a container".getBytes("UTF-8"))))
  }
}
