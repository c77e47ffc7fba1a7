package graft.multimodal

/** Zero-dependency video CONTAINER header parsers — MP4/ISO-BMFF box
  * structure and Matroska/WebM EBML structure — extracting the typed
  * metadata a multimodal training pipeline filters on (duration,
  * codec id, dimensions, track count) without decoding a single
  * frame. Frame decode itself stays behind the clearly-marked stub in
  * [[Multimodal]] (this container ships no codec); container
  * STRUCTURE is plain big-endian arithmetic over the payload bytes.
  *
  * Both parsers are defensive by construction: every length is
  * bounds-checked against the payload, child walks cannot advance
  * backwards (a zero/negative box size in a crafted payload would
  * loop forever), and any structural violation returns None — the
  * caller falls back to the byte-statistics stub exactly like an
  * undecodable image. References: ISO/IEC 14496-12 box layout
  * (`ftyp`/`moov`/`mvhd`/`trak`/`tkhd`/`stsd`), RFC 8794 (EBML) and
  * the Matroska element registry for the IDs used here.
  */
object VideoContainers {

  /** Typed container metadata. `durationS` NaN when the container
    * declares none; `codec` empty when no sample description is
    * present; width/height 0 for audio-only files. */
  case class VideoMeta(container: String, durationS: Double,
      codec: String, width: Int, height: Int, nTracks: Int)

  /** Parse a video container header: MP4 family first (magic at a
    * fixed offset), then EBML, then RIFF/AVI. None when the bytes are
    * none of the three. */
  def parse(bytes: Array[Byte]): Option[VideoMeta] = {
    if (bytes == null || bytes.length < 8) None
    else if (bytes.length >= 12 && fourcc(bytes, 4) == "ftyp")
      parseMp4(bytes)
    else if (u32(bytes, 0) == 0x1a45dfa3L) parseEbml(bytes)
    else if (bytes.length >= 12 && fourcc(bytes, 0) == "RIFF" &&
      fourcc(bytes, 8) == "AVI ") parseAvi(bytes)
    else None
  }

  // ---------------------------------------------------------- MP4

  private def u32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  private def u64(b: Array[Byte], o: Int): Long =
    (u32(b, o) << 32) | u32(b, o + 4)
  private def fourcc(b: Array[Byte], o: Int): String =
    new String(Array(b(o), b(o + 1), b(o + 2), b(o + 3)),
      java.nio.charset.StandardCharsets.US_ASCII)

  /** Child box ranges of [start, end): (type, payloadStart, payloadEnd).
    * Malformed sizes (overrunning, or too small to make progress)
    * terminate the walk rather than throw or loop. */
  private def boxes(b: Array[Byte], start: Int,
      end: Int): List[(String, Int, Int)] = {
    var o = start
    val out = List.newBuilder[(String, Int, Int)]
    while (o + 8 <= end) {
      val size0 = u32(b, o)
      val typ = fourcc(b, o + 4)
      // size 1 → 64-bit largesize follows; size 0 → to end of enclosing
      val (payload, boxEnd) =
        if (size0 == 1L && o + 16 <= end) (o + 16L, o + u64(b, o + 8))
        else if (size0 == 0L) (o + 8L, end.toLong)
        else (o + 8L, o + size0)
      if (boxEnd <= o || boxEnd > end || payload > boxEnd) return out.result()
      out += ((typ, payload.toInt, boxEnd.toInt))
      o = boxEnd.toInt
    }
    out.result()
  }

  private def findBox(b: Array[Byte], start: Int, end: Int,
      typ: String): Option[(Int, Int)] =
    boxes(b, start, end).collectFirst { case (`typ`, s, e) => (s, e) }

  private def parseMp4(b: Array[Byte]): Option[VideoMeta] = {
    val brand = fourcc(b, 8)
    for ((moovS, moovE) <- findBox(b, 0, b.length, "moov")) yield {
      // mvhd: FullBox; v1 widens ctime/mtime/duration to 64-bit
      val duration = findBox(b, moovS, moovE, "mvhd").collect {
        case (s, e) if e - s >= 20 =>
          val v = b(s) & 0xff
          if (v == 1 && e - s >= 28 + 4)
            u64(b, s + 24).toDouble / u32(b, s + 20).max(1L)
          else u32(b, s + 16).toDouble / u32(b, s + 12).max(1L)
      }.getOrElse(Double.NaN)
      val traks = boxes(b, moovS, moovE).filter(_._1 == "trak")
      // tkhd width/height are 16.16 fixed at the end of the box; a
      // video track is one with nonzero dimensions
      def dims(trakS: Int, trakE: Int): (Int, Int) =
        findBox(b, trakS, trakE, "tkhd").collect {
          case (s, e) if e - s >= 8 =>
            ((u32(b, e - 8) >> 16).toInt, (u32(b, e - 4) >> 16).toInt)
        }.getOrElse((0, 0))
      // stsd's first sample-entry fourcc is the codec id
      def codecOf(trakS: Int, trakE: Int): Option[String] =
        for {
          (mdS, mdE) <- findBox(b, trakS, trakE, "mdia")
          (mnS, mnE) <- findBox(b, mdS, mdE, "minf")
          (sbS, sbE) <- findBox(b, mnS, mnE, "stbl")
          (sdS, sdE) <- findBox(b, sbS, sbE, "stsd")
          if sdE - sdS >= 16 && u32(b, sdS + 4) >= 1L
        } yield fourcc(b, sdS + 12)
      val video = traks.find(t => dims(t._2, t._3) != ((0, 0)))
      val (w, h) = video.map(t => dims(t._2, t._3)).getOrElse((0, 0))
      val codec = video.orElse(traks.headOption)
        .flatMap(t => codecOf(t._2, t._3)).getOrElse("")
      VideoMeta(s"mp4/$brand".trim, duration, codec, w, h, traks.length)
    }
  }

  // ------------------------------------------------------ RIFF/AVI

  private def u32le(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  /** RIFF chunk ranges of [start, end): (fcc, payloadStart,
    * payloadEnd). Little-endian sizes, odd sizes padded to even;
    * malformed sizes terminate the walk (same defensive contract as
    * [[boxes]]). */
  private def riffChunks(b: Array[Byte], start: Int,
      end: Int): List[(String, Int, Int)] = {
    var o = start
    val out = List.newBuilder[(String, Int, Int)]
    while (o + 8 <= end) {
      val fcc = fourcc(b, o)
      val sz = u32le(b, o + 4)
      val pEnd = o + 8 + sz
      if (pEnd < o + 8 || pEnd > end) return out.result()
      out += ((fcc, o + 8, pEnd.toInt))
      o = (pEnd + (sz & 1L)).toInt // chunks are word-aligned
    }
    out.result()
  }

  /** LIST-typed RIFF children: (listType, payloadStart, payloadEnd)
    * with the 4-byte list type already consumed. */
  private def riffLists(b: Array[Byte], start: Int,
      end: Int): List[(String, Int, Int)] =
    riffChunks(b, start, end).collect {
      case ("LIST", s, e) if e - s >= 4 => (fourcc(b, s), s + 4, e)
    }

  /** AVI (ISO-agnostic RIFF, AVI 1.0 'avih'/'strl' layout): duration
    * is totalFrames × µsPerFrame from the main header; the codec is
    * the video stream's fccHandler; streams are counted from 'strl'
    * lists like MP4 'trak's. */
  private def parseAvi(b: Array[Byte]): Option[VideoMeta] =
    for {
      (hdrlS, hdrlE) <- riffLists(b, 12, b.length)
        .collectFirst { case ("hdrl", s, e) => (s, e) }
      (avihS, avihE) <- riffChunks(b, hdrlS, hdrlE)
        .collectFirst { case ("avih", s, e) if e - s >= 40 => (s, e) }
    } yield {
      val usPerFrame = u32le(b, avihS)
      val totalFrames = u32le(b, avihS + 16)
      val w = u32le(b, avihS + 32).toInt
      val h = u32le(b, avihS + 36).toInt
      val durationS =
        if (usPerFrame > 0 && totalFrames > 0)
          totalFrames.toDouble * usPerFrame / 1e6
        else Double.NaN
      val strls = riffLists(b, hdrlS, hdrlE)
        .collect { case ("strl", s, e) => (s, e) }
      def strh(s: Int, e: Int): Option[(String, String)] =
        riffChunks(b, s, e).collectFirst {
          case ("strh", hs, he) if he - hs >= 8 =>
            (fourcc(b, hs), fourcc(b, hs + 4))
        }
      val headers = strls.flatMap { case (s, e) => strh(s, e) }
      val codec = headers.collectFirst { case ("vids", handler) => handler }
        .orElse(headers.headOption.map(_._2)).getOrElse("")
      VideoMeta("avi", durationS, codec.trim, w, h, strls.length)
    }

  /** The video frame payloads of an AVI 'movi' list: the `##dc`
    * / `##db` chunks in stream order. For an MJPEG AVI each payload
    * is a standalone baseline JPEG — the one video codec a
    * zero-dependency JVM can decode ([[javax.imageio.ImageIO]]).
    * None when the bytes aren't an AVI; Some(empty) when the AVI has
    * no movi list or no frame chunks. */
  def aviFrames(b: Array[Byte]): Option[Vector[Array[Byte]]] = {
    if (b == null || b.length < 12 || fourcc(b, 0) != "RIFF" ||
      fourcc(b, 8) != "AVI ") return None
    val frames = for {
      (lt, s, e) <- riffLists(b, 12, b.length)
      if lt == "movi"
      (fcc, cs, ce) <- riffChunks(b, s, e)
      if fcc.length == 4 && fcc(0).isDigit && fcc(1).isDigit &&
        fcc(2) == 'd' && (fcc(3) == 'c' || fcc(3) == 'b')
    } yield java.util.Arrays.copyOfRange(b, cs, ce)
    Some(frames.toVector)
  }

  // ---------------------------------------------------------- EBML

  /** EBML variable-length integer at `o`: (value, bytesRead). For IDs
    * the marker bit is KEPT (`keepMarker`, matching how the Matroska
    * registry lists IDs); for sizes it is stripped. None on truncation
    * or a reserved zero first byte. */
  private def vint(b: Array[Byte], o: Int,
      keepMarker: Boolean): Option[(Long, Int)] = {
    if (o >= b.length) return None
    val first = b(o) & 0xff
    if (first == 0) return None
    val len = java.lang.Integer.numberOfLeadingZeros(first) - 23
    if (len < 1 || len > 8 || o + len > b.length) return None
    var v: Long =
      if (keepMarker) first.toLong
      else first.toLong & ((1 << (8 - len)) - 1)
    var i = 1
    while (i < len) {
      v = (v << 8) | (b(o + i) & 0xffL)
      i += 1
    }
    Some((v, len))
  }

  /** Child element ranges of [start, end):
    * (id, payloadStart, payloadEnd). An unknown-size element (all size
    * bits set — legal for Segment) extends to `end`. */
  private def elements(b: Array[Byte], start: Int,
      end: Int): List[(Long, Int, Int)] = {
    var o = start
    val out = List.newBuilder[(Long, Int, Int)]
    while (o < end) {
      val parsed = for {
        (id, idLen) <- vint(b, o, keepMarker = true)
        (size, szLen) <- vint(b, o + idLen, keepMarker = false)
      } yield {
        val payload = o + idLen + szLen
        val unknownSize = size == (1L << (7 * szLen)) - 1
        val pEnd = if (unknownSize) end.toLong else payload + size
        (id, payload, pEnd)
      }
      parsed match {
        case Some((id, p, pe)) if pe >= p && pe <= end =>
          out += ((id, p, pe.toInt))
          o = pe.toInt
        case _ => return out.result()
      }
    }
    out.result()
  }

  private def findEl(b: Array[Byte], start: Int, end: Int,
      id: Long): Option[(Int, Int)] =
    elements(b, start, end).collectFirst { case (`id`, s, e) => (s, e) }

  private def uintEl(b: Array[Byte], s: Int, e: Int): Long = {
    var v = 0L
    var i = s
    while (i < e && i - s < 8) { v = (v << 8) | (b(i) & 0xffL); i += 1 }
    v
  }
  private def floatEl(b: Array[Byte], s: Int, e: Int): Double =
    if (e - s == 4)
      java.lang.Float.intBitsToFloat(u32(b, s).toInt).toDouble
    else if (e - s == 8) java.lang.Double.longBitsToDouble(u64(b, s))
    else Double.NaN
  private def strEl(b: Array[Byte], s: Int, e: Int): String =
    new String(b, s, e - s, java.nio.charset.StandardCharsets.US_ASCII)
      .takeWhile(_ != '\u0000')

  // Matroska element IDs (registry values, marker bit kept)
  private val IdEbml = 0x1a45dfa3L
  private val IdDocType = 0x4282L
  private val IdSegment = 0x18538067L
  private val IdInfo = 0x1549a966L
  private val IdTimestampScale = 0x2ad7b1L
  private val IdDuration = 0x4489L
  private val IdTracks = 0x1654ae6bL
  private val IdTrackEntry = 0xaeL
  private val IdTrackType = 0x83L
  private val IdCodecId = 0x86L
  private val IdVideo = 0xe0L
  private val IdPixelWidth = 0xb0L
  private val IdPixelHeight = 0xbaL

  private def parseEbml(b: Array[Byte]): Option[VideoMeta] =
    for {
      (hS, hE) <- findEl(b, 0, b.length, IdEbml)
      (segS, segE) <- findEl(b, hE, b.length, IdSegment)
    } yield {
      val docType = findEl(b, hS, hE, IdDocType)
        .map { case (s, e) => strEl(b, s, e) }.getOrElse("matroska")
      // duration is stored in TimestampScale units (ns per tick,
      // default 1_000_000 → milliseconds)
      val durationS = findEl(b, segS, segE, IdInfo).map { case (s, e) =>
        val scale = findEl(b, s, e, IdTimestampScale)
          .map { case (ts, te) => uintEl(b, ts, te) }.getOrElse(1000000L)
        findEl(b, s, e, IdDuration)
          .map { case (ds, de) => floatEl(b, ds, de) * scale / 1e9 }
          .getOrElse(Double.NaN)
      }.getOrElse(Double.NaN)
      val entries = findEl(b, segS, segE, IdTracks).toList
        .flatMap { case (s, e) => elements(b, s, e) }
        .collect { case (IdTrackEntry, s, e) => (s, e) }
      val video = entries.find { case (s, e) =>
        findEl(b, s, e, IdTrackType)
          .exists { case (ts, te) => uintEl(b, ts, te) == 1L } }
      val codec = video.orElse(entries.headOption)
        .flatMap { case (s, e) => findEl(b, s, e, IdCodecId) }
        .map { case (s, e) => strEl(b, s, e) }.getOrElse("")
      val (w, h) = video.flatMap { case (s, e) =>
        findEl(b, s, e, IdVideo) }.map { case (s, e) =>
          (findEl(b, s, e, IdPixelWidth)
            .map { case (ws, we) => uintEl(b, ws, we).toInt }.getOrElse(0),
           findEl(b, s, e, IdPixelHeight)
            .map { case (hs, he) => uintEl(b, hs, he).toInt }.getOrElse(0))
      }.getOrElse((0, 0))
      VideoMeta(docType, durationS, codec, w, h, entries.length)
    }
}
