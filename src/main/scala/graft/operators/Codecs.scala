package graft.operators

/** Dependency-free media codecs: binary PGM (netpbm "P5") for images,
  * RIFF/WAVE PCM for audio, and two real video CONTAINER walks —
  * RIFF/AVI and ISO BMFF (mp4). Every container structure here is
  * parsed/emitted honestly to its spec; the one declared boundary is
  * the inner video FRAME codec (custom fourcc `GRFT`/`grft`), which is
  * exactly where an mp4/h264 pipeline hands bytes to a licensed
  * decoder this environment doesn't ship.
  *
  * PGM format (netpbm spec): ASCII header `P5`, whitespace-separated
  * width, height, maxval (≤ 255 here — one byte per pixel), `#`
  * comments allowed between tokens, then a SINGLE whitespace byte
  * followed by the row-major raster.
  *
  * WAV format (RIFF spec): `RIFF` + u32le riff-size + `WAVE`, then a
  * chunk sequence of (4-byte id, u32le size, payload, odd-size pad
  * byte); the `fmt ` chunk declares PCM (format code 1), channel
  * count, sample rate, and bits per sample; the `data` chunk carries
  * the interleaved samples. Unknown chunks (LIST, fact, …) are
  * skipped, as the spec requires.
  *
  * AVI format (RIFF AVI spec): the same chunk grammar with nested
  * LISTs — `RIFF('AVI ')` containing `LIST('hdrl')` (the `avih` main
  * header: µs/frame, total frames, width, height; plus a
  * `LIST('strl')` stream header) and `LIST('movi')` (one `00db`/`00dc`
  * chunk per frame, in order). The CONTAINER walk here is complete and
  * real; the frame STREAM is declared under a custom fourcc (`GRFT`),
  * i.e. the per-frame byte payload is codec-defined — AVI is a
  * container format, and this is the honest boundary: parse the real
  * structure, leave the inner frame codec declared (same stance as an
  * mp4/h264 pipeline whose decoder is a licensed library).
  *
  * MP4 format (ISO BMFF, ISO/IEC 14496-12): a big-endian box tree —
  * u32 size + fourcc, `FullBox`es adding version+flags. [[encodeMp4]]
  * writes `ftyp`, `mdat` (samples back to back), then `moov` whose
  * `stbl` tables index them: `stsd` (sample entry with dims and the
  * codec fourcc), `stts` (timing deltas), `stsc` (sample→chunk runs),
  * `stsz` (sizes), `stco`/`co64` (chunk offsets). [[decodeMp4]] walks
  * the tree and recovers each sample by expanding the stsc runs over
  * the chunk offsets with cumulative sizes — the real demux any
  * box-level tool performs; only the recovered frame BYTES stay
  * codec-defined, same boundary as AVI.
  */
object Codecs {

  final case class PgmImage(width: Int, height: Int, maxVal: Int,
                            pixels: Array[Byte])

  def encodePgm(width: Int, height: Int, pixels: Array[Byte],
                maxVal: Int = 255): Array[Byte] = {
    require(pixels.length == width * height,
      s"raster size ${pixels.length} != $width x $height")
    require(maxVal > 0 && maxVal <= 255, s"maxval $maxVal unsupported (8-bit only)")
    s"P5\n$width $height\n$maxVal\n".getBytes("US-ASCII") ++ pixels
  }

  def decodePgm(bytes: Array[Byte]): PgmImage = {
    var pos = 0
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"not a valid P5 PGM: $msg (at byte $pos)")
    def isWs(b: Byte): Boolean =
      b == ' ' || b == '\n' || b == '\r' || b == '\t' || b == '\f'
    // whitespace and '#'-to-end-of-line comments separate header tokens
    def skipSeparators(): Unit = {
      var more = true
      while (more) {
        while (pos < bytes.length && isWs(bytes(pos))) pos += 1
        if (pos < bytes.length && bytes(pos) == '#') {
          while (pos < bytes.length && bytes(pos) != '\n') pos += 1
        } else more = false
      }
    }
    def token(): String = {
      skipSeparators()
      val start = pos
      while (pos < bytes.length && !isWs(bytes(pos))) pos += 1
      if (pos == start) fail("missing header token")
      new String(bytes, start, pos - start, "US-ASCII")
    }
    if (token() != "P5") fail("bad magic")
    val (w, h, maxv) =
      try (token().toInt, token().toInt, token().toInt)
      catch { case _: NumberFormatException => fail("non-numeric header field") }
    if (w <= 0 || h <= 0) fail(s"bad dimensions $w x $h")
    // raster size math in Long: a crafted 65536x65536 header would wrap
    // Int w*h to 0 and sail past the truncation check below
    if (w.toLong * h > Int.MaxValue) fail(s"raster $w x $h exceeds 2^31-1 pixels")
    if (maxv <= 0 || maxv > 255) fail(s"maxval $maxv unsupported (8-bit only)")
    pos += 1 // exactly ONE whitespace byte between maxval and the raster
    if (bytes.length - pos < w * h)
      fail(s"raster truncated: ${bytes.length - pos} < ${w * h}")
    PgmImage(w, h, maxv, java.util.Arrays.copyOfRange(bytes, pos, pos + w * h))
  }

  /** Nearest-neighbor resample — the real pixel-space resize the PGM
    * path uses (the stub formats keep byte decimation). The source's
    * maxval is PRESERVED: re-stamping 255 would silently rescale pixel
    * semantics for every maxval<255 container the parser admits.
    */
  def resamplePgm(img: PgmImage, w: Int, h: Int): Array[Byte] =
    encodePgm(w, h, Array.tabulate(w * h) { i =>
      val (x, y) = (i % w, i / w)
      img.pixels((y.toLong * img.height / h).toInt * img.width
        + (x.toLong * img.width / w).toInt)
    }, img.maxVal)

  /** Decoded PCM audio: `data` is the raw sample stream as stored —
    * u8 samples for bitsPerSample=8 (WAV 8-bit is unsigned), s16le
    * for 16.
    */
  final case class WavAudio(sampleRate: Int, channels: Int,
                            bitsPerSample: Int, data: Array[Byte])

  private def u32le(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def u16le(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  def encodeWav(sampleRate: Int, channels: Int, bitsPerSample: Int,
                data: Array[Byte]): Array[Byte] = {
    require(bitsPerSample == 8 || bitsPerSample == 16,
      s"$bitsPerSample-bit PCM unsupported (8/16 only)")
    require(channels > 0 && sampleRate > 0, "bad channel count / sample rate")
    val blockAlign = channels * bitsPerSample / 8
    require(data.length % blockAlign == 0,
      s"data length ${data.length} not a multiple of block align $blockAlign")
    val fmt = u16le(1) ++ u16le(channels) ++ u32le(sampleRate) ++
      u32le(sampleRate.toLong * blockAlign) ++ u16le(blockAlign) ++
      u16le(bitsPerSample)
    val pad = if (data.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
    val chunks = "fmt ".getBytes("US-ASCII") ++ u32le(fmt.length) ++ fmt ++
      "data".getBytes("US-ASCII") ++ u32le(data.length) ++ data ++ pad
    "RIFF".getBytes("US-ASCII") ++ u32le(4L + chunks.length) ++
      "WAVE".getBytes("US-ASCII") ++ chunks
  }

  def decodeWav(bytes: Array[Byte]): WavAudio = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"not a valid PCM WAV: $msg")
    def ascii(off: Int): String =
      if (off + 4 > bytes.length) fail(s"truncated chunk id at $off")
      else new String(bytes, off, 4, "US-ASCII")
    def readU32(off: Int): Long =
      if (off + 4 > bytes.length) fail(s"truncated u32 at $off")
      else (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
        ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
    def readU16(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    if (ascii(0) != "RIFF") fail("bad magic")
    if (ascii(8) != "WAVE") fail("not a WAVE form")
    var pos = 12
    var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
    var data: Option[Array[Byte]] = None
    while (pos + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
      val id = ascii(pos)
      val size = readU32(pos + 4)
      val body = pos + 8
      if (size > Int.MaxValue || body + size > bytes.length)
        fail(s"chunk '$id' of $size bytes overruns the container")
      id match {
        case "fmt " =>
          if (size < 16) fail(s"fmt chunk too short ($size)")
          val code = readU16(body)
          if (code != 1) fail(s"format code $code unsupported (PCM=1 only)")
          val bits = readU16(body + 14)
          if (bits != 8 && bits != 16) fail(s"$bits-bit PCM unsupported")
          fmt = Some((readU16(body + 2), readU32(body + 4).toInt, bits))
        case "data" =>
          data = Some(java.util.Arrays.copyOfRange(bytes, body, body + size.toInt))
        case _ => () // LIST/fact/…: skipped per the RIFF spec
      }
      pos = body + size.toInt + (size % 2).toInt // odd chunks carry a pad byte
    }
    (fmt, data) match {
      case (Some((ch, rate, bits)), Some(d)) =>
        if (ch <= 0 || rate <= 0) fail(s"bad fmt: channels=$ch rate=$rate")
        // refuse zero samples LOUDLY here: downstream featurization
        // would otherwise divide by zero inside an executor (opaque
        // stage failure instead of the codec family's refusal)
        if (d.length == 0) fail("empty data chunk (zero samples)")
        if (d.length % (ch * bits / 8) != 0)
          fail(s"data length ${d.length} not a multiple of the block align")
        WavAudio(rate, ch, bits, d)
      case (None, _) => fail("missing fmt chunk")
      case _ => fail("missing data chunk")
    }
  }

  /** Decoded AVI: header dims + frame cadence + the raw frame payloads
    * in stream order (content is the stream codec's business — fourcc
    * `GRFT` here).
    */
  final case class AviVideo(width: Int, height: Int, usPerFrame: Int,
                            frames: Seq[Array[Byte]])

  private def fourcc(s: String): Array[Byte] = {
    require(s.length == 4, s"fourcc must be 4 chars: '$s'")
    s.getBytes("US-ASCII")
  }

  private def chunk(id: String, body: Array[Byte]): Array[Byte] = {
    val pad = if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
    fourcc(id) ++ u32le(body.length) ++ body ++ pad
  }

  private def list(kind: String, body: Array[Byte]): Array[Byte] =
    fourcc("LIST") ++ u32le(4L + body.length) ++ fourcc(kind) ++ body

  def encodeAvi(width: Int, height: Int, usPerFrame: Int,
                frames: Seq[Array[Byte]]): Array[Byte] = {
    require(width > 0 && height > 0 && usPerFrame > 0 && frames.nonEmpty,
      "bad AVI parameters")
    val zeros4 = u32le(0)
    val avih = u32le(usPerFrame) ++ zeros4 ++ zeros4 ++ zeros4 ++
      u32le(frames.length) ++ zeros4 ++ u32le(1) ++ zeros4 ++
      u32le(width) ++ u32le(height) ++
      zeros4 ++ zeros4 ++ zeros4 ++ zeros4
    // stream header: video stream, custom GRFT codec, rate/scale = fps
    val strh = fourcc("vids") ++ fourcc("GRFT") ++ zeros4 ++ zeros4 ++
      zeros4 ++ u32le(usPerFrame) ++ u32le(1000000L) ++ zeros4 ++
      u32le(frames.length) ++ zeros4 ++ zeros4 ++ zeros4 ++
      u16le(0) ++ u16le(0) ++ u16le(width) ++ u16le(height)
    val strf = u32le(frames.map(_.length).max.toLong) // codec-defined
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    // the movi body is written ONCE into a pre-sized buffer: per-chunk
    // array concatenation would copy the prefix per frame — quadratic in
    // container size, and video durations grow with doc_id (caught by
    // the bench delta table: 6x on multi_frames at sf0.1)
    val moviBody = frames.iterator.map(f => 8 + f.length + (f.length % 2)).sum
    val bos = new java.io.ByteArrayOutputStream(20 + hdrl.length + 12 + moviBody)
    def put(b: Array[Byte]): Unit = bos.write(b, 0, b.length)
    put(fourcc("RIFF")); put(u32le(4L + hdrl.length + 12L + moviBody))
    put(fourcc("AVI ")); put(hdrl)
    put(fourcc("LIST")); put(u32le(4L + moviBody)); put(fourcc("movi"))
    frames.foreach { f =>
      put(fourcc("00db")); put(u32le(f.length)); put(f)
      if (f.length % 2 == 1) bos.write(0)
    }
    bos.toByteArray
  }

  def decodeAvi(bytes: Array[Byte]): AviVideo = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"not a valid AVI: $msg")
    def ascii(off: Int): String =
      if (off + 4 > bytes.length) fail(s"truncated fourcc at $off")
      else new String(bytes, off, 4, "US-ASCII")
    def readU32(off: Int): Long =
      if (off + 4 > bytes.length) fail(s"truncated u32 at $off")
      else (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
        ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
    if (ascii(0) != "RIFF") fail("bad magic")
    if (ascii(8) != "AVI ") fail("not an AVI form")
    var header: Option[(Int, Int, Int, Int)] = None // (w, h, usPerFrame, n)
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    // walk a chunk run in [from, to); recurse into the LISTs that matter
    def walk(from: Int, to: Int, inMovi: Boolean): Unit = {
      var pos = from
      while (pos + 8 <= to) {
        val id = ascii(pos)
        val size = readU32(pos + 4)
        val body = pos + 8
        if (size > Int.MaxValue || body + size > to)
          fail(s"chunk '$id' of $size bytes overruns its parent")
        id match {
          case "LIST" =>
            val kind = ascii(body)
            if (kind == "hdrl" || kind == "movi" || kind == "strl")
              walk(body + 4, body + size.toInt, inMovi = kind == "movi")
          case "avih" =>
            if (size < 40) fail(s"avih too short ($size)")
            header = Some((readU32(body + 32).toInt, readU32(body + 36).toInt,
              readU32(body).toInt, readU32(body + 16).toInt))
          case f if inMovi && (f.endsWith("db") || f.endsWith("dc")) =>
            frames += java.util.Arrays.copyOfRange(bytes, body, body + size.toInt)
          case _ => () // strh/strf/idx1/JUNK: not needed to recover frames
        }
        pos = body + size.toInt + (size % 2).toInt
      }
    }
    walk(12, bytes.length, inMovi = false)
    header match {
      case None => fail("missing avih header")
      case Some((w, h, us, n)) =>
        if (w <= 0 || h <= 0 || us <= 0) fail(s"bad avih: ${w}x$h @ $us us/frame")
        if (frames.isEmpty) fail("missing movi frames")
        if (n != frames.length)
          fail(s"avih declares $n frames, movi carries ${frames.length}")
        AviVideo(w, h, us, frames.toSeq)
    }
  }

  /** Decoded ISO BMFF video: sample-entry dims + uniform frame cadence +
    * the raw sample payloads sliced out of `mdat` by the stbl tables
    * (content is the sample-entry codec's business — fourcc `grft`
    * here, the same declared boundary as AVI's `GRFT` stream).
    */
  final case class Mp4Video(width: Int, height: Int, usPerFrame: Int,
                            frames: Seq[Array[Byte]])

  /** The media timescale [[encodeMp4]] stamps: µs ticks, so stts deltas
    * are µs/frame verbatim.
    */
  val Mp4Timescale: Long = 1000000L

  private def u32be(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def u16be(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def mp4Box(id: String, body: Array[Byte]): Array[Byte] =
    u32be(8L + body.length) ++ fourcc(id) ++ body

  /** version 0 + the given flags word (24 bits used). */
  private def mp4FullBox(id: String, body: Array[Byte],
                         flags: Int = 0): Array[Byte] =
    mp4Box(id, u32be(flags & 0xffffff) ++ body)

  private val mp4UnityMatrix: Array[Byte] =
    u32be(0x00010000L) ++ u32be(0) ++ u32be(0) ++
      u32be(0) ++ u32be(0x00010000L) ++ u32be(0) ++
      u32be(0) ++ u32be(0) ++ u32be(0x40000000L)

  /** ISO BMFF (mp4) with the layout every box-walking tool expects:
    * `ftyp`, then `mdat` carrying the samples back to back, then `moov`
    * whose `stbl` tables (stsd/stts/stsc/stsz/stco) index them — all
    * samples in ONE chunk whose absolute offset is known because `mdat`
    * precedes `moov`. Big-endian throughout, per the spec (RIFF's
    * little-endian twin). The sample entry carries the custom `grft`
    * fourcc: mp4 is a container, and the honest boundary stays the
    * inner frame codec ([[encodeAvi]]'s stance).
    */
  def encodeMp4(width: Int, height: Int, usPerFrame: Int,
                frames: Seq[Array[Byte]]): Array[Byte] = {
    require(width > 0 && height > 0 && usPerFrame > 0 && frames.nonEmpty,
      "bad MP4 parameters")
    val n = frames.length
    val ftyp = mp4Box("ftyp", fourcc("isom") ++ u32be(0) ++ fourcc("isom"))
    val mdatBody = frames.iterator.map(_.length.toLong).sum
    // the WHOLE container must fit one array: mdat + the moov overhead
    // (~4 bytes/frame of stsz + fixed boxes), not just mdat
    require(mdatBody + 4L * n + 4096 <= Int.MaxValue,
      s"container of $mdatBody mdat bytes + $n samples too large")
    val chunkOffset = ftyp.length + 8L // mdat samples start past its header
    val duration = n.toLong * usPerFrame
    // version-0 boxes carry u32 durations; past ~71.6 min at the µs
    // timescale the honest answer is refusal, not a silent wrap that
    // any standard box reader would report as an 8-minute video
    require(duration <= 0xffffffffL,
      s"duration of $duration us overflows version-0 boxes")
    val mvhd = mp4FullBox("mvhd",
      u32be(0) ++ u32be(0) ++ u32be(Mp4Timescale) ++ u32be(duration) ++
        u32be(0x00010000L) ++ u16be(0x0100) ++ u16be(0) ++
        u32be(0) ++ u32be(0) ++ mp4UnityMatrix ++
        Array.fill[Byte](24)(0) ++ u32be(2))
    val tkhd = mp4FullBox("tkhd",
      u32be(0) ++ u32be(0) ++ u32be(1) ++ u32be(0) ++ u32be(duration) ++
        u32be(0) ++ u32be(0) ++ u16be(0) ++ u16be(0) ++ u16be(0) ++
        u16be(0) ++ mp4UnityMatrix ++
        u32be(width.toLong << 16) ++ u32be(height.toLong << 16),
      flags = 3) // enabled | in_movie
    val mdhd = mp4FullBox("mdhd",
      u32be(0) ++ u32be(0) ++ u32be(Mp4Timescale) ++ u32be(duration) ++
        u16be(0x55c4) ++ u16be(0)) // language 'und'
    val hdlr = mp4FullBox("hdlr",
      u32be(0) ++ fourcc("vide") ++ Array.fill[Byte](12)(0) ++
        "GraftVideo ".getBytes("US-ASCII"))
    val vmhd = mp4FullBox("vmhd", u16be(0) ++ Array.fill[Byte](6)(0), flags = 1)
    val dinf = mp4Box("dinf", mp4FullBox("dref",
      u32be(1) ++ mp4FullBox("url ", Array.empty, flags = 1))) // self-contained
    val entry = mp4Box("grft", // 86-byte VisualSampleEntry
      Array.fill[Byte](6)(0) ++ u16be(1) ++ // reserved + data_reference_index
        u16be(0) ++ u16be(0) ++ Array.fill[Byte](12)(0) ++ // pre_defined/reserved
        u16be(width) ++ u16be(height) ++
        u32be(0x00480000L) ++ u32be(0x00480000L) ++ // 72 dpi
        u32be(0) ++ u16be(1) ++ Array.fill[Byte](32)(0) ++ // compressorname
        u16be(24) ++ u16be(0xffff))
    val stsd = mp4FullBox("stsd", u32be(1) ++ entry)
    val stts = mp4FullBox("stts", u32be(1) ++ u32be(n) ++ u32be(usPerFrame))
    val stsc = mp4FullBox("stsc", u32be(1) ++ u32be(1) ++ u32be(n) ++ u32be(1))
    val stsz = mp4FullBox("stsz",
      u32be(0) ++ u32be(n) ++ frames.iterator.flatMap(f => u32be(f.length)).toArray)
    val stco = mp4FullBox("stco", u32be(1) ++ u32be(chunkOffset))
    val stbl = mp4Box("stbl", stsd ++ stts ++ stsc ++ stsz ++ stco)
    val minf = mp4Box("minf", vmhd ++ dinf ++ stbl)
    val mdia = mp4Box("mdia", mdhd ++ hdlr ++ minf)
    val trak = mp4Box("trak", tkhd ++ mdia)
    val moov = mp4Box("moov", mvhd ++ trak)
    // one pre-sized buffer, like encodeAvi: per-frame concat would be
    // quadratic in container size
    val bos = new java.io.ByteArrayOutputStream(
      ftyp.length + 8 + mdatBody.toInt + moov.length)
    def put(b: Array[Byte]): Unit = bos.write(b, 0, b.length)
    put(ftyp)
    put(u32be(8L + mdatBody)); put(fourcc("mdat"))
    frames.foreach(put)
    put(moov)
    bos.toByteArray
  }

  def decodeMp4(bytes: Array[Byte]): Mp4Video = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"not a valid MP4: $msg")
    def ascii(off: Long): String =
      if (off + 4 > bytes.length) fail(s"truncated fourcc at $off")
      else new String(bytes, off.toInt, 4, "US-ASCII")
    def readU32(off: Long): Long =
      if (off + 4 > bytes.length) fail(s"truncated u32 at $off")
      else {
        val o = off.toInt
        ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
          ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
      }
    def readU16(off: Long): Int =
      ((bytes(off.toInt) & 0xff) << 8) | (bytes(off.toInt + 1) & 0xff)

    var timescale = 0L
    var sttsEntries = Seq.empty[(Long, Long)] // (count, delta)
    var stscEntries = Seq.empty[(Long, Long)] // (first_chunk, samples_per_chunk)
    var sizes = Seq.empty[Long]
    var chunkOffsets = Seq.empty[Long]
    var dims: Option[(Int, Int)] = None
    var handler = "" // this trak's hdlr type ('vide', 'soun', …)
    var tablesDone = false // first VIDEO trak wins; later traks skipped

    // a declared entry count must fit inside its own box: a short box
    // whose table runs past `end` would otherwise silently parse the
    // next box's header bytes as entries — and a hostile count must be
    // bounded BEFORE anything allocates by it
    def tableCount(what: String, body: Long, end: Long, countOff: Long,
                   headerLen: Long, entryLen: Long): Long = {
      val n = readU32(body + countOff)
      if (body + headerLen + n * entryLen > end)
        fail(s"$what declares $n entries but its box holds " +
          s"${(end - body - headerLen) / entryLen}")
      n
    }

    // walk the box run in [from, to); descend only into the containers
    // on the sample-table path. Box sizes are u32be; size 1 = 64-bit
    // largesize follows; size 0 = to end of enclosing box.
    def walk(from: Long, to: Long): Unit = {
      var pos = from
      while (pos + 8 <= to) {
        val size0 = readU32(pos)
        val id = ascii(pos + 4)
        val (body, end) =
          if (size0 == 1) {
            val hi = readU32(pos + 8); val lo = readU32(pos + 12)
            (pos + 16, pos + ((hi << 32) | lo))
          } else if (size0 == 0) (pos + 8, to)
          else (pos + 8, pos + size0)
        if (end > to || end < body) fail(s"box '$id' overruns its parent")
        id match {
          case "trak" =>
            // a non-video trak (audio-first mux layouts are common)
            // must not contribute tables: walk it, then roll back
            // everything it set unless its handler said 'vide'
            if (!tablesDone) {
              val saved = (timescale, sttsEntries, stscEntries, sizes,
                chunkOffsets, dims)
              handler = ""
              walk(body, end)
              if (handler.nonEmpty && handler != "vide") {
                timescale = saved._1; sttsEntries = saved._2
                stscEntries = saved._3; sizes = saved._4
                chunkOffsets = saved._5; dims = saved._6
              } else if (sizes.nonEmpty && chunkOffsets.nonEmpty)
                tablesDone = true
            }
          case "moov" | "mdia" | "minf" | "stbl" =>
            if (!tablesDone) walk(body, end)
          case "hdlr" =>
            // version/flags(4) + pre_defined(4), then the handler type
            handler = ascii(body + 8)
          case "mdhd" =>
            // version 1 widens creation/modification to 64 bits,
            // pushing timescale from body+12 to body+20 — so the bounds
            // guard must be per-version (24 bytes for v1, 16 for v0),
            // else a short v1 box would read the NEXT box's header
            // bytes as its timescale
            if (end - body < 1) fail("mdhd too short")
            val version = bytes(body.toInt) & 0xff
            if (end - body < (if (version == 1) 24 else 16))
              fail(s"mdhd (version $version) too short")
            timescale = readU32(body + (if (version == 1) 20 else 12))
          case "stsd" =>
            if (end - body < 16) fail("stsd too short")
            val entry = body + 8 // version/flags + entry_count
            val entrySize = readU32(entry)
            if (entrySize < 36 || entry + entrySize > end)
              fail(s"sample entry of $entrySize bytes malformed")
            dims = Some((readU16(entry + 32), readU16(entry + 34)))
          case "stts" =>
            val n = tableCount("stts", body, end, 4, 8, 8)
            sttsEntries = (0L until n).map(i =>
              (readU32(body + 8 + i * 8), readU32(body + 12 + i * 8)))
          case "stsc" =>
            val n = tableCount("stsc", body, end, 4, 8, 12)
            stscEntries = (0L until n).map(i =>
              (readU32(body + 8 + i * 12), readU32(body + 12 + i * 12)))
          case "stsz" =>
            val uniform = readU32(body + 4)
            sizes =
              if (uniform != 0) {
                // no per-sample table to bound the count by — bound it
                // by the file itself (n samples of `uniform` bytes must
                // fit) before Seq.fill allocates a hostile count
                val n = readU32(body + 8)
                // bound each factor before the product: two u32s can
                // overflow even a Long multiply
                if (n > bytes.length || uniform > bytes.length ||
                  n * uniform > bytes.length)
                  fail(s"stsz declares $n samples of $uniform bytes " +
                    s"in a ${bytes.length}-byte file")
                Seq.fill(n.toInt)(uniform)
              } else {
                val n = tableCount("stsz", body, end, 8, 12, 4)
                (0L until n).map(i => readU32(body + 12 + i * 4))
              }
          case "stco" =>
            val n = tableCount("stco", body, end, 4, 8, 4)
            chunkOffsets = (0L until n).map(i => readU32(body + 8 + i * 4))
          case "co64" =>
            val n = tableCount("co64", body, end, 4, 8, 8)
            chunkOffsets = (0L until n).map { i =>
              val off = (readU32(body + 8 + i * 8) << 32) | readU32(body + 12 + i * 8)
              // a 64-bit offset can overflow Long to negative (hi >=
              // 2^31) or point past the file; either would truncate in
              // the later .toInt slice into fabricated frame bytes
              if (off < 0 || off > bytes.length)
                fail(s"co64 offset $off outside the ${bytes.length}-byte file")
              off
            }
          case _ => () // ftyp/mdat/mvhd/tkhd/vmhd/dinf/…: not needed
        }
        pos = end
      }
    }
    walk(0, bytes.length)

    val (w, h) = dims.getOrElse(fail("missing stsd sample entry"))
    if (w <= 0 || h <= 0) fail(s"bad sample entry dims ${w}x$h")
    if (timescale <= 0) fail("missing mdhd timescale")
    if (sizes.isEmpty) fail("missing stsz sample sizes")
    if (chunkOffsets.isEmpty) fail("missing stco chunk offsets")
    if (stscEntries.isEmpty) fail("missing stsc sample-to-chunk map")
    val deltas = sttsEntries.map(_._2).distinct
    if (deltas.isEmpty) fail("missing stts timing")
    if (deltas.size > 1) fail("variable frame durations unsupported")
    if (sttsEntries.map(_._1).sum != sizes.length)
      fail(s"stts covers ${sttsEntries.map(_._1).sum} samples, stsz ${sizes.length}")
    val us = deltas.head * 1000000L / timescale
    if (us <= 0 || us > Int.MaxValue) fail(s"bad frame duration ($us us)")

    // expand the stsc runs: entry i applies from its first_chunk until
    // the next entry's, slicing consecutive samples out of each chunk
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var sample = 0
    val bounds = stscEntries.map(_._1) :+ (chunkOffsets.length + 1L)
    stscEntries.zipWithIndex.foreach { case ((first, perChunk), i) =>
      var c = first
      while (c < bounds(i + 1) && sample < sizes.length) {
        if (c < 1 || c > chunkOffsets.length) fail(s"stsc names chunk $c of ${chunkOffsets.length}")
        var off = chunkOffsets((c - 1).toInt)
        var s = 0L
        while (s < perChunk && sample < sizes.length) {
          val len = sizes(sample)
          if (off + len > bytes.length)
            fail(s"sample $sample overruns the file (${off + len} > ${bytes.length})")
          frames += java.util.Arrays.copyOfRange(bytes, off.toInt, (off + len).toInt)
          off += len; s += 1; sample += 1
        }
        c += 1
      }
    }
    if (sample != sizes.length)
      fail(s"sample-to-chunk map covers $sample of ${sizes.length} samples")
    Mp4Video(w, h, us.toInt, frames.toSeq)
  }
}
