package graft.extract

/** ISO BMFF (MPEG-4 Part 12, public spec) box-tree walker — the
  * container-structure half of the video modality (frame decode needs
  * codec libraries; container metadata is exactly the
  * ExtractMediaMetadata role the reference's flow applies to media,
  * tika.xml:1761). Shared by [[Metadata]] (T5 attribute surface) and
  * `graft.ext.Multimodal` (the q_video_meta batch walker).
  *
  * Handles 32-bit and 64-bit (`largesize`) box sizes, `size==0`
  * (to-end-of-file), `moov`/`trak`/`mdia`/`minf`/`stbl` recursion,
  * version-0/1 `mvhd` and `tkhd` offsets, 16.16 fixed-point track
  * dimensions, and `stsd` sample-entry fourccs in document order.
  */
object Bmff {

  /** (duration_ms, n_tracks, codecs CSV, width, height); (-1, -1, "",
    * -1, -1) when the bytes are not a BMFF container. */
  def parse(bytes: Array[Byte]): (Long, Int, String, Int, Int) = {
    try {
      var durationMs = -1L
      var nTracks = 0
      val codecs = new scala.collection.mutable.ListBuffer[String]
      var w = 0
      var h = 0
      def u32(i: Int): Long =
        ((bytes(i) & 0xffL) << 24) | ((bytes(i + 1) & 0xffL) << 16) |
          ((bytes(i + 2) & 0xffL) << 8) | (bytes(i + 3) & 0xffL)
      def fourcc(i: Int): String =
        new String(bytes, i, 4, java.nio.charset.StandardCharsets.ISO_8859_1)
      val containers = Set("moov", "trak", "mdia", "minf", "stbl")
      def walk(from: Int, to: Int): Unit = {
        var i = from
        while (i + 8 <= to) {
          var size = u32(i)
          var hdr = 8
          if (size == 1 && i + 16 <= to) { // 64-bit largesize
            size = (u32(i + 8) << 32) | u32(i + 12)
            hdr = 16
          } else if (size == 0) size = (to - i).toLong
          if (size < hdr || i + size > to) return // malformed: stop
          val tpe = fourcc(i + 4)
          val body = i + hdr
          val end = (i + size).toInt
          tpe match {
            case t if containers(t) =>
              if (t == "trak") nTracks += 1
              walk(body, end)
            case "mvhd" =>
              val version = bytes(body) & 0xff
              if (version == 0 && body + 20 <= end) {
                val ts = u32(body + 12)
                val dur = u32(body + 16)
                if (ts > 0) durationMs = dur * 1000L / ts
              } else if (version == 1 && body + 32 <= end) {
                val ts = u32(body + 20)
                val dur = (u32(body + 24) << 32) | u32(body + 28)
                if (ts > 0) durationMs = dur * 1000L / ts
              }
            case "tkhd" =>
              val version = bytes(body) & 0xff
              val dimOff = if (version == 0) body + 76 else body + 88
              if (dimOff + 8 <= end && w == 0) {
                val tw = (u32(dimOff) >> 16).toInt
                val th = (u32(dimOff + 4) >> 16).toInt
                if (tw > 0 && th > 0) { w = tw; h = th }
              }
            case "stsd" =>
              if (body + 8 <= end) {
                val count = u32(body + 4).toInt
                var e = body + 8
                var c = 0
                while (c < count && e + 8 <= end) {
                  val esize = u32(e)
                  if (esize < 8 || e + esize > end) { c = count }
                  else { codecs += fourcc(e + 4); e += esize.toInt; c += 1 }
                }
              }
            case _ =>
          }
          i = (i + size).toInt
        }
      }
      // sanity gate: a BMFF file leads with a box whose type is ftyp/
      // moov/free/mdat/styp — reject arbitrary binaries early
      if (bytes.length < 12 ||
          !Set("ftyp", "moov", "free", "mdat", "styp", "wide").contains(fourcc(4)))
        (-1L, -1, "", -1, -1)
      else {
        walk(0, bytes.length)
        (durationMs, nTracks, codecs.mkString(","), w, h)
      }
    } catch { case scala.util.control.NonFatal(_) => (-1L, -1, "", -1, -1) }
  }

  /** Planted closed forms for the synthetic MP4 fixtures — the oracle's
    * algebra (SQL mirrors these expressions verbatim). */
  def plantedDurationMs(id: Long): Long = 1000 + id % 9000
  def plantedTracks(id: Long): Int = (1 + id % 3).toInt
  def plantedVideoW(id: Long): Int = (320 + 16 * (id % 8)).toInt
  def plantedVideoH(id: Long): Int = (240 + 16 * (id % 5)).toInt

  /** A real ISO BMFF (MPEG-4 Part 12, public spec) container:
    * `ftyp` + `moov` with `mvhd` and 1–3 `trak` trees, each a
    * conformant `tkhd` + `mdia`→`mdhd`/`hdlr`/`minf`→`stbl`→`stsd`
    * chain. Track kinds cycle video `avc1` / audio `mp4a` / video
    * `hvc1`; timescale is 1000 so the planted millisecond duration is
    * exact. Frame payloads (`mdat`) are absent by design: codecs are
    * not in this container, and ExtractMediaMetadata's role is the
    * container structure (reference flow tika.xml:1761) — which is
    * fully present and fully parseable. */
  def syntheticMp4(id: Long): Array[Byte] = {
    def box(tpe: String, payload: Array[Byte]*): Array[Byte] = {
      val len = 8 + payload.map(_.length).sum
      val b = java.nio.ByteBuffer.allocate(len)
      b.putInt(len)
      b.put(tpe.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
      payload.foreach(b.put)
      b.array()
    }
    def full(tpe: String, body: java.nio.ByteBuffer => Unit, size: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(size)
      b.putInt(0) // version 0 + flags 0
      body(b)
      box(tpe, b.array())
    }
    val dur = plantedDurationMs(id)
    val nTracks = plantedTracks(id)
    val mvhd = full("mvhd", { b =>
      b.putInt(0); b.putInt(0)        // creation/modification
      b.putInt(1000)                  // timescale: ms
      b.putInt(dur.toInt)             // duration
      b.putInt(0x00010000); b.putShort(0x0100.toShort); b.putShort(0) // rate, volume, reserved
      b.putLong(0)                    // reserved
      Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(b.putInt) // unity matrix
      (0 until 6).foreach(_ => b.putInt(0)) // predefined
      b.putInt(nTracks + 1)           // next track id
    }, 4 + 96)
    def track(k: Int): Array[Byte] = {
      val video = k != 1
      val fourcc = k match { case 0 => "avc1"; case 1 => "mp4a"; case _ => "hvc1" }
      val (w, h) = if (video) (plantedVideoW(id), plantedVideoH(id)) else (0, 0)
      val tkhd = full("tkhd", { b =>
        b.putInt(0); b.putInt(0)      // creation/modification
        b.putInt(k + 1); b.putInt(0)  // track id, reserved
        b.putInt(dur.toInt)           // duration (movie timescale)
        b.putLong(0)                  // reserved
        b.putShort(0); b.putShort(0)  // layer, alternate group
        b.putShort(if (video) 0 else 0x0100.toShort); b.putShort(0) // volume, reserved
        Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(b.putInt)
        b.putInt(w << 16); b.putInt(h << 16) // 16.16 fixed
      }, 4 + 80)
      val mdhd = full("mdhd", { b =>
        b.putInt(0); b.putInt(0)
        b.putInt(1000); b.putInt(dur.toInt)
        b.putShort(0x55c4.toShort)    // language 'und'
        b.putShort(0)
      }, 4 + 20)
      val hdlr = full("hdlr", { b =>
        b.putInt(0)
        b.put((if (video) "vide" else "soun")
          .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
        (0 until 3).foreach(_ => b.putInt(0))
        b.put(0.toByte)               // empty name
      }, 4 + 21)
      val entry = if (video) {
        // VisualSampleEntry (86 bytes): dims at offset 32/34 from start
        val b = java.nio.ByteBuffer.allocate(86)
        b.putInt(86)
        b.put(fourcc.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
        (0 until 6).foreach(_ => b.put(0.toByte)) // reserved
        b.putShort(1)                 // data reference index
        (0 until 4).foreach(_ => b.putInt(0))     // predefined/reserved
        b.putShort(w.toShort); b.putShort(h.toShort)
        b.putInt(0x00480000); b.putInt(0x00480000) // 72 dpi
        b.putInt(0); b.putShort(1)    // reserved, frame count
        (0 until 32).foreach(_ => b.put(0.toByte)) // compressor name
        b.putShort(0x0018.toShort); b.putShort(-1) // depth, predefined
        b.array()
      } else {
        // AudioSampleEntry (36 bytes)
        val b = java.nio.ByteBuffer.allocate(36)
        b.putInt(36)
        b.put(fourcc.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
        (0 until 6).foreach(_ => b.put(0.toByte))
        b.putShort(1)
        b.putLong(0)                  // reserved
        b.putShort(2); b.putShort(16) // channels, sample size
        b.putInt(0)                   // predefined/reserved
        b.putInt(8000 << 16)          // sample rate 16.16
        b.array()
      }
      val stsd = {
        val b = java.nio.ByteBuffer.allocate(8 + entry.length)
        b.putInt(0)                   // version/flags
        b.putInt(1)                   // entry count
        b.put(entry)
        box("stsd", b.array())
      }
      val stbl = box("stbl", stsd)
      val minf = box("minf", stbl)
      val mdia = box("mdia", mdhd, hdlr, minf)
      box("trak", tkhd, mdia)
    }
    val moov = box("moov", (mvhd +: (0 until nTracks).map(track)): _*)
    val ftyp = box("ftyp",
      "isomiso2".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1),
      java.nio.ByteBuffer.allocate(4).putInt(512).array(),
      "isomiso2avc1mp41".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    ftyp ++ moov
  }
}
