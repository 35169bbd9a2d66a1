package graft.extract

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

/** Synthetic media fixtures for the image-metadata path: a JPEG with a
  * hand-assembled EXIF APP1 segment (ImageIO writes JFIF only, so the
  * TIFF structure is spliced in after SOI per the public EXIF/TIFF 6.0
  * spec), a PNG with tEXt chunks inserted after IHDR (CRC32 from the
  * JDK), and a plain GIF. Pixels are flat fills — the metadata, not
  * the raster, is the payload here; dimensions and tag values are the
  * golden-pinned facts.
  */
object MediaFixtures {

  private def fill(w: Int, h: Int, rgb: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    img
  }

  private def encoded(img: BufferedImage, fmt: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  // ---- EXIF TIFF assembly (little-endian, IFD0 + Exif IFD) -----------

  private def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def cat(parts: Array[Byte]*): Array[Byte] = parts.flatten.toArray

  /** One 12-byte IFD entry. For inline SHORT values the low half-word
    * carries the value; ASCII/pointer entries carry an offset. */
  private def entry(tag: Int, typ: Int, count: Int, value: Int): Array[Byte] =
    cat(le16(tag), le16(typ), le32(count),
      if (typ == 3) cat(le16(value), le16(0)) else le32(value))

  private def exifTiff(make: String, model: String, orientation: Int,
                       dateTime: String, dateTimeOriginal: String): Array[Byte] = {
    val makeB = (make + "\u0000").getBytes("ascii")
    val modelB = (model + "\u0000").getBytes("ascii")
    val dtB = (dateTime + "\u0000").getBytes("ascii")
    val dtoB = (dateTimeOriginal + "\u0000").getBytes("ascii")
    val ifd0At = 8
    val ifd0Len = 2 + 5 * 12 + 4
    val exifAt = ifd0At + ifd0Len
    val exifLen = 2 + 1 * 12 + 4
    val dataAt = exifAt + exifLen
    val makeAt = dataAt
    val modelAt = makeAt + makeB.length
    val dtAt = modelAt + modelB.length
    val dtoAt = dtAt + dtB.length
    cat(
      "II".getBytes("ascii"), le16(42), le32(ifd0At),
      le16(5), // IFD0, tags ascending
      entry(0x010f, 2, makeB.length, makeAt),
      entry(0x0110, 2, modelB.length, modelAt),
      entry(0x0112, 3, 1, orientation),
      entry(0x0132, 2, dtB.length, dtAt),
      entry(0x8769, 4, 1, exifAt),
      le32(0),
      le16(1), // Exif IFD
      entry(0x9003, 2, dtoB.length, dtoAt),
      le32(0),
      makeB, modelB, dtB, dtoB)
  }

  /** 8×6 JPEG carrying EXIF: Orientation=6, Make/Model, DateTime and
    * DateTimeOriginal. */
  def jpegWithExif(): Array[Byte] = {
    val jfif = encoded(fill(8, 6, 0x336699), "jpg")
    val tiff = exifTiff("GraftCam", "GC-100", orientation = 6,
      dateTime = "2024:05:06 07:08:09", dateTimeOriginal = "2024:05:06 07:08:01")
    val payload = cat("Exif\u0000\u0000".getBytes("ascii"), tiff)
    val app1 = cat(Array(0xff.toByte, 0xe1.toByte),
      Array((((payload.length + 2) >> 8) & 0xff).toByte,
        ((payload.length + 2) & 0xff).toByte), payload)
    cat(jfif.take(2), app1, jfif.drop(2))
  }

  /** 9×7 PNG with two tEXt chunks spliced after IHDR (signature 8 +
    * IHDR 25 bytes = offset 33). */
  def pngWithText(): Array[Byte] = {
    val png = encoded(fill(9, 7, 0xcc3300), "png")
    def tEXt(key: String, value: String): Array[Byte] = {
      val data = cat(key.getBytes("iso-8859-1"), Array(0.toByte),
        value.getBytes("iso-8859-1"))
      val typeAndData = cat("tEXt".getBytes("ascii"), data)
      val crc = new java.util.zip.CRC32()
      crc.update(typeAndData)
      cat(
        Array(((data.length >> 24) & 0xff).toByte, ((data.length >> 16) & 0xff).toByte,
          ((data.length >> 8) & 0xff).toByte, (data.length & 0xff).toByte),
        typeAndData,
        Array(((crc.getValue >> 24) & 0xff).toByte, ((crc.getValue >> 16) & 0xff).toByte,
          ((crc.getValue >> 8) & 0xff).toByte, (crc.getValue & 0xff).toByte))
    }
    cat(png.take(33), tEXt("Title", "Quarterly Chart"), tEXt("Author", "graft"),
      png.drop(33))
  }

  /** 11×5 GIF (logical-screen dimensions are the metadata). */
  def gifSmall(): Array[Byte] = encoded(fill(11, 5, 0x00aa55), "gif")

  /** Canonical 44-byte RIFF/WAVE header + deterministic 16-bit PCM:
    * 8 kHz mono, 4000 samples → exactly 500 ms. */
  def wavSmall(): Array[Byte] = {
    val n = 4000
    val b = java.nio.ByteBuffer.allocate(44 + n * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(s: String): Unit = { b.put(s.getBytes("US-ASCII")); () }
    tag("RIFF"); b.putInt(36 + n * 2); tag("WAVE")
    tag("fmt "); b.putInt(16)
    b.putShort(1)                // PCM
    b.putShort(1)                // mono
    b.putInt(8000)               // sample rate
    b.putInt(8000 * 2)           // byte rate
    b.putShort(2)                // block align
    b.putShort(16)               // bits per sample
    tag("data"); b.putInt(n * 2)
    var k = 0
    while (k < n) { b.putShort((((k * 31) % 4096) - 2048).toShort); k += 1 }
    b.array()
  }

  /** ID3v2.3 tag (planted Title/Artist/Album/Year, Latin-1 text frames)
    * followed by 38 CBR MPEG-1 Layer III frames @128 kbps 44.1 kHz
    * joint-stereo: frame length 144·128000/44100 = 417 bytes, duration
    * 38·1152/44100 s → 992 ms by the parser's integer math. */
  def mp3Small(): Array[Byte] = {
    def textFrame(id: String, value: String): Array[Byte] = {
      val body = 0.toByte +: value.getBytes("ISO-8859-1")
      val sz = body.length
      cat(id.getBytes("US-ASCII"),
        Array(((sz >> 24) & 0xff).toByte, ((sz >> 16) & 0xff).toByte,
          ((sz >> 8) & 0xff).toByte, (sz & 0xff).toByte),
        Array[Byte](0, 0), body)
    }
    val frames = cat(textFrame("TIT2", "Graft Anthem"),
      textFrame("TPE1", "The Graftones"),
      textFrame("TALB", "Synthetic Sounds"),
      textFrame("TYER", "2024"))
    val ts = frames.length
    val tag = cat("ID3".getBytes("US-ASCII"),
      Array[Byte](3, 0, 0), // v2.3.0, no flags
      Array(((ts >> 21) & 0x7f).toByte, ((ts >> 14) & 0x7f).toByte,
        ((ts >> 7) & 0x7f).toByte, (ts & 0x7f).toByte), frames)
    val frameLen = 144 * 128000 / 44100 // 417, no padding
    val audio = Array.tabulate(38 * frameLen) { k =>
      (k % frameLen) match {
        case 0 => 0xff.toByte
        case 1 => 0xfb.toByte // MPEG-1 Layer III, no CRC
        case 2 => 0x90.toByte // bitrate idx 9 (128k), 44100, no padding
        case 3 => 0x40.toByte // joint stereo
        case j => ((j * 17 + k / frameLen) & 0xff).toByte
      }
    }
    cat(tag, audio)
  }

  /** Writes the media fixtures into `dir` for directory-ingest queries
    * (stale entries removed, atomic per-file writes — see
    * LegacyOffice.syncFixtureDir). clip.mp4 is the planted BMFF
    * container (id 7: 1007 ms, avc1+mp4a tracks, 432×272). */
  def writeFixtures(dir: java.nio.file.Path): Unit =
    LegacyOffice.syncFixtureDir(dir, Map(
      "photo.jpg" -> jpegWithExif(),
      "chart.png" -> pngWithText(),
      "anim.gif" -> gifSmall(),
      "clip.mp4" -> Bmff.syntheticMp4(7L),
      "tone.wav" -> wavSmall(),
      "song.mp3" -> mp3Small()))
}
