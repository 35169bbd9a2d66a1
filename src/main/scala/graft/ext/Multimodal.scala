package graft.ext

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-sized batches.
  *
  * The decode paths are REAL codecs: image payloads are genuine
  * PNG/BMP/TIFF containers (written by `javax.imageio` — pure JDK, no
  * external libraries) run through the actual `ImageIO` reader chain —
  * container sniffing via registered `ImageReader` SPIs (the same
  * auto-detect role Tika's detector plays for documents, cf. reference
  * ETP.java:156), raster decode, and a hand-rolled nearest-neighbor
  * resample over the decoded pixels; audio payloads are genuine
  * RIFF/WAVE containers run through the `javax.sound.sampled`
  * `AudioSystem` SPI chain ([[decodeAudio]]).
  *
  * Oracle strategy: the fixture generator plants images whose
  * dimensions AND pixel values are closed-form in `doc_id`
  * ([[plantedW]]/[[plantedH]]/[[plantedGray]]), so DuckDB can predict
  * every decoded pixel analytically without owning a codec. The only
  * way the Spark result matches is if a real encode→decode round trip
  * preserved the planted raster — which is exactly the claim "this
  * engine decodes images" reduced to a hash-checkable contract.
  *
  * Scale shape: generation, decode, and resize are all map-only (one
  * narrow pass, no shuffle); `mapPartitions` gives codecs the batch
  * shape they want (per-partition reader reuse, streaming iterator,
  * no per-row task overhead). At 100 TB the payload column never
  * moves except through these narrow maps.
  */
object Multimodal {

  // ImageIO defaults to a FILE-backed stream cache — one temp file per
  // image read, pure overhead for in-memory byte-array payloads. The
  // standard server-side setting; applies once per executor JVM when
  // the object loads.
  ImageIO.setUseCache(false)

  final case class MediaMeta(doc_id: Long, width: Int, height: Int,
                             format: String, px_sum: Long)
  implicit val mediaMetaEnc: Encoder[MediaMeta] = Encoders.product[MediaMeta]

  final case class ResizeMeta(doc_id: Long, px_checksum: Long, px_sum: Long)
  implicit val resizeMetaEnc: Encoder[ResizeMeta] = Encoders.product[ResizeMeta]

  // ---- planted-pattern fixture algebra (the oracle's closed form) ----

  /** Planted width/height in [8, 32] — small enough that a 5 000-doc
    * corpus encodes in milliseconds per partition, large enough that a
    * broken resample or channel swap cannot pass by luck. */
  def plantedW(id: Long): Int = (8 + id % 25).toInt
  def plantedH(id: Long): Int = (8 + (id * 7) % 25).toInt

  /** Gray value at (x, y): distinct coprime strides per axis make the
    * pattern asymmetric (x↔y transposition, flips, and off-by-one
    * resampling all shift the checksum). */
  def plantedGray(id: Long, x: Int, y: Int): Int =
    ((x * 3 + y * 5 + id) % 256).toInt

  /** Container per doc — the WRITER format name: every 4th BMP, every
    * (4k+2)th TIFF, the rest PNG — THREE distinct JDK codecs through
    * one auto-detecting decode path (TIFF closes the bare-`.tif` gap:
    * the JDK has shipped a TIFF ImageIO plugin since Java 9). */
  def plantedFormat(id: Long): String =
    if (id % 4 == 0) "bmp" else if (id % 4 == 2) "tiff" else "png"

  /** The format name the sniffing READER SPI reports for the planted
    * container — the JDK TIFF reader calls itself "tif", not "tiff". */
  def plantedSniffedFormat(id: Long): String =
    if (id % 4 == 2) "tif" else plantedFormat(id)

  /** Encodes the planted raster for `id` as a real PNG/BMP/TIFF via
    * `ImageIO.write`. Deterministic: dims, pixels, and container are
    * pure functions of `id`. */
  def syntheticImage(id: Long): Array[Byte] = {
    val (w, h) = (plantedW(id), plantedH(id))
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = plantedGray(id, x, y)
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, plantedFormat(id), bos)
    bos.toByteArray
  }

  /** Column form of [[syntheticImage]] for attaching payloads in a
    * query: per-row codec work has no built-in, so this is the
    * legitimate-UDF case (generation only; decode uses mapPartitions). */
  def syntheticImageCol(idCol: Column): Column = {
    val u = udf((id: Long) => syntheticImage(id))
    u(idCol)
  }

  // ---- real decode path ---------------------------------------------

  /** Sniffs the container and decodes the raster with the registered
    * `ImageReader` SPIs. Returns (width, height, formatName, graySum);
    * un-decodable bytes degrade to (-1, -1, "unknown", -1L) — the
    * wasError-route contract, never an executor crash. */
  def decodeImage(bytes: Array[Byte]): (Int, Int, String, Long) = {
    try {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) (-1, -1, "unknown", -1L)
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis)
            val img = reader.read(0)
            var sum = 0L
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                sum += (img.getRGB(x, y) & 0xff)
                x += 1
              }
              y += 1
            }
            (img.getWidth, img.getHeight,
              reader.getFormatName.toLowerCase(java.util.Locale.ROOT), sum)
          } finally reader.dispose()
        }
      } finally iis.close()
    } catch { case scala.util.control.NonFatal(_) => (-1, -1, "unknown", -1L) }
  }

  /** Batch decode over a binary column — mapPartitions keeps the batch
    * shape a codec wants (one task context per partition, streaming
    * iterator). Emits real decoded dimensions, the sniffed container
    * format, and the raster's gray-channel sum. */
  def decodeMeta(df: DataFrame, idCol: String, binCol: String): Dataset[MediaMeta] = {
    implicit val tupleEnc: Encoder[(Long, Array[Byte])] = Encoders.tuple(
      Encoders.scalaLong, Encoders.BINARY)
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (w, h, fmt, sum) = decodeImage(bytes)
          MediaMeta(id, w, h, fmt, sum)
        }
      }
  }

  /** Nearest-neighbor resample of a decoded image to `tw`×`th`: output
    * pixel (i, j) takes source pixel (i·w ∕ tw, j·h ∕ th) (integer
    * division — the convention the oracle mirrors). Returns the gray
    * grid row-major. */
  def resizeNearest(img: BufferedImage, tw: Int, th: Int): Array[Int] = {
    val (w, h) = (img.getWidth, img.getHeight)
    val out = new Array[Int](tw * th)
    var j = 0
    while (j < th) {
      var i = 0
      while (i < tw) {
        out(j * tw + i) = img.getRGB(i * w / tw, j * h / th) & 0xff
        i += 1
      }
      j += 1
    }
    out
  }

  /** Decode + nearest-neighbor resize to `tw`×`th`, summarized as two
    * integer contracts over the RESIZED raster: a positional checksum
    * Σ (j·tw + i + 1)·gray (order-sensitive — a transposed or flipped
    * resample fails) and the plain gray sum. Map-only; the payload
    * never shuffles. */
  def resizeChecksum(df: DataFrame, idCol: String, binCol: String,
                     tw: Int, th: Int): Dataset[ResizeMeta] = {
    implicit val tupleEnc: Encoder[(Long, Array[Byte])] = Encoders.tuple(
      Encoders.scalaLong, Encoders.BINARY)
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          try {
            val img = ImageIO.read(new ByteArrayInputStream(bytes))
            if (img == null) ResizeMeta(id, -1L, -1L)
            else {
              val g = resizeNearest(img, tw, th)
              var ck = 0L; var sum = 0L; var k = 0
              while (k < g.length) { ck += (k + 1L) * g(k); sum += g(k); k += 1 }
              ResizeMeta(id, ck, sum)
            }
          } catch { case scala.util.control.NonFatal(_) => ResizeMeta(id, -1L, -1L) }
        }
      }
  }

  // ---- perceptual hash (dHash) --------------------------------------

  final case class DHashMeta(doc_id: Long, dhash_hex: String)
  implicit val dhashMetaEnc: Encoder[DHashMeta] = Encoders.product[DHashMeta]

  /** 64-bit difference hash over the DECODED raster: nearest-neighbor
    * resample to a 9×8 grid, one bit per horizontal gradient
    * (px[x+1] > px[x]) — the standard perceptual-dedup fingerprint for
    * image corpora (brightness/contrast shifts preserve gradients, so
    * re-encoded or tone-mapped duplicates collide; the pigeonhole
    * banding of [[Dedup.simhashPairs]] applies unchanged for
    * hamming-k matching at scale). `None` for undecodable bytes. */
  def dhash64(bytes: Array[Byte]): Option[Long] =
    try {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val g = resizeNearest(img, 9, 8)
        var hash = 0L
        var j = 0
        while (j < 8) {
          var i = 0
          while (i < 8) {
            if (g(j * 9 + i + 1) > g(j * 9 + i)) hash |= (1L << (j * 8 + i))
            i += 1
          }
          j += 1
        }
        Some(hash)
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Decode + re-encode into another lossless container (png↔bmp) —
    * the "same image, different file" duplicate class a perceptual
    * fingerprint must catch and an exact byte hash cannot. */
  def reencode(bytes: Array[Byte]): Array[Byte] =
    try {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) Array.empty[Byte]
      else {
        // normalize to RGB first: BMP writers reject some source types
        val rgb = new BufferedImage(img.getWidth, img.getHeight,
          BufferedImage.TYPE_INT_RGB)
        rgb.getGraphics.drawImage(img, 0, 0, null)
        val fmt = if ((bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M'))
          "png" else "bmp"
        val bos = new ByteArrayOutputStream()
        ImageIO.write(rgb, fmt, bos)
        bos.toByteArray
      }
    } catch { case scala.util.control.NonFatal(_) => Array.empty[Byte] }

  def reencodeCol(binCol: Column): Column = {
    val u = udf((b: Array[Byte]) => reencode(b))
    u(binCol)
  }

  /** Batch dHash over a binary column — map-only, payload never
    * shuffles; emitted as unsigned hex so engines can't disagree on
    * Long sign. Undecodable rows emit ''. */
  def imageDhash(df: DataFrame, idCol: String, binCol: String): Dataset[DHashMeta] = {
    implicit val tupleEnc: Encoder[(Long, Array[Byte])] = Encoders.tuple(
      Encoders.scalaLong, Encoders.BINARY)
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          DHashMeta(id, dhash64(bytes).map(h => f"$h%016x").getOrElse(""))
        }
      }
  }

  final case class ImageProfile(doc_id: Long, width: Int, height: Int,
                                dhash_hex: String)
  implicit val imageProfileEnc: Encoder[ImageProfile] = Encoders.product[ImageProfile]

  /** ONE decode pass producing everything the image curation funnel
    * needs — dimensions (validity + size gates) and the perceptual
    * fingerprint (dedup). Decoding twice for two operators is the
    * kind of waste a 100 TB pass cannot afford; this is the fused
    * form. Undecodable rows emit (-1, -1, ''). */
  def imageProfile(df: DataFrame, idCol: String, binCol: String): Dataset[ImageProfile] = {
    implicit val tupleEnc: Encoder[(Long, Array[Byte])] = Encoders.tuple(
      Encoders.scalaLong, Encoders.BINARY)
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          try {
            val img = ImageIO.read(new ByteArrayInputStream(bytes))
            if (img == null) ImageProfile(id, -1, -1, "")
            else {
              val g = resizeNearest(img, 9, 8)
              var hash = 0L
              var j = 0
              while (j < 8) {
                var i = 0
                while (i < 8) {
                  if (g(j * 9 + i + 1) > g(j * 9 + i)) hash |= (1L << (j * 8 + i))
                  i += 1
                }
                j += 1
              }
              ImageProfile(id, img.getWidth, img.getHeight, f"$hash%016x")
            }
          } catch {
            case scala.util.control.NonFatal(_) => ImageProfile(id, -1, -1, "")
          }
        }
      }
  }

  // ---- EXIF-orientation-aware resize --------------------------------

  final case class OrientMeta(doc_id: Long, orientation: Int,
                              px_checksum: Long, px_sum: Long)
  implicit val orientMetaEnc: Encoder[OrientMeta] = Encoders.product[OrientMeta]

  /** Planted EXIF orientation, cycling ALL EIGHT spec values: 1
    * upright, 2 mirror-horizontal, 3 rotate-180, 4 mirror-vertical,
    * 5 transpose, 6 rotate-90-CW, 7 transverse, 8 rotate-90-CCW —
    * cameras mostly emit 1/3/6/8, but scanners and editors emit the
    * mirrored four, and a pipeline that silently passes them through
    * un-mirrored trains on flipped images. */
  def plantedOrientation(id: Long): Int = (1 + id % 8).toInt

  /** A genuine JPEG APP1/EXIF segment carrying the planted orientation:
    * SOI + APP1("Exif\0\0" + little-endian TIFF, one IFD, one
    * Orientation SHORT entry) + EOI. [[exifOrientation]] reads it back
    * through the REAL [[graft.extract.Metadata]] JPEG segment walk and
    * TIFF IFD reader — the parse is exercised, not looked up. */
  def syntheticExif(id: Long): Array[Byte] = {
    val o = plantedOrientation(id)
    val bos = new ByteArrayOutputStream()
    def b(v: Int): Unit = bos.write(v & 0xff)
    b(0xff); b(0xd8)                           // SOI
    val tiffLen = 8 + 2 + 12 + 4               // header + IFD(count,1 entry,next)
    val segLen = 2 + 6 + tiffLen               // incl. the length field itself
    b(0xff); b(0xe1); b(segLen >> 8); b(segLen)
    bos.write("Exif".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    b(0); b(0)
    b('I'); b('I'); b(42); b(0)                // II + 42 (little-endian)
    b(8); b(0); b(0); b(0)                     // IFD0 at offset 8
    b(1); b(0)                                 // one entry
    b(0x12); b(0x01)                           // tag 0x0112 Orientation
    b(3); b(0)                                 // type SHORT
    b(1); b(0); b(0); b(0)                     // count 1
    b(o); b(0); b(0); b(0)                     // value (LE, padded)
    b(0); b(0); b(0); b(0)                     // no next IFD
    b(0xff); b(0xd9)                           // EOI
    bos.toByteArray
  }

  /** Column form of [[syntheticExif]] (fixture generation only). */
  def syntheticExifCol(idCol: Column): Column = {
    val u = udf((id: Long) => syntheticExif(id))
    u(idCol)
  }

  /** EXIF Orientation via the real JPEG/TIFF metadata parser; 1 (the
    * EXIF default) when the tag is absent or the bytes undecodable. */
  def exifOrientation(jpegBytes: Array[Byte]): Int =
    graft.extract.Metadata.extract(jpegBytes, "sidecar.jpg")
      .get("Orientation").flatMap(_.toIntOption).getOrElse(1)

  /** Applies EXIF orientation `o` to a decoded raster's gray channel:
    * returns (displayWidth, displayHeight, row-major grays) of the
    * upright image. Handles ALL EIGHT spec values — the four
    * rotations (1/3/6/8) AND the four mirrored forms (2/4/5/7) that
    * scanners/editors emit; 5–8 swap the display dimensions. Display
    * pixel (x, y) pulls from the stored raster by the standard
    * inverse maps (6 = stored needs 90° CW to view: src(y, h−1−x);
    * 8 = 90° CCW: src(w−1−y, x); 3 = 180°; 2/4 = horizontal/vertical
    * mirror; 5 = transpose src(y, x); 7 = transverse). Out-of-range
    * values fall back to upright, the EXIF-default behavior. */
  def orientedGray(img: BufferedImage, o: Int): (Int, Int, Array[Int]) = {
    val (w, h) = (img.getWidth, img.getHeight)
    def g(x: Int, y: Int): Int = img.getRGB(x, y) & 0xff
    val (rw, rh) = if (o >= 5 && o <= 8) (h, w) else (w, h)
    val out = new Array[Int](rw * rh)
    var y = 0
    while (y < rh) {
      var x = 0
      while (x < rw) {
        out(y * rw + x) = o match {
          case 2 => g(w - 1 - x, y)
          case 3 => g(w - 1 - x, h - 1 - y)
          case 4 => g(x, h - 1 - y)
          case 5 => g(y, x)
          case 6 => g(y, h - 1 - x)
          case 7 => g(w - 1 - y, h - 1 - x)
          case 8 => g(w - 1 - y, x)
          case _ => g(x, y)
        }
        x += 1
      }
      y += 1
    }
    (rw, rh, out)
  }

  /** Orientation-aware [[resizeChecksum]] — what every real image
    * pipeline must do before training: parse Orientation from the EXIF
    * sidecar (real Metadata TIFF walk), rotate the DECODED raster
    * upright, then nearest-neighbor resample to `tw`×`th` and checksum
    * the output. Map-only; neither payload nor sidecar shuffles. */
  def resizeOrientedChecksum(df: DataFrame, idCol: String, binCol: String,
                             exifCol: String, tw: Int, th: Int): Dataset[OrientMeta] = {
    implicit val tupleEnc: Encoder[(Long, Array[Byte], Array[Byte])] = Encoders.tuple(
      Encoders.scalaLong, Encoders.BINARY, Encoders.BINARY)
    df.select(col(idCol).cast("long"), col(binCol), col(exifCol))
      .as[(Long, Array[Byte], Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes, exif) =>
          try {
            val img = ImageIO.read(new ByteArrayInputStream(bytes))
            if (img == null) OrientMeta(id, -1, -1L, -1L)
            else {
              val o = exifOrientation(exif)
              val (rw, rh, grays) = orientedGray(img, o)
              var ck = 0L; var sum = 0L
              var j = 0
              while (j < th) {
                var i = 0
                while (i < tw) {
                  val g = grays((j * rh / th) * rw + (i * rw / tw))
                  ck += (j.toLong * tw + i + 1) * g
                  sum += g
                  i += 1
                }
                j += 1
              }
              OrientMeta(id, o, ck, sum)
            }
          } catch { case scala.util.control.NonFatal(_) => OrientMeta(id, -1, -1L, -1L) }
        }
      }
  }

  // ---- real audio decode path (WAV via javax.sound.sampled) ----------

  // AudioSystem.getAudioInputStream / AudioSystem.write route every
  // call through the JDK's provider registry, whose lookup
  // (sun.media.sound JDK13Services.getProviders) is a GLOBAL
  // `static synchronized` — 32 executor threads decoding one small WAV
  // per row serialize on that lock (measured: audio decode ran ~5× the
  // equivalent ImageIO path, which has no such global lock on reads).
  // Snapshot the SAME registered SPI lists once per executor JVM via
  // ServiceLoader (the identical discovery mechanism the registry
  // uses) and drive the sniffing chain lock-free: each reader gets to
  // inspect the stream and throws UnsupportedAudioFileException to
  // pass — byte-for-byte the AudioSystem contract, minus the lock.
  private lazy val audioReaders: Seq[javax.sound.sampled.spi.AudioFileReader] = {
    val it = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
    val b = Seq.newBuilder[javax.sound.sampled.spi.AudioFileReader]
    while (it.hasNext) b += it.next()
    // WAVE first (the dominant container; its sniff is a 4-byte RIFF
    // check), the MIDI softsynth reader LAST: its "sniff" is a full
    // MidiSystem.getSequence parse that re-enters the global provider
    // lock and throws a stack-trace-bearing exception for every
    // non-MIDI payload (thread dumps showed 31/32 decode threads
    // BLOCKED on JSSecurityManager when it ran early in the chain).
    b.result().sortBy(_.getClass.getSimpleName match {
      case "WaveFileReader"              => 0
      case s if s.contains("Midi")       => 9
      case _                             => 1
    })
  }

  /** True iff the payload carries the standard-MIDI 4-byte magic
    * 'MThd' — the precondition under which the SoftMidi reader can
    * possibly succeed (its delegate StandardMidiFileReader rejects any
    * other magic, after an expensive globally-locked parse attempt).
    * Gating on the magic is therefore behavior-preserving. */
  private def midiMagic(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 && bytes(0) == 'M' && bytes(1) == 'T' &&
      bytes(2) == 'h' && bytes(3) == 'd'
  private lazy val wavWriter: javax.sound.sampled.spi.AudioFileWriter = {
    val it = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileWriter]).iterator()
    var found: javax.sound.sampled.spi.AudioFileWriter = null
    while (found == null && it.hasNext) {
      val w = it.next()
      if (w.isFileTypeSupported(javax.sound.sampled.AudioFileFormat.Type.WAVE))
        found = w
    }
    require(found != null, "no WAVE AudioFileWriter SPI registered")
    found
  }

  /** [[javax.sound.sampled.AudioSystem.getAudioInputStream]] semantics
    * over the cached SPI snapshot: first reader that recognizes the
    * container wins; none ⇒ UnsupportedAudioFileException, exactly as
    * the registry path behaves. */
  private def sniffAudio(bytes: Array[Byte]): javax.sound.sampled.AudioInputStream = {
    val readers = audioReaders.iterator
    while (readers.hasNext) {
      val r = readers.next()
      val skip = r.getClass.getSimpleName.contains("Midi") && !midiMagic(bytes)
      if (!skip) {
        try return r.getAudioInputStream(new ByteArrayInputStream(bytes))
        catch { case _: javax.sound.sampled.UnsupportedAudioFileException => }
      }
    }
    throw new javax.sound.sampled.UnsupportedAudioFileException(
      "no registered AudioFileReader recognizes the payload")
  }

  final case class AudioMeta(doc_id: Long, n_samples: Int, sample_rate: Int,
                             channels: Int, sample_sum: Long, sample_checksum: Long)
  implicit val audioMetaEnc: Encoder[AudioMeta] = Encoders.product[AudioMeta]

  /** Planted sample count in [64, 192] — the audio analogue of
    * [[plantedW]]/[[plantedH]]. */
  def plantedSamples(id: Long): Int = (64 + id % 129).toInt

  /** Planted 16-bit PCM sample k: coprime strides over a ±2048 swing —
    * signed values make a sign-extension or endianness slip flip the
    * sum; the positional checksum catches reordered/dropped frames. */
  def plantedSample(id: Long, k: Int): Int =
    (((id * 31 + k.toLong * 17) % 4096) - 2048).toInt

  /** Encodes the planted PCM for `id` as a REAL RIFF/WAVE container via
    * `javax.sound.sampled.AudioSystem.write` (pure JDK): 16-bit signed
    * little-endian mono at 8 kHz. Deterministic in `id`. */
  def syntheticWav(id: Long): Array[Byte] = {
    val n = plantedSamples(id)
    val pcm = new Array[Byte](n * 2)
    var k = 0
    while (k < n) {
      val v = plantedSample(id, k)
      pcm(2 * k) = (v & 0xff).toByte
      pcm(2 * k + 1) = ((v >> 8) & 0xff).toByte
      k += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new ByteArrayOutputStream()
    wavWriter.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Column form of [[syntheticWav]] (generation only — the legitimate
    * per-row-codec UDF case, like [[syntheticImageCol]]). */
  def syntheticWavCol(idCol: Column): Column = {
    val u = udf((id: Long) => syntheticWav(id))
    u(idCol)
  }

  /** Decodes an audio container through the real `AudioSystem` SPI
    * chain (container sniffing + header parse + frame stream) and
    * summarizes the decoded samples: frame count, declared rate and
    * channel count, plain sample sum, and the order-sensitive
    * positional checksum Σ (k+1)·s(k) over frame index k (first
    * channel). Only 16-bit SIGNED integer PCM is summarized
    * ([[summarizableAudio]]) — anything else (unsigned, float, or
    * undecodable bytes) degrades to the (-1, …) error contract. */
  /** True iff [[decodeAudio]]'s signed-16-bit summation arithmetic is
    * valid for this format: 16-bit SIGNED integer PCM with a concrete
    * frame size. An unsigned or float 16-bit format reaching the
    * signed loop would produce silently-wrong sums — those degrade to
    * the error contract instead. */
  def summarizableAudio(f: javax.sound.sampled.AudioFormat): Boolean =
    f.getSampleSizeInBits == 16 && f.getFrameSize > 0 &&
      f.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED

  def decodeAudio(bytes: Array[Byte]): (Int, Int, Int, Long, Long) = {
    try {
      val ais = sniffAudio(bytes)
      try {
        val f = ais.getFormat
        val bytesPerFrame = f.getFrameSize
        if (!summarizableAudio(f)) (-1, -1, -1, -1L, -1L)
        else {
          val data = ais.readAllBytes()
          val n = data.length / bytesPerFrame
          val big = f.isBigEndian
          var sum = 0L
          var ck = 0L
          var k = 0
          while (k < n) {
            val off = k * bytesPerFrame // first channel of the frame
            val s =
              if (big) ((data(off) << 8) | (data(off + 1) & 0xff)).toShort.toInt
              else ((data(off + 1) << 8) | (data(off) & 0xff)).toShort.toInt
            sum += s
            ck += (k + 1L) * s
            k += 1
          }
          (n, f.getSampleRate.toInt, f.getChannels, sum, ck)
        }
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => (-1, -1, -1, -1L, -1L) }
  }

  /** Batch audio decode over a binary column — same mapPartitions
    * shape as [[decodeMeta]]: map-only, payload never shuffles. */
  def decodeAudioMeta(df: DataFrame, idCol: String, binCol: String): Dataset[AudioMeta] = {
    implicit val tupleEnc: Encoder[(Long, Array[Byte])] = Encoders.tuple(
      Encoders.scalaLong, Encoders.BINARY)
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (n, rate, ch, sum, ck) = decodeAudio(bytes)
          AudioMeta(id, n, rate, ch, sum, ck)
        }
      }
  }

  // ---- MP4 / ISO BMFF container metadata -----------------------------

  final case class VideoMeta(doc_id: Long, duration_ms: Long, n_tracks: Int,
                             codecs: String, width: Int, height: Int)
  implicit val videoMetaEnc: Encoder[VideoMeta] = Encoders.product[VideoMeta]

  /** Planted closed forms for the synthetic MP4 fixtures — the oracle's
    * algebra (SQL mirrors these expressions verbatim). Builder and
    * walker live in [[graft.extract.Bmff]] (shared with the T5
    * Metadata surface); these delegate. */
  def plantedDurationMs(id: Long): Long = graft.extract.Bmff.plantedDurationMs(id)
  def plantedTracks(id: Long): Int = graft.extract.Bmff.plantedTracks(id)
  def plantedVideoW(id: Long): Int = graft.extract.Bmff.plantedVideoW(id)
  def plantedVideoH(id: Long): Int = graft.extract.Bmff.plantedVideoH(id)
  def syntheticMp4(id: Long): Array[Byte] = graft.extract.Bmff.syntheticMp4(id)

  def syntheticMp4Col(idCol: Column): Column = {
    val u = udf((id: Long) => syntheticMp4(id))
    u(idCol)
  }

  /** Walks the real box tree (shared [[graft.extract.Bmff]] walker —
    * also the T5 `Metadata` surface for `video/mp4`): top-level sizes,
    * `moov` recursion, `mvhd` timescale→ms conversion, per-`trak`
    * `tkhd` 16.16 dims and `stsd` sample-entry fourccs (document
    * order, comma-joined). A payload that is not BMFF degrades to the
    * (-1, …) error contract, like [[decodeAudio]]. */
  def parseMp4Meta(bytes: Array[Byte]): (Long, Int, String, Int, Int) =
    graft.extract.Bmff.parse(bytes)

  /** Batch MP4 metadata over a binary column — map-only, the payload
    * never shuffles (same shape as [[decodeAudioMeta]]). */
  def videoMeta(df: DataFrame, idCol: String, binCol: String): Dataset[VideoMeta] = {
    implicit val tupleEnc: Encoder[(Long, Array[Byte])] = Encoders.tuple(
      Encoders.scalaLong, Encoders.BINARY)
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (dur, n, cc, w, h) = parseMp4Meta(bytes)
          VideoMeta(id, dur, n, cc, w, h)
        }
      }
  }

  // ---- audio perceptual fingerprint ----------------------------------

  final case class AudioFp(doc_id: Long, afp_hex: String)
  implicit val audioFpEnc: Encoder[AudioFp] = Encoders.product[AudioFp]

  /** 32-bit energy-gradient fingerprint over the DECODED samples — the
    * audio analogue of the image dHash (and the third leg of the
    * perceptual-dedup family beside text SimHash): the clip splits
    * into 33 index windows (window of sample k = k·33/n), each
    * window's energy is the exact integer Σ s², and bit w is set iff
    * window w+1 carries more energy than window w. Loudness scaling
    * preserves energy ORDER, so re-gained copies collide; undecodable
    * or non-PCM-16 input emits ''. Map-only. */
  def audioFingerprint32(bytes: Array[Byte]): Option[Int] =
    try {
      val ais = sniffAudio(bytes)
      try {
        val f = ais.getFormat
        if (!summarizableAudio(f)) None
        else {
          val data = ais.readAllBytes()
          val bpf = f.getFrameSize
          val n = data.length / bpf
          if (n == 0) None
          else {
            val big = f.isBigEndian
            val e = new Array[Long](33)
            var k = 0
            while (k < n) {
              val off = k * bpf
              val s =
                if (big) ((data(off) << 8) | (data(off + 1) & 0xff)).toShort.toInt
                else ((data(off + 1) << 8) | (data(off) & 0xff)).toShort.toInt
              e((k * 33 / n).toInt) += s.toLong * s
              k += 1
            }
            var hash = 0
            var w = 0
            while (w < 32) {
              if (e(w + 1) > e(w)) hash |= (1 << w)
              w += 1
            }
            Some(hash)
          }
        }
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  def audioFingerprint(df: DataFrame, idCol: String, binCol: String): Dataset[AudioFp] = {
    implicit val tupleEnc: Encoder[(Long, Array[Byte])] = Encoders.tuple(
      Encoders.scalaLong, Encoders.BINARY)
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          AudioFp(id, audioFingerprint32(bytes).map(h => f"$h%08x").getOrElse(""))
        }
      }
  }

  // ---- frame sampling (pure column algebra, no codec) ----------------

  /** Video-style frame sampling over a binary payload: the column is
    * treated as fixed-size frames and every `every`-th frame is
    * emitted as its own row — pure column algebra (sequence + explode
    * + byte-substring), fully codegen'd, no UDF. At scale this is a
    * narrow 1→N row transform; frames stay binary for a downstream
    * decoder. */
  def frameSample(df: DataFrame, idCol: String, binCol: String,
                  frameSize: Int, every: Int = 1): DataFrame = {
    val nFrames = ceil(length(col(binCol)).cast("double") / frameSize).cast("int")
    df.select(col(idCol), col(binCol),
        explode(sequence(lit(0), greatest(nFrames - 1, lit(0)), lit(every)))
          .as("frame_idx"))
      .select(col(idCol), col("frame_idx"),
        expr(s"substring($binCol, frame_idx * $frameSize + 1, $frameSize)").as("frame"))
  }
}
