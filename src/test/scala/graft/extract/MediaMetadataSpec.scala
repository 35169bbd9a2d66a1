package graft.extract

import org.scalatest.funsuite.AnyFunSuite

/** Image metadata extraction (ExtractMediaMetadata's media-first usage)
  * over synthetic fixtures: JPEG + spliced EXIF APP1, PNG + tEXt
  * chunks, GIF header. */
class MediaMetadataSpec extends AnyFunSuite {

  test("jpeg: SOF dimensions and EXIF TIFF tags") {
    val m = Metadata.extract(MediaFixtures.jpegWithExif(), "photo.jpg")
    assert(m("Content-Type") == MimeDetect.Jpeg)
    assert(m("Image-Width") == "8" && m("Image-Height") == "6")
    assert(m("Orientation") == "6")
    assert(m("Make") == "GraftCam" && m("Model") == "GC-100")
    assert(m("DateTime") == "2024:05:06 07:08:09")
    assert(m("DateTimeOriginal") == "2024:05:06 07:08:01")
  }

  test("png: IHDR structure and tEXt key-values") {
    val m = Metadata.extract(MediaFixtures.pngWithText(), "chart.png")
    assert(m("Content-Type") == MimeDetect.Png)
    assert(m("Image-Width") == "9" && m("Image-Height") == "7")
    assert(m("Bit-Depth") == "8" && m("Color-Type") == "2")
    assert(m("tEXt:Title") == "Quarterly Chart")
    assert(m("tEXt:Author") == "graft")
  }

  test("gif: logical-screen dimensions") {
    val m = Metadata.extract(MediaFixtures.gifSmall(), "anim.gif")
    assert(m("Content-Type") == MimeDetect.Gif)
    assert(m("Image-Width") == "11" && m("Image-Height") == "5")
  }

  test("media flow through the text pipeline as empty-text successes") {
    for ((bytes, name, mime) <- Seq(
        (MediaFixtures.jpegWithExif(), "photo.jpg", MimeDetect.Jpeg),
        (MediaFixtures.pngWithText(), "chart.png", MimeDetect.Png),
        (MediaFixtures.gifSmall(), "anim.gif", MimeDetect.Gif),
        (MediaFixtures.wavSmall(), "tone.wav", MimeDetect.Wav),
        (Bmff.syntheticMp4(7L), "clip.mp4", MimeDetect.Mp4))) {
      val r = TextExtractor.extract(bytes, name)
      assert(r.error == null, s"$name error=${r.error}")
      assert(r.origMimeType == mime)
      assert(r.text == "", s"$name leaked binary as text: ${r.text.take(40)}")
    }
  }

  test("mp4 and wav container attributes surface through Metadata") {
    val v = Metadata.extract(Bmff.syntheticMp4(7L), "clip.mp4")
    assert(v("Content-Type") == MimeDetect.Mp4)
    assert(v("Duration-Ms") == "1007" && v("Track-Count") == "2")
    assert(v("Codecs") == "avc1,mp4a")
    assert(v("Image-Width") == "432" && v("Image-Height") == "272")
    val a = Metadata.extract(MediaFixtures.wavSmall(), "tone.wav")
    assert(a("Content-Type") == MimeDetect.Wav)
    assert(a("Channels") == "1" && a("Sample-Rate") == "8000")
    assert(a("Bits-Per-Sample") == "16" && a("Duration-Ms") == "500")
  }

  test("mp3: ID3v2.3 text frames, frame-header attributes, walked duration") {
    val m = Metadata.extract(MediaFixtures.mp3Small(), "song.mp3")
    assert(m("Content-Type") == MimeDetect.Mp3)
    assert(m("Title") == "Graft Anthem" && m("Artist") == "The Graftones")
    assert(m("Album") == "Synthetic Sounds" && m("Year") == "2024")
    assert(m("MPEG-Version") == "1" && m("Layer") == "3")
    assert(m("Bitrate") == "128000" && m("Sample-Rate") == "44100")
    assert(m("Channels") == "2")
    // 38 frames × 1152 samples / 44100 Hz = 992 ms (floor)
    assert(m("Duration-Ms") == "992")
    val r = TextExtractor.extract(MediaFixtures.mp3Small(), "song.mp3")
    assert(r.error == null && r.origMimeType == MimeDetect.Mp3 && r.text == "")
  }

  test("mp3: bare Layer-III sync detected; UTF-16 BOM and junk are not") {
    val fx = MediaFixtures.mp3Small()
    val bare = fx.drop(fx.length - 38 * 417) // strip the ID3 tag
    assert(bare(0) == 0xff.toByte)
    assert(MimeDetect.detect(bare, "clip.mp3") == MimeDetect.Mp3)
    val utf16 = Array(0xff, 0xfe, 'A', 0, 'B', 0).map(_.toByte)
    assert(MimeDetect.detect(utf16, "note.txt") != MimeDetect.Mp3)
    // truncated/corrupt tags must not throw — error-isolation contract
    val fixture = MediaFixtures.mp3Small()
    for (cut <- Seq(1, 3, 9, 11, 40, 117))
      Metadata.extract(fixture.take(cut), "song.mp3")
    val mangled = fixture.clone(); mangled(6) = 0x7f.toByte // huge tag size
    Metadata.extract(mangled, "song.mp3")
  }

  test("value-length and key-filter caps apply to image keys too") {
    val m = Metadata.extract(MediaFixtures.pngWithText(), "chart.png",
      Metadata.Options(maxValueLength = 4, keyFilter = Some("^tEXt:.*$"),
        keyPrefix = "media."))
    assert(m == Map("media.tEXt:Title" -> "Quar", "media.tEXt:Author" -> "graf"))
  }
}
