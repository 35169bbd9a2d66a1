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

  test("images flow through the text pipeline as empty-text successes") {
    for ((bytes, name, mime) <- Seq(
        (MediaFixtures.jpegWithExif(), "photo.jpg", MimeDetect.Jpeg),
        (MediaFixtures.pngWithText(), "chart.png", MimeDetect.Png),
        (MediaFixtures.gifSmall(), "anim.gif", MimeDetect.Gif))) {
      val r = TextExtractor.extract(bytes, name)
      assert(r.error == null, s"$name error=${r.error}")
      assert(r.origMimeType == mime)
      assert(r.text == "")
    }
  }

  test("value-length and key-filter caps apply to image keys too") {
    val m = Metadata.extract(MediaFixtures.pngWithText(), "chart.png",
      Metadata.Options(maxValueLength = 4, keyFilter = Some("^tEXt:.*$"),
        keyPrefix = "media."))
    assert(m == Map("media.tEXt:Title" -> "Quar", "media.tEXt:Author" -> "graf"))
  }
}
