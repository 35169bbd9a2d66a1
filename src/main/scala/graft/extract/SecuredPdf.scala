package graft.extract

import java.nio.charset.StandardCharsets.ISO_8859_1

/** Deterministic encrypted-PDF fixtures (writer side of [[PdfCrypt]]):
  * minimal but spec-conformant documents — real xref table, catalog/
  * pages/page objects — whose content stream is encrypted with the
  * standard security handler under an empty user password, exactly the
  * "secured" documents the reference's Tika/PDFBox path opens
  * transparently (ExtractTextProcessor.java:174-175).
  *
  * Two variants cover both cipher families:
  *  - `securedRc4`: V2/R3, 128-bit RC4, content Flate-compressed THEN
  *    encrypted (exercises the decrypt→inflate order);
  *  - `securedAes`: V4/R4 `/AESV2`, AES-128-CBC with IV-prefixed
  *    payload, stored uncompressed.
  *
  * The golden is the extracted TEXT (not bytes), so Deflater output
  * variance across zlib builds cannot break it — fixtures are
  * regenerated at query time from these builders.
  */
object SecuredPdf {

  private val FileId: Array[Byte] =
    (0 until 16).map(i => ((i * 37 + 11) & 0xff).toByte).toArray
  private val Perms = -3904 // print+copy denied owner bits, typical value

  val Rc4Text = "Secured payload: RC4 stream decrypted."
  val AesText = "Secured payload: AES-V2 stream decrypted."

  val Rc4Title = "Secured RC4 Title"
  val AesTitle = "Secured AES Title"

  def securedRc4(): Array[Byte] = {
    val o = PdfCrypt.computeO(Array.empty, Array.empty, r = 3, n = 16)
    val key = PdfCrypt.fileKey(Array.empty, o, Perms, FileId, r = 3, n = 16,
      encryptMetadata = true)
    val u = PdfCrypt.computeU(key, r = 3, FileId)
    val d = PdfCrypt.Decryptor(key, r = 3, aes = false, encryptMetadata = true)
    val plain = content(Rc4Text)
    val body = PdfCrypt.rc4(d.objKey(4, 0), deflate(plain))
    // Info strings encrypt with the Info OBJECT's key (§7.6.2), hex-form
    def s7(v: String) =
      hex(PdfCrypt.rc4(d.objKey(7, 0), v.getBytes(ISO_8859_1)))
    build(
      encDict = s"<< /Filter /Standard /V 2 /R 3 /Length 128 /P $Perms " +
        s"/O <${hex(o)}> /U <${hex(u)}> >>",
      contentDict = s"<< /Length ${body.length} /Filter /FlateDecode >>",
      contentBody = body,
      infoDict = s"<< /Title <${s7(Rc4Title)}> /Author <${s7("graft")}> >>")
  }

  /** `text` parameterizes the encrypted payload (default = the fixture
    * constant) so the synthetic heavy-extraction corpus
    * ([[SynthHeavyDocs]]) can plant per-document text behind real
    * AES-V2 encryption. */
  def securedAes(text: String = AesText): Array[Byte] = {
    val o = PdfCrypt.computeO(Array.empty, Array.empty, r = 4, n = 16)
    val key = PdfCrypt.fileKey(Array.empty, o, Perms, FileId, r = 4, n = 16,
      encryptMetadata = true)
    val u = PdfCrypt.computeU(key, r = 4, FileId)
    val d = PdfCrypt.Decryptor(key, r = 4, aes = true, encryptMetadata = true)
    val iv = (0 until 16).map(i => ((i * 19 + 3) & 0xff).toByte).toArray
    val body = PdfCrypt.aesCbcEncrypt(d.objKey(4, 0), iv, content(text))
    val iv2 = (0 until 16).map(i => ((i * 23 + 9) & 0xff).toByte).toArray
    def s7(v: String) =
      hex(PdfCrypt.aesCbcEncrypt(d.objKey(7, 0), iv2, v.getBytes(ISO_8859_1)))
    build(
      encDict = "<< /Filter /Standard /V 4 /R 4 /Length 128 " +
        "/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> " +
        s"/StmF /StdCF /StrF /StdCF /P $Perms " +
        s"/O <${hex(o)}> /U <${hex(u)}> >>",
      contentDict = s"<< /Length ${body.length} >>",
      contentBody = body,
      infoDict = s"<< /Title <${s7(AesTitle)}> /Author <${s7("graft")}> >>")
  }

  val AesV5Text = "Secured payload: AES-256 V5 stream decrypted."
  val AesV5Title = "Secured AES-256 Title"

  /** AES-256 (V5/R6) — the Acrobat X+ default. /U carries the
    * Algorithm-2.B validation hash + salts, /UE the wrapped file key,
    * /O //OE the owner-side equivalents (hashed over U), /Perms the
    * AES-ECB-sealed permission block; streams/strings use the 32-byte
    * file key directly with IV-prefixed CBC. */
  def securedAes256(): Array[Byte] = {
    def det(n: Int, a: Int, c: Int) =
      (0 until n).map(i => ((i * a + c) & 0xff).toByte).toArray
    val fileKey = det(32, 41, 13)
    val vSalt = det(8, 29, 5)
    val kSalt = det(8, 53, 17)
    val u = PdfCrypt.hash2B(Array.empty, vSalt, Array.empty) ++ vSalt ++ kSalt
    val ue = PdfCrypt.aesCbcRaw(javax.crypto.Cipher.ENCRYPT_MODE,
      PdfCrypt.hash2B(Array.empty, kSalt, Array.empty), new Array[Byte](16), fileKey)
    val ovSalt = det(8, 31, 7)
    val okSalt = det(8, 59, 23)
    val o = PdfCrypt.hash2B(Array.empty, ovSalt, u) ++ ovSalt ++ okSalt
    val oe = PdfCrypt.aesCbcRaw(javax.crypto.Cipher.ENCRYPT_MODE,
      PdfCrypt.hash2B(Array.empty, okSalt, u), new Array[Byte](16), fileKey)
    val permsBlock = Array[Byte](
      (Perms & 0xff).toByte, ((Perms >> 8) & 0xff).toByte,
      ((Perms >> 16) & 0xff).toByte, ((Perms >> 24) & 0xff).toByte,
      -1, -1, -1, -1, 'T', 'a', 'd', 'b') ++ det(4, 11, 3)
    val perms = try {
      val c = javax.crypto.Cipher.getInstance("AES/ECB/NoPadding")
      c.init(javax.crypto.Cipher.ENCRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(fileKey, "AES"))
      c.doFinal(permsBlock)
    } catch { case _: Exception => new Array[Byte](16) }
    val d = PdfCrypt.Decryptor(fileKey, r = 6, aes = true,
      encryptMetadata = true, v5 = true)
    val iv = det(16, 37, 21)
    val body = PdfCrypt.aesCbcEncrypt(d.objKey(4, 0), iv, content(AesV5Text))
    val iv2 = det(16, 43, 31)
    def s7(v: String) =
      hex(PdfCrypt.aesCbcEncrypt(d.objKey(7, 0), iv2, v.getBytes(ISO_8859_1)))
    build(
      encDict = "<< /Filter /Standard /V 5 /R 6 /Length 256 " +
        "/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> " +
        s"/StmF /StdCF /StrF /StdCF /P $Perms " +
        s"/O <${hex(o)}> /OE <${hex(oe)}> /U <${hex(u)}> /UE <${hex(ue)}> " +
        s"/Perms <${hex(perms)}> >>",
      contentDict = s"<< /Length ${body.length} >>",
      contentBody = body,
      infoDict = s"<< /Title <${s7(AesV5Title)}> /Author <${s7("graft")}> >>")
  }

  private def content(text: String): Array[Byte] =
    s"BT /F1 12 Tf 72 720 Td ($text) Tj ET".getBytes(ISO_8859_1)

  /** Assemble the 7-object document with a correct xref table. */
  private def build(encDict: String, contentDict: String,
                    contentBody: Array[Byte], infoDict: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    val offsets = new Array[Int](8)
    w("%PDF-1.4\n%âãÏÓ\n")
    def obj(num: Int)(body: => Unit): Unit = {
      offsets(num) = out.size()
      w(s"$num 0 obj\n"); body; w("\nendobj\n")
    }
    obj(1) { w("<< /Type /Catalog /Pages 2 0 R >>") }
    obj(2) { w("<< /Type /Pages /Kids [3 0 R] /Count 1 >>") }
    obj(3) { w("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      "/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>") }
    obj(4) { w(contentDict + "\nstream\n"); out.write(contentBody); w("\nendstream") }
    obj(5) { w("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>") }
    obj(6) { w(encDict) }
    obj(7) { w(infoDict) }
    val xref = out.size()
    w("xref\n0 8\n0000000000 65535 f \n")
    (1 to 7).foreach(i => w(f"${offsets(i)}%010d 00000 n \n"))
    w("trailer\n<< /Size 8 /Root 1 0 R /Encrypt 6 0 R /Info 7 0 R " +
      s"/ID [<${hex(FileId)}> <${hex(FileId)}>] >>\n" +
      s"startxref\n$xref\n%%EOF\n")
    out.toByteArray
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def hex(b: Array[Byte]): String = b.map(x => f"${x & 0xff}%02x").mkString
}
