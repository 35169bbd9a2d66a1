package graft.extract

import java.security.MessageDigest

/** PDF standard security handler (ISO 32000-1 §7.6.3, public spec):
  * empty-user-password decryption for the RC4 (V1/V2, R2/R3) and
  * AES-128-CBC (V4 `/AESV2`, R4) variants — the overwhelming majority
  * of real-world "secured" PDFs, which are readable by anyone (owner
  * restrictions only). Mirrors the transparent-decryption behavior of
  * the reference's Tika/PDFBox path (ExtractTextProcessor.java:174-175,
  * PDFBox 2.0.24 per the processor pom): such documents extract
  * normally instead of routing to failure as binary noise.
  *
  * Scope: file-key derivation (Algorithm 2), /U verification
  * (Algorithms 4/5), per-object keys (Algorithm 1), RC4 and
  * AES-CBC stream decryption. Password-protected documents (non-empty
  * user password) and V5/AES-256 are out of scope — V5 uses SHA-2 and
  * appears almost exclusively alongside real passwords.
  *
  * All primitives are from the public spec: MD5 via
  * `java.security.MessageDigest`, AES via `javax.crypto`, RC4
  * implemented inline (15 lines, spec pseudo-code).
  */
object PdfCrypt {

  /** §7.6.3.3 padding string — spec constant. */
  private[extract] val Pad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  /** Parsed /Encrypt parameters plus the derived file key. `v5` marks
    * AES-256 (V5/R6) documents, whose 32-byte file key is used
    * directly for every object (ISO 32000-2 dropped the per-object
    * MD5 derivation). */
  final case class Decryptor(fileKey: Array[Byte], r: Int, aes: Boolean,
                             encryptMetadata: Boolean, v5: Boolean = false) {
    /** Algorithm 1 key for object (num, gen). */
    def objKey(num: Int, gen: Int): Array[Byte] = {
      if (v5) return fileKey
      val md = MessageDigest.getInstance("MD5")
      md.update(fileKey)
      md.update(Array[Byte](
        (num & 0xff).toByte, ((num >> 8) & 0xff).toByte, ((num >> 16) & 0xff).toByte,
        (gen & 0xff).toByte, ((gen >> 8) & 0xff).toByte))
      if (aes) md.update(Array[Byte](0x73, 0x41, 0x6C, 0x54)) // "sAlT"
      md.digest().take(math.min(fileKey.length + 5, 16))
    }

    /** Decrypt one string/stream body belonging to object (num, gen).
      * AES data carries its IV in the first 16 bytes. */
    def decrypt(num: Int, gen: Int, data: Array[Byte]): Array[Byte] =
      if (aes) aesCbcDecrypt(objKey(num, gen), data)
      else rc4(objKey(num, gen), data)
  }

  /** Inspect `bytes` for standard-security encryption; return a
    * [[Decryptor]] iff the document is encrypted AND the empty user
    * password opens it (verified against /U). `None` for unencrypted
    * documents and for genuinely password-protected ones. */
  def decryptor(bytes: Array[Byte]): Option[Decryptor] = {
    // cheap byte-scan gate: unencrypted documents (the common case)
    // never pay the full latin-1 String allocation below
    if (!containsBytes(bytes, "/Encrypt")) return None
    val text = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    encryptDict(text).filter(_.contains("/Standard")).flatMap { dict =>
      val v = intAfter(dict, "/V").getOrElse(1)
      val encMeta = !dict.contains("/EncryptMetadata false") &&
        !dict.contains("/EncryptMetadata  false")
      if (v >= 5) decryptorV5(dict, encMeta)
      else for {
        o <- pdfString(dict, "/O") if o.length >= 32
        u <- pdfString(dict, "/U") if u.length >= 16
        p <- intAfter(dict, "/P")
        r = intAfter(dict, "/R").getOrElse(if (v >= 2) 3 else 2)
        lengthBits = intAfter(dict, "/Length").getOrElse(40)
        id = firstFileId(text).getOrElse(Array.empty[Byte])
        n = if (r == 2) 5 else lengthBits / 8
        key = fileKey(Array.empty, o, p, id, r, n, encMeta)
        if userPasswordMatches(key, r, id, u)
      } yield Decryptor(key, r, v >= 4 && dict.contains("/AESV2"), encMeta)
    }
  }

  /** AES-256 (V5/R6, ISO 32000-2 §7.6.4): validate the empty user
    * password against /U's validation hash (Algorithm 2.B hardened
    * SHA-2/AES chain), then unwrap the 32-byte file key from /UE with
    * the intermediate key (AES-256-CBC, zero IV, no padding). The file
    * key is used directly for every object. */
  private def decryptorV5(dict: String, encMeta: Boolean): Option[Decryptor] =
    for {
      u <- pdfString(dict, "/U") if u.length >= 48
      ue <- pdfString(dict, "/UE") if ue.length >= 32
      vSalt = u.slice(32, 40)
      kSalt = u.slice(40, 48)
      if java.util.Arrays.equals(
        hash2B(Array.empty, vSalt, Array.empty), u.take(32))
      ikey = hash2B(Array.empty, kSalt, Array.empty)
      key = aesCbcRaw(javax.crypto.Cipher.DECRYPT_MODE, ikey,
        new Array[Byte](16), ue.take(32))
      if key.length == 32
    } yield Decryptor(key, r = 6, aes = true, encryptMetadata = encMeta,
      v5 = true)

  /** Algorithm 2.B (R6) password hash: SHA-256 seed, then rounds of
    * (64× repeated input) → AES-128-CBC with K's halves as key/IV →
    * SHA-256/384/512 picked by the first-16-bytes-mod-3; at least 64
    * rounds, stopping when E's last byte ≤ rounds − 32. */
  private[extract] def hash2B(pwd: Array[Byte], salt: Array[Byte],
                              udata: Array[Byte]): Array[Byte] = {
    var k = MessageDigest.getInstance("SHA-256").digest(pwd ++ salt ++ udata)
    var round = 0
    var done = false
    while (!done) {
      val unit = pwd ++ k ++ udata
      val k1 = new Array[Byte](unit.length * 64)
      var i = 0
      while (i < 64) { System.arraycopy(unit, 0, k1, i * unit.length, unit.length); i += 1 }
      val e = aesCbcRaw(javax.crypto.Cipher.ENCRYPT_MODE,
        k.take(16), k.slice(16, 32), k1)
      val mod = e.take(16).map(_ & 0xff).sum % 3
      k = MessageDigest.getInstance(
        mod match { case 0 => "SHA-256"; case 1 => "SHA-384"; case _ => "SHA-512" })
        .digest(e)
      round += 1
      done = round >= 64 && (e(e.length - 1) & 0xff) <= round - 32
    }
    k.take(32)
  }

  /** AES-CBC, NO padding, explicit IV — the R6 hash/key-wrap form
    * (plaintext lengths are block-aligned by construction). */
  private[extract] def aesCbcRaw(mode: Int, key: Array[Byte], iv: Array[Byte],
                                 data: Array[Byte]): Array[Byte] =
    try {
      val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
      c.init(mode, new javax.crypto.spec.SecretKeySpec(key, "AES"),
        new javax.crypto.spec.IvParameterSpec(iv))
      c.doFinal(data)
    } catch { case _: Exception => Array.empty[Byte] }

  /** Algorithm 2: file encryption key from a (padded) user password. */
  private[extract] def fileKey(pwd: Array[Byte], o: Array[Byte], p: Int,
                               id0: Array[Byte], r: Int, n: Int,
                               encryptMetadata: Boolean): Array[Byte] = {
    val md = MessageDigest.getInstance("MD5")
    md.update(padded(pwd))
    md.update(o, 0, 32)
    md.update(Array[Byte](
      (p & 0xff).toByte, ((p >> 8) & 0xff).toByte,
      ((p >> 16) & 0xff).toByte, ((p >> 24) & 0xff).toByte))
    md.update(id0)
    if (r >= 4 && !encryptMetadata)
      md.update(Array[Byte](-1, -1, -1, -1))
    var h = md.digest()
    if (r >= 3) {
      var i = 0
      while (i < 50) {
        h = MessageDigest.getInstance("MD5").digest(h.take(n))
        i += 1
      }
    }
    h.take(n)
  }

  /** Algorithms 4/5: does the empty user password reproduce /U? */
  private def userPasswordMatches(key: Array[Byte], r: Int,
                                  id0: Array[Byte], u: Array[Byte]): Boolean = {
    val expect = computeU(key, r, id0)
    val cmp = if (r == 2) 32 else 16
    java.util.Arrays.equals(expect.take(cmp), u.take(cmp))
  }

  /** Algorithm 4 (R2) / Algorithm 5 (R≥3): the /U entry value. */
  private[extract] def computeU(key: Array[Byte], r: Int,
                                id0: Array[Byte]): Array[Byte] =
    if (r == 2) rc4(key, Pad)
    else {
      val md = MessageDigest.getInstance("MD5")
      md.update(Pad)
      md.update(id0)
      var data = rc4(key, md.digest())
      var i = 1
      while (i <= 19) {
        data = rc4(key.map(b => (b ^ i).toByte), data)
        i += 1
      }
      data ++ new Array[Byte](16)
    }

  /** Algorithm 3: the /O entry from owner+user passwords (writer side —
    * used by the fixture builder; the reader never needs it beyond its
    * role as Algorithm-2 input). */
  private[extract] def computeO(ownerPwd: Array[Byte], userPwd: Array[Byte],
                                r: Int, n: Int): Array[Byte] = {
    var h = MessageDigest.getInstance("MD5").digest(padded(ownerPwd))
    if (r >= 3) {
      var i = 0
      while (i < 50) { h = MessageDigest.getInstance("MD5").digest(h); i += 1 }
    }
    val key = h.take(n)
    var data = rc4(key, padded(userPwd))
    if (r >= 3) {
      var i = 1
      while (i <= 19) {
        data = rc4(key.map(b => (b ^ i).toByte), data)
        i += 1
      }
    }
    data
  }

  private def padded(pwd: Array[Byte]): Array[Byte] =
    (pwd.take(32) ++ Pad).take(32)

  // ---- primitives ----------------------------------------------------

  /** RC4 (spec pseudo-code; symmetric — same routine encrypts). */
  private[extract] def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = Array.tabulate(256)(identity)
    var j = 0
    var i = 0
    while (i < 256) {
      j = (j + s(i) + (key(i % key.length) & 0xff)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      i += 1
    }
    val out = new Array[Byte](data.length)
    var x = 0; var y = 0; var k = 0
    while (k < data.length) {
      x = (x + 1) & 0xff
      y = (y + s(x)) & 0xff
      val t = s(x); s(x) = s(y); s(y) = t
      out(k) = (data(k) ^ s((s(x) + s(y)) & 0xff)).toByte
      k += 1
    }
    out
  }

  /** AES-128-CBC with the IV in the first 16 bytes (§7.6.2); PKCS#5
    * padding handled by the JCE cipher. Returns empty on malformed
    * input rather than throwing — extraction degrades, never crashes. */
  private[extract] def aesCbcDecrypt(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    // stream data may carry a trailing EOL before `endstream` (§7.3.8.1)
    // that a keyword-scanning reader picks up — trim to the block grid
    val len = if (data.length < 16) 0 else data.length - ((data.length - 16) % 16)
    if (len < 32) Array.empty
    else try {
      val c = javax.crypto.Cipher.getInstance("AES/CBC/PKCS5Padding")
      c.init(javax.crypto.Cipher.DECRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(key, "AES"),
        new javax.crypto.spec.IvParameterSpec(data.take(16)))
      c.doFinal(data, 16, len - 16)
    } catch { case _: Exception => Array.empty[Byte] }
  }

  /** Writer-side AES-128-CBC: IV prepended, PKCS#5 padded (fixtures). */
  private[extract] def aesCbcEncrypt(key: Array[Byte], iv: Array[Byte],
                                     data: Array[Byte]): Array[Byte] = {
    val c = javax.crypto.Cipher.getInstance("AES/CBC/PKCS5Padding")
    c.init(javax.crypto.Cipher.ENCRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.IvParameterSpec(iv))
    iv ++ c.doFinal(data)
  }

  // ---- /Encrypt dictionary parsing -----------------------------------

  /** The /Encrypt dictionary body: resolve `/Encrypt N G R` to object
    * `N G obj … endobj` (last occurrence wins — incremental updates),
    * or use an inline dictionary directly. Returned as latin-1 text
    * (1:1 with bytes, so binary /O //U strings survive). */
  private def encryptDict(text: String): Option[String] = {
    val ref = "/Encrypt\\s+(\\d+)\\s+(\\d+)\\s+R".r
    ref.findAllMatchIn(text).toList.lastOption match {
      case Some(m) =>
        val header = s"(?<![0-9])${m.group(1)}\\s+${m.group(2)}\\s+obj".r
        header.findAllMatchIn(text).toList.lastOption.map { h =>
          val end = text.indexOf("endobj", h.end)
          text.substring(h.end, if (end < 0) text.length else end)
        }
      case None =>
        // inline dict: /Encrypt << ... >>
        val i = text.lastIndexOf("/Encrypt")
        if (i < 0) None
        else {
          val open = text.indexOf("<<", i)
          if (open < 0) None
          else {
            var depth = 0
            var k = open
            while (k < text.length - 1) {
              if (text.startsWith("<<", k)) { depth += 1; k += 2 }
              else if (text.startsWith(">>", k)) {
                depth -= 1; k += 2
                if (depth == 0) return Some(text.substring(open, k))
              } else k += 1
            }
            None
          }
        }
    }
  }

  /** Value of a name key that is a PDF string — hex `<…>` or literal
    * `(…)` with escapes — as raw bytes. Shared with [[Metadata]]'s
    * encrypted-Info reader. */
  private[extract] def pdfString(dict: String, key: String): Option[Array[Byte]] = {
    var i = dict.indexOf(key)
    while (i >= 0) {
      var k = i + key.length
      // reject prefix matches: "/O" inside "/OE", "/U" inside "/UE"
      if (k < dict.length && !dict.charAt(k).isLetter) {
        while (k < dict.length && dict.charAt(k).isWhitespace) k += 1
        if (k < dict.length && dict.charAt(k) == '<' &&
            (k + 1 >= dict.length || dict.charAt(k + 1) != '<')) {
          val e = dict.indexOf('>', k)
          if (e > k) {
            val hex = dict.substring(k + 1, e).filter(c => Character.digit(c, 16) >= 0)
            return Some(hex.grouped(2).filter(_.length == 2)
              .map(Integer.parseInt(_, 16).toByte).toArray)
          }
        } else if (k < dict.length && dict.charAt(k) == '(') {
          val bytes = dict.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
          val (s, _) = PdfText.literalString(bytes, k)
          return Some(s.toCharArray.map(_.toByte))
        }
      }
      i = dict.indexOf(key, i + 1)
    }
    None
  }

  private def intAfter(dict: String, key: String): Option[Int] =
    (java.util.regex.Pattern.quote(key) + "\\s+(-?\\d+)").r
      .findFirstMatchIn(dict).map(_.group(1).toInt)

  private def containsBytes(hay: Array[Byte], needle: String): Boolean = {
    val nd = needle.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    var i = 0
    val limit = hay.length - nd.length
    while (i <= limit) {
      var j = 0
      while (j < nd.length && hay(i + j) == nd(j)) j += 1
      if (j == nd.length) return true
      i += 1
    }
    false
  }

  /** First element of the trailer /ID array (hex strings in practice).
    * Last /ID occurrence wins (incremental updates append trailers). */
  private def firstFileId(text: String): Option[Array[Byte]] = {
    val idPat = "/ID\\s*\\[\\s*<([0-9a-fA-F\\s]*)>".r
    idPat.findAllMatchIn(text).toList.lastOption.map { m =>
      m.group(1).filter(c => Character.digit(c, 16) >= 0)
        .grouped(2).filter(_.length == 2)
        .map(Integer.parseInt(_, 16).toByte).toArray
    }
  }
}
