package graft.pdf

/** PDF standard security handler (ISO 32000-1 §7.6.3) — the decrypt half a
  * real crawl needs: most "/Encrypt"-ed PDFs in the wild use an EMPTY user
  * password (owner-password-only protection) and are readable by every
  * viewer; only documents that fail the empty-password check are truly
  * password-protected. Covers revisions 2/3 (RC4 40-128 bit, /V 1-2) and
  * revision 4 with /AESV2 crypt filters (AES-128-CBC via javax.crypto).
  *
  * Everything here is the published algorithm set: Algorithm 2 (key from
  * password), 3 (the /O entry), 4/5 (the /U entry check), 1 (per-object
  * keys with the AES "sAlT" suffix). RC4 is implemented inline (trivially
  * public; the JCE RC4 provider may be absent).
  */
object PdfCrypt {

  /** The 32-byte padding string of Algorithm 2. */
  private val Pad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
    0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  final case class Decryptor(key: Array[Byte], aes: Boolean) {
    /** Per-object key (Algorithm 1) + cipher. */
    def decrypt(data: Array[Byte], objNum: Int, gen: Int): Array[Byte] = {
      val ok = objectKey(key, objNum, gen, aes)
      if (aes) aesDecrypt(ok, data) else rc4(ok, data)
    }
    def encrypt(data: Array[Byte], objNum: Int, gen: Int): Array[Byte] = {
      val ok = objectKey(key, objNum, gen, aes)
      if (aes) aesEncrypt(ok, data, ivFrom(objNum, gen)) else rc4(ok, data)
    }
  }

  private def md5(parts: Array[Byte]*): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance("MD5")
    parts.foreach(d.update)
    d.digest()
  }

  private def padPassword(pwd: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](32)
    val n = math.min(pwd.length, 32)
    System.arraycopy(pwd, 0, out, 0, n)
    System.arraycopy(Pad, 0, out, n, 32 - n)
    out
  }

  private def intLE(v: Int): Array[Byte] =
    Array[Byte](v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)

  /** Algorithm 2: encryption key from (user) password. */
  def computeKey(password: Array[Byte], o: Array[Byte], p: Int, fileId: Array[Byte],
                 r: Int, keyLen: Int, encryptMetadata: Boolean = true): Array[Byte] = {
    var h = md5(padPassword(password), o.take(32), intLE(p), fileId,
      if (r >= 4 && !encryptMetadata) Array[Byte](-1, -1, -1, -1) else Array.empty)
    if (r >= 3) (0 until 50).foreach(_ => h = md5(h.take(keyLen)))
    h.take(keyLen)
  }

  /** Algorithm 3: the /O entry from owner+user passwords. */
  def computeO(ownerPwd: Array[Byte], userPwd: Array[Byte], r: Int, keyLen: Int): Array[Byte] = {
    var h = md5(padPassword(ownerPwd))
    if (r >= 3) (0 until 50).foreach(_ => h = md5(h))
    val key = h.take(keyLen)
    var out = rc4(key, padPassword(userPwd))
    if (r >= 3) (1 to 19).foreach { i =>
      out = rc4(key.map(b => (b ^ i).toByte), out)
    }
    out
  }

  /** Algorithms 4/5: the /U entry from the file key. */
  def computeU(key: Array[Byte], fileId: Array[Byte], r: Int): Array[Byte] =
    if (r == 2) rc4(key, Pad)
    else {
      var out = rc4(key, md5(Pad, fileId))
      (1 to 19).foreach(i => out = rc4(key.map(b => (b ^ i).toByte), out))
      out ++ new Array[Byte](16) // arbitrary 16-byte padding per spec
    }

  /** Empty-user-password check (Algorithm 6): Some(decryptor) when the
    * document opens with no password, None when truly password-protected.
    */
  def tryEmptyPassword(o: Array[Byte], u: Array[Byte], p: Int, fileId: Array[Byte],
                       r: Int, keyLen: Int, aes: Boolean,
                       encryptMetadata: Boolean = true): Option[Decryptor] = {
    val key = computeKey(Array.empty, o, p, fileId, r, keyLen, encryptMetadata)
    val expected = computeU(key, fileId, r)
    val ok =
      if (r == 2) java.util.Arrays.equals(expected, u.take(32))
      else java.util.Arrays.equals(expected.take(16), u.take(16))
    if (ok) Some(Decryptor(key, aes)) else None
  }

  /** Algorithm 1: per-object key. */
  private def objectKey(key: Array[Byte], objNum: Int, gen: Int, aes: Boolean): Array[Byte] = {
    val salt = Array[Byte](objNum.toByte, (objNum >>> 8).toByte, (objNum >>> 16).toByte,
      gen.toByte, (gen >>> 8).toByte)
    val extra = if (aes) Array[Byte](0x73, 0x41, 0x6C, 0x54) else Array.empty[Byte] // "sAlT"
    md5(key, salt, extra).take(math.min(key.length + 5, 16))
  }

  // ------------------------------------------------------------------- RC4
  def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = Array.tabulate(256)(identity)
    var j = 0
    (0 until 256).foreach { i =>
      j = (j + s(i) + (key(i % key.length) & 0xff)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
    }
    val out = new Array[Byte](data.length)
    var i = 0; j = 0
    var k = 0
    while (k < data.length) {
      i = (i + 1) & 0xff
      j = (j + s(i)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      out(k) = (data(k) ^ s((s(i) + s(j)) & 0xff)).toByte
      k += 1
    }
    out
  }

  // ------------------------------------------------------------------- AES
  /** AES-128-CBC per §7.6.2: ciphertext is IV(16) ++ blocks, PKCS#5-style
    * padding inside.
    */
  def aesDecrypt(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    if (data.length < 32 || data.length % 16 != 0)
      throw new java.io.IOException("bad AES payload length")
    val cipher = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
    cipher.init(javax.crypto.Cipher.DECRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.IvParameterSpec(data.take(16)))
    val plain = cipher.doFinal(data, 16, data.length - 16)
    val padLen = plain(plain.length - 1) & 0xff
    if (padLen < 1 || padLen > 16) throw new java.io.IOException("bad AES padding")
    java.util.Arrays.copyOf(plain, plain.length - padLen)
  }

  def aesEncrypt(key: Array[Byte], data: Array[Byte], iv: Array[Byte]): Array[Byte] = {
    val padLen = 16 - (data.length % 16)
    val padded = java.util.Arrays.copyOf(data, data.length + padLen)
    java.util.Arrays.fill(padded, data.length, padded.length, padLen.toByte)
    val cipher = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
    cipher.init(javax.crypto.Cipher.ENCRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.IvParameterSpec(iv))
    iv ++ cipher.doFinal(padded)
  }

  /** Deterministic IV for fixture encryption (no RNG in writers). */
  def ivFrom(objNum: Int, gen: Int): Array[Byte] =
    md5(Array[Byte](0x49, 0x56), intLE(objNum), intLE(gen)).take(16)
}
