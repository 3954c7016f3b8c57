package graft.pdf

import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets

/** Standard security handler (round 5): encrypted PDFs with an EMPTY user
  * password — the common owner-locked-but-readable case — must parse via
  * key derivation + RC4/AES decryption; truly password-protected documents
  * must keep raising the distinct EncryptedPdfException. All algorithm
  * numbers reference ISO 32000-1 §7.6.3.
  */
class PdfCryptSpec extends AnyFunSuite {

  private val doc = Seq(
    Pdf.PageSpec(Seq(
      (50.0, 760.0, "encrypted fixture line one"),
      (50.0, 748.0, "with (parens) and unicode: déjà ß"))),
    Pdf.PageSpec(Seq((50.0, 760.0, "second page"))))

  private def texts(bytes: Array[Byte]): Vector[String] =
    Pdf.parse(bytes).map(p => Layout.pageText(p.runs))

  private val plainTexts = texts(Pdf.writePages(doc, flate = true))

  test("RC4-128 empty-user-password round-trips in every framing") {
    for (framing <- Seq(Pdf.Framing.Classic, Pdf.Framing.XrefStream,
                        Pdf.Framing.XrefStreamPred, Pdf.Framing.ObjStm);
         flate <- Seq(true, false)) {
      val bytes = Pdf.writePages(doc, flate, framing = framing,
        encrypt = Some(Pdf.EncryptSpec()))
      assert(texts(bytes) == plainTexts, s"framing=$framing flate=$flate")
    }
  }

  test("ciphertext really is ciphertext: plaintext absent from the unflated file") {
    val bytes = Pdf.writePages(doc, flate = false, encrypt = Some(Pdf.EncryptSpec()))
    val s = new String(bytes, StandardCharsets.ISO_8859_1)
    assert(!s.contains("encrypted fixture line one"))
    assert(s.contains("/Encrypt") && s.contains("/Filter /Standard"))
    assert(texts(bytes) == plainTexts)
  }

  test("AES-128 (/V 4 /AESV2) empty-user-password round-trips") {
    for (framing <- Seq(Pdf.Framing.Classic, Pdf.Framing.ObjStm)) {
      val bytes = Pdf.writePages(doc, flate = true, framing = framing,
        encrypt = Some(Pdf.EncryptSpec(aes = true)))
      val s = new String(bytes, StandardCharsets.ISO_8859_1)
      assert(s.contains("/AESV2"), s"framing $framing")
      assert(texts(bytes) == plainTexts, s"framing $framing")
    }
  }

  test("a real user password keeps the document out: distinct encrypted error") {
    val locked = Pdf.writePages(doc, flate = true,
      encrypt = Some(Pdf.EncryptSpec(userPwd = "secret")))
    val e = intercept[Pdf.EncryptedPdfException](Pdf.parse(locked))
    assert(e.getMessage.contains("password required"))
    // and through Decode: the distinct pdf-encrypted error tag
    val dec = graft.pipeline.Decode.decode(locked, null)
    assert(dec.error.exists(_.startsWith("pdf-encrypted")))
    assert(dec.pages.isEmpty)
  }

  test("/Info strings decrypt: individually top-level, stream-covered inside ObjStm") {
    val info = Seq("Title" -> "Crypted Résumé №5", "Author" -> "ascii author")
    for (framing <- Seq(Pdf.Framing.Classic, Pdf.Framing.XrefStream, Pdf.Framing.ObjStm)) {
      val bytes = Pdf.writePages(doc, flate = true, framing = framing,
        info = info, encrypt = Some(Pdf.EncryptSpec()))
      val got = Pdf.docInfo(bytes)
      assert(got.get("Title").contains("Crypted Résumé №5"), s"framing $framing: $got")
      assert(got.get("Author").contains("ascii author"), s"framing $framing")
    }
  }

  test("scan-repair still works on encrypted documents (corrupt startxref)") {
    val bytes = Pdf.writePages(doc, flate = true, framing = Pdf.Framing.XrefStream,
      encrypt = Some(Pdf.EncryptSpec()))
    val broken = new String(bytes, StandardCharsets.ISO_8859_1)
      .replaceAll("""startxref\n\d+""", "startxref\n999999999")
      .getBytes(StandardCharsets.ISO_8859_1)
    assert(texts(broken) == plainTexts)
  }

  test("annotations + form fields: FreeText /Contents and Widget /V across framings, plain and encrypted") {
    val annots = Seq(
      Seq("FreeText" -> "sticky note — première", "Widget" -> "field value 42"),
      Seq("Text" -> "second page comment"))
    for (framing <- Seq(Pdf.Framing.Classic, Pdf.Framing.XrefStream, Pdf.Framing.ObjStm);
         enc <- Seq(None, Some(Pdf.EncryptSpec()))) {
      val bytes = Pdf.writePages(doc, flate = true, framing = framing,
        encrypt = enc, annots = annots)
      val got = Pdf.annotations(bytes)
      assert(got == Vector(
        (0, "FreeText", "sticky note — première"),
        (0, "Widget", "field value 42"),
        (1, "Text", "second page comment")), s"framing=$framing enc=${enc.isDefined}")
      // page text itself is unaffected by the annotation objects
      assert(texts(bytes) == plainTexts, s"framing=$framing enc=${enc.isDefined}")
    }
    // no annotations → empty, not an error
    assert(Pdf.annotations(Pdf.writePages(doc, flate = false)).isEmpty)
  }

  test("RC4 known-answer vector") {
    // classic test vector: key "Key", plaintext "Plaintext"
    val out = PdfCrypt.rc4("Key".getBytes, "Plaintext".getBytes)
    assert(out.map(b => f"${b & 0xff}%02X").mkString == "BBF316E8D940AF0AD3")
    // involution: decrypt(encrypt(x)) == x
    val data = Array.tabulate[Byte](257)(i => (i * 31).toByte)
    assert(PdfCrypt.rc4("k2".getBytes, PdfCrypt.rc4("k2".getBytes, data)).toSeq == data.toSeq)
  }

  test("AES helper round-trips at every padding remainder") {
    val key = Array.tabulate[Byte](16)(i => (i * 7).toByte)
    (0 to 17).foreach { n =>
      val data = Array.tabulate[Byte](n)(i => (i * 13 + 5).toByte)
      val enc = PdfCrypt.aesEncrypt(key, data, PdfCrypt.ivFrom(9, 0))
      assert(PdfCrypt.aesDecrypt(key, enc).toSeq == data.toSeq, s"len $n")
    }
  }

  test("empty-password check rejects a wrong /U and accepts the derived one") {
    val fileId = Array.tabulate[Byte](16)(i => i.toByte)
    val o = PdfCrypt.computeO("owner".getBytes, "".getBytes, r = 3, keyLen = 16)
    val key = PdfCrypt.computeKey("".getBytes, o, -44, fileId, r = 3, keyLen = 16)
    val u = PdfCrypt.computeU(key, fileId, r = 3)
    assert(PdfCrypt.tryEmptyPassword(o, u, -44, fileId, r = 3, keyLen = 16, aes = false).isDefined)
    val badU = u.clone; badU(3) = (badU(3) ^ 0x55).toByte
    assert(PdfCrypt.tryEmptyPassword(o, badU, -44, fileId, r = 3, keyLen = 16, aes = false).isEmpty)
  }
}
