package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Payload content-type sniffing from magic bytes — the routing decision
  * at the head of the extraction pipeline: a crawl's Content-Type header
  * is wrong or absent often enough (the reason the WHATWG MIME Sniffing
  * spec exists) that the payload bytes are the only trustworthy signal for
  * sending application/pdf to the PDF layout parser, text/html to the
  * tokenizer, and media/archives to the multimodal/skip lanes.
  *
  * Subset of the WHATWG sniffing table over the leading bytes, plus the
  * spec's binary-byte test for the text/plain fallback:
  *   - `%PDF-` → application/pdf;  `\x1f\x8b` → application/gzip;
  *     `PK\x03\x04` → application/zip;  PNG/JPEG/GIF signatures;
  *   - case-insensitive `<!doctype html` / `<html` / `<head` / `<body`
  *     after optional whitespace → text/html;
  *   - no WHATWG binary byte (0x00-0x08, 0x0B, 0x0E-0x1A, 0x1C-0x1F) in
  *     the inspected prefix → text/plain;
  *   - otherwise application/octet-stream.
  *
  * Pure scan-side Column arithmetic: one hex() of a 16-byte slice for the
  * signatures, one decoded 64-byte prefix for the HTML/binary tests — no
  * UDF, no exchange, fuses into the payload scan.
  */
object Sniff {

  def sniffMime(payload: Column): Column = {
    // coalesce: empty payloads must stay on the text/plain path, not
    // null-propagate through the when-chain into octet-stream
    val hx = coalesce(hex(substring(payload, 1, 16)), lit("")) // upper hex
    // decoded ASCII prefix for the HTML / binary-byte tests; UTF-8 cast of
    // arbitrary bytes is total (replacement chars), which both tests absorb
    val prefix = coalesce(substring(payload, 1, 64).cast("string"), lit(""))
    // leading BOM + any whitespace (ltrim strips SPACES only, html often
    // leads with \n/\t) before the tag check, per the WHATWG table
    val p = lower(regexp_replace(prefix, "^[\\uFEFF\\s]+", ""))
    val binaryByte = "[\\x00-\\x08\\x0B\\x0E-\\x1A\\x1C-\\x1F]"
    when(hx.startsWith("255044462D"), "application/pdf")
      .when(hx.startsWith("1F8B"), "application/gzip")
      .when(hx.startsWith("504B0304"), "application/zip")
      .when(hx.startsWith("89504E470D0A1A0A"), "image/png")
      .when(hx.startsWith("FFD8FF"), "image/jpeg")
      .when(hx.startsWith("474946383761") || hx.startsWith("474946383961"),
        "image/gif")
      .when(p.startsWith("<!doctype html") || p.startsWith("<html") ||
        p.startsWith("<head") || p.startsWith("<body"), "text/html")
      .when(!prefix.rlike(binaryByte), "text/plain")
      .otherwise("application/octet-stream")
  }
}
