package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `idn_host(host)` — internationalized-domain-name canonicalization as a
  * native Catalyst expression: NFC-normalize, lowercase (root locale), and
  * Punycode-encode every non-ASCII label to its `xn--` ACE form (RFC 3492
  * bootstring, hand-rolled below; RFC 5890 ACE prefix). The URL-canon /
  * registered-domain / host-cap operators all key on host strings — without
  * ACE folding, `münchen.de` and `xn--mnchen-3ya.de` (the same zone, as
  * crawlers see it from IRIs vs DNS) never collide, splitting per-host
  * caps and politeness budgets.
  *
  * Scope (documented subset of full IDNA2008/UTS46, which specifies large
  * mapping tables this sandbox reimplementation does not transcribe):
  * NFC + toLowerCase(ROOT) mapping, per-label ACE encoding, pass-through
  * for ASCII and already-ACE (`xn--`) labels, empty labels preserved (so
  * trailing dots survive). The spec cross-pins the encoder against the
  * JDK's independent implementation (`java.net.IDN`) and RFC 3492 §7.1
  * sample vectors.
  */
case class IdnHost(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"idn_host expects string, got ${child.dataType}")

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else IdnHost.compute(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.IdnHost.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): IdnHost =
    copy(child = newChild)
}

object IdnHost {
  import java.text.Normalizer

  // RFC 3492 §5 parameter values
  private val Base = 36
  private val TMin = 1
  private val TMax = 26
  private val Skew = 38
  private val Damp = 700
  private val InitialBias = 72
  private val InitialN = 128

  private def digit(d: Long): Char =
    if (d < 26) ('a' + d).toChar else ('0' + (d - 26)).toChar

  private def adapt(delta0: Long, numPoints: Int, firstTime: Boolean): Long = {
    var delta = if (firstTime) delta0 / Damp else delta0 / 2
    delta += delta / numPoints
    var k = 0L
    while (delta > ((Base - TMin) * TMax) / 2) {
      delta /= Base - TMin
      k += Base
    }
    k + (Base - TMin + 1) * delta / (delta + Skew)
  }

  /** RFC 3492 §6.3 encoder over one label's code points (no ACE prefix). */
  def punycode(label: String): String = {
    val cps = label.codePoints().toArray
    val out = new java.lang.StringBuilder
    cps.foreach(c => if (c < InitialN) out.append(c.toChar))
    val b = out.length()
    var h = b
    if (b > 0) out.append('-')
    var n = InitialN.toLong
    var delta = 0L
    var bias = InitialBias.toLong
    while (h < cps.length) {
      var m = Long.MaxValue
      cps.foreach(c => if (c >= n && c < m) m = c.toLong)
      delta += (m - n) * (h + 1) // fits: label ≤ 63 octets, cp ≤ 0x10FFFF
      n = m
      cps.foreach { c =>
        if (c < n) delta += 1
        if (c == n) {
          var q = delta
          var k = Base.toLong
          var done = false
          while (!done) {
            val t = if (k <= bias) TMin.toLong
              else if (k >= bias + TMax) TMax.toLong else k - bias
            if (q < t) done = true
            else {
              out.append(digit(t + (q - t) % (Base - t)))
              q = (q - t) / (Base - t)
              k += Base
            }
          }
          out.append(digit(q))
          bias = adapt(delta, h + 1, h == b)
          delta = 0
          h += 1
        }
      }
      delta += 1
      n += 1
    }
    out.toString
  }

  /** Shared interpreted/generated kernel. */
  def compute(v: UTF8String): UTF8String = {
    val raw = v.toString
    // fast path: ASCII hosts (the overwhelming majority) only lowercase
    var i = 0
    var ascii = true
    while (ascii && i < raw.length) { if (raw.charAt(i) >= 128) ascii = false; i += 1 }
    if (ascii) {
      val lower = raw.toLowerCase(java.util.Locale.ROOT)
      return if (lower == raw) v else UTF8String.fromString(lower)
    }
    val nfc = if (Normalizer.isNormalized(raw, Normalizer.Form.NFC)) raw
      else Normalizer.normalize(raw, Normalizer.Form.NFC)
    val lower = nfc.toLowerCase(java.util.Locale.ROOT)
    val labels = lower.split("\\.", -1).map { label =>
      if (label.forall(_ < 128)) label // ASCII (incl. already-ACE xn--, empty)
      else "xn--" + punycode(label)
    }
    UTF8String.fromString(labels.mkString("."))
  }

  /** Register `idn_host(host)` as a session temp function. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "idn_host",
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "idn_host(host)")
        IdnHost(exprs.head)
      },
      "built-in")
}
