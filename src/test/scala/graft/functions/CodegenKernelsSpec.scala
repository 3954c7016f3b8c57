package graft.functions

import org.apache.spark.sql.{Column, GraftBridge, SparkSession}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Property parity of the codegen-native kernels against their built-in /
  * HOF reference formulations, executed under CODEGEN_ONLY with fallback
  * disabled so broken generated code fails rather than silently
  * interpreting.
  */
class CodegenKernelsSpec extends AnyFunSuite with BeforeAndAfterAll {

  /** Raw-ScalaCheck runner (no scalatestplus bridge in the offline cache);
    * fewer cases than PropertySpec — each case runs a Spark job.
    */
  private def check(prop: Prop): Unit = {
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, org.scalacheck.util.Pretty.pretty(res))
  }

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.codegen.fallback", "false")
      .config("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def c(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    GraftBridge.column(e)
  private def x(col: Column) = GraftBridge.expression(col)

  private val smallLongs = Gen.listOfN(16, Gen.chooseNum(-1000000L, 1000000L))

  test("DotLong == HOF aggregate(zip_with) on equal-length arrays") {
    val s = spark; import s.implicits._
    check(Prop.forAll(smallLongs, smallLongs) { (a, b) =>
      val df = Seq((a, b)).toDF("a", "b")
      val r = df.select(
        c(DotLong(x(col("a")), x(col("b")))).as("fast"),
        aggregate(zip_with(col("a"), col("b"), _ * _), lit(0L), _ + _).as("ref"))
        .head()
      r.getLong(0) == r.getLong(1)
    })
  }

  test("SortedIntersectCount == size(array_intersect) on sorted distinct arrays") {
    val s = spark; import s.implicits._
    val distinctSorted = Gen.listOf(Gen.chooseNum(0L, 200L)).map(_.distinct.sorted)
    check(Prop.forAll(distinctSorted, distinctSorted) { (a, b) =>
      val df = Seq((a, b)).toDF("a", "b")
      val r = df.select(
        c(SortedIntersectCount(x(col("a")), x(col("b")))).as("fast"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("ref"))
        .head()
      r.getLong(0) == r.getLong(1)
    })
  }

  test("SimHashVotes == per-bit vote reference on hashes < 2^32") {
    val s = spark; import s.implicits._
    val hashes = Gen.listOf(Gen.chooseNum(0L, 4294967295L))
    check(Prop.forAll(hashes) { hs =>
      val want = {
        val votes = new Array[Long](32)
        hs.foreach(h => (0 until 32).foreach(b =>
          votes(b) += (if (((h >> b) & 1L) == 1L) 1L else -1L)))
        (0 until 32).map(b => if (votes(b) > 0) 1L << b else 0L).sum
      }
      val got = Seq(Tuple1(hs)).toDF("hs")
        .select(c(SimHashVotes(x(col("hs")), 32))).head().getLong(0)
      got == want
    })
  }

  test("RollingFingerprint generated code == interpreted eval (incl. non-BMP)") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    // strings around the n=8 gram boundary, with code points beyond ASCII
    // and beyond the BMP (supplementary chars take two UTF-16 units but ONE
    // code point — the kernel hashes code points)
    val cpGen = Gen.oneOf(Gen.alphaNumChar.map(_.toInt), Gen.const(0x00E9),
      Gen.const(0x4E2D), Gen.const(0x1F600))
    val strGen = Gen.chooseNum(0, 24).flatMap(n => Gen.listOfN(n, cpGen))
      .map(cps => new String(cps.toArray, 0, cps.length))
    check(Prop.forAll(strGen) { str =>
      val got = Seq(Tuple1(str)).toDF("t")
        .select(c(RollingFingerprint(x(col("t")))).as("fp"))
        .select("fp.fp_min", "fp.fp_max", "fp.n_grams").head()
      val interp =
        RollingFingerprint.compute(UTF8String.fromString(str), 8, 257L, 1000000007L)
      got.getLong(0) == interp.getLong(0) && got.getLong(1) == interp.getLong(1) &&
        got.getLong(2) == interp.getLong(2)
    })
  }

  test("DotLong fails loudly on mismatched lengths (interpreted and codegen)") {
    val s = spark; import s.implicits._
    // interpreted path
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, LongType}
    def lit2(xs: Long*) = Literal.create(new GenericArrayData(xs.toArray), ArrayType(LongType))
    val ei = intercept[IllegalArgumentException](DotLong(lit2(1, 2, 3), lit2(4, 5)).eval(null))
    assert(ei.getMessage.contains("length mismatch"))
    // codegen path (CODEGEN_ONLY session — the generated template throws)
    val df = Seq((Seq(1L, 2L, 3L), Seq(4L, 5L))).toDF("a", "b")
    val ec = intercept[Exception](
      df.select(c(DotLong(x(col("a")), x(col("b"))))).collect())
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ec).exists(_.getMessage != null) &&
      causes(ec).exists(t => t.getMessage != null && t.getMessage.contains("length mismatch")))
  }

  test("GramStats generated code == interpreted eval (incl. multi-byte grams)") {
    val s = spark; import s.implicits._
    import org.apache.spark.unsafe.types.UTF8String
    val tokGen = Gen.oneOf("a", "bb", "é", "日本", "", "x1")
    val strGen = Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, tokGen))
      .map(_.mkString(" "))
    check(Prop.forAll(strGen, Gen.chooseNum(1, 3)) { (str, n) =>
      val got = Seq(Tuple1(str)).toDF("t")
        .select(c(GramStats(x(col("t")), n)).as("g"))
        .select("g.n_grams", "g.n_distinct", "g.top_cov").head()
      val interp = GramStats.compute(UTF8String.fromString(str), n)
      got.getLong(0) == interp.getLong(0) && got.getLong(1) == interp.getLong(1) &&
        got.getLong(2) == interp.getLong(2)
    })
  }

  test("NormalizeNFC generated code == interpreted eval == java.text.Normalizer") {
    val s = spark; import s.implicits._
    import org.apache.spark.unsafe.types.UTF8String
    val cpGen = Gen.oneOf(Gen.alphaNumChar.map(_.toInt), Gen.const(0x0301),
      Gen.const(0x00E9), Gen.const(0x212B), Gen.const(0x1F600))
    val strGen = Gen.chooseNum(0, 16).flatMap(n => Gen.listOfN(n, cpGen))
      .map(cps => new String(cps.toArray, 0, cps.length))
    check(Prop.forAll(strGen) { str =>
      val got = Seq(Tuple1(str)).toDF("t")
        .select(c(NormalizeNFC(x(col("t"))))).head().getString(0)
      val interp = NormalizeNFC.compute(UTF8String.fromString(str)).toString
      val want = java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC)
      got == interp && got == want
    })
  }

  test("interpreted eval agrees with codegen for all three kernels") {
    // exercised via Literal-only expressions evaluated eagerly (no codegen)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, LongType}
    def arr(xs: Long*) = Literal.create(new GenericArrayData(xs.toArray), ArrayType(LongType))
    assert(DotLong(arr(1, 2, 3), arr(4, 5, 6)).eval(null) == 32L)
    assert(SortedIntersectCount(arr(1, 3, 5), arr(2, 3, 5, 9)).eval(null) == 2L)
    assert(SimHashVotes(arr(3, 3, 4), 3).eval(null) == 3L) // bits0/1: 2-1>0; bit2: 1-2<0
  }
}
