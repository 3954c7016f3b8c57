package graft.functions

import graft.ops.CorpusSignals
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** deflate_ratio contracts: exact agreement with a direct Deflater run,
  * both entropy tails where the signal cuts, null/empty edges, SQL
  * registration, and interpreted ≡ codegen.
  */
class DeflateRatioSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def direct(s: String): Long = {
    val bytes = s.getBytes("UTF-8")
    if (bytes.isEmpty) return 0L
    val d = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    d.setInput(bytes); d.finish()
    var total = 0L
    val buf = new Array[Byte](8192)
    while (!d.finished()) total += d.deflate(buf)
    d.end()
    1000000L * total / bytes.length
  }

  test("matches a direct Deflater run on varied inputs") {
    val rnd = new scala.util.Random(42)
    val inputs = Seq(
      "a" * 1000,
      "the quick brown fox " * 50,
      Seq.fill(800)(('a' + rnd.nextInt(26)).toChar).mkString,
      "é日本語" * 100,
      "x")
    val s = spark
    import s.implicits._
    val got = inputs.toDF("t")
      .select(col("t"), CorpusSignals.compressionRatio(col("t")).as("r"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    inputs.foreach(in => assert(got(in) == direct(in), s"len=${in.length}"))
  }

  test("both entropy tails separate cleanly") {
    val low = "spamspam" * 200                       // templated junk
    val rnd = new scala.util.Random(7)
    val high = Seq.fill(1600)(('!' + rnd.nextInt(94)).toChar).mkString // noise
    val mid = ("document with the usual well formed words and variety " * 30)
    assert(direct(low) < 50000L, s"low tail ${direct(low)}")
    assert(direct(high) > 600000L, s"high tail ${direct(high)}")
    val m = direct(mid)
    assert(m > direct(low) && m < direct(high), s"mid $m must sit between")
  }

  test("null stays null, empty is 0, SQL registration works") {
    val s = spark
    import s.implicits._
    val df = Seq[(java.lang.Long, String)]((1L, null), (2L, ""), (3L, "abc"))
      .toDF("id", "t")
    val rows = df.select(CorpusSignals.compressionRatio(col("t")))
      .collect()
    assert(rows(0).isNullAt(0))
    assert(rows(1).getLong(0) == 0L)
    assert(rows(2).getLong(0) == direct("abc"))
    DeflateRatio.register(spark)
    df.createOrReplaceTempView("dr_in")
    val viaSql = spark.sql("SELECT deflate_ratio(t) FROM dr_in WHERE id = 3")
      .head().getLong(0)
    assert(viaSql == direct("abc"))
  }

  test("interpreted eval equals the codegen'd kernel") {
    val in = "interpreted must equal codegen " * 9
    val interpreted = DeflateRatio(
      org.apache.spark.sql.catalyst.expressions.Literal(
        UTF8String.fromString(in))).eval(null)
    assert(interpreted == direct(in))
  }
}
