package graft.functions

import graft.core.{Assemble, Construction, QInt, QStr}
import graft.fixtures.CorpusIO

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The extract_items Generator must agree with the golden-tested core fold
  * on every corpus page, and compose in SQL like any generator.
  */
class ExtractItemsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    ExtractItemsGenerator.register(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("generator output equals the core fold on every corpus page") {
    val s = spark; import s.implicits._
    val pages = CorpusIO.load().flatMap(d => d.pages.map(p => (d.url, p.pageNum, p.text)))
    val df = pages.toDF("url", "page_num", "text")
    df.createOrReplaceTempView("pages_v")
    val viaSql = spark.sql(
      """SELECT url, it.* FROM pages_v
         LATERAL VIEW extract_items(text, page_num) it""")
      .collect()
      .map(r => (r.getString(0), Option(r.getString(1)), Option(r.get(2)), Option(r.getString(4)),
        Option(r.getString(5)), r.getLong(8), Option(r.get(9)).map(_.asInstanceOf[Long])))
      .toVector.sortBy(t => (t._1, t._6, t._7.getOrElse(-1L)))
    val viaCore = pages.flatMap { case (url, pn, text) =>
      Construction.extractItems(text, pn).map(Assemble.validateItem).map { it =>
        val qi: Option[Any] = it.quantity.collect { case QInt(v) => v }
        (url, it.fixtureType, qi, it.modelNumber, it.dimensions,
          it.pageNumber, it.lineNumber)
      }
    }.sortBy(t => (t._1, t._6, t._7.getOrElse(-1L)))
    assert(viaSql.length == viaCore.length)
    viaSql.zip(viaCore).foreach { case (a, b) => assert(a == b, s"\nsql:  $a\ncore: $b") }
    assert(viaSql.nonEmpty)
  }

  test("quantity union splits into exactly one of (quantity_int, quantity_str)") {
    val s = spark; import s.implicits._
    Seq(("QTY: 3 EA VALVE PACKAGE MODEL VP-9\nQUANTITY: 31.1 CIRCULATING PUMP CH-30", 1L))
      .toDF("text", "p").createOrReplaceTempView("qv")
    val rows = spark.sql(
      "SELECT it.quantity_int, it.quantity_str FROM qv LATERAL VIEW extract_items(text, p) it")
      .collect()
    rows.foreach { r =>
      val hasInt = !r.isNullAt(0); val hasStr = !r.isNullAt(1)
      assert(!(hasInt && hasStr), "union must be exclusive")
    }
    assert(rows.exists(r => !r.isNullAt(0)))
    assert(rows.exists(r => !r.isNullAt(1))) // "31.1" stays a string
  }
}
