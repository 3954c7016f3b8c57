package graft.functions

import graft.core.Entities
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The custom Expression must agree with the golden-tested core
  * (graft.core.Entities / Rx) on every entity pattern, including the
  * findall-group quirks no built-in regexp function reproduces.
  */
class PyFindAllSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      // fail loudly if the expression's doGenCode emits uncompilable code
      // instead of silently falling back to interpreted eval
      .config("spark.sql.codegen.fallback", "false")
      .config("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    PyFindAll.register(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val samples = Seq(
    "call (555) 123-4567 or +1 555.123.4567",
    "ssn 123-45-6789 on 12/31/2024 pay $1,500.00",
    "mail a.b@x.com and q@y.io. visit https://ex.org/a b",
    "nothing to see", "")

  test("py_findall agrees with the Python-parity core on all entity patterns") {
    val sp = spark; import sp.implicits._
    val df = samples.toDF("s")
    graft.core.Semantics.entityPatterns.foreach { case (name, pat) =>
      val got = df.select(expr(s"py_findall(s, '${pat.replace("\\", "\\\\").replace("'", "\\'")}')"))
        .collect().map(_.getSeq[String](0).toList)
      val want = samples.map(s => graft.core.Rx(pat).findall(s))
      assert(got.toSeq == want, s"pattern $name diverged")
    }
  }

  test("the phone group quirk flows through SQL") {
    val sp = spark; import sp.implicits._
    val out = Seq("call (555) 123-4567 or +1 555.123.4567").toDF("s")
      .selectExpr(raw"py_findall(s, '(\\+?\\d{1,3}[-.\\s]?)?\\(?\\d{3}\\)?[-.\\s]?\\d{3}[-.\\s]?\\d{4}') AS phones")
      .head().getSeq[String](0)
    assert(out == Seq("", "+1 "))
  }

  test("expression composes in plans: filter over py_findall size") {
    val sp = spark; import sp.implicits._
    val n = samples.toDF("s")
      .where(size(expr(raw"py_findall(s, '\\d{3}-\\d{2}-\\d{4}')")) > 0)
      .count()
    assert(n == 1)
  }
}
