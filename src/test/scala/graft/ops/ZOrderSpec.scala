package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Z-order contracts: the Morton bit-interleave against hand-computed
  * values, and the property the layout exists for — after zorderWrite,
  * EVERY interleaved column has tight per-file min/max ranges (row-group
  * pruning works on all of them), where a linear sort bounds only its own
  * sort key.
  */
class ZOrderSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val work = Files.createTempDirectory("graft_zorder").toString

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("zValue: hand-computed interleave, masking, guards") {
    val s = spark
    import s.implicits._
    // x=5 (101), y=3 (011), bits=3: x bits land at 2b, y bits at 2b+1
    // -> positions {0,4} from x, {1,3} from y -> 1+16+2+8 = 27
    val got = Seq((5L, 3L)).toDF("x", "y")
      .select(ZOrder.zValue(Seq(col("x"), col("y")), bits = 3)).head().getLong(0)
    assert(got == 27L)
    // single column, bits=1: z == low bit
    val one = Seq(6L).toDF("x")
      .select(ZOrder.zValue(Seq(col("x")), bits = 1)).head().getLong(0)
    assert(one == 0L)
    // out-of-range high bits are masked away, not smeared into other lanes
    val masked = Seq((5L + 8L, 3L)).toDF("x", "y")
      .select(ZOrder.zValue(Seq(col("x"), col("y")), bits = 3)).head().getLong(0)
    assert(masked == 27L)
    intercept[IllegalArgumentException](ZOrder.zValue(Nil))
    intercept[IllegalArgumentException](ZOrder.zValue(Seq(col("x")), bits = 64))
    // three lanes: column i's bit b lands at 3b+i
    // x=1 -> pos 0; y=1 -> pos 1; t=3 (11) -> pos 2 and pos 5
    val three = Seq((1L, 1L, 3L)).toDF("x", "y", "t")
      .select(ZOrder.zValue(Seq(col("x"), col("y"), col("t")), bits = 2))
      .head().getLong(0)
    assert(three == (1L | 2L | 4L | 32L))
  }

  test("zorderWrite: every interleaved column gets tight per-file ranges") {
    val s = spark
    import s.implicits._
    // a 64x64 grid: x and y are independent; a linear x-sort leaves y's
    // per-file range at the full 64
    val grid = s.range(0, 4096).select(
      (col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"))
    val zPath = s"$work/z"
    val linPath = s"$work/lin"
    ZOrder.zorderWrite(grid, Seq("x", "y"), zPath, files = 16, bits = 6)
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(linPath)
    def ranges(path: String, c: String): Seq[Long] =
      s.read.parquet(path)
        .groupBy(input_file_name())
        .agg((max(col(c)) - min(col(c))).as("r"))
        .collect().map(_.getLong(1)).toSeq
    val zY = ranges(zPath, "y"); val zX = ranges(zPath, "x")
    val linY = ranges(linPath, "y")
    assert(zY.size == 16 && linY.size == 16)
    def avg(xs: Seq[Long]) = xs.sum.toDouble / xs.size
    // z-order bounds BOTH columns; the linear layout leaves y unpruned
    assert(avg(linY) > 60.0, s"control broken: linear files should span y, got ${avg(linY)}")
    assert(avg(zY) < avg(linY) / 2, s"z files must bound y: ${avg(zY)} vs ${avg(linY)}")
    assert(avg(zX) < 32.0, s"z files must bound x too: ${avg(zX)}")
  }
}
