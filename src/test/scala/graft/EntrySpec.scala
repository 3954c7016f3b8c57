package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke of the flagship: rows > 0 at sf0.001 and both
  * reference strategies present (standard + the J1-J3-bearing
  * construction mode through the FakeLlm seam).
  */
class EntrySpec extends AnyFunSuite {
  test("entry: both modes, rows > 0, non-empty canonical JSON") {
    assume(java.nio.file.Files.exists(
      java.nio.file.Paths.get("/root/testdata/sf0.001/documents.parquet")))
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val df = SparkEntry.entry(spark)
      val byMode = df.groupBy("mode").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(byMode.keySet == Set("standard", "construction"))
      assert(byMode.values.forall(_ > 0))
      assert(byMode("standard") == byMode("construction"))
      val sample = df.where(org.apache.spark.sql.functions.col("mode") === "construction")
        .select("extracted_json").head().getString(0)
      assert(sample.contains("\"items\"") || sample.nonEmpty)
    } finally spark.stop()
  }
}
