import graft.pipeline.Extract
import graft.fixtures.PagesGen
import org.apache.spark.sql.SparkSession
object TestScale6 {
  def sess(c: Int) = {
    val s = SparkSession.builder().master(s"local[$c]").appName(s"ts$c")
      .config("spark.sql.shuffle.partitions", c.toString)
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version","2")
      .config("spark.sql.session.timeZone","UTC").config("spark.ui.enabled","false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR"); s
  }
  def main(args: Array[String]): Unit = {
    val work = java.nio.file.Files.createTempDirectory(java.nio.file.Paths.get("/dev/shm"), "ts6").toString
    var sp = sess(8)
    val n = PagesGen.write(sp, s"$work/pages", 100, 2, 16)
    var i = 0
    def full(s: SparkSession, p: Int): Unit = {
      i += 1
      val t0 = System.nanoTime()
      Extract.run(s, s"$work/pages", s"$work/o$i", Extract.Config(buckets=2, parallelism=p))
      printf("run%d p=%d: %.2fs%n", i, p, (System.nanoTime()-t0)/1e9)
    }
    full(sp, 16); full(sp, 16); full(sp, 16)
    sp.stop()
    sp = sess(32)
    full(sp, 64); full(sp, 64); full(sp, 64)
    sp.stop()
    println("docs=" + n)
  }
}
