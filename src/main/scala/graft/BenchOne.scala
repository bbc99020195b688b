package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: time individual queries (args) against
  * $SPARK_GRAFT_SF_DIR with the same conditions as Bench — noop sink,
  * cache cleared between queries, one warm-up. Not driver-graded.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", "/root/repo/target/tmp/warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def exec(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    exec("q_topk") // warm-up
    Bench.warmDedupCodegen(spark, sfDir)
    spark.catalog.clearCache()
    args.foreach { name =>
      val t0 = System.nanoTime()
      exec(name)
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"TIMING $name%-28s $dt%8.2f s")
    }
    spark.stop()
  }
}
