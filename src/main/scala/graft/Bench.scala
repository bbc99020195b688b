package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark main: every registered query against
  * $SPARK_GRAFT_SF_DIR, one JSON line on stdout. Timing notes:
  * queries run in name order after one untimed warm-up query (JIT +
  * codegen + parquet footer caches are session costs, not query costs);
  * each query is forced through the `noop` sink so the FULL plan
  * executes (a bare count() lets Spark skip final sorts and prune
  * columns); the cache is cleared between queries so none benefits from
  * a predecessor's persisted subplan.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def exec(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    try exec("q_topk") catch { case _: Throwable => () } // warm-up, untimed
    val results = SparkEntry.queries.keys.toSeq.sorted.map { name =>
      val t0 = System.nanoTime()
      try exec(name) catch { case _: Throwable => () }
      spark.catalog.clearCache()
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
