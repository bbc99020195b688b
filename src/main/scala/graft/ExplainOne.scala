package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: print `.explain("formatted")` for named queries to files
  * under an output dir (arg 0), one `<query>.txt` each — the plan
  * evidence the optimization rounds commit under plans/rNN/. Bench
  * session shape (same confs), so the plans match what the bench runs.
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outDir = args.head
    new java.io.File(outDir).mkdirs()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", "/root/repo/target/tmp/warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // checkpoint=false twins of the operators whose registered entries
    // localCheckpoint (their registered plans collapse to RDD scans —
    // these pseudo-names expose the dataflow under audit instead)
    val noCp: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
      "x_containment_nocp" -> ((s, d) => graft.operators.Dedup
        .containmentPairsNoCheckpointForAudit(graft.tables.Tables.documents(s, d))),
      "x_lexical_cosine_nocp" -> ((s, d) => graft.operators.Dedup
        .lexicalCosineOn(graft.tables.Tables.documents(s, d), checkpoint = false)))
    args.drop(1).foreach { name =>
      val plan =
        try noCp.getOrElse(name, SparkEntry.queries(name))(spark, sfDir)
          .queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
        catch { case e: Throwable => s"EXPLAIN FAILED: ${e.getMessage}" }
      val w = new java.io.PrintWriter(s"$outDir/$name.txt")
      try w.println(plan) finally w.close()
      println(s"explained $name -> $outDir/$name.txt")
    }
    spark.stop()
  }
}
