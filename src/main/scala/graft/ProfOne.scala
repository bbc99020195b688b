package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import scala.collection.mutable

/** Dev profiling tool (guide §1/§7, UI-less sandbox twin): run named
  * queries under the Bench session shape with a SparkListener that
  * records every job's wall time, stage task totals, and shuffle
  * bytes, then print a per-job breakdown. This is how "where does the
  * time go" questions get answered here — the Spark UI is disabled in
  * the bench contract, so the listener IS the Stages tab.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.ProfOne q_x q_y"
  * Each query runs twice: pass 1 cold (JIT + any materializeOnce
  * builds land here), pass 2 warm — the printed job table labels the
  * pass so one-time costs are attributable.
  */
object ProfOne {
  private case class JobRec(id: Int, desc: String, start: Long,
      var end: Long = 0L, var nTasks: Int = 0, var taskTimeMs: Long = 0L,
      var shuffleReadB: Long = 0L, var shuffleWriteB: Long = 0L,
      var inputB: Long = 0L)

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
    val jobs = mutable.LinkedHashMap[Int, JobRec]()
    val stageToJob = mutable.HashMap[Int, Int]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobs(e.jobId) = JobRec(e.jobId, desc, e.time)
        e.stageIds.foreach(s => stageToJob(s) = e.jobId)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(e.jobId).foreach(_.end = e.time)
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        jobs.synchronized {
          val si = e.stageInfo
          stageToJob.get(si.stageId).flatMap(jobs.get).foreach { j =>
            j.nTasks += si.numTasks
            j.taskTimeMs += si.taskMetrics.executorRunTime
            j.shuffleReadB += si.taskMetrics.shuffleReadMetrics.totalBytesRead
            j.shuffleWriteB += si.taskMetrics.shuffleWriteMetrics.bytesWritten
            j.inputB += si.taskMetrics.inputMetrics.bytesRead
          }
        }
    }
    spark.sparkContext.addSparkListener(listener)
    def exec(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    exec("q_topk") // warm-up
    Bench.warmDedupCodegen(spark, sfDir)
    spark.catalog.clearCache()
    args.foreach { name =>
      (1 to 2).foreach { pass =>
        jobs.synchronized { jobs.clear(); stageToJob.clear() }
        val t0 = System.nanoTime()
        exec(name)
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        Thread.sleep(300) // let the listener bus drain before reading
        println(f"\n=== PROF $name pass=$pass total=$dt%.2f s ===")
        val snap = jobs.synchronized { jobs.values.toSeq }
        val nJobs = snap.size
        val wall = snap.map(j => math.max(0L, j.end - j.start)).sum / 1e3
        println(f"jobs=$nJobs wallSum=$wall%.2f s (overlap possible)")
        snap.sortBy(j => -(j.end - j.start)).take(30).foreach { j =>
          val w = math.max(0L, j.end - j.start) / 1e3
          println(f"  job ${j.id}%4d ${w}%7.3f s tasks=${j.nTasks}%4d " +
            f"taskTime=${j.taskTimeMs / 1e3}%7.2f s " +
            f"shufR=${j.shuffleReadB / 1024}%8d KB shufW=${j.shuffleWriteB / 1024}%8d KB " +
            f"in=${j.inputB / 1024}%8d KB  ${j.desc.take(60)}%s")
        }
      }
    }
    spark.stop()
  }
}
