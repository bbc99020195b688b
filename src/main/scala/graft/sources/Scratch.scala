package graft.sources

import org.apache.spark.sql.SparkSession

/** Cluster-safe scratch roots for materialized layouts and sink
  * round-trips ([[Sinks]], [[graft.operators.Dedup.materializedPairs]],
  * [[graft.operators.Similarity.ivfKnnMaterialized]]).
  *
  * Rounds 1-8 pinned these under the repo's target/ directory — fine in
  * a single-host sandbox, wrong on any real cluster where the driver's
  * local filesystem is not the shared store. Paths now derive from
  * session conf: `graft.scratch.dir` when set (point it at a shared
  * filesystem or object-store prefix in production), otherwise a
  * `graft_scratch` prefix under `spark.sql.warehouse.dir` — the one
  * location a deployment already has to make durable and shared.
  */
object Scratch {
  def dir(spark: SparkSession, name: String): String = {
    val root = spark.conf.getOption("graft.scratch.dir")
      .getOrElse(spark.conf.get("spark.sql.warehouse.dir")
        .stripSuffix("/") + "/graft_scratch")
    s"$root/$name"
  }

  /** Per-corpus scratch slot `<name>/<md5(sourceDir)>`: the full
    * 128-bit key keeps two corpora touched by one session from
    * thrashing a single slot.
    */
  def corpusDir(spark: SparkSession, name: String,
      sourceDir: String): String = {
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(sourceDir.getBytes("UTF-8")).map("%02x".format(_)).mkString
    dir(spark, s"$name/$md5")
  }

  /** Session-lifetime write-once memo shared by every materialized
    * artifact (pair graphs, ANN edges, aHash tables, BPE models):
    * `build` must write its output(s) under `key`; it runs at most
    * once per (session, key), with double-checked locking keeping
    * concurrent first callers behind one build. Centralized so the
    * locking/memo discipline lives in ONE place instead of a
    * per-artifact copy that can drift. The lock is PER KEY
    * (computeIfAbsent a monitor object) — a minutes-long BPE train
    * must not serialize an unrelated corpus's edge build behind one
    * global monitor.
    */
  def materializeOnce(key: String)(build: => Unit): Unit =
    if (!built.contains(key)) {
      val lock = locks.computeIfAbsent(key, _ => new Object)
      lock.synchronized {
        if (!built.contains(key)) { build; built.add(key) }
      }
    }

  /** Run independent build closures CONCURRENTLY from driver threads
    * (guide §2.6 — Spark happily schedules several jobs at once; the
    * builds here are small-parallelism stages that leave most cores
    * idle when run back to back). Blocks until all complete; the first
    * failure is rethrown after every thread finishes, so a failed
    * sibling cannot leave another build half-observed. Use ONLY for
    * builds with no data dependency on each other (e.g. two ingest
    * commits over disjoint doc splits).
    */
  def inParallel(tasks: (() => Unit)*): Unit = {
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = tasks.map { t =>
      val th = new Thread(() => try t() catch { case e: Throwable => errs.add(e); () })
      th.setDaemon(true)
      th.start()
      th
    }
    threads.foreach(_.join())
    if (!errs.isEmpty) throw errs.peek()
  }

  private val built =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private val locks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
}
