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
}
