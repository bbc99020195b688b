package graft.mapreduce

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}

/** Typed MapReduce façade — the reference's pluggable application
  * contract (reference lib/mr_apps/word_count.ex:3-13: `mapper(filename,
  * content) :: [{k, v}]`, `reducer(key, values) :: term`; call sites
  * lib/map_reduce/worker.ex:111 and :135) re-expressed as a generic
  * Spark job. The master/worker scheduling, hash-partitioned shuffle,
  * and sort-based grouping the reference hand-rolls (master.ex,
  * worker.ex:142-150) are exactly what `groupByKey` + Catalyst's
  * exchange already do, so this façade is ~20 lines: flatMap (map
  * phase) → groupByKey (shuffle, replacing `rem(phash2(key), 8)`,
  * worker.ex:144) → reduceGroups/mapGroups (reduce phase).
  *
  * For associative+commutative reducers prefer [[runReduce]]: it lowers
  * to `reduceGroups`, which Spark executes with partial (map-side)
  * aggregation — the MapReduce paper's combiner (§4.3) — so only one
  * pre-combined record per key per partition crosses the wire. The
  * general [[run]] (arbitrary `(K, Iterator[V]) => OUT`) cannot
  * map-side combine, mirroring the paper's general reducer.
  */
final case class MapReduceJob[IN, K, V, OUT](
    mapper: IN => IterableOnce[(K, V)],
    reducer: (K, Iterator[V]) => OUT) {

  /** General lowering: flatMap → groupByKey → mapGroups. */
  def run(input: Dataset[IN])(implicit
      ek: Encoder[K], ekv: Encoder[(K, V)], eo: Encoder[(K, OUT)]): Dataset[(K, OUT)] =
    input.flatMap(mapper)
      .groupByKey(_._1)
      .mapGroups((k, it) => (k, reducer(k, it.map(_._2))))
}

object MapReduceJob {

  /** Literal RDD lowering: `flatMap → reduceByKey` — the classic Spark
    * restatement of the paper's dataflow (reduceByKey IS map-side
    * combine + hash-partitioned shuffle + reduce, i.e. the reference's
    * worker.ex:111-150 pipeline with `rem(phash2(key), R)` replaced by
    * Spark's HashPartitioner). Same results as the Dataset lowerings;
    * kept because the RDD API is the direct idiom for imperative
    * per-record logic that doesn't fit a schema.
    */
  def runRddReduce[IN, K: scala.reflect.ClassTag, V: scala.reflect.ClassTag](
      input: org.apache.spark.rdd.RDD[IN],
      mapper: IN => IterableOnce[(K, V)],
      merge: (V, V) => V): org.apache.spark.rdd.RDD[(K, V)] =
    input.flatMap(mapper).reduceByKey(merge)

  /** Combiner-friendly lowering for associative-commutative merge. */
  def runReduce[IN, K, V](
      input: Dataset[IN],
      mapper: IN => IterableOnce[(K, V)],
      merge: (V, V) => V)(implicit
      ek: Encoder[K], ekv: Encoder[(K, V)]): Dataset[(K, V)] =
    input.flatMap(mapper)
      .groupByKey(_._1)
      .reduceGroups((a, b) => (a._1, merge(a._2, b._2)))
      .map { case (k, (_, v)) => (k, v) }(ekv)

  /** The reference application, verbatim semantics (word_count.ex:3-13):
    * mapper splits content on `[^a-zA-Z]`, drops empties, uppercases,
    * emits (word, 1); reducer counts the group.
    */
  def wordCount(spark: SparkSession, texts: Dataset[String]): Dataset[(String, Long)] = {
    import spark.implicits._
    MapReduceJob[String, String, Long, Long](
      mapper = content => content.split("[^a-zA-Z]").iterator
        .filter(_.nonEmpty).map(w => (w.toUpperCase, 1L)),
      reducer = (_, values) => values.sum
    ).run(texts)
  }
}
