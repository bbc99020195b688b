package graft.operators

import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar-function surface: string / date / math / JSON expression
  * groups (SURVEY.md §2.2 "Scalar functions"), generalizing the
  * reference's only scalar work (regex split + upper + string concat,
  * word_count.ex:5-7, worker.ex:148). Everything is a Catalyst builtin
  * — codegen'd, pushdown-transparent.
  */
object Scalars {

  /** String functions over part: case mapping, length, substring,
    * regexp extraction, concat.
    */
  def stringFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        length(col("p_name")).cast("long").as("name_len"),
        substring(col("p_name"), 1, 5).as("name_pre"),
        regexp_extract(col("p_name"), "^([a-z]+)", 1).as("first_word"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        lpad(col("p_size").cast("string"), 4, "0").as("size_pad"))
      .orderBy(col("p_partkey"))

  /** Fuzzy entity matching: for each typo'd probe name (derived
    * deterministically from the data — second character dropped), the
    * top-3 closest part names by Levenshtein distance. Integer edit
    * distances → no float-portability risk; the per-probe selection
    * runs through the bounded top-K aggregator (value = −dist, tag =
    * p_partkey, matching the oracle's (dist ASC, key ASC) order), and
    * names come back on one broadcast join — the same
    * never-shuffle-the-corpus shape as hard-negative mining. At real
    * scale the candidate set would be length-banded/prefix-blocked
    * before scoring (the PPJoin idea applied to edit distance); the
    * scoring and selection dataflow is unchanged.
    */
  def fuzzyMatch(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TypedAggregators.topKSelect
    val p = Tables.part(spark, dir).select(col("p_partkey"), col("p_name"))
    val probes = p.filter(col("p_partkey") < 5)
      .select(col("p_partkey").as("probe_id"),
        concat(substring(col("p_name"), 1, 1),
          expr("substring(p_name, 3)")).as("probe"))
    val scored = p.crossJoin(broadcast(probes))
      .select(col("probe_id").as("key"),
        (-levenshtein(col("probe"), col("p_name"))).as("v"),
        col("p_partkey").as("tag"))
    val top = topKSelect(spark, scored, 3)
      .select(col("key").as("probe_id"), col("rank"),
        col("tag").as("p_partkey"), (-col("v")).cast("long").as("dist"))
    p.join(broadcast(top), "p_partkey")
      .select(col("probe_id"), col("rank"), col("p_partkey"), col("p_name"), col("dist"))
      .orderBy(col("probe_id"), col("rank"))
  }

  /** Date/time functions over orders: truncation to month, extraction,
    * day arithmetic.
    */
  def dateFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(
        date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(
        count(lit(1)).as("n_orders"),
        min(dayofmonth(col("o_orderdate"))).cast("long").as("min_dom"),
        max(weekday(col("o_orderdate"))).cast("long").as("max_dow"),
        round(sum(col("o_totalprice")), 2).as("month_revenue"))
      .orderBy(col("month"))

  /** Math functions over lineitem aggregates. */
  def mathFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        round(sqrt(sum(col("l_quantity"))), 4).as("sqrt_qty"),
        round(ln(sum(col("l_extendedprice"))), 4).as("ln_price"),
        round(pow(avg(col("l_discount")), 2), 6).as("disc_sq"),
        ceil(max(col("l_tax")) * 100).cast("long").as("max_tax_pct"),
        floor(min(col("l_extendedprice"))).cast("long").as("min_price_fl"),
        round(abs(min(col("l_quantity") - 25)), 2).as("abs_qty_dev"))
      .orderBy(col("l_returnflag"))

  /** JSON extraction from the events.props string column — the
    * semi-structured path (get_json_object stays codegen'd via
    * Jackson; at scale prefer from_json with an explicit schema once
    * the shape is known, which this also demonstrates).
    */
  def jsonFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  /** VARIANT — Spark 4.x's semi-structured type: parse_json into a
    * binary variant once, then typed path extraction (variant_get),
    * which at scale beats per-access string re-parsing and keeps the
    * shredded access codegen-friendly. Values must equal the string
    * json path the DuckDB oracle uses — the gate certifies the variant
    * path is lossless for the typed accesses.
    */
  def variantFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(expr("variant_get(parse_json(props), '$.k', 'bigint')").as("k"),
        col("value"))
      .groupBy(pmod(col("k"), lit(5L)).as("k_bucket"))
      .agg(count(lit(1)).as("n_events"), sum(col("k")).as("sum_k"),
        round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("k_bucket"))

  /** Distributed grep (MapReduce paper §2.3 application #1): regex
    * predicate over documents, pushed onto the scan.
    */
  /** Column profiling: per-column row/null/distinct counts and value
    * range — the first pass any data pipeline runs over a new drop. One
    * aggregation per column unioned; at 100 TB each is a single
    * partial-agg scan and they share the cached input.
    */
  def profile(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    cols.map { c =>
      li.agg(
        lit(c).as("column"),
        count(lit(1)).as("n_rows"),
        sum(when(col(c).isNull, 1).otherwise(0)).cast("long").as("n_nulls"),
        count_distinct(col(c)).as("n_distinct"),
        round(min(col(c)), 4).as("min_val"),
        round(max(col(c)), 4).as("max_val"),
        round(avg(col(c)), 4).as("avg_val"))
    }.reduce(_ unionByName _).orderBy(col("column"))
  }

  /** Fixed-width histogram of order values — bucket = floor(x / width);
    * integer bucket ids keep the oracle comparison exact.
    */
  def histogram(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(floor(col("o_totalprice") / 50000).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("bucket_total"))
      .orderBy(col("bucket"))

  def grep(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(col("text").rlike("window.*join|join.*window"))
      .select(col("doc_id"), col("source"), col("lang"))
      .orderBy(col("doc_id"))

  /** Map-typed column surface: per document, build a word→count map
    * (map_from_entries over the grouped counts), then query it with
    * map_keys / element_at / map_filter. The MAP itself stays internal
    * (map ordering is engine-specific); the graded outputs are scalar
    * lookups, which are order-insensitive, so the DuckDB twin computes
    * them relationally.
    */
  def mapFuncs(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.upperTokens
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(upperTokens(col("text"))).as("word"))
      .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(map_from_entries(collect_list(struct(col("word"), col("cnt")))).as("wc"))
      .select(col("doc_id"),
        size(map_keys(col("wc"))).cast("long").as("n_distinct_words"),
        coalesce(element_at(col("wc"), "THE"), lit(0L)).as("n_the"),
        size(map_filter(col("wc"), (_, v) => v >= 5)).cast("long").as("n_frequent"))
      .orderBy(col("doc_id"))
  }

  /** Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): the null
    * bucket must MATCH itself across the two sides — a plain equi-join
    * silently drops it, the classic null-semantics trap. Buckets are
    * derived deterministically from the event payload (nullif on the
    * modulus) so both engines see identical nulls.
    */
  def nullSafeJoin(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.events(spark, dir)
      .select(col("event_type"),
        expr("nullif(CAST(get_json_object(props, '$.k') AS BIGINT) % 7, 0)").as("bucket"))
    val clicks = base.filter(col("event_type") === "click")
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_click"))
    val views = base.filter(col("event_type") === "view")
      .groupBy(col("bucket").as("vbucket")).agg(count(lit(1)).as("n_view"))
    clicks.join(views, col("bucket") <=> col("vbucket"))
      .select(col("bucket"), col("n_click"), col("n_view"))
      .orderBy(col("bucket")) // Spark: nulls first ascending
  }
}
