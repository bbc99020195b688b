package graft

import org.apache.spark.sql.graft.GraftFunctions
import org.scalatest.funsuite.AnyFunSuite

/** The custom Catalyst expressions exposed through the SQL surface —
  * a SQL user gets the same codegen'd functions the Scala API uses.
  */
class SqlFunctionsSpec extends AnyFunSuite with SparkSessionTestWrapper {

  test("registered SQL functions evaluate like the Scala API") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      """SELECT
        |  cosine_similarity(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS cos_same,
        |  sq_dist(array(0.0F, 0.0F), array(3.0F, 4.0F)) AS d2,
        |  rolling_hash('ab') AS rh,
        |  size(shingle_hash_set('aaaaaaaaaaaa', 8)) AS nsh,
        |  size(char_shingles('abcdefghij', 8)) AS nraw,
        |  sorted_intersect_size(array(1L, 3L, 5L), array(3L, 5L, 7L)) AS inter
        |""".stripMargin).head()
    assert(row.getDouble(0) === 1.0)
    assert(row.getDouble(1) === 25.0)
    assert(row.getLong(2) === 3105L) // 97*31 + 98
    assert(row.getInt(3) === 1)      // all shingles identical
    assert(row.getInt(4) === 3)      // 10 chars -> 3 8-shingles
    assert(row.getLong(5) === 2L)
  }

  test("md5_hash32 SQL function matches the Scala API") {
    GraftFunctions.register(spark)
    import org.apache.spark.sql.functions.lit
    val viaSql = spark.sql("SELECT md5_hash32('hello world') AS h").head().getLong(0)
    val viaApi = spark.range(1)
      .select(graft.functions.TextFunctions.md5Hash32(lit("hello world")).as("h"))
      .head().getLong(0)
    assert(viaSql === viaApi)
  }

  test("decontaminationSqlForm: the pure-SQL-text pipeline equals the Scala operator") {
    // q_sql_decontamination's premise: a user who only writes SQL gets
    // the identical scan — registration, argument binding, and codegen
    // all exercised through one spark.sql(...) text
    val viaApi = graft.operators.Dedup.decontamination(spark, sfDir)
      .collect().map(_.toString)
    val viaSql = graft.operators.Dedup.decontaminationSqlForm(spark, sfDir)
      .collect().map(_.toString)
    assert(viaSql.length > 0)
    assert(viaSql.sameElements(viaApi))
  }

  test("spark.sql.extensions config string installs the functions at session build") {
    // the production install path: the shared test session is built
    // with spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions
    // as a class-name STRING (SparkSessionTestWrapper), exactly as a
    // user's spark-submit --conf would — classloader lookup, no-arg
    // instantiation, injectFunction. The proof must be register()-proof:
    // newSession() builds a FRESH function registry that only
    // build-time-injected functions reach (other tests'
    // createOrReplaceTempFunction cannot leak into it).
    import org.apache.spark.sql.functions.lit
    val fresh = spark.newSession()
    val row = fresh.sql(
      "SELECT rolling_hash('ab') AS rh, md5_hash32('x') AS h32").head()
    assert(row.getLong(0) === 3105L) // 97*31 + 98
    val apiH32 = fresh.range(1)
      .select(graft.functions.TextFunctions.md5Hash32(lit("x")).as("h"))
      .head().getLong(0)
    assert(row.getLong(1) === apiH32)
  }

  test("SQL functions participate in whole-stage codegen over a table") {
    GraftFunctions.register(spark)
    graft.tables.Tables.documents(spark, sfDir).createOrReplaceTempView("docs_v")
    val df = spark.sql(
      "SELECT doc_id, rolling_hash(text) AS rh, size(shingle_hash_set(lower(trim(text)), 8)) AS n FROM docs_v")
    // collect() executes THIS Dataset's own QueryExecution — required
    // since the widened documents scan puts an exchange (and so an
    // AdaptiveSparkPlan wrapper) in the plan, whose toString only shows
    // the codegen'd final plan after execution
    assert(df.collect().length === 500)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"expected whole-stage codegen markers in:\n$plan")
  }
}
