package graft

import graft.functions.TypedAggregators.MisraGries
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HeavyHittersSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  test("Misra-Gries summary never drops an item above n/k (superset guarantee)") {
    // skewed synthetic stream: item "hot_i" appears 100+i times, plus
    // 5000 singletons; k=50 counters must retain everything > n/50
    val hot = (0 until 10).flatMap(i => Seq.fill(500 + i)(s"hot_$i"))
    val noise = (0 until 5000).map(i => s"noise_$i")
    val data = scala.util.Random.shuffle(hot ++ noise)
    val n = data.size
    val k = 50
    val cands = data.toDS().repartition(8).groupByKey(_ => true)
      .agg(new MisraGries(k).toColumn.name("c"))
      .flatMap(_._2).collect().toSet
    val trueCounts = data.groupBy(identity).view.mapValues(_.size).toMap
    trueCounts.filter(_._2 > n / k).keys.foreach { item =>
      assert(cands.contains(item), s"$item (count ${trueCounts(item)}) must survive")
    }
  }

  test("heavyHitters equals the exact groupBy+threshold computation") {
    val want = graft.tables.Tables.documents(spark, sfDir)
      .select(explode(graft.functions.TextFunctions.upperTokens($"text")).as("word"))
      .groupBy($"word").agg(count(lit(1)).as("cnt"))
      .crossJoin(graft.tables.Tables.documents(spark, sfDir)
        .select(explode(graft.functions.TextFunctions.upperTokens($"text")).as("w"))
        .agg(count(lit(1)).as("total")))
      .filter($"cnt".cast("double") >= $"total" * 0.01)
      .select($"word", $"cnt").as[(String, Long)].collect().toMap
    val got = TextAnalysis.heavyHitters(spark, sfDir)
      .as[(String, Long)].collect().toMap
    assert(got === want)
    assert(got.nonEmpty)
  }
}
