package graft

import graft.operators.EventAnalytics
import graft.streaming.EventStreams
import org.scalatest.funsuite.AnyFunSuite

/** Round-14 surface: the replay-clock gated session stream (shares the
  * batch q_sessions oracle) and the file-source k-means replay.
  */
class Round14OpsSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  test("streamedSessionsGated equals the batch sessionization row-for-row") {
    // the whole point of the replay clock: EVERY session — including
    // each user's final one — closes inline, so the streaming twin
    // reproduces the batch session_window result exactly (same rows,
    // same rounded money, same formatted start)
    val streamed = EventStreams.streamedSessionsGated(spark, sfDir)
      .as[(Long, String, Long, Double)].collect().toSeq
    val batch = EventAnalytics.sessions(spark, sfDir)
      .as[(Long, String, Long, Double)].collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("streamedSessionsGated emits strictly more sessions than the watermark-gated stream") {
    // streamedSessions withholds final sessions the terminal watermark
    // has not closed; the replay clock withholds nothing
    val gated = EventStreams.streamedSessionsGated(spark, sfDir).count()
    val watermarked = EventStreams.streamedSessions(spark, sfDir).count()
    assert(gated >= watermarked)
    val batch = EventAnalytics.sessions(spark, sfDir).count()
    assert(gated === batch)
  }
}
