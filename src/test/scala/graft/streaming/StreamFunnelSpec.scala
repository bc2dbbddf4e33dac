package graft.streaming

import graft.{SparkEntry, SparkSpec}

/** stream_funnel vs funnel_steps: the stateful streaming funnel's
  * completed state must equal the batch funnel row-for-row (the
  * final-state law), and the step counts must be monotone
  * non-increasing (a funnel can only narrow). The sf replay stages 4
  * time-quartile micro-batches, so equality here proves the monotone
  * state machine genuinely survives batch boundaries. */
class StreamFunnelSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("completed streaming funnel equals the batch funnel") {
    val stream = SparkEntry.queries("stream_funnel")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = SparkEntry.queries("funnel_steps")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stream == batch)
  }

  test("step counts are monotone non-increasing") {
    val q = SparkEntry.queries("stream_funnel")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(q("step1_view") >= q("step2_click"))
    assert(q("step2_click") >= q("step3_purchase"))
  }
}
