package graft.tools

import graft.SparkSpec

/** Smoke laws for the LiveSoak harness Bench records `live_eps` /
  * `service_eps` through: at small scale, both halves must land
  * EXACTLY the eligible record count (the 1-in-20 skip-namespace
  * lines filtered, everything else exactly once through the full
  * watch → gate → enrich/project → memory-sink path) — a harness
  * that over- or under-counts would corrupt the bench artifact
  * silently. */
class LiveSoakSpec extends SparkSpec {

  test("event-half soak lands exactly the eligible events") {
    val total = 2000
    val r = LiveSoak.runEvents(spark, total, chunk = 500)
    assert(r.landed == (1 to total).count(_ % 20 != 0))
    assert(r.offered == total && r.secs > 0 && r.eps > 0)
  }

  test("service-half soak lands exactly the eligible updates") {
    val total = 2000
    val r = LiveSoak.runServices(spark, total, uids = 50, chunk = 500)
    assert(r.landed == (1 to total).count(_ % 20 != 0))
    assert(r.offered == total && r.secs > 0 && r.eps > 0)
  }
}
