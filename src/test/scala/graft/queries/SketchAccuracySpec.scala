package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Error bounds for the two rows-only sketch operators (no DuckDB hash
  * oracle exists for implementation-specific sketches, so the driver
  * records only row counts — these specs supply the missing accuracy
  * gate): HLL must sit within a small multiple of its configured rsd;
  * the mergeable quantile sketch must land between neighboring exact
  * quantiles. */
class SketchAccuracySpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("approx_count_distinct within 3x rsd of exact (rsd=0.02)") {
    val li = graft.Tables.lineitem(spark, dir)
    val exact = li.select(countDistinct(col("l_partkey"))).as[Long].head()
    val approx = li.select(approx_count_distinct(col("l_partkey"), 0.02))
      .as[Long].head()
    val err = math.abs(approx - exact).toDouble / exact
    assert(err <= 0.06, s"HLL err $err (exact=$exact approx=$approx)")
  }

  test("percentile_approx p50 lies between exact p45 and p55") {
    val li = graft.Tables.lineitem(spark, dir)
    val Array(p45, p55) = li
      .select(expr("percentile(l_extendedprice, array(0.45, 0.55))"))
      .as[Seq[Double]].head().toArray
    val approx = li
      .select(expr("percentile_approx(l_extendedprice, 0.5, 1000)"))
      .as[Double].head()
    assert(approx >= p45 && approx <= p55,
      s"approx p50 $approx outside exact [$p45, $p55]")
  }
}
