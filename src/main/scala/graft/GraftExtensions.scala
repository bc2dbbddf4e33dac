package graft

import graft.functions.{DotProductFloat, MapContainsAll, ShingleGenerator}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions wiring (SURVEY.md §4.3): registers graft's
  * custom expressions so any session built with
  * `spark.sql.extensions=graft.GraftExtensions` (set by GraftSession)
  * resolves them in SQL text without per-session registration calls,
  * plus the whole-operator extension (TopKPerGroup): its planner
  * strategy and its filter-pushdown optimizer rule. Everything else
  * stays Catalyst-native (SURVEY.md §4.2 policy).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    e.injectOptimizerRule(_ => graft.plans.PushFilterThroughTopK)
    e.injectFunction((
      FunctionIdentifier("map_contains_all"),
      new ExpressionInfo(classOf[MapContainsAll].getName, "map_contains_all"),
      (exprs: Seq[Expression]) => MapContainsAll(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("dot_f"),
      new ExpressionInfo(classOf[DotProductFloat].getName, "dot_f"),
      (exprs: Seq[Expression]) => DotProductFloat(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("shingle_gen"),
      new ExpressionInfo(classOf[ShingleGenerator].getName, "shingle_gen"),
      (exprs: Seq[Expression]) => ShingleGenerator(exprs(0), exprs(1))))
    // Catalyst's own bloom-filter pair, surfaced as SQL functions: the
    // engine uses them internally for AQE runtime filters but does not
    // register them, so a WRITE-time prefilter (join_bloom_prefilter)
    // could not otherwise build one declaratively. The analyzer wraps
    // the AggregateFunction in an AggregateExpression on resolution,
    // same as any builtin aggregate.
    e.injectFunction((
      FunctionIdentifier("bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "bloom_agg"),
      (exprs: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          exprs(0), exprs(1), exprs(2))))
    e.injectFunction((
      FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "bloom_might_contain"),
      (exprs: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          exprs(0), exprs(1))))
  }
}
