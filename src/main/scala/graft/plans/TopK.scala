package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Ascending, SortOrder}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** User-facing entry for the custom per-group top-k operator. */
object TopK {

  /** Top `k` rows per distinct `groupCols` tuple, ranked by `orderCols`
    * (plain columns default to ascending; use `col.desc` etc. for the
    * rest). Equivalent to the row_number-window form but planned with a
    * pre-shuffle partial reduction — see [[TopKPerGroup]].
    */
  def perGroup(df: DataFrame, groupCols: Seq[Column], orderCols: Seq[Column],
      k: Int): DataFrame = {
    val order = orderCols.map(c => ColumnBridge.catalystExpression(c) match {
      case s: SortOrder => s
      case e => SortOrder(e, Ascending)
    })
    ColumnBridge.ofRows(df.sparkSession,
      TopKPerGroup(groupCols.map(ColumnBridge.catalystExpression), order, k,
        ColumnBridge.logicalPlan(df)))
  }
}
