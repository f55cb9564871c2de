package org.apache.spark.sql

import org.apache.spark.sql.internal.{SortOrder => SortOrderNode}

/** Minimal accessor for `Column`'s internal node (`private[sql]` in
  * Spark 4): unwraps an explicit `.asc`/`.desc` into its child column +
  * direction, so graft's rank machinery can derive a numeric bucketing
  * lead from the FIRST order column of a caller-supplied sort. Columns
  * that are not sort orders pass through as ascending. */
object GraftColumnShim {
  def unwrapSortOrder(c: Column): (Column, Boolean) = c.node match {
    case so: SortOrderNode =>
      (Column(so.child), so.sortDirection == SortOrderNode.Ascending)
    case _ => (c, true)
  }
}
