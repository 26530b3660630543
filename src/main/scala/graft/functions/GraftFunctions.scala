package graft.functions

import graft.core.GraftTable

/**
 * Catalog helper functions (paimon `sys.max_pt`, resolved at analysis time
 * to a literal so it constant-folds into partition pruning — reference
 * paimon-spark/.../catalyst/analysis/ReplacePaimonFunctions.scala and
 * docs/docs/spark/sql-functions.md:30-50).
 */
object GraftFunctions {

  /** Latest (max) value of `partitionCol` among partitions with live data.
    * Returned as a value: embed with lit(...) so pruning sees a constant. */
  def maxPt(t: GraftTable, partitionCol: String): String = {
    val vals = t.planFiles().flatMap(_.partition.get(partitionCol)).filter(_ != null)
    require(vals.nonEmpty, s"no live partitions for $partitionCol")
    vals.max
  }
}
