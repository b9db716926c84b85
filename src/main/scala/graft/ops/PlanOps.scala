package graft.ops

import org.apache.spark.sql.DataFrame

/** Plan-shaping helpers that operate on the query plan rather than the
  * data.
  */
object PlanOps {

  /** Lazy optimizer fence: re-roots `df` as a LogicalRDD so rules cannot
    * rewrite across the boundary. Nothing is materialized — `df.rdd` is
    * lazy and the whole thing still executes as one job.
    *
    * Use case (the ONLY one): an expensive derived column that is both
    * filtered on and returned. Predicate pushdown substitutes the column's
    * defining expression into the filter condition wholesale — projection
    * staging protects projections from CollapseProject, but nothing
    * protects a predicate — and FilterExec performs no subexpression
    * elimination, so the expression tree is re-evaluated per reference
    * (the corpus profile gate measured 8s fenced→1.1s at 400k docs; the
    * native-expression variant 53s→1.5s).
    *
    * Costs, so this is never used casually: the fence breaks whole-stage
    * fusion at the boundary, adds an InternalRow→Row→InternalRow round
    * trip, and blocks ALL pushdown — including column pruning into the
    * scan — so everything below it must already be pruned/filtered as
    * tightly as possible.
    */
  def fence(df: DataFrame): DataFrame =
    df.sparkSession.createDataFrame(df.rdd, df.schema)
}
