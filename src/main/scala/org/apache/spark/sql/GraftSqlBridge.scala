package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for graft's native Catalyst expressions.
  * `ExpressionUtils` (and `Column`'s expression constructor) are
  * `private[sql]` in Spark 4, so extension libraries shipping custom
  * expressions expose them through a shim in this package — the same
  * pattern used by public Spark extension projects. */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Drop the storage blocks of a localCheckpoint'd frame NOW.
    * Iterative loops (connected components) checkpoint every round;
    * the PREVIOUS round's blocks are dead the moment the next round
    * has materialized and been compared, but `Dataset.unpersist` only
    * talks to the CacheManager — checkpoint blocks belong to the
    * underlying RDD, reachable only through the LogicalRDD node. GC +
    * ContextCleaner would reclaim them EVENTUALLY; an 1e8-node loop
    * accumulates rounds faster than that (probe-measured: Java-heap
    * OOM at chain-4096/1e8 before the fix). Only call on frames that
    * will never be read again — the lineage is truncated, so the
    * blocks are unrecoverable. No-op on non-checkpoint plans. */
  def unpersistCheckpoint(df: Dataset[_]): Unit =
    df.queryExecution.logical match {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd.unpersist(false)
      case _ => ()
    }

  /** Register the graft_* SQL functions on a LIVE session (the
    * `withExtensions`/`spark.sql.extensions` route in
    * [[graft.functions.GraftExtensions]] only applies at session build
    * time; this helper covers sessions the library didn't create). */
  def registerGraftFunctions(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def lit(e: Expression, what: String): Int = e match {
      case catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"$what must be an integer literal, got $other")
    }
    reg.createOrReplaceTempFunction("graft_dot",
      exprs => graft.functions.DotProductExpr(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_simhash",
      exprs => graft.functions.SimHashExpr(exprs(0)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_minhashes",
      exprs => graft.functions.MinHashesExpr(exprs(0), lit(exprs(1), "k")), "scala_udf")
    reg.createOrReplaceTempFunction("graft_winnow_min",
      exprs => graft.functions.WinnowMinExpr(exprs(0), lit(exprs(1), "k")), "scala_udf")
    reg.createOrReplaceTempFunction("graft_hashed_shingles",
      exprs => graft.functions.HashedShinglesExpr(exprs(0), lit(exprs(1), "n")), "scala_udf")
  }
}
