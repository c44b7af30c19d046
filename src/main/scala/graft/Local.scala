package graft

import org.apache.spark.sql.DataFrame

/** Driver-local materialization for queries that produce their result
  * through temp resources (temp write dirs, temp tables): collect the
  * frame into a local relation so the caller can release those
  * resources IMMEDIATELY instead of leaking one per invocation.
  * Contract: call inside `try`, release in `finally`.
  *
  * STRICT O(1)-row contract: callers must produce frames whose row
  * count is a CONSTANT of the query definition — one row per declared
  * format/category (SourceQueries.qSinkRoundtrip: 3; qBucketedJoin:
  * one per market segment, 5) — never corpus- or time-span-
  * proportional. Anything that grows with the input takes the
  * [[Lease]] + distributed-read-back pattern instead (all streaming
  * queries and the sketch store do). These two sink-census callers
  * are the helper's ONLY permitted users.
  */
object Local {

  def pin(df: DataFrame): DataFrame = {
    val rows = df.collect()
    df.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), df.schema)
  }
}
