package graft

import org.apache.spark.sql.DataFrame

/** Driver-local materialization shared by every query that produces its
  * result through temp resources (memory sinks, temp dirs, temp
  * tables): collect the frame into a local relation so the caller can
  * release those resources IMMEDIATELY instead of leaking one per
  * invocation. Contract: call inside `try`, release in `finally`.
  *
  * Scale note: only for results that are small by construction
  * (aggregates, bounded joins, fixture-scale dumps) — the relation
  * lives on the driver.
  */
object Local {

  def pin(df: DataFrame): DataFrame = {
    val rows = df.collect()
    df.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), df.schema)
  }
}
