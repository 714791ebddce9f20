package graft.queries

import org.apache.spark.sql.DataFrame

/** Session-state hygiene for registry queries that `persist()` (today:
  * q93's shared daily summary). A registry query must not leak cache
  * entries for the life of the session (round-8 verdict item 6), but it
  * also cannot unpersist eagerly — the consumer executes the returned
  * plan AFTER the builder runs. So builders `track` what they persist and
  * the harnesses (Verify after each query, Bench after each timed pass)
  * call `releaseAll()`: the cache lives exactly as long as the one query
  * that built it. Unpersist is non-blocking — cleanup must not tax the
  * next timed query.
  *
  * At 100 TB the same contract holds: a cached shared subplan is scoped
  * to the job that uses it, released when the job completes — never an
  * unbounded session-lifetime accumulation.
  */
object QueryCaches {
  private val live = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Register a persisted DataFrame for end-of-query release. */
  def track(df: DataFrame): DataFrame = { live.add(df); df }

  def trackedCount: Int = live.size

  /** Snapshot of currently-tracked frames (hygiene specs inspect
    * storageLevel across a releaseAll). */
  def peek: Seq[DataFrame] = {
    val b = Seq.newBuilder[DataFrame]
    live.forEach(df => b += df)
    b.result()
  }

  /** Unpersist everything tracked since the last release. Safe to call
    * when empty (the common case — only cache-exemplar queries track). */
  def releaseAll(): Unit = {
    var df = live.poll()
    while (df != null) {
      try df.unpersist(blocking = false)
      catch { case _: Throwable => () }
      df = live.poll()
    }
  }
}
