package graft.operators

import java.util.concurrent.{CountDownLatch, TimeUnit}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Latched observed-metric reader shared by the iterative operators
  * ([[Dedup.connectedComponents]], [[LabelProp.communities]]): the
  * convergence signal RIDES each round's checkpoint materialization as a
  * `Dataset.observe` / CollectMetrics observation — one job per round, no
  * UDF, whole-stage codegen intact. A separate cached-scan count() job per
  * round (the r9 CC design) doubled the round's job count, and at 32
  * shuffle partitions the per-job fixed cost (scheduling + task launch)
  * dominated wall clock — exactly the per-iteration overhead a
  * 1000-executor cluster cannot afford. The metric is read through a
  * QueryExecutionListener latch registered BEFORE the action — the
  * listener bus is async, so the event is awaited, never polled, and no
  * private[sql] surface is touched.
  */
object Convergence {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)
  private val callIds = new java.util.concurrent.atomic.AtomicLong()

  /** One iterative call's worth of observed rounds. NOT thread-safe — one
    * instance per operator invocation, used from the driver loop.
    *
    * `eventsMissing` is latched on the first missed CollectMetrics event:
    * if one round's event never arrived, none will (this runtime's
    * checkpoint action isn't posting QueryExecution events) — later rounds
    * of THIS call go straight to the count fallback instead of re-waiting
    * 10 s each. Per-call, not JVM-global: one anomalous run must not
    * degrade every future iteration in the process. */
  final class Latched(spark: SparkSession, tag: String) {
    private val call = callIds.incrementAndGet()
    private var round = 0
    private var eventsMissing = false

    /** Runs one observed round: `materialize(obsName)` must build the
      * round's frame CARRYING `.observe(obsName, <single long metric>)`
      * and eagerly materialize it (checkpoint/localCheckpoint(eager)).
      * Returns (materialized frame, observed metric), falling back to
      * `fallback` (a count over the already-materialized frame) if the
      * event never arrives within 10 s. */
    def observedRound(materialize: String => DataFrame,
                      fallback: DataFrame => Long): (DataFrame, Long) = {
      val obsName = s"graft.$tag.$call.$round"
      round += 1
      val latch = new CountDownLatch(1)
      @volatile var observed: Long = -1L
      val listener = new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
                               qe: org.apache.spark.sql.execution.QueryExecution,
                               durationNs: Long): Unit =
          qe.observedMetrics.get(obsName).foreach { row =>
            // defensive: a null metric is "no rows", not "no event"
            observed = if (row.isNullAt(0)) 0L else row.getLong(0)
            latch.countDown()
          }
        override def onFailure(funcName: String,
                               qe: org.apache.spark.sql.execution.QueryExecution,
                               exception: Exception): Unit = ()
      }
      val registered = !eventsMissing
      if (registered) spark.listenerManager.register(listener)
      try {
        val df = materialize(obsName)
        // a latch timeout guards against an event that never arrives (e.g.
        // a future Spark moving checkpoint off withAction) by falling back
        // to a cached-scan count instead of hanging the driver
        if (registered && latch.await(10, TimeUnit.SECONDS)) (df, observed)
        else {
          if (registered) {
            eventsMissing = true
            log.warn(s"graft.$tag observation event missing - falling back to " +
              "cached-scan counts for this call")
          }
          (df, fallback(df))
        }
      } finally {
        if (registered) spark.listenerManager.unregister(listener)
      }
    }
  }
}
