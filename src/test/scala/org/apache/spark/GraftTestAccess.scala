package org.apache.spark

/** Test-only bridge into `private[spark]` SparkContext internals.
  *
  * Job-count assertions (e.g. "this gate launched ZERO Spark jobs")
  * observe SparkListener events, which are delivered asynchronously —
  * without draining the listener bus first, a just-launched job's
  * onJobStart could arrive after the assertion and a regression would
  * flake instead of fail. Spark's own test utilities do exactly this
  * drain; they are not shipped in the runtime jars, hence this shim.
  */
object GraftTestAccess {
  /** Block until every queued listener event has been delivered. */
  def drainListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty(30000L)
}
