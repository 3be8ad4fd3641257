package org.apache.spark.graftshim

import org.apache.spark.SparkContext

/** Listener-bus drain for deterministic metric attribution. Spark
  * posts stage-completed events to its listener bus ASYNCHRONOUSLY, so
  * a counter snapshot taken right after an action can miss the last
  * stages of that very job. `SparkContext.listenerBus` is
  * `private[spark]`; this package-nested shim (the same idiom as
  * `sql.graftshim.shim`) exposes exactly the one blocking drain call
  * the bench harness needs to attribute counters to query windows.
  */
object busflush {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
