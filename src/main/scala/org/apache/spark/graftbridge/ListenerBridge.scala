package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Bridge into `private[spark]` scheduler surface: draining the listener
  * bus is the only reliable way to read a complete metrics ledger after
  * an action returns (listener delivery is asynchronous). Same shim idiom
  * as [[org.apache.spark.sql.graftbridge.GraftSqlBridge]]. */
object ListenerBridge {
  def flush(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
