package org.apache.spark.sql

/** Compile-checked access to the `private[sql]` state-store unload hook.
  *
  * `StateStore.unloadAll()` evicts every cached StateStoreProvider (the
  * HDFS-backed providers' in-memory loadedMaps copies and RocksDB native
  * handles) that stopped streaming queries leave behind; the built-in
  * maintenance task only does this on its 60 s cadence. The bench harness
  * calls this between queries — untimed hygiene so one query's state cannot
  * become the next query's memory pressure. Safe mid-session: providers
  * re-load lazily on the next stateful streaming query.
  */
object GraftStateStoreAccess {
  def unloadAll(): Unit =
    execution.streaming.state.StateStore.unloadAll()
}
