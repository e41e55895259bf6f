package org.apache.spark

import org.apache.spark.memory.TaskMemoryManager

/** Minimal bridge into `private[spark]` task internals — the standard
  * mechanism for extensions that cooperate with Spark's task memory pool
  * (TaskContext.taskMemoryManager is package-private). */
object GraftCoreShim {
  def taskMemoryManager(tc: TaskContext): TaskMemoryManager =
    tc.taskMemoryManager()
}
