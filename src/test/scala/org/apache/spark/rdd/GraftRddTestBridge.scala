package org.apache.spark.rdd

/** Test-only bridge to RDD's `private[rdd]` checkpoint introspection:
  * the cache-leak guardrail must distinguish the localCheckpoint blocks
  * that legitimately back an operator's bounded result from a plain
  * persist() that escaped (the leak class the guardrail exists to catch),
  * and storage levels cannot tell them apart. */
object GraftRddTestBridge {
  def isLocallyCheckpointed(rdd: RDD[_]): Boolean = rdd.isLocallyCheckpointed
}
