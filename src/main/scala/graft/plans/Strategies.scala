package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkStrategy

/** Idempotent, thread-safe registration of the engine's custom planner
  * strategies (ADVICE r8: the per-operator check-then-append on
  * `spark.experimental.extraStrategies` races when two threads build
  * their first custom-operator DataFrame concurrently — both see the
  * strategy absent and both append, registering it twice). One
  * process-wide lock serializes the (rare, construction-time) appends;
  * the planner list is read lock-free by Spark afterwards. Strategies
  * are case objects, so `contains` is identity-cheap. */
object Strategies {
  private val lock = new Object

  def ensureRegistered(spark: SparkSession, s: SparkStrategy): Unit =
    lock.synchronized {
      if (!spark.experimental.extraStrategies.contains(s))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ s
    }
}
