package graft

import org.apache.spark.sql.SparkSession

/** Session-scoped temp-DIRECTORY cache — the one lifecycle
  * implementation behind every persisted derived artifact
  * (Sources.partitionedEventsDir's date layout, Similarity.ivfIndexDir's
  * inverted lists).
  *
  * - WEAK session keys: a static strong map would pin every
  *   SparkSession (and its executor state) for the life of the JVM
  *   (ADVICE r6).
  * - Temp roots live until JVM exit (sessions can share them through
  *   the cache) and are then deleted by ONE shutdown hook,
  *   deepest-first, so long-lived multi-session processes don't
  *   accrete orphan directories.
  */
object SessionDirs {
  private val cache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[String, String]])
  private val tmpRoots =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]
  private lazy val cleanupHook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      tmpRoots.forEach { root =>
        try {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(root).iterator().asScala.toSeq
            .sortBy(-_.getNameCount)
            .foreach(p => java.nio.file.Files.deleteIfExists(p))
        } catch { case _: java.io.IOException => () }
      }))

  /** Get-or-build the per-(session, key) artifact directory: `build`
    * runs at most once per key, receiving a fresh temp root already
    * registered for shutdown cleanup; the returned path (the root or a
    * subdirectory) is cached. Keys should embed the artifact kind
    * (e.g. "ivf:<sfDir>") so different artifacts never collide. */
  def getOrBuild(spark: SparkSession, key: String, prefix: String)(
      build: java.nio.file.Path => String): String = {
    val perSession = {
      var m = cache.get(spark)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap.empty[String, String]
        val prev = cache.putIfAbsent(spark, m)
        if (prev != null) m = prev
      }
      m
    }
    perSession.getOrElseUpdate(key, {
      cleanupHook
      val root = java.nio.file.Files.createTempDirectory(prefix)
      tmpRoots.add(root)
      build(root)
    })
  }
}
