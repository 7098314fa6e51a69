package graft.util

import org.apache.spark.sql.SparkSession
import scala.util.control.NonFatal

/** Shared-filesystem staging for materialized intermediates.
  *
  * Any operator that writes an intermediate table for later read-back
  * (dedup shingle/signature tables, the streaming changelog, staged
  * stream-source copies) MUST stage it under a root that is shared
  * storage on a multi-node cluster: a driver-local `createTempDirectory`
  * path resolves to per-node local disks on the executors, so the staged
  * table would be scattered across machines and the read-back
  * wrong/partial. Root resolution: the explicit per-call argument, else
  * session conf `spark.graft.stagingDir`, else
  * `<spark.sql.warehouse.dir>/_graft_staging` (shared wherever the
  * warehouse is).
  *
  * Every staged dir is tracked in a JVM-wide registry and reclaimed by
  * [[dropStaged]] (also installed as a shutdown hook), so Verify/Bench
  * runs cannot leak one corpus-sized table per query into the root.
  */
object Staging {

  def root(spark: SparkSession, explicit: Option[String] = None): String =
    explicit
      .orElse(spark.conf.getOption("spark.graft.stagingDir"))
      .getOrElse(spark.conf.get("spark.sql.warehouse.dir")
        .stripSuffix("/") + "/_graft_staging")

  private val staged =
    new java.util.concurrent.ConcurrentLinkedQueue[
      (org.apache.hadoop.conf.Configuration, String)]()
  private val hookInstalled = new java.util.concurrent.atomic.AtomicBoolean(false)

  private val caches = new java.util.concurrent.ConcurrentLinkedQueue[
    org.apache.spark.sql.DataFrame]()

  /** Track a persisted intermediate whose natural lifetime is "until the
    * end of the run": operators whose RESULT stays lazy (so the cache must
    * outlive the call) register here instead of leaking the cache for the
    * session lifetime — the unscoped [[dropStaged]] drain (Bench/Verify end,
    * shutdown hook) unpersists them.
    */
  def registerCache(df: org.apache.spark.sql.DataFrame): Unit =
    caches.add(df): Unit

  /** Unpersist every registered cache (idempotent; unpersist of an already
    * released frame is a no-op).
    */
  def releaseCaches(): Unit = {
    var df = caches.poll()
    while (df != null) {
      try df.unpersist() catch { case NonFatal(_) => () }
      df = caches.poll()
    }
  }

  /** Reserve (and register for reclamation) a fresh staged dir path under
    * the resolved root. The caller writes to it; nothing is created here.
    */
  def newStagedDir(spark: SparkSession, prefix: String,
      explicit: Option[String] = None): String = {
    val p = root(spark, explicit) + "/" + prefix + "-" +
      java.util.UUID.randomUUID().toString
    register(spark, p)
    p
  }

  /** Track an already-chosen staged path for later [[dropStaged]]. */
  def register(spark: SparkSession, path: String): Unit = {
    staged.add((spark.sparkContext.hadoopConfiguration, path))
    if (hookInstalled.compareAndSet(false, true))
      Runtime.getRuntime.addShutdownHook(new Thread(() => dropStaged()))
  }

  /** Delete the staged dirs this JVM registered. `under` scopes deletion
    * to staged dirs below one root (leaving other callers' staged tables
    * alive, e.g. concurrently running test suites); `prefix` scopes it to
    * one component's dirs by [[newStagedDir]] prefix (so e.g. dedup
    * cleanup cannot delete a streaming changelog whose DataFrame is still
    * lazy — the registry is JVM-wide across operators). A dir that fails
    * to delete is logged and RE-QUEUED so a later call can retry — only
    * NonFatal failures are swallowed (an InterruptedException or VM error
    * must not be eaten by cleanup).
    */
  def dropStaged(under: Option[String] = None,
      prefix: Option[String] = None): Unit = {
    // the unscoped call is the end-of-run drain: release registered
    // caches too (scoped calls leave them — their consumers may be lazy)
    if (under.isEmpty && prefix.isEmpty) releaseCaches()
    val keep = new java.util.ArrayList[
      (org.apache.hadoop.conf.Configuration, String)]()
    var e = staged.poll()
    while (e != null) {
      val base = e._2.substring(e._2.lastIndexOf('/') + 1)
      if (under.forall(u => e._2.startsWith(u)) &&
          prefix.forall(p => base.startsWith(p + "-"))) {
        try {
          val p = new org.apache.hadoop.fs.Path(e._2)
          p.getFileSystem(e._1).delete(p, true): Unit
        } catch {
          case NonFatal(ex) =>
            System.err.println(
              s"[graft-staging] failed to delete ${e._2}: $ex (will retry)")
            keep.add(e)
        }
      } else keep.add(e)
      e = staged.poll()
    }
    staged.addAll(keep): Unit
  }
}
