package graft

import java.nio.file.{Files, Path}

/** Process-wide registry of the scratch dirs (stage/out/checkpoint) that
  * streaming/format gates create per invocation, so the harness mains can
  * delete them between queries.
  *
  * Why this exists (round-16): every gate that stages files for an
  * AvailableNow drain or writes a format seam called
  * `Files.createTempDirectory("graft-…")` and never deleted it — and the
  * bench re-invokes each query lambda per timed run, so one full
  * Verify+Bench sweep left 400+ dirs in /tmp. The r15 draw2 sweep measured
  * q113 at 24.6 s against a littered /tmp vs 7.0 s clean — a 3.5×
  * measurement distortion caused by the harness itself. The fix lives in
  * code, not run-book discipline: lambdas register here, mains sweep
  * between queries (outside the timed section) and a shutdown hook catches
  * stragglers.
  *
  * A dir is only safe to delete once no live DataFrame still reads it, so
  * `sweep()` must be called BETWEEN fully-forced queries, never inside a
  * lambda.
  */
object TempDirs {
  private val registered = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  @volatile private var hookInstalled = false

  /** Drop-in replacement for Files.createTempDirectory(prefix). */
  def create(prefix: String): Path = {
    if (!hookInstalled) synchronized {
      if (!hookInstalled) {
        Runtime.getRuntime.addShutdownHook(new Thread(() => sweep()))
        hookInstalled = true
      }
    }
    val p = Files.createTempDirectory(prefix)
    registered.add(p)
    p
  }

  /** Best-effort recursive delete; never throws (a busy file at JVM exit
    * must not mask the query result). */
  def deleteRecursively(p: Path): Unit =
    try {
      if (Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        Files.walk(p).sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala
          .foreach(f => try Files.deleteIfExists(f) catch { case _: Exception => () })
      }
    } catch { case _: Exception => () }

  /** Delete every dir registered since the last sweep. Call only between
    * fully-forced queries (the returned DataFrames lazily read these dirs
    * until the noop/parquet write completes). */
  def sweep(): Unit = {
    var p = registered.poll()
    while (p != null) { deleteRecursively(p); p = registered.poll() }
  }

  /** Delete stale graft-* dirs a crashed earlier run left in
    * java.io.tmpdir — call once at main startup, before any query runs.
    * Only dirs whose mtime is over an hour old are touched (r16 ADVICE):
    * a graft main running CONCURRENTLY (sbt test alongside Bench, Verify
    * overlapping StreamBench) must not lose live checkpoints/staging —
    * its dirs are minutes old; true crash litter is hours old by the
    * next run.
    */
  def sweepStale(): Unit = {
    val tmp = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir", "/tmp"))
    val cutoff = System.currentTimeMillis() - 60L * 60L * 1000L
    try {
      import scala.jdk.CollectionConverters._
      Files.list(tmp).iterator().asScala
        .filter(_.getFileName.toString.startsWith("graft-"))
        .filter(p =>
          try Files.getLastModifiedTime(p).toMillis < cutoff
          catch { case _: Exception => false })
        .foreach(deleteRecursively)
    } catch { case _: Exception => () }
  }
}
