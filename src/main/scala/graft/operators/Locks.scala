package graft.operators

import java.lang.management.ManagementFactory
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, StandardOpenOption}

/** C4 — the reference's singleton PID-file lock
  * (retrieval.py:16-28,199,254), implemented so it actually engages.
  *
  * The reference's version is broken twice over: normalization.py
  * writes `process_balance.pid` into the CWD (:135) but checks
  * `/tmp/process_balance.pid` (:173), so the lock never takes effect;
  * and it leaks the file on a crash, deadlocking every later run.
  * This version fixes both:
  *
  *   - ONE canonical path, created atomically (`CREATE_NEW` = O_EXCL —
  *     the filesystem's test-and-set, no check-then-create race);
  *   - a crash leaves a STALE lock, detected by mtime age: past
  *     `staleAfterMillis` the next caller deletes and re-acquires
  *     (re-creation stays atomic, so of N concurrent takeover
  *     attempts exactly one wins CREATE_NEW and the rest fail);
  *   - release happens in `finally` — an exception in the body still
  *     frees the lock.
  *
  * This is driver-side coordination for the CRON-RESTARTED batch shape
  * the reference runs; the streaming-native replacement is
  * [[graft.streaming.NormalizationJob]], where the checkpoint
  * directory itself is the singleton (Spark refuses two concurrent
  * runs on one checkpoint). On a multi-node driver deployment, put the
  * lock path on a shared filesystem whose create is atomic, or use the
  * cluster manager's own single-instance guarantee instead.
  */
object Locks {

  /** Run `body` holding the singleton lock at `path`.
    * @throws IllegalStateException if another live run holds it. */
  def withSingletonLock[T](path: Path, staleAfterMillis: Long = 60L * 60 * 1000)
                          (body: => T): T = {
    acquire(path, staleAfterMillis)
    try body
    finally Files.deleteIfExists(path)
  }

  private def acquire(path: Path, staleAfterMillis: Long): Unit = {
    def tryCreate(): Boolean =
      try {
        Files.write(path,
          s"${ManagementFactory.getRuntimeMXBean.getName} ${System.currentTimeMillis}\n"
            .getBytes(StandardCharsets.UTF_8),
          StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
        true
      } catch { case _: java.nio.file.FileAlreadyExistsException => false }

    if (!tryCreate()) {
      val age = try System.currentTimeMillis - Files.getLastModifiedTime(path).toMillis
                catch { case _: java.nio.file.NoSuchFileException => Long.MaxValue }
      val tookOver = age > staleAfterMillis && {
        Files.deleteIfExists(path) // stale: clear it, then race on CREATE_NEW
        tryCreate()
      }
      if (!tookOver) throw new IllegalStateException(
        s"singleton lock $path is held by a live run (age ${age}ms <= " +
          s"stale threshold ${staleAfterMillis}ms)")
    }
  }
}
