package graft.operators

import java.lang.management.ManagementFactory
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, StandardCopyOption, StandardOpenOption}
import java.util.UUID
import java.util.concurrent.{Executors, ScheduledFuture, TimeUnit}

/** C4 — the reference's singleton PID-file lock
  * (retrieval.py:16-28,199,254), implemented so it actually engages.
  *
  * The reference's version is broken twice over: normalization.py
  * writes `process_balance.pid` into the CWD (:135) but checks
  * `/tmp/process_balance.pid` (:173), so the lock never takes effect;
  * and it leaks the file on a crash, deadlocking every later run.
  * This version fixes both, and closes the takeover/long-body races:
  *
  *   - ONE canonical path, created atomically (`CREATE_NEW` = O_EXCL —
  *     the filesystem's test-and-set, no check-then-create race). The
  *     file body is a per-acquire OWNERSHIP TOKEN (runtime name +
  *     nonce), so every later mutation can be ownership-checked;
  *   - a crash leaves a STALE lock, detected by mtime age. Takeover is
  *     a single atomic `Files.move` of the stale file to a unique temp
  *     name: of N concurrent takeover attempts exactly one move
  *     succeeds (losers get NoSuchFileException) and only the winner
  *     proceeds to re-create — no delete-then-create window in which
  *     one taker can clobber another taker's fresh lock;
  *   - a HEARTBEAT thread refreshes the file's mtime every
  *     `staleAfterMillis / 4` while the body runs, so a long-running
  *     live holder never looks stale to other processes (a dead holder
  *     can't refresh, so age > staleAfterMillis still means dead);
  *   - release happens in `finally` and deletes ONLY if the file still
  *     carries this acquire's token — if the lock was (wrongly or
  *     legitimately) taken over meanwhile, the original holder backs
  *     off instead of deleting the new holder's lock.
  *
  * This is driver-side coordination for the CRON-RESTARTED batch shape
  * the reference runs; the streaming-native replacement is
  * [[graft.streaming.NormalizationJob]], where the checkpoint
  * directory itself is the singleton (Spark refuses two concurrent
  * runs on one checkpoint). On a multi-node driver deployment, put the
  * lock path on a shared filesystem whose create and rename are
  * atomic, or use the cluster manager's own single-instance guarantee.
  */
object Locks {

  private lazy val heartbeats = Executors.newSingleThreadScheduledExecutor { r =>
    val t = new Thread(r, "graft-lock-heartbeat"); t.setDaemon(true); t
  }

  /** Run `body` holding the singleton lock at `path`.
    * @throws IllegalStateException if another live run holds it. */
  def withSingletonLock[T](path: Path, staleAfterMillis: Long = 60L * 60 * 1000)
                          (body: => T): T = {
    val token =
      s"${ManagementFactory.getRuntimeMXBean.getName} ${UUID.randomUUID()}\n"
    acquire(path, staleAfterMillis, token)
    val beat = startHeartbeat(path, token, staleAfterMillis)
    try body
    finally {
      beat.cancel(false)
      releaseIfOwned(path, token)
    }
  }

  private def read(path: Path): Option[String] =
    try Some(new String(Files.readAllBytes(path), StandardCharsets.UTF_8))
    catch { case _: java.io.IOException => None }

  /** Refresh mtime every staleAfter/4 so a live long-running holder
    * never crosses the stale threshold. Touches only while the file
    * still carries our token (stops silently after a takeover). */
  private def startHeartbeat(path: Path, token: String,
                             staleAfterMillis: Long): ScheduledFuture[_] = {
    val period = math.max(staleAfterMillis / 4, 1L)
    heartbeats.scheduleAtFixedRate(() => {
      if (read(path).contains(token)) {
        try Files.setLastModifiedTime(path,
          java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis))
        catch { case _: java.io.IOException => () }
      }
    }, period, period, TimeUnit.MILLISECONDS)
  }

  /** Delete only a lock we still own (content == our token); if it was
    * taken over, back off rather than cascade-deleting the new holder. */
  private def releaseIfOwned(path: Path, token: String): Unit =
    if (read(path).contains(token)) Files.deleteIfExists(path)

  private def acquire(path: Path, staleAfterMillis: Long, token: String): Unit = {
    def tryCreate(): Boolean =
      try {
        Files.write(path, token.getBytes(StandardCharsets.UTF_8),
          StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
        true
      } catch { case _: java.nio.file.FileAlreadyExistsException => false }

    if (!tryCreate()) {
      val age = try System.currentTimeMillis - Files.getLastModifiedTime(path).toMillis
                catch { case _: java.nio.file.NoSuchFileException => Long.MaxValue }
      val tookOver = age > staleAfterMillis && claimStale(path) && tryCreate()
      if (!tookOver) throw new IllegalStateException(
        s"singleton lock $path is held by a live run (age ${age}ms <= " +
          s"stale threshold ${staleAfterMillis}ms), or lost the takeover race")
    }
  }

  /** Atomically claim a stale lock by renaming it aside: exactly one of
    * N concurrent claimants' `Files.move` succeeds (the rest see
    * NoSuchFileException), so only one proceeds to CREATE_NEW and the
    * delete-then-create double-holder interleaving cannot occur. */
  private def claimStale(path: Path): Boolean = {
    val aside = path.resolveSibling(s"${path.getFileName}.stale.${UUID.randomUUID()}")
    try {
      Files.move(path, aside, StandardCopyOption.ATOMIC_MOVE)
      Files.deleteIfExists(aside)
      true
    } catch { case _: java.io.IOException => false }
  }
}
