package graft

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Locks

/** C4 singleton lock — the semantics the reference intended but never
  * achieved (mismatched PID paths, normalization.py:135 vs :173). */
class LocksSpec extends AnyFunSuite {

  private def tmpLock() =
    Paths.get(Files.createTempDirectory("graft_lock").toString, "job.pid")

  test("second acquire fails while held; released after the body") {
    val p = tmpLock()
    val result = Locks.withSingletonLock(p) {
      assert(Files.exists(p), "lock file exists while held")
      intercept[IllegalStateException] {
        Locks.withSingletonLock(p) { fail("must not enter") }
      }
      42
    }
    assert(result == 42, "body result is returned")
    assert(!Files.exists(p), "released on exit")
    Locks.withSingletonLock(p)(()) // re-acquirable
  }

  test("lock is released even when the body throws") {
    val p = tmpLock()
    intercept[RuntimeException] {
      Locks.withSingletonLock(p) { throw new RuntimeException("boom") }
    }
    assert(!Files.exists(p), "finally releases the lock")
  }

  test("a stale lock (crashed run) is taken over; a fresh one is not") {
    val p = tmpLock()
    Files.write(p, "dead-run\n".getBytes)
    // fresh: refuse
    intercept[IllegalStateException] {
      Locks.withSingletonLock(p, staleAfterMillis = 60000L) { fail("held") }
    }
    // age it past the threshold: takeover succeeds
    Files.setLastModifiedTime(p,
      FileTime.fromMillis(System.currentTimeMillis - 120000L))
    val ran = Locks.withSingletonLock(p, staleAfterMillis = 60000L) { true }
    assert(ran && !Files.exists(p))
  }
}
