package graft.operators

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import graft.SparkSpec

/** The shared single-writer lease (Lease.withLease) — acquisition is
  * create-exclusive FIRST, rivals-check second, so two operations
  * racing the same prefix can never both proceed (the r15 TOCTOU:
  * list-then-create let simultaneous starts both see an empty dir).
  */
class LeaseSpec extends SparkSpec {

  test("a second operation cannot enter while a body is in flight") {
    val entered = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val t = new Thread(() =>
      Lease.withLease(spark, "leasespec_a", "op1") {
        entered.countDown(); release.await(10, TimeUnit.SECONDS); ()
      })
    t.start()
    assert(entered.await(10, TimeUnit.SECONDS))
    val denied = intercept[IllegalStateException] {
      Lease.withLease(spark, "leasespec_a", "op2") { fail("must not enter") }
    }
    assert(denied.getMessage.contains("op1"))
    release.countDown(); t.join(10000)
    // after a clean release the next operation enters
    assert(Lease.withLease(spark, "leasespec_a", "op3") { 42 } === 42)
  }

  test("racing acquisitions: bodies never overlap, every loser throws") {
    val n = 8
    val inBody = new AtomicInteger(0)
    val maxSeen = new AtomicInteger(0)
    val winners = new AtomicInteger(0)
    val losers = new AtomicInteger(0)
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(n)
    val done = new CountDownLatch(n)
    (1 to n).foreach { i =>
      pool.submit(new Runnable {
        def run(): Unit = {
          start.await()
          try {
            Lease.withLease(spark, "leasespec_b", s"op$i") {
              val cur = inBody.incrementAndGet()
              maxSeen.updateAndGet(m => math.max(m, cur))
              Thread.sleep(20)
              inBody.decrementAndGet()
            }
            winners.incrementAndGet()
          } catch { case _: IllegalStateException => losers.incrementAndGet() }
          finally done.countDown()
        }
      })
    }
    start.countDown()
    assert(done.await(30, TimeUnit.SECONDS))
    pool.shutdown()
    // mutual back-off may deny EVERY racer (maxSeen 0) — exclusion is
    // the guarantee, progress comes from retries
    assert(maxSeen.get() <= 1, "two bodies overlapped — exclusion broken")
    assert(winners.get() + losers.get() === n)
    // mutual back-off can deny everyone in one round (livelock-free by
    // retry, not by guarantee); serial retries always make progress
    assert(Lease.withLease(spark, "leasespec_b", "serial") { true })
  }

  test("a retry adopts its own crashed attempt's lease; others stay blocked") {
    // simulate a crash: the lease file exists, no body running
    val crashed = intercept[RuntimeException] {
      Lease.withLease(spark, "leasespec_c", "opX") {
        throw new RuntimeException("crash")
      }
    }
    assert(crashed.getMessage === "crash")
    // a DIFFERENT operation is refused while the crashed lease stands
    intercept[IllegalStateException] {
      Lease.withLease(spark, "leasespec_c", "opY") { fail("must not enter") }
    }
    // the SAME operation id re-enters (create-exclusive fails on its
    // own path → adopted), completes, and releases
    assert(Lease.withLease(spark, "leasespec_c", "opX") { 7 } === 7)
    assert(Lease.withLease(spark, "leasespec_c", "opY") { 8 } === 8)
  }
}
