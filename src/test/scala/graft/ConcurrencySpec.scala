package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver-side overlap helper that the r15 optimizations lean on
  * (index-family lifecycles, rollup-repair levels, side-table writes,
  * validation arms): results must come back in INPUT order regardless of
  * completion order, each thunk runs exactly once, and a failure
  * propagates as the thunk's own exception type after all threads settle.
  */
class ConcurrencySpec extends AnyFunSuite {

  test("results preserve input order, not completion order") {
    val out = Concurrency.inParallel((0 until 8).map(i => () => {
      Thread.sleep((8 - i) * 20L) // earlier thunks finish LAST
      i
    }))
    assert(out === (0 until 8))
  }

  test("each thunk runs exactly once") {
    val counts = new java.util.concurrent.atomic.AtomicIntegerArray(16)
    Concurrency.inParallel((0 until 16).map(i => () => {
      counts.incrementAndGet(i); i
    }), maxConcurrent = 4)
    (0 until 16).foreach(i => assert(counts.get(i) === 1))
  }

  test("a failing thunk rethrows its own exception type, not the wrapper") {
    val boom = intercept[IllegalStateException] {
      Concurrency.inParallel[Int](Seq(
        () => 1,
        () => throw new IllegalStateException("boom"),
        () => 3))
    }
    assert(boom.getMessage === "boom")
  }

  test("single-thunk input short-circuits on the caller thread") {
    val caller = Thread.currentThread().getId
    val ran = Concurrency.inParallel(Seq(
      () => Thread.currentThread().getId))
    assert(ran === Seq(caller))
  }
}
