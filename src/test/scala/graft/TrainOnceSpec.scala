package graft

import org.scalatest.funsuite.AnyFunSuite

/** TrainOnce cache contracts: nested builds (an artifact derived from
  * another train-once artifact — the x_txt25-over-x_txt24 shape), the
  * memoization itself, and failed-build retry.
  */
class TrainOnceSpec extends AnyFunSuite {
  private def k(s: String) = s"trainonce_spec:$s:${System.nanoTime()}"

  test("nested TrainOnce calls do not recursively update the cache") {
    // computeIfAbsent-based memoization would throw IllegalStateException
    // ("Recursive update") or orphan a node here
    val inner = k("inner")
    val outer = TrainOnceTestAccess.run(k("outer")) {
      TrainOnceTestAccess.run(inner)("inner") + "-outer"
    }
    assert(outer == "inner-outer")
    assert(TrainOnceTestAccess.run[String](inner)(fail("must be cached")) == "inner")
  }

  test("a build runs once; later calls return the memo") {
    var n = 0
    val key = k("once")
    def call() = TrainOnceTestAccess.run(key) { n += 1; s"v$n" }
    assert(call() == "v1" && call() == "v1" && n == 1)
  }

  test("a failed build caches nothing and the next call retries") {
    var n = 0
    val key = k("retry")
    intercept[RuntimeException](TrainOnceTestAccess.run(key) {
      n += 1; throw new RuntimeException("boom")
    })
    assert(TrainOnceTestAccess.run(key) { n += 1; s"ok$n" } == "ok2")
  }
}

/** Indirection so the spec reads as intent (TrainOnce is an object). */
object TrainOnceTestAccess {
  def run[T <: AnyRef](key: String)(build: => T): T =
    graft.util.TrainOnce(key)(build)
}
