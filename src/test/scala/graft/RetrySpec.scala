package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.util.Retry

/** Port of the reference retry tests (RetryUtilTest.java: succeeds on 2nd
  * attempt, fails after max, backoff doubles). */
class RetrySpec extends AnyFunSuite {

  test("succeeds on the second attempt after one failure") {
    var calls = 0
    val out = Retry.withRetry(maxAttempts = 3, sleep = _ => ()) { () =>
      calls += 1
      if (calls < 2) throw new RuntimeException("transient")
      "ok"
    }
    assert(out === "ok" && calls === 2)
  }

  test("fails after exhausting max attempts with the last error") {
    var calls = 0
    val e = intercept[RuntimeException] {
      Retry.withRetry(maxAttempts = 3, sleep = _ => ()) { () =>
        calls += 1
        throw new RuntimeException(s"boom $calls")
      }
    }
    assert(calls === 3 && e.getMessage === "boom 3")
  }

  test("backoff doubles per attempt from the initial delay") {
    val delays = Seq.newBuilder[Long]
    intercept[RuntimeException] {
      Retry.withRetry(maxAttempts = 4, initialDelayMs = 500, sleep = delays += _) { () =>
        throw new RuntimeException("always")
      }
    }
    assert(delays.result() === Seq(500L, 1000L, 2000L))
  }

  test("first-attempt success never sleeps") {
    var slept = false
    assert(Retry.withRetry(sleep = _ => slept = true)(() => 42) === 42)
    assert(!slept)
  }
}
