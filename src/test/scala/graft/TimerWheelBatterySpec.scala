package graft

import graft.streaming.TimerWheel

/** Verbatim port of `/root/reference/modules/dbparser/tests/
  * test_timer_wheel.c`: 10,000 iterations each adding THREE timers at
  * a random expiry (truncated to 24 bits, floored at 1), randomly
  * deleting one of the three with 75% total probability, then one
  * `set_time(latest + 1)` that must fire exactly the surviving timers,
  * each callback observing `now == its own expiry` and a monotonically
  * non-decreasing clock. The C runs the same body twice — a fixed seed
  * (1234567890) and `time(NULL)` — because the assertions are
  * self-consistent for ANY random sequence; the port keeps both (the
  * "current time" seed drawn from nanoTime). glibc rand() is replaced
  * by java.util.Random — the battery never depends on the specific
  * values, only on the add/delete bookkeeping they drive.
  */
class TimerWheelBatterySpec extends GraftSuite {

  private val NumTimers = 10000

  private def testWheel(seed: Long): Unit = {
    val rnd = new java.util.Random(seed)
    val wheel = new TimerWheel[Long]
    var prevNow = 0L
    var numCallbacks = 0
    var expectedCallbacks = 0
    var latest = 0L

    // _test_assoc_data (test_timer_wheel.c:58-65)
    val AssocData = "timerwheel associated data, check whether it's freed"
    wheel.setAssociatedData(AssocData)
    assert(wheel.associatedData == AssocData)

    wheel.setTime(1)
    def cb(now: Long, expires: Long): Unit = {
      assert(now == expires,
        s"Expected time is not matching current time in callback, " +
          s"now=$now, expires=$expires")
      assert(prevNow <= now,
        s"Callback current time is not monotonically increasing, " +
          s"prev_now=$prevNow, now=$now")
      prevNow = now
      numCallbacks += 1
    }
    for (_ <- 0 until NumTimers) {
      var expires = (rnd.nextInt() & ((1 << 24) - 1)).toLong
      if (expires <= 1) expires = 1
      if (expires > latest) latest = expires
      val t1 = wheel.addTimer(expires - 1, expires)(cb)
      val t2 = wheel.addTimer(expires - 1, expires)(cb)
      val t3 = wheel.addTimer(expires - 1, expires)(cb)
      expectedCallbacks += 3
      val r = rnd.nextInt() & 0xFF
      if (r < 64) { wheel.delTimer(t1); expectedCallbacks -= 1 }
      else if (r < 128) { wheel.delTimer(t2); expectedCallbacks -= 1 }
      else if (r < 192) { wheel.delTimer(t3); expectedCallbacks -= 1 }
    }
    wheel.setTime(latest + 1)
    assert(numCallbacks == expectedCallbacks,
      s"Error: not enough callbacks received, " +
        s"num_callbacks=$numCallbacks, expected=$expectedCallbacks")
    assert(wheel.numTimers == 0)
    assert(wheel.now == latest + 1)
  }

  test("test_timer_wheel_const (test_timer_wheel.c:130-133)") {
    testWheel(1234567890L)
  }

  test("test_timer_wheel_current_time (test_timer_wheel.c:135-138)") {
    testWheel(System.nanoTime())
  }

  test("fire boundary is strict: set_time(T) leaves a timer AT T " +
      "pending (timerwheel.c:309 scans now < new_now)") {
    val wheel = new TimerWheel[String]
    var fired = Vector.empty[(Long, String)]
    wheel.setTime(1)
    wheel.addTimer(4, "at5")((now, d) => fired :+= (now, d)) // expiry 5
    wheel.setTime(5)
    assert(fired.isEmpty && wheel.numTimers == 1)
    wheel.setTime(6)
    assert(fired == Vector((5L, "at5")) && wheel.numTimers == 0)
  }

  test("ties fire in insertion order; time never goes backwards; " +
      "mod re-arms; expire_all rewinds now (timerwheel.c:200-213,295,347-353)") {
    val wheel = new TimerWheel[String]
    var fired = Vector.empty[String]
    wheel.setTime(10)
    wheel.addTimer(5, "a")((_, d) => fired :+= d)
    wheel.addTimer(5, "b")((_, d) => fired :+= d)
    val c = wheel.addTimer(3, "c")((_, d) => fired :+= d)
    wheel.modTimer(c, 5) // re-armed at 15, moves BEHIND a and b
    wheel.setTime(9) // backwards: no-op
    assert(wheel.now == 10)
    wheel.setTime(16)
    assert(fired == Vector("a", "b", "c"))
    // callbacks may add timers that fire in the same sweep
    var chain = Vector.empty[Long]
    wheel.addTimer(2, "outer") { (now, _) =>
      chain :+= now
      wheel.addTimer(1, "inner")((n2, _) => chain :+= n2)
    }
    wheel.setTime(100)
    assert(chain == Vector(18L, 19L))
    // expire_all fires the rest and rewinds now
    wheel.addTimer(50, "late")((_, d) => fired :+= d)
    wheel.expireAll()
    assert(fired.last == "late" && wheel.now == 100)
  }
}
