package graft.streaming

/** Clean-room timer wheel (`/root/reference/modules/dbparser/
  * timerwheel.c`) — the component every reference correlation timeout
  * runs through (`pattern_db_set_time` / `pattern_db_advance_time`
  * drive it with message time). The STREAMING paths here replace it
  * with Spark event-time timeouts ([[Stateful]] — the documented
  * divergence); the sequential batch-driver emulation of patterndb
  * (the parity harness replaying `pattern_db_process`) needs the exact
  * fire discipline, which this class reproduces:
  *
  *  - `setTime(t)` fires every pending timer with expiry < t
  *    (timerwheel.c:292-338: the tick loop scans slots for
  *    `now < new_now`, so an entry AT the new time stays pending),
  *    each callback receiving the timer's OWN expiry as `now` — exact,
  *    monotonically increasing (the battery's two core assertions);
  *  - ties fire in insertion order (slot lists append);
  *  - time never goes backwards (:295-296);
  *  - `addTimer` arms at `now + timeout` (:182-195), `delTimer`
  *    unlinks without firing (:200-205), `modTimer` re-arms (:208-213);
  *  - callbacks may add or delete timers mid-fire — a new timer due
  *    before the target time fires in the same `setTime` sweep, like
  *    the C's continuing slot scan;
  *  - `expireAll` fires everything then REWINDS `now` to its pre-call
  *    value (:347-353 — the C saves and restores `self->now`).
  *
  * The reference's hierarchical slot-cascade buys O(1) per tick on a
  * wall-clock event loop; this is a driver-side utility ticked by
  * message time, so an expiry-keyed TreeMap with FIFO buckets gives
  * identical observable behavior at O(log n) per operation.
  */
object TimerWheel {
  final class Entry[A] private[streaming] (
      private[streaming] val target: Long,
      private[streaming] val cb: (Long, A) => Unit,
      val data: A) {
    private[streaming] var live = true
    /** The absolute expiry time this entry is armed at. */
    def expires: Long = target
  }
}

final class TimerWheel[A] {
  import TimerWheel.Entry

  private val slots =
    new java.util.TreeMap[Long, java.util.ArrayDeque[Entry[A]]]()
  private var nowV = 0L
  private var nTimers = 0L
  private var assoc: AnyRef = null

  def now: Long = nowV
  def numTimers: Long = nTimers

  /** timer_wheel_set_associated_data / _get_associated_data
    * (timerwheel.c:356-368; ownership is the JVM's problem here). */
  def setAssociatedData(d: AnyRef): Unit = assoc = d
  def associatedData: AnyRef = assoc

  /** Arm a timer `timeout` ticks from now (expiry = now + timeout). */
  def addTimer(timeout: Long, data: A)(cb: (Long, A) => Unit): Entry[A] = {
    require(timeout >= 0, s"negative timeout: $timeout")
    val e = new Entry[A](nowV + timeout, cb, data)
    slots.computeIfAbsent(e.target,
      _ => new java.util.ArrayDeque[Entry[A]]()).addLast(e)
    nTimers += 1
    e
  }

  /** Unlink without firing; deleting twice (or a fired entry) is a
    * no-op rather than a double-count. */
  def delTimer(e: Entry[A]): Unit = if (e.live) {
    e.live = false
    nTimers -= 1
    val q = slots.get(e.target)
    if (q != null) {
      q.remove(e)
      if (q.isEmpty) slots.remove(e.target)
    }
  }

  /** timer_wheel_mod_timer: re-arm at now + timeout (del + add — the
    * entry moves to the END of its new slot, like the C's unlink +
    * re-insert). Returns the new entry; the old one is dead. */
  def modTimer(e: Entry[A], timeout: Long): Entry[A] = {
    val (cb, data) = (e.cb, e.data)
    delTimer(e)
    addTimer(timeout, data)(cb)
  }

  /** Advance to `newNow`, firing every timer with expiry < newNow in
    * (expiry, insertion) order; each callback sees the timer's own
    * expiry as the current time. No-op when time would go backwards. */
  def setTime(newNow: Long): Unit = {
    if (nowV >= newNow) return
    var head = slots.firstEntry()
    while (head != null && head.getKey < newNow) {
      slots.remove(head.getKey)
      nowV = head.getKey
      val it = head.getValue.iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.live) {
          e.live = false
          nTimers -= 1
          e.cb(e.target, e.data)
        }
      }
      head = slots.firstEntry()
    }
    nowV = newNow
  }

  /** Fire everything pending, then rewind `now` to its pre-call value
    * (timerwheel.c:347-353). */
  def expireAll(): Unit = {
    val n0 = nowV
    setTime(Long.MaxValue)
    nowV = n0
  }
}
