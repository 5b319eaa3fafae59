package graft.streaming

/** Clean-room port of the http() destination's worker load balancer
  * (`/root/reference/modules/http/http-loadbalancer.c`, 285 LoC) — the
  * state machine that spreads sending workers over the `url()` target
  * list with AFFINITY (a worker keeps its target while balanced),
  * takes failed targets out of rotation, retries the
  * least-recently-failed target when none are operational, and probes
  * one failed target per `recoveryTimeout` window.
  *
  * Semantics pinned by the verbatim test_http-loadbalancer.c battery
  * (HttpLoadBalancerBatterySpec):
  *  - per-target `maxClients` goals rebalance on every client-count or
  *    state change: clients / operational targets, the remainder
  *    spread over the FIRST operational targets
  *    (_recalculate_clients_per_target_goals);
  *  - `chooseTarget` keeps the current target unless a recovery probe
  *    is due or the client is misbalanced (no target, target failed,
  *    or target strictly over its goal — `number_of_clients >
  *    max_clients`, :176);
  *  - a misbalanced client scans from (current index + 1) mod n for an
  *    operational target with spare capacity (STRICTLY under goal,
  *    :166) and otherwise gets the least-recently-failed target;
  *  - `setTargetFailed` counts a target once however many times it is
  *    reported, stamps `lastFailureTime` on EVERY report, and
  *    `setTargetSuccessful` restores rotation (:226-258);
  *  - recovery probes start `recoveryTimeout` seconds after the first
  *    choose that sees failures (last_recovery_attempt starts 0 and is
  *    initialized, not triggered, on that call — :144-148).
  *
  * `clock` is injectable (seconds) so the battery pins the
  * time-dependent cases deterministically; the engine's HTTP workers
  * ([[Sinks.httpPost]]) share one instance per target list with a
  * per-thread client. */
object HttpLoadBalancer {
  final class Target private[streaming] (val url: String, val index: Int) {
    private[streaming] var _operational = true
    private[streaming] var numberOfClients = 0
    private[streaming] var maxClients = 0
    private[streaming] var lastFailureTime = 0L
    def operational: Boolean = _operational
  }

  final class Client private[streaming] () {
    private[streaming] var target: Target = null
  }
}

final class HttpLoadBalancer(clock: () => Long = () => System.currentTimeMillis() / 1000L) {
  import HttpLoadBalancer.{Client, Target}

  private var _targets = Vector.empty[Target]
  private var _numClients = 0
  private var _numFailedTargets = 0
  private var lastRecoveryAttempt = 0L
  @volatile var recoveryTimeout: Long = 60L

  def targets: Seq[Target] = synchronized(_targets)
  def numTargets: Int = synchronized(_targets.size)
  def numClients: Int = synchronized(_numClients)
  def numFailedTargets: Int = synchronized(_numFailedTargets)

  def addTarget(url: String): Unit = synchronized {
    _targets :+= new Target(url, _targets.size)
  }

  def dropAllTargets(): Unit = synchronized { _targets = Vector.empty }

  /** http_lb_client_init: registration recalculates the per-target
    * goals under the lock. */
  def newClient(): Client = synchronized {
    _numClients += 1
    recalcGoals()
    new Client
  }

  /** Deregister a client and return its target capacity. The C's
    * http_lb_client_deinit is an empty stub because the reference's
    * worker pool is FIXED for the destination's lifetime; Spark task
    * threads churn, so [[Sinks]] sweeps dead threads through here —
    * without it phantom clients hold per-target goals up forever and
    * live workers avoid those targets. */
  def releaseClient(c: Client): Unit = synchronized {
    _numClients -= 1
    if (c.target != null) { c.target.numberOfClients -= 1; c.target = null }
    recalcGoals()
  }

  private def recalcGoals(): Unit = {
    val operational = _targets.size - _numFailedTargets
    if (operational == 0) return
    val perTarget = _numClients / operational
    var remainder = _numClients % operational
    _targets.foreach { t =>
      if (t._operational) {
        t.maxClients = perTarget
        if (remainder > 0) { t.maxClients += 1; remainder -= 1 }
      }
    }
  }

  private def switchTarget(lbc: Client, nt: Target): Unit =
    if (lbc.target ne nt) {
      if (lbc.target != null) lbc.target.numberOfClients -= 1
      nt.numberOfClients += 1
      lbc.target = nt
    }

  /** Smallest lastFailureTime among failed targets; target 0 when none
    * are failed (the C's lru_index fallback). */
  private def leastRecentlyTriedFailing(): Target = {
    var lru = 0L
    var lruIdx = -1
    _targets.foreach { t =>
      if (!t._operational && (lruIdx < 0 || lru > t.lastFailureTime)) {
        lru = t.lastFailureTime
        lruIdx = t.index
      }
    }
    _targets(if (lruIdx >= 0) lruIdx else 0)
  }

  private def recoverAFailedTarget(): Target = {
    lastRecoveryAttempt = clock()
    leastRecentlyTriedFailing()
  }

  private def checkRecovery(): Option[Target] =
    if (_numFailedTargets > 0) {
      val now = clock()
      if (lastRecoveryAttempt == 0L) lastRecoveryAttempt = now
      if (now - lastRecoveryAttempt >= recoveryTimeout)
        Some(recoverAFailedTarget())
      else None
    } else None

  private def locateTarget(lbc: Client): Target = {
    val n = _targets.size
    val start = if (lbc.target != null) (lbc.target.index + 1) % n else 0
    var i = 0
    while (i < n) {
      val t = _targets((i + start) % n)
      if (t._operational && t.numberOfClients < t.maxClients) return t
      i += 1
    }
    recoverAFailedTarget()
  }

  private def checkRebalance(lbc: Client): Option[Target] =
    if (lbc.target == null || !lbc.target._operational ||
        lbc.target.numberOfClients > lbc.target.maxClients)
      Some(locateTarget(lbc))
    else None

  def chooseTarget(lbc: Client): Target = synchronized {
    checkRecovery().orElse(checkRebalance(lbc))
      .foreach(switchTarget(lbc, _))
    lbc.target
  }

  def setTargetFailed(t: Target): Unit = synchronized {
    if (t._operational) {
      _numFailedTargets += 1
      t._operational = false
      recalcGoals()
    }
    t.lastFailureTime = clock()
  }

  def setTargetSuccessful(t: Target): Unit = synchronized {
    if (!t._operational) {
      _numFailedTargets -= 1
      t._operational = true
      recalcGoals()
    }
  }
}
