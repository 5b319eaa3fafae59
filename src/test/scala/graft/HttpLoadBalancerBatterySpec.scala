package graft

import graft.streaming.HttpLoadBalancer

/** Verbatim port of the reference's HTTP load-balancer battery
  * (`/root/reference/modules/http/tests/test_http-loadbalancer.c`,
  * all 9 cases): 5 targets, 16 clients, worker affinity, balancing
  * goals with the remainder on the first targets, failed-target
  * rotation removal, refcount-style failed tracking, the
  * least-recently-failed fallback when everything is down, and the
  * recovery-timeout probe. The two time-dependent cases (the C sleeps
  * real seconds) pin an injectable clock instead. */
class HttpLoadBalancerBatterySpec extends org.scalatest.funsuite.AnyFunSuite {

  private val NumTargets = 5
  private val NumClients = 16

  private def constructLb(clock: () => Long = () => 1000L): HttpLoadBalancer = {
    val lb = new HttpLoadBalancer(clock)
    (0 until NumTargets).foreach(i => lb.addTarget(s"http://localhost:${8000 + i}"))
    lb
  }

  test("construct_and_free") {
    val lb = constructLb()
    assert(lb.numTargets == NumTargets)
  }

  test("target_index_is_set_as_urls_are_added_to_the_array_index") {
    val lb = constructLb()
    lb.targets.zipWithIndex.foreach { case (t, i) => assert(t.index == i) }
  }

  test("number_of_clients_is_tracked_in_num_clients") {
    val lb = constructLb()
    (1 to NumClients).foreach { i =>
      lb.newClient()
      assert(lb.numClients == i)
    }
  }

  test("choose_target_selects_the_first_operational_target") {
    val lb = constructLb()
    val lbc = lb.newClient()
    val target = lb.chooseTarget(lbc)
    assert(target.url == "http://localhost:8000")
    assert(target.operational)
  }

  test("choose_target_balances_clients_to_targets") {
    val lb = constructLb()
    val lbc = Seq.fill(NumClients)(lb.newClient())
    val counts = new Array[Int](NumTargets)
    lbc.foreach(c => counts(lb.chooseTarget(c).index) += 1)
    val expected = NumClients / NumTargets
    counts.zipWithIndex.foreach { case (n, i) =>
      // one extra client may land on the first targets when the count
      // is not divisible (the remainder rule)
      assert(n - expected <= 1 && n - expected >= 0,
        s"target $i not balanced: expected=$expected actual=$n")
    }
  }

  test("choose_target_tries_to_stay_affine_to_the_current_target") {
    val lb = constructLb()
    val lbc = Seq.fill(NumClients)(lb.newClient())
    lbc.foreach { c =>
      val initial = lb.chooseTarget(c)
      (1 to 100).foreach { _ => assert(lb.chooseTarget(c) eq initial) }
    }
  }

  private def shouldFail(t: HttpLoadBalancer.Target): Boolean = t.index % 2 != 0

  test("failed_target_is_taken_out_of_rotation") {
    val lb = constructLb()
    val lbc = Seq.fill(NumClients)(lb.newClient())
    var failing = 0
    lbc.foreach { c =>
      val t = lb.chooseTarget(c)
      assert(t != null)
      if (shouldFail(t)) { lb.setTargetFailed(t); failing += 1 }
      else lb.setTargetSuccessful(t)
    }
    val counts = new Array[Int](NumTargets)
    lbc.foreach { c =>
      val t = lb.chooseTarget(c)
      assert(!shouldFail(t), s"returned a failed target, index=${t.index}")
      assert(t.operational)
      counts(t.index) += 1
    }
    lb.targets.foreach { t =>
      if (shouldFail(t)) assert(!t.operational)
      else {
        val expected = NumClients / (NumTargets - failing)
        assert(counts(t.index) - expected <= 1 && counts(t.index) - expected >= 0,
          s"target ${t.index} not balanced: expected=$expected actual=${counts(t.index)}")
      }
    }
  }

  test("number_of_failed_targets_is_tracked_even_if_the_same_target_is_failed_multiple_times") {
    val lb = constructLb()
    lb.newClient()
    lb.targets.zipWithIndex.foreach { case (t, i) =>
      lb.setTargetFailed(t)
      assert(lb.numFailedTargets == i + 1)
      lb.setTargetFailed(t)
      assert(lb.numFailedTargets == i + 1)
      lb.setTargetSuccessful(t)
      assert(lb.numFailedTargets == i)
      lb.setTargetSuccessful(t)
      assert(lb.numFailedTargets == i)
      lb.setTargetFailed(t)
      assert(lb.numFailedTargets == i + 1)
    }
  }

  test("if_all_targets_fail_the_least_recently_failed_one_is_tried") {
    // the C sleeps 1s between failures so failure times strictly
    // decrease with the index; the injected clock does the same
    var now = 1000L
    val lb = constructLb(() => now)
    val lbc = lb.newClient()
    (NumTargets - 1 to 0 by -1).foreach { i =>
      lb.setTargetFailed(lb.targets(i))
      now += 1
    }
    var target = lb.chooseTarget(lbc)
    assert(!target.operational)
    assert(target.index == NumTargets - 1)
    lb.setTargetFailed(target)
    target = lb.chooseTarget(lbc)
    assert(!target.operational)
    assert(target.index == NumTargets - 2)
    lb.setTargetFailed(target)
    target = lb.chooseTarget(lbc)
    assert(!target.operational)
    assert(target.index == NumTargets - 3)
  }

  test("failed_servers_are_reattempted_after_recovery_time") {
    var now = 1000L
    val lb = constructLb(() => now)
    lb.recoveryTimeout = 1
    val lbc = Seq.fill(NumClients)(lb.newClient())
    lb.setTargetFailed(lb.targets.head)
    // within the recovery window every worker gets an operational target
    lbc.foreach { c =>
      val t = lb.chooseTarget(c)
      assert(t.operational)
    }
    now += 1 // the C sleeps past the 1-second recovery timeout
    val t = lb.chooseTarget(lbc.head)
    assert(!t.operational) // the recovery probe hands out the failed one
  }

  test("drop_targets_resets_the_target_list") {
    val lb = constructLb()
    assert(lb.numTargets != 0)
    lb.dropAllTargets()
    assert(lb.numTargets == 0)
  }
}
