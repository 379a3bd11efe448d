package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the three [[SkewStress.isStraggler]] rules, each anchored to
  * the MEASURED profile that motivated it (so a threshold tweak that
  * would un-flag a known-bad shape, or flag a known-clean one, fails in
  * seconds instead of waiting for a bench round):
  *  - rule 1 (wall blowup): the r13 de-binned attribution quadratic;
  *  - rule 2 (hot-task collapse vs base): the sf0.1 de-binned control;
  *  - rule 3 (native-hot collapse, r15): the global-sorted per-lang
  *    percentile, whose BASE is equally collapsed (en is 41% natively)
  *    so rules 1-2 are structurally blind to it.
  * Clean-side pins use the r14/r15 sweep's worst legitimate probes.
  */
class SkewRulesSpec extends AnyFunSuite {
  import SkewStress.{SkewMeasure, isStraggler}

  private def m(base: Double, skew: Double, maxMs: Long,
                med: Long = 10, n: Int = 16) =
    SkewMeasure(base, skew, maxMs, med, n)

  test("rule 1: wall blowup flags the r13 quadratic class") {
    // selfjoin_size_estimate's r14 live catch: 0.44 -> 6.77 s
    assert(isStraggler(m(0.44, 6.77, 3000)))
    // a 10x-past-floor blowup on a fast base
    assert(isStraggler(m(0.10, 4.5, 1000)))
    // under the 4 s floor: not a blowup even at a high ratio
    assert(!isStraggler(m(0.10, 3.0, 500)))
  }

  test("rule 2: hot-task collapse flags the de-binned control profile") {
    // measured r14: 2.8 s wall, 85% in one task, 4.7x base
    assert(isStraggler(m(0.6, 2.8, 2380)))
    // moderate share with the wall tracking the base (box drift): clean
    // (an 85%+ share would now flag via rule 3 REGARDLESS of base - by
    // design: that profile is a collapse wherever the base sits)
    assert(!isStraggler(m(2.5, 2.8, 1900)))
  }

  test("rule 3: native-hot collapse needs no base ratio") {
    // measured r15 __globalsorted control: 3.05 s at 89% share,
    // only 1.56x its equally-collapsed base - rules 1-2 blind
    assert(isStraggler(m(1.95, 3.05, 2716)))
    // under the 2 s wall floor: clean regardless of share
    assert(!isStraggler(m(0.5, 1.9, 1800)))
  }

  test("floorScale scales the absolute floors, not the ratios (10x sweep)") {
    // a wall under the scaled trust floor: flags at scale 1 (rule 2's
    // absolute floors were calibrated on sf0.1 walls), clean at scale 10
    // where only ≥20 s walls are past scheduling/semantic-straggler noise
    assert(isStraggler(m(1.0, 5.0, 4000)))
    assert(!isStraggler(m(1.0, 5.0, 4000), floorScale = 10.0))
    // the de-binned control's shape AT 10x: collapse share with the wall
    // blown past the scaled floors — must still flag at scale 10
    assert(isStraggler(m(6.0, 96.0, 82000), floorScale = 10.0)) // rule 1
    assert(isStraggler(m(20.0, 55.0, 47000), floorScale = 10.0)) // rules 2/3
    // under the scaled wall floor: clean regardless of share
    assert(!isStraggler(m(5.0, 19.0, 17000), floorScale = 10.0))
  }

  test("box-relaxed floors (r17): a 3x-slow box does not false-flag, a " +
    "genuine collapse still does") {
    // Bench passes floorScale = StreamingThroughput.floorRelax(canary
    // median) so the ABSOLUTE seconds floors track box drift while the
    // scale-free ratio/share thresholds stay put (VERDICT r16 task #3).
    // An honest probe whose paired walls both inflated 3x on a slow box:
    // rule 2's 2 s wall floor (x3 = 6 s) keeps the moderate-share
    // semantic straggler clean where a raw floor would flag it...
    val inflated = m(1.7, 5.1, 3400, med = 900) // 67% share at 3x walls
    assert(isStraggler(inflated)) // raw floors: flags (the false positive)
    assert(!isStraggler(inflated, floorScale = 3.0))
    // ...while the de-binned collapse shape, 3x-inflated, still flags:
    // 8.4 s >= 6 s scaled floor, 85% share, 4.7x its paired base
    assert(isStraggler(m(1.8, 8.4, 7140), floorScale = 3.0))
    // and a true quadratic blowup clears the scaled rule-1 floor easily
    assert(isStraggler(m(1.3, 69.0, 30000), floorScale = 3.0))
  }

  test("the worst legitimate r14/r15 probe profiles stay clean") {
    // ivm_delta_join: highest legitimate hot-task share (0.64 at 1.55 s)
    assert(!isStraggler(m(1.61, 1.55, 992)))
    // link_prediction_common_nbrs: highest legitimate wall (0.49 share)
    assert(!isStraggler(m(2.40, 2.52, 1235)))
    // multi_touch_attribution under contention: 0.99 -> 4.82 s, 46% share
    assert(!isStraggler(m(0.99, 4.82, 2200)))
  }
}
