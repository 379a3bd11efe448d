package graft

import org.scalatest.funsuite.AnyFunSuite

/** The scaled-lake text permutation underwrites every smoke/stress
  * linearity claim: copies must share no tokens, or LSH candidate pairs
  * grow superlinearly BY CONSTRUCTION and the gate measures the scaler,
  * not the operator. A plain Caesar rotation wraps at 26 — copy 26 would
  * be byte-identical to copy 0 — which is exactly the defect the affine
  * extension exists to prevent at factors > 26.
  */
class ScalePermutationSpec extends AnyFunSuite {

  private val alphabet = "abcdefghijklmnopqrstuvwxyz"

  test("copies below 26 keep the historical Caesar rotation (lake bits stable)") {
    for (k <- 0 until 26)
      assert(ScaleSmoke.permuted(k) === alphabet.drop(k) + alphabet.take(k),
        s"copy $k diverged from the rotation every prior round's lake used")
  }

  test("every permutation is a bijection of the alphabet") {
    for (k <- 0 until 312) {
      val p = ScaleSmoke.permuted(k)
      assert(p.sorted === alphabet, s"copy $k is not a permutation: $p")
    }
  }

  test("all 312 supported copies are pairwise distinct and near-disjoint") {
    val perms = (0 until 312).map(ScaleSmoke.permuted)
    assert(perms.distinct.size === 312)
    // any two affine maps agree on at most 2 letters, so no realistic
    // shingle survives a copy change — the token-disjointness contract
    for (i <- perms.indices; j <- (i + 1) until perms.size) {
      val agree = perms(i).zip(perms(j)).count { case (a, b) => a == b }
      assert(agree <= 2, s"copies $i and $j agree on $agree letters")
    }
  }
}
