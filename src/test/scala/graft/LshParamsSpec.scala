package graft

import graft.operators.Dedup
import org.scalatest.funsuite.AnyFunSuite

/** Asserts the LSH parameterization is production-shaped: the banding
  * S-curve 1-(1-J^r)^b must detect true near-dups (J = 0.8) with
  * probability ≥ 0.95 while keeping its threshold (1/b)^(1/r) aligned
  * with the pipeline's est_jaccard ≥ 0.5 output filter. Round 1's toy
  * 8-hash/4-band family detected J = 0.8 pairs only ~83% of the time.
  */
class LshParamsSpec extends AnyFunSuite {

  private def detectP(j: Double): Double =
    1.0 - math.pow(1.0 - math.pow(j, Dedup.RowsPerBand), Dedup.Bands)

  test("affine family: b*r hashes, distinct members, DuckDB-safe ranges") {
    assert(Dedup.NumHashes === Dedup.Bands * Dedup.RowsPerBand)
    assert(Dedup.hashA.size === Dedup.NumHashes)
    assert(Dedup.hashB.size === Dedup.NumHashes)
    assert(Dedup.hashA.distinct.size === Dedup.NumHashes, "duplicate family members")
    // A < 2^31 keeps A*h + B < 2^63 for h < 2^32: same arithmetic is
    // expressible in DuckDB BIGINTs (no unsigned / no overflow)
    assert(Dedup.hashA.forall(a => a >= 1L && a < (1L << 31)))
    assert(Dedup.hashB.forall(b => b >= 0L && b < (1L << 31)))
  }

  test("S-curve: >=0.95 detection at J=0.8, threshold ~0.5, low-J rejection") {
    assert(detectP(0.8) >= 0.95, f"detection at J=0.8 is ${detectP(0.8)}%.4f")
    val threshold = math.pow(1.0 / Dedup.Bands, 1.0 / Dedup.RowsPerBand)
    assert(math.abs(threshold - 0.5) < 0.1,
      f"S-curve threshold $threshold%.3f drifted from the 0.5 output filter")
    assert(detectP(0.2) <= 0.05, f"J=0.2 false-candidate rate ${detectP(0.2)}%.4f")
  }

  /** Leave-one-out multi-probe: a band fires when ≥ r-1 of its r rows
    * agree, so per-band p = J^r + r·J^(r-1)·(1-J).
    */
  private def detectPMulti(j: Double): Double = {
    val r = Dedup.RowsPerBand
    val pBand = math.pow(j, r) + r * math.pow(j, r - 1) * (1 - j)
    1.0 - math.pow(1.0 - pBand, Dedup.Bands)
  }

  test("multi-probe lifts detection below the S-curve knee, keeps low-J rejection sane") {
    // at J=0.6 the full-key family leaks ~11% of true pairs; LOO probing
    // closes that to < 0.1% — the recall the variant exists to buy
    assert(detectP(0.6) <= 0.92, f"standard detection at J=0.6 is ${detectP(0.6)}%.4f")
    assert(detectPMulti(0.6) >= 0.999,
      f"multi-probe detection at J=0.6 is ${detectPMulti(0.6)}%.4f")
    assert(detectPMulti(0.45) >= 0.9,
      f"multi-probe detection at J=0.45 is ${detectPMulti(0.45)}%.4f")
    // candidate-volume guard: deep-low-J pairs must still mostly miss
    assert(detectPMulti(0.1) <= 0.1,
      f"multi-probe J=0.1 false-candidate rate ${detectPMulti(0.1)}%.4f")
  }
}
