package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Deterministic property-check helper (no scalatestplus bridge offline):
  * samples a Gen N times from a fixed seed and applies the assertion. */
trait GenSupport {
  def forAllG[A](gen: Gen[A], n: Int = 100)(f: A => Unit): Unit = {
    val params = Gen.Parameters.default
    var seed = Seed(42L)
    var i = 0
    while (i < n) {
      gen.apply(params, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }
}
