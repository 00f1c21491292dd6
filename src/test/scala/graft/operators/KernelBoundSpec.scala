package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Exactness pins for the bounded distance kernel feeding the
  * knn-graph brute-force pruning: any finite return must be BIT-EQUAL
  * to the unbounded kernel (same accumulation order), the early exit
  * must fire only when the candidate strictly loses, and the +Inf
  * bound must disable the exit entirely. */
class KernelBoundSpec extends AnyFunSuite {

  private def vec(seed: Int, n: Int): Array[Float] = {
    val r = new scala.util.Random(seed)
    Array.fill(n)(r.nextFloat() * 2f - 1f)
  }

  test("l2F32Bounded(+Inf) == l2F32 bitwise on seeded vectors of every " +
    "length class (below/at/above the 16-dim check stride)") {
    for (n <- Seq(1, 3, 15, 16, 17, 31, 32, 64, 100); s <- 0 until 20) {
      val a = vec(s, n); val b = vec(s + 1000, n)
      val full = PartitionedTopK.l2F32(a, b)
      val bounded = PartitionedTopK.l2F32Bounded(a, b, Float.PositiveInfinity)
      assert(java.lang.Float.floatToIntBits(bounded) ===
        java.lang.Float.floatToIntBits(full), s"n=$n seed=$s")
    }
  }

  test("early exit is sound: +Inf only when the true distance strictly " +
    "exceeds the bound; finite returns are the exact kernel value") {
    val r = new scala.util.Random(7)
    for (s <- 0 until 500) {
      val n = 1 + r.nextInt(96)
      val a = vec(s, n); val b = vec(s + 5000, n)
      val full = PartitionedTopK.l2F32(a, b)
      // bounds around the true value: below, exactly at, above
      for (bound <- Seq(full * 0.5f, full, full * 1.5f, 0f)) {
        val got = PartitionedTopK.l2F32Bounded(a, b, bound)
        if (got.isInfinite)
          assert(full > bound,
            s"exited at bound=$bound but true dist $full does not exceed it")
        else
          assert(java.lang.Float.floatToIntBits(got) ===
            java.lang.Float.floatToIntBits(full))
      }
      // a bound EQUAL to the final distance must never early-exit the
      // exact value away (ties resolve by id downstream)
      assert(!PartitionedTopK.l2F32Bounded(a, b, full).isInfinite)
    }
  }

  test("prefix monotonicity premise: f32 partial sums of squares never " +
    "decrease (seeded)") {
    val r = new scala.util.Random(11)
    for (_ <- 0 until 200) {
      val n = 1 + r.nextInt(128)
      val a = vec(r.nextInt(1 << 20), n); val b = vec(r.nextInt(1 << 20), n)
      var acc = 0.0f
      var prev = 0.0f
      var d = 0
      while (d < n) {
        val x = a(d) - b(d); acc += x * x
        assert(acc >= prev, s"prefix sum decreased at $d")
        prev = acc
        d += 1
      }
    }
  }
}
