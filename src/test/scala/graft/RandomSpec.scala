package graft

import org.scalatest.funsuite.AnyFunSuite

/** graft.gen.Random must be bit-identical to java.util.Random (the r6
  * CAS-free reimplementation of the JDK's specified LCG): every
  * fixture, golden digest and scale checksum depends on the exact
  * sequences PageGen draws. */
class RandomSpec extends AnyFunSuite {

  test("nextInt(bound)/nextBoolean/nextInt()/nextBytes match java.util.Random exactly") {
    Seq(0L, 42L, -1L, 0x9E3779B97F4A7C15L, Long.MinValue).foreach { seed =>
      val a = new java.util.Random(seed)
      val b = new graft.gen.Random(seed)
      (1 to 20000).foreach { i =>
        val bound = (i % 1021) + 1 // mixes power-of-two and odd bounds
        assert(a.nextInt(bound) == b.nextInt(bound), s"seed=$seed bound=$bound")
        if (i % 3 == 0) assert(a.nextBoolean() == b.nextBoolean())
        if (i % 5 == 0) assert(a.nextInt() == b.nextInt())
        if (i % 7 == 0) assert(a.nextInt(64) == b.nextInt(64)) // pow-2 path
      }
      val ab = new Array[Byte](37); val bb = new Array[Byte](37)
      a.nextBytes(ab); b.nextBytes(bb)
      assert(java.util.Arrays.equals(ab, bb), s"nextBytes diverged at seed=$seed")
    }
  }
}
