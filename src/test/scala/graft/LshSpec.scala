package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.urls.UrlOps

/** e2_knn_lsh scale properties (VERDICT r2 "What's wrong" #4): the signature
  * width must grow with the corpus so the in-bucket self-join never goes
  * quadratic.
  */
class LshSpec extends AnyFunSuite {

  test("e2NBits keeps expected bucket occupancy <= 16 at any corpus size") {
    for (n <- Seq(100L, 500L, 2000L, 100000L, 1000000L, 100000000L, 1000000000L)) {
      val bits = Queries.e2NBits(n)
      assert(bits >= 16 && bits <= Queries.E2MaxBits)
      assert(n.toDouble / (1L << bits) <= 16.0 + 1e-9,
        s"n=$n nBits=$bits load=${n.toDouble / (1L << bits)}")
    }
    // monotone non-decreasing
    val seq = Seq(1L, 1000L, 1000000L, 1000000000L).map(Queries.e2NBits)
    assert(seq == seq.sorted)
  }

  test("empirical max in-bucket count stays bounded at 10x vectors") {
    val planes = Queries.e2Planes
    def vecs(n: Int): Iterator[Array[Double]] = Iterator.tabulate(n) { i =>
      Array.tabulate(64)(d =>
        Queries.mix64(UrlOps.fnv1a64(s"lshvec:$i:$d")).toDouble / Long.MaxValue.toDouble)
    }
    def maxBucket(n: Int): Int = {
      val bits = Queries.e2NBits(n.toLong)
      val counts = new java.util.HashMap[Int, Int]()
      vecs(n).foreach { v =>
        counts.merge(Queries.e2Bucket(v, planes, bits), 1, Integer.sum _)
      }
      counts.values.stream().mapToInt(identity _).max.getAsInt
    }
    val m1 = maxBucket(2000)
    val m10 = maxBucket(20000)
    // 2^16 buckets at both sizes: LSH buckets are NOT uniform (correlated
    // vectors collide by design), but the hot bucket must stay far below
    // anything that makes the in-bucket join quadratic in n
    assert(m1 <= 64, s"hot bucket at n=2000: $m1")
    assert(m10 <= 256, s"hot bucket at n=20000: $m10")
    assert(m10 <= m1 * 32, s"hot bucket grew superlinearly: $m1 -> $m10")
  }
}
