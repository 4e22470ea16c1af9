package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.frontier.CuckooFilter

class CuckooSpec extends AnyFunSuite {

  test("no false negatives") {
    val f = CuckooFilter.create(10000)
    val keys = (0L until 10000L).map(i => i * 0x9e3779b97f4a7c15L + 17)
    keys.foreach(f.add)
    assert(keys.forall(f.contains), "cuckoo filter must never miss an inserted key")
  }

  test("false positive rate bounded") {
    val f = CuckooFilter.create(20000)
    (0L until 20000L).foreach(i => f.add(i * 2654435761L))
    val probes = (1L to 100000L).map(i => i * 0x2545f4914f6cdd1dL + 99)
    val fps = probes.count(f.contains)
    // 16-bit fp, 4 slots -> theoretical ~1.2e-4; allow generous 1e-3
    assert(fps <= 100, s"fp rate too high: $fps / 100000")
  }

  test("serialization round-trips exactly") {
    val f = CuckooFilter.create(5000)
    val keys = (0L until 5000L).map(i => i * 6364136223846793005L + 1442695040888963407L)
    keys.foreach(f.add)
    val g = CuckooFilter.fromBytes(f.toBytes)
    assert(keys.forall(g.contains))
    assert(g.size == f.size)
    assert(java.util.Arrays.equals(g.toBytes, f.toBytes), "deterministic bytes")
  }

  test("overflow beyond capacity stays sound") {
    val f = CuckooFilter.create(16) // tiny: force overflow path
    val keys = (0L until 5000L).map(i => i * 0x9e3779b97f4a7c15L)
    keys.foreach(f.add)
    assert(keys.forall(f.contains))
    val g = CuckooFilter.fromBytes(f.toBytes)
    assert(keys.forall(g.contains))
  }

  test("deduplicating add does not double count") {
    val f = CuckooFilter.create(1000)
    (0 until 100).foreach(_ => f.add(42L))
    assert(f.size == 1)
  }
}
