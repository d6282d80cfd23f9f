package graft

import graft.filterset.CuckooFilter
import org.scalatest.funsuite.AnyFunSuite

class CuckooFilterSpec extends AnyFunSuite {

  private def keys(n: Int, seed: Long): Seq[Long] =
    (0 until n).map(i => i.toLong * 0x9E3779B97F4A7C15L + seed)

  test("zero false negatives at design load; FPR sane") {
    val n = 10000
    val cf = CuckooFilter.create(n)
    val ks = keys(n, 42L)
    ks.foreach(cf.put)
    assert(ks.forall(cf.mightContain), "an inserted key must NEVER answer unseen")
    val probes = keys(100000, 777777L)
    val fp = probes.count(cf.mightContain)
    assert(fp < probes.size / 100, s"FPR too high: $fp/${probes.size}")
  }

  test("deletion removes membership; colliding inserts survive a delete") {
    val cf = CuckooFilter.create(1000)
    val ks = keys(500, 7L)
    ks.foreach(cf.put)
    assert(cf.delete(ks.head))
    // every OTHER inserted key must still be present (even under
    // fingerprint collisions: both were inserted, so two slots held the
    // fingerprint and one remains)
    assert(ks.tail.forall(cf.mightContain))
    assert(!cf.delete(123456789L) || true) // deleting absent keys is a no-op boolean
  }

  test("overload parks victims instead of dropping: still zero false negatives") {
    val cf = CuckooFilter.create(64) // deliberately undersized
    val ks = keys(600, 99L) // ~9x capacity
    ks.foreach(cf.put)
    assert(ks.forall(cf.mightContain),
      s"overfilled filter must keep the no-false-negative contract (victims=${cf.victimCount})")
    assert(cf.victimCount > 0, "test must actually exercise the victim path")
  }

  test("pathological overload fails fast with a sizing hint, never a silent cliff") {
    val cf = CuckooFilter.create(16) // 16 buckets = 64 slots
    val ex = intercept[IllegalStateException] {
      keys(2000, 1234L).foreach(cf.put) // ~30x capacity -> victims exceed MaxVictims
    }
    assert(ex.getMessage.contains("bloomExpectedPerShard"),
      s"overload error must carry the sizing hint, got: ${ex.getMessage}")
  }

  test("serde round-trip preserves contents and victims") {
    val cf = CuckooFilter.create(64)
    val ks = keys(500, 5L)
    ks.foreach(cf.put)
    val bos = new java.io.ByteArrayOutputStream()
    cf.writeTo(bos)
    val back = CuckooFilter.readFrom(new java.io.ByteArrayInputStream(bos.toByteArray))
    assert(back.cardinality === cf.cardinality)
    assert(back.victimCount === cf.victimCount)
    assert(ks.forall(back.mightContain))
  }
}
