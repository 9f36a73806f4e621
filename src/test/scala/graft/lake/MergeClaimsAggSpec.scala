package graft.lake

import org.scalatest.funsuite.AnyFunSuite

/** Unit-pins the fused merge-claims aggregate's buffer algebra — the
  * cross-partition multi-match cases a co-partitioned equi-join rarely
  * produces but a cartesian/theta merge condition can. */
class MergeClaimsAggSpec extends AnyFunSuite {

  private def reduce(b: MergeClaimsBuffer,
      rows: (String, Long, Boolean, Int)*): MergeClaimsBuffer = {
    rows.foreach(r => MergeClaimsAgg.reduce(b, r))
    b
  }

  private def roundTrip(b: MergeClaimsBuffer): Map[String, MergeFileClaims] =
    MergeClaimsAgg.decode(MergeClaimsAgg.finish(b))

  test("claims and single matches: no ambiguity, bitmap carries claimed idx") {
    val b = reduce(MergeClaimsAgg.zero,
      ("f1", 0L, true, 1), // matched, claimed by clause 1
      ("f1", 1L, true, -1), // matched, no clause applied
      ("f1", 2L, false, 0), // by-source claim
      ("", -1L, false, 3)) // source-only row: ignored
    val m = roundTrip(b)
    assert(m.keySet === Set("f1"))
    assert(m("f1").maxMatches <= 1)
    val bm = Dv.deserialize(m("f1").claims)
    assert(bm.contains(0L) && bm.contains(2L) && !bm.contains(1L))
  }

  test("within-buffer multi-match: exact count and offending idx") {
    val b = reduce(MergeClaimsAgg.zero,
      ("f1", 5L, true, 0), ("f1", 5L, true, 0), ("f1", 5L, true, 0))
    val m = roundTrip(b)
    assert(m("f1").maxMatches === 3L)
    assert(m("f1").maxMatchesIdx === 5L)
  }

  test("cross-buffer multi-match: once in each of two partitions") {
    val a = reduce(MergeClaimsAgg.zero, ("f1", 7L, true, -1))
    val b = reduce(MergeClaimsAgg.zero, ("f1", 7L, true, -1))
    val m = roundTrip(MergeClaimsAgg.merge(a, b))
    assert(m("f1").maxMatches === 2L)
    assert(m("f1").maxMatchesIdx === 7L)
  }

  test("cross-buffer exact sums: dup+dup, dup+seen, three-way") {
    val a = reduce(MergeClaimsAgg.zero,
      ("f1", 1L, true, -1), ("f1", 1L, true, -1), // count 2
      ("f1", 2L, true, -1)) // count 1
    val b = reduce(MergeClaimsAgg.zero,
      ("f1", 1L, true, -1), // +1 -> 3
      ("f1", 2L, true, -1), ("f1", 2L, true, -1)) // +2 -> 3
    val c = reduce(MergeClaimsAgg.zero, ("f1", 2L, true, -1)) // -> 4
    val merged = MergeClaimsAgg.merge(MergeClaimsAgg.merge(a, b), c)
    val f = merged.files.get("f1")
    assert(f.countOf(1L) === 3L)
    assert(f.countOf(2L) === 4L)
    val m = roundTrip(merged)
    assert(m("f1").maxMatches === 4L)
  }

  test("buffer survives java serialization (partial aggregation wire)") {
    val a = reduce(MergeClaimsAgg.zero,
      ("f1", 1L, true, 0), ("f1", 1L, true, 0), ("f2", 9L, false, 2))
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(a); oos.close()
    val back = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
      .readObject().asInstanceOf[MergeClaimsBuffer]
    val m = roundTrip(back)
    assert(m("f1").maxMatches === 2L)
    assert(Dv.deserialize(m("f2").claims).contains(9L))
  }

  test("files with neither claims nor dups are dropped from the blob") {
    val b = reduce(MergeClaimsAgg.zero, ("f1", 3L, true, -1))
    assert(roundTrip(b).isEmpty)
  }
}
