package org.apache.spark.sql.graft

import org.scalatest.funsuite.AnyFunSuite

/** Offset wire format: the generation id is an external-writer-
  * controlled string (LakeLog reads ANY conforming log, not just
  * UUID-id tables this engine created), so it must JSON-escape on
  * write and round-trip on parse — an unescaped quote would corrupt
  * the stream's offset WAL and brick the checkpoint.
  */
class LakeSourceOffsetSpec extends AnyFunSuite {

  test("offsets round-trip through their json, hostile ids included") {
    for (id <- Seq(
        "5b40e720-6c8e-4c06-9d3f-000000000000",
        """quote " inside""",
        """back\slash""",
        "controlchar\nnewline",
        """{"version":99,"tableId":"fake"}""")) {
      val o = LakeSourceOffset(7L, Some(id))
      val parsed = LakeSourceOffset.parse(o.json())
      assert(parsed === o, s"round-trip failed for id: $id")
    }
    // id-less (legacy) offsets stay id-less
    assert(LakeSourceOffset.parse(LakeSourceOffset(3L).json()) ===
      LakeSourceOffset(3L, None))
    // legacy wire form parses
    assert(LakeSourceOffset.parse("""{"version":-1}""") ===
      LakeSourceOffset(-1L, None))
  }
}
