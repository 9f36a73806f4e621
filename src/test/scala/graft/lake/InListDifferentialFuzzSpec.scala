package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Cast, Expression, In, Literal}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** DIFFERENTIAL fuzz for the compiled IN-list fast path: the same
  * randomized (file, atom) inputs evaluated through [[Stats]] with the
  * fast path enabled and with it force-disabled (the generic per-value
  * branch) must produce the SAME might-match verdict for every live
  * file — over a real bloom-indexed, consolidated table, so both the
  * batched index probes and the per-value sidecar fallbacks are
  * compared against the reference implementation, not just against
  * end-to-end row results.
  */
class InListDifferentialFuzzSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private def run(seed: Long): Unit = {
    val rnd = new scala.util.Random(seed)
    val path = Files.createTempDirectory(s"in-diff-$seed-").toString
    val props = Map(
      BloomIndex.COLS_PROP -> "id,v",
      BloomIndex.FPP_PROP -> "0.01",
      ConsolidatedKeyIndex.MIN_FILES_PROP -> "1",
      ConsolidatedKeyIndex.GROUP_SLOTS_PROP -> "8")
    def batch(lo: Long) =
      (lo until lo + 48L).map(i => (2 * i, s"v${2 * i}")).toDF("id", "v")
        .repartition(3)
    val t = LakeTable.create(spark, path, batch(0), properties = props)
    (1 to 10).foreach(i => t.append(batch(48L * i)))
    LakeLog.awaitMaintenance() // consolidated index at v10; 33 files
    // one uncovered commit so the sidecar FALLBACK arm is exercised too
    t.append(batch(48L * 11))
    val snap = t.snapshot
    val schema = snap.schema
    val pcs = snap.metaData.partitionColumns
    val probe = BloomIndex.probe(
      java.nio.file.Paths.get(path).toAbsolutePath.normalize.toString)

    val idAttr = AttributeReference("id", LongType)()
    val vAttr = AttributeReference("v", StringType)()
    val domain = 48L * 12 * 2
    def longLit(): Literal = rnd.nextInt(6) match {
      case 0 => Literal(rnd.nextLong())                    // far out of range
      case 1 => Literal(null, LongType)                    // null literal
      case _ => Literal(rnd.nextLong(domain))              // in-hull, mixed parity
    }
    def strLit(): Literal = rnd.nextInt(6) match {
      case 0 => Literal(UTF8String.fromString("zz" + rnd.nextInt(100)), StringType)
      case 1 => Literal(null, StringType)
      case _ => Literal(
        UTF8String.fromString(s"v${rnd.nextLong(domain)}"), StringType)
    }
    def atom(): Expression = rnd.nextInt(4) match {
      case 0 => In(idAttr, Seq.fill(1 + rnd.nextInt(8))(longLit()))
      case 1 => In(vAttr, Seq.fill(1 + rnd.nextInt(8))(strLit()))
      case 2 => // wide list crossing the memo-window machinery
        In(idAttr, (0 until 64).map(_ => longLit()))
      case 3 => // cast-wrapped key (exact widening unwraps in both paths)
        In(Cast(AttributeReference("id", LongType)(), LongType),
          Seq.fill(1 + rnd.nextInt(4))(longLit()))
    }

    (0 until 120).foreach { trial =>
      val e = atom()
      def prune(): Seq[String] = {
        val norm = Stats.normalize(e)
        snap.files.filter(f =>
          Stats.mightMatchNormalized(f, norm, schema, pcs, probe))
          .map(_.path)
      }
      Stats.InFast.disabled = false
      val fast = try prune() catch { case ex: Throwable => Seq(s"ex:$ex") }
      Stats.InFast.disabled = true
      val slow = try prune() catch { case ex: Throwable => Seq(s"ex:$ex") }
      Stats.InFast.disabled = false
      assert(fast === slow,
        s"seed=$seed trial=$trial: fast and generic IN pruning diverged " +
          s"for $e\nfast=$fast\nslow=$slow")
    }
  }

  test("fast and generic IN pruning agree on randomized atoms (seed 21)") {
    run(21)
  }
  test("fast and generic IN pruning agree on randomized atoms (seed 22)") {
    run(22)
  }
}
