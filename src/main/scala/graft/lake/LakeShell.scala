package graft.lake

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Tiny CLI exercising the lake layer end-to-end: create → append →
  * evolve → DELETE/UPDATE/MERGE → time travel → history → vacuum, over a
  * slice of the harness lineitem table. Usage:
  *   runMain graft.lake.LakeShell <sfDir> <tableDir>
  */
object LakeShell {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, tableDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    val t = LakeTable.create(spark, tableDir, li.where($"l_orderkey" < 500),
      partitionBy = Seq("l_returnflag"), mode = "overwrite")
    println(s"[lake-shell] v${t.version} rows=${t.toDF.count()}")

    t.append(li.where($"l_orderkey" >= 500 && $"l_orderkey" < 1000))
    println(s"[lake-shell] after append: v${t.version} rows=${t.toDF.count()}")

    val deleted = t.delete($"l_quantity" > 45)
    println(s"[lake-shell] deleted $deleted rows; now=${t.toDF.count()}")

    t.update($"l_returnflag" === "R", Map("l_quantity" -> lit(0.0)))
    println(s"[lake-shell] R rows with qty!=0: " +
      t.toDF.where($"l_returnflag" === "R" && $"l_quantity" =!= 0.0).count())

    val src = Seq((1L, 99, 7.5, "R"), (999999L, 1, 1.0, "N"))
      .toDF("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    t.merge(src, expr("t.l_orderkey = s.l_orderkey AND t.l_linenumber = s.l_linenumber"))
    println(s"[lake-shell] after merge: rows=${t.toDF.count()} " +
      s"inserted=${t.toDF.where($"l_orderkey" === 999999L).count()}")

    println(s"[lake-shell] v0 still reads ${t.asOf(0).toDF.count()} rows (time travel)")
    println("[lake-shell] history:")
    t.history(20).show(truncate = false) // newest 20 = O(20) commit reads
    println(s"[lake-shell] skipping: all=${t.toDF.inputFiles.length} files, " +
      s"flag=A=${t.read($"l_returnflag" === "A").inputFiles.length} files")
    val vacuumed = t.vacuum(retentionMs = 0L)
    println(s"[lake-shell] vacuumed ${vacuumed.size} files; " +
      s"current rows=${t.toDF.count()}")
    spark.stop()
  }
}
