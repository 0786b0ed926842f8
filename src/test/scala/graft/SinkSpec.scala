package graft

import graft.etl.PartitionedSink
import java.nio.file.Files
import java.sql.Date
import org.apache.spark.sql.functions._

/** Partitioned/clustered sink and append-mode schema evolution — the gate
  * SURVEY §2.15 promises ("exercised in tests").
  */
class SinkSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString + "/t"

  test("writeMonthly partitions by month, splits within month, sorts by cluster key") {
    val rows = (1 to 400).map { i =>
      (i.toLong, i % 40, Date.valueOf(s"1995-0${1 + i % 3}-15"))
    }.toDF("id", "ck", "d")
    val path = tmp("sink_monthly")
    // AQE would (correctly) coalesce this tiny write into one task; disable
    // it here so the intra-month fan-out is observable in the file layout.
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try PartitionedSink.writeMonthly(rows, "d", "ck", path, filesPerMonth = 4)
    finally spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    val back = spark.read.parquet(path)
    assert(back.count() == 400)
    assert(back.select("p_month").distinct().count() == 3)
    // intra-month split: each month directory holds >1 data file
    val monthDirs = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("p_month="))
    assert(monthDirs.nonEmpty)
    monthDirs.foreach { d =>
      val files = d.listFiles().count(_.getName.endsWith(".parquet"))
      assert(files > 1, s"${d.getName} has $files file(s) — no write parallelism")
    }
    // partition pruning works on the manifest column
    assert(back.where(col("p_month") === "1995-02").count() ==
      (1 to 400).count(i => i % 3 == 1))
  }

  test("appendAligned evolves schema on both sides; readAligned zero-fills") {
    val path = tmp("sink_append")
    val batch1 = Seq((1L, 10L)).toDF("k", "a")
    val batch2 = Seq((2L, 20L)).toDF("k", "b") // drops a, adds b
    PartitionedSink.appendAligned(spark, batch1, path)
    PartitionedSink.appendAligned(spark, batch2, path)
    val back = PartitionedSink.readAligned(spark, path)
    assert(back.columns.toSet == Set("k", "a", "b"))
    val m = back.select("k", "a", "b").as[(Long, Long, Long)]
      .collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(m(1L) == ((10L, 0L)), "pre-evolution rows must read the new column as 0")
    assert(m(2L) == ((0L, 20L)), "appended batch must zero-fill the missing column")
  }

  test("incremental pipeline: full load, window loads, and idempotent re-runs compose") {
    import graft.etl.IncrementalPipeline
    val path = tmp("sink_incr")
    val rows = Seq(
      (1L, 1L, Date.valueOf("1995-01-10")),
      (2L, 2L, Date.valueOf("1995-02-10")),
      (3L, 3L, Date.valueOf("1995-03-05")),
      (4L, 4L, Date.valueOf("1995-03-20")),
      (5L, 5L, Date.valueOf("1995-04-02"))).toDF("id", "ck", "d")
    def exec(s: String) = lit(s).cast("date")
    // first run at 1995-03-01: full history before exec
    IncrementalPipeline.run(spark, rows, "d", "ck", path, exec("1995-03-01"))
    assert(spark.read.parquet(path).select("id").as[Long].collect().sorted.toSeq
      == Seq(1L, 2L))
    // monthly run at 1995-04-01: [1995-03-01, 1995-04-01) window
    IncrementalPipeline.run(spark, rows, "d", "ck", path, exec("1995-04-01"))
    assert(spark.read.parquet(path).select("id").as[Long].collect().sorted.toSeq
      == Seq(1L, 2L, 3L, 4L))
    // retry of the same window must be a no-op, not an append-duplicate
    IncrementalPipeline.run(spark, rows, "d", "ck", path, exec("1995-04-01"))
    assert(spark.read.parquet(path).count() == 4)
  }

  test("z-order layout bounds row-group touches for range filters on either dimension") {
    import graft.functions.F
    // a 32×32 grid; "row groups" modeled as blocks of 64 consecutive rows
    val grid = (for (x <- 0 until 32; y <- 0 until 32) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    def blocksTouched(ordered: Seq[(Long, Long)], pred: ((Long, Long)) => Boolean) =
      ordered.grouped(64).zipWithIndex.count { case (blk, _) => blk.exists(pred) }
    val byX = grid.orderBy("x", "y").as[(Long, Long)].collect().toSeq
    val byZ = grid.orderBy(F.zorder2(col("x"), col("y")), col("x"), col("y"))
      .as[(Long, Long)].collect().toSeq
    val yFilter = (p: (Long, Long)) => p._2 < 4
    val xFilter = (p: (Long, Long)) => p._1 < 4
    // x-major sort: a filter on y touches EVERY block; z-order bounds both
    assert(blocksTouched(byX, yFilter) == 16)
    assert(blocksTouched(byZ, yFilter) <= 8, s"z ${blocksTouched(byZ, yFilter)}")
    assert(blocksTouched(byZ, xFilter) <= 8, s"z ${blocksTouched(byZ, xFilter)}")
  }

  test("compaction collapses small files per partition without losing rows") {
    val inPath = tmp("compact_in")
    val rows = (1 to 300).map(i =>
      (i.toLong, i % 40, Date.valueOf(s"1995-0${1 + i % 2}-10"))).toDF("id", "ck", "d")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      // simulate many-small-files accretion: 16-way split per month
      PartitionedSink.writeMonthly(rows, "d", "ck", inPath, filesPerMonth = 16)
      def filesPerMonth(p: String) = new java.io.File(p).listFiles()
        .filter(_.getName.startsWith("p_month=")).map(d =>
          d.getName -> d.listFiles().count(_.getName.endsWith(".parquet"))).toMap
      assert(filesPerMonth(inPath).values.forall(_ > 2))
      val outPath = tmp("compact_out")
      PartitionedSink.compact(spark, inPath, outPath, Seq("p_month"), 1)
      assert(filesPerMonth(outPath).values.forall(_ == 1), s"${filesPerMonth(outPath)}")
      assert(spark.read.parquet(outPath).count() == 300)
    } finally
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
  }

  test("bucketed tables join without an exchange on either side") {
    val n = 2000
    val fact = (1 to n).map(i => (i.toLong % 50, i.toLong)).toDF("k", "v")
    val dim = (0L until 50L).map(i => (i, s"name$i")).toDF("k", "name")
    PartitionedSink.writeBucketed(fact, "k", 8, "graft_bkt_fact")
    PartitionedSink.writeBucketed(dim, "k", 8, "graft_bkt_dim")
    // dim must not broadcast here — the point is the co-located SMJ
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("graft_bkt_fact")
        .join(spark.table("graft_bkt_dim"), "k")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n${plan.take(1500)}")
      assert(j.count() == n)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_fact")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_dim")
    }
  }

  test("approx quantiles land inside the distribution") {
    import graft.validation.Profiler
    val df = (1 to 1000).map(_.toLong).toDF("v")
    val q = Profiler.approxQuantiles(df, Seq("v"), Seq(0.5))
      .select("quantiles").as[Seq[Long]].head()
    assert(q.head >= 450L && q.head <= 550L, s"p50=${q.head}")
  }

  test("frame sampler DECODES real APNG frames, every-kth, bounded, damage-safe") {
    import graft.multimodal.{BinaryPipeline, PixelCodec}
    // 5 frames, 4x3 px; frame fr is a solid gray 10*fr + 10 so decoded
    // bytes are hand-checkable
    val blob = PixelCodec.encodeApng(4, 3, 5, (_, _) => 0,
      (fr, _, _, _) => 10 * fr + 10)
    val frames = BinaryPipeline.sampleFrames(blob, every = 2, maxFrames = 4)
    assert(frames.map(_._1) == Seq(0, 2, 4), "every-2nd of 5 frames")
    assert(frames.forall(_._2.length == 4 * 3 * 3), "flat RGB triples")
    assert(frames.map(_._2.head.toInt) == Seq(10, 30, 50),
      "decoded pixel values must come from the right frames")
    assert(BinaryPipeline.sampleFrames(blob, 2, 2).map(_._1) == Seq(0, 2))
    // garbage and a byte-slicing-era payload both yield ZERO frames now
    assert(BinaryPipeline.sampleFrames(Array.tabulate[Byte](150)(_.toByte),
      2, 4).isEmpty)
    val df = Seq((7L, blob)).toDF("doc_id", "blob")
    val rows = BinaryPipeline.extractFrames(spark, df, 2, 4).collect()
    assert(rows.map(_.frame_no).sorted.toSeq == Seq(0, 2, 4))
    assert(rows.forall(_.frame_bytes.length == 36))
  }
}
