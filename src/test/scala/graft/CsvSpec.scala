package graft

import graft.sources.GraftCsv
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** '#'-delimited CSV ingest: explicit schema, errors→null date coercion,
  * corrupt-record accounting (the reference's read_csv + to_datetime
  * errors='coerce' entry point).
  */
class CsvSpec extends SparkSpec {

  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("ts", StringType)))

  test("reads '#'-delimited rows, coerces bad dates to null, counts corrupt lines") {
    val dir = Files.createTempDirectory("graft_csv").toString
    Files.write(Paths.get(s"$dir/part.csv"), java.util.Arrays.asList(
      "1#alice#1995-03-01 00:00:00",
      "2#bob#not-a-date",          // malformed date → null after coercion
      "3#carol#1995-04-15 12:30:00",
      "oops-not-a-long#dave#1995-01-01 00:00:00")) // structural corruption
    val df = GraftCsv.read(spark, dir, schema, delimiter = "#",
      timestampCols = Seq("ts"), cacheForAudit = true)
    assert(GraftCsv.badRecords(df).count() == 1)
    val good = GraftCsv.goodRecords(df)
    assert(good.count() == 3)
    val byId = good.select("id", "ts")
      .as[(Long, Option[java.sql.Timestamp])].collect().toMap
    assert(byId(1L).contains(java.sql.Timestamp.valueOf("1995-03-01 00:00:00")))
    assert(byId(2L).isEmpty, "malformed date must coerce to null, not fail")
    assert(byId(3L).contains(java.sql.Timestamp.valueOf("1995-04-15 12:30:00")))
  }

  test("reads CSVs out of ZIP archives with the same parse semantics, across entries and archives") {
    val dir = Files.createTempDirectory("graft_zip").toString
    def writeZip(name: String, entries: (String, Seq[String])*): Unit = {
      val zos = new java.util.zip.ZipOutputStream(
        new java.io.FileOutputStream(s"$dir/$name"))
      entries.foreach { case (entry, lines) =>
        zos.putNextEntry(new java.util.zip.ZipEntry(entry))
        zos.write(lines.mkString("\n").getBytes("UTF-8"))
        zos.closeEntry()
      }
      zos.close()
    }
    // two archives, one with two entries — the reference's monthly-ZIP layout
    writeZip("a.zip",
      "jan.csv" -> Seq("1#alice#1995-03-01 00:00:00", "2#bob#not-a-date"),
      "feb.csv" -> Seq("3#carol#1995-04-15 12:30:00"))
    writeZip("b.zip",
      "mar.csv" -> Seq("4#dave#1995-05-01 00:00:00",
        "oops-not-a-long#eve#1995-01-01 00:00:00"))
    val df = GraftCsv.readZip(spark, dir, schema, delimiter = "#",
      timestampCols = Seq("ts"), cacheForAudit = true)
    assert(GraftCsv.badRecords(df).count() == 1)
    val good = GraftCsv.goodRecords(df)
    assert(good.count() == 4)
    val byId = good.select("id", "ts")
      .as[(Long, Option[java.sql.Timestamp])].collect().toMap
    assert(byId.keySet == Set(1L, 2L, 3L, 4L))
    assert(byId(2L).isEmpty, "malformed date must coerce to null through the zip path")
    assert(byId(3L).contains(java.sql.Timestamp.valueOf("1995-04-15 12:30:00")))
  }
}
