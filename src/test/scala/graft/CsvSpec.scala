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
}
