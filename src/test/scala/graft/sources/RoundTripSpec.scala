package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Source/sink breadth beyond the reference's CSV+Parquet: JSON and ORC
  * round-trips, parquet compression codecs, and schema-preserving CSV.
  * Each format must reproduce the exact rows it wrote.
  */
class RoundTripSpec extends SparkSpec {

  private lazy val sample = Tables.lineitem(spark, sf)
    .filter(col("l_orderkey") <= 1000)
    .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
      "l_returnflag", "l_shipdate")

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString + "/data"

  test("json round-trip preserves rows (timestamps via ISO strings)") {
    val path = tmp("json_rt")
    sample.write.mode("overwrite").json(path)
    val back = spark.read.schema(sample.schema).json(path)
    assertSameRows(sample, back)
  }

  test("orc round-trip preserves rows") {
    val path = tmp("orc_rt")
    sample.write.mode("overwrite").orc(path)
    assertSameRows(sample, spark.read.orc(path))
  }

  test("csv round-trip with explicit schema preserves rows") {
    val path = tmp("csv_rt")
    sample.write.mode("overwrite").option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS").csv(path)
    val back = spark.read.option("header", "true").schema(sample.schema)
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS").csv(path)
    assertSameRows(sample, back)
  }

  test("parquet codecs (snappy, zstd, gzip) all round-trip") {
    for (codec <- Seq("snappy", "zstd", "gzip")) {
      val path = tmp(s"parquet_$codec")
      sample.write.mode("overwrite").option("compression", codec).parquet(path)
      assertSameRows(sample, spark.read.parquet(path))
    }
  }
}
