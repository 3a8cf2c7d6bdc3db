package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Archive

/** graft.sources.Archive — the .zip/.7z import surface (reference
  * mapd-core/Archive/): multi-entry archives, per-entry header
  * dropping, empty partitions, typed parse, and loud failure on a
  * corrupt archive.
  */
class ArchiveSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def roundTrip(format: String): Unit = {
    val dir = Queries.tempDir(s"arch_spec_$format")
    val df = (1 to 97).map(i => (i.toLong, s"name$i", i * 3)).toDF("id", "nm", "v")
      .repartition(5) // several archives, incl. multi-entry splits
    Archive.writeArchives(
      df.select(concat_ws(",", col("id"), col("nm"), col("v"))).as[String],
      dir, header = "id,nm,v", format = format, entriesPerArchive = 3)
    val files = new java.io.File(dir).listFiles()
    assert(files.nonEmpty && files.forall(_.getName.endsWith(s".$format")))
    val back = Archive.csv(spark, s"$dir/*.$format", df.schema, format = format)
    val got = back.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(got.toSeq == (1 to 97).map(i => (i.toLong, s"name$i", i * 3)))
  }

  test("zip: multi-archive multi-entry CSV round trip with per-entry headers") {
    roundTrip("zip")
  }

  test("7z: multi-archive multi-entry CSV round trip with per-entry headers") {
    roundTrip("7z")
  }

  test("empty partitions write no archive; empty input reads as empty") {
    val dir = Queries.tempDir("arch_spec_empty")
    Archive.writeArchives(
      spark.emptyDataset[String].repartition(3), dir, "h", format = "zip")
    assert(Option(new java.io.File(dir).listFiles()).forall(_.isEmpty))
    // A dir with no matching archives must not NPE downstream — guard the
    // caller's glob instead (binaryFile throws on an empty glob, which is
    // the loud behavior an import wants); here we check a one-archive,
    // one-EMPTY-ENTRY read yields zero rows rather than a phantom row.
    val zos = new java.util.zip.ZipOutputStream(
      java.nio.file.Files.newOutputStream(java.nio.file.Paths.get(dir, "e.zip")))
    zos.putNextEntry(new java.util.zip.ZipEntry("empty.csv"))
    zos.closeEntry(); zos.close()
    assert(Archive.zipLines(spark, s"$dir/*.zip", dropHeaderLine = true).count() == 0L)
  }

  test("corrupt archive fails the import loudly, not silently") {
    val dir = Queries.tempDir("arch_spec_corrupt")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "bad.7z"),
      Array.fill[Byte](64)(0x5a))
    val ex = intercept[Exception] {
      Archive.sevenZLines(spark, s"$dir/*.7z", dropHeaderLine = false).count()
    }
    assert(ex != null)
  }

  test("header line is dropped once per ENTRY, not once per archive") {
    val dir = Queries.tempDir("arch_spec_hdr")
    // One archive, two entries, each with its own header.
    Archive.writeArchives(
      Seq("1,a", "2,b", "3,c", "4,d").toDS.coalesce(1),
      dir, header = "id,s", format = "zip", entriesPerArchive = 2)
    val lines = Archive.zipLines(spark, s"$dir/*.zip", dropHeaderLine = true)
      .collect().sorted
    assert(lines.toSeq == Seq("1,a", "2,b", "3,c", "4,d"))
    val withHeaders = Archive.zipLines(spark, s"$dir/*.zip", dropHeaderLine = false)
      .collect()
    assert(withHeaders.count(_ == "id,s") == 2)
  }
}
