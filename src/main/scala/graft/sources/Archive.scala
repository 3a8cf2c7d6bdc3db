package graft.sources

import java.io.{BufferedReader, ByteArrayInputStream, InputStreamReader}
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.types.StructType

/** Archive import (reference: mapd-core/Archive/, Import/Importer.cpp —
  * the reference's COPY FROM transparently reads .gz/.bz2/.zip/.7z).
  * gz/bz2 are Hadoop codecs Spark resolves from the file extension
  * (q_csv_gzip / q_csv_bzip2); zip and 7z carry a central directory /
  * end-header, so they are WHOLE-ARCHIVE formats with no Hadoop codec —
  * this source reads them via `binaryFile` + the codecs already on
  * Spark's classpath (JDK `java.util.zip`; `commons-compress` + `xz`
  * for 7z/LZMA2 — both ship in /opt/spark/jars).
  *
  * Scale shape: ONE TASK PER ARCHIVE — exactly Spark's execution shape
  * for non-splittable codecs like gzip. A 100 TB import arrives as many
  * archive files (the CommonCrawl-style layout), so parallelism comes
  * from the archive COUNT; one archive must fit in an executor's task
  * memory (true by construction when archives are written at sane
  * sizes — the same constraint the reference's single-node unzip has).
  * A corrupt archive fails the import loudly (the reference importer
  * raises; silently dropping rows would be data loss).
  */
object Archive {

  /** Text lines of every regular-file entry in each archive matched by
    * `path` (glob ok). `dropHeaderLine` removes the first line of EVERY
    * entry — the per-file header semantic of Spark's own CSV reader.
    */
  def zipLines(spark: SparkSession, path: String,
      dropHeaderLine: Boolean): Dataset[String] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select("content").as[Array[Byte]]
      .flatMap(bytes => zipEntryLines(bytes, dropHeaderLine))
  }

  /** 7z twin of [[zipLines]] (commons-compress SevenZFile over an
    * in-memory channel; LZMA2 via the xz jar Spark ships). */
  def sevenZLines(spark: SparkSession, path: String,
      dropHeaderLine: Boolean): Dataset[String] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select("content").as[Array[Byte]]
      .flatMap(bytes => sevenZEntryLines(bytes, dropHeaderLine))
  }

  /** COPY FROM a .zip/.7z glob — distributed CSV parse of the archive
    * lines under an explicit schema (the reference importer's typed
    * column list; schema-on-read keeps the parse codegen'd and the scan
    * pruned, never a driver-side loop).
    */
  def csv(spark: SparkSession, path: String, schema: StructType,
      format: String, header: Boolean = true): DataFrame = {
    val lines = format match {
      case "zip" => zipLines(spark, path, dropHeaderLine = header)
      case "7z" => sevenZLines(spark, path, dropHeaderLine = header)
      case other => throw new IllegalArgumentException(
        s"Archive.csv: unsupported format '$other' (zip|7z; gz/bz2 ride " +
          "Spark's own codecs)")
    }
    spark.read.schema(schema).csv(lines)
  }

  /** Fixture/export twin: write `lines` as CSV text into one archive
    * PER PARTITION, each holding `entriesPerArchive` entries (multi-
    * entry archives are the case a reader must prove — a zip with one
    * entry is just gzip with ceremony). Executor-side writes to a
    * shared-filesystem `dir`; empty partitions write nothing. The
    * per-partition materialization is bounded by partition size — the
    * same eager-list discipline the multimodal codecs use so corruption
    * cannot escape the task's try/catch as a lazy read.
    */
  def writeArchives(lines: Dataset[String], dir: String, header: String,
      format: String, entriesPerArchive: Int = 2): Unit = {
    require(entriesPerArchive > 0, "entriesPerArchive must be positive")
    require(format == "zip" || format == "7z",
      s"writeArchives: unsupported format '$format'")
    lines.foreachPartition { (it: Iterator[String]) =>
      val rows = it.toVector
      if (rows.nonEmpty) {
        val chunks = {
          val per = math.max(1, (rows.size + entriesPerArchive - 1) / entriesPerArchive)
          rows.grouped(per).toVector
        }
        val stem = java.util.UUID.randomUUID().toString
        def entryBytes(chunk: Vector[String]): Array[Byte] =
          ((if (header.nonEmpty) header +: chunk else chunk)
            .mkString("", "\n", "\n")).getBytes(UTF_8)
        format match {
          case "zip" =>
            val zos = new java.util.zip.ZipOutputStream(
              java.nio.file.Files.newOutputStream(
                java.nio.file.Paths.get(dir, s"part-$stem.zip")), UTF_8)
            try {
              chunks.zipWithIndex.foreach { case (chunk, i) =>
                zos.putNextEntry(new java.util.zip.ZipEntry(s"chunk-$i.csv"))
                zos.write(entryBytes(chunk))
                zos.closeEntry()
              }
            } finally zos.close()
          case "7z" =>
            val out = new org.apache.commons.compress.archivers.sevenz.SevenZOutputFile(
              new java.io.File(dir, s"part-$stem.7z"))
            try {
              chunks.zipWithIndex.foreach { case (chunk, i) =>
                val e = new org.apache.commons.compress.archivers.sevenz.SevenZArchiveEntry()
                e.setName(s"chunk-$i.csv")
                e.setDirectory(false)
                out.putArchiveEntry(e)
                out.write(entryBytes(chunk))
                out.closeArchiveEntry()
              }
            } finally out.close()
        }
      }
    }
  }

  /** Eager per-archive unzip: entry boundaries come from
    * ZipInputStream's own -1-at-entry-end contract; the reader is NOT
    * closed per entry (that would close the whole stream). Bounded by
    * the archive's decompressed size, which the one-task-per-archive
    * contract already requires to fit in task memory.
    */
  private def zipEntryLines(bytes: Array[Byte], dropHeader: Boolean): Seq[String] = {
    val zis = new java.util.zip.ZipInputStream(new ByteArrayInputStream(bytes), UTF_8)
    val out = ArrayBuffer.empty[String]
    try {
      var e = zis.getNextEntry
      while (e != null) {
        if (!e.isDirectory) {
          val br = new BufferedReader(new InputStreamReader(zis, UTF_8))
          var first = true
          var line = br.readLine()
          while (line != null) {
            if (!(first && dropHeader)) out += line
            first = false
            line = br.readLine()
          }
        }
        e = zis.getNextEntry
      }
    } finally zis.close()
    out.toSeq
  }

  private def sevenZEntryLines(bytes: Array[Byte], dropHeader: Boolean): Seq[String] = {
    val sz = org.apache.commons.compress.archivers.sevenz.SevenZFile.builder()
      .setSeekableByteChannel(
        new org.apache.commons.compress.utils.SeekableInMemoryByteChannel(bytes))
      .get()
    val out = ArrayBuffer.empty[String]
    try {
      var e = sz.getNextEntry
      while (e != null) {
        if (!e.isDirectory) {
          val br = new BufferedReader(
            new InputStreamReader(sz.getInputStream(e), UTF_8))
          var first = true
          var line = br.readLine()
          while (line != null) {
            if (!(first && dropHeader)) out += line
            first = false
            line = br.readLine()
          }
        }
        e = sz.getNextEntry
      }
    } finally sz.close()
    out.toSeq
  }
}
