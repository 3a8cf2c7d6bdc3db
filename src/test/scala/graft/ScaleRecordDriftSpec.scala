package graft

import org.scalatest.funsuite.AnyFunSuite

/** Staleness gate for the committed x-scale battery records, mirroring
  * what [[BenchRecordDriftSpec]] does for BENCH_FULL (r19 verdict #3):
  * the per-tag entry lists in `tools/scale_battery.sh` must match the
  * committed `BENCH_X100.json` / `BENCH_X1000.json` query sets EXACTLY,
  * so adding a scale-shaped entry to the battery without re-lapping and
  * re-promoting the record fails loudly — the failure mode r18 hit with
  * BENCH_FULL (a silently stale record cited as "the measured number"),
  * and which the r19 x-records themselves hit when the fold entries
  * joined the battery after the lap.
  */
class ScaleRecordDriftSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Parse a `NAME="..."` shell list (with line continuations) out of
    * the battery script — the script is the single source of truth for
    * what a battery lap runs, so the gate reads it rather than keeping
    * a second copy of the list here.
    */
  private def scriptList(name: String): Set[String] = {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("tools/scale_battery.sh")), "UTF-8")
    val re = (name + "=\"([^\"]+)\"").r
    val body = re.findFirstMatchIn(text)
      .getOrElse(fail(s"tools/scale_battery.sh no longer defines $name"))
      .group(1)
    body.replace("\\", " ").split("\\s+").filter(_.nonEmpty).toSet
  }

  private def recordQueries(path: String): Set[String] = {
    assert(new java.io.File(path).isFile,
      s"$path missing — run tools/scale_battery.sh and promote the record")
    val df = spark.read.json(path)
    df.schema.fields.find(_.name == "queries")
      .getOrElse(fail(s"$path has no top-level \"queries\" object"))
      .dataType match {
        case s: org.apache.spark.sql.types.StructType => s.fieldNames.toSet
        case other => fail(s"\"queries\" is ${other.typeName}, expected a struct")
      }
  }

  private def check(listName: String, record: String): Unit = {
    val battery = scriptList(listName)
    val recorded = recordQueries(record)
    val unlapped = (battery -- recorded).toSeq.sorted
    val stale = (recorded -- battery).toSeq.sorted
    assert(unlapped.isEmpty && stale.isEmpty,
      s"$record is stale vs $listName (${recorded.size} recorded vs " +
        s"${battery.size} in the script) — re-run tools/scale_battery.sh " +
        s"and promote the record. In battery but not lapped: " +
        s"${unlapped.mkString(", ")}; recorded but no longer in battery: " +
        s"${stale.mkString(", ")}")
    // Every battery name must still be a declared entry — a renamed
    // entry would otherwise fail only at the next battery run.
    val gone = (battery -- SparkEntry.queries.keySet).toSeq.sorted
    assert(gone.isEmpty,
      s"$listName names entries that no longer exist: ${gone.mkString(", ")}")
  }

  test("BENCH_X100.json matches the script's x100 battery exactly") {
    check("BATTERY_X100", "BENCH_X100.json")
  }

  test("BENCH_X1000.json matches the script's x1000 battery exactly") {
    check("BATTERY_X1000", "BENCH_X1000.json")
  }
}
