package graft.planner

import graft.sketch.SketchGroup

import java.nio.file.{Files, Path, Paths}
import java.security.MessageDigest

/** Persisted sketch templates for unfiltered tables.
  *
  * The reference pre-builds sketches for tables without filters and serves
  * them from text side-files instead of rescanning (reference:
  * mapd-core/Catalog/Catalog.h:457-760 load/upload/saveSketches; file
  * format documented in sketch-templates/README.md; consumed by
  * findSketchTemplateAndCopy, FilterPushDownSketch.cpp:315-382).
  *
  * Here: one binary file per (table, join-column set, seed classes, dims)
  * under `dir`, written with the same codec the aggregation buffer uses.
  * The seed-class component matters — a template built under one join
  * equivalence class is NOT valid for a query that seeds the column
  * differently.
  *
  * At 100 TB this is the difference between a metadata read and a full
  * table scan per unfiltered dimension table, per query.
  */
final class SketchTemplateCache(dir: Path) {
  Files.createDirectories(dir)

  // Instrumentation (used by tests to assert the second run skips the
  // job). Atomic — sketch jobs update these concurrently; a plain
  // volatile += loses increments under contention.
  private val hitCount = new java.util.concurrent.atomic.AtomicLong(0)
  private val missCount = new java.util.concurrent.atomic.AtomicLong(0)
  def hits: Long = hitCount.get()
  def misses: Long = missCount.get()

  private val memory = scala.collection.concurrent.TrieMap.empty[String, SketchGroup]

  private def fileFor(key: String): Path = dir.resolve(s"sketch-$key.bin")

  private def cacheKey(
      table: String, columns: Seq[String], seedClasses: Seq[String],
      rows: Int, buckets: Int): String = {
    val raw = s"$table|${columns.mkString(",")}|${seedClasses.mkString(",")}|$rows|$buckets"
    MessageDigest.getInstance("SHA-256").digest(raw.getBytes("UTF-8"))
      .take(16).map("%02x".format(_)).mkString
  }

  /** Cached sketch if present (memory, then disk) — no build. Used to
    * learn a table's cardinality without a scan (the `count` of an
    * unfiltered template IS the table row count).
    */
  def peek(
      table: String, columns: Seq[String], seedClasses: Seq[String],
      rows: Int, buckets: Int): Option[SketchGroup] = {
    val key = cacheKey(table, columns, seedClasses, rows, buckets)
    memory.get(key).orElse {
      val f = fileFor(key)
      if (Files.exists(f)) {
        val g = SketchGroup.deserialize(Files.readAllBytes(f))
        memory.put(key, g)
        Some(g)
      } else None
    }
  }

  /** Serve from memory, then disk, else build and persist. */
  def getOrBuild(
      table: String, columns: Seq[String], seedClasses: Seq[String],
      rows: Int, buckets: Int)(build: => SketchGroup): SketchGroup = {
    val key = cacheKey(table, columns, seedClasses, rows, buckets)
    memory.get(key) match {
      case Some(g) => hitCount.incrementAndGet(); g
      case None =>
        val f = fileFor(key)
        if (Files.exists(f)) {
          val g = SketchGroup.deserialize(Files.readAllBytes(f))
          memory.put(key, g)
          hitCount.incrementAndGet()
          g
        } else {
          missCount.incrementAndGet()
          val g = build
          // Write-temp + atomic move: sketch jobs run concurrently, and two
          // instances of the same unfiltered table may build the same key —
          // a torn read of a half-written file must be impossible.
          val tmp = Files.createTempFile(dir, s"sketch-$key", ".tmp")
          try {
            Files.write(tmp, g.serialize())
            try Files.move(tmp, f,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
            catch {
              case _: java.nio.file.AtomicMoveNotSupportedException =>
                Files.move(tmp, f, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
            }
          } finally
            // A failed write/move (disk full, I/O error) must not strand
            // ~600KB .tmp orphans in the cache dir on every retry.
            Files.deleteIfExists(tmp): Unit
          memory.put(key, g)
          g
        }
    }
  }

  def clear(): Unit = {
    memory.clear()
    if (Files.exists(dir)) {
      val s = Files.list(dir)
      try s.forEach(p => Files.deleteIfExists(p)) finally s.close()
    }
    hitCount.set(0); missCount.set(0)
  }
}

object SketchTemplateCache {
  /** Default on-disk location (rebuildable — delete to force PRE_PROCESSING
    * behavior, reference COMPASS_init_variables.txt:6).
    */
  def default(): SketchTemplateCache =
    new SketchTemplateCache(Paths.get(
      sys.env.getOrElse("GRAFT_SKETCH_CACHE_DIR",
        sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft-sketch-templates")))
}
