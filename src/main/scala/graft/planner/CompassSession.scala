package graft.planner

import graft.enumerate.{Enumerator, GraphNode}
import graft.functions.FagmsSketchAgg
import graft.plans.{ExtractedJoinGraph, JoinGraphExtractor, TableInstance}
import graft.sketch.{SeedRegistry, SketchGroup}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Chosen join order plus the per-step size estimates, for EXPLAIN-style
  * introspection (mirrors the reference's stdout traces,
  * mapd-core/QueryEngine/RelAlgExecutor.cpp:2573-2600).
  */
final case class CompassPlan(
    order: Seq[String],
    intermediateEstimates: Seq[Double],
    sketchCounts: Map[String, Long],
    sketchBuildMillis: Long = 0,
    enumerateMillis: Long = 0) {

  /** Human-readable trace mirroring the reference's stdout ("optimal
    * plan: ... intermediate join size estimation of: ...").
    */
  def explainString: String = {
    val steps = order.indices.drop(1).dropRight(1).map { k =>
      val prefix = order.take(k + 1).mkString(" <> ")
      val est = intermediateEstimates.lift(k - 1).getOrElse(Double.NaN)
      f"  intermediate estimate of $prefix = $est%.1f"
    }
    (s"COMPASS plan: ${order.mkString(" -> ")}" +:
      s"  surviving rows: ${order.map(t => s"$t=${sketchCounts.getOrElse(t, -1L)}").mkString(", ")}" +:
      s"  planning: sketch build ${sketchBuildMillis}ms, enumeration ${enumerateMillis}ms" +:
      steps).mkString("\n")
  }
}

/** COMPASS for Spark: sketch-based join-order optimization as a driver-side
  * pre-planning phase.
  *
  * The reference executes per-table filters DURING optimization and builds
  * Fast-AGMS sketches on the survivors, then enumerates join orders by
  * sketch-estimated intermediate sizes (reference:
  * mapd-core/QueryEngine/FilterPushDownSketch.cpp:1376-1577). Catalyst
  * rules must stay pure, so the same idea lives here as a wrapper that runs
  * BEFORE optimization (SURVEY §4 "key architectural consequence"):
  *
  *  1. analyze the query → extract join graph + per-instance filters
  *     ([[JoinGraphExtractor]]);
  *  2. launch one small Spark job per instance: filtered scan →
  *     `fagms_sketch` aggregate (map-side partial sketches, linear merge —
  *     one shuffle-free pass however many executors);
  *  3. enumerate join orders driver-locally over the sketch planes
  *     ([[Enumerator]] — microseconds);
  *  4. splice a reordered left-deep Inner-join tree into the analyzed plan
  *     and hand it to vanilla Spark execution (Catalyst still does
  *     pushdown/pruning/codegen; AQE still handles skew).
  *
  * Scale note: at 100 TB the sketch jobs are the only extra cost — each is
  * a projection-pruned scan producing a ~600 KB/column sketch, and the
  * template cache ([[SketchTemplateCache]]) serves unfiltered tables
  * without any scan at all. Joins the optimizer cannot improve (non-inner,
  * no equi-edges, <3 tables) fall through untouched.
  *
  * Thresholds match the reference defaults
  * (Catalog/COMPASS_init_variables.txt:1-5).
  *
  * Concurrency contract: push-down caches are scoped per QUERY HANDLE
  * ([[QueryScope]]) — optimize() on a scope releases only THAT scope's
  * previous query's caches, so interleaved queries on one session never
  * unpin each other's: give each in-flight query stream its own
  * `newScope()`. The session's own optimize()/sql() run in a default
  * scope (the one-query-at-a-time convenience surface). Releasing is
  * never a correctness event — a released query's filtered scans just
  * recompute. The sketch jobs inside a single optimize() are themselves
  * parallel.
  */
final class CompassSession(
    val spark: SparkSession,
    sketchRows: Int = 73,
    sketchBuckets: Int = 1021,
    minTableSize: Long = 200, // PUSH_DOWN_MIN_TABLE_SIZE_SK
    // The reference caps materialization at min(rows·0.05, 10000); the
    // fractional term needs the base cardinality (a second count), and for
    // every table past 200k rows the absolute 10k cap binds anyway
    // (COMPASS_init_variables.txt:4-5) — so only the absolute cap applies.
    maxPushDownSize: Long = 10000, // PUSH_DOWN_MAX_SIZE
    // Hint threshold is rows-surviving (bytes unknown pre-projection);
    // 100k rows of pruned join columns is comfortably under executor
    // broadcast budgets, while anything larger is left to AQE's own
    // size-based decision.
    broadcastRowLimit: Long = 100000,
    templateCache: Option[SketchTemplateCache] = None,
    // Wall-time policy (r12 verdict): when every instance except at most
    // one sits under spark.sql.autoBroadcastJoinThreshold, Catalyst
    // compiles ANY join order into the same shuffle-free chain of
    // broadcast hash joins streaming the single big side — the order
    // cannot change which side streams, so the sketch jobs + splice buy
    // nothing and only add planning overhead (measured at sf0.1: the
    // COMPASS spine ran SLOWER than naive in ~half the quality families
    // for exactly this reason). OFF by default: the differential entries
    // exist to exercise the COMPASS path at toy scale where everything
    // is broadcastable; a production session at data scale turns it on
    // to skip the regime where order provably doesn't matter.
    skipWhenAllBroadcastable: Boolean = false,
    // Seed-ensemble experiments (ESTIMATES §8) build K sessions with
    // distinct bases for K independent sketch seed-sets. Non-default
    // bases must not share a template cache: cache keys carry seed
    // CLASS names, not seed values, so two bases would collide and
    // serve wrong-seed sketches.
    seedBase: Long = CompassSession.DefaultSeedBase) {
  require(seedBase == CompassSession.DefaultSeedBase || templateCache.isEmpty,
    "a non-default seedBase cannot share the template cache " +
      "(keys carry seed classes, not seed values)")

  // Config contract: Catalyst must not re-reorder the spliced spine.
  // Two logical rules could override the enumerator's choice —
  // CostBasedJoinReorder (spark.sql.cbo.joinReorder.enabled) and the
  // star-schema heuristic inside ReorderJoin
  // (spark.sql.optimizer.starSchemaDetection). Both default to false;
  // pinning them here makes the contract hold even on a session where a
  // user enabled them. Plain ReorderJoin preserves a spine whose every
  // join carries a condition (it only pulls conditioned joins ahead of
  // condition-less ones), and AQE's re-optimizer rule list contains no
  // join reordering — both facts are executed-plan-asserted by
  // CompassOrderGuardSpec, including the deliberate-Cross disconnected
  // shape.
  spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
  spark.conf.set("spark.sql.optimizer.starSchemaDetection", "false")

  /** Last-completed optimize() wins — introspection only (explain traces,
    * quality harness); concurrent scopes wanting their own trace read it
    * immediately after their optimize() returns or synchronize externally.
    */
  @volatile var lastPlan: Option[CompassPlan] = None

  /** Session-lifetime memo for FILTERED-instance sketches, keyed by
    * (resolved data identity, canonicalized filtered plan, join columns,
    * seed classes, dims). A workload run (e.g. one query per JOB family)
    * filters the same table with the same predicate set many times —
    * `cn.country_code = '[us]'`, `it.info = 'top 250 rank'` recur across
    * families — and each repeat paid a full sketch job. Same data + same
    * filter semantics + same seeds ⇒ byte-identical sketch, so sharing is
    * lossless. The memo is in-flight-deduplicated: 16 concurrent
    * optimize() threads hitting one key build once, the rest await the
    * same future. A failed build is REMOVED so later queries retry
    * rather than inherit the failure.
    *
    * When a [[SketchTemplateCache]] is configured, built filtered
    * sketches additionally spill to its capped disk tier
    * (`storeFiltered`) keyed by the same canonical key, and a memory
    * miss consults disk before building — so a COLD session with a warm
    * cache dir pays file reads, not sketch jobs (the reference persists
    * its templates across sessions the same way,
    * Catalog/Catalog.h:579-731; r12 measured the cold filtered path at
    * ~50% of per-query time on the JOB subset).
    *
    * Invalidation rides on the templateId component: it snapshots data
    * location + mtime, so a rewritten table changes every key.
    */
  private val filteredMemo = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.CompletableFuture[graft.sketch.SketchGroup]]()
  private val filteredHitCount = new java.util.concurrent.atomic.AtomicLong(0)
  private val filteredMissCount = new java.util.concurrent.atomic.AtomicLong(0)
  private val filteredDiskHitCount = new java.util.concurrent.atomic.AtomicLong(0)
  /** Test hooks: memo effectiveness across a workload run. `filteredMisses`
    * counts sketch JOBS actually run (a disk hit is not a miss — no job).
    */
  private[graft] def filteredHits: Long = filteredHitCount.get()
  private[graft] def filteredMisses: Long = filteredMissCount.get()
  private[graft] def filteredDiskHits: Long = filteredDiskHitCount.get()

  private def memoizedFiltered(key: String)(build: => SketchGroup): SketchGroup = {
    while (true) {
      // Bound driver memory for long-lived sessions over many distinct
      // filters (each group is O(rows·buckets·cols) ints): coarse full-clear
      // at the cap — waiters on evicted in-flight futures still complete
      // (they hold their own reference); subsequent queries just rebuild.
      if (filteredMemo.size >= 512) filteredMemo.clear()
      val mine = new java.util.concurrent.CompletableFuture[SketchGroup]()
      val existing = filteredMemo.putIfAbsent(key, mine)
      if (existing == null) {
        try {
          val g = templateCache.flatMap(_.loadFiltered(key)) match {
            case Some(fromDisk) =>
              filteredDiskHitCount.incrementAndGet()
              fromDisk
            case None =>
              filteredMissCount.incrementAndGet()
              val built = build
              // The disk tier is best-effort end to end: a cache-dir write
              // failure (disk full, read-only dir) must not discard the
              // sketch we just built — degrade to memory-memo-only.
              try templateCache.foreach(_.storeFiltered(key, built))
              catch { case scala.util.control.NonFatal(_) => }
              built
          }
          mine.complete(g); return g
        }
        catch { case e: Throwable =>
          filteredMemo.remove(key, mine)
          mine.completeExceptionally(e)
          throw e
        }
      } else {
        // A waiter whose builder fails must not inherit that unrelated
        // query's exception: the owner removed the failed entry, so loop
        // and build (or await the next builder) fresh — the documented
        // retry-on-failure guarantee, now held for concurrent waiters too.
        try { val g = existing.get(); filteredHitCount.incrementAndGet(); return g }
        catch { case _: java.util.concurrent.ExecutionException =>
          filteredMemo.remove(key, existing): Unit
        }
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** `\fpd`-style toggle (reference: mapd-core/SQLFrontend/mapdql.cpp:1313). */
  @volatile var fpdEnabled: Boolean = true

  /** One in-flight optimized query's cache scope. Filtered-instance
    * push-down caches pin under the scope that ran the optimize(); the
    * scope's NEXT optimize() (or `release()`/session `close()`) unpins
    * them — r2 kept selective survivors persisted forever (the reference
    * frees its temporary push-down tables per query —
    * RelAlgExecutor.h:121-133), and r6's single session-wide buffer let
    * any optimize() unpin caches an interleaved query on the same
    * session was still reading.
    */
  final class QueryScope private[CompassSession] () {
    private[CompassSession] val kept = scala.collection.mutable.Buffer.empty[DataFrame]

    /** This scope's own last COMPASS plan — unlike the session-level
      * `lastPlan`, safe to read under concurrent scopes (each in-flight
      * query stream sees exactly its own trace).
      */
    @volatile var lastPlan: Option[CompassPlan] = None

    /** Unpersist this scope's pinned caches. A previously returned
      * DataFrame stays CORRECT afterwards — it just recomputes its
      * filtered scans if re-run.
      */
    def release(): Unit = kept.synchronized {
      kept.foreach(_.unpersist(false))
      kept.clear()
    }

    def optimize(df: DataFrame): DataFrame =
      CompassSession.this.optimizeIn(this, df)

    def sql(text: String): DataFrame = optimize(spark.sql(text))

    /** Test hook: caches currently pinned by this scope's last query. */
    private[graft] def pinned: Seq[DataFrame] = kept.synchronized(kept.toSeq)
  }

  private val scopes = scala.collection.mutable.Buffer.empty[QueryScope]

  /** A fresh cache scope — one per concurrently in-flight query stream. */
  def newScope(): QueryScope = scopes.synchronized {
    val s = new QueryScope
    scopes += s
    s
  }

  /** Release a scope's caches and forget it — for short-lived per-query
    * scopes (a long-running session spawning one scope per query would
    * otherwise grow the scope registry without bound).
    */
  def dropScope(s: QueryScope): Unit = {
    s.release()
    scopes.synchronized { scopes -= s; () }
  }

  private val defaultScope = newScope()

  /** Unpersist every scope's push-down caches. */
  def releaseCaches(): Unit =
    scopes.synchronized(scopes.toSeq).foreach(_.release())

  def close(): Unit = { releaseCaches(); filteredMemo.clear() }

  /** Test hook: push-down caches currently pinned by any scope. */
  private[graft] def pinnedCaches: Seq[DataFrame] =
    scopes.synchronized(scopes.toSeq).flatMap(_.pinned)

  def sql(text: String): DataFrame = optimize(spark.sql(text))

  /** Reorder the query's inner-join region by sketch estimates; returns the
    * input unchanged when the shape is not optimizable. Runs in the
    * session's default scope — interleaved callers use [[newScope]].
    */
  def optimize(df: DataFrame): DataFrame = optimizeIn(defaultScope, df)

  /** A/B introspection support (r13 verdict #5): extract the query's
    * join graph and build ONE sketch set for it, returning the raw
    * (graph, nodes, edges) so a harness can construct Enumerators under
    * several estimator modes over the SAME nodes — isolating the
    * estimator as the only variable. The sketch groups are driver-local
    * arrays and stay valid after the build scope is dropped.
    */
  private[graft] def sketchGraph(df: DataFrame): (ExtractedJoinGraph,
      IndexedSeq[GraphNode], Seq[((Int, String), (Int, String))]) = {
    val analyzed = df.queryExecution.analyzed
    val (g, _) = JoinGraphExtractor.extract(analyzed)
      .getOrElse(sys.error("sketchGraph: not an optimizable join region"))
    val scope = newScope()
    try (g, buildSketches(g, scope), enumeratorEdges(g))
    finally dropScope(scope)
  }

  /** True when at most ONE instance's UNFILTERED base relation is over
    * the session's autoBroadcastJoinThreshold (stats-based, the same
    * sizeInBytes Catalyst's broadcast decision reads — filters only
    * shrink, so "unfiltered under threshold" is conservative-safe).
    * Checked BEFORE any sketch job so the skip saves the whole pre-pass,
    * not just the splice. A disabled threshold (<= 0) never skips.
    */
  private def allButOneBroadcastable(g: ExtractedJoinGraph): Boolean = {
    val threshold = Bridge.autoBroadcastThreshold(spark)
    threshold > 0 && g.instances.count(i =>
      Bridge.sizeInBytes(i.plan) > BigInt(threshold)) <= 1
  }

  private def optimizeIn(scope: QueryScope, df: DataFrame): DataFrame = {
    if (!fpdEnabled) return df
    scope.release()
    scope.lastPlan = None
    try {
      val analyzed = df.queryExecution.analyzed
      JoinGraphExtractor.extract(analyzed) match {
        case Some((g, _)) if skipWhenAllBroadcastable &&
            g.instances.size >= 3 && allButOneBroadcastable(g) =>
          // Order provably can't matter (see the constructor flag's doc):
          // leave the plan untouched — no sketch jobs, no splice. lastPlan
          // stays None, honestly reporting "did not take the COMPASS
          // path" to the quality harness.
          df
        case Some((g, rebuild)) if g.instances.size >= 3 =>
          // Timing mirrors the reference's per-phase instrumentation
          // (FilterPushDownSketch.cpp:1564-1569, RelAlgExecutor.cpp:2628).
          val t0 = System.nanoTime()
          val nodes = buildSketches(g, scope)
          val t1 = System.nanoTime()
          val en = new Enumerator(nodes, enumeratorEdges(g))
          val (order, _) = en.optimalOrder()
          val t2 = System.nanoTime()
          // Splice FIRST, then publish lastPlan: if the splice throws, the
          // catch below returns the vanilla plan, and a pre-assigned
          // lastPlan would advertise a COMPASS plan that never ran
          // (OptimizerQuality.compare trusts lastPlan to mean "took the
          // COMPASS path").
          val spliced = Bridge.ofRows(spark, rebuild(rebuildRegion(g, order, nodes)))
          // Estimates here are introspection only — a failure (e.g. a
          // multi-way prefix with a fully disconnected member under the
          // fallback order) must not knock the query off the COMPASS path.
          val published = CompassPlan(
            order.map(i => g.instances(i).name),
            order.indices.drop(1).dropRight(1).map(k =>
              scala.util.Try(en.estimate(order.take(k + 1))).getOrElse(Double.NaN)),
            nodes.map(n => g.instances(n.id).name -> n.sketch.count).toMap,
            sketchBuildMillis = (t1 - t0) / 1000000,
            enumerateMillis = (t2 - t1) / 1000000)
          scope.lastPlan = Some(published)
          lastPlan = Some(published)
          spliced
        case _ => df
      }
    } catch {
      // An optimizer must never break a runnable query: any failure in
      // extraction, sketch jobs, or splicing falls back to the vanilla
      // plan (the reference likewise guards the push-down pass and
      // reverts on failure, FilterPushDownSketch.cpp:273-284).
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[compass] falling back to vanilla plan: ${e.getMessage}")
        df
    }
  }

  /** PRE_PROCESSING analogue (reference: `PRE_PROCESSING`,
    * Catalog/COMPASS_init_variables.txt:6 — pre-build ALL unfiltered
    * (table × join-column-set) sketch templates before the workload runs):
    * extract each representative query's join graph and build/persist the
    * template for every unfiltered instance, so the first live query pays
    * zero template builds (`templateCache.misses == 0`, spec-asserted).
    *
    * Passing workload QUERIES (not (table, columns) tuples) guarantees the
    * cache keys — resolved data identity, join-column order, seed classes —
    * are constructed by exactly the machinery the live path uses. Filtered
    * instances are skipped: templates only ever serve unfiltered scans.
    * Returns the number of templates now warm. No push-down caches are
    * pinned.
    */
  def warmTemplates(workload: Seq[DataFrame]): Int = {
    val cache = templateCache.getOrElse(return 0)
    var warmed = 0
    workload.foreach { df =>
      JoinGraphExtractor.extract(df.queryExecution.analyzed).foreach { case (g, _) =>
        val reg = new SeedRegistry(sketchRows, seedBase)
        g.edges.foreach { case ((ia, a), (ib, b)) =>
          reg.addPredicate(seedKey(g, ia, a), seedKey(g, ib, b))
        }
        val jobs: IndexedSeq[() => Int] = g.instances.flatMap { inst =>
          val hasFilter = g.instanceFilters.get(inst.idx).exists(_.nonEmpty)
          val tk = JoinGraphExtractor.templateId(inst.plan)
          if (hasFilter || tk.isEmpty) None
          else {
            // Seed resolution OUTSIDE the thunk: awaitAll runs thunks on
            // pool threads and SeedRegistry mutates (same invariant as
            // buildSketches — "seed resolution stays sequential").
            val attrs = g.joinAttrs(inst.idx)
            val seeds = attrs.map(a => reg.seedsFor(seedKey(g, inst.idx, a)))
            val colNames = attrs.map(a => label(g, inst.idx, a))
            val classKeys = attrs.map(a => reg.classKey(seedKey(g, inst.idx, a)))
            Some { () =>
              cache.getOrBuild(tk.get, colNames, classKeys, sketchRows, sketchBuckets) {
                val agg = FagmsSketchAgg(
                  attrs.map(keyExpr), sketchRows, sketchBuckets, colNames, seeds)
                SketchGroup.deserialize(
                  Bridge.ofRows(spark, inst.plan)
                    .agg(Bridge.column(agg.toAggregateExpression()))
                    .head().getAs[Array[Byte]](0))
              }
              1
            }
          }
        }.toIndexedSeq
        warmed += CompassSession.awaitAll(jobs).sum
      }
    }
    warmed
  }

  /** Column label: plain name — unique within a base-table instance, and
    * STABLE across queries (no exprIds), so seed equivalence classes and
    * template-cache keys agree between any two queries joining the same
    * columns. This mirrors the reference's workload-global persisted seed
    * templates (sketch_templates_seeds.txt): same column pair → same
    * seeds, always.
    *
    * A DERIVED leaf (e.g. a pinned outer join kept opaque) can output two
    * join attributes with the SAME name; plain names would collapse them —
    * SketchGroup.columnIndex would return one plane for both and their
    * seed classes would wrongly unify. Colliding names get an exprId
    * disambiguator; such instances are never template-cached (templateId
    * is None for derived leaves), so key stability is unaffected.
    */
  private def label(g: ExtractedJoinGraph, idx: Int, a: Attribute): String = {
    val siblings = g.joinAttrs(idx)
    if (siblings.count(_.name == a.name) > 1) s"${a.name}#${a.exprId.id}"
    else a.name
  }

  /** Seed-registry key: (instance NAME, column label) — name-based so the
    * class representative (hence seeds and cache keys) is query-shape
    * independent (label falls back to exprId only for intra-instance
    * name collisions on derived leaves).
    */
  private def seedKey(g: ExtractedJoinGraph, idx: Int, a: Attribute): (String, String) =
    (g.instances(idx).name, label(g, idx, a))

  private def enumeratorEdges(g: ExtractedJoinGraph): Seq[((Int, String), (Int, String))] =
    g.edges.map { case ((ia, a), (ib, b)) =>
      ((ia, label(g, ia, a)), (ib, label(g, ib, b)))
    }

  /** Sketch key expression: integral → long (equality-preserving fold);
    * anything else — DATE (Spark refuses date→bigint at analysis, so the
    * r2 date branch silently disabled COMPASS for date keys), TIMESTAMP
    * (casting to long truncates to SECONDS — sub-second-distinct keys
    * would collapse to one sketch key and inflate estimates), strings,
    * decimals → xxhash64 (the reference joins on dictionary-encoded
    * integer ids — mapd-core/StringDictionary/ — a 64-bit hash preserves
    * equality semantics the same way, with negligible collision mass).
    */
  private def keyExpr(a: Attribute): Expression = a.dataType match {
    case LongType => a
    case IntegerType | ShortType | ByteType => Cast(a, LongType)
    case _ => new XxHash64(Seq(a))
  }

  /** Instance subtree with its own filter conjuncts applied (the "pushed
    * down selection" — reference FilterPushDownSketch.cpp:199-231 splices
    * RelFilter+RelCompound; here a Filter node Catalyst will push into the
    * scan). Shared implementation lives on the companion.
    */
  private def filteredPlan(g: ExtractedJoinGraph, i: Int): LogicalPlan =
    CompassSession.filteredPlan(g, i)

  /** One sketch job per instance: filtered scan → fagms_sketch over its
    * join columns (reference: executeFilterAndEvaluate,
    * FilterPushDownSketch.cpp:871-891). Unfiltered instances are served
    * from the template cache when available (reference:
    * findSketchTemplateAndCopy, FilterPushDownSketch.cpp:315-382).
    *
    * The per-instance jobs are INDEPENDENT Spark jobs, so they launch
    * concurrently (the reference builds sequentially; on a cluster the
    * projection-pruned scans overlap across executors, and locally the
    * per-job scheduling overhead stops being × nInstances). Seed
    * resolution stays sequential — SeedRegistry mutates.
    */
  private def buildSketches(g: ExtractedJoinGraph, scope: QueryScope): IndexedSeq[GraphNode] = {
    val reg = new SeedRegistry(sketchRows, seedBase)
    g.edges.foreach { case ((ia, a), (ib, b)) =>
      reg.addPredicate(seedKey(g, ia, a), seedKey(g, ib, b))
    }
    val jobs = g.instances.map { inst =>
      val attrs = g.joinAttrs(inst.idx)
      val seeds = attrs.map(a => reg.seedsFor(seedKey(g, inst.idx, a)))
      val colNames = attrs.map(a => label(g, inst.idx, a))
      val hasFilter = g.instanceFilters.get(inst.idx).exists(_.nonEmpty)
      val seedClassKeys = attrs.map(a => reg.classKey(seedKey(g, inst.idx, a)))
      // Templates are keyed by the RESOLVED base relation (data location +
      // mtime snapshot), never the instance alias: two different relations
      // aliased identically must not share a cache slot, and the same
      // table name over different directories/scale factors must not serve
      // a stale sketch. Derived/local relations get no template (and no
      // filtered-memo entry — dataId is the data-identity component of
      // both keys).
      // lazy: templateId stats the data location (files + mtime); the
      // unfiltered/no-template-cache path never consumes it and must not
      // pay the filesystem round-trip per instance.
      lazy val dataId: Option[String] = JoinGraphExtractor.templateId(inst.plan)
      lazy val templateKey: Option[String] =
        if (templateCache.isDefined) dataId else None

      // Tiny-table shortcut: if the template cache already knows this
      // table (template count == table cardinality) and it is below
      // PUSH_DOWN_MIN_TABLE_SIZE_SK, skip the filtered sketch job and use
      // the template — the filter can't meaningfully shrink a table that
      // small (reference: FilterPushDownSketch.cpp:154-198).
      val tinyTemplate: Option[SketchGroup] =
        if (hasFilter) templateKey.flatMap(tk => templateCache.flatMap(
          _.peek(tk, colNames, seedClassKeys, sketchRows, sketchBuckets)
            .filter(_.count < minTableSize)))
        else None

      def build(): SketchGroup = {
        val df = Bridge.ofRows(spark, filteredPlan(g, inst.idx))
        val agg = FagmsSketchAgg(
          attrs.map(keyExpr), sketchRows, sketchBuckets, colNames, seeds)
        val bytes = df.agg(Bridge.column(agg.toAggregateExpression()))
          .head().getAs[Array[Byte]](0)
        SketchGroup.deserialize(bytes)
      }

      () => {
        val sketch = tinyTemplate.getOrElse((templateCache, hasFilter) match {
          case (Some(cache), false) if templateKey.isDefined =>
            cache.getOrBuild(templateKey.get, colNames, seedClassKeys, sketchRows, sketchBuckets)(build())
          case (_, true) if dataId.isDefined =>
            // Canonicalized filtered plan: exprIds normalize to output
            // ordinals, so the same predicate set over the same relation
            // keys identically from any query; a conservative mismatch
            // just rebuilds (never serves a wrong sketch).
            val key = Seq(dataId.get,
              CompassSession.filteredPlan(g, inst.idx).canonicalized.toString,
              colNames.mkString(","), seedClassKeys.mkString(","),
              sketchRows.toString, sketchBuckets.toString).mkString("|")
            memoizedFiltered(key)(build())
          case _ => build()
        })
        // Materialized push-down, decided AFTER the survivor count is
        // known (fpd_max_count cap — reference: executeFilterAndEvaluate,
        // FilterPushDownSketch.cpp:871-891): only selective survivors are
        // persisted, pinned for THIS query and released at the next
        // optimize()/close(). Deferring the persist (r3 change) keeps the
        // sketch job's scan projection-pruned to the join columns and
        // never materializes an unselective filtered fact table into the
        // block manager just to drop it — at 100 TB that write could be
        // terabytes. The main query's spliced Filter(instance) matches
        // the cached plan canonically and materializes it (one extra
        // small-output pruned scan) on first use.
        if (hasFilter && tinyTemplate.isEmpty && sketch.count <= maxPushDownSize) {
          val df = Bridge.ofRows(spark, filteredPlan(g, inst.idx))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          scope.kept.synchronized { scope.kept += df }
        }
        GraphNode(inst.idx, sketch)
      }
    }
    CompassSession.awaitAll(jobs)
  }

  /** Left-deep Inner join tree in the enumerated order. Each appended
    * instance joins the prefix on ALL applicable equi-edges; residual
    * conjuncts land in a top Filter; instances whose surviving count is
    * small get a broadcast hint (sketch counts double as runtime stats —
    * the Spark analogue of keeping the reference's materialized push-down
    * result as the hash-table build side).
    */
  private def rebuildRegion(
      g: ExtractedJoinGraph, order: Seq[Int], nodes: IndexedSeq[GraphNode]): LogicalPlan = {
    val countOf: Map[Int, Long] = nodes.map(n => n.id -> n.sketch.count).toMap

    def base(i: Int, withHint: Boolean): LogicalPlan = {
      val p = filteredPlan(g, i)
      if (withHint && countOf.get(i).exists(c => c > 0 && c <= broadcastRowLimit))
        ResolvedHint(p, HintInfo(strategy = Some(BROADCAST)))
      else p
    }

    val (tree, remaining) = CompassSession.spliceLeftDeep(g, order, base)
    // Edges between nodes both already placed before either existed can't
    // occur (connected order), but keep any stragglers as filters.
    val leftovers = remaining.map { case ((_, a), (_, b)) => EqualTo(a, b): Expression }
    val post = g.residual ++ leftovers
    if (post.nonEmpty) Filter(post.reduce(And), tree) else tree
  }
}

object CompassSession {
  /** The shipping SeedRegistry base (its constructor default). */
  val DefaultSeedBase: Long = 0x5EEDC0DEL

  /** The left-deep splice core, shared by rebuildRegion and
    * OptimizerQuality's prefix measurement so the quality harness always
    * measures exactly the plan shape COMPASS executes: each appended
    * instance joins the prefix on ALL applicable equi-edges (Cross when
    * none). Returns the tree and the edges not yet consumed.
    * `base(i, withHint)` supplies each instance's subtree (withHint=false
    * only for the very first instance).
    */
  private[planner] def spliceLeftDeep(
      g: ExtractedJoinGraph, order: Seq[Int],
      base: (Int, Boolean) => LogicalPlan)
      : (LogicalPlan, Seq[((Int, Attribute), (Int, Attribute))]) = {
    var remaining = g.edges
    var placed = Set(order.head)
    var tree = base(order.head, false)
    order.tail.foreach { i =>
      val (applicable, rest) = remaining.partition {
        case ((ia, _), (ib, _)) =>
          (ia == i && placed.contains(ib)) || (ib == i && placed.contains(ia))
      }
      remaining = rest
      val cond = applicable
        .map { case ((_, a), (_, b)) => EqualTo(a, b): Expression }
        .reduceOption(And)
      tree = Join(tree, base(i, true),
        if (cond.isEmpty) Cross else Inner, cond, JoinHint.NONE)
      placed += i
    }
    (tree, remaining)
  }

  /** Instance subtree with its single-instance filter conjuncts applied —
    * shared with OptimizerQuality for the same no-drift reason.
    */
  private[planner] def filteredPlan(g: ExtractedJoinGraph, i: Int): LogicalPlan =
    g.instanceFilters.get(i).filter(_.nonEmpty) match {
      case Some(fs) => Filter(fs.reduce(And), g.instances(i).plan)
      case None => g.instances(i).plan
    }

  // Shared pool for concurrent sketch jobs. Spark job submission is
  // thread-safe; 8 in-flight jobs is plenty (a query rarely has more
  // instances) without starving the main query's own scheduling.
  private lazy val sketchPool: java.util.concurrent.ExecutorService =
    java.util.concurrent.Executors.newFixedThreadPool(
      8,
      (r: Runnable) => {
        val t = new Thread(r, "compass-sketch")
        t.setDaemon(true)
        t
      })

  /** Run independent sketch-job thunks concurrently, preserving order; the
    * first failure propagates (optimize() then falls back to the vanilla
    * plan).
    */
  private[planner] def awaitAll[A](jobs: IndexedSeq[() => A]): IndexedSeq[A] = {
    if (jobs.lengthCompare(1) <= 0) return jobs.map(_.apply())
    val futures = jobs.map(j =>
      sketchPool.submit(new java.util.concurrent.Callable[A] {
        override def call(): A = j()
      }))
    try futures.map(_.get())
    catch {
      case e: java.util.concurrent.ExecutionException =>
        futures.foreach(_.cancel(true))
        throw Option(e.getCause).getOrElse(e)
    }
  }
}
