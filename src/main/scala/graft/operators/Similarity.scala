package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`). Two paths:
  *
  *  - [[bruteForceTopK]]: exact cosine top-k of a SMALL query set against
  *    the corpus — broadcast the queries, one pass over the corpus, window
  *    top-k. The baseline and the exact re-ranker.
  *  - [[lshTopK]]: random-hyperplane LSH — `tables` independent signatures
  *    of `bits` sign-bits each; candidates share a (table, signature)
  *    bucket, then exact cosine re-rank within candidates. The scale path:
  *    the corpus-side join key is a 32-bit bucket id, so the shuffle is
  *    (corpus rows × tables) small tuples, never a cross join.
  *
  * Dot products are the native codegen [[graft.functions.VectorDot]]
  * expression (compiled when evaluated in a plain projection; interpreted
  * when it sits inside a higher-order-function lambda, which are
  * CodegenFallback); norms are computed once per side.
  */
object Similarity {

  /** Σ aᵢ·bᵢ in double precision — a native codegen Expression
    * ([[graft.functions.VectorDot]]), bit-identical to the
    * aggregate/zip_with higher-order formula but compiled into the
    * enclosing WholeStageCodegen span instead of interpreted per element.
    */
  def dot(a: Column, b: Column): Column = graft.functions.VectorOps.dot(a, b)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** Exact top-k neighbors for each row of `queries` (small, broadcast)
    * within `corpus`. Output: (query id, neighbor id, rank, cosine).
    *
    * `rankRounded` ranks by the 6-dp-rounded cosine (then neighbor id)
    * instead of the raw value — required when the ranking must agree
    * exactly with another engine computing the same cosines at slightly
    * different floating-point precision (the DuckDB differential oracle).
    */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int = 5, rankRounded: Boolean = false): DataFrame = {
    val q = broadcast(queries.select(
      col(idCol).as("query_id"), col(vecCol).as("qv")))
    val c = TextAnalysis.widened(corpus)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val rawCos = cosine(col("qv"), col("cv"))
    val scored = c.crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", if (rankRounded) round(rawCos, 6) else rawCos)
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("cos"), 6).as("cos"))
  }

  /** Deterministic random hyperplanes: `tables` × `bits` × `dim` doubles. */
  private[graft] def hyperplanes(dim: Int, bits: Int, tables: Int, seed: Long): Array[Array[Array[Double]]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(tables, bits, dim)(rng.nextGaussian())
  }

  /** (table, bucket) signature rows for every corpus vector. Bucket id =
    * sign-bit pattern of the hyperplane dot products, all tables computed
    * in ONE compiled kernel pass over the vector
    * ([[graft.functions.VecKernel.lshSigs]] — the per-plane expression
    * formulation, kept as the spec twin in [[lshBucketsHof]], built
    * tables x bits separate dots, each re-reading the vector and bloating
    * the generated code). NULL vectors produce no bucket rows (the HOF
    * twin bucketed them into bucket 0 of every table — a manufactured
    * mega-bucket at corpus scale).
    */
  def lshBuckets(
      df: DataFrame, idCol: String, vecCol: String,
      bits: Int = 12, tables: Int = 4, dim: Int = 64,
      seed: Long = 0xA5CE11L): DataFrame = {
    val planes = hyperplanes(dim, bits, tables, seed)
    val flat: Array[Double] = planes.flatten.flatten
    // Widen: signature work is tables × bits × dim FMAs per row —
    // spread a possibly-single-partition input across cores. Persist:
    // self-joins read this relation twice; tracked so harnesses release
    // it after the query's action.
    OpCaches.track(
      TextAnalysis.widened(df)
        .select(col(idCol), col(vecCol),
          posexplode(graft.functions.VectorOps.lshSigs(
            col(vecCol), flat, tables, bits, dim)))
        .select(col(idCol), col(vecCol),
          col("pos").as("tbl"), col("col").as("bucket"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
  }

  /** The per-plane expression formulation [[lshBuckets]] compiles — the
    * independently-derived spec twin (bit-identity on non-null vectors
    * enforced in SimilaritySpec).
    */
  private[graft] def lshBucketsHof(
      df: DataFrame, idCol: String, vecCol: String,
      bits: Int, tables: Int, dim: Int,
      seed: Long = 0xA5CE11L): DataFrame = {
    val planes = hyperplanes(dim, bits, tables, seed)
    val sigCols: Seq[Column] = planes.zipWithIndex.map { case (tbl, t) =>
      val bucket = tbl.zipWithIndex.map { case (plane, j) =>
        val planeCol = typedlit(plane.toSeq)
        when(dot(col(vecCol), planeCol) >= 0, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
      struct(lit(t).as("tbl"), bucket.as("bucket"))
    }.toSeq
    df.select(col(idCol), col(vecCol), explode(array(sigCols: _*)).as("sig"))
      .select(col(idCol), col(vecCol),
        col("sig.tbl").as("tbl"), col("sig.bucket").as("bucket"))
  }

  /** ANN top-k: LSH candidate generation + exact cosine re-rank.
    * Output schema matches [[bruteForceTopK]] for recall measurement.
    */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int = 5, bits: Int = 12, tables: Int = 4, dim: Int = 64): DataFrame = {
    val cb = lshBuckets(corpus, idCol, vecCol, bits, tables, dim)
      .withColumnsRenamed(Map(idCol -> "neighbor_id", vecCol -> "cv"))
    val qb = lshBuckets(queries, idCol, vecCol, bits, tables, dim)
      .withColumnsRenamed(Map(idCol -> "query_id", vecCol -> "qv"))
    val candidates = cb.join(qb, Seq("tbl", "bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select("query_id", "qv", "neighbor_id", "cv")
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    // Rank by the 6-dp-rounded cosine (then neighbor id), like
    // bruteForceTopK's rankRounded mode: the differential oracle
    // re-derives rank from its own rounded cosines, so both engines must
    // order identically even when raw doubles differ in the last ulp.
    candidates
      .withColumn("cos", round(cosine(col("qv"), col("cv")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos"))
  }

  /** Lloyd's k-means (cosine assignment, mean update) over a
    * deterministic driver-side sample — the coarse quantizer build for
    * [[ivfTopK]]. The sample is k·sampleFactor vectors (tiny even when the
    * corpus is 100 TB); the expensive step — assigning every corpus row —
    * stays distributed and shuffle-free in [[ivfTopK]]. Init spreads the
    * seeds across the sample (every sampleLen/k-th vector), so clustered
    * inputs seed every cluster; empty clusters keep their old centroid
    * (deterministic).
    */
  private[graft] def kmeansCentroids(
      corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, sampleFactor: Int = 32, iters: Int = 8): Array[Array[Double]] = {
    // Deterministic PSEUDO-RANDOM sample: order by a hash of the id, not
    // the id itself — the k·32 lowest ids would be a prefix, and any
    // corpus whose ids correlate with content (per-cluster id ranges,
    // ingest order) would fit centroids to the head of the table only.
    // TakeOrderedAndProject keeps this a per-partition heap of k·32 rows
    // at any corpus size.
    // Cast to array<double> BEFORE collect: the driver-side read is then
    // type-uniform whether the corpus stores float or double embeddings
    // (every other vector path accepts both); null vectors are dropped —
    // they cannot seed or pull a centroid.
    val sample = corpus.select(col(idCol), col(vecCol))
      .filter(col(vecCol).isNotNull)
      .select(col(idCol), col(vecCol).cast("array<double>").as(vecCol))
      .orderBy(xxhash64(col(idCol)), col(idCol)).limit(k * sampleFactor)
      .collect().map(_.getSeq[Double](1).toArray)
    require(sample.nonEmpty, "ivfTopK: empty corpus")
    val dim = sample.head.length
    val step = math.max(1, sample.length / k)
    var cents = Array.tabulate(math.min(k, sample.length)) { i =>
      sample((i * step) % sample.length).clone()
    }
    val kk = cents.length
    for (_ <- 0 until iters) {
      val sums = Array.fill(kk)(new Array[Double](dim))
      val counts = new Array[Int](kk)
      val cNorms = cents.map(c => math.max(math.sqrt(c.map(x => x * x).sum), 1e-12))
      sample.foreach { v =>
        val vn = math.max(math.sqrt(v.map(x => x * x).sum), 1e-12)
        var best = 0
        var bestScore = Double.NegativeInfinity
        var c = 0
        while (c < kk) {
          var d = 0.0
          var j = 0
          while (j < dim) { d += v(j) * cents(c)(j); j += 1 }
          val s = d / (vn * cNorms(c))
          if (s > bestScore) { bestScore = s; best = c }
          c += 1
        }
        var j = 0
        while (j < dim) { sums(best)(j) += v(j); j += 1 }
        counts(best) += 1
      }
      cents = Array.tabulate(kk) { c =>
        if (counts(c) == 0) cents(c) else sums(c).map(_ / counts(c))
      }
    }
    cents
  }

  /** IVF-style ANN: a coarse k-means quantizer partitions the corpus into
    * inverted lists; queries probe their `nProbe` nearest centroids and
    * re-rank exactly within those lists.
    *
    * Scale shape: centroids live in the plan as broadcast literals
    * (nCentroids × dim doubles); corpus assignment is ONE shuffle-free
    * projection — per-row scores against every centroid in an array
    * expression, top-n by sorting that nCentroids-element array (no
    * crossJoin row expansion, no window shuffle; at 100 TB the inverted
    * index comes out of a single scan and is written bucketed by
    * centroid_id). Probes broadcast to the corpus side, so the only
    * shuffle is the final per-query top-k over the probed fraction
    * (~nProbe/nCentroids) of the corpus.
    */
  /** Per-row top-n centroid ids against a fixed centroid set,
    * shuffle-free (centroids ride as broadcast literals). Sort key is
    * (score, -id): after reverse() ties break on ascending centroid id,
    * matching the exact re-rank's determinism contract. The row norm is
    * let-bound via a single-element transform (a lambda variable
    * evaluates once per row) — referencing an l2norm expression directly
    * inside the scoring lambda would recompute the dim-length fold per
    * centroid.
    */
  private[graft] def assignToCentroids(
      df: DataFrame, id: String, vec: String,
      cents: Array[Array[Double]], n: Int,
      roundScores: Int = -1): DataFrame = {
    val kEff = cents.length
    val cArr = typedlit(cents.map(_.toSeq).toSeq) // 1-indexed via element_at
    val cNorm = typedlit(cents.map(c =>
      math.max(math.sqrt(c.map(x => x * x).sum), 1e-12)).toSeq)
    val top = element_at(
      transform(array(l2norm(col(vec))), vn => {
        val scored = transform(sequence(lit(1), lit(kEff)), i => {
          val raw = dot(col(vec), element_at(cArr, i)) /
            (vn * element_at(cNorm, i))
          struct(
            // roundScores >= 0: rank on the ROUNDED score so another
            // engine computing the same cosines at slightly different
            // float precision assigns identically (the kmeans oracle) —
            // same contract as bruteForceTopK's rankRounded.
            (if (roundScores >= 0) round(raw, roundScores) else raw).as("s"),
            (-i).as("negc"))
        })
        slice(reverse(array_sort(scored)), 1, math.min(n, kEff))
      }), 1)
    TextAnalysis.widened(df)
      .select(col(id), col(vec), explode(top).as("c"))
      .select(col(id), col(vec),
        (-col("c.negc") - 1).cast("int").as("centroid_id"))
  }

  /** DISTRIBUTED Lloyd's k-means over the FULL corpus — the clustering
    * primitive a curation pipeline trains at corpus scale (SemDeDup
    * cluster building, IVF quantizers fitted on everything rather than
    * [[kmeansCentroids]]'s driver-side sample, topic-bucketed mixture
    * construction). Per iteration: assignment is the shuffle-free
    * broadcast-literal projection of [[assignToCentroids]] (centroids
    * ride in the plan, one scan, no crossJoin); the update is ONE
    * map-side-combined [[graft.functions.VecAvgAgg]] aggregate whose
    * shuffle carries k partial (sum, count) buffers — at 100 TB each
    * iteration costs one scan plus a k-row shuffle, and the driver holds
    * only k×dim doubles.
    *
    * Reproducibility contract (the differential oracle re-derives the
    * whole fit relationally): seeds are EXPLICIT ids taken in ascending
    * id order; assignment ranks 6-dp-ROUNDED cosines with ascending
    * centroid-id tie-break; updated centroids round half-up to 6 dp
    * (`floor(x·10⁶ + 0.5)/10⁶` — the repo's per-row decimal convention);
    * an empty cluster keeps its previous centroid. `iters` counts
    * assignment passes: iters=2 ⇒ assign → update → assign.
    *
    * Returns (id, cluster) for every corpus row with a non-null vector.
    */
  def kmeansAssignments(
      corpus: DataFrame, idCol: String, vecCol: String,
      seedIds: Seq[Long], iters: Int = 2): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(seedIds.nonEmpty, "kmeansAssignments: no seed ids")
    val rows = corpus
      .filter(col(idCol).isin(seedIds: _*)).orderBy(idCol)
      .select(col(vecCol).cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    require(rows.length == seedIds.size,
      s"seed ids resolved ${rows.length}/${seedIds.size} vectors")
    val clean = corpus.filter(col(vecCol).isNotNull)
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    var cents = rows
    var assigned: DataFrame = null
    for (it <- 1 to iters) {
      assigned = assignToCentroids(
        clean.withColumnsRenamed(Map(idCol -> "_kid", vecCol -> "_kv")),
        "_kid", "_kv", cents, n = 1, roundScores = 6)
      if (it < iters) {
        // k rows to the driver — contractually tiny at any corpus size.
        val means = assigned.groupBy("centroid_id")
          .agg(graft.functions.VecAvgAgg.vec_avg(col("_kv")).as("mv"))
          .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
        cents = cents.zipWithIndex.map { case (old, c) =>
          means.get(c).map(_.map(r6)).getOrElse(old)
        }
      }
    }
    assigned.select(col("_kid").as(idCol), col("centroid_id").as("cluster"))
  }

  def ivfTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int = 5, nCentroids: Int = 16, nProbe: Int = 4): DataFrame = {
    val cents = kmeansCentroids(corpus, idCol, vecCol, nCentroids)
    def assign(df: DataFrame, id: String, vec: String, n: Int): DataFrame =
      assignToCentroids(df, id, vec, cents, n)

    val lists = assign(
      corpus.withColumnsRenamed(Map(idCol -> "neighbor_id", vecCol -> "nv")),
      "neighbor_id", "nv", 1) // each corpus vector in ONE inverted list
    val probes = assign(
      queries.withColumnsRenamed(Map(idCol -> "query_id", vecCol -> "qv")),
      "query_id", "qv", nProbe)

    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    // Rounded-cosine ranking — same cross-engine determinism contract as
    // lshTopK / bruteForceTopK(rankRounded).
    lists.join(broadcast(probes), "centroid_id")
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", round(cosine(col("qv"), col("nv")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos"))
  }

  /** Persisted IVF index — the "write once, reuse" path SCALE.md
    * promises: inverted lists land as a parquet table PARTITIONED BY
    * centroid_id (one directory per list), centroids beside them. At
    * 100 TB this is one assignment scan; every later query batch reads
    * only its probed partitions (directory-level partition pruning —
    * IvfIndexSpec asserts the scan's PartitionFilters), i.e. ~nProbe /
    * nCentroids of the corpus instead of all of it.
    *
    * Returns the centroids for immediate reuse; [[ivfTopKIndexed]] reads
    * everything back from disk.
    */
  def buildIvfIndex(
      corpus: DataFrame, idCol: String, vecCol: String,
      path: String, nCentroids: Int = 16): Array[Array[Double]] = {
    val spark = corpus.sparkSession
    val cents = kmeansCentroids(corpus, idCol, vecCol, nCentroids)
    assignToCentroids(
        corpus.withColumnsRenamed(Map(idCol -> "neighbor_id", vecCol -> "nv")),
        "neighbor_id", "nv", cents, 1)
      .write.mode("overwrite").partitionBy("centroid_id")
      .parquet(s"$path/lists")
    import spark.implicits._
    cents.zipWithIndex
      .map { case (v, i) => (i, v.toSeq) }.toSeq
      .toDF("centroid_id", "vec")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    cents
  }

  /** Incremental maintenance for a [[buildIvfIndex]] index — the append
    * path a growing pipeline needs (a 100 TB corpus is ingested, not
    * rebuilt): assign the new rows with the PERSISTED centroids and append
    * them to the partitioned lists (dynamic-partition append touches only
    * the directories the new rows land in). The quantizer is intentionally
    * NOT re-fit — queries stay consistent with the existing lists; re-fit
    * by rebuilding once drift warrants it (the usual IVF contract).
    * Appended rows must carry the same embedding element type as the
    * original build (one parquet schema per lists table).
    */
  def appendToIvfIndex(
      newRows: DataFrame, idCol: String, vecCol: String, path: String): Unit = {
    val spark = newRows.sparkSession
    val cents = spark.read.parquet(s"$path/centroids")
      .orderBy("centroid_id").collect()
      .map(_.getSeq[Double](1).toArray)
    assignToCentroids(
        newRows.withColumnsRenamed(Map(idCol -> "neighbor_id", vecCol -> "nv")),
        "neighbor_id", "nv", cents, 1)
      .write.mode("append").partitionBy("centroid_id")
      .parquet(s"$path/lists")
  }

  /** Query a [[buildIvfIndex]] index. Probe centroid ids become a
    * LITERAL IN-filter on the partition column, so the lists scan prunes
    * to the probed directories (the collect is over query-batch × nProbe
    * ids — query batches are small by contract; the corpus never reaches
    * the driver). Same output contract as [[ivfTopK]]: (query_id,
    * neighbor_id, rank, cos), ties on (cos desc, neighbor_id).
    */
  def ivfTopKIndexed(
      queries: DataFrame, idCol: String, vecCol: String,
      path: String, k: Int = 5, nProbe: Int = 4): DataFrame = {
    val spark = queries.sparkSession
    val cents = spark.read.parquet(s"$path/centroids")
      .orderBy("centroid_id").collect()
      .map(_.getSeq[Double](1).toArray)
    val probes = assignToCentroids(
      queries.withColumnsRenamed(Map(idCol -> "query_id", vecCol -> "qv")),
      "query_id", "qv", cents, nProbe)
    val probed = probes.select("centroid_id").distinct()
      .collect().map(_.getInt(0)).sorted
    val lists = spark.read.parquet(s"$path/lists")
      .filter(col("centroid_id").isin(probed.toIndexedSeq.map(Int.box): _*))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    lists.join(broadcast(probes), "centroid_id")
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", round(cosine(col("qv"), col("nv")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos"))
  }

  /** Embedding-cosine near-duplicate pairs: LSH-bucketed self-join (all
    * pairs sharing a bucket in any table), exact cosine ≥ threshold.
    */
  def cosineNearDups(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, bits: Int = 12, tables: Int = 4,
      dim: Int = 64): DataFrame = {
    val b = lshBuckets(df, idCol, vecCol, bits, tables, dim)
    val a1 = b.withColumnsRenamed(Map(idCol -> "id_a", vecCol -> "va"))
    val a2 = b.withColumnsRenamed(Map(idCol -> "id_b", vecCol -> "vb"))
    // Threshold on the ROUNDED cosine: the differential oracle re-derives
    // the filter from its own 6-dp rounding, and a raw-value cut would
    // disagree on pairs whose cosine straddles the boundary within an ulp.
    // Rounding NARROWS but does not fully close that window — a raw
    // cosine within an ulp of a 6-dp rounding boundary can still round
    // differently across engines (different summation order); residual
    // flake odds are ~1e-10 per pair, accepted rather than papered over
    // with an epsilon band that would blur the operator's contract.
    //
    // OPERATION ORDER IS THE SCALE CONTRACT (×1000 campaign finding): the
    // cosine + threshold run INSIDE the bucket join's codegen stage, so
    // candidate pairs stream through the comparison and only SURVIVORS
    // ever materialize; the cross-table dedup then exchanges narrow
    // (id_a, id_b, cos) rows. Deduping BEFORE the cosine — the r12-r17
    // formulation — shuffled every candidate pair with BOTH dim-wide
    // vector payloads inboard; at ×1000 (2 M vectors, ~500 per bucket at
    // bits=12) that exchange needed ~1 TB of spill and died on disk,
    // while the survivor relation after the threshold is ~the true
    // near-dup set. The trade: a pair co-bucketed in t tables has its
    // cosine computed t times (bounded CPU, ~3·dim FMAs each) instead of
    // once — cycles for shuffle bytes, the right direction at any scale.
    a1.join(a2, Seq("tbl", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", round(cosine(col("va"), col("vb")), 6))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
      .dropDuplicates("id_a", "id_b")
  }

  /** Two-stage quantized retrieval: scan int8 CODES ([[quantizeInt8]])
    * to shortlist `shortlist` candidates per query by quantized cosine,
    * then re-rank only the shortlist with exact double cosine on the
    * original vectors — the memory-bandwidth pattern production vector
    * search runs (codes are 4× smaller than float32, so the exhaustive
    * stage streams 4× less data; the exact stage touches `shortlist`
    * vectors per query, not the corpus).
    *
    * Determinism is STRONGER than the float ANN paths: per-vector
    * scales cancel out of the quantized cosine
    * (qdot/√(Σqa²·Σqb²) — the scale factors divide out), and every
    * integer there is exact in a double (|code| ≤ 127, dims bounded),
    * so both stages' scores are bit-identical on any engine at any
    * partitioning — which is what lets a SQL oracle re-derive the WHOLE
    * operator (quantization → integer dots → shortlist cut → exact
    * re-rank) from first principles, with no seeded parts at all.
    *
    * Scale shape: queries broadcast (bounded query batch), the code
    * scan is one corpus pass, the per-query shortlist cut is a window
    * partitioned by query_id (parallel across queries), and the exact
    * re-rank joins `shortlist`·|queries| rows back to the corpus on the
    * id — at 100 TB the codes table is the persisted artifact (written
    * once beside the IVF index) and this stage composes inside each
    * probed inverted list.
    */
  def quantizedTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int = 5, shortlist: Int = 50): DataFrame = {
    def codes(df: DataFrame, idOut: String) =
      quantizeInt8(df, vecCol).select(
        col(idCol).as(idOut),
        col("q_vec").as(s"_qv_$idOut"),
        aggregate(col("q_vec"), lit(0L),
          (acc, x) => acc + x.cast("long") * x.cast("long"))
          .as(s"_n2_$idOut"))
    val cq = codes(queries, "query_id")
    val cc = codes(corpus, "neighbor_id")
    val qdot = aggregate(
      zip_with(col("_qv_query_id"), col("_qv_neighbor_id"),
        (a, b) => a.cast("long") * b.cast("long")),
      lit(0L), (acc, x) => acc + x)
    val qcos = round(
      qdot.cast("double") /
        sqrt((col("_n2_query_id") * col("_n2_neighbor_id")).cast("double")), 6)
    val wShort = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("qcos").desc, col("neighbor_id"))
    val short = cc.crossJoin(broadcast(cq))
      .filter(col("neighbor_id") =!= col("query_id"))
      .filter(col("_n2_query_id") > 0 && col("_n2_neighbor_id") > 0)
      .withColumn("qcos", qcos)
      .withColumn("_srank", row_number().over(wShort))
      .filter(col("_srank") <= shortlist)
      .select("query_id", "neighbor_id")
    // Exact re-rank on the original vectors, same contract as
    // bruteForceTopK's rounded ranking (ties by neighbor id). The
    // shortlist (with its query vectors) is contractually tiny —
    // shortlist·|queries| rows — so it BROADCASTS against the corpus:
    // the exact stage is one more corpus scan filtered map-side, never
    // a corpus-wide shuffle for a 500-row probe side.
    val qv = queries.select(col(idCol).as("query_id"), col(vecCol).as("_vq"))
    val cv = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("_vc"))
    val wExact = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    cv.join(broadcast(short.join(broadcast(qv), "query_id")), "neighbor_id")
      .withColumn("cos", round(cosine(col("_vq"), col("_vc")), 6))
      .withColumn("rank", row_number().over(wExact))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos"))
  }

  /** SemDeDup-style semantic deduplication (the published cluster-scoped
    * recipe: Abbas et al., "SemDeDup", arXiv:2303.09540): coarse k-means
    * partitions the corpus, and WITHIN each cluster any vector with a
    * smaller-id near-duplicate (6-dp-rounded cosine ≥ `threshold`) is
    * dropped, keeping the min-id representative — the same keeper rule
    * as the MinHash text dedup.
    *
    * Scale shape: this is the embedding-dedup plan that survives 100× —
    * the corpus-wide all-pairs comparison [[cosineNearDups]] bounds with
    * LSH buckets is here bounded by CLUSTER membership instead: centroid
    * assignment is one shuffle-free projection (centroids ride as
    * broadcast literals, [[assignToCentroids]]), and the only shuffle is
    * the hash exchange on `centroid_id` for the per-cluster self-join,
    * whose cost is Σ|cluster|² — `nCentroids` is the knob that keeps
    * clusters bounded (the paper runs ~50k clusters on LAION; size it so
    * |corpus|/nCentroids pairs fit a task). Near-dups that straddle a
    * cluster boundary are missed BY DESIGN — that is SemDeDup's
    * recall/cost trade, spec-bounded in SimilaritySpec on planted
    * clustered duplicates.
    *
    * Returns one row per input: (idCol, centroid_id, kept) — kept=false
    * iff a smaller-id cluster-mate clears the threshold. Thresholding on
    * the ROUNDED cosine for the same cross-engine determinism contract
    * as [[cosineNearDups]] (residual ulp-boundary odds accepted there).
    */
  /** The `nCentroids` sizing rule the pipeline entry uses: target
    * ~1000-member clusters (the per-cluster self-join costs Σ|cluster|²
    * cosines, so a FIXED cluster count is quadratic in n — the ×1000
    * campaign measured 1.25 G cosines / 283 s at 200k vectors with the
    * pre-r18 pinned 16; n/1000 makes it n·500 comparisons, linear).
    * Floor 16 keeps driver scales (200–2k vectors) on the r12-pinned
    * fixture. Gated by ScaleDefectGateSpec so the quadratic cannot
    * silently return.
    */
  def semDedupCentroids(n: Long): Int = math.max(16L, n / 1000L).toInt

  def semDedup(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, nCentroids: Int = 16): DataFrame = {
    val cents = kmeansCentroids(df, idCol, vecCol, nCentroids)
    val assigned = assignToCentroids(df, idCol, vecCol, cents, 1)
    val a = assigned.select(col("centroid_id"),
      col(idCol).as("_id_a"), col(vecCol).as("_va"))
    val b = assigned.select(col("centroid_id"),
      col(idCol).as("_id_b"), col(vecCol).as("_vb"))
    val dropped = a.join(b, Seq("centroid_id"))
      .filter(col("_id_a") < col("_id_b"))
      .filter(round(cosine(col("_va"), col("_vb")), 6) >= threshold)
      .select(col("_id_b").as(idCol))
      .distinct()
      .withColumn("_dropped", lit(true))
    assigned.join(dropped, Seq(idCol), "left")
      .select(col(idCol), col("centroid_id"),
        not(coalesce(col("_dropped"), lit(false))).as("kept"))
  }

  /** Product-quantization model: `m` subspaces of `dsub` dims, each with
    * its codebook — built by [[pqBuild]], consumed by [[pqTopK]] (pure
    * ADC ranking) and [[ivfPqTopK]] (coarse-probe + ADC shortlist +
    * exact re-rank, the production IVF-PQ shape).
    */
  private[graft] final case class PqModel(
      m: Int, dsub: Int, books: Array[Array[Array[Double]]])

  private def pqR6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  /** Exploded (id, s, subvector) relation — m small rows per vector. */
  private def pqSubs(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, dsub: Int): DataFrame =
    corpus.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("_id"), col(vecCol).cast("array<double>").as("_v"))
      .select(col("_id"), explode(sequence(lit(0), lit(m - 1))).as("s"), col("_v"))
      .withColumn("sv", expr(s"slice(_v, s * $dsub + 1, $dsub)"))
      .drop("_v")

  /** Shuffle-free per-row code assignment: codebooks ride as broadcast
    * literals indexed by the row's subspace; d2 via the inner-product
    * identity (uu − 2uv + cc) so the oracle's list_inner_product form
    * lands on the same 6-dp-rounded key. Ascending struct sort = argmin
    * with centroid-id tie-break.
    */
  private def pqAssign(df: DataFrame, model: PqModel): DataFrame = {
    val kSub = model.books.head.length
    val bLit = typedlit(model.books.map(_.map(_.toSeq).toSeq).toSeq)
    val ccLit = typedlit(model.books.map(_.map(c => c.map(x => x * x).sum).toSeq).toSeq)
    val scored = transform(sequence(lit(1), lit(kSub)), i => {
      val cent = element_at(element_at(bLit, col("s") + 1), i)
      val d2 = dot(col("sv"), col("sv")) - lit(2.0) * dot(col("sv"), cent) +
        element_at(element_at(ccLit, col("s") + 1), i)
      struct(round(d2, 6).as("d"), (i - 1).as("c"))
    })
    df.withColumn("cid",
      element_at(array_sort(scored), 1).getField("c").cast("int"))
  }

  /** Train the per-subspace codebooks and encode the corpus: explicit
    * seed ids slice into the initial codebooks; each update round is the
    * per-(subspace, code) mean via ONE map-side-combined vec_avg shuffle
    * (m×k rows to the driver — contractually tiny), 6-dp half-up
    * rounding, empty codes keep their seed — the kmeansAssignments
    * reproducibility contract per subspace. (At 100 TB, train on a
    * sample; encode runs over everything either way.) Returns the model
    * plus the (id, s, cid) CODES relation — m small ints per vector, the
    * 16-32x storage win.
    */
  private[graft] def pqBuild(
      corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, seedIds: Seq[Long], trainUpdates: Int): (PqModel, DataFrame) = {
    require(m >= 1, s"pq: m must be >= 1, got $m")
    require(seedIds.nonEmpty, "pq: no codebook seed ids")
    val seedVecs = corpus
      .filter(col(idCol).isin(seedIds: _*)).orderBy(idCol)
      .select(col(vecCol).cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    require(seedVecs.length == seedIds.size,
      s"pq: seed ids resolved ${seedVecs.length}/${seedIds.size}")
    val dim = seedVecs.head.length
    require(dim % m == 0, s"pq: dim $dim not divisible by m $m")
    val dsub = dim / m
    var books: Array[Array[Array[Double]]] =
      Array.tabulate(m)(s => seedVecs.map(_.slice(s * dsub, (s + 1) * dsub)))
    val subs = pqSubs(corpus, idCol, vecCol, m, dsub)
    for (_ <- 1 to trainUpdates) {
      val means = pqAssign(subs, PqModel(m, dsub, books))
        .groupBy("s", "cid")
        .agg(graft.functions.VecAvgAgg.vec_avg(col("sv")).as("mv"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2).toArray)
        .toMap
      books = Array.tabulate(m)(s => books(s).zipWithIndex.map { case (old, c) =>
        means.get((s, c)).map(_.map(pqR6)).getOrElse(old)
      })
    }
    val model = PqModel(m, dsub, books)
    (model, pqAssign(subs, model).select(col("_id"), col("s"), col("cid")))
  }

  /** ADC lookup tables: per (query, subspace, code) distance — computed
    * on the driver from the (small, by contract) query set and the final
    * codebooks, broadcast back as DECIMAL(18,6) so per-pair sums of m
    * terms are exact and partition-order-free.
    */
  private def pqTables(
      queries: DataFrame, idCol: String, vecCol: String,
      model: PqModel): DataFrame = {
    val spark = queries.sparkSession
    val qRows = queries
      .select(col(idCol).cast("long").as("qid"), col(vecCol).cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val tabRows = for {
      (qid, qv) <- qRows.toSeq
      s <- 0 until model.m
      c <- model.books(s).indices
    } yield {
      val sv = qv.slice(s * model.dsub, (s + 1) * model.dsub)
      val cent = model.books(s)(c)
      val d2 = sv.map(x => x * x).sum -
        2.0 * sv.zip(cent).map { case (a, b) => a * b }.sum +
        cent.map(x => x * x).sum
      org.apache.spark.sql.Row(qid, s, c,
        java.math.BigDecimal.valueOf(d2).setScale(6, java.math.RoundingMode.HALF_UP))
    }
    val tabSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("query_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("s", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("cid", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("d2", org.apache.spark.sql.types.DecimalType(18, 6))))
    spark.createDataFrame(spark.sparkContext.parallelize(tabRows, 1), tabSchema)
  }

  /** Product-quantization (PQ) top-k — the codes-only ANN scan beside
    * int8 ([[quantizeInt8]]/[[quantizedTopK]]) and IVF: vectors split
    * into `m` subspaces, each encoded as its nearest per-subspace
    * codebook entry, queries scored by asymmetric distance — a
    * per-(query, subspace, code) lookup table summed over the codes
    * relation, never touching the original vectors.
    *
    * Reproducibility contract (the `q_ann_pq` oracle re-derives the
    * ENTIRE index): explicit seed ids in ascending order slice into the
    * initial per-subspace codebooks; `trainUpdates` rounds of assign
    * (argmin of the 6-dp-rounded d2 = uu - 2uv + cc, code tie-break) +
    * 6-dp half-up mean rounding with empty codes keeping their seed;
    * ADC table entries are 6-dp DECIMALs so per-pair sums are exact.
    */
  def pqTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int = 5, m: Int = 8, seedIds: Seq[Long] = (0L until 16L),
      trainUpdates: Int = 1): DataFrame = {
    val (model, codes) = pqBuild(corpus, idCol, vecCol, m, seedIds, trainUpdates)
    val tab = pqTables(queries, idCol, vecCol, model)
    // Score = sum_s table[s][code]: the scan touches CODES, one
    // partial-aggregated shuffle keyed on (query, neighbor). Exact
    // decimal sums => rank keys cannot drift.
    val w = Window.partitionBy("query_id")
      .orderBy(col("adcDec").asc, col("neighbor_id"))
    codes.join(broadcast(tab), Seq("s", "cid"))
      .filter(col("_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("_id").as("neighbor_id"))
      .agg(sum(col("d2")).as("adcDec"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        col("adcDec").cast("double").as("adc"))
  }

  /** IVF-PQ with exact re-rank — the production composite: the coarse
    * IVF quantizer restricts each query to `nProbe` inverted lists, the
    * PQ codes rank the candidates by asymmetric distance into a
    * `shortlist`, and only the shortlist's TRUE vectors are read for the
    * exact cosine re-rank (same output contract as the other ANN paths,
    * so the shared soundness oracle re-derives every returned cosine and
    * rank). Scale shape: candidates = probed fraction of the corpus,
    * ADC touches codes only, the exact stage touches `shortlist` vectors
    * per query — at no point does the full corpus shuffle or the
    * original vectors ride the candidate join.
    *
    * Parameter guidance: size `shortlist` ≫ k and above the expected ADC
    * tie mass — with coarse codebooks, near-identical candidates collapse
    * to IDENTICAL codes and tie exactly in ADC, so a shortlist smaller
    * than a tie class truncates it arbitrarily by id (SimilaritySpec
    * demonstrates the cliff). PQ internally runs on L2-normalized
    * vectors (unit-sphere L2 = 2 − 2·cos), so the shortlist ranks by the
    * same angular metric the exact stage uses.
    */
  def ivfPqTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int = 5, nCentroids: Int = 16, nProbe: Int = 4,
      m: Int = 8, seedIds: Seq[Long] = (0L until 16L),
      trainUpdates: Int = 1, shortlist: Int = 50): DataFrame = {
    val cents = kmeansCentroids(corpus, idCol, vecCol, nCentroids)
    val lists = assignToCentroids(
      corpus.withColumnsRenamed(Map(idCol -> "_id", vecCol -> "_cv")),
      "_id", "_cv", cents, 1)
    val probes = assignToCentroids(
      queries.withColumnsRenamed(Map(idCol -> "query_id", vecCol -> "_qv")),
      "query_id", "_qv", cents, nProbe)
    val cand = lists.select("centroid_id", "_id")
      .join(broadcast(probes.select("centroid_id", "query_id")), "centroid_id")
      .filter(col("_id") =!= col("query_id"))
      .select("query_id", "_id").distinct()
    // PQ runs on L2-NORMALIZED vectors: squared L2 on the unit sphere is
    // 2 − 2·cos, so the ADC shortlist ranks by angle — the metric the
    // exact cosine re-rank uses. Un-normalized ADC conflates norm with
    // angle and leaks true neighbors out of the shortlist (measured:
    // recall 0.86 → 1.0 on the clustered spec fixture).
    def normalized(df: DataFrame): DataFrame = df
      .select(col(idCol), col(vecCol).cast("array<double>").as("_rv"))
      .withColumn("_n", greatest(l2norm(col("_rv")), lit(1e-12)))
      .select(col(idCol), transform(col("_rv"), x => x / col("_n")).as(vecCol))
    val (model, codes) = pqBuild(normalized(corpus), idCol, vecCol, m, seedIds, trainUpdates)
    val tab = pqTables(normalized(queries), idCol, vecCol, model)
    val wSl = Window.partitionBy("query_id")
      .orderBy(col("adcDec").asc, col("_id"))
    val short = cand.join(codes, "_id")
      .join(broadcast(tab), Seq("query_id", "s", "cid"))
      .groupBy("query_id", "_id")
      .agg(sum(col("d2")).as("adcDec"))
      .withColumn("_slr", row_number().over(wSl))
      .filter(col("_slr") <= shortlist)
      .select("query_id", "_id")
    val qv = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    short.join(corpus.select(col(idCol).as("_id"), col(vecCol).as("cv")), "_id")
      .join(qv, "query_id")
      .withColumn("cos", round(cosine(col("qv"), col("cv")), 6))
      .withColumnRenamed("_id", "neighbor_id")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos"))
  }

  /** Symmetric per-vector int8 quantization — the storage/bandwidth step
    * before an embedding corpus is indexed at scale (4× smaller than
    * float32; distance kernels read int8 directly). scale = max|v|/127,
    * q[i] = round-half-up(v[i]/scale), so q spans the full [-127, 127]
    * range with no clamp needed (|v[i]| ≤ max|v| by construction; the
    * 1e-30 floor only guards the all-zero vector, which quantizes to
    * zeros). Adds `q_scale`, `q_vec`, and `q_err` = max|v[i] −
    * q[i]·scale| ≤ scale/2, the per-vector reconstruction bound.
    *
    * Pure elementwise expressions — no shuffle, no reduction across
    * rows; every float op is order-fixed (max over an array, per-element
    * divide, floor), so results are bit-identical on any engine with
    * IEEE doubles — which is what lets a SQL oracle re-derive every
    * element. round-half-up via floor(x + 0.5), not round(): banker's
    * vs half-away rounding differs across engines on exact .5.
    */
  def quantizeInt8(df: DataFrame, vecCol: String): DataFrame = {
    val v = col(vecCol)
    val maxAbs = array_max(transform(v, x => abs(x.cast("double"))))
    df.withColumn("q_scale", greatest(maxAbs, lit(1e-30)) / 127d)
      .withColumn("q_vec",
        transform(v, x =>
          floor(x.cast("double") / col("q_scale") + 0.5).cast("int")))
      .withColumn("q_err",
        array_max(zip_with(v, col("q_vec"),
          (x, q) => abs(x.cast("double") - q.cast("double") * col("q_scale")))))
  }
}
