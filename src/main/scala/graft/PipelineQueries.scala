package graft

import graft.operators.{Components, Multimodal, Sampling, Similarity, TextAnalysis, TextDedup}
import org.apache.spark.sql.functions._

/** LLM-training-data pipeline operators over the `documents` /
  * `embeddings` tables: dedup, similarity search, text analysis,
  * multimodal plumbing. SQL-expressible pieces carry DuckDB oracles;
  * hash/sketch-based ones are deterministic rows-only entries backed by
  * unit tests with synthetic near-duplicates (see TextDedupSpec /
  * SimilaritySpec).
  */
object PipelineQueries {
  import Queries._

  /** Memoized embeddings row count per data directory — the tables are
    * static per dir, so the semdedup nCentroids sizing scan should run
    * ONCE per JVM, not once per timed bench lap (r18 advice: the extra
    * full scan inside the entry body perturbed its timing). Keyed by
    * (path, on-disk fingerprint): regenerating a corpus IN PLACE in the
    * same JVM (the ScaleGen overwrite-to-same-dest pattern) changes the
    * fingerprint and invalidates the entry — a path-only key would keep
    * serving the stale count and silently mis-size nCentroids (r19
    * advice). r21 (ADVICE): stored as path -> (fingerprint, count) and
    * REPLACED on fingerprint change, so in-place regenerations cannot
    * grow the map without bound — one entry per corpus dir.
    */
  private val embCountMemo =
    scala.collection.concurrent.TrieMap.empty[String, (Long, Long)]

  /** Cheap on-disk fingerprint: total bytes + max mtime over the
    * embeddings files (recursive — ScaleGen corpora are part-file
    * directories).
    */
  private def embFingerprint(path: String): Long = {
    def walk(f: java.io.File): (Long, Long) =
      if (f.isFile) (f.length, f.lastModified)
      else Option(f.listFiles).map(_.map(walk))
        .map(xs => (xs.map(_._1).sum, (0L +: xs.map(_._2)).max))
        .getOrElse((0L, 0L))
    val (bytes, mtime) = walk(new java.io.File(path))
    bytes ^ java.lang.Long.rotateLeft(mtime, 21)
  }

  private val textAnalysis: Seq[Entry] = Seq(
    // Exact deduplication by normalized text (hash group-by — one shuffle
    // on the dedup key; at 100 TB use sha2(text) as the shuffle key so the
    // exchange carries 32-byte digests, not documents).
    sql("q_dedup_exact",
      "SELECT CAST(min(doc_id) AS BIGINT) AS keep_id, count(*) AS n_copies " +
        "FROM documents GROUP BY lower(trim(text)) ORDER BY keep_id"),

    // Token counting + document length stats.
    sql2("q_text_tokens",
      "SELECT doc_id, CAST(size(split(text, ' ')) AS BIGINT) AS n_tokens, " +
        "CAST(length(text) AS BIGINT) AS n_chars_c FROM documents ORDER BY doc_id",
      "SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens, " +
        "CAST(length(text) AS BIGINT) AS n_chars_c FROM documents ORDER BY doc_id"),

    // Quality scoring: stopword ratio + mean token length (pure
    // expressions — codegen'd, no UDFs).
    sql2("q_text_quality",
      "SELECT doc_id, round(CAST(size(filter(split(text, ' '), w -> w = 'the' OR w = 'a')) AS DOUBLE) " +
        "/ size(split(text, ' ')), 6) AS stop_ratio, " +
        "round(CAST(length(replace(text, ' ', '')) AS DOUBLE) / size(split(text, ' ')), 6) AS mean_tok_len " +
        "FROM documents ORDER BY doc_id",
      "SELECT doc_id, round(CAST(len(list_filter(string_split(text, ' '), w -> w = 'the' OR w = 'a')) AS DOUBLE) " +
        "/ len(string_split(text, ' ')), 6) AS stop_ratio, " +
        "round(CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(string_split(text, ' ')), 6) AS mean_tok_len " +
        "FROM documents ORDER BY doc_id"),
  )

  private val dedup: Seq[Entry] = Seq(
    // MinHash-LSH near-dup dedup: docs kept after removing every near
    // duplicate (Jaccard ≥ 0.8) except the lowest-id representative.
    // Banded LSH self-join — never all-pairs. ORACLE-CHECKED (r7): DuckDB
    // re-derives the kept set from brute-force ALL-PAIRS word-3-shingle
    // Jaccard (affordable at oracle scale; the same first-principles
    // relation the components oracle uses) — green proves the banded
    // candidate generation missed no qualifying pair AND the exact
    // verifier agreed with an independent Jaccard implementation.
    // KNOWN-DIVERGENCE note (r18 advice): the oversized-bucket hub guard
    // has a measured blind spot — a near-dup family shadowed into a
    // foreign bucket in EVERY band wrongly survives. The brute-force
    // oracle does NOT model it, by design: at the shipped 16-band config
    // the shadow probability is J^64 (≈6e-10; SkewGuardRecallSpec
    // measures 0 excess on a purpose-built adversary), so a future
    // mismatch here showing EXTRA Spark survivors should be read as
    // "corpus exhibits the blind spot" → raise `hubAnchors`/bands, not
    // as an oracle bug.
    dfq("q_dedup_minhash",
      "WITH toks AS (SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM documents), " +
        "sh AS (SELECT doc_id, list_distinct([array_to_string(t[CAST(i AS INT):CAST(i+2 AS INT)], ' ') " +
        "  FOR i IN range(1, greatest(len(t)-2, 1)+1)]) AS g FROM toks), " +
        "dropped AS (SELECT DISTINCT b.doc_id FROM sh a JOIN sh b ON a.doc_id < b.doc_id " +
        "  WHERE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE) / len(list_distinct(a.g || b.g)) >= 0.8) " +
        "SELECT d.doc_id, d.n_chars FROM documents d " +
        "WHERE d.doc_id NOT IN (SELECT doc_id FROM dropped) ORDER BY d.doc_id") { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val dups = TextDedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.8)
      docs.join(dups.select(col("id_b").as("doc_id")), Seq("doc_id"), "left_anti")
        .select("doc_id", "n_chars").orderBy("doc_id")
    },

    // Incremental-ingestion near-dup check: a "new batch" (doc_id ≥ 400)
    // against the "existing corpus" (doc_id < 400) — the daily-crawl
    // shape where per-day cost scales with the batch, never a corpus
    // self-join. Green proves the asymmetric banding missed no
    // qualifying cross pair: DuckDB brute-forces ALL old×new Jaccards.
    dfq("q_dedup_incremental",
      "WITH toks AS (SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM documents), " +
        "sh AS (SELECT doc_id, list_distinct([array_to_string(t[CAST(i AS INT):CAST(i+2 AS INT)], ' ') " +
        "  FOR i IN range(1, greatest(len(t)-2, 1)+1)]) AS g FROM toks), " +
        "oc AS (SELECT * FROM sh WHERE doc_id < 400), " +
        "nb AS (SELECT * FROM sh WHERE doc_id >= 400) " +
        "SELECT nb.doc_id AS batch_id, oc.doc_id AS corpus_id, " +
        "  round(CAST(len(list_intersect(nb.g, oc.g)) AS DOUBLE) / len(list_distinct(nb.g || oc.g)), 6) AS jaccard " +
        "FROM nb JOIN oc ON CAST(len(list_intersect(nb.g, oc.g)) AS DOUBLE) " +
        "  / len(list_distinct(nb.g || oc.g)) >= 0.8 " +
        "ORDER BY batch_id, corpus_id") { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      TextDedup.minhashNearDupsAgainst(
          docs.filter(col("doc_id") < 400), docs.filter(col("doc_id") >= 400),
          "doc_id", "text", threshold = 0.8)
        .orderBy("batch_id", "corpus_id")
    },

    // The whole MinHash-LSH dedup in PURE SQL — no DataFrame code at
    // all: the registered kernel functions (shingle_hashes, minhash_sig)
    // plus built-ins express shingling, banding, the candidate self-join
    // and the exact-Jaccard verify as one SQL text, the way a reference
    // user would type it. Checked against the same brute-force all-pairs
    // oracle as the DataFrame operator. SQL-parity demo: it omits the
    // oversized-bucket skew guard the production operator carries
    // (TextDedup.minhashNearDups maxBucket) — boilerplate-heavy corpora
    // should use the operator, not this text.
    dfq("q_dedup_sql",
      "WITH toks AS (SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM documents), " +
        "sh AS (SELECT doc_id, list_distinct([array_to_string(t[CAST(i AS INT):CAST(i+2 AS INT)], ' ') " +
        "  FOR i IN range(1, greatest(len(t)-2, 1)+1)]) AS g FROM toks) " +
        "SELECT a.doc_id AS id_a, b.doc_id AS id_b, " +
        "  round(CAST(len(list_intersect(a.g, b.g)) AS DOUBLE) / len(list_distinct(a.g || b.g)), 6) AS jaccard " +
        "FROM sh a JOIN sh b ON a.doc_id < b.doc_id " +
        "WHERE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE) / len(list_distinct(a.g || b.g)) >= 0.8 " +
        "ORDER BY id_a, id_b") { (s, dir) =>
      graft.functions.GraftExtensions.register(s)
      Tables.registerAll(s, dir)
      s.sql(
        """WITH sh AS (SELECT doc_id, shingle_hashes(text, 3) AS sh FROM documents),
          |sig AS (SELECT doc_id, sh, minhash_sig(sh, 64) AS sig FROM sh),
          |bands AS (
          |  SELECT doc_id, sh, band, bh
          |  FROM sig
          |  LATERAL VIEW posexplode(transform(sequence(0, 15),
          |    b -> xxhash64(concat_ws(',', slice(sig, b * 4 + 1, 4))))) t AS band, bh),
          |cand AS (
          |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          |  FROM bands a JOIN bands b
          |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
          |verified AS (
          |  SELECT c.id_a, c.id_b,
          |    CAST(size(array_intersect(sa.sh, sb.sh)) AS DOUBLE)
          |      / size(array_union(sa.sh, sb.sh)) AS j
          |  FROM cand c
          |  JOIN sh sa ON sa.doc_id = c.id_a
          |  JOIN sh sb ON sb.doc_id = c.id_b)
          |SELECT id_a, id_b, round(j, 6) AS jaccard
          |FROM verified WHERE j >= 0.8 ORDER BY id_a, id_b""".stripMargin)
    },

    // The SAME batch-vs-corpus check through the PERSISTED index: built
    // from doc_id < 300, appended 300-399, queried with the >= 400 batch
    // — must land on the identical pair set as q_dedup_incremental's
    // recompute path, against the identical brute-force-all-Jaccards
    // DuckDB oracle. Green proves the on-disk artifact (build AND
    // append) is equivalent to shingling the corpus fresh.
    dfq("q_dedup_indexed",
      "WITH toks AS (SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM documents), " +
        "sh AS (SELECT doc_id, list_distinct([array_to_string(t[CAST(i AS INT):CAST(i+2 AS INT)], ' ') " +
        "  FOR i IN range(1, greatest(len(t)-2, 1)+1)]) AS g FROM toks), " +
        "oc AS (SELECT * FROM sh WHERE doc_id < 400), " +
        "nb AS (SELECT * FROM sh WHERE doc_id >= 400) " +
        "SELECT nb.doc_id AS batch_id, oc.doc_id AS corpus_id, " +
        "  round(CAST(len(list_intersect(nb.g, oc.g)) AS DOUBLE) / len(list_distinct(nb.g || oc.g)), 6) AS jaccard " +
        "FROM nb JOIN oc ON CAST(len(list_intersect(nb.g, oc.g)) AS DOUBLE) " +
        "  / len(list_distinct(nb.g || oc.g)) >= 0.8 " +
        "ORDER BY batch_id, corpus_id") { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val path = dedupIndexFor(s, dir, docs)
      TextDedup.nearDupsAgainstIndex(
          docs.filter(col("doc_id") >= 400), "doc_id", "text", path,
          threshold = 0.8)
        .orderBy("batch_id", "corpus_id")
    },

    // Per-document 64-bit SimHash signatures. Partial-soundness oracle:
    // no SQL engine ships xxhash64, so the TOKEN HASHES are emitted
    // alongside the signature (their correctness is pinned by the
    // kernel-vs-HOF bit-identity twins in TextDedupSpec) and DuckDB
    // independently re-runs the whole bit-aggregation — per-bit signed
    // sums over the hashes, sign test, 64-bit reassembly (bit 63 via the
    // two's-complement offset) — and must land on the identical BIGINT.
    // The final projection serializes the hash list (concat_ws / CSV) —
    // the driver comparator sorts on every output column and cannot sort
    // raw arrays; the oracle re-splits the CSV back to a BIGINT list
    // inside its CTEs for the bit-level re-fold.
    dfq("q_dedup_simhash",
      "WITH res AS (SELECT doc_id, term_hashes_csv FROM " +
        s"read_parquet('${Queries.VerifyOutToken}/q_dedup_simhash/*.parquet')), " +
        "hs AS (SELECT doc_id, term_hashes_csv, " +
        "  list_transform(string_split(term_hashes_csv, ','), x -> CAST(x AS BIGINT)) AS term_hashes " +
        "  FROM res), " +
        "bits AS (SELECT doc_id, j, " +
        "  sum(CASE WHEN (h >> CAST(j AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS s " +
        "  FROM (SELECT doc_id, unnest(term_hashes) AS h FROM hs) u " +
        "  CROSS JOIN range(0, 64) js(j) GROUP BY doc_id, j), " +
        "sig AS (SELECT doc_id, CAST(sum(CASE WHEN s > 0 THEN " +
        "  CASE WHEN j = 63 THEN -9223372036854775807 - 1 " +
        "       ELSE CAST(1 AS BIGINT) << CAST(j AS INT) END " +
        "  ELSE 0 END) AS BIGINT) AS simhash FROM bits GROUP BY doc_id) " +
        "SELECT r.doc_id, r.term_hashes_csv, g.simhash " +
        "FROM hs r JOIN sig g ON g.doc_id = r.doc_id ORDER BY r.doc_id") { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      docs.select(col("doc_id"),
          concat_ws(",", transform(split(col("text"), "\\s+"),
            w => xxhash64(w).cast("string"))).as("term_hashes_csv"),
          TextDedup.simhash64(col("text")).as("simhash"))
        .orderBy("doc_id")
    },

    // N-gram Jaccard of each doc against a rotated pairing (deterministic
    // pair structure exercising the exact verifier at scale). DuckDB checks
    // it from the literal gram STRINGS (list comprehension + list_intersect)
    // while Spark intersects xxhash64'd gram sets — set cardinalities are
    // isomorphic, so the count ratio (and its fixed-point surface) matches
    // exactly. Fixed-point floor(x·1e6+0.5) because per-row round() differs
    // between engines on .5 boundaries.
    dfq("q_dedup_ngram",
      "WITH grams AS (" +
        "  SELECT doc_id, list_distinct([substr(text, CAST(x AS INT), 5) " +
        "    FOR x IN range(1, greatest(length(text)-4, 1)+1)]) AS g " +
        "  FROM documents) " +
        "SELECT a.doc_id AS doc_id, " +
        "  CAST(floor(CAST(len(list_intersect(a.g, b.g)) AS DOUBLE) " +
        "    / len(list_distinct(a.g || b.g)) * 1000000 + 0.5) AS BIGINT) AS jac5fp " +
        "FROM grams a JOIN grams b ON a.doc_id = b.doc_id + 1 " +
        "ORDER BY doc_id") { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val a = docs.select(col("doc_id"), col("text"))
      val b = docs.select((col("doc_id") + 1).as("doc_id"), col("text").as("text_b"))
      a.join(b, "doc_id")
        .select(col("doc_id"),
          floor(TextDedup.ngramJaccard(col("text"), col("text_b"), 5) * 1000000 + 0.5)
            .cast("long").as("jac5fp"))
        .orderBy("doc_id")
    },
  )

  private val grouping: Seq[Entry] = Seq(
    // Near-dup GROUPS, end-to-end: MinHash-LSH pairs (banded self-join +
    // exact shingle-Jaccard verify) clustered into connected components;
    // every document maps to its component representative (min id;
    // singletons to themselves). DuckDB re-derives the same relation from
    // first principles: ALL O(n²) pairs' word-3-shingle Jaccard (no LSH —
    // at oracle scale brute force is affordable), then a recursive-CTE
    // transitive closure. Green means the LSH candidate generation missed
    // no qualifying pair AND the distributed component labels equal the
    // exact closure.
    // PageRank over the supplier co-occurrence graph (suppliers sharing
    // an order, both directions — symmetric, so the src set is the node
    // set and no dangling mass exists on THIS graph; the operator's
    // dangling redistribution is spec-pinned on a directed fixture).
    // Three fixed power iterations; the oracle re-derives every
    // iteration relationally — per-node mass sums, the (1−d)/N prior,
    // identical IEEE arithmetic — and all ranks compare at 8 dp.
    dfq("q_pagerank", {
      def iter(i: Int): String =
        s"r$i AS (SELECT nodes.id, (1 - 0.85) / nn.n + 0.85 * coalesce(m.s, 0) AS r " +
          s"FROM nodes CROSS JOIN nn LEFT JOIN (SELECT e.dst AS id, sum(p.r / deg.deg) AS s " +
          s"FROM e JOIN r${i - 1} p ON e.src = p.id JOIN deg ON e.src = deg.src " +
          s"GROUP BY e.dst) m ON nodes.id = m.id)"
      "WITH e AS (SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst FROM lineitem a " +
        "  JOIN lineitem b ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey), " +
        "nodes AS (SELECT DISTINCT src AS id FROM e), " +
        "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes), " +
        "deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS deg FROM e GROUP BY src), " +
        "r0 AS (SELECT nodes.id, 1.0 / nn.n AS r FROM nodes CROSS JOIN nn), " +
        iter(1) + ", " + iter(2) + ", " + iter(3) + " " +
        "SELECT CAST(id AS BIGINT) AS supplier, round(r, 8) AS rank FROM r3 ORDER BY supplier"
    }) { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
      val a = li.withColumnsRenamed(Map("l_suppkey" -> "src"))
      val b = li.withColumnsRenamed(Map("l_suppkey" -> "dst"))
      val edges = a.join(b, Seq("l_orderkey")).filter(col("src") =!= col("dst"))
      graft.operators.Components.pageRank(edges, "src", "dst", iters = 3)
        .select(col("id").as("supplier"), round(col("rank"), 8).as("rank"))
        .orderBy("supplier")
    },

    // HITS hubs/authorities over the DIRECTED customer→part purchase
    // graph (hubs = customers, authorities = parts — the natural
    // bipartite reading). Two UNNORMALIZED power iterations: with h₀=1
    // every score is a SUM OF INTEGERS, so unlike the 8-dp-rounded
    // PageRank comparison this entry is EXACT end to end — the only
    // double is one IEEE division of two exact integers < 2^53 (the
    // share against total authority mass). Unrolled relationally: each
    // iteration is one equi-join + one sum aggregate, key-partitioned;
    // the same text runs on both engines (DuckDB's HUGEINT sums are
    // cast back to BIGINT).
    // Engine side persists the edge relation and the a2 iterate once
    // (r21): the oracle text references `e` four times (a1/h1/a2/h2) and
    // `a2` three times (h2, tot, and the auth branch) — 52 parquet scans
    // in the before plan, each one the lineitem⋈orders DISTINCT build.
    dfq("q_hits",
      "WITH e AS (SELECT DISTINCT o.o_custkey AS src, l.l_partkey AS dst " +
        "  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey), " +
        "a1 AS (SELECT e.dst AS id, CAST(count(*) AS BIGINT) AS a FROM e GROUP BY e.dst), " +
        "h1 AS (SELECT e.src AS id, CAST(sum(a1.a) AS BIGINT) AS h FROM e JOIN a1 ON e.dst = a1.id GROUP BY e.src), " +
        "a2 AS (SELECT e.dst AS id, CAST(sum(h1.h) AS BIGINT) AS a FROM e JOIN h1 ON e.src = h1.id GROUP BY e.dst), " +
        "h2 AS (SELECT e.src AS id, CAST(sum(a2.a) AS BIGINT) AS h FROM e JOIN a2 ON e.dst = a2.id GROUP BY e.src), " +
        "tot AS (SELECT CAST(sum(a) AS BIGINT) AS ta FROM a2) " +
        "SELECT 'auth' AS role, a2.id AS node, a2.a AS score, " +
        "  CAST(a2.a AS DOUBLE) / tot.ta AS share " +
        "FROM a2 CROSS JOIN tot " +
        "UNION ALL " +
        "SELECT 'hub' AS role, h2.id AS node, h2.h AS score, " +
        "  CAST(h2.h AS DOUBLE) / tot.ta AS share " +
        "FROM h2 CROSS JOIN tot " +
        "ORDER BY role, node") { (s, dir) =>
      Tables.registerAll(s, dir)
      Queries.checkpointedView(s, "graft_hits_e",
        "SELECT DISTINCT o.o_custkey AS src, l.l_partkey AS dst " +
          "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey")
      Queries.checkpointedView(s, "graft_hits_a2",
        "WITH a1 AS (SELECT e.dst AS id, CAST(count(*) AS BIGINT) AS a " +
          "  FROM graft_hits_e e GROUP BY e.dst), " +
          "h1 AS (SELECT e.src AS id, CAST(sum(a1.a) AS BIGINT) AS h " +
          "  FROM graft_hits_e e JOIN a1 ON e.dst = a1.id GROUP BY e.src) " +
          "SELECT e.dst AS id, CAST(sum(h1.h) AS BIGINT) AS a " +
          "FROM graft_hits_e e JOIN h1 ON e.src = h1.id GROUP BY e.dst")
      s.sql(
        "WITH h2 AS (SELECT e.src AS id, CAST(sum(a2.a) AS BIGINT) AS h " +
          "  FROM graft_hits_e e JOIN graft_hits_a2 a2 ON e.dst = a2.id GROUP BY e.src), " +
          "tot AS (SELECT CAST(sum(a) AS BIGINT) AS ta FROM graft_hits_a2) " +
          "SELECT 'auth' AS role, a2.id AS node, a2.a AS score, " +
          "  CAST(a2.a AS DOUBLE) / tot.ta AS share " +
          "FROM graft_hits_a2 a2 CROSS JOIN tot " +
          "UNION ALL " +
          "SELECT 'hub' AS role, h2.id AS node, h2.h AS score, " +
          "  CAST(h2.h AS DOUBLE) / tot.ta AS share " +
          "FROM h2 CROSS JOIN tot " +
          "ORDER BY role, node")
    },

    dfq("q_dedup_components",
      "WITH RECURSIVE toks AS (SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM documents), " +
        "sh AS (SELECT doc_id, list_distinct([array_to_string(t[CAST(i AS INT):CAST(i+2 AS INT)], ' ') " +
        "  FOR i IN range(1, greatest(len(t)-2, 1)+1)]) AS g FROM toks), " +
        "jac AS (SELECT a.doc_id AS ida, b.doc_id AS idb, " +
        "  CAST(len(list_intersect(a.g, b.g)) AS DOUBLE) / len(list_distinct(a.g || b.g)) AS j " +
        "  FROM sh a JOIN sh b ON a.doc_id < b.doc_id), " +
        "edges AS (SELECT ida AS a, idb AS b FROM jac WHERE j >= 0.8 " +
        "  UNION ALL SELECT idb, ida FROM jac WHERE j >= 0.8), " +
        "reach AS (SELECT a AS id, b AS r FROM edges " +
        "  UNION SELECT reach.id, e.b FROM reach JOIN edges e ON reach.r = e.a WHERE e.b <> reach.id) " +
        "SELECT d.doc_id AS doc_id, " +
        "  CAST(least(d.doc_id, coalesce(min(reach.r), d.doc_id)) AS BIGINT) AS keep_id " +
        "FROM documents d LEFT JOIN reach ON reach.id = d.doc_id " +
        "GROUP BY d.doc_id ORDER BY doc_id") { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val pairs = TextDedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.8)
      Components.dedupGroups(docs, "doc_id", pairs, "id_a", "id_b")
        .orderBy("doc_id")
    },
  )

  private val sampling: Seq[Entry] = Seq(
    // Deterministic (engine-portable) 10% Bernoulli sample: row fate =
    // md5(key || '|' || salt) hex prefix vs threshold '1999'
    // (= floor(0.1·16^4) in hex), identical on any engine at any
    // parallelism — reproducible corpus selection, pure map-side filter.
    // The oracle applies the same rule in SQL and must select the SAME
    // rows, which the per-flag aggregate then pins.
    dfq("q_sample_det",
      "SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS sq " +
        "FROM lineitem " +
        "WHERE substr(md5(CAST(l_orderkey * 10 + l_linenumber AS VARCHAR) || '|'), 1, 4) < '1999' " +
        "GROUP BY l_returnflag ORDER BY l_returnflag") { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
        .withColumn("_sk", expr("l_orderkey * 10 + l_linenumber"))
      Sampling.deterministicSample(li, "_sk", 0.1)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sq"))
        .orderBy("l_returnflag")
    },

    // Weighted sample WITHOUT replacement (Efraimidis–Spirakis A-Res on
    // public coins): 200 lineitems drawn with probability ∝ l_quantity.
    // DuckDB re-runs the identical draw — same md5 u32, same
    // round(ln(u)/w, 9) rank key, same tie-break — and must select the
    // SAME 200 rows, so the selection rule itself is differential, not
    // just its aggregate shape.
    dfq("q_sample_weighted",
      "SELECT l_orderkey, l_linenumber, CAST(l_quantity AS DOUBLE) AS w FROM ( " +
        "SELECT l_orderkey, l_linenumber, l_quantity, " +
        "  round(ln((('0x' || substr(md5(CAST(l_orderkey * 10 + l_linenumber AS VARCHAR) || '|ws1'), 1, 8))::UBIGINT + 1) " +
        "    / 4294967296.0) / l_quantity, 9) AS wk " +
        "FROM lineitem WHERE l_quantity > 0 " +
        "ORDER BY wk DESC, l_orderkey * 10 + l_linenumber LIMIT 200) " +
        "ORDER BY l_orderkey, l_linenumber") { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
        .withColumn("_sk", expr("l_orderkey * 10 + l_linenumber"))
      Sampling.weightedSample(li, "_sk", "l_quantity", k = 200, salt = "ws1")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("double").as("w"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // Stratified variant: independent per-stratum rates (N 20%, R 5%,
    // default 10%) from the same hash rule — still one map-side filter,
    // no per-stratum shuffle, skew-immune.
    dfq("q_sample_strat",
      "SELECT l_returnflag, count(*) AS n " +
        "FROM lineitem " +
        "WHERE substr(md5(CAST(l_orderkey * 10 + l_linenumber AS VARCHAR) || '|'), 1, 4) < " +
        "  CASE l_returnflag WHEN 'N' THEN '3333' WHEN 'R' THEN '0ccc' ELSE '1999' END " +
        "GROUP BY l_returnflag ORDER BY l_returnflag") { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
        .withColumn("_sk", expr("l_orderkey * 10 + l_linenumber"))
      Sampling.stratifiedSample(li, "l_returnflag", "_sk",
          Map("N" -> 0.2, "R" -> 0.05), defaultFraction = 0.1)
        .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },
  )

  private val skew: Seq[Entry] = Seq(
    // Hot-key-safe distinct-set aggregation (value-salted two-phase —
    // see operators/Skew.scala; AQE can't fix grow-with-key aggregation
    // state, salting can). Oracle = the plain single-phase formulation.
    // Final select serializes the sorted set (the comparator cannot sort
    // array columns); both engines sort numerically THEN stringify, so
    // the CSVs match element-for-element.
    dfq("q_skew_collect_set",
      "SELECT l_suppkey, array_to_string(list_sort(list_distinct(list(l_linenumber))), ',') " +
        "  AS l_linenumber_set_csv " +
        "FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey") { (s, dir) =>
      graft.operators.Skew.collectSetSalted(
          Tables.load(s, dir, "lineitem"), "l_suppkey", "l_linenumber", salts = 8)
        .select(col("l_suppkey"),
          concat_ws(",", transform(col("l_linenumber_set"), v => v.cast("string")))
            .as("l_linenumber_set_csv"))
        .orderBy("l_suppkey")
    },

    // Hot-key-safe per-key top-k (per-salt top-k then exact top-k over
    // salts x k candidates). Oracle = the plain window formulation.
    dfq("q_skew_topk",
      "SELECT user_id, round(value, 2) AS v, event_id, CAST(rnk AS INT) AS rank FROM " +
        "(SELECT user_id, value, event_id, row_number() OVER " +
        " (PARTITION BY user_id ORDER BY value DESC, event_id) AS rnk " +
        " FROM events WHERE user_id < 50) t " +
        "WHERE rnk <= 3 ORDER BY user_id, rank") { (s, dir) =>
      val ev = Tables.load(s, dir, "events").filter(col("user_id") < 50)
        .select("user_id", "value", "event_id")
      graft.operators.Skew.topKPerKeySalted(
          ev, "user_id", "value", "event_id", k = 3, salts = 8)
        .select(col("user_id"), round(col("value"), 2).as("v"),
          col("event_id"), col("rank"))
        .orderBy("user_id", "rank")
    },
  )

  private val heavyHitters: Seq[Entry] = Seq(
    // Exact top-10 hottest keys via Misra-Gries candidates + exact
    // verify (HeavyHitters.topK). The oracle computes the plain exact
    // top-10 — green proves the approximate pass lost no true heavy
    // hitter AND the verify pass restored exact counts. At sf0.01 the
    // key space fits the summary outright; at sf0.1 it does not (15k
    // keys vs 8192 counters) and the MG guarantee is doing real work.
    dfq("q_heavy_hitters",
      "SELECT CAST(o_custkey AS BIGINT) AS o_custkey, count(*) AS cnt " +
        "FROM orders GROUP BY o_custkey " +
        "ORDER BY cnt DESC, o_custkey LIMIT 10") { (s, dir) =>
      graft.operators.HeavyHitters.topK(
        Tables.load(s, dir, "orders"), "o_custkey", k = 10)
    },

    // Count-Min sketch point-frequency queries — the second sketch family
    // beside FAGMS (CMS: per-key frequency within ε·N at confidence δ;
    // FAGMS: join sizes). Spark's native count_min_sketch aggregate
    // builds it in one mergeable pass; the custom cms_estimate expression
    // probes it IN the plan (sketch re-enters as a broadcast literal —
    // the k-means-centroid pattern, no driver probe loop). Differential
    // contract: true_n is fully re-derived by DuckDB, and the CMS bound
    // check (never under-estimates; over-estimate ≤ ⌈ε·N⌉) rides as an
    // ok flag the oracle expects all-1 — a broken sketch or estimator
    // flips rows. ε=0.001 ⇒ slack 61 at sf0.01's 60175 lineitems, with
    // per-key counts ~600, so the bound is doing real work.
    dfq("q_cms_counts",
      "SELECT CAST(l_suppkey AS BIGINT) AS k, count(*) AS true_n, " +
        "CAST(1 AS BIGINT) AS ok FROM lineitem GROUP BY 1 ORDER BY 1") { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val agg = li.agg(expr(
        "count_min_sketch(l_suppkey, CAST(0.001 AS DOUBLE), CAST(0.99 AS DOUBLE), 42)"),
        count(lit(1)))
      val row = agg.head()
      val bytes = row.getAs[Array[Byte]](0)
      val total = row.getLong(1)
      val slack = math.ceil(0.001 * total).toLong
      li.groupBy(col("l_suppkey").cast("long").as("k"))
        .agg(count(lit(1)).as("true_n"))
        .withColumn("_est",
          graft.functions.CmsOps.cms_estimate(lit(bytes), col("k")))
        .select(col("k"), col("true_n"),
          (col("_est") >= col("true_n") &&
            col("_est") <= col("true_n") + lit(slack)).cast("long").as("ok"))
        .orderBy("k")
    },
  )

  // One persisted IVF index per (session, data dir). Values are plain
  // path strings (no back-reference to the session key), so the weak map
  // lets dead sessions' entries collect — the Tables.currentDir pattern.
  private val ivfIndexDirs =
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession,
      scala.collection.mutable.Map[String, String]]()

  private def ivfIndexFor(s: org.apache.spark.sql.SparkSession, dir: String,
      emb: org.apache.spark.sql.DataFrame): String = synchronized {
    val perDir = Option(ivfIndexDirs.get(s)).getOrElse {
      val m = scala.collection.mutable.Map.empty[String, String]
      ivfIndexDirs.put(s, m); m
    }
    perDir.getOrElseUpdate(dir, {
      val path = java.nio.file.Files.createTempDirectory("graft_ivf_idx").toString
      Similarity.buildIvfIndex(emb, "vec_id", "embedding", path, nCentroids = 16)
      path
    })
  }

  private val dedupIndexDirs =
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession,
      scala.collection.mutable.Map[String, String]]()

  /** Memoized persisted dedup index over the "existing corpus" half
    * (doc_id < 400) of `documents`: BUILT from doc_id < 300 and then
    * APPENDED with 300–399, so the entry's differential check covers the
    * append leg too, not just the build.
    */
  private def dedupIndexFor(s: org.apache.spark.sql.SparkSession, dir: String,
      docs: org.apache.spark.sql.DataFrame): String = synchronized {
    val perDir = Option(dedupIndexDirs.get(s)).getOrElse {
      val m = scala.collection.mutable.Map.empty[String, String]
      dedupIndexDirs.put(s, m); m
    }
    perDir.getOrElseUpdate(dir, {
      val path = java.nio.file.Files.createTempDirectory("graft_dedup_idx").toString
      TextDedup.buildDedupIndex(docs.filter(col("doc_id") < 300),
        "doc_id", "text", path)
      TextDedup.appendDedupIndex(
        docs.filter(col("doc_id") >= 300 && col("doc_id") < 400),
        "doc_id", "text", path)
      path
    })
  }

  /** Partial-soundness oracle for ANN top-k entries: the returned
    * neighbor SET is approximate by design (seeded hyperplanes /
    * k-means — not re-derivable in SQL), but every VALUE in it is not.
    * DuckDB reads the entry's own Verify dump ([[Queries.VerifyOutToken]]),
    * recomputes each returned pair's cosine from the embeddings parquet
    * in double precision, and re-ranks by (rounded cosine desc, neighbor
    * id). Green means: every cosine the engine reported is right, every
    * rank is monotone in true cosine, and nothing self-paired — the
    * recall side stays spec-bounded (SimilaritySpec ≥0.9 on clustered
    * data), turning the former rows-only trust into a soundness oracle.
    */
  private def annSoundnessSql(name: String): String =
    "WITH res AS (SELECT query_id, neighbor_id FROM " +
      s"read_parquet('${Queries.VerifyOutToken}/$name/*.parquet')), " +
      "pairs AS (SELECT r.query_id, r.neighbor_id, q.embedding AS qv, c.embedding AS cv " +
      "  FROM res r JOIN embeddings q ON q.vec_id = r.query_id " +
      "  JOIN embeddings c ON c.vec_id = r.neighbor_id), " +
      "dots AS (SELECT query_id, neighbor_id, sum(qa * ca) AS dotp, " +
      "  sqrt(sum(qa * qa)) AS na, sqrt(sum(ca * ca)) AS nb " +
      "  FROM (SELECT query_id, neighbor_id, unnest(qv)::DOUBLE AS qa, " +
      "        unnest(cv)::DOUBLE AS ca FROM pairs) u " +
      "  GROUP BY query_id, neighbor_id) " +
      "SELECT query_id, neighbor_id, " +
      "  CAST(row_number() OVER (PARTITION BY query_id " +
      "    ORDER BY round(dotp / (na * nb), 6) DESC, neighbor_id) AS INT) AS rank, " +
      "  round(dotp / (na * nb), 6) AS cos " +
      "FROM dots ORDER BY query_id, rank"

  private val similarity: Seq[Entry] = Seq(
    // Exact brute-force cosine top-5 for a 10-vector query set (the
    // baseline ANN path; broadcast queries, one corpus pass). DuckDB
    // oracle: same double-precision dot/norm via positional unnest (its
    // list_cosine_similarity computes in float32 — not hash-stable
    // against Spark's doubles); BOTH engines rank by the 6-dp-rounded
    // cosine then neighbor id, so tie-breaks agree exactly.
    dfq("q_ann_exact",
      "WITH pairs AS (" +
        "  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, q.embedding AS qv, c.embedding AS cv" +
        "  FROM embeddings q, embeddings c WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id" +
        "), dots AS (" +
        "  SELECT query_id, neighbor_id, sum(qa * ca) AS dotp," +
        "    sqrt(sum(qa * qa)) AS na, sqrt(sum(ca * ca)) AS nb" +
        "  FROM (SELECT query_id, neighbor_id, unnest(qv)::DOUBLE AS qa," +
        "        unnest(cv)::DOUBLE AS ca FROM pairs) u" +
        "  GROUP BY query_id, neighbor_id" +
        "), scored AS (" +
        "  SELECT query_id, neighbor_id, round(dotp / (na * nb), 6) AS cos," +
        "    row_number() OVER (PARTITION BY query_id" +
        "      ORDER BY round(dotp / (na * nb), 6) DESC, neighbor_id) AS rnk" +
        "  FROM dots)" +
        "SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rank, cos " +
        "FROM scored WHERE rnk <= 5 ORDER BY query_id, rank") { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      Similarity.bruteForceTopK(
        emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding",
        k = 5, rankRounded = true)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy("query_id", "rank")
    },

    // LSH-bucketed ANN for the same queries, at the SCALE-SAFE
    // parameterization: bits=10 → ~1024 buckets/table, so candidate volume
    // is O(n²·tables/2^bits) — linear-ish headroom at 100×, never the
    // O(n²/8) a 3-bit entry hides at small SF. Recall ≥ 0.9 is asserted in
    // SimilaritySpec on CLUSTERED data (the regime LSH serves); on this
    // synthetic unclustered table the operator is exercised for shape and
    // determinism only.
    dfq("q_ann_lsh", annSoundnessSql("q_ann_lsh")) { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      Similarity.lshTopK(
        emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding",
        k = 5, bits = 10, tables = 8)
        .orderBy("query_id", "rank")
    },

    // IVF-style ANN: inverted lists from a coarse quantizer, probe-then-
    // re-rank (the other scale path named in the brief; recall asserted
    // on clustered data in SimilaritySpec).
    dfq("q_ann_ivf", annSoundnessSql("q_ann_ivf")) { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      Similarity.ivfTopK(
        emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding",
        k = 5, nCentroids = 16, nProbe = 8)
        .orderBy("query_id", "rank")
    },

    // Distributed Lloyd's k-means over the full embedding corpus: 4
    // explicit spread seeds, two assignment passes with one mean update
    // between them. The ENTIRE fit is re-derived relationally by DuckDB —
    // same rounded-cosine argmax with centroid-id tie-break, same
    // floor(x*1e6+0.5)/1e6 centroid rounding, same empty-cluster
    // keep-old rule — so every one of the 500 final assignments must
    // match, not just aggregate shapes. (Embeddings are 64-dim; the
    // oracle's range(1,65) mirrors that, like the other vector twins.)
    dfq("q_kmeans",
      "WITH emb AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v " +
        "  FROM embeddings), " +
        "seeds AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid, v " +
        "  FROM emb WHERE vec_id IN (0, 125, 250, 375)), " +
        "a1 AS (SELECT e.vec_id, (SELECT s.cid FROM seeds s " +
        "  ORDER BY round(list_inner_product(e.v, s.v) / (sqrt(list_inner_product(e.v, e.v)) " +
        "    * greatest(sqrt(list_inner_product(s.v, s.v)), 1e-12)), 6) DESC, s.cid LIMIT 1) AS cid " +
        "  FROM emb e), " +
        "m1 AS (SELECT a1.cid, r.i, floor(avg(e.v[CAST(r.i AS INT)]) * 1000000 + 0.5) / 1000000 AS mx " +
        "  FROM a1 JOIN emb e USING (vec_id), range(1, 65) r(i) GROUP BY a1.cid, r.i), " +
        "c1 AS (SELECT s.cid, CASE WHEN count(m1.i) = 0 THEN s.v " +
        "    ELSE list(m1.mx ORDER BY m1.i) END AS v " +
        "  FROM seeds s LEFT JOIN m1 ON s.cid = m1.cid GROUP BY s.cid, s.v), " +
        "a2 AS (SELECT e.vec_id, (SELECT c.cid FROM c1 c " +
        "  ORDER BY round(list_inner_product(e.v, c.v) / (sqrt(list_inner_product(e.v, e.v)) " +
        "    * greatest(sqrt(list_inner_product(c.v, c.v)), 1e-12)), 6) DESC, c.cid LIMIT 1) AS cid " +
        "  FROM emb e) " +
        "SELECT vec_id, cid AS cluster FROM a2 ORDER BY vec_id") { (s, dir) =>
      Similarity.kmeansAssignments(
          Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
          seedIds = Seq(0L, 125L, 250L, 375L), iters = 2)
        .orderBy("vec_id")
    },

    // (gridDensityGraph, the dense-cell + adjacency builder, is defined
    // on the object below the entry list so PlanAuditSpec can audit the
    // adjacency join's OWN executed plan — the CC loop's checkpoints
    // truncate it out of the entry's final plan.)
    //
    // Grid-density clustering (DBSCAN's grid-cell formulation): hash
    // customers onto a 30×30 cell grid (md5 coordinates — engine-
    // portable coins, Poisson occupancy), keep cells meeting a
    // scale-adaptive density threshold (exact integer ceil-division —
    // no float in the cut, so no knife-edge at any scale), and cluster
    // dense cells by 8-neighborhood connectivity. The scale shape: the
    // neighbor relation is built by EXPLODING each dense cell to its 8
    // shifted keys and EQUI-joining (never an |dx|<=1 theta-join — that
    // is a cross product at 100 TB), components ride the distributed
    // pointer-jumping loop, and the per-cell counts are one hash
    // aggregate over the points. The ORACLE re-derives the same grid,
    // threshold, adjacency, and min-label components via a recursive
    // CTE. At sf0.01: 85 dense cells, 59 clusters (22 multi-cell);
    // sf0.1: 297 cells, 36 clusters — non-degenerate at both gated
    // scales by construction of the 1.12×mean threshold.
    dfq("q_grid_cluster",
      "WITH RECURSIVE pts AS (SELECT c_custkey AS k, " +
        "  CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || '|gx'), 1, 4))::UBIGINT % 30 AS BIGINT) AS cx, " +
        "  CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || '|gy'), 1, 4))::UBIGINT % 30 AS BIGINT) AS cy FROM customer), " +
        "thr AS (SELECT greatest(4, (112 * count(*) + 89999) // 90000) AS minpts FROM pts), " +
        "cells AS (SELECT cx, cy, count(*) AS n FROM pts GROUP BY cx, cy), " +
        "ids AS (SELECT cx*30 + cy AS cell, cx, cy, n FROM cells, thr WHERE n >= thr.minpts), " +
        "edges AS (SELECT a.cell AS ca, b.cell AS cb FROM ids a JOIN ids b " +
        "  ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1 AND a.cell <> b.cell), " +
        "labels AS (SELECT cell, cell AS lbl FROM ids " +
        "  UNION SELECT e.cb, l.lbl FROM labels l JOIN edges e ON l.cell = e.ca) " +
        "SELECT i.cx, i.cy, CAST(min(l.lbl) AS BIGINT) AS cluster_id, CAST(i.n AS BIGINT) AS n_points " +
        "FROM ids i JOIN labels l ON l.cell = i.cell " +
        "GROUP BY i.cx, i.cy, i.n ORDER BY cx, cy") { (s, dir) =>
      val (ids, edges) = gridDensityGraph(s, dir)
      val comps = Components.connectedComponents(edges, "ca", "cb")
      // Isolated dense cells have no edges → they label themselves.
      ids.join(comps.withColumnsRenamed(Map("id" -> "cell", "comp" -> "lbl")),
          Seq("cell"), "left")
        .select(col("cx"), col("cy"),
          coalesce(col("lbl"), col("cell")).cast("long").as("cluster_id"),
          col("n").cast("long").as("n_points"))
        .orderBy("cx", "cy")
    },

    // Mean pooling: chunk embeddings → one vector per group via the
    // vec_avg aggregate (one pass, map-side partials carrying a single
    // sums[dim] array — never the posexplode'd n×dim shuffle). DuckDB
    // re-derives every pooled element positionally.
    // IVF-PQ with exact re-rank — the production composite index: coarse
    // probe → ADC shortlist over codes → exact cosine on the shortlist's
    // true vectors only. Shares the ANN soundness oracle: every returned
    // cosine and rank re-derived by DuckDB from the embeddings.
    dfq("q_ann_ivfpq", annSoundnessSql("q_ann_ivfpq")) { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      Similarity.ivfPqTopK(emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding",
          k = 5, nCentroids = 16, nProbe = 8, m = 8, shortlist = 50)
        .orderBy("query_id", "rank")
    },

    // Product quantization (PQ) — the codes-only ANN path: per-subspace
    // codebooks (16 explicit seed slices + one 6-dp-rounded mean update),
    // m=8 small-int codes per vector, asymmetric-distance scoring via
    // exact DECIMAL table sums. FULLY differential like q_kmeans: DuckDB
    // re-derives the ENTIRE index — subvector slicing, the argmin
    // assignment on 6-dp d2 = uu−2uv+cc, the mean update with empty-code
    // keep-seed, the encode pass, the ADC tables, and every ranked sum.
    dfq("q_ann_pq", {
      val seedList = (0 until 16).mkString(", ")
      "WITH emb AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings), " +
        "sub AS (SELECT vec_id, CAST(r.s AS INT) AS s, v[CAST(r.s*8+1 AS INT):CAST(r.s*8+8 AS INT)] AS sv " +
        "  FROM emb, range(0, 8) r(s)), " +
        s"seeds AS (SELECT CAST(row_number() OVER (PARTITION BY s ORDER BY vec_id) - 1 AS INT) AS cid, s, sv " +
        s"  FROM sub WHERE vec_id IN ($seedList)), " +
        "a1 AS (SELECT sub.vec_id, sub.s, sub.sv, (SELECT c.cid FROM seeds c WHERE c.s = sub.s " +
        "    ORDER BY round(list_inner_product(sub.sv, sub.sv) - 2*list_inner_product(sub.sv, c.sv) " +
        "      + list_inner_product(c.sv, c.sv), 6) ASC, c.cid LIMIT 1) AS cid FROM sub), " +
        "m1 AS (SELECT a1.s, a1.cid, r.i, floor(avg(a1.sv[CAST(r.i AS INT)]) * 1000000 + 0.5) / 1000000 AS mx " +
        "  FROM a1, range(1, 9) r(i) GROUP BY a1.s, a1.cid, r.i), " +
        "c1 AS (SELECT se.s, se.cid, CASE WHEN count(m1.i) = 0 THEN se.sv ELSE list(m1.mx ORDER BY m1.i) END AS sv " +
        "  FROM seeds se LEFT JOIN m1 ON se.s = m1.s AND se.cid = m1.cid GROUP BY se.s, se.cid, se.sv), " +
        "codes AS (SELECT sub.vec_id, sub.s, (SELECT c.cid FROM c1 c WHERE c.s = sub.s " +
        "    ORDER BY round(list_inner_product(sub.sv, sub.sv) - 2*list_inner_product(sub.sv, c.sv) " +
        "      + list_inner_product(c.sv, c.sv), 6) ASC, c.cid LIMIT 1) AS cid FROM sub), " +
        "qs AS (SELECT vec_id AS query_id, s, sv FROM sub WHERE vec_id < 5), " +
        "tab AS (SELECT q.query_id, c.s, c.cid, " +
        "    CAST(round(list_inner_product(q.sv, q.sv) - 2*list_inner_product(q.sv, c.sv) " +
        "      + list_inner_product(c.sv, c.sv), 6) AS DECIMAL(18,6)) AS d2 " +
        "  FROM qs q JOIN c1 c ON q.s = c.s), " +
        "sc AS (SELECT t.query_id, k.vec_id AS neighbor_id, sum(t.d2) AS adc " +
        "  FROM codes k JOIN tab t ON k.s = t.s AND k.cid = t.cid " +
        "  WHERE k.vec_id <> t.query_id GROUP BY 1, 2), " +
        "rk AS (SELECT query_id, neighbor_id, CAST(adc AS DOUBLE) AS adc, " +
        "    row_number() OVER (PARTITION BY query_id ORDER BY adc ASC, neighbor_id) AS rank FROM sc) " +
        "SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, adc FROM rk WHERE rank <= 5 " +
        "ORDER BY query_id, rank"
    }) { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      Similarity.pqTopK(emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding",
          k = 5, m = 8, seedIds = (0L until 16L), trainUpdates = 1)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy("query_id", "rank")
    },

    dfq("q_embed_pool",
      "SELECT vec_id % 10 AS grp, CAST(pos AS BIGINT) AS pos, round(avg(v), 6) AS v " +
        "FROM (SELECT vec_id, unnest(embedding)::DOUBLE AS v, " +
        "      generate_subscripts(embedding, 1) AS pos FROM embeddings) u " +
        "GROUP BY grp, pos ORDER BY grp, pos") { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      emb.groupBy((col("vec_id") % 10).as("grp"))
        .agg(graft.functions.VecAvgAgg.vec_avg(col("embedding")).as("pooled"))
        .select(col("grp"), posexplode(col("pooled")))
        .select(col("grp"), (col("pos") + 1).cast("long").as("pos"),
          round(col("col"), 6).as("v"))
        .orderBy("grp", "pos")
    },

    // L2 normalization of the embedding corpus — the prep step every
    // cosine-based retrieval/dedup stage wants done once upstream.
    // Shuffle-free elementwise map; the full normalized vector is
    // compared as integer-scaled CSV (floor(v·1e6 + 0.5) — double→string
    // rendering differs between engines, integers don't), plus the
    // 6-dp-rounded norm. Both engines fold the squared sum left-to-right
    // in double, so the bits agree before rounding.
    dfq("q_embed_normalize",
      "WITH n AS (SELECT vec_id, embedding, " +
        "    sqrt(list_sum([CAST(x AS DOUBLE) * CAST(x AS DOUBLE) FOR x IN embedding])) AS nrm " +
        "  FROM embeddings) " +
        "SELECT vec_id, round(nrm, 6) AS norm_r, " +
        "  array_to_string([CAST(CAST(floor(CAST(x AS DOUBLE) / greatest(nrm, 1e-30) * 1000000 + 0.5) AS BIGINT) AS VARCHAR) " +
        "    FOR x IN embedding], ',') AS unit_csv " +
        "FROM n ORDER BY vec_id") { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      val withNorm = emb.withColumn("nrm",
        sqrt(aggregate(col("embedding"), lit(0.0d),
          (acc, x) => acc + x.cast("double") * x.cast("double"))))
      withNorm.select(col("vec_id"), round(col("nrm"), 6).as("norm_r"),
          concat_ws(",", transform(col("embedding"),
            x => floor(x.cast("double") / greatest(col("nrm"), lit(1e-30)) * 1000000 + 0.5)
              .cast("long").cast("string"))).as("unit_csv"))
        .orderBy("vec_id")
    },

    // Symmetric int8 quantization of the embedding corpus (scale =
    // max|v|/127, round-half-up) — every quantized element, the scale,
    // and the max reconstruction error re-derived elementwise by DuckDB
    // from the same order-fixed double arithmetic. Quantized vectors are
    // CSV-serialized in the final select (array columns break the
    // comparator sort).
    dfq("q_embed_quantize",
      "WITH s AS (SELECT vec_id, embedding, " +
        "    greatest(list_max([abs(CAST(x AS DOUBLE)) FOR x IN embedding]), 1e-30) / 127 AS sc " +
        "  FROM embeddings), " +
        "q AS (SELECT vec_id, sc, embedding, " +
        "    [CAST(floor(CAST(x AS DOUBLE) / sc + 0.5) AS BIGINT) FOR x IN embedding] AS qv " +
        "  FROM s) " +
        "SELECT vec_id, round(sc, 9) AS scale_r, " +
        "  array_to_string([CAST(e AS VARCHAR) FOR e IN qv], ',') AS q_csv, " +
        "  round(list_max([abs(CAST(embedding[CAST(i AS INT)] AS DOUBLE) " +
        "      - qv[CAST(i AS INT)] * sc) FOR i IN range(1, len(qv) + 1)]), 9) AS err_r " +
        "FROM q ORDER BY vec_id") { (s, dir) =>
      Similarity.quantizeInt8(Tables.load(s, dir, "embeddings"), "embedding")
        .select(col("vec_id"), round(col("q_scale"), 9).as("scale_r"),
          concat_ws(",", transform(col("q_vec"), q => q.cast("string")))
            .as("q_csv"),
          round(col("q_err"), 9).as("err_r"))
        .orderBy("vec_id")
    },

    // Persisted-IVF lifecycle: build the partitioned inverted-list index
    // ONCE per (session, data dir) — the index's whole point — then query
    // it with partition-pruned scans (IvfIndexSpec asserts indexed ≡ live
    // results and the pruned scan). First run pays the build; repeat runs
    // measure query-only, which is the steady-state the index exists for.
    // Deterministic (hash-ordered k-means sample), rows-only like the
    // other seeded ANN paths.
    dfq("q_ann_ivf_indexed", annSoundnessSql("q_ann_ivf_indexed")) { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      val path = ivfIndexFor(s, dir, emb)
      Similarity.ivfTopKIndexed(
          emb.filter(col("vec_id") < 10), "vec_id", "embedding",
          path, k = 5, nProbe = 8)
        .orderBy("query_id", "rank")
    },

    // Two-stage quantized retrieval: int8-code scan -> 50-candidate
    // shortlist by quantized cosine -> exact re-rank of the shortlist.
    // FULLY differential (no dump reading, no seeded parts): per-vector
    // scales cancel out of the quantized cosine and every integer in it
    // is exact in a double, so DuckDB re-derives the ENTIRE operator
    // from first principles — quantization (the q_embed_quantize rule),
    // integer dots, the shortlist cut, and the exact re-rank.
    dfq("q_ann_quantized",
      "WITH sc AS (SELECT vec_id, embedding, " +
        "    greatest(list_max([abs(CAST(x AS DOUBLE)) FOR x IN embedding]), 1e-30) / 127 AS s " +
        "  FROM embeddings), " +
        "n2 AS (SELECT vec_id, embedding, qv, list_sum([x * x FOR x IN qv]) AS nn FROM " +
        "  (SELECT vec_id, embedding, " +
        "    [CAST(floor(CAST(x AS DOUBLE) / s + 0.5) AS BIGINT) FOR x IN embedding] AS qv " +
        "   FROM sc) c), " +
        "pairs AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, " +
        "    q.qv AS qa, c.qv AS qb, q.nn AS na2, c.nn AS nb2 " +
        "  FROM n2 q, n2 c WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id " +
        "    AND q.nn > 0 AND c.nn > 0), " +
        "qdots AS (SELECT query_id, neighbor_id, sum(xa * xb) AS qdot, " +
        "    min(na2) AS na2, min(nb2) AS nb2 " +
        "  FROM (SELECT query_id, neighbor_id, na2, nb2, " +
        "        unnest(qa) AS xa, unnest(qb) AS xb FROM pairs) u " +
        "  GROUP BY query_id, neighbor_id), " +
        "short AS (SELECT query_id, neighbor_id FROM " +
        "  (SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id " +
        "     ORDER BY round(CAST(qdot AS DOUBLE) / sqrt(CAST(na2 * nb2 AS DOUBLE)), 6) DESC, " +
        "       neighbor_id) AS srank FROM qdots) t WHERE srank <= 50), " +
        "ex AS (SELECT s.query_id, s.neighbor_id, eq.embedding AS vq, ec.embedding AS vc " +
        "  FROM short s JOIN embeddings eq ON eq.vec_id = s.query_id " +
        "  JOIN embeddings ec ON ec.vec_id = s.neighbor_id), " +
        "dots AS (SELECT query_id, neighbor_id, sum(xa * xb) AS dotp, " +
        "    sqrt(sum(xa * xa)) AS na, sqrt(sum(xb * xb)) AS nb " +
        "  FROM (SELECT query_id, neighbor_id, unnest(vq)::DOUBLE AS xa, " +
        "        unnest(vc)::DOUBLE AS xb FROM ex) u GROUP BY query_id, neighbor_id) " +
        "SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rank, cos FROM " +
        "  (SELECT query_id, neighbor_id, round(dotp / (na * nb), 6) AS cos, " +
        "     row_number() OVER (PARTITION BY query_id " +
        "       ORDER BY round(dotp / (na * nb), 6) DESC, neighbor_id) AS rnk " +
        "   FROM dots) r WHERE rnk <= 5 ORDER BY query_id, rank") { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      Similarity.quantizedTopK(
          emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding",
          k = 5, shortlist = 50)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy("query_id", "rank")
    },

    // SemDeDup-style cluster-scoped semantic dedup: coarse k-means
    // partitions the corpus, min-id keeper election within each cluster
    // at rounded-cosine >= 0.45 (the cut that produces real drops on
    // this synthetic corpus — see q_ann_neardup). Oracle = the partial-
    // soundness pattern of the ANN entries, but here the dedup DECISION
    // is fully differential GIVEN the recorded partition: DuckDB reads
    // the dump's (vec_id, centroid_id) assignment (seeded k-means — not
    // SQL-re-derivable, recall spec-bounded in SimilaritySpec), forms
    // every same-cluster pair itself, recomputes each cosine from the
    // embeddings parquet in double precision, and re-derives every
    // kept/dropped flag — a wrong cosine, a missed cluster-mate, or a
    // keeper that should have dropped all flip a row.
    dfq("q_semdedup",
      "WITH res AS (SELECT vec_id, centroid_id, kept FROM " +
        s"read_parquet('${Queries.VerifyOutToken}/q_semdedup/*.parquet')), " +
        "cand AS (SELECT a.vec_id AS ia, b.vec_id AS ib FROM res a JOIN res b " +
        "  ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id), " +
        "pairs AS (SELECT c.ia, c.ib, ea.embedding AS va, eb.embedding AS vb " +
        "  FROM cand c JOIN embeddings ea ON ea.vec_id = c.ia " +
        "  JOIN embeddings eb ON eb.vec_id = c.ib), " +
        "dots AS (SELECT ia, ib, sum(xa * xb) AS dotp, " +
        "  sqrt(sum(xa * xa)) AS na, sqrt(sum(xb * xb)) AS nb " +
        "  FROM (SELECT ia, ib, unnest(va)::DOUBLE AS xa, " +
        "        unnest(vb)::DOUBLE AS xb FROM pairs) u GROUP BY ia, ib), " +
        "dropped AS (SELECT DISTINCT ib FROM dots " +
        "  WHERE round(dotp / (na * nb), 6) >= 0.45) " +
        "SELECT r.vec_id, r.centroid_id, " +
        "  r.vec_id NOT IN (SELECT ib FROM dropped) AS kept " +
        "FROM res r ORDER BY r.vec_id") { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      // nCentroids scales with the corpus (SemDeDup's own recipe — the
      // paper runs ~50k clusters on LAION): the per-cluster self-join
      // costs Σ|cluster|² cosines, so a FIXED cluster count is
      // quadratic in n. The ×1000 campaign measured exactly that —
      // 200k vectors / 16 clusters = 1.25G cosines, 283 s; targeting
      // ~1k-member clusters is n·500 comparisons, linear. Floor 16
      // keeps every driver scale (200-2k vectors) on the r12-pinned
      // fixture; the oracle follows the recorded assignment at any k.
      val p = s"$dir/embeddings.parquet"
      val fp = embFingerprint(p)
      val n = embCountMemo.get(p) match {
        case Some((`fp`, cnt)) => cnt
        case _ =>
          val cnt = emb.count()
          embCountMemo.put(p, (fp, cnt)); cnt
      }
      Similarity.semDedup(emb, "vec_id", "embedding",
          threshold = 0.45, nCentroids = Similarity.semDedupCentroids(n))
        .orderBy("vec_id")
    },

    // Embedding-cosine near-duplicate pairs (LSH-bucketed self-join).
    // Threshold 0.45 with wide recall params (bits=6 → 64 buckets/table,
    // 8 tables): the synthetic embeddings plant no near-dups (max
    // pairwise cosine ≈0.51 at sf0.01), so a production-style 0.9 cut
    // returns the empty set and verifies nothing — this cut makes the
    // seeded run return real pairs for the oracle to check. Oracle =
    // same partial-soundness pattern as the ANN entries: DuckDB
    // recomputes each RETURNED pair's cosine from the embeddings and
    // re-applies the (id_a < id_b, cos ≥ threshold) predicates — a pair
    // with a wrong cosine, wrong order, or below the cut vanishes from
    // the oracle side and fails the row compare.
    dfq("q_ann_neardup",
      "WITH res AS (SELECT id_a, id_b FROM " +
        s"read_parquet('${Queries.VerifyOutToken}/q_ann_neardup/*.parquet')), " +
        "pairs AS (SELECT r.id_a, r.id_b, a.embedding AS va, b.embedding AS vb " +
        "  FROM res r JOIN embeddings a ON a.vec_id = r.id_a " +
        "  JOIN embeddings b ON b.vec_id = r.id_b), " +
        "dots AS (SELECT id_a, id_b, sum(xa * xb) AS dotp, " +
        "  sqrt(sum(xa * xa)) AS na, sqrt(sum(xb * xb)) AS nb " +
        "  FROM (SELECT id_a, id_b, unnest(va)::DOUBLE AS xa, " +
        "        unnest(vb)::DOUBLE AS xb FROM pairs) u " +
        "  GROUP BY id_a, id_b) " +
        "SELECT id_a, id_b, round(dotp / (na * nb), 6) AS cos FROM dots " +
        "WHERE id_a < id_b AND round(dotp / (na * nb), 6) >= 0.45 " +
        "ORDER BY id_a, id_b") { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      Similarity.cosineNearDups(emb, "vec_id", "embedding", threshold = 0.45,
        bits = 6, tables = 8)
        .orderBy("id_a", "id_b")
    },
  )

  private val temporal: Seq[Entry] = Seq(
    // Backward as-of join (point-in-time lookup): for each view event,
    // the latest prior-or-equal purchase value per user. DuckDB checks it
    // with its native ASOF LEFT JOIN; Spark composes it (tagged union +
    // one per-key window — Temporal.asofJoin). Right side deduped per
    // (user, ts) by max(value) so both engines resolve ties identically.
    dfq("q_asof_join",
      "SELECT v.event_id, round(p.value, 2) AS last_purchase " +
        "FROM (SELECT user_id, ts, event_id FROM events WHERE event_type = 'view') v " +
        "ASOF LEFT JOIN (SELECT user_id, ts, max(value) AS value FROM events " +
        "  WHERE event_type = 'purchase' GROUP BY user_id, ts) p " +
        "ON v.user_id = p.user_id AND p.ts <= v.ts " +
        "ORDER BY v.event_id") { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      val views = ev.filter(col("event_type") === "view")
        .select("user_id", "ts", "event_id")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value"))
      graft.operators.Temporal.asofJoin(views, purchases, "user_id", "ts", Seq("value"))
        .select(col("event_id"), round(col("value"), 2).as("last_purchase"))
        .orderBy("event_id")
    },

    // Tolerance-bounded as-of (pandas merge_asof `tolerance`): the
    // latest prior purchase counts only if it happened within 1 day of
    // the view — staleness-bounded feature lookup. A match exists but
    // is out of tolerance ⇒ null, exactly like no match; DuckDB's ASOF
    // lacks the bound, so its twin re-applies it on the matched ts.
    dfq("q_asof_tolerance",
      "SELECT v.event_id, CASE WHEN epoch(v.ts) - epoch(p.ts) <= 86400 " +
        "  THEN round(p.value, 2) END AS last_purchase " +
        "FROM (SELECT user_id, ts, event_id FROM events WHERE event_type = 'view') v " +
        "ASOF LEFT JOIN (SELECT user_id, ts, max(value) AS value FROM events " +
        "  WHERE event_type = 'purchase' GROUP BY user_id, ts) p " +
        "ON v.user_id = p.user_id AND p.ts <= v.ts " +
        "ORDER BY v.event_id") { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      val views = ev.filter(col("event_type") === "view")
        .select("user_id", "ts", "event_id")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value"))
      graft.operators.Temporal.asofJoin(views, purchases, "user_id", "ts",
          Seq("value"), toleranceSec = Some(86400L))
        .select(col("event_id"), round(col("value"), 2).as("last_purchase"))
        .orderBy("event_id")
    },

    // FORWARD as-of (merge_asof direction='forward'): the EARLIEST
    // following-or-equal purchase per view — time-to-next-event lookup.
    // Same single-window plan traversed in descending ts; DuckDB's ASOF
    // accepts the >= inequality directly.
    dfq("q_asof_forward",
      "SELECT v.event_id, round(p.value, 2) AS next_purchase " +
        "FROM (SELECT user_id, ts, event_id FROM events WHERE event_type = 'view') v " +
        "ASOF LEFT JOIN (SELECT user_id, ts, max(value) AS value FROM events " +
        "  WHERE event_type = 'purchase' GROUP BY user_id, ts) p " +
        "ON v.user_id = p.user_id AND p.ts >= v.ts " +
        "ORDER BY v.event_id") { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      val views = ev.filter(col("event_type") === "view")
        .select("user_id", "ts", "event_id")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value"))
      graft.operators.Temporal.asofJoin(views, purchases, "user_id", "ts",
          Seq("value"), direction = "forward")
        .select(col("event_id"), round(col("value"), 2).as("next_purchase"))
        .orderBy("event_id")
    },

    // Range join (sliding 1-hour lookback): views per user in the hour
    // before each purchase. Spark composes it as an interval-bucketed
    // equi-join (Temporal.rangeJoin); DuckDB checks the plain inequality
    // join.
    dfq("q_range_join",
      "SELECT p.event_id, count(v.view_id) AS n_views FROM " +
        "(SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase') p " +
        "LEFT JOIN (SELECT user_id, ts, event_id AS view_id FROM events WHERE event_type = 'view') v " +
        "ON p.user_id = v.user_id AND v.ts > p.ts - INTERVAL 1 HOUR AND v.ts <= p.ts " +
        "GROUP BY p.event_id ORDER BY p.event_id") { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("user_id", "ts", "event_id")
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id").as("view_id"))
      val cand = graft.operators.Temporal.rangeJoin(
        purchases, views, "user_id", "ts", 3600L, Seq("view_id"))
      val counts = cand.groupBy("event_id").agg(count(lit(1)).as("n_views"))
      purchases.select("event_id").join(counts, Seq("event_id"), "left")
        .select(col("event_id"), coalesce(col("n_views"), lit(0L)).as("n_views"))
        .orderBy("event_id")
    },
  )

  private val analysis: Seq[Entry] = Seq(
    // Language ID via stopword-profile argmax — ORACLE-CHECKED: DuckDB
    // re-derives the full prediction (tokens, grams, scores, tie-break)
    // from the same profile constants; see TextAnalysis.langIdOracleSql.
    dfq("q_lang_id", TextAnalysis.langIdOracleSql()) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      TextAnalysis.withLanguageId(docs, "text")
        .groupBy("lang_pred").agg(count(lit(1)).as("n"))
        .orderBy("lang_pred")
    },

    // Overlapping token-window chunking (the pre-embedding step):
    // 64-token chunks, 16-token overlap. DuckDB re-derives every chunk
    // string and count from the same windowing arithmetic.
    dfq("q_text_chunks",
      "WITH toks AS (SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM documents), " +
        "lists AS (SELECT doc_id, " +
        "  [array_to_string(t[(CAST(i AS INT)*48+1):(CAST(i AS INT)*48+64)], ' ') " +
        "   FOR i IN range(0, greatest(CAST(ceil((len(t)-16)/48.0) AS BIGINT), 1))] AS cs " +
        "  FROM toks) " +
        "SELECT doc_id, CAST(generate_subscripts(cs, 1) - 1 AS BIGINT) AS chunk_idx, " +
        "  unnest(cs) AS chunk_text " +
        "FROM lists ORDER BY doc_id, chunk_idx") { (s, dir) =>
      TextAnalysis.chunk(
          Tables.load(s, dir, "documents"), "doc_id", "text",
          chunkTokens = 64, overlap = 16)
        .select(col("doc_id"), col("chunk_idx").cast("long"), col("chunk_text"))
        .orderBy("doc_id", "chunk_idx")
    },

    // Quality scores + BPE-ish token counts, composed — ORACLE-CHECKED:
    // DuckDB re-derives the extraction-based subword count and the full
    // quality arithmetic (length gate, punct/digit density, stopword hit
    // rate, token diversity) term-for-term in the same evaluation order.
    dfq("q_text_pipeline",
      "WITH toks AS (" +
        "  SELECT doc_id, text, string_split_regex(lower(text), '\\s+') AS t FROM documents) " +
        "SELECT doc_id, CAST(len(t) AS INT) AS n_tokens_ws, " +
        "  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS INT) AS n_tokens_bpe, " +
        "  round(" +
        "    (CASE WHEN length(text) BETWEEN 20 AND 20000 THEN 1.0 ELSE 0.3 END)" +
        "    * (1.0 - least(CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE) / greatest(length(text), 1) * 3, 1.0))" +
        "    * (1.0 - least(CAST(length(text) - length(regexp_replace(text, '\\p{N}', '', 'g')) AS DOUBLE) / greatest(length(text), 1) * 3, 1.0))" +
        "    * least(CAST(len(list_intersect(list_distinct(t), ['the','a','of','and','to','in','is','that','it','for'])) AS DOUBLE) / greatest(len(t), 1) * 5 + 0.5, 1.0)" +
        "    * least(CAST(len(list_distinct(t)) AS DOUBLE) / greatest(len(t), 1) * 2, 1.0), 6) AS quality " +
        "FROM toks ORDER BY doc_id") { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      TextAnalysis.withQualityScore(
          TextAnalysis.withTokenCounts(docs, "text"), "text")
        .select("doc_id", "n_tokens_ws", "n_tokens_bpe", "quality")
        .orderBy("doc_id")
    },

    // Content fingerprints (rolling + order-free set digest). Same
    // partial-soundness pattern as q_dedup_simhash: xxhash64 itself is
    // not SQL-re-derivable (kernel-vs-HOF twins pin it), so the ordered
    // token hashes and distinct-token hashes are emitted and DuckDB
    // independently re-folds BOTH digests — the Karp-Rabin chain
    // (acc·31 + h mod 2³¹-1, seed 17, order-sensitive, via list_reduce
    // over the ordered list) and the XOR set digest — to the same BIGINTs.
    // Hash lists are CSV-serialized in the final select (the comparator
    // cannot sort array columns); the oracle re-splits them to BIGINT
    // lists inside its CTEs before re-folding both digests.
    dfq("q_text_fingerprints",
      "WITH res AS (SELECT doc_id, term_hashes_csv, distinct_hashes_csv FROM " +
        s"read_parquet('${Queries.VerifyOutToken}/q_text_fingerprints/*.parquet')), " +
        "hs AS (SELECT doc_id, term_hashes_csv, distinct_hashes_csv, " +
        "  list_transform(string_split(term_hashes_csv, ','), x -> CAST(x AS BIGINT)) AS term_hashes, " +
        "  list_transform(string_split(distinct_hashes_csv, ','), x -> CAST(x AS BIGINT)) AS distinct_hashes " +
        "  FROM res) " +
        "SELECT doc_id, term_hashes_csv, distinct_hashes_csv, " +
        "  list_reduce(list_prepend(CAST(17 AS BIGINT), " +
        "    list_transform(term_hashes, h -> ((h % 2147483647) + 2147483647) % 2147483647)), " +
        "    (acc, h) -> (acc * 31 + h) % 2147483647) AS fp_rolling, " +
        "  list_reduce(list_prepend(CAST(0 AS BIGINT), distinct_hashes), " +
        "    (acc, h) -> xor(acc, h)) AS fp_set " +
        "FROM hs ORDER BY doc_id") { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val toks = split(lower(col("text")), "\\s+")
      TextAnalysis.withFingerprints(docs, "text")
        .withColumn("term_hashes_csv",
          concat_ws(",", transform(toks, w => xxhash64(w).cast("string"))))
        // Distinct by TOKEN then hashed — the kernel's dedup unit (two
        // tokens colliding on xxhash64 must XOR twice, not once).
        .withColumn("distinct_hashes_csv",
          concat_ws(",", transform(array_distinct(toks), w => xxhash64(w).cast("string"))))
        .select("doc_id", "term_hashes_csv", "distinct_hashes_csv",
          "fp_rolling", "fp_set")
        .orderBy("doc_id")
    },

    // PII scrubbing (emails, IPv4, phone numbers). The base corpus is
    // PII-free word salad, so deterministic synthetic PII is appended per
    // doc — redaction then has real work to do on every row. DuckDB
    // builds the identical string, counts with the same RE2-compatible
    // patterns, and replays the 3-step replace chain to the same md5.
    dfq("q_pii_redact",
      "WITH pii AS (SELECT doc_id, text || ' reach user' || CAST(doc_id AS VARCHAR) " +
        "  || '@ex' || CAST(doc_id % 7 AS VARCHAR) || '.org from 10.' " +
        "  || CAST(doc_id % 200 AS VARCHAR) || '.0.' || CAST(doc_id % 250 + 1 AS VARCHAR) " +
        "  || ' call +1 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t " +
        "  FROM documents) " +
        "SELECT doc_id, " +
        "  CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_email, " +
        "  CAST(len(regexp_extract_all(t, '\\b\\d{1,3}(\\.\\d{1,3}){3}\\b')) AS BIGINT) AS n_ipv4, " +
        "  CAST(len(regexp_extract_all(t, '\\+\\d{1,3}[- ]\\d{3}-\\d{4}')) AS BIGINT) AS n_phone, " +
        "  md5(regexp_replace(regexp_replace(regexp_replace(t, " +
        "    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'), " +
        "    '\\b\\d{1,3}(\\.\\d{1,3}){3}\\b', '<IP>', 'g'), " +
        "    '\\+\\d{1,3}[- ]\\d{3}-\\d{4}', '<PHONE>', 'g')) AS red_md5 " +
        "FROM pii ORDER BY doc_id") { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val withPii = docs.withColumn("_pii_text", concat(
        col("text"), lit(" reach user"), col("doc_id").cast("string"),
        lit("@ex"), (col("doc_id") % 7).cast("string"), lit(".org from 10."),
        (col("doc_id") % 200).cast("string"), lit(".0."),
        (col("doc_id") % 250 + 1).cast("string"), lit(" call +1 555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
      TextAnalysis.withPiiRedacted(withPii, "_pii_text")
        .select(col("doc_id"), col("n_email"), col("n_ipv4"), col("n_phone"),
          md5(col("redacted")).as("red_md5"))
        .orderBy("doc_id")
    },

    // Corpus-self-trained unigram surprisal (the cheap perplexity-filter
    // proxy): bits/token under the corpus's own unigram distribution.
    // Per-token surprisal is an exact INTEGER micro-bit difference of
    // knife-edge-guarded floor(log2(count)*1e6+0.5) lattice values
    // (r14 — the r13 6-dp DECIMAL scheme had one sf0.1 cell one
    // libm-ulp off its rounding boundary), so the document sum is exact
    // and partition-order-free in both engines; the final mean is one
    // IEEE division of exact integers — bit-identical by IEEE-754, no
    // rounding step at all.
    dfq("q_lm_score",
      "WITH toks AS (SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS tok " +
        "  FROM documents), " +
        "vocab AS (SELECT tok, count(*) AS n_w FROM toks GROUP BY tok), " +
        "tot AS (SELECT count(*) AS n_total FROM toks), " +
        "sc AS (SELECT doc_id, " +
        "    CAST(floor(log2(CAST(n_total AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) " +
        "  - CAST(floor(log2(CAST(n_w AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS mb " +
        "  FROM toks JOIN vocab USING (tok) CROSS JOIN tot) " +
        "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens, " +
        "  CAST(sum(mb) AS BIGINT) AS sum_microbits, " +
        "  CAST(sum(mb) AS DOUBLE) / CAST(count(*) * 1000000 AS DOUBLE) AS bits_per_token " +
        "FROM sc GROUP BY doc_id ORDER BY doc_id") { (s, dir) =>
      TextAnalysis.withUnigramSurprisal(
          Tables.load(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    },

    // Bigram conditional surprisal (−log2 P(w|prev), corpus-trained) —
    // the conditional-LM step beyond q_lm_score. DuckDB rebuilds the
    // bigram table with aligned parallel unnests and re-derives every
    // document's micro-bit sum through the same exact integer lattice.
    dfq("q_lm_bigram",
      "WITH toks AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS t " +
        "  FROM documents), " +
        "bg AS (SELECT doc_id, " +
        "    unnest([t[CAST(i - 1 AS INT)] FOR i IN range(2, len(t) + 1)]) AS prev, " +
        "    unnest([t[CAST(i AS INT)] FOR i IN range(2, len(t) + 1)]) AS tok " +
        "  FROM toks WHERE len(t) >= 2), " +
        "cb AS (SELECT prev, tok, count(*) AS n_pair FROM bg GROUP BY prev, tok), " +
        "cp AS (SELECT prev, count(*) AS n_prev FROM bg GROUP BY prev), " +
        "sc AS (SELECT doc_id, " +
        "    CAST(floor(log2(CAST(n_prev AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) " +
        "  - CAST(floor(log2(CAST(n_pair AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS mb " +
        "  FROM bg JOIN cb USING (prev, tok) JOIN cp USING (prev)) " +
        "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams, " +
        "  CAST(sum(mb) AS BIGINT) AS sum_microbits, " +
        "  CAST(sum(mb) AS DOUBLE) / CAST(count(*) * 1000000 AS DOUBLE) AS bits_per_bigram " +
        "FROM sc GROUP BY doc_id ORDER BY doc_id") { (s, dir) =>
      TextAnalysis.withBigramSurprisal(
          Tables.load(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    },

    // Per-document top-3 TF-IDF keywords. The (score desc, term asc)
    // ranking happens on EXACT integer micro-scores — tf · micro-bit
    // idf — so the cut cannot differ across engines; DuckDB re-derives
    // every (rank, term, score) triple.
    dfq("q_tfidf_topk",
      "WITH toks AS (SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS term " +
        "  FROM documents), " +
        "tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term), " +
        "dfreq AS (SELECT term, count(*) AS df_t FROM tf GROUP BY term), " +
        "nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents), " +
        "scored AS (SELECT doc_id, term, " +
        "    tf * (CAST(floor(log2(CAST(n_docs AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) " +
        "        - CAST(floor(log2(CAST(df_t AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)) AS score_micro " +
        "  FROM tf JOIN dfreq USING (term) CROSS JOIN nd), " +
        "ranked AS (SELECT doc_id, term, score_micro, " +
        "    row_number() OVER (PARTITION BY doc_id ORDER BY score_micro DESC, term) AS rnk " +
        "  FROM scored) " +
        "SELECT doc_id, CAST(rnk AS BIGINT) AS rank, term, " +
        "  CAST(score_micro AS DOUBLE) / CAST(1000000 AS DOUBLE) AS score " +
        "FROM ranked WHERE rnk <= 3 ORDER BY doc_id, rank") { (s, dir) =>
      TextAnalysis.withTfIdfTopK(
          Tables.load(s, dir, "documents"), "doc_id", "text", k = 3)
        .orderBy("doc_id", "rank")
    },
  )

  private val corpus: Seq[Entry] = Seq(
    // Repetition-based quality signals (Gopher/C4-style): duplicate-word
    // mass + hottest-2-gram count per document. DuckDB re-derives all
    // three integers from the same tokenization.
    dfq("q_text_repetition",
      "WITH toks AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS w FROM documents), " +
        "base AS (SELECT doc_id, len(w) AS n_words, len(list_distinct(w)) AS n_distinct FROM toks), " +
        "grams AS (SELECT doc_id, unnest([w[CAST(i AS INT)] || ' ' || w[CAST(i+1 AS INT)] " +
        "  FOR i IN range(1, greatest(len(w)-1, 0)+1)]) AS g FROM toks), " +
        "top AS (SELECT doc_id, max(c) AS tc FROM " +
        "  (SELECT doc_id, g, count(*) AS c FROM grams GROUP BY doc_id, g) q GROUP BY doc_id) " +
        "SELECT b.doc_id AS doc_id, CAST(b.n_words AS BIGINT) AS n_words, " +
        "  CAST(b.n_words - b.n_distinct AS BIGINT) AS n_dup_words, " +
        "  CAST(coalesce(t.tc, 0) AS BIGINT) AS top_gram_count " +
        "FROM base b LEFT JOIN top t ON t.doc_id = b.doc_id ORDER BY b.doc_id") { (s, dir) =>
      graft.operators.Corpus.withRepetitionSignals(
          Tables.load(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    },

    // Test-set decontamination: word-4-gram overlap of every document
    // against a held-out benchmark (docs 0-4 stand in for the eval set).
    // DuckDB independently rebuilds both shingle sets and the distinct-
    // overlap counts — at sf0.01 the corpus has 16 organically
    // contaminated docs beyond the 5 benchmark members themselves.
    dfq("q_decontaminate",
      "WITH toks AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS w FROM documents), " +
        "sh AS (SELECT doc_id, [array_to_string(w[CAST(i AS INT):CAST(i+3 AS INT)], ' ') " +
        "  FOR i IN range(1, greatest(len(w)-3, 0)+1)] AS s FROM toks), " +
        "bench AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id < 5), " +
        "ov AS (SELECT sh.doc_id AS doc_id, count(DISTINCT u.g) AS n_overlap " +
        "  FROM sh, unnest(sh.s) AS u(g) WHERE u.g IN (SELECT g FROM bench) GROUP BY sh.doc_id) " +
        "SELECT t.doc_id AS doc_id, CAST(coalesce(o.n_overlap, 0) AS BIGINT) AS n_overlap, " +
        "  CAST(CASE WHEN coalesce(o.n_overlap, 0) > 0 THEN 1 ELSE 0 END AS BIGINT) AS contaminated " +
        "FROM toks t LEFT JOIN ov o ON o.doc_id = t.doc_id ORDER BY t.doc_id") { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      graft.operators.Corpus.decontaminate(
          docs, "doc_id", "text",
          docs.filter(col("doc_id") < 5), "text", n = 4)
        .orderBy("doc_id")
    },

    // Concat-then-chunk sequence packing into 256-token context windows:
    // each doc's global token start offset (distributed prefix sum) and
    // first/last window. DuckDB checks against the plain global window
    // formulation.
    dfq("q_pack_sequences",
      "WITH toks AS (SELECT doc_id, CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n_tokens FROM documents), " +
        "cum AS (SELECT doc_id, n_tokens, sum(n_tokens) OVER " +
        "  (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS start_off FROM toks) " +
        "SELECT doc_id, n_tokens, CAST(start_off AS BIGINT) AS start_off, " +
        "  CAST(floor(start_off / 256.0) AS BIGINT) AS first_window, " +
        "  CAST(floor((start_off + n_tokens - 1) / 256.0) AS BIGINT) AS last_window " +
        "FROM cum ORDER BY doc_id") { (s, dir) =>
      graft.operators.Corpus.packSequences(
          Tables.load(s, dir, "documents"), "doc_id", "text", capacity = 256)
        .orderBy("doc_id")
    },

    // Token-budget selection: longest documents first (priority =
    // -char-length, ties by doc_id), keep the maximal prefix whose
    // cumulative token count fits 10k tokens. DuckDB replays the same
    // ordered window sum and prefix cut.
    dfq("q_token_budget",
      "WITH toks AS (SELECT doc_id, -len(text) AS prio, " +
        "  CAST(len(string_split_regex(lower(text), '\\s+')) AS BIGINT) AS n_tokens FROM documents), " +
        "cum AS (SELECT doc_id, n_tokens, sum(n_tokens) OVER " +
        "  (ORDER BY prio, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens FROM toks) " +
        "SELECT doc_id, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens " +
        "FROM cum WHERE cum_tokens <= 10000 ORDER BY doc_id") { (s, dir) =>
      graft.operators.Corpus.selectToBudget(
          Tables.load(s, dir, "documents")
            .withColumn("_prio", -length(col("text"))),
          "doc_id", "text", budget = 10000L, priorityCol = "_prio")
        .orderBy("doc_id")
    },

    // Deterministic train/val/test partition (80/10/10) by doc_id hash —
    // disjoint labeled assignment, pure map-side. DuckDB re-derives every
    // label from the same md5 boundary rule (0.8 -> 0xcccc, 0.9 -> 0xe666).
    dfq("q_train_split",
      "SELECT doc_id, CASE WHEN h < 'cccc' THEN 'train' " +
        "  WHEN h < 'e666' THEN 'val' ELSE 'test' END AS split " +
        "FROM (SELECT doc_id, substr(md5(CAST(doc_id AS VARCHAR) || '|'), 1, 4) AS h " +
        "  FROM documents) q ORDER BY doc_id") { (s, dir) =>
      graft.operators.Corpus.splitAssign(
          Tables.load(s, dir, "documents"), "doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select("doc_id", "split")
        .orderBy("doc_id")
    },

    // BPE merge learning (3 rounds): the tokenizer-training loop. DuckDB
    // replays every round as a chained CTE — re-counting adjacent symbol
    // pairs, re-deriving the argmax under the same (n desc, pair asc)
    // tie-break, and re-applying the literal greedy replace — so the
    // learned merge table is differentially checked end-to-end.
    dfq("q_bpe_merges",
      "WITH w0 AS (SELECT '  ' || array_to_string(string_split(w, ''), '  ') || '  ' AS s " +
        "  FROM (SELECT unnest(string_split_regex(lower(text), '\\s+')) AS w FROM documents) q " +
        "  WHERE w <> ''), " +
        "p1 AS (SELECT unnest([t[CAST(i AS INT)] FOR i IN range(1, len(t))]) AS l, " +
        "    unnest([t[CAST(i + 1 AS INT)] FOR i IN range(1, len(t))]) AS r " +
        "  FROM (SELECT string_split(trim(s), '  ') AS t FROM w0) q), " +
        "m1 AS (SELECT l, r, count(*) AS n FROM p1 GROUP BY l, r ORDER BY n DESC, l, r LIMIT 1), " +
        "w1 AS (SELECT replace(s, ' ' || m1.l || '  ' || m1.r || ' ', ' ' || m1.l || m1.r || ' ') AS s FROM w0, m1), " +
        "p2 AS (SELECT unnest([t[CAST(i AS INT)] FOR i IN range(1, len(t))]) AS l, " +
        "    unnest([t[CAST(i + 1 AS INT)] FOR i IN range(1, len(t))]) AS r " +
        "  FROM (SELECT string_split(trim(s), '  ') AS t FROM w1) q), " +
        "m2 AS (SELECT l, r, count(*) AS n FROM p2 GROUP BY l, r ORDER BY n DESC, l, r LIMIT 1), " +
        "w2 AS (SELECT replace(s, ' ' || m2.l || '  ' || m2.r || ' ', ' ' || m2.l || m2.r || ' ') AS s FROM w1, m2), " +
        "p3 AS (SELECT unnest([t[CAST(i AS INT)] FOR i IN range(1, len(t))]) AS l, " +
        "    unnest([t[CAST(i + 1 AS INT)] FOR i IN range(1, len(t))]) AS r " +
        "  FROM (SELECT string_split(trim(s), '  ') AS t FROM w2) q), " +
        "m3 AS (SELECT l, r, count(*) AS n FROM p3 GROUP BY l, r ORDER BY n DESC, l, r LIMIT 1) " +
        "SELECT round, l AS left, r AS right, CAST(n AS BIGINT) AS n FROM (" +
        "  SELECT 1 AS round, * FROM m1 UNION ALL " +
        "  SELECT 2, * FROM m2 UNION ALL SELECT 3, * FROM m3) " +
        "ORDER BY round") { (s, dir) =>
      graft.operators.Corpus.bpeMerges(
          Tables.load(s, dir, "documents"), "text", rounds = 3)
        .orderBy("round")
    },

    // BPE inference: learn the 3-round merge table, then tokenize every
    // document with it — per-doc post-merge token count vs pre-merge
    // symbol count (the compression the tokenizer bought). DuckDB
    // re-learns the same merges (chained CTEs as q_bpe_merges) and
    // replays the per-word replace chain document by document.
    dfq("q_bpe_tokenize",
      "WITH w0 AS (SELECT '  ' || array_to_string(string_split(w, ''), '  ') || '  ' AS s " +
        "  FROM (SELECT unnest(string_split_regex(lower(text), '\\s+')) AS w FROM documents) q " +
        "  WHERE w <> ''), " +
        "p1 AS (SELECT unnest([t[CAST(i AS INT)] FOR i IN range(1, len(t))]) AS l, " +
        "    unnest([t[CAST(i + 1 AS INT)] FOR i IN range(1, len(t))]) AS r " +
        "  FROM (SELECT string_split(trim(s), '  ') AS t FROM w0) q), " +
        "m1 AS (SELECT l, r, count(*) AS n FROM p1 GROUP BY l, r ORDER BY n DESC, l, r LIMIT 1), " +
        "w1 AS (SELECT replace(s, ' ' || m1.l || '  ' || m1.r || ' ', ' ' || m1.l || m1.r || ' ') AS s FROM w0, m1), " +
        "p2 AS (SELECT unnest([t[CAST(i AS INT)] FOR i IN range(1, len(t))]) AS l, " +
        "    unnest([t[CAST(i + 1 AS INT)] FOR i IN range(1, len(t))]) AS r " +
        "  FROM (SELECT string_split(trim(s), '  ') AS t FROM w1) q), " +
        "m2 AS (SELECT l, r, count(*) AS n FROM p2 GROUP BY l, r ORDER BY n DESC, l, r LIMIT 1), " +
        "w2 AS (SELECT replace(s, ' ' || m2.l || '  ' || m2.r || ' ', ' ' || m2.l || m2.r || ' ') AS s FROM w1, m2), " +
        "p3 AS (SELECT unnest([t[CAST(i AS INT)] FOR i IN range(1, len(t))]) AS l, " +
        "    unnest([t[CAST(i + 1 AS INT)] FOR i IN range(1, len(t))]) AS r " +
        "  FROM (SELECT string_split(trim(s), '  ') AS t FROM w2) q), " +
        "m3 AS (SELECT l, r, count(*) AS n FROM p3 GROUP BY l, r ORDER BY n DESC, l, r LIMIT 1), " +
        "docs AS (SELECT doc_id, " +
        "    ['  ' || array_to_string(string_split(w, ''), '  ') || '  ' " +
        "     FOR w IN string_split_regex(lower(text), '\\s+')] AS ws, " +
        "    [length(w) FOR w IN string_split_regex(lower(text), '\\s+')] AS wl " +
        "  FROM documents) " +
        "SELECT doc_id, " +
        "  CAST(list_sum([len(string_split_regex(trim(" +
        "    replace(replace(replace(s, " +
        "      ' ' || m1.l || '  ' || m1.r || ' ', ' ' || m1.l || m1.r || ' '), " +
        "      ' ' || m2.l || '  ' || m2.r || ' ', ' ' || m2.l || m2.r || ' '), " +
        "      ' ' || m3.l || '  ' || m3.r || ' ', ' ' || m3.l || m3.r || ' ')" +
        "    ), '  ')) FOR s IN ws]) AS BIGINT) AS n_bpe_tokens, " +
        "  CAST(list_sum(wl) AS BIGINT) AS n_chars_alpha " +
        "FROM docs, m1, m2, m3 ORDER BY doc_id") { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val m = graft.operators.Corpus.bpeMerges(docs, "text", rounds = 3)
        .orderBy("round").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      graft.operators.Corpus.applyBpe(docs, "text", m)
        .select(col("doc_id"), col("n_bpe_tokens"), col("n_chars_alpha"))
        .orderBy("doc_id")
    },

    // Split-leakage audit: near-duplicate pairs whose members landed in
    // DIFFERENT train/val/test splits — the contamination a random
    // document-level split cannot prevent (near-dups of training docs
    // leaking into test). Composes minhash near-dup pairs with the
    // deterministic split labels; DuckDB re-derives both sides from
    // first principles (brute-force all-pairs Jaccard + the md5
    // boundary rule).
    dfq("q_split_leakage",
      "WITH toks AS (SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM documents), " +
        "sh AS (SELECT doc_id, list_distinct([array_to_string(t[CAST(i AS INT):CAST(i+2 AS INT)], ' ') " +
        "  FOR i IN range(1, greatest(len(t)-2, 1)+1)]) AS g FROM toks), " +
        "pairs AS (SELECT a.doc_id AS ia, b.doc_id AS ib FROM sh a JOIN sh b ON a.doc_id < b.doc_id " +
        "  WHERE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE) / len(list_distinct(a.g || b.g)) >= 0.8), " +
        "labeled AS (SELECT doc_id, CASE WHEN h < 'cccc' THEN 'train' " +
        "    WHEN h < 'e666' THEN 'val' ELSE 'test' END AS split " +
        "  FROM (SELECT doc_id, substr(md5(CAST(doc_id AS VARCHAR) || '|'), 1, 4) AS h " +
        "    FROM documents) q) " +
        "SELECT la.split AS split_a, lb.split AS split_b, CAST(count(*) AS BIGINT) AS n_pairs " +
        "FROM pairs p JOIN labeled la ON p.ia = la.doc_id JOIN labeled lb ON p.ib = lb.doc_id " +
        "WHERE la.split <> lb.split GROUP BY 1, 2 ORDER BY 1, 2") { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val pairs = TextDedup.minhashNearDups(docs, "doc_id", "text",
        threshold = 0.8)
      val labeled = graft.operators.Corpus.splitAssign(docs, "doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select("doc_id", "split")
      pairs
        .join(labeled.withColumnsRenamed(
          Map("doc_id" -> "id_a", "split" -> "split_a")), "id_a")
        .join(labeled.withColumnsRenamed(
          Map("doc_id" -> "id_b", "split" -> "split_b")), "id_b")
        .filter(col("split_a") =!= col("split_b"))
        .groupBy("split_a", "split_b")
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("split_a", "split_b")
    },

    // The composed curation flagship: language + quality gate → exact
    // dedup (keep lowest doc_id per normalized text) → unigram-surprisal
    // gate (LM trained on the FULL corpus, applied to survivors) →
    // train/val/test split → per-split doc/token totals. Every stage is
    // an operator with its own green entry; this row proves they compose
    // — DuckDB replays the whole five-stage pipeline end-to-end.
    dfq("q_curation_e2e",
      "WITH toks AS (SELECT doc_id, text, lang, " +
        "    string_split_regex(lower(text), '\\s+') AS t FROM documents), " +
        "qual AS (SELECT doc_id, text, lang, round(" +
        "    (CASE WHEN length(text) BETWEEN 20 AND 20000 THEN 1.0 ELSE 0.3 END)" +
        "    * (1.0 - least(CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE) / greatest(length(text), 1) * 3, 1.0))" +
        "    * (1.0 - least(CAST(length(text) - length(regexp_replace(text, '\\p{N}', '', 'g')) AS DOUBLE) / greatest(length(text), 1) * 3, 1.0))" +
        "    * least(CAST(len(list_intersect(list_distinct(t), ['the','a','of','and','to','in','is','that','it','for'])) AS DOUBLE) / greatest(len(t), 1) * 5 + 0.5, 1.0)" +
        "    * least(CAST(len(list_distinct(t)) AS DOUBLE) / greatest(len(t), 1) * 2, 1.0), 6) AS quality " +
        "  FROM toks), " +
        "kept1 AS (SELECT doc_id, text FROM qual WHERE lang = 'en' AND quality >= 0.45), " +
        "dedup AS (SELECT min(doc_id) AS doc_id FROM kept1 GROUP BY lower(trim(text))), " +
        "ftoks AS (SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS tok FROM documents), " +
        "vocab AS (SELECT tok, count(*) AS n_w FROM ftoks GROUP BY tok), " +
        "tot AS (SELECT count(*) AS n_total FROM ftoks), " +
        "sc AS (SELECT doc_id, " +
        "    CAST(floor(log2(CAST(n_total AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) " +
        "  - CAST(floor(log2(CAST(n_w AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS mb " +
        "  FROM ftoks JOIN vocab USING (tok) CROSS JOIN tot), " +
        "lm AS (SELECT doc_id, count(*) AS n_tokens, " +
        "    CAST(sum(mb) AS DOUBLE) / CAST(count(*) * 1000000 AS DOUBLE) AS bpt " +
        "  FROM sc GROUP BY doc_id), " +
        "kept2 AS (SELECT d.doc_id, lm.n_tokens FROM dedup d JOIN lm ON d.doc_id = lm.doc_id " +
        "  WHERE lm.bpt <= 4.91), " +
        "labeled AS (SELECT doc_id, n_tokens, " +
        "    CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || '|'), 1, 4) < 'cccc' THEN 'train' " +
        "      WHEN substr(md5(CAST(doc_id AS VARCHAR) || '|'), 1, 4) < 'e666' THEN 'val' " +
        "      ELSE 'test' END AS split FROM kept2) " +
        "SELECT split, CAST(count(*) AS BIGINT) AS n_docs, " +
        "  CAST(sum(n_tokens) AS BIGINT) AS n_toks " +
        "FROM labeled GROUP BY split ORDER BY split") { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val kept1 = TextAnalysis.withQualityScore(docs, "text")
        .filter(col("lang") === "en" && col("quality") >= 0.45)
      val dedup = kept1.groupBy(lower(trim(col("text"))))
        .agg(min("doc_id").as("doc_id")).select("doc_id")
      val lm = TextAnalysis.withUnigramSurprisal(docs, "doc_id", "text")
      val kept2 = dedup.join(lm, "doc_id")
        .filter(col("bits_per_token") <= 4.91)
      graft.operators.Corpus.splitAssign(kept2, "doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_toks"))
        .orderBy("split")
    },

    // Domain-mixture sampling: re-balance the corpus to target per-
    // language token weights (en .4 / de .2 / fr .2 / es .1 / zh .1 of
    // an 8k-token budget) by keeping each language's greedy prefix under
    // a deterministic md5 shuffle order. Spark computes the per-group
    // cumulative sums via the GROUPED two-pass prefix (never a
    // PARTITION-BY-language window — one task per language cannot
    // survive 100×); DuckDB re-derives the identical kept set with
    // exactly that window, so the scale-safe plan is differentially
    // pinned against the textbook formulation.
    dfq("q_mixture_sample",
      "WITH toks AS (SELECT doc_id, lang, " +
        "    substr(md5(CAST(doc_id AS VARCHAR) || '|mix'), 1, 8) AS draw, " +
        "    CAST(len(string_split_regex(lower(text), '\\s+')) AS BIGINT) AS n_tokens " +
        "  FROM documents), " +
        "w(lang, cap) AS (VALUES ('en', 3200), ('de', 1600), ('fr', 1600), " +
        "  ('es', 800), ('zh', 800)), " +
        "cum AS (SELECT doc_id, lang, n_tokens, sum(n_tokens) OVER " +
        "    (PARTITION BY lang ORDER BY draw, doc_id " +
        "     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens " +
        "  FROM toks) " +
        "SELECT c.doc_id, c.lang, c.n_tokens, CAST(c.cum_tokens AS BIGINT) AS cum_tokens " +
        "FROM cum c JOIN w USING (lang) WHERE c.cum_tokens <= w.cap " +
        "ORDER BY doc_id") { (s, dir) =>
      graft.operators.Corpus.sampleToMixture(
          Tables.load(s, dir, "documents"), "doc_id", "text", "lang",
          Seq("en" -> 0.4, "de" -> 0.2, "fr" -> 0.2, "es" -> 0.1, "zh" -> 0.1),
          budget = 8000L)
        .orderBy("doc_id")
    },

    // Cross-document repeated 5-token spans (exact-substring dedup at
    // shingle granularity): the boilerplate detector — DuckDB regenerates
    // every span from first principles and re-counts.
    dfq("q_span_repeated",
      "WITH toks AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS t " +
        "  FROM documents), " +
        "g AS (SELECT doc_id, unnest([array_to_string(t[CAST(i AS INT):CAST(i+4 AS INT)], ' ') " +
        "  FOR i IN range(1, greatest(len(t)-4, 0)+1)]) AS span FROM toks) " +
        "SELECT span, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs, " +
        "  CAST(count(*) AS BIGINT) AS n_occ " +
        "FROM g GROUP BY span HAVING count(DISTINCT doc_id) >= 2 " +
        "ORDER BY n_docs DESC, n_occ DESC, span") { (s, dir) =>
      TextDedup.repeatedSpans(
          Tables.load(s, dir, "documents"), "doc_id", "text", k = 5)
        .orderBy(desc("n_docs"), desc("n_occ"), col("span"))
    },

    // Per-document span-sharing profile: how much of each document is
    // made of spans that also occur elsewhere — the removal threshold
    // real pipelines apply when no whole-document duplicate exists.
    // Docs shorter than 5 tokens have no spans and are absent from both
    // engines' outputs.
    dfq("q_span_stats",
      "WITH toks AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS t " +
        "  FROM documents), " +
        "g AS (SELECT doc_id, unnest(list_distinct(" +
        "  [array_to_string(t[CAST(i AS INT):CAST(i+4 AS INT)], ' ') " +
        "   FOR i IN range(1, greatest(len(t)-4, 0)+1)])) AS span FROM toks), " +
        "sh AS (SELECT span FROM g GROUP BY span HAVING count(*) >= 2) " +
        "SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_spans, " +
        "  CAST(count(sh.span) AS BIGINT) AS n_shared, " +
        "  round(CAST(count(sh.span) AS DOUBLE) / count(*), 6) AS shared_frac " +
        "FROM g LEFT JOIN sh ON g.span = sh.span " +
        "GROUP BY g.doc_id ORDER BY doc_id") { (s, dir) =>
      TextDedup.spanShareStats(
          Tables.load(s, dir, "documents"), "doc_id", "text", k = 5)
        .orderBy("doc_id")
    },

    // Sub-document exact dedup with reconstruction — the REMOVAL step:
    // 8-token chunks, first global occurrence (min (doc, idx)) wins,
    // documents rebuilt from survivors. DuckDB replays the whole thing —
    // chunking, keeper election, survivor filter, ordered re-concat —
    // and must reproduce every rebuilt text byte-for-byte. At sf0.01
    // this genuinely fires: 175 chunk occurrences drop across 53 docs,
    // 3 documents dedup away entirely.
    dfq("q_chunk_dedup",
      "WITH toks AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS t " +
        "  FROM documents), " +
        "ch AS (SELECT doc_id, i AS chunk_idx, " +
        "    array_to_string(t[CAST(i*8+1 AS INT):CAST((i+1)*8 AS INT)], ' ') AS chunk " +
        "  FROM toks, unnest(range(0, CAST(ceil(len(t)/8.0) AS INT))) AS r(i)), " +
        "k1 AS (SELECT chunk, min(doc_id) AS kd FROM ch GROUP BY chunk), " +
        "k2 AS (SELECT c.chunk, c.doc_id, min(c.chunk_idx) AS ki FROM ch c " +
        "  JOIN k1 ON c.chunk = k1.chunk AND c.doc_id = k1.kd GROUP BY c.chunk, c.doc_id), " +
        "kept AS (SELECT c.doc_id, c.chunk_idx, c.chunk FROM ch c " +
        "  JOIN k2 ON c.doc_id = k2.doc_id AND c.chunk_idx = k2.ki), " +
        "stats AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks FROM ch GROUP BY doc_id), " +
        "ka AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept, " +
        "    string_agg(chunk, ' ' ORDER BY chunk_idx) AS kept_text FROM kept GROUP BY doc_id) " +
        "SELECT s.doc_id, s.n_chunks, coalesce(ka.n_kept, 0) AS n_kept, " +
        "  coalesce(ka.kept_text, '') AS kept_text " +
        "FROM stats s LEFT JOIN ka ON s.doc_id = ka.doc_id ORDER BY s.doc_id") { (s, dir) =>
      TextDedup.dedupChunksExact(
          Tables.load(s, dir, "documents"), "doc_id", "text", chunkTokens = 8)
        .orderBy("doc_id")
    },

    // Weekly retention cohorts anchored on each user's first signup —
    // epoch-week buckets, pure integer arithmetic, DuckDB re-derives
    // every (cohort, offset, n_users) cell.
    dfq("q_event_retention",
      "WITH a AS (SELECT user_id, min(ts) AS t0 FROM events " +
        "  WHERE event_type = 'signup' GROUP BY user_id), " +
        "act AS (SELECT DISTINCT e.user_id, " +
        "    CAST(floor(floor(epoch(a.t0)) / 604800) AS BIGINT) AS cohort_week, " +
        "    CAST(floor((floor(epoch(e.ts)) - floor(epoch(a.t0))) / 604800) AS BIGINT) AS week_offset " +
        "  FROM events e JOIN a ON e.user_id = a.user_id WHERE e.ts >= a.t0) " +
        "SELECT cohort_week, week_offset, CAST(count(*) AS BIGINT) AS n_users " +
        "FROM act GROUP BY 1, 2 ORDER BY 1, 2") { (s, dir) =>
      graft.operators.Temporal.retention(
          Tables.load(s, dir, "events"), "user_id", "ts", "event_type",
          anchorType = "signup")
        .orderBy("cohort_week", "week_offset")
    },

    // Ordered event funnel (view → click → purchase), greedy-earliest
    // chain per user, conversion iff the chain completes within 300k
    // seconds (≈ the median chain length, so the flag genuinely splits
    // the population). DuckDB re-derives every stage timestamp with the
    // same chained min-joins; second-granularity epochs are emitted AFTER
    // the full-precision chaining on both sides.
    dfq("q_event_funnel",
      "WITH e AS (SELECT user_id, event_type, ts FROM events), " +
        "s1 AS (SELECT user_id, min(ts) AS t1 FROM e WHERE event_type='view' GROUP BY user_id), " +
        "s2 AS (SELECT s1.user_id AS u2, s1.t1, min(e.ts) AS t2 FROM s1 " +
        "  JOIN e ON e.user_id=s1.user_id AND e.event_type='click' AND e.ts > s1.t1 " +
        "  GROUP BY s1.user_id, s1.t1), " +
        "s3 AS (SELECT s2.u2 AS u3, s2.t2, min(e.ts) AS t3 FROM s2 " +
        "  JOIN e ON e.user_id=s2.u2 AND e.event_type='purchase' AND e.ts > s2.t2 " +
        "  GROUP BY s2.u2, s2.t2) " +
        "SELECT s1.user_id, CAST(floor(epoch(s1.t1)) AS BIGINT) AS e1, " +
        "  CAST(floor(epoch(s2.t2)) AS BIGINT) AS e2, " +
        "  CAST(floor(epoch(s3.t3)) AS BIGINT) AS e3, " +
        "  s3.t3 IS NOT NULL AND CAST(floor(epoch(s3.t3)) AS BIGINT) " +
        "    - CAST(floor(epoch(s1.t1)) AS BIGINT) <= 300000 AS converted " +
        "FROM s1 LEFT JOIN s2 ON s1.user_id=s2.u2 LEFT JOIN s3 ON s2.u2=s3.u3 " +
        "ORDER BY user_id") { (s, dir) =>
      graft.operators.Temporal.funnel(
          Tables.load(s, dir, "events"), "user_id", "ts", "event_type",
          Seq("view", "click", "purchase"), withinSec = 300000L)
        .select(col("user_id"),
          unix_timestamp(col("t_1")).as("e1"),
          unix_timestamp(col("t_2")).as("e2"),
          unix_timestamp(col("t_3")).as("e3"),
          col("converted"))
        .orderBy("user_id")
    },

    // Tight-window funnel variant: withinSec = 1 day rejects ~90% of
    // completed chains on this dataset (14/150 convert at sf0.01), so
    // the window-REJECTION branch — converted = false despite all three
    // steps firing — is differentially exercised. The wide entry above
    // (300000 s) keeps roughly half its chains in-window; neither alone
    // pins both sides of the boundary.
    dfq("q_event_funnel_tight",
      "WITH e AS (SELECT user_id, event_type, ts FROM events), " +
        "s1 AS (SELECT user_id, min(ts) AS t1 FROM e WHERE event_type='view' GROUP BY user_id), " +
        "s2 AS (SELECT s1.user_id AS u2, s1.t1, min(e.ts) AS t2 FROM s1 " +
        "  JOIN e ON e.user_id=s1.user_id AND e.event_type='click' AND e.ts > s1.t1 " +
        "  GROUP BY s1.user_id, s1.t1), " +
        "s3 AS (SELECT s2.u2 AS u3, s2.t2, min(e.ts) AS t3 FROM s2 " +
        "  JOIN e ON e.user_id=s2.u2 AND e.event_type='purchase' AND e.ts > s2.t2 " +
        "  GROUP BY s2.u2, s2.t2) " +
        "SELECT s1.user_id, CAST(floor(epoch(s1.t1)) AS BIGINT) AS e1, " +
        "  CAST(floor(epoch(s2.t2)) AS BIGINT) AS e2, " +
        "  CAST(floor(epoch(s3.t3)) AS BIGINT) AS e3, " +
        "  s3.t3 IS NOT NULL AND CAST(floor(epoch(s3.t3)) AS BIGINT) " +
        "    - CAST(floor(epoch(s1.t1)) AS BIGINT) <= 86400 AS converted " +
        "FROM s1 LEFT JOIN s2 ON s1.user_id=s2.u2 LEFT JOIN s3 ON s2.u2=s3.u3 " +
        "ORDER BY user_id") { (s, dir) =>
      graft.operators.Temporal.funnel(
          Tables.load(s, dir, "events"), "user_id", "ts", "event_type",
          Seq("view", "click", "purchase"), withinSec = 86400L)
        .select(col("user_id"),
          unix_timestamp(col("t_1")).as("e1"),
          unix_timestamp(col("t_2")).as("e2"),
          unix_timestamp(col("t_3")).as("e3"),
          col("converted"))
        .orderBy("user_id")
    },

    // Deterministic epoch shuffle: seeded md5 draw -> dense global
    // shuffle position via the distributed prefix index (never a
    // partition-less row_number window). DuckDB re-derives the entire
    // permutation with exactly that window over the same draw rule, so
    // the scale-safe plan is differentially pinned against the textbook
    // formulation — every (doc_id, shuffle_pos) pair must match.
    dfq("q_corpus_shuffle",
      "SELECT doc_id, CAST(row_number() OVER (" +
        "  ORDER BY md5(CAST(doc_id AS VARCHAR) || '|ep1'), doc_id) AS BIGINT) " +
        "  AS shuffle_pos " +
        "FROM documents ORDER BY doc_id") { (s, dir) =>
      graft.operators.Corpus.shuffleOrder(
          Tables.load(s, dir, "documents").select("doc_id"), "doc_id", "ep1")
        .select(col("doc_id"), col("shuffle_pos").cast("long"))
        .orderBy("doc_id")
    },

    // Token-bounded training-shard writer: documents assigned to the
    // shard containing their first token (document-atomic), one
    // partition directory per shard, manifest out. The entry returns the
    // manifest; DuckDB re-derives every (shard, n_docs, n_tokens) row
    // from the same running-sum / floor-division rule. Start offsets
    // ride the distributed prefix sum.
    dfq("q_write_shards",
      "WITH toks AS (SELECT doc_id, " +
        "    CAST(len(string_split_regex(lower(text), '\\s+')) AS BIGINT) AS n " +
        "  FROM documents), " +
        "cum AS (SELECT doc_id, n, sum(n) OVER " +
        "    (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c " +
        "  FROM toks) " +
        "SELECT CAST(floor((c - n) / 1000.0) AS BIGINT) AS shard, " +
        "  CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n) AS BIGINT) AS n_tokens " +
        "FROM cum GROUP BY 1 ORDER BY 1") { (s, dir) =>
      val path = java.nio.file.Files
        .createTempDirectory("graft_shards").toString
      graft.operators.Corpus.writeShards(
          Tables.load(s, dir, "documents"), "doc_id", "text",
          path, tokensPerShard = 1000L)
        .orderBy("shard")
    },

    // The corpus report card — the first query any pipeline runs on new
    // data: per-language documents, whitespace tokens, duplicate-text
    // mass (docs whose normalized text occurs more than once CORPUS-
    // wide), and mean quality. The mean routes through DECIMAL(18,6)
    // (exact, partition-order-free, cross-engine identical); the final
    // divide is one double op rounded to 6 dp.
    dfq("q_corpus_profile",
      "WITH toks AS (SELECT doc_id, lang, text, " +
        "    string_split_regex(lower(text), '\\s+') AS t FROM documents), " +
        "qual AS (SELECT doc_id, lang, len(t) AS n_toks, " +
        "    CAST(round(" +
        "    (CASE WHEN length(text) BETWEEN 20 AND 20000 THEN 1.0 ELSE 0.3 END)" +
        "    * (1.0 - least(CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE) / greatest(length(text), 1) * 3, 1.0))" +
        "    * (1.0 - least(CAST(length(text) - length(regexp_replace(text, '\\p{N}', '', 'g')) AS DOUBLE) / greatest(length(text), 1) * 3, 1.0))" +
        "    * least(CAST(len(list_intersect(list_distinct(t), ['the','a','of','and','to','in','is','that','it','for'])) AS DOUBLE) / greatest(len(t), 1) * 5 + 0.5, 1.0)" +
        "    * least(CAST(len(list_distinct(t)) AS DOUBLE) / greatest(len(t), 1) * 2, 1.0), 6) AS DECIMAL(18,6)) AS quality, " +
        "    lower(trim(text)) AS norm FROM toks), " +
        "dups AS (SELECT norm FROM qual GROUP BY norm HAVING count(*) > 1) " +
        "SELECT q.lang, CAST(count(*) AS BIGINT) AS n_docs, " +
        "  CAST(sum(q.n_toks) AS BIGINT) AS n_tokens, " +
        "  CAST(count(d.norm) AS BIGINT) AS n_dup_docs, " +
        "  round(CAST(sum(q.quality) AS DOUBLE) / count(*), 6) AS avg_quality " +
        "FROM qual q LEFT JOIN dups d ON q.norm = d.norm " +
        "GROUP BY q.lang ORDER BY q.lang") { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val qual = TextAnalysis.withQualityScore(docs, "text")
        .select(col("doc_id"), col("lang"),
          size(split(lower(col("text")), "\\s+")).cast("long").as("n_toks"),
          col("quality").cast("decimal(18,6)").as("quality"),
          lower(trim(col("text"))).as("norm"))
      val dups = qual.groupBy("norm").agg(count(lit(1)).as("_n"))
        .filter(col("_n") > 1).select(col("norm"), lit(1L).as("_dup"))
      qual.join(dups, Seq("norm"), "left")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("n_toks").as("n_tokens"),
          count(col("_dup")).as("n_dup_docs"),
          round(sum("quality").cast("double") / count(lit(1)), 6).as("avg_quality"))
        .orderBy("lang")
    },

    // Corpus-quantile quality gate: drop the bottom quartile BY RANK
    // (order statistic, not interpolated percentile — integer semantics
    // that cannot flip on a float boundary between engines). The global
    // rank comes from the distributed prefix index, never a
    // partition-less row_number window; DuckDB re-ranks with exactly
    // that window and re-derives the quality formula from first
    // principles.
    dfq("q_quality_gate",
      "WITH toks AS (SELECT doc_id, lang, text, " +
        "    string_split_regex(lower(text), '\\s+') AS t FROM documents), " +
        "qual AS (SELECT doc_id, lang, round(" +
        "    (CASE WHEN length(text) BETWEEN 20 AND 20000 THEN 1.0 ELSE 0.3 END)" +
        "    * (1.0 - least(CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE) / greatest(length(text), 1) * 3, 1.0))" +
        "    * (1.0 - least(CAST(length(text) - length(regexp_replace(text, '\\p{N}', '', 'g')) AS DOUBLE) / greatest(length(text), 1) * 3, 1.0))" +
        "    * least(CAST(len(list_intersect(list_distinct(t), ['the','a','of','and','to','in','is','that','it','for'])) AS DOUBLE) / greatest(len(t), 1) * 5 + 0.5, 1.0)" +
        "    * least(CAST(len(list_distinct(t)) AS DOUBLE) / greatest(len(t), 1) * 2, 1.0), 6) AS quality " +
        "  FROM toks), " +
        "r AS (SELECT doc_id, lang, quality, " +
        "    row_number() OVER (ORDER BY quality, doc_id) AS rn, " +
        "    count(*) OVER () AS n FROM qual) " +
        "SELECT lang, CAST(count(*) AS BIGINT) AS n_kept, min(quality) AS min_q " +
        "FROM r WHERE rn > floor(0.25 * n) GROUP BY lang ORDER BY lang") { (s, dir) =>
      val qual = TextAnalysis.withQualityScore(
          Tables.load(s, dir, "documents"), "text")
        .select(col("doc_id"), col("lang"), col("quality"))
      val ranked = graft.operators.Prefix.withRunningSums(
        qual, "quality", Nil, tieCols = Seq("doc_id"))
      val n = ranked.agg(max("_idx").as("_n"))
      ranked.crossJoin(broadcast(n))
        .filter(col("_idx") > floor(lit(0.25) * col("_n")))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_kept"), min("quality").as("min_q"))
        .orderBy("lang")
    },
  )

  /** Deterministic RGB raster per document — the differential image
    * fixture: (doc_id, w, h, pixels) with w·h row-major 0xRRGGBB ints
    * from pure SQL expressions, so the DuckDB oracle regenerates the
    * identical raster with a list comprehension.
    */
  /** Shared NN-resize oracle (DuckDB): re-derives the 6×5
    * integer-division nearest-neighbor sample of the generated raster
    * and its checksums. ONE source for BOTH q_image_resize (dedicated
    * resizeImage) and q_media_resize_png (generic resize's PNG branch)
    * — the two entries exist to prove the two code paths agree, so the
    * expected output must be literally the same text.
    */
  private val resizeNnOracleSql: String =
    "WITH gen AS (SELECT doc_id, 4 + doc_id % 13 AS w, 4 + doc_id % 11 AS h " +
      "  FROM documents), " +
      "px AS (SELECT doc_id, w, h, " +
      "  [((doc_id*7 + i*3) % 256) * 65536 + ((doc_id*11 + i*5) % 256) * 256 " +
      "   + ((doc_id*13 + i*7) % 256) FOR i IN range(0, w*h)] AS pixels FROM gen), " +
      "rs AS (SELECT doc_id, " +
      "  [pixels[CAST(((i // 6) * h // 5) * w + ((i % 6) * w // 6) + 1 AS INT)] " +
      "   FOR i IN range(0, 30)] AS rp FROM px) " +
      "SELECT doc_id, CAST(6 AS INT) AS width, CAST(5 AS INT) AS height, " +
      "  CAST(len(rp) AS BIGINT) AS n_px, " +
      "  CAST(list_sum(list_transform(rp, p -> p // 65536)) AS BIGINT) AS sum_r, " +
      "  CAST(list_sum(list_transform(rp, p -> (p // 256) % 256)) AS BIGINT) AS sum_g, " +
      "  CAST(list_sum(list_transform(rp, p -> p % 256)) AS BIGINT) AS sum_b, " +
      "  md5(array_to_string(rp, ',')) AS pix_md5 " +
      "FROM rs ORDER BY doc_id"

  /** Rebalance the (single-file, one-partition) documents scan BEFORE the
    * raster/wave generators below (r21): the interpreted array-building
    * HOFs are the expensive part of these fixtures, and a repartition
    * placed after them (inside the codec operators) would leave the
    * generation serial and only shuffle the generated arrays. The
    * shuffle here carries doc_id-projection rows, a few bytes each;
    * hash-on-id (retry-deterministic), no-op when already wide.
    */
  private def spreadDocs(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val target = docs.sparkSession.sparkContext.defaultParallelism
    if (docs.rdd.getNumPartitions < target) docs.repartition(target, col("doc_id"))
    else docs
  }

  private def imageRaster(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    spreadDocs(docs).select(col("doc_id"),
        (pmod(col("doc_id"), lit(13)) + 4).cast("int").as("w"),
        (pmod(col("doc_id"), lit(11)) + 4).cast("int").as("h"))
      .withColumn("pixels",
        transform(sequence(lit(0L), col("w").cast("long") * col("h") - 1),
          i => (pmod(col("doc_id") * 7 + i * 3, lit(256)) * 65536 +
            pmod(col("doc_id") * 11 + i * 5, lit(256)) * 256 +
            pmod(col("doc_id") * 13 + i * 7, lit(256))).cast("int")))

  /** Reduce a decoded raster to the differential projection: dims,
    * per-channel sums (bit-shift channel extraction — stays integer),
    * and md5 over the comma-joined packed pixels.
    */
  private def imageChecksums(dec: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    dec.select(col("doc_id"), col("width"), col("height"),
      size(col("pixels")).cast("long").as("n_px"),
      aggregate(col("pixels"), lit(0L),
        (acc, p) => acc + shiftright(p, 16).cast("long")).as("sum_r"),
      aggregate(col("pixels"), lit(0L),
        (acc, p) => acc + shiftright(p, 8).bitwiseAND(lit(255)).cast("long")).as("sum_g"),
      aggregate(col("pixels"), lit(0L),
        (acc, p) => acc + p.bitwiseAND(lit(255)).cast("long")).as("sum_b"),
      md5(concat_ws(",", transform(col("pixels"), _.cast("string"))).cast("binary"))
        .as("pix_md5"))

  /** Deterministic 16-bit PCM waveform per document — the differential
    * audio fixture: (doc_id, n, samples) with n signed-16-bit mono
    * samples from pure SQL expressions (the Knuth-hash multiplier makes
    * the wave oscillate, so zero-crossing counts are non-degenerate);
    * the DuckDB oracle regenerates the identical samples with a list
    * comprehension.
    */
  private def audioWave(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    docs.select(col("doc_id"),
        (lit(200) + pmod(col("doc_id"), lit(57))).cast("int").as("n"))
      .withColumn("samples",
        transform(sequence(lit(0L), col("n").cast("long") - 1),
          i => (pmod(col("doc_id") * 31 + i * lit(2654435761L), lit(65536L)) - 32768)
            .cast("int")))

  /** Reduce decoded audio to the differential projection: rate/channels/
    * count, exact BIGINT sample sum and energy, md5 over the
    * comma-joined samples — integer-exact end to end.
    */
  private def audioChecksums(dec: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    dec.select(col("doc_id"), col("sample_rate"), col("channels"),
      size(col("samples")).cast("long").as("n_samples"),
      aggregate(col("samples"), lit(0L),
        (acc, s) => acc + s.cast("long")).as("sum_s"),
      aggregate(col("samples"), lit(0L),
        (acc, s) => acc + s.cast("long") * s.cast("long")).as("sum_sq"),
      md5(concat_ws(",", transform(col("samples"), _.cast("string"))).cast("binary"))
        .as("smp_md5"))

  private val multimodal: Seq[Entry] = Seq(
    // Binary payload + typed metadata struct (the multimodal column
    // contract) — metadata is SQL-checkable against DuckDB.
    sql2("q_multimodal_meta",
      "SELECT doc_id, CAST(octet_length(CAST(text AS BINARY)) AS BIGINT) AS n_bytes, " +
        "substr(text, 1, 16) AS head FROM documents ORDER BY doc_id",
      "SELECT doc_id, CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes, " +
        "substr(text, 1, 16) AS head FROM documents ORDER BY doc_id"),

    // Stubbed decode → fixed-length float features via mapPartitions
    // (partition-batched decoder shape; see Multimodal.extractFeatures).
    // ORACLE-CHECKED (r10): the stub decode is deterministic byte
    // arithmetic (FNV-1a-style fold + float32 accumulation), so DuckDB
    // re-derives it from first principles via a recursive CTE — one
    // iteration per byte index, every doc advanced in lockstep, HUGEINT
    // emulating the 64-bit wrap-around multiply (mod 2^64) and REAL
    // casts replaying the exact float32 addition order. Testdata text is
    // pure ASCII, so ascii(substr(..)) ≡ the UTF-8 payload bytes Spark
    // folds. Fixed-point floor(x·1e4+0.5) because per-row round()
    // differs between engines on .5 boundaries.
    dfq("q_multimodal_decode",
      "WITH RECURSIVE steps AS (" +
        "  SELECT doc_id, text, length(text) AS n, 0 AS i, " +
        "    CAST(14695981039346656037 AS HUGEINT) AS h, " +
        "    CAST(0 AS REAL) AS f0, CAST(0 AS REAL) AS f7 " +
        "  FROM documents " +
        "  UNION ALL " +
        "  SELECT doc_id, text, n, i + 1, nh, " +
        "    CAST(CASE WHEN i % 8 = 0 THEN f0 + CAST((nh >> 40) & 255 AS REAL)/CAST(255 AS REAL) ELSE f0 END AS REAL), " +
        "    CAST(CASE WHEN i % 8 = 7 THEN f7 + CAST((nh >> 40) & 255 AS REAL)/CAST(255 AS REAL) ELSE f7 END AS REAL) " +
        "  FROM (SELECT doc_id, text, n, i, f0, f7, " +
        "      (xor(h, CAST(ascii(substr(text, i + 1, 1)) AS HUGEINT)) * 1099511628211) % 18446744073709551616 AS nh " +
        "    FROM steps WHERE i < n) t) " +
        "SELECT doc_id, CAST(floor(CAST(f0 AS DOUBLE) * 10000 + 0.5) AS BIGINT) AS f0fp, " +
        "  CAST(floor(CAST(f7 AS DOUBLE) * 10000 + 0.5) AS BIGINT) AS f7fp " +
        "FROM steps WHERE i = n ORDER BY doc_id") { (s, dir) =>
      val media = Multimodal.asMediaTable(
        Tables.load(s, dir, "documents"), "doc_id", "text")
      Multimodal.extractFeatures(media, "doc_id", dim = 8)
        .select(col("doc_id"),
          floor(element_at(col("features"), 1).cast("double") * 10000 + 0.5)
            .cast("long").as("f0fp"),
          floor(element_at(col("features"), 8).cast("double") * 10000 + 0.5)
            .cast("long").as("f7fp"))
        .orderBy("doc_id")
    },

    // Deterministic frame sampling over payload byte windows — ORACLE-
    // CHECKED: the md5-prefix frame checksums are re-derived by DuckDB on
    // the same windows (testdata text is ASCII, so VARCHAR substr ≡ the
    // byte slices Spark computes on the binary payload; non-UTF-8
    // byte-exactness is spec-pinned separately in SimilaritySpec).
    dfq("q_multimodal_frames",
      "WITH w AS (SELECT doc_id, CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes, text FROM documents) " +
        "SELECT doc_id, n_bytes, CAST(f AS INT) AS frame, " +
        "substr(md5(substr(text, CAST(f * greatest(n_bytes // 4, 1) + 1 AS BIGINT), CAST(greatest(n_bytes // 4, 1) AS BIGINT))), 1, 16) AS frame_checksum " +
        "FROM w CROSS JOIN (SELECT unnest([0,1,2,3]) AS f) fr " +
        "ORDER BY doc_id, frame") { (s, dir) =>
      val media = Multimodal.asMediaTable(
        Tables.load(s, dir, "documents"), "doc_id", "text")
      Multimodal.sampleFrames(media, "doc_id", frames = 4)
        .orderBy("doc_id", "frame")
    },

    // REAL PNG codec round-trip (r13 verdict #2): a deterministic RGB
    // raster is generated with pure SQL expressions, encoded to real
    // PNG bytes by the JDK's javax.imageio writer (mapPartitions — one
    // codec init per partition), decoded back with the real reader, and
    // reduced to dims + per-channel sums + an md5 over the row-major
    // packed pixels. PNG is LOSSLESS, so the ORACLE needs no codec:
    // DuckDB re-derives the expected checksums from the same generator
    // in pure SQL — any encoder/decoder defect (channel swap, gamma/ICC
    // contamination, row-order bug, truncation) breaks the hash.
    dfq("q_image_decode",
      "WITH gen AS (SELECT doc_id, 4 + doc_id % 13 AS w, 4 + doc_id % 11 AS h " +
        "  FROM documents), " +
        "px AS (SELECT doc_id, w, h, " +
        "  [((doc_id*7 + i*3) % 256) * 65536 + ((doc_id*11 + i*5) % 256) * 256 " +
        "   + ((doc_id*13 + i*7) % 256) FOR i IN range(0, w*h)] AS pixels FROM gen) " +
        "SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height, " +
        "  CAST(len(pixels) AS BIGINT) AS n_px, " +
        "  CAST(list_sum(list_transform(pixels, p -> p // 65536)) AS BIGINT) AS sum_r, " +
        "  CAST(list_sum(list_transform(pixels, p -> (p // 256) % 256)) AS BIGINT) AS sum_g, " +
        "  CAST(list_sum(list_transform(pixels, p -> p % 256)) AS BIGINT) AS sum_b, " +
        "  md5(array_to_string(pixels, ',')) AS pix_md5 " +
        "FROM px ORDER BY doc_id") { (s, dir) =>
      val png = Multimodal.encodePng(
        imageRaster(Tables.load(s, dir, "documents")), "doc_id", "w", "h", "pixels")
      imageChecksums(Multimodal.decodeImage(png, "doc_id")).orderBy("doc_id")
    },

    // REAL resize through the codec: PNG decode → deterministic
    // nearest-neighbor 6×5 sample (integer-division index math — exactly
    // reproducible in SQL, unlike Graphics2D interpolation) → PNG
    // re-encode → decode again. The oracle replays the NN sampling on
    // the generated raster; exact dims + conservation checksums.
    dfq("q_image_resize", resizeNnOracleSql) { (s, dir) =>
      val png = Multimodal.encodePng(
        imageRaster(Tables.load(s, dir, "documents")), "doc_id", "w", "h", "pixels")
      val small = Multimodal.resizeImage(png, "doc_id", tw = 6, th = 5)
      imageChecksums(Multimodal.decodeImage(small, "doc_id")).orderBy("doc_id")
    },

    // Feature extraction over REALLY-DECODED pixels: extractFeatures
    // magic-sniffs the PNG payload, inflates it with the JDK reader, and
    // runs the FNV feature fold over the decoded row-major RGB bytes —
    // NOT the compressed stream (a fold over deflate bytes would change
    // with the encoder's compression level). The oracle replays the fold
    // over the generator's RGB byte sequence with the same recursive-CTE
    // float32 arithmetic as q_multimodal_decode — so a decode that
    // returned wrong pixels, wrong channel order, or the raw stream
    // hash-fails.
    dfq("q_image_features",
      "WITH RECURSIVE gen AS (SELECT doc_id, 4 + doc_id % 13 AS w, 4 + doc_id % 11 AS h " +
        "  FROM documents), " +
        "bts AS (SELECT doc_id, " +
        "  [CASE j % 3 WHEN 0 THEN (doc_id*7 + (j//3)*3) % 256 " +
        "              WHEN 1 THEN (doc_id*11 + (j//3)*5) % 256 " +
        "              ELSE (doc_id*13 + (j//3)*7) % 256 END " +
        "   FOR j IN range(0, 3*w*h)] AS bs FROM gen), " +
        "steps AS (" +
        "  SELECT doc_id, bs, len(bs) AS n, 0 AS i, " +
        "    CAST(14695981039346656037 AS HUGEINT) AS h, CAST(0 AS REAL) AS f0 " +
        "  FROM bts " +
        "  UNION ALL " +
        "  SELECT doc_id, bs, n, i + 1, nh, " +
        "    CAST(CASE WHEN i % 4 = 0 THEN f0 + CAST((nh >> 40) & 255 AS REAL)/CAST(255 AS REAL) ELSE f0 END AS REAL) " +
        "  FROM (SELECT doc_id, bs, n, i, f0, " +
        "      (xor(h, CAST(bs[i + 1] AS HUGEINT)) * 1099511628211) % 18446744073709551616 AS nh " +
        "    FROM steps WHERE i < n) t) " +
        "SELECT doc_id, CAST(floor(CAST(f0 AS DOUBLE) * 10000 + 0.5) AS BIGINT) AS f0fp " +
        "FROM steps WHERE i = n ORDER BY doc_id") { (s, dir) =>
      val png = Multimodal.encodePng(
        imageRaster(Tables.load(s, dir, "documents")), "doc_id", "w", "h", "pixels")
      Multimodal.extractFeatures(png, "doc_id", dim = 4)
        .select(col("doc_id"),
          floor(element_at(col("features"), 1).cast("double") * 10000 + 0.5)
            .cast("long").as("f0fp"))
        .orderBy("doc_id")
    },

    // OPAQUE-payload resize (stride-sampled payload to a pixel budget)
    // composed with feature extraction — media table in, media table
    // out. The payloads here are raw text bytes no codec claims, so the
    // generic Multimodal.resize takes its opaque fallback branch (PNG
    // payloads take the REAL decode→NN-scale→re-encode branch — proven
    // by q_media_resize_png below). ORACLE-CHECKED (r10): the 64×64
    // budget is 64 bytes, so DuckDB first re-derives the stride sample
    // ((i·stride).toInt in the same double arithmetic) as a byte list,
    // then replays the decode fold over it exactly as the
    // q_multimodal_decode oracle does.
    dfq("q_multimodal_resize",
      "WITH RECURSIVE src AS (SELECT doc_id, text, length(text) AS n FROM documents), " +
        "resized AS (SELECT doc_id, " +
        "  CASE WHEN n <= 64 THEN [ascii(substr(text, CAST(j AS INT) + 1, 1)) FOR j IN range(0, n)] " +
        "       ELSE [ascii(substr(text, CAST(floor(CAST(j AS DOUBLE) * (CAST(n AS DOUBLE)/64)) AS INT) + 1, 1)) FOR j IN range(0, 64)] " +
        "  END AS bs FROM src), " +
        "steps AS (" +
        "  SELECT doc_id, bs, len(bs) AS n, 0 AS i, " +
        "    CAST(14695981039346656037 AS HUGEINT) AS h, CAST(0 AS REAL) AS f0 " +
        "  FROM resized " +
        "  UNION ALL " +
        "  SELECT doc_id, bs, n, i + 1, nh, " +
        "    CAST(CASE WHEN i % 4 = 0 THEN f0 + CAST((nh >> 40) & 255 AS REAL)/CAST(255 AS REAL) ELSE f0 END AS REAL) " +
        "  FROM (SELECT doc_id, bs, n, i, f0, " +
        "      (xor(h, CAST(bs[i + 1] AS HUGEINT)) * 1099511628211) % 18446744073709551616 AS nh " +
        "    FROM steps WHERE i < n) t) " +
        "SELECT doc_id, CAST(floor(CAST(f0 AS DOUBLE) * 10000 + 0.5) AS BIGINT) AS f0fp " +
        "FROM steps WHERE i = n ORDER BY doc_id") { (s, dir) =>
      val media = Multimodal.asMediaTable(
        Tables.load(s, dir, "documents"), "doc_id", "text")
      val small = Multimodal.resize(media, "doc_id", width = 64, height = 64)
      Multimodal.extractFeatures(small, "doc_id", dim = 4)
        .select(col("doc_id"),
          floor(element_at(col("features"), 1).cast("double") * 10000 + 0.5)
            .cast("long").as("f0fp"))
        .orderBy("doc_id")
    },

    // The GENERIC media resize on REAL PNG payloads (r15 verdict #4):
    // the same media table contract as q_multimodal_resize, but the
    // payloads are real PNGs, so Multimodal.resize magic-sniffs them
    // and takes the decode → NN-scale → re-encode branch instead of the
    // opaque stride fallback. The pipeline then really decodes the
    // resized payloads and checksums the rasters; the ORACLE replays
    // the identical integer-division NN sampling on the generated
    // source raster (PNG is lossless, so no codec is needed oracle-
    // side). Any stride-sampling of compressed bytes here would
    // hash-fail instantly — this is the proof the stub comment used to
    // disclaim.
    dfq("q_media_resize_png", resizeNnOracleSql) { (s, dir) =>
      val png = Multimodal.encodePng(
        imageRaster(Tables.load(s, dir, "documents")), "doc_id", "w", "h", "pixels")
      val small = Multimodal.resize(png, "doc_id", width = 6, height = 5)
      imageChecksums(Multimodal.decodeImage(small, "doc_id")).orderBy("doc_id")
    },

    // REAL WAV codec round-trip (retires the last multimodal stub): a
    // deterministic 16-bit PCM waveform is generated with pure SQL
    // expressions, encoded to real WAV bytes by the JDK's
    // javax.sound.sampled writer (mapPartitions — one format handle per
    // partition), decoded back with the real reader, and reduced to
    // rate/channels/count + exact integer sum/energy + an md5 over the
    // samples. 16-bit PCM WAV is LOSSLESS, so the ORACLE needs no codec:
    // DuckDB re-derives the expected values from the same generator in
    // pure SQL — any codec defect (byte-order swap, header contamination
    // of the data chunk, truncation, sign error) breaks the hash.
    dfq("q_audio_decode",
      "WITH gen AS (SELECT doc_id, 200 + doc_id % 57 AS n FROM documents), " +
        "smp AS (SELECT doc_id, n, " +
        "  [((doc_id*31 + i*2654435761) % 65536) - 32768 FOR i IN range(0, n)] AS samples FROM gen) " +
        "SELECT doc_id, CAST(8000 AS INT) AS sample_rate, CAST(1 AS INT) AS channels, " +
        "  CAST(n AS BIGINT) AS n_samples, " +
        "  CAST(list_sum(samples) AS BIGINT) AS sum_s, " +
        "  CAST(list_sum(list_transform(samples, s -> s*s)) AS BIGINT) AS sum_sq, " +
        "  md5(array_to_string(samples, ',')) AS smp_md5 " +
        "FROM smp ORDER BY doc_id") { (s, dir) =>
      val wav = Multimodal.encodeWav(
        audioWave(Tables.load(s, dir, "documents")), "doc_id", "samples",
        sampleRate = 8000)
      audioChecksums(Multimodal.decodeWav(wav, "doc_id")).orderBy("doc_id")
    },

    // REAL resample through the codec: WAV decode → deterministic
    // decimation by 2 (every other sample — exact, no interpolation) →
    // WAV re-encode at the halved rate → decode again. The oracle
    // replays the decimation on the generated samples; exact counts +
    // conservation checksums prove BOTH codec passes lossless.
    dfq("q_audio_resample",
      "WITH gen AS (SELECT doc_id, 200 + doc_id % 57 AS n FROM documents), " +
        "smp AS (SELECT doc_id, n, " +
        "  [((doc_id*31 + i*2654435761) % 65536) - 32768 FOR i IN range(0, n)] AS samples FROM gen), " +
        "dec AS (SELECT doc_id, n, [samples[i] FOR i IN range(1, CAST(n AS INT)+1, 2)] AS ds FROM smp) " +
        "SELECT doc_id, CAST(4000 AS INT) AS sample_rate, CAST(1 AS INT) AS channels, " +
        "  CAST(len(ds) AS BIGINT) AS n_samples, " +
        "  CAST(list_sum(ds) AS BIGINT) AS sum_s, " +
        "  CAST(list_sum(list_transform(ds, s -> s*s)) AS BIGINT) AS sum_sq, " +
        "  md5(array_to_string(ds, ',')) AS smp_md5 " +
        "FROM dec ORDER BY doc_id") { (s, dir) =>
      val wav = Multimodal.encodeWav(
        audioWave(Tables.load(s, dir, "documents")), "doc_id", "samples",
        sampleRate = 8000)
      val decimated = Multimodal.decodeWav(wav, "doc_id")
        .select(col("doc_id"),
          filter(col("samples"), (_, i) => pmod(i, lit(2)) === 0).as("samples"))
      val wav2 = Multimodal.encodeWav(decimated, "doc_id", "samples",
        sampleRate = 4000)
      audioChecksums(Multimodal.decodeWav(wav2, "doc_id")).orderBy("doc_id")
    },

    // Signal metrics over really-decoded samples: zero-crossing count,
    // peak amplitude, total energy — all integer-exact (the products and
    // sums are BIGINT; no transcendental, no rounding). The oracle
    // computes the same three integers from the regenerated wave.
    dfq("q_audio_metrics",
      "WITH gen AS (SELECT doc_id, 200 + doc_id % 57 AS n FROM documents), " +
        "smp AS (SELECT doc_id, n, " +
        "  [((doc_id*31 + i*2654435761) % 65536) - 32768 FOR i IN range(0, n)] AS samples FROM gen) " +
        "SELECT doc_id, " +
        "  CAST(len(list_filter(range(1, CAST(n AS INT)), i -> samples[i]*samples[i+1] < 0)) AS BIGINT) AS zero_crossings, " +
        "  CAST(list_max(list_transform(samples, s -> abs(s))) AS BIGINT) AS peak, " +
        "  CAST(list_sum(list_transform(samples, s -> s*s)) AS BIGINT) AS energy " +
        "FROM smp ORDER BY doc_id") { (s, dir) =>
      val wav = Multimodal.encodeWav(
        audioWave(Tables.load(s, dir, "documents")), "doc_id", "samples",
        sampleRate = 8000)
      Multimodal.decodeWav(wav, "doc_id")
        .select(col("doc_id"),
          aggregate(
            zip_with(
              slice(col("samples"), lit(1), size(col("samples")) - 1),
              slice(col("samples"), lit(2), size(col("samples")) - 1),
              (a, b) => when(a.cast("long") * b.cast("long") < 0, 1L)
                .otherwise(0L)),
            lit(0L), (acc, x) => acc + x).as("zero_crossings"),
          array_max(transform(col("samples"), s => abs(s))).cast("long")
            .as("peak"),
          aggregate(col("samples"), lit(0L),
            (acc, s) => acc + s.cast("long") * s.cast("long")).as("energy"))
        .orderBy("doc_id")
    },

    // Feature extraction over REALLY-DECODED audio: extractFeatures
    // sniffs the RIFF+WAVE signature, decodes the PCM with the JDK
    // reader, and runs the FNV feature fold over the decoded
    // little-endian sample bytes — NOT the container bytes (a fold over
    // the file would hash the 44-byte header too). The oracle replays
    // the fold over the generator's PCM byte sequence with the same
    // recursive-CTE float32 arithmetic as q_image_features — so a decode
    // that returned wrong samples, wrong byte order, or the raw
    // container hash-fails. (Byte identity: the little-endian bytes of
    // signed s are ((s mod 65536) % 256, (s mod 65536) // 256), and with
    // s = raw - 32768 that unsigned value is (raw + 32768) % 65536.)
    dfq("q_audio_features",
      "WITH RECURSIVE gen AS (SELECT doc_id, 200 + doc_id % 57 AS n FROM documents), " +
        "bts AS (SELECT doc_id, " +
        "  [CASE WHEN j % 2 = 0 " +
        "        THEN (((doc_id*31 + (j//2)*2654435761) % 65536 + 32768) % 65536) % 256 " +
        "        ELSE (((doc_id*31 + (j//2)*2654435761) % 65536 + 32768) % 65536) // 256 END " +
        "   FOR j IN range(0, 2*n)] AS bs FROM gen), " +
        "steps AS (" +
        "  SELECT doc_id, bs, len(bs) AS n, 0 AS i, " +
        "    CAST(14695981039346656037 AS HUGEINT) AS h, CAST(0 AS REAL) AS f0 " +
        "  FROM bts " +
        "  UNION ALL " +
        "  SELECT doc_id, bs, n, i + 1, nh, " +
        "    CAST(CASE WHEN i % 4 = 0 THEN f0 + CAST((nh >> 40) & 255 AS REAL)/CAST(255 AS REAL) ELSE f0 END AS REAL) " +
        "  FROM (SELECT doc_id, bs, n, i, f0, " +
        "      (xor(h, CAST(bs[i + 1] AS HUGEINT)) * 1099511628211) % 18446744073709551616 AS nh " +
        "    FROM steps WHERE i < n) t) " +
        "SELECT doc_id, CAST(floor(CAST(f0 AS DOUBLE) * 10000 + 0.5) AS BIGINT) AS f0fp " +
        "FROM steps WHERE i = n ORDER BY doc_id") { (s, dir) =>
      val wav = Multimodal.encodeWav(
        audioWave(Tables.load(s, dir, "documents")), "doc_id", "samples",
        sampleRate = 8000)
      Multimodal.extractFeatures(wav, "doc_id", dim = 4)
        .select(col("doc_id"),
          floor(element_at(col("features"), 1).cast("double") * 10000 + 0.5)
            .cast("long").as("f0fp"))
        .orderBy("doc_id")
    },

    // REAL video frame sampling: per document, 2-4 deterministic RGB
    // frames are each encoded to real PNG, packed into a length-prefixed
    // frame container (Multimodal.packFrames — the minimal honest chunked
    // container shape), then sampleDecodedFrames seeks every 2nd frame BY
    // CHUNK INDEX (skipped frames never touch the codec — the keyframe-
    // sampling access pattern) and decodes the kept ones with the real
    // JDK reader. The oracle regenerates the sampled frames' rasters in
    // pure SQL — a container mis-pack (length/order/offset), a sampling
    // off-by-one, or a decode defect all break the hash.
    dfq("q_video_frames",
      "WITH gen AS (SELECT doc_id, 2 + doc_id % 3 AS nf, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h FROM documents), " +
        "fr AS (SELECT doc_id, w, h, f FROM gen CROSS JOIN (SELECT unnest([0,1,2,3]) AS f) u WHERE f < nf AND f % 2 = 0), " +
        "px AS (SELECT doc_id, f, w, h, " +
        "  [((doc_id*7 + f*19 + i*3) % 256) * 65536 + ((doc_id*11 + f*23 + i*5) % 256) * 256 " +
        "   + ((doc_id*13 + f*29 + i*7) % 256) FOR i IN range(0, w*h)] AS pixels FROM fr) " +
        "SELECT doc_id, CAST(f AS INT) AS frame, CAST(w AS INT) AS width, CAST(h AS INT) AS height, " +
        "  CAST(len(pixels) AS BIGINT) AS n_px, " +
        "  CAST(list_sum(list_transform(pixels, p -> p // 65536)) AS BIGINT) AS sum_r, " +
        "  CAST(list_sum(list_transform(pixels, p -> (p // 256) % 256)) AS BIGINT) AS sum_g, " +
        "  CAST(list_sum(list_transform(pixels, p -> p % 256)) AS BIGINT) AS sum_b, " +
        "  md5(array_to_string(pixels, ',')) AS pix_md5 " +
        "FROM px ORDER BY doc_id, frame") { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      // One row per (doc, frame) with the frame's raster; the composite
      // id doc_id*10+f survives encodePng's (id, payload, meta) contract
      // (n_frames <= 4, so f < 10 — the decomposition is exact).
      val frames = docs.select(col("doc_id"),
          (lit(2) + pmod(col("doc_id"), lit(3))).cast("int").as("nf"),
          (lit(4) + pmod(col("doc_id"), lit(5))).cast("int").as("w"),
          (lit(3) + pmod(col("doc_id"), lit(4))).cast("int").as("h"))
        .select(col("doc_id"), col("w"), col("h"),
          explode(sequence(lit(0), col("nf") - 1)).as("f"))
        .withColumn("pixels",
          transform(sequence(lit(0L), col("w").cast("long") * col("h") - 1),
            i => (pmod(col("doc_id") * 7 + col("f") * 19 + i * 3, lit(256)) * 65536 +
              pmod(col("doc_id") * 11 + col("f") * 23 + i * 5, lit(256)) * 256 +
              pmod(col("doc_id") * 13 + col("f") * 29 + i * 7, lit(256))).cast("int")))
        .withColumn("fid", col("doc_id") * 10 + col("f"))
      val pngFrames = Multimodal.encodePng(frames, "fid", "w", "h", "pixels")
      // Re-assemble each document's ordered frame list (bounded: <= 4
      // small PNGs per group) and pack the container.
      val packed = Multimodal.packFrames(
        pngFrames.select((col("fid") / 10).cast("long").as("doc_id"),
            pmod(col("fid"), lit(10)).cast("int").as("f"), col("payload"))
          .groupBy("doc_id")
          .agg(transform(array_sort(collect_list(struct(col("f"), col("payload")))),
            e => e.getField("payload")).as("frames")),
        "doc_id", "frames")
      Multimodal.sampleDecodedFrames(packed, "doc_id", every = 2)
        .select(col("doc_id"), col("frame"), col("width"), col("height"),
          size(col("pixels")).cast("long").as("n_px"),
          aggregate(col("pixels"), lit(0L),
            (acc, p) => acc + shiftright(p, 16).cast("long")).as("sum_r"),
          aggregate(col("pixels"), lit(0L),
            (acc, p) => acc + shiftright(p, 8).bitwiseAND(lit(255)).cast("long")).as("sum_g"),
          aggregate(col("pixels"), lit(0L),
            (acc, p) => acc + p.bitwiseAND(lit(255)).cast("long")).as("sum_b"),
          md5(concat_ws(",", transform(col("pixels"), _.cast("string"))).cast("binary"))
            .as("pix_md5"))
        .orderBy("doc_id", "frame")
    },

    // REAL MJPEG decode (r16 verdict #8): the same GFV1 chunked container,
    // but the frames are real JPEGs from the JDK's lossy ImageIO codec
    // (Multimodal.encodeJpeg, quality 0.95) — the shape of actual video
    // (MJPEG is literally a chunk stream of JPEG frames). LOSSY means
    // exact pixel checksums are impossible cross-engine, so the check is
    // a DECODE-ERROR BOUND plus codec-free facts: per sampled frame the
    // decoded raster's total |Δr|+|Δg|+|Δb| against the SQL-regenerable
    // source must stay under per-channel MAE 5 — margins measured by the
    // COMMITTED, exhaustive CodecMarginProbeSpec (every distinct frame
    // the fixture can generate, gated per test run): worst codec error
    // on these smooth-gradient frames 1.68, nearest DEFECT signal 21.05
    // (channel swap) and 22.45 (frame misalignment), so the bound
    // separates codec noise from real bugs by >2x on both sides. Dims,
    // frame indices, and pixel counts stay exact. Seeking
    // rides the same chunk-index path as q_video_frames (skipped frames
    // never touch the codec).
    dfq("q_video_decode_mjpeg",
      "WITH gen AS (SELECT doc_id, 2 + doc_id % 3 AS nf, 8 + doc_id % 9 AS w, 6 + doc_id % 7 AS h FROM documents), " +
        "fr AS (SELECT doc_id, w, h, f FROM gen CROSS JOIN (SELECT unnest([0,1,2,3]) AS f) u WHERE f < nf AND f % 2 = 0) " +
        "SELECT doc_id, CAST(f AS INT) AS frame, CAST(w AS INT) AS width, CAST(h AS INT) AS height, " +
        "  CAST(w*h AS BIGINT) AS n_px, CAST(1 AS BIGINT) AS ok " +
        "FROM fr ORDER BY doc_id, frame") { (s, dir) =>
      // spreadDocs + eager checkpoint (r21): the frame raster below is
      // consumed TWICE (the JPEG encode→pack→decode chain and the final
      // source-raster join), and the narrow documents scan serialized
      // the interpreted pixel-array generation and the JPEG codec on
      // one core. One parallel generation, one materialization.
      val docs = spreadDocs(Tables.load(s, dir, "documents"))
      val wL = col("w").cast("long")
      val framesBuilt = docs.select(col("doc_id"),
          (lit(2) + pmod(col("doc_id"), lit(3))).cast("int").as("nf"),
          (lit(8) + pmod(col("doc_id"), lit(9))).cast("int").as("w"),
          (lit(6) + pmod(col("doc_id"), lit(7))).cast("int").as("h"))
        .select(col("doc_id"), col("w"), col("h"),
          explode(sequence(lit(0), col("nf") - 1)).as("f"))
        .withColumn("pixels",
          transform(sequence(lit(0L), col("w").cast("long") * col("h") - 1), { i =>
            // x = i mod w, y = i div w — floor() because Column./ is
            // DOUBLE division (exact here: i < 256, then truncated).
            // r and b share the x and f coefficients so r−b = 48−3y ∈
            // [15, 48] on EVERY pixel of EVERY frame: the exhaustive
            // CodecMarginProbeSpec sweep showed the previous formula's
            // worst-case channel-swap signal was 5.48 (9.6% over the
            // MAE-5 bound, not the required >2x) — this shape pushes it
            // to ≥ 2x with the frame-misalignment signal (Δ34 in r and
            // b per frame step) also kept ≫ 2x. All channels ≤ 255 at
            // x ≤ 15, y ≤ 11, f ≤ 3 (no clipping: the packing below is
            // arithmetic, a channel overflow would corrupt neighbors).
            val x = i % wL
            val y = floor(i / wL).cast("long")
            ((lit(60L) + x * 6 + col("f") * 34) * 65536 +
              (lit(64L) + y * 9 + pmod(col("doc_id"), lit(8)) * 2) * 256 +
              (lit(12L) + x * 6 + y * 3 + col("f") * 34)).cast("int")
          }))
        .withColumn("fid", col("doc_id") * 10 + col("f"))
      val frames = graft.operators.OpCaches.trackCheckpoint(
        if (s.sparkContext.getCheckpointDir.isDefined) framesBuilt.checkpoint()
        else framesBuilt.localCheckpoint())
      val jpegFrames = Multimodal.encodeJpeg(
        frames, "fid", "w", "h", "pixels", quality = 0.95f)
      val packed = Multimodal.packFrames(
        jpegFrames.select((col("fid") / 10).cast("long").as("doc_id"),
            pmod(col("fid"), lit(10)).cast("int").as("f"), col("payload"))
          .groupBy("doc_id")
          .agg(transform(array_sort(collect_list(struct(col("f"), col("payload")))),
            e => e.getField("payload")).as("frames")),
        "doc_id", "frames")
      val decoded = Multimodal.sampleDecodedFrames(packed, "doc_id", every = 2)
      val src = frames.select(col("doc_id"), col("f").as("frame"),
        col("pixels").as("src_px"))
      decoded.join(src, Seq("doc_id", "frame"))
        .select(col("doc_id"), col("frame"), col("width"), col("height"),
          size(col("pixels")).cast("long").as("n_px"),
          // total |Δ| across channels vs the source raster, bounded at
          // per-channel MAE 5 (tot ≤ 15·n_px); NULL raster (decode
          // failure) → ok 0 and a NULL n_px — loud, never silent.
          coalesce(
            (aggregate(
              zip_with(col("pixels"), col("src_px"), (p, q) =>
                abs(shiftright(p, 16) - shiftright(q, 16)) +
                  abs(shiftright(p, 8).bitwiseAND(lit(255)) -
                    shiftright(q, 8).bitwiseAND(lit(255))) +
                  abs(p.bitwiseAND(lit(255)) - q.bitwiseAND(lit(255)))),
              lit(0L), (acc, d) => acc + d.cast("long")) <=
              lit(15L) * size(col("src_px")).cast("long")).cast("long"),
            lit(0L)).as("ok"))
        .orderBy("doc_id", "frame")
    },
  )

  /** Dense-cell relation and its 8-neighborhood adjacency for
    * q_grid_cluster: (ids = (cell, cx, cy, n), edges = (ca, cb)).
    * Exposed private[graft] so PlanAuditSpec asserts the adjacency
    * join's executed plan DIRECTLY — inside the entry it is consumed by
    * the checkpointing components loop, which truncates it out of the
    * final plan.
    */
  private[graft] def gridDensityGraph(s: org.apache.spark.sql.SparkSession,
      dir: String): (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val pts = Tables.load(s, dir, "customer").select(
      pmod(conv(substring(md5(concat(col("c_custkey").cast("string"), lit("|gx"))), 1, 4), 16, 10)
        .cast("long"), lit(30L)).as("cx"),
      pmod(conv(substring(md5(concat(col("c_custkey").cast("string"), lit("|gy"))), 1, 4), 16, 10)
        .cast("long"), lit(30L)).as("cy"))
    val cells = pts.groupBy("cx", "cy").agg(count(lit(1)).as("n"))
    // Scale-adaptive threshold: one broadcast singleton scalar
    // (exact integer ceil(1.12·total/900) = (112·total+89999) div 9e4;
    // floor() because Column./ is double division — the remainder is
    // >= 1/90000 whenever non-zero, 6 orders above double ulp, so the
    // floored quotient is the exact integer division).
    val thr = pts.agg(greatest(lit(4L),
      floor((lit(112) * count(lit(1)) + 89999) / 90000).cast("long")).as("minpts"))
    val ids = cells.crossJoin(broadcast(thr))
      .filter(col("n") >= col("minpts"))
      .select((col("cx") * 30 + col("cy")).as("cell"), col("cx"), col("cy"), col("n"))
    // 8-neighborhood adjacency as an EQUI-join: explode each dense
    // cell to its 8 shifted keys, join back on the exact key.
    val offsets = for { dx <- -1 to 1; dy <- -1 to 1 if (dx, dy) != (0, 0) }
      yield struct(lit(dx).as("dx"), lit(dy).as("dy"))
    val shifted = ids.select(col("cell").as("ca"), col("cx"), col("cy"),
        explode(array(offsets: _*)).as("o"))
      .select(col("ca"), (col("cx") + col("o.dx")).as("nx"),
        (col("cy") + col("o.dy")).as("ny"))
    val edges = shifted.join(
      ids.select(col("cell").as("cb"), col("cx").as("nx"), col("cy").as("ny")),
      Seq("nx", "ny"))
    (ids, edges)
  }

  def entries: Seq[Entry] =
    textAnalysis ++ dedup ++ grouping ++ sampling ++ skew ++ heavyHitters ++
      similarity ++ temporal ++ analysis ++ corpus ++ multimodal
}
