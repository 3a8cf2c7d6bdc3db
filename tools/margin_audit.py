#!/usr/bin/env python3
"""Micro-bit lattice margin audit for the r15 analytics entries.

For each entry, re-derives (in DuckDB, with the same CTE SQL as the
committed oracles) every DISTINCT integer operand k that the entry
feeds to the micro-bit lattice L(k) = floor(log2(k)*1e6 + 0.5), and
reports the minimum distance of log2(k)*1e6 + 0.5 to its floor
boundary — the margin that guarantees both engines floor to the same
lattice point (the in-expression runtime guard raises under 1e-5).

For q_naive_bayes it additionally reports the minimum winner-vs-
runner-up score margin in micro-bits (the argmax-stability bound).

Usage: python3 tools/margin_audit.py /root/testdata/sf0.01 [...]
Prints one markdown table row per (sf, entry).
"""
import math
import sys

import duckdb


def margins(values):
    worst = (1.0, None)
    for (k,) in values:
        if k is None or k <= 0:
            raise SystemExit(f"non-positive lattice operand {k}")
        x = math.log2(k) * 1e6 + 0.5
        frac = x - math.floor(x)
        m = min(frac, 1.0 - frac)
        if m < worst[0]:
            worst = (m, k)
    return worst


def audit(sf_dir):
    con = duckdb.connect()
    for t in ("events", "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    out = []

    # --- q_js_divergence: operands 2*a_t*B, 2*b_t*A and m_t = a_t*B + b_t*A
    # for the types where the corresponding count is nonzero (the CASE
    # guard in the entry skips the zero side entirely).
    ops = con.execute("""
        WITH c AS (SELECT event_type AS et,
            CAST(sum(CASE WHEN extract(dow FROM ts) IN (0, 6) THEN 1 ELSE 0 END) AS BIGINT) AS a_t,
            CAST(sum(CASE WHEN extract(dow FROM ts) IN (0, 6) THEN 0 ELSE 1 END) AS BIGINT) AS b_t
          FROM events GROUP BY 1),
        tot AS (SELECT CAST(sum(a_t) AS BIGINT) AS a, CAST(sum(b_t) AS BIGINT) AS b FROM c)
        SELECT DISTINCT k FROM (
          SELECT a_t * 2 * tot.b AS k FROM c CROSS JOIN tot WHERE a_t > 0
          UNION SELECT b_t * 2 * tot.a FROM c CROSS JOIN tot WHERE b_t > 0
          UNION SELECT a_t * tot.b + b_t * tot.a FROM c CROSS JOIN tot
            WHERE a_t > 0 OR b_t > 0)""").fetchall()
    m, k = margins(ops)
    out.append(("q_js_divergence", len(ops), max(o[0] for o in ops), m, k, ""))

    # --- q_naive_bayes: operands c_wl+1 over the (lang x vocab) grid,
    # n_l+V per lang, d_l per lang, D; plus the min argmax margin.
    ops = con.execute("""
        WITH tok AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w FROM documents),
        t AS (SELECT doc_id, lang, w FROM tok WHERE length(w) > 0),
        vocab AS (SELECT DISTINCT w FROM t),
        langs AS (SELECT DISTINCT lang AS l FROM t),
        lw AS (SELECT lang AS l, w, CAST(count(*) AS BIGINT) AS c_wl FROM t GROUP BY 1, 2),
        lt AS (SELECT lang AS l, CAST(count(*) AS BIGINT) AS n_l,
            CAST(count(DISTINCT doc_id) AS BIGINT) AS d_l FROM t GROUP BY 1),
        v AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS v FROM t),
        d AS (SELECT CAST(count(*) AS BIGINT) AS d FROM documents)
        SELECT DISTINCT k FROM (
          SELECT COALESCE(lw.c_wl, 0) + 1 AS k
            FROM langs CROSS JOIN vocab
            LEFT JOIN lw ON lw.l = langs.l AND lw.w = vocab.w
          UNION SELECT lt.n_l + v.v FROM lt CROSS JOIN v
          UNION SELECT d_l FROM lt
          UNION SELECT d FROM d)""").fetchall()
    m, k = margins(ops)
    mbit = con.execute("""
        WITH tok AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w FROM documents),
        t AS (SELECT doc_id, lang, w FROM tok WHERE length(w) > 0),
        dw AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c_wd FROM t GROUP BY 1, 2),
        lw AS (SELECT lang AS l, w, CAST(count(*) AS BIGINT) AS c_wl FROM t GROUP BY 1, 2),
        lt AS (SELECT lang AS l, CAST(count(*) AS BIGINT) AS n_l,
            CAST(count(DISTINCT doc_id) AS BIGINT) AS d_l FROM t GROUP BY 1),
        v AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS v FROM t),
        d AS (SELECT CAST(count(*) AS BIGINT) AS d FROM documents),
        sc AS (SELECT dw.doc_id, lt.l,
            CAST(sum(dw.c_wd * (CAST(floor(log2(CAST(COALESCE(lw.c_wl, 0) + 1 AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
                              - CAST(floor(log2(CAST(lt.n_l + v.v AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT))) AS BIGINT)
              + max(CAST(floor(log2(CAST(lt.d_l AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
                  - CAST(floor(log2(CAST(d.d AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)) AS score_u
          FROM dw CROSS JOIN lt CROSS JOIN v CROSS JOIN d
          LEFT JOIN lw ON lw.l = lt.l AND lw.w = dw.w GROUP BY 1, 2),
        rk AS (SELECT doc_id, l, score_u,
            row_number() OVER (PARTITION BY doc_id ORDER BY score_u DESC, l) AS r FROM sc)
        SELECT min(a.score_u - b.score_u)
        FROM rk a JOIN rk b ON a.doc_id = b.doc_id AND a.r = 1 AND b.r = 2
        """).fetchone()[0]
    out.append(("q_naive_bayes", len(ops), max(o[0] for o in ops), m, k,
                f"min argmax margin {mbit} µbits"))

    # --- q_dsir_select: operands c_t+1 and c_r+1 per vocab word,
    # N_tgt+V, N_raw+V (c_r exists for every w by construction).
    ops = con.execute("""
        WITH tok AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w FROM documents),
        t AS (SELECT doc_id, lang, w FROM tok WHERE length(w) > 0),
        vocab AS (SELECT DISTINCT w FROM t),
        tgt AS (SELECT w, CAST(count(*) AS BIGINT) AS c_t FROM t WHERE lang = 'en' GROUP BY 1),
        raw AS (SELECT w, CAST(count(*) AS BIGINT) AS c_r FROM t GROUP BY 1),
        v AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS v FROM t),
        nt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM t WHERE lang = 'en'),
        nr AS (SELECT CAST(count(*) AS BIGINT) AS n FROM t)
        SELECT DISTINCT k FROM (
          SELECT COALESCE(tgt.c_t, 0) + 1 AS k FROM vocab LEFT JOIN tgt ON tgt.w = vocab.w
          UNION SELECT c_r + 1 FROM raw
          UNION SELECT nt.n + v.v FROM nt CROSS JOIN v
          UNION SELECT nr.n + v.v FROM nr CROSS JOIN v)""").fetchall()
    m, k = margins(ops)
    out.append(("q_dsir_select", len(ops), max(o[0] for o in ops), m, k, ""))

    # --- q_zipf_slope: operands are the ranks r and counts n of the
    # top-200 tokens.
    ops = con.execute("""
        WITH tok AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
        c AS (SELECT w, CAST(count(*) AS BIGINT) AS n FROM tok WHERE length(w) > 0 GROUP BY 1),
        top AS (SELECT w, n FROM c ORDER BY n DESC, w LIMIT 200),
        rk AS (SELECT a.w, a.n, CAST(count(*) AS BIGINT) AS r
          FROM top a JOIN top b ON b.n > a.n OR (b.n = a.n AND b.w <= a.w) GROUP BY 1, 2)
        SELECT DISTINCT k FROM (SELECT r AS k FROM rk UNION SELECT n FROM rk)""").fetchall()
    m, k = margins(ops)
    out.append(("q_zipf_slope", len(ops), max(o[0] for o in ops), m, k, ""))
    return out


def main():
    print("| scale | entry | distinct k | max k | min margin (at k) | margin/guard | extra |")
    print("|---|---|---|---|---|---|---|")
    for sf_dir in sys.argv[1:]:
        sf = sf_dir.rstrip("/").split("/")[-1]
        for entry, nk, mk, m, at, extra in audit(sf_dir):
            print(f"| {sf} | {entry} | {nk} | {mk} | {m:.2e} (k={at}) "
                  f"| {m / 1e-5:.0f}x | {extra} |")


if __name__ == "__main__":
    main()
