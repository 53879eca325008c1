#!/usr/bin/env python3
"""Seed-perturbed fixture generator (r15 verdict item 6).

Re-draws every VALUE in the driver's synthetic tables under a different
seed while preserving the structural contract the adapters rely on —
schemas, key integrity, row counts, the lang/event-type/flag value sets,
source = doc_id % 20, the date ranges, the word vocabulary. Running the
full oracle compare on the result certifies the registry's oracles are
SEED-GENERIC: a query that only passed because a planted seed-42 value
happened to line up on both engines (the r12/r14 vacuity class that the
0-row guard cannot see) diverges here.

All draws are deterministic functions of (seed, key) via duckdb's hash()
— re-running with the same seed reproduces the fixture byte-for-byte
within a duckdb version.

Usage:
    python3 scripts/gen_fixture.py <srcDir> <destDir> [seed]
    python3 scripts/gen_fixture.py /root/testdata/sf0.01 /dev/shm/graft_seedfix/sf0.01 1337
"""
import os
import sys

import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
dest = sys.argv[2] if len(sys.argv) > 2 else "/dev/shm/graft_seedfix/sf0.01"
seed = sys.argv[3] if len(sys.argv) > 3 else "1337"

os.makedirs(dest, exist_ok=True)
con = duckdb.connect()

def h(tag, key):
    """Deterministic (seed, tag, key)-keyed 64-bit draw, as SQL."""
    return f"hash('{seed}|{tag}|' || CAST({key} AS VARCHAR))"

def copy(name, sql):
    con.execute(f"COPY ({sql}) TO '{dest}/{name}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM read_parquet('{dest}/{name}.parquet')").fetchone()[0]
    print(f"[gen_fixture] {name}: {n} rows (seed {seed})")

def rp(name):
    return f"read_parquet('{src}/{name}.parquet')"

# dims: keys and names pass through (they are entity IDENTITY, not values);
# balances/sizes/prices re-draw in the original ranges
copy("region", f"SELECT * FROM {rp('region')}")
copy("nation", f"SELECT * FROM {rp('nation')}")
copy("customer", f"""
  SELECT c_custkey, c_name, c_nationkey,
         ROUND(({h('cb', 'c_custkey')} % 1100000) / 100.0 - 1000.0, 2) AS c_acctbal,
         c_mktsegment
  FROM {rp('customer')}""")
copy("supplier", f"""
  SELECT s_suppkey, s_name, s_nationkey,
         ROUND(({h('sb', 's_suppkey')} % 1100000) / 100.0 - 1000.0, 2) AS s_acctbal
  FROM {rp('supplier')}""")
copy("part", f"""
  SELECT p_partkey, p_name, p_brand, p_type,
         CAST(1 + {h('ps', 'p_partkey')} % 50 AS INTEGER) AS p_size,
         ROUND((90000 + {h('pr', 'p_partkey')} % 9000000) / 100.0, 2) AS p_retailprice
  FROM {rp('part')}""")

# facts: keys/flags keep integrity; quantities, prices, rates and dates
# re-draw (dates jitter +/-30 days inside the original range's margins)
lk = "l_orderkey * 10 + l_linenumber"
copy("lineitem", f"""
  SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
         CAST(1 + {h('lq', lk)} % 50 AS DOUBLE) AS l_quantity,
         ROUND((100000 + {h('lp', lk)} % 9000000) / 100.0, 2) AS l_extendedprice,
         ({h('ld', lk)} % 11) / 100.0 AS l_discount,
         ({h('lt', lk)} % 9) / 100.0 AS l_tax,
         l_returnflag, l_linestatus,
         l_shipdate + INTERVAL (CAST({h('ls', lk)} % 61 AS BIGINT) - 30) DAY AS l_shipdate
  FROM {rp('lineitem')}""")
copy("orders", f"""
  SELECT o_orderkey, o_custkey, o_orderstatus,
         ROUND((100000 + {h('op', 'o_orderkey')} % 50000000) / 100.0, 2) AS o_totalprice,
         o_orderdate + INTERVAL (CAST({h('od', 'o_orderkey')} % 61 AS BIGINT) - 30) DAY AS o_orderdate,
         o_orderpriority
  FROM {rp('orders')}""")

# events: ids/user ids keep; type re-draws from the SAME 5-value set, value
# and props re-draw, ts jitters +/-45 s (sub-minute: day/session structure
# and the ts~event_id ordering stay recognizable, values all move). Values
# are heavy-tailed: ~0.5% of events draw a 10-100x value — the planted
# outlier population MAD-class monitors exist to find (a uniform redraw
# leaves |v - med| <= 3 MAD everywhere and vacuates outlier_mad).
copy("events", f"""
  SELECT event_id,
         ts + INTERVAL (CAST({h('ets', 'event_id')} % 91 AS BIGINT) - 45) SECOND AS ts,
         user_id,
         ['click','signup','error','view','purchase'][CAST(1 + {h('ety', 'event_id')} % 5 AS INT)] AS event_type,
         CASE WHEN {h('eo', 'event_id')} % 1000 < 5
              THEN ROUND(200.0 + ({h('ev', 'event_id')} % 180000) / 100.0, 2)
              ELSE ROUND(({h('ev', 'event_id')} % 2000) / 100.0, 2) END AS value,
         '{{"k": ' || CAST({h('ek', 'event_id')} % 100 AS VARCHAR) || '}}' AS props
  FROM {rp('events')}""")

# documents: texts REBUILD word-by-word from the original corpus vocabulary
# (same token universe -> langid/stopword/quality operators stay in-domain).
# Per-doc length keeps the original distribution; lang re-draws with the
# original marginals; source stays doc_id % 20 (the drift-split contract).
# Near-dup structure is then PLANTED under the new seed — the first cut
# re-drew every word independently, which left ZERO near-duplicate pairs
# and vacuated the whole dedup family (0-row guard caught it): ~1 in 8
# docs becomes a copy of a nearby donor — "tight" (one word changed,
# Jaccard ~0.97), "loose" (every 25th word changed, ~0.8), or a
# containment prefix (first half of the donor) — donors 1-17 ids away, so
# pairs cross the source = doc_id % 20 boundary too (dedup_cross_source).
con.execute(f"""
  CREATE TEMP TABLE built AS
  WITH vocab AS (
    SELECT list(DISTINCT w) AS vl
    FROM (SELECT unnest(string_split(text, ' ')) AS w FROM {rp('documents')})
    WHERE w <> ''),
  langs AS (
    SELECT list(lang ORDER BY lang) AS ll FROM (
      SELECT lang FROM {rp('documents')} GROUP BY 1)),
  base AS (
    SELECT doc_id, len(string_split(text, ' ')) AS n_words, source
    FROM {rp('documents')})
  SELECT b.doc_id,
         array_to_string(list_transform(range(0, b.n_words), j ->
           v.vl[CAST(1 + hash('{seed}|w|' || CAST(b.doc_id AS VARCHAR)
                || '|' || CAST(j AS VARCHAR)) % len(v.vl) AS BIGINT)]), ' ') AS text,
         l.ll[CAST(1 + {h('lg', 'b.doc_id')} % len(l.ll) AS BIGINT)] AS lang,
         b.source,
         v.vl AS vl
  FROM base b, vocab v, langs l""")
copy("documents", f"""
  WITH marked AS (
    SELECT doc_id, text, lang, source, vl,
           doc_id >= 20 AND {h('dup', 'doc_id')} % 8 = 0 AS is_dup,
           doc_id - (1 + CAST({h('don', 'doc_id')} % 17 AS BIGINT)) AS donor_id,
           CAST({h('knd', 'doc_id')} % 3 AS BIGINT) AS kind
    FROM built),
  dupped AS (
    SELECT m.doc_id,
           CASE
             WHEN m.is_dup AND m.kind = 0 THEN
               -- tight copy: donor with word 1 re-drawn
               array_to_string(list_transform(
                 range(1, len(string_split(d.text, ' ')) + 1), j ->
                   CASE WHEN j = 1 THEN m.vl[CAST(1 + {h('tw', 'm.doc_id')}
                        % len(m.vl) AS BIGINT)]
                        ELSE string_split(d.text, ' ')[j] END), ' ')
             WHEN m.is_dup AND m.kind = 1 THEN
               -- loose copy: donor with every 25th word re-drawn
               array_to_string(list_transform(
                 range(1, len(string_split(d.text, ' ')) + 1), j ->
                   CASE WHEN j % 25 = 3 THEN m.vl[CAST(1 + hash('{seed}|lw|'
                        || CAST(m.doc_id AS VARCHAR) || '|' || CAST(j AS VARCHAR))
                        % len(m.vl) AS BIGINT)]
                        ELSE string_split(d.text, ' ')[j] END), ' ')
             WHEN m.is_dup THEN
               -- containment: the donor's first half
               array_to_string(string_split(d.text, ' ')[1 :
                 greatest(len(string_split(d.text, ' ')) // 2, 3)], ' ')
             ELSE m.text END AS text,
           m.lang, m.source
    FROM marked m LEFT JOIN built d ON d.doc_id = m.donor_id)
  SELECT doc_id, text, lang, source, CAST(length(text) AS BIGINT) AS n_chars
  FROM dupped""")

# embeddings: full re-draw in [-0.2, 0.2] per dim (the original's scale),
# labels re-draw 0..9
copy("embeddings", f"""
  SELECT vec_id,
         list_transform(range(0, 64), j ->
           CAST((CAST(hash('{seed}|e|' || CAST(vec_id AS VARCHAR) || '|'
                || CAST(j AS VARCHAR)) % 2001 AS BIGINT) - 1000) / 5000.0 AS FLOAT)) AS embedding,
         CAST({h('el', 'vec_id')} % 10 AS INTEGER) AS label
  FROM {rp('embeddings')}""")

print(f"[gen_fixture] wrote {dest} from {src} at seed {seed}")
