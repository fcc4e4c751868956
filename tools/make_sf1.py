#!/usr/bin/env python3
"""Derive a 10x scale tier (sf1) from the driver's sf0.1 parquet for the
one-off SCALE10 audit (SCALE10.md). Ten key-shifted copies of every fact
table; dimension tables (region, nation) stay 1x like real star schemas.

Distribution-preserving perturbations so the 10x tier stresses VOLUME,
not artifacts of replication:
  - keys shift by copy*stride; the orderkey stride is lcm(500,700)*1000
    = 3,500,000 so the %500/%700 showcase sets are key-preserved
    exactly (every copy of a %700 delete key is itself %700), and all
    strides are multiples of 1000 so %2 arm splits are preserved;
  - document text of copy i>0 rotates its vowels by i (same lengths,
    whitespace and punctuation -> same quality stats; word hashes
    differ except for vowel-free tokens, so cross-copy near-dup pairs
    are approximately — not absolutely — eliminated);
  - embeddings of copy i circularly shift coordinates by i (an
    orthogonal permutation: within-copy geometry identical, cross-copy
    vectors distinct -> no degenerate exact-dup neighbors);
  - event timestamps stay put: |days| is constant, volume/day is 10x,
    matching how a real deployment scales.

An optional third argument scales the copy count (default 10): 100
derives the sf10 spot tier the SCALE100 protocol measures — all key
strides already clear 100 copies (max source key x stride headroom),
and every distribution-preserving property below is per-copy, so it
holds at any copy count.

Each derived tier gets a `_GRAFT_TIER` marker file naming it —
`graft.Verify` keys its literal-pin overlay off that marker instead of
a coincidental row count (r12 advice).

Usage: python3 tools/make_sf1.py [src_dir] [dst_dir] [copies]
"""
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"

COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10
VOWELS = "aeiou"
# Second text-transform dimension for tiers PAST 10 copies: the vowel
# rotation alone cycles mod 5, so at 100 copies every document would
# have ~20 byte-identical clones — and the pair-mining relations
# (containment, MinHash, winnowing) would densify QUADRATICALLY by
# construction of the tier, not by any property of the data (the first
# sf10 derivation measured exactly that: a ~190x-dense clone-cluster
# pair relation). Each DECADE of copies therefore also rotates the
# consonant alphabet; decade 0 (i < 10) uses consonant rotation 0, so
# every tier up to 10 copies is BYTE-IDENTICAL to the historical sf1
# derivation and its generated pins stay valid.
CONSONANTS = "bcdfghjklmnpqrstvwxz"

con = duckdb.connect()
con.execute(f"CREATE TEMP TABLE copies AS SELECT unnest(range({COPIES})) AS i")

import os
os.makedirs(DST, exist_ok=True)


def emit(table, select):
    q = (f"COPY ({select}) TO '{DST}/{table}.parquet' "
         f"(FORMAT PARQUET, COMPRESSION SNAPPY)")
    con.execute(q)
    n = con.execute(f"SELECT count(*) FROM '{DST}/{table}.parquet'").fetchone()[0]
    print(f"  {table}: {n} rows")


def src(table):
    return f"read_parquet('{SRC}/{table}.parquet')"


def rot(expr, i_expr):
    """Per-copy text transform: vowel rotation by i%5 composed with a
    consonant rotation by the copy's decade. The composition
    (i % 5, i // 10) is shared by copies i and i+5 of a decade, so each
    transform is used exactly TWICE and every document keeps exactly
    ONE byte-identical twin per decade — the same per-copy clone
    density at every tier (sf1's copy 5 is the identity rotation,
    cloning verbatim copy 0). What the decade rotation removes is the
    ~20-clone pile-up a pure mod-5 cycle produced at 100 copies, not
    clones entirely. Copy 0 (and any identity composition) verbatim."""
    cases = []
    for i in range(1, COPIES):
        v = i % 5
        c = (i // 10) % len(CONSONANTS)
        frm, to = VOWELS, VOWELS[v:] + VOWELS[:v]
        if c:
            frm = frm + CONSONANTS
            to = to + CONSONANTS[c:] + CONSONANTS[:c]
        if frm == to:
            continue  # identity (i=5 in decade 0) -> ELSE branch
        cases.append(f"WHEN {i_expr} = {i} THEN translate({expr}, "
                     f"'{frm}', '{to}')")
    return f"CASE {' '.join(cases)} ELSE {expr} END"


print(f"deriving {DST} from {SRC} (x{COPIES})")

emit("region", f"SELECT * FROM {src('region')}")
emit("nation", f"SELECT * FROM {src('nation')}")

emit("customer", f"""
  SELECT c_custkey + i * 100000 AS c_custkey, c_name, c_nationkey,
         c_acctbal, c_mktsegment
  FROM {src('customer')} CROSS JOIN copies""")

emit("supplier", f"""
  SELECT s_suppkey + i * 10000 AS s_suppkey, s_name, s_nationkey, s_acctbal
  FROM {src('supplier')} CROSS JOIN copies""")

emit("part", f"""
  SELECT p_partkey + i * 100000 AS p_partkey, p_name, p_brand, p_type,
         p_size, p_retailprice
  FROM {src('part')} CROSS JOIN copies""")

emit("orders", f"""
  SELECT o_orderkey + i * 3500000 AS o_orderkey,
         o_custkey + i * 100000 AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM {src('orders')} CROSS JOIN copies""")

emit("lineitem", f"""
  SELECT l_orderkey + i * 3500000 AS l_orderkey,
         l_partkey + i * 100000 AS l_partkey,
         l_suppkey + i * 10000 AS l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM {src('lineitem')} CROSS JOIN copies""")

emit("events", f"""
  SELECT event_id + i * 1000000 AS event_id, ts,
         user_id + i * 100000 AS user_id, event_type, value, props
  FROM {src('events')} CROSS JOIN copies""")

emit("documents", f"""
  SELECT doc_id + i * 100000 AS doc_id,
         {rot('text', 'i')} AS text,
         lang, source, n_chars
  FROM {src('documents')} CROSS JOIN copies""")

# vec_id must stay DENSE 0..n-1 (the hybrid-serving pipeline requires
# it), so copies stack by the source cardinality, not a sparse stride.
# The circular shift cycles mod dim (64), so copies past 64 compose it
# with a coordinate REVERSAL (another orthogonal permutation — within-
# copy geometry identical, and rev∘shift never equals a pure shift) to
# keep all 100 sf10 copies free of degenerate exact-dup neighbors;
# copies below 64 are untouched, so tiers up to sf6.4 are byte-stable.
n_emb = con.execute(f"SELECT count(*) FROM {src('embeddings')}").fetchone()[0]
emit("embeddings", f"""
  SELECT vec_id + i * {n_emb} AS vec_id,
         CASE WHEN i = 0 THEN embedding
              WHEN i < 64 THEN embedding[(i % len(embedding)) + 1:]
                   || embedding[1:(i % len(embedding))]
              ELSE list_reverse(embedding)[(i % len(embedding)) + 1:]
                   || list_reverse(embedding)[1:(i % len(embedding))]
         END AS embedding,
         label
  FROM {src('embeddings')} CROSS JOIN copies""")

# tier marker: sf0.1 x copies/10 (10 -> sf1, 100 -> sf10)
tier = f"sf{COPIES / 10:g}"
with open(f"{DST}/_GRAFT_TIER", "w") as f:
    f.write(tier + "\n")
print(f"done ({tier})")
