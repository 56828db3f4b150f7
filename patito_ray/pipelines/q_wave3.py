"""Query registry chunk (split from pipelines/queries.py): 44 registrations.

Registers: ntile_events, regex_extract_all, pagerank_docs, graph_components, edit_near_dups, event_transitions, char_entropy, dedup_near_best, mad_per_group, bigram_pmi, top_types_per_brand, dup_cluster_sizes, inverted_index, mad_outliers, equidepth_buckets, top_unshipped_orders, url_dedup, chi2_independence, triangle_count, unique_together, k_anonymity, decontaminate, heavy_hitters, fd_audit, monotonic_audit, stratified_exact_k, span_dedup, inclusion_audit, benford_audit, regression_per_group, latest_by_key, zscore_normalize, tokens_per_source, ks_drift, roc_auc, jaccard_join, span_positions, span_cut, calibration_bins, kcore_docs, top_bigram, scd2_history, peak_concurrency, welch_ttest
"""

from __future__ import annotations

import datetime
from typing import Any, Callable, Literal
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import patito_ray as pr
from patito_ray.functions import dedup as f_dedup
from patito_ray.functions import similarity as f_sim
from patito_ray.functions import text as f_text
from patito_ray.pipelines.webpage import validate_webpages
from patito_ray.stages.agg import merge_partial_sums
from patito_ray.validation.engine import duplicate_count_distributed
from patito_ray.validation.stats import (
    column_stats,
    drift_check,
    profile_dataset_split,
)
from patito_ray.pipelines.qcommon import (  # noqa: F401
    QUERIES,
    _tmp_dir,
    _rp,
    _one_row,
    _apply,
    _r,
    _rf,
    _ra,
    _lazy_norm,
)
from patito_ray.pipelines.q_training import (  # noqa: F401
    _sql_mul64,
)


_NTILE_SCHEMA = pa.schema(
    [
        ("event_id", pa.int64()),
        ("user_id", pa.int64()),
        ("quartile", pa.int64()),
    ]
)


def q_ntile_events(sf_dir: str) -> Any:
    """SQL NTILE(4) per user over event time: distributed window pass
    (one hash exchange), pure integer bucket arithmetic — bit-exact."""
    from patito_ray.stages.window import window_over

    ds = _rp(sf_dir, "events", ["event_id", "user_id", "ts"])
    out = window_over(
        ds,
        by="user_id",
        order=["ts", "event_id"],
        cols={"quartile": ("ntile", None)},
        ntile=4,
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "event_id" not in t.column_names:
            return _NTILE_SCHEMA.empty_table()
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "quartile": pc.cast(t.column("quartile"), pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow", batch_size=None)


SQL_NTILE_EVENTS = """
SELECT event_id, user_id,
       CAST(NTILE(4) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)
         AS quartile
FROM events
"""

QUERIES["ntile_events"] = (q_ntile_events, SQL_NTILE_EVENTS)


def q_regex_extract_all(sf_dir: str) -> Any:
    """regexp_extract_all + UNNEST over document text — per-batch
    vectorized extraction exploded to one row per match, empty-match
    rows dropped (UNNEST semantics), no exchange."""
    from patito_ray.stages.transform import regex_extract_explode

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    return regex_extract_explode(
        ds, "text", "[a-z]*ar[a-z]*", out="m", keep=["doc_id"]
    )


SQL_REGEX_EXTRACT_ALL = """
SELECT doc_id, UNNEST(regexp_extract_all(text, '[a-z]*ar[a-z]*')) AS m
FROM documents
"""

QUERIES["regex_extract_all"] = (q_regex_extract_all, SQL_REGEX_EXTRACT_ALL)


def _doc_link_edges(
    sf_dir: str, out_links: int, with_weight: bool = False
) -> "tuple[Any, int]":
    """Deterministic synthetic link graph over the documents table:
    doc i emits ``out_links`` directed edges whose targets are
    ``splitmix64(out_links*i + j) % N`` (N = doc count, doc_ids dense
    0..N-1 — asserted). Both engines recompute the SAME edges — the
    splitmix64-in-SQL precedent from ``SQL_STRATIFIED_SAMPLE``.
    ``with_weight`` adds an int64 ``w`` in 1..9 carved from the SAME
    hash's high bits (dst uses ``h % N`` — low bits; weight uses
    ``(h >> 33) % 9`` — a disjoint bit range)."""
    from patito_ray.generate import _splitmix64

    docs = _rp(sf_dir, "documents", ["doc_id"])
    n = docs.count()

    def mk(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        assert ids.min() >= 0 and ids.max() < n, "doc_ids must be dense 0..N-1"
        src = np.repeat(ids.astype(np.int64), out_links)
        j = np.tile(np.arange(out_links, dtype=np.uint64), len(ids))
        h = _splitmix64(src.astype(np.uint64) * np.uint64(out_links) + j)
        dst = (h % np.uint64(n)).astype(np.int64)
        cols = {
            "src": pa.array(src, type=pa.int64()),
            "dst": pa.array(dst, type=pa.int64()),
        }
        if with_weight:
            w = ((h >> np.uint64(33)) % np.uint64(9)).astype(np.int64) + 1
            cols["w"] = pa.array(w, type=pa.int64())
        return pa.table(cols)

    return docs.map_batches(mk, batch_format="pyarrow", batch_size=None), n


def _sql_link_edges(out_links: int, with_weight: bool = False) -> str:
    """The same edge derivation in DuckDB SQL (splitmix64 via 32-bit
    partial products; shared ``_sql_mul64`` macro). ``with_weight``
    adds the 1..9 high-bit weight column matching _doc_link_edges."""
    js = ", ".join(str(j) for j in range(out_links))
    w_sel = (
        ",\n         CAST(1 + CAST(xor(z, z >> 31) >> 33 AS HUGEINT) % 9"
        " AS BIGINT) AS w"
        if with_weight
        else ""
    )
    return f"""
nn AS (SELECT COUNT(*) AS n FROM documents),
jj AS (SELECT UNNEST([{js}]) AS j),
gz0 AS (
  SELECT d.doc_id AS src,
    CAST((CAST({out_links}*d.doc_id + jj.j AS HUGEINT) + 11400714819323198485)
         % 18446744073709551616 AS UBIGINT) AS z
  FROM documents d CROSS JOIN jj
),
gx1 AS (SELECT src, xor(z, z >> 30) AS z FROM gz0),
gz1 AS (SELECT src, {_sql_mul64(3210233709, 484763065)} AS z FROM gx1),
gx2 AS (SELECT src, xor(z, z >> 27) AS z FROM gz1),
gz2 AS (SELECT src, {_sql_mul64(2496678331, 321982955)} AS z FROM gx2),
edges AS (
  SELECT src,
         CAST(CAST(xor(z, z >> 31) AS HUGEINT) % (SELECT n FROM nn) AS BIGINT)
           AS dst{w_sel}
  FROM gz2
)"""


def q_pagerank_docs(sf_dir: str) -> Any:
    """PageRank (3 power iterations, d=0.85) over the deterministic
    doc link graph. Iterations co-locate rank rows with the
    once-materialized edge set (never moving edges), pre-aggregate
    contributions per target inside each partition, and merge the
    partials adaptively; ranks rounded to 1e-9 (summation order is the
    only cross-engine difference — ~1e-16 relative). out_links=3 on
    purpose: outdeg 2 makes every rank a FINITE decimal (d=0.85,
    n=500, /2) that lands exactly on 1e-9 rounding midpoints, where a
    1-ulp summation-order skew flips the digit (observed 3/500);
    rank/3 is non-terminating, collision odds ~1e-9/node."""
    from patito_ray.functions.graph import pagerank

    edges, _n = _doc_link_edges(sf_dir, 3)
    res = pagerank(edges, num_iters=3, damping=0.85)

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema([("node", pa.int64()), ("pr", pa.float64())]).empty_table()
        return pa.table(
            {
                "node": pc.cast(t.column("node"), pa.int64()),
                "pr": _ra(pc.cast(t.column("pr"), pa.float64()), 9),
            }
        )

    return _apply(res, finish)


SQL_PAGERANK_DOCS = f"""
WITH
{_sql_link_edges(3)},
r0 AS (
  SELECT doc_id AS node, 1.0/(SELECT n FROM nn) AS pr FROM documents
),
s1 AS (
  SELECT e.dst AS node, SUM(r.pr/3.0) AS w
  FROM edges e JOIN r0 r ON e.src = r.node GROUP BY e.dst
),
r1 AS (
  SELECT d.doc_id AS node,
         (1 - CAST(0.85 AS DOUBLE))/(SELECT n FROM nn)
           + CAST(0.85 AS DOUBLE) * COALESCE(s1.w, 0.0) AS pr
  FROM documents d LEFT JOIN s1 ON s1.node = d.doc_id
),
s2 AS (
  SELECT e.dst AS node, SUM(r.pr/3.0) AS w
  FROM edges e JOIN r1 r ON e.src = r.node GROUP BY e.dst
),
r2 AS (
  SELECT d.doc_id AS node,
         (1 - CAST(0.85 AS DOUBLE))/(SELECT n FROM nn)
           + CAST(0.85 AS DOUBLE) * COALESCE(s2.w, 0.0) AS pr
  FROM documents d LEFT JOIN s2 ON s2.node = d.doc_id
),
s3 AS (
  SELECT e.dst AS node, SUM(r.pr/3.0) AS w
  FROM edges e JOIN r2 r ON e.src = r.node GROUP BY e.dst
),
r3 AS (
  SELECT d.doc_id AS node,
         (1 - CAST(0.85 AS DOUBLE))/(SELECT n FROM nn)
           + CAST(0.85 AS DOUBLE) * COALESCE(s3.w, 0.0) AS pr
  FROM documents d LEFT JOIN s3 ON s3.node = d.doc_id
)
SELECT node, ROUND(pr, 9) AS pr FROM r3
"""

QUERIES["pagerank_docs"] = (q_pagerank_docs, SQL_PAGERANK_DOCS)


def q_graph_components(sf_dir: str) -> Any:
    """Connected components of the (undirected view of the) 1-out-link
    doc graph — the mirror-cluster primitive. Oracle: recursive
    transitive closure + MIN per node (exact at oracle scale)."""
    from patito_ray.functions.graph import connected_components

    edges, _n = _doc_link_edges(sf_dir, 1)
    res = connected_components(edges)

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema(
                [("node", pa.int64()), ("root", pa.int64())]
            ).empty_table()
        return pa.table(
            {
                "node": pc.cast(t.column("node"), pa.int64()),
                "root": pc.cast(t.column("root"), pa.int64()),
            }
        )

    return _apply(res, finish)


SQL_GRAPH_COMPONENTS = f"""
WITH RECURSIVE
{_sql_link_edges(1)},
und AS (
  SELECT src AS a, dst AS b FROM edges
  UNION
  SELECT dst, src FROM edges
),
reach(a, b) AS (
  SELECT a, b FROM und
  UNION
  SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a
)
SELECT a AS node, LEAST(a, MIN(b)) AS root FROM reach GROUP BY a
"""

QUERIES["graph_components"] = (q_graph_components, SQL_GRAPH_COMPONENTS)


def q_edit_near_dups(sf_dir: str) -> Any:
    """Typo-level near-dup pairs over part names: every (p_partkey a <
    b) pair whose names are within Levenshtein distance 2, with the
    EXACT distance. Candidates via FastSS deletion-neighborhood
    blocking (exact recall by the <=d-deletions theorem), verified by
    the pair-vectorized DP kernel — both sides distributed, pairs never
    concentrate on the driver."""
    from patito_ray.functions.editdist import edit_distance_near_dups

    ds = _rp(sf_dir, "part", ["p_partkey", "p_name"])
    out = edit_distance_near_dups(
        ds, id_col="p_partkey", text_col="p_name", max_dist=2, max_len=64
    )
    return _lazy_norm(
        out,
        pa.schema([("a", pa.int64()), ("b", pa.int64()), ("dist", pa.int64())]),
    )


SQL_EDIT_NEAR_DUPS = """
SELECT x.p_partkey AS a, y.p_partkey AS b,
       levenshtein(x.p_name, y.p_name) AS dist
FROM part x JOIN part y ON x.p_partkey < y.p_partkey
WHERE abs(len(x.p_name) - len(y.p_name)) <= 2
  AND levenshtein(x.p_name, y.p_name) <= 2
"""

QUERIES["edit_near_dups"] = (q_edit_near_dups, SQL_EDIT_NEAR_DUPS)


def q_event_transitions(sf_dir: str) -> Any:
    """Per-user event-type transition counts (the Markov matrix behind
    next-action analytics): one user-key window exchange attaches each
    event's successor (ts, event_id order), then tiny (src, dst)
    partials merge adaptively — event types are low-cardinality, so
    nothing after the window pass is bigger than a few rows per block."""
    import polars as pl

    from patito_ray.stages.window import window_over

    ds = _rp(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    w = window_over(
        ds,
        by="user_id",
        order=["ts", "event_id"],
        cols={"nxt": ("lead", "event_type")},
    )

    def partial(t: pa.Table) -> pa.Table:
        # window_over (map_groups) output can interleave ()-schema
        # empty blocks (dev notes) — same guard as q_cum_spend
        if t.num_rows == 0 or "nxt" not in t.column_names:
            return pa.schema(
                [
                    ("src", pa.large_string()),
                    ("dst", pa.large_string()),
                    ("n", pa.uint32()),
                ]
            ).empty_table()
        df = pl.from_arrow(
            pa.table({"src": t.column("event_type"), "dst": t.column("nxt")})
        ).drop_nulls("dst")
        return df.group_by(["src", "dst"]).agg(pl.len().alias("n")).to_arrow()

    partials = w.map_batches(partial, batch_format="pyarrow", batch_size=None)
    merged = merge_partial_sums(partials, ["src", "dst"], ["n"])

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": pc.cast(t.column("src"), pa.string()),
                "dst": pc.cast(t.column("dst"), pa.string()),
                "n": pc.cast(t.column("n"), pa.int64()),
            }
        )

    return _apply(merged, finish)


SQL_EVENT_TRANSITIONS = """
WITH seq AS (
  SELECT event_type AS src,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
  FROM events
)
SELECT src, dst, COUNT(*) AS n FROM seq WHERE dst IS NOT NULL GROUP BY src, dst
"""

QUERIES["event_transitions"] = (q_event_transitions, SQL_EVENT_TRANSITIONS)


def q_char_entropy(sf_dir: str) -> Any:
    """Per-document Shannon character entropy (the classic gibberish /
    compression-quality signal): one streaming pass, each batch flattens
    its texts into one code-point array and computes every doc's
    distinct-char run counts with a single lexsort — no per-doc Python.
    Both engines evaluate the same expression from exact integer run
    counts (log2(n) - Σ k·log2(k) / n), so only the per-doc float SUM's
    order differs — rounded at 1e-6 like corr_per_group."""

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    def entropy(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        texts = t.column("text").to_numpy(zero_copy_only=False)
        lens = np.fromiter((len(s) for s in texts), dtype=np.int64, count=len(texts))
        keep = lens > 0  # SQL: a zero-char doc produces no char rows at all
        if not keep.any():
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "char_entropy": pa.array([], type=pa.float64()),
                }
            )
        ids, lens = ids[keep], lens[keep]
        buf = "".join(texts[i] for i in np.flatnonzero(keep))
        cps = np.frombuffer(buf.encode("utf-32-le"), dtype=np.uint32)
        doc_idx = np.repeat(np.arange(len(ids)), lens)
        order = np.lexsort((cps, doc_idx))
        d_s, c_s = doc_idx[order], cps[order]
        change = np.empty(len(c_s), dtype=bool)
        change[0] = True
        change[1:] = (d_s[1:] != d_s[:-1]) | (c_s[1:] != c_s[:-1])
        starts = np.flatnonzero(change)
        run_k = np.diff(np.append(starts, len(c_s))).astype(np.float64)
        sk = np.bincount(d_s[starts], weights=run_k * np.log2(run_k), minlength=len(ids))
        ent = np.log2(lens.astype(np.float64)) - sk / lens
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "char_entropy": _r(pa.array(ent, type=pa.float64()), 6),
            }
        )

    return ds.map_batches(entropy, batch_format="pyarrow", batch_size=None)


SQL_CHAR_ENTROPY = r"""
WITH chars AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '[\s\S]')) AS c FROM documents
),
cnt AS (
  SELECT doc_id, c, CAST(COUNT(*) AS DOUBLE) AS k FROM chars GROUP BY doc_id, c
),
tot AS (
  SELECT doc_id, SUM(k) AS n, SUM(k * LOG2(k)) AS sk FROM cnt GROUP BY doc_id
)
SELECT doc_id, ROUND(LOG2(n) - sk / n, 6) AS char_entropy FROM tot
"""

QUERIES["char_entropy"] = (q_char_entropy, SQL_CHAR_ENTROPY)


def q_dedup_near_best(sf_dir: str) -> Any:
    """Near-dedup keeping each duplicate cluster's BEST member — here
    the longest document (score = n_chars, ties -> min doc_id) — the
    "keep the highest-quality copy" form curation pipelines want.
    bands=32 (r=4) per-pair miss probability ~5e-8 at j=0.8 ((1-0.8^4)^32), so clusters
    equal the oracle's exhaustive-scan transitive closure."""
    ds = _rp(sf_dir, "documents", ["doc_id", "text", "n_chars"])
    kept = f_dedup.dedup_near_best(
        ds,
        id_col="doc_id",
        text_col="text",
        score_col="n_chars",
        threshold=0.8,
        num_perm=128,
        bands=32,
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.cast(t.column("doc_id"), pa.int64()),
                "n_chars": pc.cast(t.column("n_chars"), pa.int64()),
            }
        )

    return kept.map_batches(finish, batch_format="pyarrow", batch_size=None)


SQL_DEDUP_NEAR_BEST = """
WITH RECURSIVE tok AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS ts FROM documents
),
flat AS (
  SELECT doc_id, unnest(ts) AS tok, generate_subscripts(ts, 1) AS i, len(ts) AS n
  FROM tok
),
g3 AS (
  SELECT doc_id, tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w AS gram,
         i, n
  FROM flat WINDOW w AS (PARTITION BY doc_id ORDER BY i)
),
long_grams AS (
  SELECT doc_id, list(DISTINCT gram) AS gs FROM g3 WHERE i + 2 <= n GROUP BY doc_id
),
grams AS (
  SELECT t.doc_id,
         COALESCE(lg.gs,
                  CASE WHEN len(t.ts) >= 1 THEN [array_to_string(t.ts, ' ')]
                       ELSE [] END) AS gs
  FROM tok t LEFT JOIN long_grams lg ON t.doc_id = lg.doc_id
),
pairs AS (
  SELECT x.doc_id AS a, y.doc_id AS b
  FROM grams x JOIN grams y ON x.doc_id < y.doc_id
  WHERE len(x.gs) + len(y.gs) - len(list_intersect(x.gs, y.gs)) > 0
    AND CAST(len(list_intersect(x.gs, y.gs)) AS DOUBLE)
        / (len(x.gs) + len(y.gs) - len(list_intersect(x.gs, y.gs))) >= 0.8
),
und AS (
  SELECT a, b FROM pairs UNION SELECT b, a FROM pairs
),
reach(a, b) AS (
  SELECT a, b FROM und
  UNION
  SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a
),
comp AS (
  SELECT a AS node, LEAST(a, MIN(b)) AS root FROM reach GROUP BY a
),
ranked AS (
  SELECT c.node, ROW_NUMBER() OVER (
           PARTITION BY c.root ORDER BY d.n_chars DESC, c.node ASC
         ) AS rn
  FROM comp c JOIN documents d ON d.doc_id = c.node
)
SELECT doc_id, n_chars FROM documents
WHERE doc_id NOT IN (SELECT node FROM ranked WHERE rn > 1)
"""

QUERIES["dedup_near_best"] = (q_dedup_near_best, SQL_DEDUP_NEAR_BEST)


def q_mad_per_group(sf_dir: str) -> Any:
    """Per-supplier robust dispersion: selection-median and median
    absolute deviation of extended price in ONE hash exchange
    (stages/quantiles.py:grouped_mad). Selection ranks + one IEEE
    subtraction keep every double bit-exact against the SQL ROW_NUMBER
    oracle — no rounding anywhere."""
    from patito_ray.stages.quantiles import grouped_mad

    ds = _rp(sf_dir, "lineitem", ["l_suppkey", "l_extendedprice"])
    out = grouped_mad(ds, by="l_suppkey", value="l_extendedprice")

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_suppkey": pc.cast(t.column("l_suppkey"), pa.int64()),
                "n": pc.cast(t.column("n"), pa.int64()),
                "med": pc.cast(t.column("med"), pa.float64()),
                "mad": pc.cast(t.column("mad"), pa.float64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow", batch_size=None)


SQL_MAD_PER_GROUP = """
WITH vals AS (
  SELECT l_suppkey AS k, l_extendedprice AS v
  FROM lineitem WHERE l_extendedprice IS NOT NULL
),
ranked AS (
  SELECT k, v,
         ROW_NUMBER() OVER (PARTITION BY k ORDER BY v) AS rn,
         COUNT(*) OVER (PARTITION BY k) AS n
  FROM vals
),
med AS (
  SELECT k, n, v AS med FROM ranked
  WHERE rn = GREATEST(1, CAST(CEIL(0.5 * n) AS BIGINT))
),
ad AS (
  SELECT vals.k, ABS(vals.v - med.med) AS a, med.n
  FROM vals JOIN med ON vals.k = med.k
),
ad_ranked AS (
  SELECT k, a, n, ROW_NUMBER() OVER (PARTITION BY k ORDER BY a) AS rn FROM ad
),
mad AS (
  SELECT k, a AS mad FROM ad_ranked
  WHERE rn = GREATEST(1, CAST(CEIL(0.5 * n) AS BIGINT))
)
SELECT med.k AS l_suppkey, med.n AS n, med.med AS med, mad.mad AS mad
FROM med JOIN mad ON med.k = mad.k
"""

QUERIES["mad_per_group"] = (q_mad_per_group, SQL_MAD_PER_GROUP)


def q_bigram_pmi(sf_dir: str) -> Any:
    """Corpus collocations: every adjacent-token bigram with count >= 5
    scored by PMI over exact corpus counts (functions/tfidf.py:
    bigram_pmi — unigram vocabulary broadcast once, bigram side stays
    a stream). Both engines evaluate the identical double expression
    from identical integer counts; rounded at 1e-6."""
    from patito_ray.functions.tfidf import bigram_pmi

    ds = _rp(sf_dir, "documents", ["text"])
    out = bigram_pmi(ds, min_count=5)

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "gram": pc.cast(t.column("gram"), pa.string()),
                "cnt": pc.cast(t.column("cnt"), pa.int64()),
                "pmi": _r(pc.cast(t.column("pmi"), pa.float64()), 6),
            }
        )

    return _apply(out, finish)


SQL_BIGRAM_PMI = """
WITH t AS (
  SELECT regexp_extract_all(text, '\\S+') AS toks FROM documents
),
uni AS (
  SELECT u.tok AS w, CAST(COUNT(*) AS BIGINT) AS uc
  FROM t, LATERAL unnest(toks) AS u(tok) GROUP BY u.tok
),
bi AS (
  SELECT array_to_string(toks[s : s + 1], ' ') AS gram
  FROM t, LATERAL unnest(generate_series(1, len(toks) - 1)) AS u(s)
  WHERE len(toks) >= 2
),
bc AS (
  SELECT gram, CAST(COUNT(*) AS BIGINT) AS cnt FROM bi GROUP BY gram
),
tot AS (
  SELECT (SELECT SUM(cnt) FROM bc) AS bt, (SELECT SUM(uc) FROM uni) AS ut
)
SELECT bc.gram AS gram, bc.cnt AS cnt,
       ROUND(LOG2((CAST(bc.cnt AS DOUBLE) / bt)
             / ((CAST(u1.uc AS DOUBLE) / ut) * (CAST(u2.uc AS DOUBLE) / ut))), 6)
         AS pmi
FROM bc, tot
JOIN uni u1 ON u1.w = split_part(bc.gram, ' ', 1)
JOIN uni u2 ON u2.w = split_part(bc.gram, ' ', 2)
WHERE bc.cnt >= 5
"""

QUERIES["bigram_pmi"] = (q_bigram_pmi, SQL_BIGRAM_PMI)


def q_top_types_per_brand(sf_dir: str) -> Any:
    """Top-3 most frequent part types per brand (stages/agg.py:
    top_values_per_group — the k>1 generalization of mode_per_group).
    Only DISTINCT (brand, type) pairs ride the adaptive partial-sum
    merge; a hot pair costs one row per block, never its count."""
    from patito_ray.stages.agg import top_values_per_group

    ds = _rp(sf_dir, "part", ["p_brand", "p_type"])
    out = top_values_per_group(ds, by="p_brand", value="p_type", k=3)

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_brand": t.column("p_brand"),
                "p_type": t.column("p_type"),
                "cnt": pc.cast(t.column("cnt"), pa.int64()),
                "rank": pc.cast(t.column("rank"), pa.int64()),
            }
        )

    return _apply(out, finish)


SQL_TOP_TYPES_PER_BRAND = """
WITH c AS (
  SELECT p_brand, p_type, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM part GROUP BY p_brand, p_type
)
SELECT p_brand, p_type, cnt, rank FROM (
  SELECT p_brand, p_type, cnt,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY p_brand ORDER BY cnt DESC, p_type) AS BIGINT) AS rank
  FROM c
) WHERE rank <= 3
"""

QUERIES["top_types_per_brand"] = (q_top_types_per_brand, SQL_TOP_TYPES_PER_BRAND)


def q_dup_cluster_sizes(sf_dir: str) -> Any:
    """Exact-duplicate cluster-size histogram over documents — the
    dedup *report* ("how much of the corpus is 2x / 10x / 1000x
    duplicated"). Two narrow partial-sum merges: per-batch
    (content-hash, count) partials collapse to per-cluster sizes, then
    sizes collapse to the tiny (cluster_size, n_clusters) histogram.
    Text never rides an exchange — 16 B per distinct hash per batch.
    Same hash64-equality contract as dedup_exact (collision-free at
    any realistic corpus size: 64-bit over 10^12 docs)."""
    from patito_ray.state.sketches import hash64

    ds = _rp(sf_dir, "documents", ["text"])

    def batch_hash_counts(t: pa.Table) -> pa.Table:
        txt = t.column("text")
        if txt.null_count:
            txt = txt.filter(pc.is_valid(txt))
        h = hash64(txt).view(np.int64)
        uniq, counts = np.unique(h, return_counts=True)
        return pa.table(
            {"h": pa.array(uniq, type=pa.int64()),
             "c": pa.array(counts.astype(np.int64), type=pa.int64())}
        )

    partials = ds.map_batches(batch_hash_counts, batch_format="pyarrow", batch_size=None)
    per_cluster = merge_partial_sums(partials, ["h"], ["c"])

    def batch_size_counts(t: pa.Table) -> pa.Table:
        sizes = t.column("c").to_numpy(zero_copy_only=False)
        uniq, counts = np.unique(sizes, return_counts=True)
        return pa.table(
            {"cluster_size": pa.array(uniq, type=pa.int64()),
             "n_clusters": pa.array(counts.astype(np.int64), type=pa.int64())}
        )

    if isinstance(per_cluster, pa.Table):
        return batch_size_counts(per_cluster)
    hist_partials = per_cluster.map_batches(
        batch_size_counts, batch_format="pyarrow", batch_size=None
    )
    return merge_partial_sums(hist_partials, ["cluster_size"], ["n_clusters"])


SQL_DUP_CLUSTER_SIZES = """
WITH c AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS cluster_size
  FROM documents WHERE text IS NOT NULL GROUP BY text
)
SELECT cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters
FROM c GROUP BY cluster_size
"""

QUERIES["dup_cluster_sizes"] = (q_dup_cluster_sizes, SQL_DUP_CLUSTER_SIZES)


def q_inverted_index(sf_dir: str) -> Any:
    """Posting lists: every corpus term with its sorted document-id
    list and document frequency — the IR index-construction primitive.
    Per-batch tokenize (shared RE2-exact kernel) + vectorized DISTINCT
    (term, doc) pairs, then ONE term-key exchange through
    string_agg_per_group (postings are holistic, so that exchange is
    the minimum movement). Doc ids are zero-padded to width 10 so
    binary string order == numeric order on both engines."""
    import polars as pl

    from patito_ray.functions.tfidf import re2_split_tokens
    from patito_ray.stages.agg import string_agg_per_group

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    def batch_pairs(t: pa.Table) -> pa.Table:
        flat, parents, _ = re2_split_tokens(t.column("text"))
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)[parents]
        return (
            pl.DataFrame(
                {"term": pl.from_arrow(flat), "docid": ids}
            )
            .unique()
            .with_columns(
                pl.col("docid").cast(pl.Utf8).str.zfill(10).alias("docp")
            )
            .select(["term", "docp"])
            .to_arrow()
        )

    pairs = ds.map_batches(batch_pairs, batch_format="pyarrow", batch_size=None)
    agg = string_agg_per_group(pairs, by="term", value="docp", sep=",")

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "term": t.column("term"),
                "postings": t.column("agg"),
                "df": pc.cast(t.column("n"), pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", batch_size=None)


SQL_INVERTED_INDEX = """
WITH toks AS (
  SELECT DISTINCT u.term AS term,
         lpad(CAST(doc_id AS VARCHAR), 10, '0') AS docp
  FROM documents, LATERAL UNNEST(regexp_extract_all(text, '\\S+')) AS u(term)
)
SELECT term, string_agg(docp, ',' ORDER BY docp) AS postings,
       CAST(COUNT(*) AS BIGINT) AS df
FROM toks GROUP BY term
"""

QUERIES["inverted_index"] = (q_inverted_index, SQL_INVERTED_INDEX)


def q_mad_outliers(sf_dir: str) -> Any:
    """Robust per-group outlier rows: events whose value deviates from
    their type's selection-median by more than 3x the MAD — the
    heavy-tail-safe anomaly gate (mean/stddev blow up on the tails
    this is built to catch). One grouped_mad exchange produces the
    tiny per-type threshold table; the filter is then a pure per-batch
    vectorized probe against it (a handful of groups — rides the task
    closure; a large group table would go through ray.put like
    segment_revenue's dim side). Selection medians + one IEEE
    subtract/abs/multiply keep every comparison bit-identical to the
    SQL oracle — no rounding, no epsilon."""
    from patito_ray.stages.agg import collect_table
    from patito_ray.stages.quantiles import grouped_mad

    ds = _rp(sf_dir, "events", ["event_id", "event_type", "value"])
    stats = collect_table(grouped_mad(ds, by="event_type", value="value"))
    types = stats.column("event_type")
    med = stats.column("med").to_numpy(zero_copy_only=False)
    mad = stats.column("mad").to_numpy(zero_copy_only=False)

    def flag(t: pa.Table) -> pa.Table:
        v = t.column("value")
        idx = pc.fill_null(pc.index_in(t.column("event_type"), value_set=types), -1)
        i = idx.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = np.nan_to_num(v.to_numpy(zero_copy_only=False), nan=0.0)
        ok = pc.is_valid(v).to_numpy(zero_copy_only=False)
        keep = np.zeros(len(t), dtype=bool)
        hit = ok & (i >= 0)
        keep[hit] = np.abs(vals[hit] - med[i[hit]]) > 3.0 * mad[i[hit]]
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "event_type": t.column("event_type"),
                "value": v,
            }
        ).filter(pa.array(keep))

    return ds.map_batches(flag, batch_format="pyarrow", batch_size=None)


SQL_MAD_OUTLIERS = """
WITH vals AS (
  SELECT event_type AS k, value AS v FROM events WHERE value IS NOT NULL
),
ranked AS (
  SELECT k, v,
         ROW_NUMBER() OVER (PARTITION BY k ORDER BY v) AS rn,
         COUNT(*) OVER (PARTITION BY k) AS n
  FROM vals
),
med AS (
  SELECT k, n, v AS med FROM ranked
  WHERE rn = GREATEST(1, CAST(CEIL(0.5 * n) AS BIGINT))
),
ad AS (
  SELECT vals.k, ABS(vals.v - med.med) AS a, med.n
  FROM vals JOIN med ON vals.k = med.k
),
ad_ranked AS (
  SELECT k, a, n, ROW_NUMBER() OVER (PARTITION BY k ORDER BY a) AS rn FROM ad
),
mad AS (
  SELECT k, a AS mad FROM ad_ranked
  WHERE rn = GREATEST(1, CAST(CEIL(0.5 * n) AS BIGINT))
)
SELECT e.event_id, e.event_type, e.value
FROM events e
JOIN med ON e.event_type = med.k
JOIN mad ON e.event_type = mad.k
WHERE e.value IS NOT NULL AND ABS(e.value - med.med) > 3 * mad.mad
"""

QUERIES["mad_outliers"] = (q_mad_outliers, SQL_MAD_OUTLIERS)


def q_equidepth_buckets(sf_dir: str) -> Any:
    """Exact global equi-depth bucketing (NTILE(8) over the corpus-wide
    price order) WITHOUT a global payload sort: stages/prefix.py:
    global_ntile rides the ordered-prefix-sum exchange (16 B/row), then
    bucket stats are per-batch partials merged on the tiny bucket id.
    Prices move to an exact integer grid (cents) so the order key and
    every min/max is integer — zero float risk end to end."""
    from patito_ray.stages.agg import collect_table
    from patito_ray.stages.prefix import global_ntile

    ds = _rp(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_linenumber", "l_extendedprice"],
    )

    def to_cents(t: pa.Table) -> pa.Table:
        price = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        cents = np.floor(price * 100.0 + 0.5).astype(np.int64)
        tid = (
            t.column("l_orderkey").to_numpy(zero_copy_only=False) * 10
            + t.column("l_linenumber").to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {"cents": pa.array(cents), "tid": pa.array(tid.astype(np.int64))}
        )

    narrow = ds.map_batches(to_cents, batch_format="pyarrow", batch_size=None)
    bucketed = global_ntile(narrow, "cents", k=8, tie_col="tid")

    import polars as pl

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"bucket": pa.array([], type=pa.int64()),
                 "n": pa.array([], type=pa.int64()),
                 "min_cents": pa.array([], type=pa.int64()),
                 "max_cents": pa.array([], type=pa.int64())}
            )
        return (
            pl.from_arrow(t)
            .group_by("bucket")
            .agg(
                pl.len().cast(pl.Int64).alias("n"),
                pl.col("cents").min().alias("min_cents"),
                pl.col("cents").max().alias("max_cents"),
            )
            .to_arrow()
        )

    # k x #blocks partial rows — a driver pull is bounded by design
    parts = collect_table(
        bucketed.map_batches(partial, batch_format="pyarrow", batch_size=None)
    )
    return (
        pl.from_arrow(parts)
        .group_by("bucket")
        .agg(
            pl.col("n").sum().alias("n"),
            pl.col("min_cents").min().alias("min_cents"),
            pl.col("max_cents").max().alias("max_cents"),
        )
        .to_arrow()
    )


SQL_EQUIDEPTH_BUCKETS = """
WITH t AS (
  SELECT CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
         l_orderkey * 10 + l_linenumber AS tid
  FROM lineitem
), b AS (
  SELECT cents, CAST(NTILE(8) OVER (ORDER BY cents, tid) AS BIGINT) AS bucket
  FROM t
)
SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
       MIN(cents) AS min_cents, MAX(cents) AS max_cents
FROM b GROUP BY bucket
"""

QUERIES["equidepth_buckets"] = (q_equidepth_buckets, SQL_EQUIDEPTH_BUCKETS)


def q_top_unshipped_orders(sf_dir: str) -> Any:
    """TPC-H Q3 shape: customer(segment) ⋈ orders(date<) ⋈
    lineitem(shipdate>) → top-10 orders by open revenue. Both dims
    broadcast once via ray.put (the fact side streams exactly once,
    pruned at the read by the shipdate row-group filter); revenue is
    accumulated on the EXACT integer 1e-4 grid (cents x discount
    basis points) so per-order sums are int64 on both engines — no
    float summation-order risk anywhere, the final division by 10^4
    is one identical IEEE op. Top-10 = per-block prune -> bounded
    driver merge (10 rows/block ceiling)."""
    import ray

    from patito_ray.sources.readers import clean_read_parquet
    from patito_ray.stages.agg import collect_table

    cutoff = datetime.datetime(1995, 3, 15)
    import polars as pl

    cust = pa.concat_tables(
        _rp(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).iter_batches(
            batch_format="pyarrow"
        )
    )
    building = cust.filter(
        pc.equal(cust.column("c_mktsegment"), "BUILDING")
    ).column("c_custkey")

    orders = pa.concat_tables(
        clean_read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_orderdate"],
            filter=(pc.field("o_orderdate") < cutoff),
        ).iter_batches(batch_format="pyarrow")
    )
    open_orders = orders.filter(
        pc.is_in(orders.column("o_custkey"), value_set=building)
    ).select(["o_orderkey", "o_orderdate"])
    ref = ray.put(open_orders)

    lineitem = clean_read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=(pc.field("l_shipdate") > cutoff),
    )

    def partial(t: pa.Table) -> pa.Table:
        oo = ray.get(ref)
        keep = pc.is_in(t.column("l_orderkey"), value_set=oo.column("o_orderkey"))
        t = t.filter(keep)
        price = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = t.column("l_discount").to_numpy(zero_copy_only=False)
        cents = np.floor(price * 100.0 + 0.5).astype(np.int64)
        bps = 100 - np.floor(disc * 100.0 + 0.5).astype(np.int64)
        return (
            pl.DataFrame(
                {
                    "l_orderkey": t.column("l_orderkey").to_numpy(zero_copy_only=False),
                    "rev4": cents * bps,
                }
            )
            .group_by("l_orderkey")
            .agg(pl.col("rev4").sum())
            .to_arrow()
        )

    partials = lineitem.map_batches(partial, batch_format="pyarrow", batch_size=None)
    merged = merge_partial_sums(partials, ["l_orderkey"], ["rev4"])

    def prune(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t)
            .sort(["rev4", "l_orderkey"], descending=[True, False])
            .head(10)
            .to_arrow()
        )

    if isinstance(merged, pa.Table):
        top = prune(merged)
    else:
        top = prune(
            collect_table(
                merged.map_batches(prune, batch_format="pyarrow", batch_size=None)
            )
        )

    joined = (
        pl.from_arrow(top)
        .join(pl.from_arrow(open_orders), left_on="l_orderkey", right_on="o_orderkey")
        .select(["l_orderkey", "rev4", "o_orderdate"])
        .to_arrow()
    )
    # polars' columnar scalar division compiles to a reciprocal
    # MULTIPLY (x * 1/10000.0) — 1 ulp off DuckDB's true division on
    # ~half of all values, hash-fatal; pc.divide is a real IEEE divide
    return pa.table(
        {
            "l_orderkey": joined.column("l_orderkey"),
            "revenue": pc.divide(
                pc.cast(joined.column("rev4"), pa.float64()), 10000.0
            ),
            "o_orderdate": joined.column("o_orderdate"),
        }
    )


SQL_TOP_UNSHIPPED_ORDERS = """
WITH rev AS (
  SELECT l_orderkey,
         SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
             * (100 - CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT))) AS rev4
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  WHERE c_mktsegment = 'BUILDING'
    AND o_orderdate < DATE '1995-03-15'
    AND l_shipdate > DATE '1995-03-15'
  GROUP BY l_orderkey
)
SELECT rev.l_orderkey,
       CAST(rev.rev4 AS DOUBLE) / 10000.0 AS revenue,
       orders.o_orderdate
FROM rev JOIN orders ON rev.l_orderkey = orders.o_orderkey
ORDER BY rev.rev4 DESC, rev.l_orderkey LIMIT 10
"""

QUERIES["top_unshipped_orders"] = (q_top_unshipped_orders, SQL_TOP_UNSHIPPED_ORDERS)


def q_url_dedup(sf_dir: str) -> Any:
    """Canonicalize-then-dedup composition: messy synthesized URLs
    (mixed-case scheme/host, default ports, fragments — coarser path
    than url_canonical so true clusters form) collapse to one keeper
    per canonical URL with the cluster size. One (canon, id) hash
    exchange — the canonical string is the group key, so co-location is
    the minimum movement; min-id keeper + count are vectorized per
    partition."""
    import polars as pl

    from patito_ray.functions.urls import canonicalize_url_array
    from patito_ray.stages.exchange import hash_partition_ids
    from patito_ray.stages.join import default_num_partitions

    ds = _rp(sf_dir, "documents", ["doc_id"])
    nparts = default_num_partitions()

    def build(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        scheme = pa.array(np.where(ids % 2 == 0, "HTTP://", "hTTps://"))
        host = pc.binary_join_element_wise(
            pa.array(np.full(len(ids), "ExAmple", dtype=object)),
            pc.cast(pa.array(ids % 7), pa.string()),
            pa.array(np.full(len(ids), ".COM", dtype=object)),
            "",
        )
        port = pa.array(
            np.choose(ids % 4, [":80", ":443", ":8080", ""]).astype(object)
        )
        frag = pa.array(np.where(ids % 3 == 0, "#Frag", "").astype(object))
        path = pc.cast(pa.array(ids % 10), pa.string())
        url = pc.binary_join_element_wise(
            scheme, host, port,
            pa.array(np.full(len(ids), "/Path/", dtype=object)), path, frag, "",
        )
        out = pa.table(
            {"canon_url": canonicalize_url_array(url), "doc_id": t.column("doc_id")}
        )
        part = hash_partition_ids(out.column("canon_url"), nparts, "url_dedup key")
        return out.append_column("part", pa.array(part, type=pa.int64()))

    def per_partition(group: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(group.drop_columns(["part"]))
            .group_by("canon_url")
            .agg(
                pl.col("doc_id").min().alias("keeper"),
                pl.len().cast(pl.Int64).alias("n_dups"),
            )
            .to_arrow()
        )

    built = ds.map_batches(build, batch_format="pyarrow", batch_size=None)
    return built.groupby("part").map_groups(per_partition, batch_format="pyarrow")


SQL_URL_DEDUP = """
WITH u AS (
  SELECT doc_id,
    (CASE WHEN doc_id % 2 = 0 THEN 'HTTP://' ELSE 'hTTps://' END)
    || 'ExAmple' || CAST(doc_id % 7 AS VARCHAR) || '.COM'
    || (CASE doc_id % 4 WHEN 0 THEN ':80' WHEN 1 THEN ':443'
        WHEN 2 THEN ':8080' ELSE '' END)
    || '/Path/' || CAST(doc_id % 10 AS VARCHAR)
    || (CASE WHEN doc_id % 3 = 0 THEN '#Frag' ELSE '' END) AS url
  FROM documents
),
p AS (
  SELECT doc_id,
    lower(regexp_extract(url, '^([a-zA-Z][a-zA-Z0-9+.\\-]*://[^/?#]*)', 1)) AS head,
    regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.\\-]*://[^/?#]*([^#]*)', 1) AS tail
  FROM u
),
c AS (
  SELECT doc_id,
    regexp_replace(
      regexp_replace(head, '^(http://[^:]*):80$', '\\1'),
      '^(https://[^:]*):443$', '\\1') || tail AS canon_url
  FROM p
)
SELECT canon_url, MIN(doc_id) AS keeper, CAST(COUNT(*) AS BIGINT) AS n_dups
FROM c GROUP BY canon_url
"""

QUERIES["url_dedup"] = (q_url_dedup, SQL_URL_DEDUP)


def q_chi2_independence(sf_dir: str) -> Any:
    """Chi-square independence test between two categorical columns
    (documents.lang x documents.source): per-batch vectorized
    contingency partials ride the adaptive partial-sum merge (distinct
    pairs only), margins and the statistic are driver arithmetic over
    the tiny contingency table. Counts are exact integers; the
    statistic is the SAME closed-form expression evaluated from those
    integers on both engines, rounded once at 1e-6."""
    from patito_ray.stages.agg import collect_table

    import polars as pl

    ds = _rp(sf_dir, "documents", ["lang", "source"])

    def partial(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t)
            .drop_nulls()
            .group_by(["lang", "source"])
            .agg(pl.len().cast(pl.Int64).alias("c"))
            .to_arrow()
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    merged = merge_partial_sums(partials, ["lang", "source"], ["c"])
    if not isinstance(merged, pa.Table):
        merged = collect_table(merged)

    df = pl.from_arrow(merged)
    n = int(df["c"].sum())
    row = df.group_by("lang").agg(pl.col("c").sum().alias("rt"))
    col = df.group_by("source").agg(pl.col("c").sum().alias("ct"))
    j = (
        df.join(row, on="lang").join(col, on="source")
        .with_columns(
            (
                (pl.col("c").cast(pl.Float64)
                 - pl.col("rt").cast(pl.Float64) * pl.col("ct").cast(pl.Float64) / n) ** 2
                / (pl.col("rt").cast(pl.Float64) * pl.col("ct").cast(pl.Float64) / n)
            ).alias("term")
        )
    )
    chi2 = float(j["term"].sum())
    dof = (row.height - 1) * (col.height - 1)
    return _one_row(
        n=n, chi2=_rf(chi2, 6), dof=dof, cells=df.height
    )


SQL_CHI2_INDEPENDENCE = """
WITH ct AS (
  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS c
  FROM documents WHERE lang IS NOT NULL AND source IS NOT NULL
  GROUP BY lang, source
),
rt AS (SELECT lang, SUM(c) AS rt FROM ct GROUP BY lang),
colt AS (SELECT source, SUM(c) AS ct2 FROM ct GROUP BY source),
tot AS (SELECT SUM(c) AS n FROM ct)
SELECT
  CAST(tot.n AS BIGINT) AS n,
  ROUND(SUM(
    POWER(CAST(ct.c AS DOUBLE)
          - CAST(rt.rt AS DOUBLE) * CAST(colt.ct2 AS DOUBLE) / tot.n, 2)
    / (CAST(rt.rt AS DOUBLE) * CAST(colt.ct2 AS DOUBLE) / tot.n)
  ), 6) AS chi2,
  CAST(((SELECT COUNT(*) FROM rt) - 1) * ((SELECT COUNT(*) FROM colt) - 1)
       AS BIGINT) AS dof,
  CAST(COUNT(*) AS BIGINT) AS cells
FROM ct JOIN rt USING (lang) JOIN colt USING (source), tot
GROUP BY tot.n
"""

QUERIES["chi2_independence"] = (q_chi2_independence, SQL_CHI2_INDEPENDENCE)


def q_triangle_count(sf_dir: str) -> Any:
    """Exact triangle count of the part co-purchase graph (parts are
    adjacent iff some order contains both): one orderkey exchange forms
    co-purchase pairs with the shared vectorized run-pair kernel, then
    functions/graph.py:triangle_count runs the degree-ordered
    algorithm — orientation bounds max out-degree at O(sqrt(2m)) so a
    hub part cannot explode the wedge stage; wedges pre-aggregate per
    partition and probe oriented edges through ONE composite-key
    co-partition."""
    from patito_ray.functions.graph import _run_pairs, triangle_count
    from patito_ray.stages.exchange import hash_partition_ids
    from patito_ray.stages.join import default_num_partitions

    ds = _rp(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    nparts = default_num_partitions()

    def add_part(t: pa.Table) -> pa.Table:
        part = hash_partition_ids(
            t.column("l_orderkey"), nparts, "co-purchase order key"
        )
        return t.append_column("part", pa.array(part, type=pa.int64()))

    def pairs(group: pa.Table) -> pa.Table:
        o = group.column("l_orderkey").to_numpy(zero_copy_only=False)
        p = group.column("l_partkey").to_numpy(zero_copy_only=False)
        rows = np.unique(np.stack([o, p], axis=1), axis=0)
        a, b = _run_pairs(rows[:, 0], rows[:, 1])
        return pa.table(
            {"src": pa.array(a, type=pa.int64()), "dst": pa.array(b, type=pa.int64())}
        )

    # materialize: triangle_count's _check_edges fetches .schema(),
    # which EXECUTES this all-to-all pipeline (dev notes) — passed lazy,
    # the heaviest stage (the pair exchange) would run twice
    edges = (
        ds.map_batches(add_part, batch_format="pyarrow", batch_size=None)
        .groupby("part")
        .map_groups(pairs, batch_format="pyarrow")
        .materialize()
    )
    return triangle_count(edges)


SQL_TRIANGLE_COUNT = """
WITH items AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
),
e AS (
  SELECT DISTINCT i1.p AS a, i2.p AS b
  FROM items i1 JOIN items i2 ON i1.o = i2.o AND i1.p < i2.p
),
w AS (
  SELECT e1.b AS u, e2.b AS v
  FROM e e1 JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
)
SELECT
  CAST((SELECT COUNT(*) FROM w JOIN e ON e.a = w.u AND e.b = w.v) AS BIGINT)
    AS triangles,
  CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges
"""

QUERIES["triangle_count"] = (q_triangle_count, SQL_TRIANGLE_COUNT)


def q_unique_together(sf_dir: str) -> Any:
    """Composite uniqueness as a first-class validation constraint
    (model_config['unique_together']): rows where (o_custkey,
    o_orderdate) repeats, counted through the SAME fused pass +
    bucketed blob exchange as single-column uniqueness — the group's
    row hash rides as its key, 8 B per distinct pair per batch. The
    oracle recomputes patito's row-participation semantics (sum of
    group sizes > 1) from the raw pairs."""
    import patito_ray as pr

    class OrderDay(pr.Model):
        o_custkey: int
        o_orderdate: datetime.date
        o_totalprice: float

        model_config = {"unique_together": [("o_custkey", "o_orderdate")]}

    ds = _rp(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"])
    rep = pr.validate_report(ds, OrderDay)
    n = rep.merged.dup_counts.get("o_custkey+o_orderdate", 0)
    return _one_row(dup_rows=int(n))


SQL_UNIQUE_TOGETHER = """
SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) AS dup_rows FROM (
  SELECT COUNT(*) AS c FROM orders GROUP BY o_custkey, o_orderdate
) WHERE c > 1
"""

QUERIES["unique_together"] = (q_unique_together, SQL_UNIQUE_TOGETHER)


def q_k_anonymity(sf_dir: str) -> Any:
    """k-anonymity audit over (c_nationkey, c_mktsegment) at k=10:
    which quasi-identifier combinations would re-identify customers.
    validation/stats.py:k_anonymity — distinct-tuple partial counts
    through the adaptive merge, tiny size aggregation after. Exact
    integer outputs."""
    from patito_ray.validation.stats import k_anonymity

    ds = _rp(sf_dir, "customer", ["c_nationkey", "c_mktsegment"])
    return k_anonymity(ds, ["c_nationkey", "c_mktsegment"], k=10)


SQL_K_ANONYMITY = """
WITH g AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS c FROM customer
  WHERE c_nationkey IS NOT NULL AND c_mktsegment IS NOT NULL
  GROUP BY c_nationkey, c_mktsegment
)
SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(COALESCE(SUM(CASE WHEN c < 10 THEN 1 ELSE 0 END), 0) AS BIGINT)
         AS n_small_groups,
       CAST(COALESCE(SUM(CASE WHEN c < 10 THEN c ELSE 0 END), 0) AS BIGINT)
         AS violating_rows,
       CAST(COALESCE(MIN(c), 0) AS BIGINT) AS min_group_size
FROM g
"""

QUERIES["k_anonymity"] = (q_k_anonymity, SQL_K_ANONYMITY)


def q_decontaminate(sf_dir: str) -> Any:
    """Benchmark decontamination (GPT-3 appendix-C style): documents
    sharing any token 8-gram with the eval split (doc_id % 41 == 0),
    with the count of overlapping gram positions. The benchmark gram
    set broadcasts ONCE (ray.put); the corpus pass is one actor-pool
    map_batches with ZERO exchange — sorted-hash searchsorted
    prefilter, exact string confirm on hits, bincount attribution.
    Oracle: DuckDB rebuilds both gram sets and joins."""
    import numpy as np

    from patito_ray.functions.decontaminate import decontaminate

    docs = _rp(sf_dir, "documents", ["doc_id", "text"])

    def bench_split(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % 41 == 0)).select(["text"])

    bench = _rp(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        bench_split, batch_format="pyarrow", batch_size=None
    )
    return decontaminate(docs, bench, n=8, mode="overlap", concurrency=2)


SQL_DECONTAMINATE = """
WITH btok AS (
  SELECT regexp_extract_all(text, '\\S+') AS toks
  FROM documents WHERE doc_id % 41 = 0
), bench AS (
  SELECT DISTINCT array_to_string(toks[s : s + 7], ' ') AS gram
  FROM btok, LATERAL unnest(generate_series(1, len(toks) - 7)) AS u(s)
  WHERE len(toks) >= 8
), ctok AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS toks FROM documents
), g AS (
  SELECT doc_id, array_to_string(toks[s : s + 7], ' ') AS gram
  FROM ctok, LATERAL unnest(generate_series(1, len(toks) - 7)) AS u(s)
  WHERE len(toks) >= 8
)
SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_overlap
FROM g JOIN bench ON g.gram = bench.gram
GROUP BY g.doc_id
"""

QUERIES["decontaminate"] = (q_decontaminate, SQL_DECONTAMINATE)


def q_heavy_hitters(sf_dir: str) -> Any:
    """EXACT phi-heavy hitters over events.user_id WITHOUT a
    full-column groupby: Misra-Gries candidate pass (guaranteed
    superset — merged undercount < phi*n/2 at capacity 2/phi), then
    exact counts of only the broadcast candidate set through the
    adaptive partial-sum merge. Exchange bounded by 2/phi rows,
    independent of the user cardinality. Threshold is IEEE
    ceil(phi*n) on BOTH engines (a DECIMAL literal would round
    differently)."""
    from patito_ray.validation.stats import heavy_hitters

    ds = _rp(sf_dir, "events", ["user_id"])
    return heavy_hitters(ds, "user_id", phi=0.008)


SQL_HEAVY_HITTERS = """
WITH c AS (
  SELECT user_id AS value, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events WHERE user_id IS NOT NULL GROUP BY user_id
), t AS (
  SELECT CEIL(CAST(0.008 AS DOUBLE) * COUNT(user_id)) AS th FROM events
)
SELECT value, cnt FROM c, t WHERE cnt >= th
"""

QUERIES["heavy_hitters"] = (q_heavy_hitters, SQL_HEAVY_HITTERS)


def q_fd_audit(sf_dir: str) -> Any:
    """Functional-dependency audit l_partkey -> l_suppkey (does every
    part come from one supplier? — here richly violated by design):
    only DISTINCT (lhs, rhs) pairs ride the exchange, per-key distinct
    counts through the adaptive merge, one-row reduction after.
    validation/stats.py:fd_violations."""
    from patito_ray.validation.stats import fd_violations

    ds = _rp(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
    return fd_violations(ds, "l_partkey", "l_suppkey")


SQL_FD_AUDIT = """
WITH d AS (
  SELECT l_partkey, COUNT(DISTINCT l_suppkey) AS n FROM lineitem
  WHERE l_suppkey IS NOT NULL GROUP BY l_partkey
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(COALESCE(SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END), 0) AS BIGINT)
         AS n_violating_keys,
       CAST(COALESCE(MAX(n), 0) AS BIGINT) AS max_distinct_rhs
FROM d
"""

QUERIES["fd_audit"] = (q_fd_audit, SQL_FD_AUDIT)


def q_monotonic_audit(sf_dir: str) -> Any:
    """Per-user monotonicity audit: must `value` never decrease over a
    user's event sequence (cumulative-counter data-quality check)?
    One window pass (lag over the user-key exchange) + per-user
    inversion-count partials through the adaptive merge; NaN/null
    previous values compare False exactly like SQL NULL. One exact
    integer row."""
    import numpy as np
    import polars as pl

    from patito_ray.stages.agg import collect_table, merge_partial_sums
    from patito_ray.stages.window import window_over

    ds = _rp(sf_dir, "events", ["event_id", "user_id", "value"])
    w = window_over(
        ds, by="user_id", order=["event_id"], cols={"pv": ("lag", "value")}
    )

    def partial(t: pa.Table) -> pa.Table:
        # window_over (map_groups) output can interleave ()-schema
        # empty blocks (dev notes) — same guard as q_cum_spend
        if t.num_rows == 0 or "pv" not in t.column_names:
            return pa.schema(
                [("user_id", pa.int64()), ("inv", pa.int64())]
            ).empty_table()
        v = t.column("value").to_numpy(zero_copy_only=False)
        pv = t.column("pv").to_numpy(zero_copy_only=False)
        with np.errstate(invalid="ignore"):
            inv = (v < pv).astype(np.int64)
        return (
            pl.from_arrow(
                pa.table({"user_id": t.column("user_id"), "inv": pa.array(inv)})
            )
            .group_by("user_id")
            .agg(pl.col("inv").sum())
            .to_arrow()
        )

    partials = w.map_batches(partial, batch_format="pyarrow", batch_size=None)
    merged = merge_partial_sums(partials, ["user_id"], ["inv"])

    _schema = pa.schema(
        [
            ("n_users", pa.int64()),
            ("n_violating_users", pa.int64()),
            ("n_inversions", pa.int64()),
        ]
    )

    def sizes(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _schema.empty_table()
        c = t.column("inv").to_numpy(zero_copy_only=False)
        return _one_row(
            n_users=len(c),
            n_violating_users=int((c > 0).sum()),
            n_inversions=int(c.sum()),
        )

    if isinstance(merged, pa.Table):
        out = sizes(merged)
    else:
        # post-groupby blocks are user-disjoint: size partials sum exactly
        parts = collect_table(
            merged.map_batches(sizes, batch_format="pyarrow", batch_size=None),
            empty_schema=_schema,
        )
        out = _one_row(
            n_users=int(pc.sum(parts.column("n_users")).as_py() or 0),
            n_violating_users=int(
                pc.sum(parts.column("n_violating_users")).as_py() or 0
            ),
            n_inversions=int(pc.sum(parts.column("n_inversions")).as_py() or 0),
        )
    return out


SQL_MONOTONIC_AUDIT = """
WITH w AS (
  SELECT user_id, value,
         LAG(value) OVER (PARTITION BY user_id ORDER BY event_id) AS pv
  FROM events
), g AS (
  SELECT user_id, SUM(CASE WHEN value < pv THEN 1 ELSE 0 END) AS inv
  FROM w GROUP BY user_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(COALESCE(SUM(CASE WHEN inv > 0 THEN 1 ELSE 0 END), 0) AS BIGINT)
         AS n_violating_users,
       CAST(COALESCE(SUM(inv), 0) AS BIGINT) AS n_inversions
FROM g
"""

QUERIES["monotonic_audit"] = (q_monotonic_audit, SQL_MONOTONIC_AUDIT)


def q_stratified_exact_k(sf_dir: str) -> Any:
    """Stratified exact-k sample: exactly min(10, n_s) documents per
    source, selected as the 10 smallest splitmix64(doc_id ^ 23) within
    each stratum — the shape eval-set construction needs (pinned size
    PER stratum, shard-stable membership). Rides cap_per_key's grouped
    top-k exchange: each batch prunes to <= k rows per stratum before
    the shuffle, so a hot stratum costs k rows, not its population."""
    from patito_ray.functions.sampling import cap_per_key

    ds = _rp(sf_dir, "documents", ["doc_id", "source"])
    out = cap_per_key(ds, key_col="source", k=10, id_col="doc_id", seed=23)
    return out.map_batches(
        lambda t: t.select(["doc_id", "source"]),
        batch_format="pyarrow",
        batch_size=None,
    )


SQL_STRATIFIED_EXACT_K = f"""
WITH z0 AS (
  SELECT doc_id, source,
    CAST((CAST(xor(CAST(doc_id AS UBIGINT), 23) AS HUGEINT)
          + 11400714819323198485)
         % 18446744073709551616 AS UBIGINT) AS z
  FROM documents
), x1 AS (
  SELECT doc_id, source, xor(z, z >> 30) AS z FROM z0
), z1 AS (
  SELECT doc_id, source, {_sql_mul64(3210233709, 484763065)} AS z FROM x1
), x2 AS (
  SELECT doc_id, source, xor(z, z >> 27) AS z FROM z1
), z2 AS (
  SELECT doc_id, source, {_sql_mul64(2496678331, 321982955)} AS z FROM x2
), h AS (
  SELECT doc_id, source, CAST(xor(z, z >> 31) AS HUGEINT) AS h64 FROM z2
), r AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY h64, doc_id) AS rn
  FROM h
)
SELECT doc_id, source FROM r WHERE rn <= 10
"""

QUERIES["stratified_exact_k"] = (q_stratified_exact_k, SQL_STRATIFIED_EXACT_K)


def q_span_dedup(sf_dir: str) -> Any:
    """Span-level exact-substring duplication audit (the suffix-array
    dedup semantics of Lee et al. 2022, Ray-native): for every document,
    how many distinct 20-char windows it has and how many of those occur
    in >= 2 distinct documents. Dual 64-bit rolling hashes over the Arrow
    string buffer (O(chars), no window materialization), narrow 24 B
    (h1,h2,doc) rows through one hash-partition exchange, per-doc
    partials through the adaptive merge. functions/spandedup.py."""
    from patito_ray.functions.spandedup import duplicated_span_stats

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    return duplicated_span_stats(ds, L=20)


SQL_SPAN_DEDUP = """
WITH pos AS (
  SELECT doc_id, text, unnest(generate_series(1, length(text) - 19)) AS i
  FROM documents
), dg AS (
  SELECT DISTINCT doc_id, substr(text, CAST(i AS INTEGER), 20) AS gram FROM pos
), d AS (
  SELECT gram, COUNT(*) AS nd FROM dg GROUP BY gram
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(COALESCE(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END), 0) AS BIGINT)
         AS n_dup_grams
FROM dg JOIN d USING (gram) GROUP BY doc_id
"""

QUERIES["span_dedup"] = (q_span_dedup, SQL_SPAN_DEDUP)


def q_inclusion_audit(sf_dir: str) -> Any:
    """Inclusion-dependency (FK-candidate) discovery: how many distinct
    event user_ids exist in the customer key set? Batch-distinct values
    tagged with a side bit through ONE hash-partition exchange, exact
    vectorized set membership per partition, P-row driver sum.
    validation/stats.py:inclusion_audit."""
    from patito_ray.validation.stats import inclusion_audit

    a = _rp(sf_dir, "events", ["user_id"])
    b = _rp(sf_dir, "customer", ["c_custkey"])
    return inclusion_audit(a, "user_id", b, "c_custkey")


SQL_INCLUSION_AUDIT = """
WITH a AS (
  SELECT DISTINCT user_id AS v FROM events WHERE user_id IS NOT NULL
), b AS (
  SELECT DISTINCT c_custkey AS v FROM customer WHERE c_custkey IS NOT NULL
)
SELECT CAST((SELECT COUNT(*) FROM a) AS BIGINT) AS n_distinct,
       CAST((SELECT COUNT(*) FROM a JOIN b USING (v)) AS BIGINT) AS n_contained
"""

QUERIES["inclusion_audit"] = (q_inclusion_audit, SQL_INCLUSION_AUDIT)


def q_benford_audit(sf_dir: str) -> Any:
    """Benford leading-digit profile of o_orderkey: exact integer
    first-significant-digit counts (power-of-ten searchsorted, no
    float log10), 9-bin bincount partials, constant-size merge.
    validation/stats.py:benford_counts."""
    from patito_ray.validation.stats import benford_counts

    ds = _rp(sf_dir, "orders", ["o_orderkey"])
    return benford_counts(ds, "o_orderkey")


SQL_BENFORD_AUDIT = """
SELECT CAST(substr(CAST(o_orderkey AS VARCHAR), 1, 1) AS BIGINT) AS digit,
       CAST(COUNT(*) AS BIGINT) AS cnt
FROM orders WHERE o_orderkey > 0
GROUP BY 1 ORDER BY digit
"""

QUERIES["benford_audit"] = (q_benford_audit, SQL_BENFORD_AUDIT)


def q_regression_per_group(sf_dir: str) -> Any:
    """Grouped OLS regression (y = extendedprice on x = quantity per
    returnflag) from EXACT partial sums — quantity is integer and
    prices are on the cents grid, so every sum is an exact double and
    summation order cannot skew bits. Both engines evaluate the SAME
    naive normal-equation expressions; only the final values round (to
    1e-6), mirroring corr_per_group."""
    import polars as pl

    ds = _rp(sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(
            pa.table(
                {
                    "k": t.column("l_returnflag"),
                    "x": t.column("l_quantity"),
                    "y": t.column("l_extendedprice"),
                }
            )
        )
        return (
            df.group_by("k")
            .agg(
                [
                    pl.len().cast(pl.Float64).alias("n"),
                    pl.col("x").sum().cast(pl.Float64).alias("sx"),
                    pl.col("y").sum().alias("sy"),
                    (pl.col("x") * pl.col("y")).sum().alias("sxy"),
                    (pl.col("x") * pl.col("x")).sum().cast(pl.Float64).alias("sxx"),
                    (pl.col("y") * pl.col("y")).sum().alias("syy"),
                ]
            )
            .to_arrow()
        )

    from patito_ray.stages.agg import merge_partial_sums

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    merged = merge_partial_sums(
        partials, ["k"], ["n", "sx", "sy", "sxy", "sxx", "syy"]
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False)
        sx = t.column("sx").to_numpy(zero_copy_only=False)
        sy = t.column("sy").to_numpy(zero_copy_only=False)
        sxy = t.column("sxy").to_numpy(zero_copy_only=False)
        sxx = t.column("sxx").to_numpy(zero_copy_only=False)
        syy = t.column("syy").to_numpy(zero_copy_only=False)
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        intercept = (sy - slope * sx) / n
        corr = (n * sxy - sx * sy) / (
            np.sqrt(n * sxx - sx * sx) * np.sqrt(n * syy - sy * sy)
        )
        return pa.table(
            {
                "l_returnflag": t.column("k"),
                "n": pa.array(n.astype(np.int64), pa.int64()),
                "slope": _r(pa.array(slope, pa.float64()), 6),
                "intercept": _r(pa.array(intercept, pa.float64()), 6),
                "r2": _r(pa.array(corr * corr, pa.float64()), 6),
            }
        )

    return _apply(merged, finish)


SQL_REGRESSION_PER_GROUP = """
WITH s AS (
  SELECT l_returnflag AS k,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(l_quantity) AS DOUBLE) AS sx,
         SUM(l_extendedprice) AS sy,
         SUM(l_quantity * l_extendedprice) AS sxy,
         CAST(SUM(l_quantity * l_quantity) AS DOUBLE) AS sxx,
         SUM(l_extendedprice * l_extendedprice) AS syy
  FROM lineitem GROUP BY l_returnflag
)
SELECT k AS l_returnflag,
       CAST(n AS BIGINT) AS n,
       ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
       ROUND((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6)
         AS intercept,
       ROUND(((n * sxy - sx * sy) /
              (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy))) *
             ((n * sxy - sx * sy) /
              (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy))), 6) AS r2
FROM s
"""

QUERIES["regression_per_group"] = (q_regression_per_group, SQL_REGRESSION_PER_GROUP)


def q_latest_by_key(sf_dir: str) -> Any:
    """Snapshot dedup / CDC compaction: keep each user's LATEST event
    (newest ts, event_id ascending breaks ties) — the 'latest crawl of
    every URL wins' operator. One grouped-top-1 exchange: every batch
    prunes to one row per key before the shuffle."""
    from patito_ray.stages.topk import grouped_top_k

    ds = _rp(sf_dir, "events", ["event_id", "user_id", "ts"])
    out = grouped_top_k(
        ds, group="user_id", value="ts", k=1, tie="event_id", descending=True
    )
    return out.map_batches(
        lambda t: t.select(["user_id", "event_id", "ts"]),
        batch_format="pyarrow",
        batch_size=None,
    )


SQL_LATEST_BY_KEY = """
SELECT user_id, event_id, ts FROM (
  SELECT user_id, event_id, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id)
           AS rn
  FROM events
) WHERE rn = 1
"""

QUERIES["latest_by_key"] = (q_latest_by_key, SQL_LATEST_BY_KEY)


def q_zscore_normalize(sf_dir: str) -> Any:
    """Per-group z-score standardization of event values (feature
    normalization as a distributed transform): exact integer cent sums
    per event_type (one narrow pass), stats broadcast into a second
    vectorized pass. Both engines evaluate the IDENTICAL expression
    (c - sx/n) / sqrt(sxx/n - (sx/n)^2) on the same doubles."""
    import polars as pl

    ds = _rp(sf_dir, "events", ["event_id", "event_type", "value"])

    def cents(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        c = np.round(v * 100.0).astype(np.int64)
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "event_type": t.column("event_type"),
                "c": pa.array(c, type=pa.int64()),
            }
        )

    cds = ds.map_batches(cents, batch_format="pyarrow", batch_size=None)

    def partial(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select(["event_type", "c"]))
        return (
            df.group_by("event_type")
            .agg(
                pl.len().cast(pl.Int64).alias("n"),
                pl.col("c").sum().alias("sx"),
                (pl.col("c") * pl.col("c")).sum().alias("sxx"),
            )
            .to_arrow()
        )

    from patito_ray.stages.agg import collect_table, merge_partial_sums

    merged = merge_partial_sums(
        cds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["event_type"],
        ["n", "sx", "sxx"],
    )
    if not isinstance(merged, pa.Table):
        merged = collect_table(
            merged,
            empty_schema=pa.schema(
                [
                    ("event_type", pa.string()),
                    ("n", pa.int64()),
                    ("sx", pa.int64()),
                    ("sxx", pa.int64()),
                ]
            ),
        )
    stats = {
        r["event_type"]: (float(r["n"]), float(r["sx"]), float(r["sxx"]))
        for r in merged.to_pylist()
    }

    def zscore(t: pa.Table) -> pa.Table:
        et = t.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        enc = pc.dictionary_encode(et)
        idx = enc.indices.to_numpy(zero_copy_only=False)
        uniq = enc.dictionary.to_pylist()  # python loop over #types only
        c = t.column("c").to_numpy(zero_copy_only=False).astype(np.float64)
        n = np.array([stats[k][0] for k in uniq])[idx]
        sx = np.array([stats[k][1] for k in uniq])[idx]
        sxx = np.array([stats[k][2] for k in uniq])[idx]
        m = sx / n
        z = (c - m) / np.sqrt(sxx / n - m * m)
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "z": _r(pa.array(z, pa.float64()), 6),
            }
        )

    return cds.map_batches(zscore, batch_format="pyarrow", batch_size=None)


SQL_ZSCORE_NORMALIZE = """
WITH c AS (
  SELECT event_id, event_type, CAST(ROUND(value * 100) AS BIGINT) AS c
  FROM events
), s AS (
  SELECT event_type,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(c) AS DOUBLE) AS sx,
         CAST(SUM(c * c) AS DOUBLE) AS sxx
  FROM c GROUP BY event_type
)
SELECT event_id,
       ROUND((CAST(c.c AS DOUBLE) - sx / n) /
             SQRT(sxx / n - (sx / n) * (sx / n)), 6) AS z
FROM c JOIN s USING (event_type)
"""

QUERIES["zscore_normalize"] = (q_zscore_normalize, SQL_ZSCORE_NORMALIZE)


def q_tokens_per_source(sf_dir: str) -> Any:
    """Token budget per source (the 'how many tokens does each corpus
    slice contribute' mixture-planning report): RE2-exact per-batch
    token counts reduced to per-source partials, adaptive merge — one
    narrow streaming pass, O(#sources) exchange."""
    import polars as pl

    from patito_ray.functions.text import token_count_array

    ds = _rp(sf_dir, "documents", ["source", "text"])

    def partial(t: pa.Table) -> pa.Table:
        n = token_count_array(t.column("text"))
        return (
            pl.from_arrow(pa.table({"source": t.column("source"), "n_tokens": n}))
            .group_by("source")
            .agg(pl.col("n_tokens").sum().cast(pl.Int64))
            .to_arrow()
        )

    from patito_ray.stages.agg import merge_partial_sums

    merged = merge_partial_sums(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["source"],
        ["n_tokens"],
    )

    def finish(t: pa.Table) -> pa.Table:
        return t.select(["source", "n_tokens"]).cast(
            pa.schema([("source", pa.string()), ("n_tokens", pa.int64())])
        )

    return _apply(merged, finish)


SQL_TOKENS_PER_SOURCE = """
SELECT source,
       CAST(SUM(length(regexp_extract_all(text, '\\S+'))) AS BIGINT) AS n_tokens
FROM documents GROUP BY source
"""

QUERIES["tokens_per_source"] = (q_tokens_per_source, SQL_TOKENS_PER_SOURCE)


def q_ks_drift(sf_dir: str) -> Any:
    """Exact two-sample Kolmogorov-Smirnov statistic between the event
    value distributions of even vs odd users (the drift gate a mixture
    re-balance needs): per-(cent-value, side) counts through the
    adaptive merge — the exchange is bounded by the DISTINCT value
    count, not rows — then one driver cumsum over the sorted value
    grid. Both engines form the same exact integer cumulative counts
    and the identical IEEE ratio expression; only the final statistic
    rounds (1e-6). For unbounded-cardinality columns the same
    computation rides stages/prefix.py's ordered prefix sum instead of
    a driver cumsum."""
    import polars as pl

    ds = _rp(sf_dir, "events", ["user_id", "value"])

    def partial(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        c = np.round(v * 100.0).astype(np.int64)
        side = (
            t.column("user_id").to_numpy(zero_copy_only=False) % 2
        ).astype(np.int64)
        return (
            pl.DataFrame({"c": c, "side": side})
            .group_by(["c", "side"])
            .agg(pl.len().cast(pl.Int64).alias("cnt"))
            .to_arrow()
        )

    from patito_ray.stages.agg import collect_table, merge_partial_sums

    merged = merge_partial_sums(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["c", "side"],
        ["cnt"],
    )
    if not isinstance(merged, pa.Table):
        merged = collect_table(
            merged,
            empty_schema=pa.schema(
                [("c", pa.int64()), ("side", pa.int64()), ("cnt", pa.int64())]
            ),
        )
    c = merged.column("c").to_numpy(zero_copy_only=False)
    side = merged.column("side").to_numpy(zero_copy_only=False)
    cnt = merged.column("cnt").to_numpy(zero_copy_only=False)
    grid = np.unique(c)
    na = np.zeros(len(grid), dtype=np.int64)
    nb = np.zeros(len(grid), dtype=np.int64)
    pos = np.searchsorted(grid, c)
    np.add.at(na, pos[side == 0], cnt[side == 0])
    np.add.at(nb, pos[side == 1], cnt[side == 1])
    ta, tb = float(na.sum()), float(nb.sum())
    ca = np.cumsum(na).astype(np.float64)
    cb = np.cumsum(nb).astype(np.float64)
    ks = float(np.max(np.abs(ca / ta - cb / tb))) if len(grid) else 0.0
    return pa.table({"ks": pa.array([_rf(ks, 6)], type=pa.float64())})


SQL_KS_DRIFT = """
WITH c AS (
  SELECT CAST(ROUND(value * 100) AS BIGINT) AS c, user_id % 2 AS side
  FROM events
), g AS (
  SELECT c,
         SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS na,
         SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS nb
  FROM c GROUP BY c
), t AS (
  SELECT SUM(na) OVER (ORDER BY c) AS ca,
         SUM(nb) OVER (ORDER BY c) AS cb,
         (SELECT CAST(SUM(na) AS DOUBLE) FROM g) AS ta,
         (SELECT CAST(SUM(nb) AS DOUBLE) FROM g) AS tb
  FROM g
)
SELECT ROUND(MAX(ABS(CAST(ca AS DOUBLE) / ta - CAST(cb AS DOUBLE) / tb)), 6)
  AS ks
FROM t
"""

QUERIES["ks_drift"] = (q_ks_drift, SQL_KS_DRIFT)


def q_roc_auc(sf_dir: str) -> pa.Table:
    """Exact ROC-AUC of the event value as a purchase-vs-rest score
    (the calibration gate for a quality classifier): Mann-Whitney with
    average-rank tie handling, computed from per-(cent-value, class)
    counts through the adaptive merge — the exchange is bounded by the
    DISTINCT score count, never rows. The numerator
    sum(p_i * (2*cum_neg_below_i + n_i)) is pure integer arithmetic on
    both engines (ties handled identically by construction); one IEEE
    division + 1e-6 round at the end. At 10^12 rows the int64
    numerator would need the int128 the SQL HUGEINT sum gets — the
    grid counts themselves stay exact either way."""
    import polars as pl

    ds = _rp(sf_dir, "events", ["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        c = np.round(v * 100.0).astype(np.int64)
        y = pc.equal(t.column("event_type"), "purchase").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        return (
            pl.DataFrame({"c": c, "p": y, "n": 1 - y})
            .group_by("c")
            .agg(pl.col("p").sum(), pl.col("n").sum())
            .to_arrow()
        )

    from patito_ray.stages.agg import collect_table, merge_partial_sums

    merged = merge_partial_sums(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["c"],
        ["p", "n"],
    )
    if not isinstance(merged, pa.Table):
        merged = collect_table(
            merged,
            empty_schema=pa.schema(
                [("c", pa.int64()), ("p", pa.int64()), ("n", pa.int64())]
            ),
        )
    c = merged.column("c").to_numpy(zero_copy_only=False)
    p = merged.column("p").to_numpy(zero_copy_only=False)
    n = merged.column("n").to_numpy(zero_copy_only=False)
    order = np.argsort(c, kind="stable")
    p, n = p[order], n[order]
    cnb = np.concatenate(([0], np.cumsum(n)[:-1]))
    num = int(np.sum(p * (2 * cnb + n)))
    P, N = int(p.sum()), int(n.sum())
    auc = float(num) / (2.0 * P * N) if P and N else float("nan")
    return pa.table({"auc": pa.array([_rf(auc, 6)], type=pa.float64())})


SQL_ROC_AUC = """
WITH c AS (
  SELECT CAST(ROUND(value * 100) AS BIGINT) AS c,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events
), g AS (
  SELECT c, SUM(y) AS p, SUM(1 - y) AS n FROM c GROUP BY c
), w AS (
  SELECT p, n,
         COALESCE(SUM(n) OVER (ORDER BY c
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cnb
  FROM g
)
SELECT ROUND(CAST(SUM(p * (2 * cnb + n)) AS DOUBLE)
       / (2.0 * (SELECT SUM(p) FROM g) * (SELECT SUM(n) FROM g)), 6) AS auc
FROM w
"""

QUERIES["roc_auc"] = (q_roc_auc, SQL_ROC_AUC)


def q_jaccard_join(sf_dir: str) -> Any:
    """Exact Jaccard-threshold set-similarity self-join (prefix
    filtering): every doc pair whose lowercased token-set Jaccard is
    >= 0.8, exact scores — the deterministic counterpart of
    minhash_pairs (same verify kernel, recall by the prefix-filter
    lemma instead of probability)."""
    from patito_ray.functions.setjoin import jaccard_threshold_pairs

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    # the synthetic documents table IS the dense tiny-vocab corpus the
    # pre-flight guard exists for; the oracle query opts into the exact
    # Ω(output) cost explicitly
    out = jaccard_threshold_pairs(
        ds, threshold=0.8, shingle_n=1, max_candidates=None
    )
    return _lazy_norm(
        out,
        pa.schema([("a", pa.int64()), ("b", pa.int64()), ("jaccard", pa.float64())]),
        round_col="jaccard",
    )


SQL_JACCARD_JOIN = """
WITH tok AS (
  SELECT DISTINCT doc_id, t.tok
  FROM documents, UNNEST(regexp_extract_all(lower(text), '\\S+')) AS t(tok)
), sz AS (SELECT doc_id, COUNT(*) AS s FROM tok GROUP BY doc_id),
inter AS (
  SELECT x.doc_id AS da, y.doc_id AS db, COUNT(*) AS i
  FROM tok x JOIN tok y ON x.tok = y.tok AND x.doc_id < y.doc_id
  GROUP BY 1, 2
)
SELECT da AS a, db AS b,
       ROUND(CAST(i AS DOUBLE) / (sa.s + sb.s - i), 4) AS jaccard
FROM inter
JOIN sz sa ON sa.doc_id = da
JOIN sz sb ON sb.doc_id = db
WHERE CAST(i AS DOUBLE) / (sa.s + sb.s - i) >= 0.8
"""

QUERIES["jaccard_join"] = (q_jaccard_join, SQL_JACCARD_JOIN)


def q_span_positions(sf_dir: str) -> Any:
    """Actionable span dedup: the (doc_id, 1-based start) of every
    sampled 20-char window (stride 4) that occurs in >= 2 distinct
    documents — the strip-list a Lee-et-al-style cut pass consumes.
    One blob exchange; duplicated positions are final output
    (functions/spandedup.py:duplicated_span_positions)."""
    from patito_ray.functions.spandedup import duplicated_span_positions

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    out = duplicated_span_positions(ds, L=20, stride=4)
    return _lazy_norm(
        out, pa.schema([("doc_id", pa.int64()), ("pos", pa.int64())])
    )


SQL_SPAN_POSITIONS = """
WITH pos AS (
  SELECT doc_id, CAST(i AS BIGINT) AS i,
         substr(text, CAST(i AS INTEGER), 20) AS gram
  FROM documents,
       unnest(generate_series(1, length(text) - 19, 4)) AS t(i)
), d AS (
  SELECT gram FROM (
    SELECT gram, COUNT(DISTINCT doc_id) AS nd FROM pos GROUP BY gram
  ) WHERE nd > 1
)
SELECT doc_id, i AS pos FROM pos JOIN d USING (gram)
"""

QUERIES["span_positions"] = (q_span_positions, SQL_SPAN_POSITIONS)


def q_span_cut(sf_dir: str) -> Any:
    """End-to-end Lee-et-al span dedup: strip every character covered
    by a cross-document duplicated 20-char window (stride 4 sampling)
    and return each document's stitched remainder. One blob exchange
    for positions + one co-partition cut pass, interval merge and
    slicing fully vectorized (spandedup.cut_duplicated_spans)."""
    from patito_ray.functions.spandedup import cut_duplicated_spans

    out = cut_duplicated_spans(
        _rp(sf_dir, "documents", ["doc_id", "text"]), L=20, stride=4
    )
    return _lazy_norm(
        out, pa.schema([("doc_id", pa.int64()), ("clean_text", pa.string())])
    )


SQL_SPAN_CUT = """
WITH pos AS (
  SELECT doc_id, CAST(i AS BIGINT) AS i,
         substr(text, CAST(i AS INTEGER), 20) AS gram
  FROM documents,
       unnest(generate_series(1, length(text) - 19, 4)) AS t(i)
), dup AS (
  SELECT doc_id, i FROM pos JOIN (
    SELECT gram FROM (
      SELECT gram, COUNT(DISTINCT doc_id) AS nd FROM pos GROUP BY gram
    ) WHERE nd > 1
  ) USING (gram)
), cov AS (
  SELECT DISTINCT doc_id, CAST(c.j AS BIGINT) AS j
  FROM dup, unnest(generate_series(dup.i, dup.i + 19)) AS c(j)
), chars AS (
  SELECT doc_id, CAST(i AS BIGINT) AS i,
         substr(text, CAST(i AS INTEGER), 1) AS ch
  FROM documents, unnest(generate_series(1, length(text))) AS t(i)
), kept AS (
  SELECT ch.doc_id, ch.i, ch.ch
  FROM chars ch ANTI JOIN cov ON cov.doc_id = ch.doc_id AND cov.j = ch.i
)
SELECT d.doc_id, COALESCE(k.txt, '') AS clean_text
FROM documents d LEFT JOIN (
  SELECT doc_id, string_agg(ch, '' ORDER BY i) AS txt FROM kept GROUP BY doc_id
) k USING (doc_id)
"""

QUERIES["span_cut"] = (q_span_cut, SQL_SPAN_CUT)


def q_calibration_bins(sf_dir: str) -> Any:
    """Reliability diagram for the value-as-purchase-score signal
    (companion to roc_auc): fixed-width score bins with observed
    positive rates. Integer (n, pos) partials per bin through the
    adaptive merge — exchange bounded by the bin count — and both
    engines evaluate the identical FLOOR(value/10) binning and
    pos/n IEEE division (final 1e-6 round)."""
    import polars as pl

    ds = _rp(sf_dir, "events", ["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        b = np.floor(v / 10.0).astype(np.int64)
        y = pc.equal(t.column("event_type"), "purchase").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        return (
            pl.DataFrame({"bin": b, "n": np.ones(len(b), np.int64), "pos": y})
            .group_by("bin")
            .agg(pl.col("n").sum(), pl.col("pos").sum())
            .to_arrow()
        )

    from patito_ray.stages.agg import merge_partial_sums

    merged = merge_partial_sums(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["bin"],
        ["n", "pos"],
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        pos = t.column("pos").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "bin": pc.cast(t.column("bin"), pa.int64()),
                "n": pc.cast(t.column("n"), pa.int64()),
                "pos": pc.cast(t.column("pos"), pa.int64()),
                "rate": _r(pa.array(pos / n, type=pa.float64()), 6),
            }
        )

    return _apply(merged, finish)


SQL_CALIBRATION_BINS = """
SELECT CAST(FLOOR(value / 10) AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
         AS pos,
       ROUND(CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         AS DOUBLE) / COUNT(*), 6) AS rate
FROM events GROUP BY 1
"""

QUERIES["calibration_bins"] = (q_calibration_bins, SQL_CALIBRATION_BINS)


def q_kcore_docs(sf_dir: str) -> Any:
    """4-core of the (undirected view of the) 3-out-link doc graph —
    the 'dense community' primitive. functions/graph.py:k_core runs
    distributed iterative peeling (distinct-neighbour degrees as
    mergeable partials, frontier broadcast while small, co-partitioned
    anti filter beyond). Oracle: the peel unrolled 12 rounds in plain
    SQL — measured convergence on this deterministic graph is <= 7
    rounds from 50 to 50k nodes (k=4: <= 5), so 12 is converged at
    every driver/bench scale; a non-converged oracle would surface as
    a loud hash mismatch, never a silent pass."""
    from patito_ray.functions.graph import k_core

    edges, _n = _doc_link_edges(sf_dir, 3)
    res = k_core(edges, k=4)

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "node" not in t.column_names:
            return pa.schema([("node", pa.int64())]).empty_table()
        return pa.table({"node": pc.cast(t.column("node"), pa.int64())})

    return _apply(res, finish)


def _sql_kcore(k: int, rounds: int) -> str:
    """Unrolled peel: und{i} -> deg -> bad -> und{i+1}; converged well
    before ``rounds`` on the deterministic link graph (see q_kcore_docs)."""
    parts = [
        _sql_link_edges(3),
        """und0 AS MATERIALIZED (
  SELECT src AS u, dst AS v FROM edges WHERE src <> dst
  UNION
  SELECT dst, src FROM edges WHERE src <> dst
)""",
    ]
    # MATERIALIZED is load-bearing: each round references the previous
    # one three times; inlined CTEs would re-expand 3^rounds scans.
    for i in range(rounds):
        parts.append(
            f"""bad{i} AS MATERIALIZED (
  SELECT u FROM und{i} GROUP BY u HAVING COUNT(*) < {k}
),
und{i + 1} AS MATERIALIZED (
  SELECT u, v FROM und{i}
  WHERE u NOT IN (SELECT u FROM bad{i})
    AND v NOT IN (SELECT u FROM bad{i})
)"""
        )
    body = ",\n".join(parts)
    return f"WITH\n{body}\nSELECT u AS node FROM und{rounds} GROUP BY u"


SQL_KCORE_DOCS = _sql_kcore(4, 12)

QUERIES["kcore_docs"] = (q_kcore_docs, SQL_KCORE_DOCS)


def q_top_bigram(sf_dir: str) -> Any:
    """Per-document most-frequent word bigram and the exact characters
    it covers — the 'fraction of chars in the most common n-gram'
    Gopher filter, emitted as bit-exact integers (cnt, chars) per the
    repetition-module convention. Pure per-doc map_batches: RE2-exact
    tokenize, one Arrow slice/join for the gram column, one polars
    group-count; (count desc, gram asc) is a total order so the
    winner is engine-independent. No exchange at any corpus size."""
    from patito_ray.functions.repetition import top_ngram_per_doc

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    return top_ngram_per_doc(ds, n=2)


SQL_TOP_BIGRAM = """
WITH t AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS toks FROM documents
), g AS (
  SELECT doc_id, array_to_string(toks[s : s + 1], ' ') AS gram
  FROM t, LATERAL unnest(generate_series(1, len(toks) - 1)) AS u(s)
  WHERE len(toks) >= 2
), gc AS (
  SELECT doc_id, gram, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM g GROUP BY doc_id, gram
), r AS (
  SELECT doc_id, gram, cnt,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY cnt DESC, gram ASC) AS rn
  FROM gc
)
SELECT doc_id, gram, cnt, CAST(cnt * len(gram) AS BIGINT) AS chars
FROM r WHERE rn = 1
"""

QUERIES["top_bigram"] = (q_top_bigram, SQL_TOP_BIGRAM)


def q_scd2_history(sf_dir: str) -> Any:
    """SCD type-2 history build: collapse the event change-log into
    versioned rows (one row per user per event_type RUN) with
    effective_from / effective_to ranges (null = current). ONE hash
    exchange on user_id; change-detect, filter and lead run inside the
    same per-partition polars pass (stages/window.py:scd2_compact).
    (ts, event_id) is the per-key total order, so both engines pick
    identical survivors."""
    from patito_ray.stages.window import scd2_compact

    ds = _rp(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    res = scd2_compact(
        ds, by="user_id", order=["ts", "event_id"], attrs=["event_type"]
    )

    cols = ["user_id", "event_type", "effective_from", "effective_to"]

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.column_names:
            return pa.schema(
                [
                    ("user_id", pa.int64()),
                    ("event_type", pa.string()),
                    ("effective_from", pa.timestamp("us")),
                    ("effective_to", pa.timestamp("us")),
                ]
            ).empty_table()
        return t.select(cols)

    return res.map_batches(finish, batch_format="pyarrow", batch_size=None)


SQL_SCD2_HISTORY = """
WITH o AS (
  SELECT user_id, ts, event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS rn
  FROM events
), ch AS (
  SELECT user_id, ts, event_type, rn FROM o
  WHERE rn = 1 OR prev IS DISTINCT FROM event_type
)
SELECT user_id, event_type, ts AS effective_from,
       LEAD(ts) OVER (PARTITION BY user_id ORDER BY rn) AS effective_to
FROM ch
"""

QUERIES["scd2_history"] = (q_scd2_history, SQL_SCD2_HISTORY)


def q_peak_concurrency(sf_dir: str) -> Any:
    """Interval sweep-line: peak number of concurrently-active events
    (interval = [ts, ts + floor(value) seconds]) and the first instant
    it is reached. Start/end points become +1/-1 deltas on an encoded
    key (t*2 | end-bit, so starts at an instant count before ends);
    the running count rides the three-narrow-pass distributed
    ordered_prefix_sum — 24 B/point, NO global payload sort; the
    per-block (max, argmin-key) candidates reduce to one driver row.
    Identical-key peer groups carry equal deltas, so the max and its
    earliest key are permutation-invariant — both engines agree
    exactly with SQL's RANGE-framed running SUM."""
    from patito_ray.stages.agg import collect_table
    from patito_ray.stages.prefix import ordered_prefix_sum

    ds = _rp(sf_dir, "events", ["event_id", "ts", "value"])

    def pts(t: pa.Table) -> pa.Table:
        ts = pc.cast(t.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        val = t.column("value").to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        dur = np.floor(val).astype(np.int64) * 1_000_000
        n = len(ts)
        return pa.table(
            {
                "k": pa.array(
                    np.concatenate([ts * 2, (ts + dur) * 2 + 1]), type=pa.int64()
                ),
                "d": pa.array(
                    np.concatenate(
                        [np.ones(n, np.int64), -np.ones(n, np.int64)]
                    ),
                    type=pa.int64(),
                ),
                "tie": pa.array(
                    np.concatenate([eid * 2, eid * 2 + 1]), type=pa.int64()
                ),
            }
        )

    pref = ordered_prefix_sum(
        ds.map_batches(pts, batch_format="pyarrow", batch_size=None),
        "k",
        "d",
        out_col="off",
        tie_col="tie",
    )

    cand_schema = pa.schema([("peak", pa.int64()), ("at_k", pa.int64())])

    def cand(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "off" not in t.column_names:
            return cand_schema.empty_table()
        k = t.column("k").to_numpy(zero_copy_only=False)
        d = t.column("d").to_numpy(zero_copy_only=False)
        inc = t.column("off").to_numpy(zero_copy_only=False) + d
        m = d == 1
        if not m.any():
            return cand_schema.empty_table()
        peak = int(inc[m].max())
        at = int(k[m & (inc == peak)].min())
        return pa.table({"peak": [peak], "at_k": [at]}, schema=cand_schema)

    cands = collect_table(
        pref.map_batches(cand, batch_format="pyarrow", batch_size=None),
        cand_schema,
    )
    peaks = cands.column("peak").to_numpy(zero_copy_only=False)
    if len(peaks) == 0:
        return pa.table({"peak": pa.array([], pa.int64()), "at_us": pa.array([], pa.int64())})
    best = int(peaks.max())
    ks = cands.column("at_k").to_numpy(zero_copy_only=False)
    at_us = int(ks[peaks == best].min()) // 2
    return pa.table(
        {"peak": pa.array([best], pa.int64()), "at_us": pa.array([at_us], pa.int64())}
    )


SQL_PEAK_CONCURRENCY = """
WITH pts AS (
  SELECT epoch_us(ts) * 2 AS k, 1 AS d FROM events
  UNION ALL
  SELECT (epoch_us(ts) + CAST(FLOOR(value) AS BIGINT) * 1000000) * 2 + 1,
         -1
  FROM events
), c AS (
  SELECT k, SUM(d) OVER (ORDER BY k) AS conc FROM pts
), m AS (SELECT MAX(conc) AS peak FROM c)
SELECT CAST(m.peak AS BIGINT) AS peak,
       CAST((SELECT MIN(k) FROM c WHERE c.conc = m.peak) // 2 AS BIGINT)
         AS at_us
FROM m
"""

QUERIES["peak_concurrency"] = (q_peak_concurrency, SQL_PEAK_CONCURRENCY)


def q_welch_ttest(sf_dir: str) -> Any:
    """Welch two-sample t-test: does 'purchase' event value differ from
    'view'? Values snap to their EXACT cents grid first (value*100 is
    within ~1e-10 of an integer on both engines, so rint/ROUND agree
    bit-for-bit), making every partial (n, sum, sumsq) an exact int64
    regardless of summation order; the t statistic and the
    Welch-Satterthwaite df are then ONE identically-ordered IEEE
    expression on both engines (final 1e-6 round only). Exchange is
    two 3-int rows."""
    import polars as pl

    ds = _rp(sf_dir, "events", ["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        et = t.column("event_type")
        keep = pc.is_in(et, value_set=pa.array(["purchase", "view"]))
        t = t.filter(keep)
        if t.num_rows == 0:
            return pa.schema(
                [
                    ("k", pa.string()),
                    ("n", pa.int64()),
                    ("s", pa.int64()),
                    ("q", pa.int64()),
                ]
            ).empty_table()
        v = t.column("value").to_numpy(zero_copy_only=False)
        cents = np.rint(v * 100.0).astype(np.int64)
        return (
            pl.DataFrame(
                {
                    "k": pl.from_arrow(t.column("event_type").combine_chunks()),
                    "c": cents,
                }
            )
            .group_by("k")
            .agg(
                pl.len().cast(pl.Int64).alias("n"),
                pl.col("c").sum().alias("s"),
                (pl.col("c") * pl.col("c")).sum().alias("q"),
            )
            .to_arrow()
        )

    from patito_ray.stages.agg import merge_partial_sums

    merged = merge_partial_sums(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["k"],
        ["n", "s", "q"],
    )

    _out_schema = pa.schema(
        [
            ("n_purchase", pa.int64()),
            ("n_view", pa.int64()),
            ("t_stat", pa.float64()),
            ("df", pa.float64()),
        ]
    )

    def finish(t: pa.Table) -> pa.Table:
        d = {
            k: (int(n), float(s), float(q))
            for k, n, s, q in zip(
                t.column("k").to_pylist(),
                t.column("n").to_pylist(),
                t.column("s").to_pylist(),
                t.column("q").to_pylist(),
            )
        }
        if "purchase" not in d or "view" not in d:
            # SQL's p CROSS JOIN v yields zero rows when a group is absent
            return _out_schema.empty_table()

        def _div(a: float, b: float) -> "float | None":
            # DuckDB DOUBLE/0 yields NULL (verified), Python raises
            return a / b if b != 0.0 else None

        n1, s1, q1 = d["purchase"]
        n2, s2, q2 = d["view"]
        fn1, fn2 = float(n1), float(n2)
        m1, m2 = s1 / fn1, s2 / fn2
        v1 = _div(q1 - s1 * s1 / fn1, fn1 - 1.0)
        v2 = _div(q2 - s2 * s2 / fn2, fn2 - 1.0)
        u1 = None if v1 is None else v1 / fn1
        u2 = None if v2 is None else v2 / fn2
        if u1 is None or u2 is None:
            tstat = df = None
        else:
            tstat = _div(m1 - m2, float(np.sqrt(u1 + u2)))
            df = _div(
                (u1 + u2) * (u1 + u2),
                u1 * u1 / (fn1 - 1.0) + u2 * u2 / (fn2 - 1.0),
            )
        return pa.table(
            {
                "n_purchase": pa.array([n1], pa.int64()),
                "n_view": pa.array([n2], pa.int64()),
                "t_stat": _r(pa.array([tstat], pa.float64()), 6),
                "df": _r(pa.array([df], pa.float64()), 6),
            }
        )

    # merged is <= 2 rows (one per event type) but the distributed-merge
    # branch splits keys across blocks — collect before finishing, else
    # a per-block finish would see one key and drop the row
    if not isinstance(merged, pa.Table):
        from patito_ray.stages.agg import collect_table

        merged = collect_table(
            merged,
            empty_schema=pa.schema(
                [
                    ("k", pa.string()),
                    ("n", pa.int64()),
                    ("s", pa.int64()),
                    ("q", pa.int64()),
                ]
            ),
        )
    return finish(merged)


SQL_WELCH_TTEST = """
WITH g AS (
  SELECT event_type AS k,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS s,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)
                  * CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS q
  FROM events WHERE event_type IN ('purchase', 'view') GROUP BY 1
), p AS (SELECT n, CAST(s AS DOUBLE) AS s, CAST(q AS DOUBLE) AS q
         FROM g WHERE k = 'purchase'),
     v AS (SELECT n, CAST(s AS DOUBLE) AS s, CAST(q AS DOUBLE) AS q
         FROM g WHERE k = 'view'),
     e AS (
  SELECT p.n AS n1, v.n AS n2,
         (p.q - p.s * p.s / CAST(p.n AS DOUBLE)) / (CAST(p.n AS DOUBLE) - 1)
           / CAST(p.n AS DOUBLE) AS u1,
         (v.q - v.s * v.s / CAST(v.n AS DOUBLE)) / (CAST(v.n AS DOUBLE) - 1)
           / CAST(v.n AS DOUBLE) AS u2,
         p.s / CAST(p.n AS DOUBLE) - v.s / CAST(v.n AS DOUBLE) AS md
  FROM p, v
)
SELECT n1 AS n_purchase, n2 AS n_view,
       ROUND(md / sqrt(u1 + u2), 6) AS t_stat,
       ROUND((u1 + u2) * (u1 + u2)
             / (u1 * u1 / (CAST(n1 AS DOUBLE) - 1)
                + u2 * u2 / (CAST(n2 AS DOUBLE) - 1)), 6) AS df
FROM e
"""

QUERIES["welch_ttest"] = (q_welch_ttest, SQL_WELCH_TTEST)
