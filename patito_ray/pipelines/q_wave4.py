"""Query registry chunk (split from pipelines/queries.py): 35 registrations.

Registers: psi_drift, weighted_stats, customers_no_orders, group_centroids, rrf_fusion, key_skew, chunk_windows, graph_bfs, basket_pairs, embed_covariance, interval_coverage, name_link_jw, region_nation_revenue, rolling_median, rolling_active_users, debounce_events, metadata_stats, weighted_median, range_sorted_write, attribution_last_touch, ab_proportions, event_trigrams, resample_ffill, compression_ratio, purchase_gaps, user_streaks, time_weighted_value, user_event_entropy, mutual_nn, revenue_share, source_simpson, segment_gini, cuped_adjust, winsorized_mean, user_burstiness
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
from patito_ray.pipelines.q_wave2 import (  # noqa: F401
    _TFIDF_TERMS,
)
from patito_ray.pipelines.q_wave3 import (  # noqa: F401
    _doc_link_edges,
    _sql_link_edges,
)


def q_psi_drift(sf_dir: str) -> Any:
    """Population Stability Index between the 'purchase' and 'view'
    value distributions over the FLOOR(value/10) bin grid (the model-
    monitoring companion to ks_drift): exact integer (bin, n_p, n_v)
    partials through the adaptive merge — exchange bounded by the bin
    count — then PSI = sum over both-populated bins of
    (p-q)*ln(p/q), the identical IEEE expression on both engines
    (final 1e-6 round, corr_per_group convention)."""
    import polars as pl

    ds = _rp(sf_dir, "events", ["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        keep = pc.is_in(
            t.column("event_type"), value_set=pa.array(["purchase", "view"])
        )
        t = t.filter(keep)
        if t.num_rows == 0:
            return pa.schema(
                [("bin", pa.int64()), ("n_p", pa.int64()), ("n_v", pa.int64())]
            ).empty_table()
        v = t.column("value").to_numpy(zero_copy_only=False)
        b = np.floor(v / 10.0).astype(np.int64)
        is_p = pc.equal(t.column("event_type"), "purchase").to_numpy(
            zero_copy_only=False
        )
        return (
            pl.DataFrame(
                {
                    "bin": b,
                    "n_p": is_p.astype(np.int64),
                    "n_v": (~is_p).astype(np.int64),
                }
            )
            .group_by("bin")
            .agg(pl.col("n_p").sum(), pl.col("n_v").sum())
            .to_arrow()
        )

    from patito_ray.stages.agg import merge_partial_sums

    merged = merge_partial_sums(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["bin"],
        ["n_p", "n_v"],
    )

    def finish(t: pa.Table) -> pa.Table:
        np_ = t.column("n_p").to_numpy(zero_copy_only=False).astype(np.float64)
        nv = t.column("n_v").to_numpy(zero_copy_only=False).astype(np.float64)
        tp, tv = np_.sum(), nv.sum()
        m = (np_ > 0) & (nv > 0)
        p = np_[m] / tp
        q = nv[m] / tv
        psi = float(((p - q) * np.log(p / q)).sum())
        return pa.table(
            {
                "n_bins": pa.array([int(m.sum())], pa.int64()),
                "psi": _r(pa.array([psi], pa.float64()), 6),
            }
        )

    return _apply(merged, finish)


SQL_PSI_DRIFT = """
WITH b AS (
  SELECT CAST(FLOOR(value / 10) AS BIGINT) AS bin,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n_p,
         SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS n_v
  FROM events WHERE event_type IN ('purchase', 'view') GROUP BY 1
), t AS (
  SELECT CAST(SUM(n_p) AS DOUBLE) AS tp, CAST(SUM(n_v) AS DOUBLE) AS tv
  FROM b
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_bins,
       ROUND(SUM((n_p / t.tp - n_v / t.tv)
                 * ln((n_p / t.tp) / (n_v / t.tv))), 6) AS psi
FROM b, t WHERE n_p > 0 AND n_v > 0
GROUP BY ALL
"""

QUERIES["psi_drift"] = (q_psi_drift, SQL_PSI_DRIFT)


def q_weighted_stats(sf_dir: str) -> Any:
    """Weighted grouped aggregates (quantity-weighted mean price per
    return flag) on the EXACT integer cents grid: per-batch polars
    partials sum int64 (qty, qty*cents), the adaptive partial-sum
    merge combines them, and the only floating-point ops are the two
    final IEEE divisions — written identically in the SQL, so the
    derived double is bit-exact, not rounded."""
    import polars as pl

    ds = _rp(sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        price = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        cents = np.floor(price * 100.0 + 0.5).astype(np.int64)
        qty = t.column("l_quantity").to_numpy(zero_copy_only=False).astype(np.int64)
        df = pl.from_arrow(
            pa.table(
                {
                    "l_returnflag": t.column("l_returnflag"),
                    "qty": pa.array(qty),
                    "wx": pa.array(qty * cents),
                }
            )
        )
        return (
            df.group_by("l_returnflag")
            .agg(w=pl.col("qty").sum(), wsum_cents=pl.col("wx").sum())
            .to_arrow()
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    final = merge_partial_sums(partials, ["l_returnflag"], ["w", "wsum_cents"])

    def finish(b: pa.Table) -> pa.Table:
        w = pc.cast(b["w"], pa.float64())
        wx = pc.cast(b["wsum_cents"], pa.float64())
        return pa.table(
            {
                "l_returnflag": b["l_returnflag"],
                "w": pc.cast(b["w"], pa.int64()),
                "wsum_cents": pc.cast(b["wsum_cents"], pa.int64()),
                "wavg_price": pc.divide(pc.divide(wx, w), 100.0),
            }
        )

    return _apply(final, finish)


SQL_WEIGHTED_STATS = """
SELECT l_returnflag,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w,
       CAST(SUM(CAST(l_quantity AS BIGINT)
                * CAST(ROUND(l_extendedprice * 100) AS BIGINT))
            AS BIGINT) AS wsum_cents,
       CAST(SUM(CAST(l_quantity AS BIGINT)
                * CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
       / CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / 100.0 AS wavg_price
FROM lineitem GROUP BY l_returnflag
"""

QUERIES["weighted_stats"] = (q_weighted_stats, SQL_WEIGHTED_STATS)


def q_customers_no_orders(sf_dir: str) -> Any:
    """Anti join (TPC-H Q22 shape): customers with no URGENT order
    (every customer has SOME order in the synthetic corpus, so the
    predicate keeps the result non-trivial). The order-key side is
    pruned at the read (priority filter), collapses to its DISTINCT
    custkey set worker-side and broadcasts once (ray.put); the
    customer side streams through one map_batches filter — no
    shuffle. 100-TB note: the broadcast key set is bounded by
    |customers|, the small dimension; a fact-sized key set would use
    the co-partitioned anti branch of the membership stage instead."""
    from patito_ray.stages.join import anti_join

    cust = _rp(sf_dir, "customer", ["c_custkey", "c_acctbal"])
    okeys = _rp(sf_dir, "orders", ["o_custkey", "o_orderpriority"]).filter(
        expr="o_orderpriority == '1-URGENT'"
    )
    out = anti_join(cust, okeys, on="c_custkey", key_column="o_custkey")
    return _lazy_norm(
        out, pa.schema([("c_custkey", pa.int64()), ("c_acctbal", pa.float64())])
    )


SQL_CUSTOMERS_NO_ORDERS = """
SELECT c_custkey, c_acctbal FROM customer
WHERE c_custkey NOT IN (
  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
)
"""

QUERIES["customers_no_orders"] = (q_customers_no_orders, SQL_CUSTOMERS_NO_ORDERS)


def q_group_centroids(sf_dir: str) -> Any:
    """Per-label embedding centroid in long form (label, dim,
    centroid): each batch stacks its vectors once and scatter-adds per
    label (one np.add.at over the matrix — no per-row Python), partials
    ride the adaptive sum merge as (label, dim) rows. float32 inputs
    widen exactly to float64 before summing on both engines; the avg
    rounds at 6 decimals (summation order differs, values off the
    midpoint grid)."""
    ds = _rp(sf_dir, "embeddings", ["label", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        from patito_ray.functions.similarity import _to_matrix

        mat = _to_matrix(t.column("embedding"))  # (n, d) float64
        labels = t.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        if mat.size == 0:
            return pa.table(
                {
                    "label": pa.array([], pa.int64()),
                    "dim": pa.array([], pa.int64()),
                    "s": pa.array([], pa.float64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        ulab, inv = np.unique(labels, return_inverse=True)
        g, d = len(ulab), mat.shape[1]
        sums = np.zeros((g, d), dtype=np.float64)
        np.add.at(sums, inv, mat)
        cnt = np.bincount(inv, minlength=g).astype(np.int64)
        return pa.table(
            {
                "label": pa.array(np.repeat(ulab, d)),
                "dim": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64), g)),
                "s": pa.array(sums.ravel()),
                "n": pa.array(np.repeat(cnt, d)),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    final = merge_partial_sums(partials, ["label", "dim"], ["s", "n"])

    def finish(b: pa.Table) -> pa.Table:
        s = b.column("s").to_numpy(zero_copy_only=False)
        n = b.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "label": pc.cast(b["label"], pa.int64()),
                "dim": pc.cast(b["dim"], pa.int64()),
                "centroid": _ra(s / n, 6),
            }
        )

    return _apply(final, finish)


SQL_GROUP_CENTROIDS = """
SELECT CAST(label AS BIGINT) AS label, CAST(ord AS BIGINT) AS dim,
       ROUND(SUM(CAST(e AS DOUBLE)) / COUNT(*), 6) AS centroid
FROM (
  SELECT label, unnest(embedding) AS e,
         generate_subscripts(embedding, 1) AS ord
  FROM embeddings
)
GROUP BY label, ord
"""

QUERIES["group_centroids"] = (q_group_centroids, SQL_GROUP_CENTROIDS)


def q_rrf_fusion(sf_dir: str) -> pa.Table:
    """Reciprocal-rank fusion of the two retrieval systems (tfidf +
    BM25, same 5-term query): each system's DISTRIBUTED scoring pass
    feeds a global top-50 (per-block prune, bounded driver merge),
    ranks fuse as 1/(60+r) with the SQL's exact COALESCE order — two
    reciprocals and one add, bit-identical IEEE ops on both engines,
    so the fused score needs NO rounding. Ranking ties break on the
    1e-6-rounded scores both engines share (tfidf_search/bm25_search
    contract)."""
    from patito_ray.functions.tfidf import _global_topk, bm25_scores, tfidf_scores

    ds = _rp(sf_dir, "documents", ["doc_id", "text"]).materialize()

    def rnd(t: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": t.column("doc_id"), "score": _r(t.column("score"), 6)}
        )

    def ranks(scorer: Any) -> dict[int, int]:
        scored = scorer(ds, _TFIDF_TERMS).map_batches(
            rnd, batch_format="pyarrow", batch_size=None
        )
        top = _global_topk(scored, 50, "score", "doc_id")
        doc = top.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        sc = top.column("score").to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, -sc))  # score desc, doc_id asc
        return {int(doc[i]): r + 1 for r, i in enumerate(order)}

    rt = ranks(tfidf_scores)
    rb = ranks(bm25_scores)
    docs = sorted(set(rt) | set(rb))
    rrf = np.array(
        [
            (1.0 / (60 + rt[d]) if d in rt else 0.0)
            + (1.0 / (60 + rb[d]) if d in rb else 0.0)
            for d in docs
        ],
        dtype=np.float64,
    )
    da = np.array(docs, dtype=np.int64)
    order = np.lexsort((da, -rrf))[:10]
    return pa.table(
        {
            "doc_id": pa.array(da[order]),
            "r_tfidf": pa.array(
                [rt.get(int(d)) for d in da[order]], type=pa.int64()
            ),
            "r_bm25": pa.array(
                [rb.get(int(d)) for d in da[order]], type=pa.int64()
            ),
            "rrf": pa.array(rrf[order]),
        }
    )


SQL_RRF_FUSION = r"""
WITH u AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS tok
  FROM documents WHERE text IS NOT NULL
),
q AS (SELECT unnest(['spark','window','hash','join','vector']) AS term),
tf AS (
  SELECT u.doc_id, u.tok AS term, CAST(COUNT(*) AS DOUBLE) AS c
  FROM u JOIN q ON u.tok = q.term GROUP BY u.doc_id, u.tok
),
tdf AS (
  SELECT term, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS d
  FROM (SELECT DISTINCT u.doc_id, u.tok AS term
        FROM u JOIN q ON u.tok = q.term) GROUP BY term
),
tn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
tfs AS (
  SELECT tf.doc_id,
         ROUND(SUM(tf.c * (ln((tn.n + 1) / (tdf.d + 1)) + 1)), 6) AS score
  FROM tf JOIN tdf USING (term), tn
  GROUP BY tf.doc_id
),
tr AS (
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS r
  FROM tfs QUALIFY r <= 50
),
stats AS (
  SELECT (SELECT CAST(COUNT(*) AS DOUBLE) FROM documents WHERE text IS NOT NULL) AS n,
         (SELECT CAST(COUNT(*) AS DOUBLE) FROM u) AS total
),
bdf AS (
  SELECT q.term,
         (SELECT CAST(COUNT(DISTINCT u.doc_id) AS DOUBLE) FROM u WHERE u.tok = q.term) AS df
  FROM q
),
dl AS (SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS dl FROM u GROUP BY doc_id),
btf AS (
  SELECT u.doc_id, u.tok AS term, CAST(COUNT(*) AS DOUBLE) AS tf
  FROM u JOIN q ON u.tok = q.term GROUP BY u.doc_id, u.tok
),
bms AS (
  SELECT btf.doc_id,
         ROUND(SUM(
           LN((stats.n - bdf.df + 0.5) / (bdf.df + 0.5) + 1.0)
           * btf.tf * (1.2 + 1.0)
           / (btf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / (stats.total / stats.n)))
         ), 6) AS score
  FROM btf
  CROSS JOIN stats
  JOIN bdf ON btf.term = bdf.term
  JOIN dl ON btf.doc_id = dl.doc_id
  GROUP BY btf.doc_id
),
br AS (
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS r
  FROM bms QUALIFY r <= 50
)
SELECT COALESCE(tr.doc_id, br.doc_id) AS doc_id,
       tr.r AS r_tfidf, br.r AS r_bm25,
       COALESCE(1.0 / (60 + tr.r), 0) + COALESCE(1.0 / (60 + br.r), 0) AS rrf
FROM tr FULL JOIN br ON tr.doc_id = br.doc_id
ORDER BY rrf DESC, doc_id
LIMIT 10
"""

QUERIES["rrf_fusion"] = (q_rrf_fusion, SQL_RRF_FUSION)


def q_key_skew(sf_dir: str) -> pa.Table:
    """Key-distribution skew audit over events.user_id: Gini
    coefficient + hot-key share of the per-user event counts — the
    numbers a shuffle planner reads before choosing salting vs
    broadcast (stages.join.skew_join). Rank arithmetic is int64 on
    both engines (tie-order invariant: equal counts occupy a fixed
    rank-weight range), so only the two final IEEE divisions are
    floating point — written identically in the SQL, bit-exact."""
    from patito_ray.validation.stats import gini_key_skew

    return gini_key_skew(_rp(sf_dir, "events", ["user_id"]), "user_id")


SQL_KEY_SKEW = """
WITH c AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c FROM events
  WHERE user_id IS NOT NULL GROUP BY user_id
),
t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS s,
         CAST(MAX(c) AS BIGINT) AS m
  FROM c
),
r AS (SELECT c.c, ROW_NUMBER() OVER (ORDER BY c.c, c.user_id) AS i FROM c)
SELECT t.n AS n_keys, t.s AS total, t.m AS max_cnt,
       CAST(SUM((2 * r.i - t.n - 1) * r.c) AS DOUBLE)
         / (CAST(t.n AS DOUBLE) * CAST(t.s AS DOUBLE)) AS gini,
       CAST(t.m AS DOUBLE) / CAST(t.s AS DOUBLE) AS max_share
FROM r, t GROUP BY t.n, t.s, t.m
"""

QUERIES["key_skew"] = (q_key_skew, SQL_KEY_SKEW)


def q_chunk_windows(sf_dir: str) -> Any:
    """RAG-style context chunking: explode every document into
    OVERLAPPING 32-token windows at stride 24 (8-token overlap) and
    reconstruct each chunk's text. Fully vectorized: one RE2-exact
    tokenize per batch, window starts/lengths by integer arithmetic, a
    single flat token gather + list-array binary_join rebuilds every
    chunk string — no per-doc Python. Short docs emit their single
    truncated chunk, like the SQL's clamped generate_series."""
    from patito_ray.functions.tfidf import re2_split_tokens

    W, S = 32, 24
    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    _schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("start_tok", pa.int64()),
            ("n_toks", pa.int64()),
            ("chunk", pa.string()),
        ]
    )

    def explode(t: pa.Table) -> pa.Table:
        flat, parents, n_rows = re2_split_tokens(t.column("text"))
        if n_rows == 0 or len(flat) == 0:
            return _schema.empty_table()
        doc = t.column("doc_id").to_numpy(zero_copy_only=False)
        cnt = np.bincount(parents, minlength=n_rows)
        row_start = np.concatenate(([0], np.cumsum(cnt)))
        rows_with = np.flatnonzero(cnt > 0)
        top = np.maximum(cnt[rows_with] - W + 1, 1)
        nw = (top - 1) // S + 1
        total_w = int(nw.sum())
        row_idx = rows_with.repeat(nw)
        w_base = np.concatenate(([0], np.cumsum(nw)[:-1]))
        starts = (np.arange(total_w) - w_base.repeat(nw)) * S
        length = np.minimum(W, cnt[row_idx] - starts)
        offs = np.concatenate(([0], np.cumsum(length)))
        widx = np.repeat(np.arange(total_w), length)
        pos = np.arange(int(offs[-1])) - offs[:-1].repeat(length)
        tok_idx = row_start[row_idx][widx] + starts[widx] + pos
        gathered = flat.take(pa.array(tok_idx, type=pa.int64()))
        la = pa.LargeListArray.from_arrays(
            pa.array(offs, type=pa.int64()), gathered
        )
        return pa.table(
            {
                "doc_id": pa.array(doc[row_idx], type=pa.int64()),
                "start_tok": pa.array(starts + 1, type=pa.int64()),
                "n_toks": pa.array(length, type=pa.int64()),
                "chunk": pc.cast(pc.binary_join(la, " "), pa.string()),
            },
            schema=_schema,
        )

    return ds.map_batches(explode, batch_format="pyarrow", batch_size=None)


SQL_CHUNK_WINDOWS = r"""
WITH tok AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS ts FROM documents
)
SELECT doc_id, CAST(i AS BIGINT) AS start_tok,
       CAST(LEAST(32, len(ts) - i + 1) AS BIGINT) AS n_toks,
       array_to_string(ts[CAST(i AS BIGINT):CAST(i + 31 AS BIGINT)], ' ')
         AS chunk
FROM tok, unnest(generate_series(1, GREATEST(len(ts) - 31, 1), 24)) AS t(i)
WHERE len(ts) > 0
"""

QUERIES["chunk_windows"] = (q_chunk_windows, SQL_CHUNK_WINDOWS)


def q_graph_bfs(sf_dir: str) -> Any:
    """Multi-source BFS reachability: minimum hop distance (<= 4) from
    the seed set (doc_id % 97 == 0) over the deterministic 3-out link
    graph. Adaptive rounds: frontier broadcast + driver numpy set ops
    while the visited set is small, co-partitioned semi/anti exchanges
    beyond (functions/graph.py:bfs_hops); the SQL oracle is a recursive
    CTE over the same splitmix64 edge derivation."""
    from patito_ray.functions.graph import bfs_hops

    edges, _n = _doc_link_edges(sf_dir, 3)
    docs = _rp(sf_dir, "documents", ["doc_id"])

    def mk_seeds(t: pa.Table) -> pa.Table:
        ids = pc.cast(t.column("doc_id"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {"node": pa.array(ids[ids % 97 == 0], type=pa.int64())}
        )

    seeds = docs.map_batches(mk_seeds, batch_format="pyarrow", batch_size=None)
    return bfs_hops(edges, seeds, max_hops=4)


SQL_GRAPH_BFS = f"""
WITH RECURSIVE
{_sql_link_edges(3)},
bfs(node, dist) AS (
  SELECT doc_id, 0 FROM documents WHERE doc_id % 97 = 0
  UNION
  SELECT e.dst, b.dist + 1
  FROM bfs b JOIN edges e ON e.src = b.node
  WHERE b.dist < 4
)
SELECT node, CAST(MIN(dist) AS BIGINT) AS dist FROM bfs GROUP BY node
"""

QUERIES["graph_bfs"] = (q_graph_bfs, SQL_GRAPH_BFS)


def q_basket_pairs(sf_dir: str) -> Any:
    """Market-basket co-occurrence: part pairs bought together in >= 2
    orders. One hash exchange co-locates each order's parts, partitions
    generate within-run pairs with the vectorized offset scan and
    pre-count locally, partials merge adaptively
    (functions/basket.py:cooccurrence_pairs)."""
    from patito_ray.functions.basket import cooccurrence_pairs

    li = _rp(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    res = cooccurrence_pairs(li, "l_orderkey", "l_partkey", min_count=2)

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "part_a": t.column("item_a"),
                "part_b": t.column("item_b"),
                "n_orders": t.column("n_groups"),
            }
        )

    return _apply(res, finish)


SQL_BASKET_PAIRS = """
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
       COUNT(*) AS n_orders
FROM items a
JOIN items b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
HAVING COUNT(*) >= 2
"""

QUERIES["basket_pairs"] = (q_basket_pairs, SQL_BASKET_PAIRS)


def q_embed_covariance(sf_dir: str) -> Any:
    """Embedding covariance matrix (upper triangle) from ONE streaming
    moment pass: per-batch (n, Σx, upper-Gram) partials — one (d x d)
    int64 matmul per batch — merged adaptively; output is the EXACT
    integer covariance numerator n·Σxy − Σx·Σy on the 1e-3 quantized
    grid, so both engines compute identical integers (no float
    summation-order hazard; functions/pca.py:moment_partials)."""
    from patito_ray.functions.pca import moment_partials

    emb = _rp(sf_dir, "embeddings", ["embedding"])
    tab = moment_partials(emb, "embedding", 64, quantize=1000.0)
    i = tab.column("i").to_numpy(zero_copy_only=False)
    j = tab.column("j").to_numpy(zero_copy_only=False)
    s = tab.column("s").to_numpy(zero_copy_only=False)
    n = int(s[(i == -1) & (j == -1)][0])
    sx = np.zeros(64, dtype=np.int64)
    m1 = (i >= 0) & (j == -1)
    sx[i[m1]] = s[m1]
    m2 = (i >= 0) & (j >= 0)
    ii, jj, sxy = i[m2], j[m2], s[m2]
    cov_num = n * sxy - sx[ii] * sx[jj]
    return pa.table(
        {
            "i": pa.array(ii, type=pa.int64()),
            "j": pa.array(jj, type=pa.int64()),
            "cov_num": pa.array(cov_num, type=pa.int64()),
        }
    )


SQL_EMBED_COVARIANCE = """
WITH e AS (
  SELECT vec_id, t.i AS i,
         CAST(FLOOR(CAST(embedding[CAST(t.i + 1 AS INT)] AS DOUBLE)
                    * 1000 + 0.5) AS BIGINT) AS q
  FROM embeddings, range(64) t(i)
),
nn AS (SELECT COUNT(*) AS n FROM embeddings),
sx AS (SELECT i, SUM(q) AS s FROM e GROUP BY i),
xy AS (
  SELECT a.i AS i, b.i AS j, SUM(a.q * b.q) AS sxy
  FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.i <= b.i
  GROUP BY 1, 2
)
SELECT xy.i, xy.j,
       CAST((SELECT n FROM nn) * sxy - sa.s * sb.s AS BIGINT) AS cov_num
FROM xy
JOIN sx sa ON sa.i = xy.i
JOIN sx sb ON sb.i = xy.j
"""

QUERIES["embed_covariance"] = (q_embed_covariance, SQL_EMBED_COVARIANCE)


def q_interval_coverage(sf_dir: str) -> Any:
    """Per-user interval-union coverage: total microseconds covered by
    [ts, ts + floor(value) sec] event intervals, overlaps counted once.
    ONE hash exchange on user_id, one vectorized per-partition sweep
    (stages/window.py:interval_coverage) — exact int64 arithmetic, so
    both engines agree bit-for-bit."""
    from patito_ray.stages.window import interval_coverage

    ds = _rp(sf_dir, "events", ["user_id", "ts", "value"])

    def iv(t: pa.Table) -> pa.Table:
        s = pc.cast(t.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        dur = np.floor(
            t.column("value").to_numpy(zero_copy_only=False)
        ).astype(np.int64) * 1_000_000
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "s": pa.array(s, type=pa.int64()),
                "e": pa.array(s + dur, type=pa.int64()),
            }
        )

    res = ds.map_batches(iv, batch_format="pyarrow", batch_size=None)
    out = interval_coverage(res, "user_id", "s", "e", out_col="covered_us")

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.column_names:
            return pa.schema(
                [("user_id", pa.int64()), ("covered_us", pa.int64())]
            ).empty_table()
        return pa.table(
            {
                "user_id": pc.cast(t.column("user_id"), pa.int64()),
                "covered_us": pc.cast(t.column("covered_us"), pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow", batch_size=None)


SQL_INTERVAL_COVERAGE = """
WITH iv AS (
  SELECT user_id, epoch_us(ts) AS s,
         epoch_us(ts) + CAST(FLOOR(value) AS BIGINT) * 1000000 AS e
  FROM events
),
w AS (
  SELECT user_id, s, e,
         MAX(e) OVER (
           PARTITION BY user_id ORDER BY s, e
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS pcm
  FROM iv
)
SELECT user_id,
       CAST(SUM(GREATEST(e - GREATEST(s, COALESCE(pcm, s)), 0)) AS BIGINT) AS covered_us
FROM w GROUP BY user_id
"""

QUERIES["interval_coverage"] = (q_interval_coverage, SQL_INTERVAL_COVERAGE)


def q_name_link_jw(sf_dir: str) -> Any:
    """Blocked record linkage: customer x supplier names scored with
    byte-exact Jaro-Winkler inside per-nation blocks, kept at
    jw >= 0.76. One co-partition exchange on the block key; the pair
    kernel loops over string positions, never pairs
    (functions/jaro.py). Scores are bit-identical to DuckDB's
    jaro_winkler_similarity, so the filter and output need NO
    rounding."""
    from patito_ray.functions.jaro import blocked_name_link

    cust = _rp(sf_dir, "customer", ["c_custkey", "c_name", "c_nationkey"])
    supp = _rp(sf_dir, "supplier", ["s_suppkey", "s_name", "s_nationkey"])
    return blocked_name_link(
        cust,
        supp,
        left_key="c_custkey",
        right_key="s_suppkey",
        left_block="c_nationkey",
        right_block="s_nationkey",
        left_name="c_name",
        right_name="s_name",
        threshold=0.76,
    )


SQL_NAME_LINK_JW = """
SELECT c_custkey, s_suppkey,
       jaro_winkler_similarity(c_name, s_name) AS jw
FROM customer JOIN supplier ON c_nationkey = s_nationkey
WHERE jaro_winkler_similarity(c_name, s_name) >= 0.76
"""

QUERIES["name_link_jw"] = (q_name_link_jw, SQL_NAME_LINK_JW)


def q_region_nation_revenue(sf_dir: str) -> Any:
    """TPC-H Q5 shape, the full join-strategy mix in one pipeline: the
    two LARGE sides (lineitem, date-filtered orders) meet in a
    partitioned hash join; the three dimension maps (customer nation,
    supplier nation, in-region nation set) broadcast ONCE via ray.put
    and attach inside a single map_batches that also applies the Q5
    co-location condition (customer and supplier in the SAME nation)
    and pre-aggregates revenue per nation on the exact integer 1e-4
    grid (cents x basis points — no float summation-order risk).
    Partials merge adaptively; only #nations rows leave the stream."""
    import ray

    import polars as pl

    from patito_ray.sources.readers import clean_read_parquet

    lo = datetime.datetime(1996, 1, 1)
    hi = datetime.datetime(1998, 1, 1)

    region = pa.concat_tables(
        _rp(sf_dir, "region", None).iter_batches(batch_format="pyarrow")
    )
    nation = pa.concat_tables(
        _rp(sf_dir, "nation", None).iter_batches(batch_format="pyarrow")
    )
    asia_keys = region.filter(pc.equal(region.column("r_name"), "ASIA")).column(
        "r_regionkey"
    )
    nat_asia = nation.filter(
        pc.is_in(nation.column("n_regionkey"), value_set=asia_keys)
    )
    cust = pa.concat_tables(
        _rp(sf_dir, "customer", ["c_custkey", "c_nationkey"]).iter_batches(
            batch_format="pyarrow"
        )
    )
    supp = pa.concat_tables(
        _rp(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).iter_batches(
            batch_format="pyarrow"
        )
    )
    ref = ray.put(
        (
            cust,
            supp,
            nat_asia.column("n_nationkey").combine_chunks(),
        )
    )

    from patito_ray.stages.join import hash_join

    orders = clean_read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(
            (pc.field("o_orderdate") >= lo) & (pc.field("o_orderdate") < hi)
        ),
    )
    items = _rp(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    # adaptive join selection: the date filter usually shrinks orders
    # far below broadcast size — then the fact side streams through one
    # map_batches with an object-store map instead of paying the
    # partitioned-exchange fixed cost; the hash-join path stays for a
    # genuinely large filtered side
    orders_m = orders.materialize()
    if orders_m.size_bytes() <= 64 * 1024 * 1024:
        otabs = [t for t in ray.get(orders_m.to_arrow_refs()) if t.num_rows]
        omap = (
            pa.concat_tables(otabs)
            if otabs
            else pa.schema(
                [
                    ("o_orderkey", pa.int64()),
                    ("o_custkey", pa.int64()),
                    ("o_orderdate", pa.timestamp("us")),
                ]
            ).empty_table()
        ).select(["o_orderkey", "o_custkey"])
        oref = ray.put(omap)

        def attach_orders(t: pa.Table, _oref=oref) -> pa.Table:
            return t.join(
                ray.get(_oref), keys=["l_orderkey"], right_keys=["o_orderkey"]
            )

        joined = items.map_batches(
            attach_orders, batch_format="pyarrow", batch_size=None
        )
    else:
        joined = hash_join(
            items, orders_m, on="l_orderkey", right_on="o_orderkey"
        )

    _p_schema = pa.schema(
        [("nk", pa.int64()), ("rev4", pa.int64()), ("n_items", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "l_suppkey" not in t.column_names:
            return _p_schema.empty_table()
        cust_m, supp_m, asia_nk = ray.get(ref)
        t = t.join(cust_m, keys=["o_custkey"], right_keys=["c_custkey"])
        t = t.join(supp_m, keys=["l_suppkey"], right_keys=["s_suppkey"])
        keep = pc.and_(
            pc.equal(t.column("c_nationkey"), t.column("s_nationkey")),
            pc.is_in(t.column("c_nationkey"), value_set=asia_nk),
        )
        t = t.filter(keep)
        if t.num_rows == 0:
            return _p_schema.empty_table()
        price = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = t.column("l_discount").to_numpy(zero_copy_only=False)
        rev4 = np.floor(price * 100.0 + 0.5).astype(np.int64) * (
            100 - np.floor(disc * 100.0 + 0.5).astype(np.int64)
        )
        return (
            pl.DataFrame(
                {
                    "nk": t.column("c_nationkey")
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64),
                    "rev4": rev4,
                }
            )
            .group_by("nk")
            .agg(
                pl.col("rev4").sum(),
                pl.len().cast(pl.Int64).alias("n_items"),
            )
            .select(["nk", "rev4", "n_items"])
            .to_arrow()
            .cast(_p_schema)
        )

    partials = joined.map_batches(partial, batch_format="pyarrow", batch_size=None)
    merged = merge_partial_sums(partials, ["nk"], ["rev4", "n_items"])

    name_of = dict(
        zip(
            nation.column("n_nationkey").to_pylist(),
            nation.column("n_name").to_pylist(),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema(
                [
                    ("n_name", pa.string()),
                    ("n_items", pa.int64()),
                    ("revenue", pa.float64()),
                ]
            ).empty_table()
        nk = t.column("nk").to_pylist()
        return pa.table(
            {
                "n_name": pa.array([name_of[k] for k in nk], type=pa.string()),
                "n_items": pc.cast(t.column("n_items"), pa.int64()),
                "revenue": pc.divide(
                    pc.cast(t.column("rev4"), pa.float64()), 10000.0
                ),
            }
        )

    return _apply(merged, finish)


SQL_REGION_NATION_REVENUE = """
WITH g AS (
  SELECT n_name,
         CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
           * (100 - CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT)) AS rev4
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON c_nationkey = n_nationkey AND s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
    AND o_orderdate >= DATE '1996-01-01'
    AND o_orderdate < DATE '1998-01-01'
)
SELECT n_name, COUNT(*) AS n_items,
       CAST(SUM(rev4) AS DOUBLE) / 10000.0 AS revenue
FROM g GROUP BY n_name
"""

QUERIES["region_nation_revenue"] = (
    q_region_nation_revenue,
    SQL_REGION_NATION_REVENUE,
)


def q_rolling_median(sf_dir: str) -> Any:
    """Holistic rolling window: each customer's 7-order moving MEDIAN
    spend (SQL ROWS BETWEEN 6 PRECEDING AND CURRENT ROW). One hash
    exchange; the per-partition kernel buckets rows by effective
    window length and takes one np.median per bucket — mean-of-two-
    middles is bit-identical to QUANTILE_CONT(0.5), so no rounding
    (stages/window.py:rolling_median_over)."""
    from patito_ray.stages.window import rolling_median_over

    ds = _rp(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])
    out = rolling_median_over(
        ds,
        by="o_custkey",
        order=["o_orderdate", "o_orderkey"],
        src="o_totalprice",
        frame=7,
    )

    _schema = pa.schema([("o_orderkey", pa.int64()), ("roll_med", pa.float64())])

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "o_orderkey" not in t.column_names:
            return _schema.empty_table()
        return t.select(["o_orderkey", "roll_med"]).cast(_schema)

    return out.map_batches(finish, batch_format="pyarrow", batch_size=None)


SQL_ROLLING_MEDIAN = """
SELECT o_orderkey,
       MEDIAN(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
       ) AS roll_med
FROM orders
"""

QUERIES["rolling_median"] = (q_rolling_median, SQL_ROLLING_MEDIAN)


def q_rolling_active_users(sf_dir: str) -> Any:
    """Rolling 7-day distinct active users (the WAU family): sliding
    COUNT(DISTINCT) decomposed per user into coverage intervals —
    one hash exchange on user_id moving only distinct (user, day)
    pairs, vectorized interval merge + boundary deltas per partition,
    adaptive delta merge, and one prefix sum over the calendar-bounded
    day domain (stages/window.py:rolling_active_count). Exact integer
    counting end to end."""
    from patito_ray.stages.window import rolling_active_count

    ds = _rp(sf_dir, "events", ["user_id", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "aday": pa.array(us // 86_400_000_000, type=pa.int64()),
            }
        )

    tab = rolling_active_count(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        "user_id",
        "aday",
        window=7,
    )
    # date32 -> timestamp[us]: DuckDB DATE comes back as datetime64
    day = pc.cast(
        pc.cast(pc.cast(tab.column("day"), pa.int32()), pa.date32()),
        pa.timestamp("us"),
    )
    return pa.table({"day": day, "active": tab.column("active")})


SQL_ROLLING_ACTIVE_USERS = """
WITH d AS (SELECT DISTINCT CAST(ts AS DATE) AS aday, user_id FROM events),
span AS (SELECT MIN(aday) AS lo, MAX(aday) AS hi FROM d),
days AS (
  SELECT CAST(UNNEST(generate_series(
           (SELECT lo FROM span), (SELECT hi FROM span), INTERVAL 1 DAY
         )) AS DATE) AS day
)
SELECT days.day, COUNT(DISTINCT d.user_id) AS active
FROM days
LEFT JOIN d ON d.aday BETWEEN days.day - 6 AND days.day
GROUP BY 1
"""

QUERIES["rolling_active_users"] = (
    q_rolling_active_users,
    SQL_ROLLING_ACTIVE_USERS,
)


def q_debounce_events(sf_dir: str) -> Any:
    """Stream-hygiene debounce: drop events repeating the same
    (user_id, event_type) within 6 hours of the PREVIOUS occurrence —
    the surviving rows are each burst's fresh arrivals. Rides the
    composite-key distributed window pass (one exchange hashed on
    user_id, lag over the (user, type) composite); integer-microsecond
    gap test, bit-exact vs SQL LAG."""
    from patito_ray.stages.window import window_over

    ds = _rp(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def to_us(t: pa.Table) -> pa.Table:
        return t.append_column(
            "ts_us", pc.cast(t.column("ts"), pa.int64())
        )

    out = window_over(
        ds.map_batches(to_us, batch_format="pyarrow", batch_size=None),
        by=["user_id", "event_type"],
        order=["ts_us", "event_id"],
        cols={"prev_us": ("lag", "ts_us")},
    )

    _schema = pa.schema([("event_id", pa.int64())])

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "event_id" not in t.column_names:
            return _schema.empty_table()
        gap_ok = pc.or_kleene(
            pc.is_null(t.column("prev_us")),
            pc.greater(
                pc.subtract(t.column("ts_us"), t.column("prev_us")),
                21_600_000_000,
            ),
        )
        return pa.table(
            {"event_id": t.filter(gap_ok).column("event_id")}, schema=_schema
        )

    return out.map_batches(finish, batch_format="pyarrow", batch_size=None)


SQL_DEBOUNCE_EVENTS = """
WITH g AS (
  SELECT event_id,
         epoch_us(ts) - LAG(epoch_us(ts)) OVER (
           PARTITION BY user_id, event_type ORDER BY epoch_us(ts), event_id
         ) AS gap
  FROM events
)
SELECT event_id FROM g WHERE gap IS NULL OR gap > 21600000000
"""

QUERIES["debounce_events"] = (q_debounce_events, SQL_DEBOUNCE_EVENTS)


def q_metadata_stats(sf_dir: str) -> Any:
    """Metadata-only aggregates: row count, MIN/MAX and null counts
    straight from the Parquet FOOTERS — zero data bytes read (the
    seconds-not-hours answer at 100 TB). Footer reads distribute one
    task per file batch; scalar partials merge on the driver
    (sources/readers.py:parquet_footer_stats). Numeric/temporal
    columns only (string stats may be writer-truncated — rejected
    loudly)."""
    from patito_ray.sources.readers import parquet_footer_stats

    return parquet_footer_stats(
        f"{sf_dir}/orders.parquet", ["o_totalprice", "o_orderdate"]
    )


SQL_METADATA_STATS = """
SELECT COUNT(*) AS n_rows,
       MIN(o_totalprice) AS o_totalprice_min,
       MAX(o_totalprice) AS o_totalprice_max,
       CAST(COUNT(*) FILTER (o_totalprice IS NULL) AS BIGINT)
         AS o_totalprice_nulls,
       MIN(o_orderdate) AS o_orderdate_min,
       MAX(o_orderdate) AS o_orderdate_max,
       CAST(COUNT(*) FILTER (o_orderdate IS NULL) AS BIGINT)
         AS o_orderdate_nulls
FROM orders
"""

QUERIES["metadata_stats"] = (q_metadata_stats, SQL_METADATA_STATS)


def q_weighted_median(sf_dir: str) -> Any:
    """Quantity-weighted median extended price per return flag: the
    smallest price whose cumulative quantity reaches half the group
    total. Selection-based — bit-exact vs the SQL running-SUM-window
    formulation, no rounding (stages/quantiles.py:
    grouped_weighted_median, adaptive driver-vs-exchange)."""
    from patito_ray.stages.quantiles import grouped_weighted_median

    ds = _rp(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice", "l_quantity"])
    res = grouped_weighted_median(
        ds, by="l_returnflag", value="l_extendedprice", weight="l_quantity"
    )

    _schema = pa.schema([("l_returnflag", pa.string()), ("wmedian", pa.float64())])

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "l_returnflag" not in t.column_names:
            return _schema.empty_table()
        return t.select(["l_returnflag", "wmedian"]).cast(_schema)

    return _apply(res, finish)


SQL_WEIGHTED_MEDIAN = """
WITH c AS (
  SELECT l_returnflag, l_extendedprice AS v,
         SUM(l_quantity) OVER (
           PARTITION BY l_returnflag ORDER BY l_extendedprice
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS cum,
         SUM(l_quantity) OVER (PARTITION BY l_returnflag) AS tot
  FROM lineitem
)
SELECT l_returnflag, MIN(v) AS wmedian
FROM c WHERE 2 * cum >= tot GROUP BY l_returnflag
"""

QUERIES["weighted_median"] = (q_weighted_median, SQL_WEIGHTED_MEDIAN)


def q_range_sorted_write(sf_dir: str) -> Any:
    """TeraSort-shape sorted output (rows-only: range boundaries come
    from block-layout-dependent sampling): orders written as 8
    range-partitioned files each internally sorted by o_totalprice,
    with disjoint ascending ranges (sinks.py:range_partition_write).
    Returns the manifest; the pytest suite verifies global sortedness
    and multiset preservation."""
    from patito_ray.sinks import range_partition_write

    ds = _rp(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    out_dir = _tmp_dir("rangewrite", sf_dir)
    manifest = range_partition_write(
        ds, "o_totalprice", out_dir, num_ranges=8, overwrite=True
    )
    return pa.table(
        {
            "range_id": pa.array([r["range_id"] for r in manifest], pa.int64()),
            "rows": pa.array([r["rows"] for r in manifest], pa.int64()),
            "min": pa.array([r["min"] for r in manifest], pa.float64()),
            "max": pa.array([r["max"] for r in manifest], pa.float64()),
        }
    )


QUERIES["range_sorted_write"] = (q_range_sorted_write, None)


def q_attribution_last_touch(sf_dir: str) -> Any:
    """Last-touch revenue attribution: every purchase credits the
    user's most recent PRECEDING non-purchase event type ('none' when
    the purchase is the user's first event). One hash exchange on
    user_id; per-partition polars pass does masked-shift-forward-fill,
    the purchase filter and the per-channel partial (count + revenue
    on the exact integer cents grid) in one frame; channel partials
    merge adaptively. SQL twin is LAST_VALUE ... IGNORE NULLS over the
    1-PRECEDING frame."""
    import polars as pl

    from patito_ray.stages.exchange import hash_partition_ids
    from patito_ray.stages.join import default_num_partitions

    P = default_num_partitions()
    ds = _rp(sf_dir, "events", ["event_id", "ts", "user_id", "event_type", "value"])

    def add_part(t: pa.Table) -> pa.Table:
        part = hash_partition_ids(t.column("user_id"), P, "attribution user_id")
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "tu": pc.cast(t.column("ts"), pa.int64()),
                "event_id": t.column("event_id"),
                "event_type": t.column("event_type"),
                "cents": pa.array(
                    np.floor(
                        t.column("value").to_numpy(zero_copy_only=False) * 100.0
                        + 0.5
                    ).astype(np.int64),
                    type=pa.int64(),
                ),
                "part": pa.array(part, type=pa.int64()),
            }
        )

    _p_schema = pa.schema(
        [("channel", pa.string()), ("n", pa.int64()), ("revenue_cents", pa.int64())]
    )

    def per_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.column_names:
            return _p_schema.empty_table()
        df = pl.from_arrow(t.drop_columns(["part"])).sort(
            ["user_id", "tu", "event_id"], maintain_order=True
        )
        masked = (
            pl.when(pl.col("event_type") != "purchase")
            .then(pl.col("event_type"))
            .otherwise(None)
        )
        channel = (
            masked.shift(1).forward_fill().over("user_id").alias("channel")
        )
        return (
            df.with_columns(channel)
            .filter(pl.col("event_type") == "purchase")
            .with_columns(pl.col("channel").fill_null("none"))
            .group_by("channel")
            .agg(
                pl.len().cast(pl.Int64).alias("n"),
                pl.col("cents").sum().alias("revenue_cents"),
            )
            .select(["channel", "n", "revenue_cents"])
            .to_arrow()
            .cast(_p_schema)
        )

    partials = (
        ds.map_batches(add_part, batch_format="pyarrow", batch_size=None)
        .groupby("part")
        .map_groups(per_part, batch_format="pyarrow")
    )
    merged = merge_partial_sums(partials, ["channel"], ["n", "revenue_cents"])

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _p_schema.empty_table()
        return t.select(["channel", "n", "revenue_cents"]).cast(_p_schema)

    return _apply(merged, finish)


SQL_ATTRIBUTION_LAST_TOUCH = """
WITH w AS (
  SELECT user_id, event_type, value,
         LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END
                    IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts), event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS channel
  FROM events
)
SELECT COALESCE(channel, 'none') AS channel, COUNT(*) AS n,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM w WHERE event_type = 'purchase' GROUP BY 1
"""

QUERIES["attribution_last_touch"] = (
    q_attribution_last_touch,
    SQL_ATTRIBUTION_LAST_TOUCH,
)


def q_ab_proportions(sf_dir: str) -> Any:
    """A/B two-proportion z-test: users split by user_id parity, a
    conversion = any 'purchase' event with value > 150 (a plain
    any-purchase flag saturates at 100% on this corpus — zero pooled
    variance, undefined z). Per-batch (user, flag) partials
    merge adaptively (flag sums: > 0 means converted), then variant
    counts reduce to four exact ints and the z statistic is ONE
    identically-ordered IEEE expression on both engines (final 1e-6
    round only, same discipline as welch_ttest)."""
    import polars as pl

    ds = _rp(sf_dir, "events", ["user_id", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t)
            .group_by("user_id")
            .agg(
                (
                    (pl.col("event_type") == "purchase")
                    & (pl.col("value") > 150)
                )
                .max()
                .cast(pl.Int64)
                .alias("pur")
            )
            .to_arrow()
        )

    users = merge_partial_sums(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["user_id"],
        ["pur"],
    )

    def variant_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema(
                [("variant", pa.int64()), ("n", pa.int64()), ("conv", pa.int64())]
            ).empty_table()
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        pur = t.column("pur").to_numpy(zero_copy_only=False) > 0
        var = uid % 2
        return pa.table(
            {
                "variant": pa.array([0, 1], type=pa.int64()),
                "n": pa.array(
                    [int((var == 0).sum()), int((var == 1).sum())], type=pa.int64()
                ),
                "conv": pa.array(
                    [int(pur[var == 0].sum()), int(pur[var == 1].sum())],
                    type=pa.int64(),
                ),
            }
        )

    if isinstance(users, pa.Table):
        counts = variant_partial(users)
    else:
        merged = merge_partial_sums(
            users.map_batches(
                variant_partial, batch_format="pyarrow", batch_size=None
            ),
            ["variant"],
            ["n", "conv"],
        )
        counts = merged if isinstance(merged, pa.Table) else pa.concat_tables(
            [b for b in merged.iter_batches(batch_format="pyarrow") if b.num_rows]
        )

    d = {
        int(v): (int(n), int(c))
        for v, n, c in zip(
            counts.column("variant").to_pylist(),
            counts.column("n").to_pylist(),
            counts.column("conv").to_pylist(),
        )
    }
    n0, c0 = d.get(0, (0, 0))
    n1, c1 = d.get(1, (0, 0))
    if n0 == 0 or n1 == 0:
        raise ValueError(
            "ab_proportions: a variant has no users — the z statistic "
            "is undefined on this input"
        )
    p0 = c0 / n0
    p1 = c1 / n1
    pooled = (c0 + c1) / (n0 + n1)
    import math

    z = (p1 - p0) / math.sqrt(pooled * (1 - pooled) * (1 / n0 + 1 / n1))
    return _one_row(
        n0=n0, c0=c0, n1=n1, c1=c1, z=_rf(z, 6)
    )


SQL_AB_PROPORTIONS = """
WITH u AS (
  SELECT user_id, user_id % 2 AS variant,
         MAX(CASE WHEN event_type = 'purchase' AND value > 150
                  THEN 1 ELSE 0 END) AS pur
  FROM events GROUP BY 1, 2
), g AS (
  SELECT variant, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(pur) AS BIGINT) AS conv
  FROM u GROUP BY 1
), w AS (
  SELECT a.n AS n0, a.conv AS c0, b.n AS n1, b.conv AS c1
  FROM g a, g b WHERE a.variant = 0 AND b.variant = 1
)
SELECT n0, c0, n1, c1,
       ROUND((CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)
              - CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE))
             / sqrt((CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
                    * (1 - CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
                    * (1 / CAST(n0 AS DOUBLE) + 1 / CAST(n1 AS DOUBLE))), 6)
         AS z
FROM w
"""

QUERIES["ab_proportions"] = (q_ab_proportions, SQL_AB_PROPORTIONS)


def q_event_trigrams(sf_dir: str) -> Any:
    """User-journey mining: counts of consecutive 3-step event-type
    sequences per user stream (the n-gram extension of the Markov
    event_transitions matrix), kept at n >= 5. One hash exchange on
    user_id; each partition forms trigrams with two vectorized shifts
    inside the same polars frame and pre-counts; partials merge
    adaptively. Exact integer counts."""
    import polars as pl

    from patito_ray.stages.exchange import hash_partition_ids
    from patito_ray.stages.join import default_num_partitions

    P = default_num_partitions()
    ds = _rp(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def add_part(t: pa.Table) -> pa.Table:
        part = hash_partition_ids(t.column("user_id"), P, "event_trigrams user_id")
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "tu": pc.cast(t.column("ts"), pa.int64()),
                "event_id": t.column("event_id"),
                "event_type": t.column("event_type"),
                "part": pa.array(part, type=pa.int64()),
            }
        )

    _p_schema = pa.schema(
        [
            ("e1", pa.string()),
            ("e2", pa.string()),
            ("e3", pa.string()),
            ("n", pa.int64()),
        ]
    )

    def per_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.column_names:
            return _p_schema.empty_table()
        df = pl.from_arrow(t.drop_columns(["part"])).sort(
            ["user_id", "tu", "event_id"], maintain_order=True
        )
        return (
            df.with_columns(
                pl.col("event_type").shift(1).over("user_id").alias("e2s"),
                pl.col("event_type").shift(2).over("user_id").alias("e1s"),
            )
            .drop_nulls(["e1s", "e2s"])
            .group_by(["e1s", "e2s", "event_type"])
            .agg(pl.len().cast(pl.Int64).alias("n"))
            .rename({"e1s": "e1", "e2s": "e2", "event_type": "e3"})
            .select(["e1", "e2", "e3", "n"])
            .to_arrow()
            .cast(_p_schema)
        )

    partials = (
        ds.map_batches(add_part, batch_format="pyarrow", batch_size=None)
        .groupby("part")
        .map_groups(per_part, batch_format="pyarrow")
    )
    merged = merge_partial_sums(partials, ["e1", "e2", "e3"], ["n"])

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _p_schema.empty_table()
        return (
            t.select(["e1", "e2", "e3", "n"])
            .cast(_p_schema)
            .filter(pc.greater_equal(t.column("n"), 5))
        )

    return _apply(merged, finish)


SQL_EVENT_TRIGRAMS = """
WITH w AS (
  SELECT user_id,
         LAG(event_type, 2) OVER win AS e1,
         LAG(event_type, 1) OVER win AS e2,
         event_type AS e3
  FROM events
  WINDOW win AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
)
SELECT e1, e2, e3, COUNT(*) AS n
FROM w WHERE e1 IS NOT NULL AND e2 IS NOT NULL
GROUP BY 1, 2, 3 HAVING COUNT(*) >= 5
"""

QUERIES["event_trigrams"] = (q_event_trigrams, SQL_EVENT_TRIGRAMS)


def q_resample_ffill(sf_dir: str) -> Any:
    """Time-series gap filling: resample each user's event stream to a
    DAILY grid between their first and last active day, forward-
    filling the last observed value (the latest event of each day,
    (ts, event_id)-latest, wins). One hash exchange on user_id; each
    partition dedups to per-day last values, builds its users' day
    grids vectorized and gap-fills with one polars join_asof — no
    per-user Python. Values copy through unchanged (no arithmetic),
    so the oracle (DuckDB ASOF JOIN) matches bit-for-bit."""
    import polars as pl

    from patito_ray.stages.exchange import hash_partition_ids
    from patito_ray.stages.join import default_num_partitions

    P = default_num_partitions()
    ds = _rp(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def add_part(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        part = hash_partition_ids(t.column("user_id"), P, "resample user_id")
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "aday": pa.array(
                    (us // 86_400_000_000).astype(np.int32), type=pa.int32()
                ),
                "tu": pa.array(us, type=pa.int64()),
                "event_id": t.column("event_id"),
                "value": t.column("value"),
                "part": pa.array(part, type=pa.int64()),
            }
        )

    _schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("day", pa.timestamp("us")),
            ("value", pa.float64()),
        ]
    )

    def per_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.column_names:
            return _schema.empty_table()
        df = (
            pl.from_arrow(t.drop_columns(["part"]))
            .with_columns(pl.col("aday").cast(pl.Date).alias("day"))
            .sort(["user_id", "tu", "event_id"], maintain_order=True)
            .group_by(["user_id", "day"], maintain_order=True)
            .agg(pl.col("value").last())
        )
        spans = df.group_by("user_id").agg(
            pl.col("day").min().alias("lo"), pl.col("day").max().alias("hi")
        )
        grid = (
            spans.with_columns(
                pl.date_ranges("lo", "hi", interval="1d").alias("day")
            )
            .explode("day")
            .select(["user_id", "day"])
        )
        out = grid.sort(["user_id", "day"]).join_asof(
            df.sort(["user_id", "day"]),
            on="day",
            by="user_id",
            strategy="backward",
        )
        return pa.table(
            {
                "user_id": pc.cast(
                    out.get_column("user_id").to_arrow(), pa.int64()
                ),
                "day": pc.cast(
                    pc.cast(out.get_column("day").to_arrow(), pa.date32()),
                    pa.timestamp("us"),
                ),
                "value": pc.cast(out.get_column("value").to_arrow(), pa.float64()),
            },
            schema=_schema,
        )

    return (
        ds.map_batches(add_part, batch_format="pyarrow", batch_size=None)
        .groupby("part")
        .map_groups(per_part, batch_format="pyarrow")
    )


SQL_RESAMPLE_FFILL = """
WITH ranked AS (
  SELECT user_id, CAST(ts AS DATE) AS day, value,
         ROW_NUMBER() OVER (
           PARTITION BY user_id, CAST(ts AS DATE)
           ORDER BY epoch_us(ts) DESC, event_id DESC
         ) AS rn
  FROM events
),
d AS (SELECT user_id, day, value FROM ranked WHERE rn = 1),
span AS (SELECT user_id, MIN(day) AS lo, MAX(day) AS hi FROM d GROUP BY 1),
grid AS (
  SELECT user_id,
         CAST(UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
  FROM span
)
SELECT g.user_id, g.day, d.value
FROM grid g ASOF JOIN d ON g.user_id = d.user_id AND g.day >= d.day
"""

QUERIES["resample_ffill"] = (q_resample_ffill, SQL_RESAMPLE_FFILL)


def q_compression_ratio(sf_dir: str) -> Any:
    """Compression-ratio quality signal (Gopher-family filter):
    zlib-compressed bytes / raw bytes per document — repetitive
    machine-generated junk compresses far below prose. Stateless
    map_batches; the per-doc zlib call is C-bound (the codec-kernel
    precedent), everything else vectorized. Rows-only (SQL has no
    zlib); determinism + monotonicity pytest-checked."""
    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    _schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("raw_len", pa.int64()),
            ("comp_len", pa.int64()),
            ("ratio", pa.float64()),
        ]
    )

    def score(t: pa.Table) -> pa.Table:
        import zlib

        if t.num_rows == 0:
            return _schema.empty_table()
        texts = t.column("text").to_pylist()
        raw = np.array([len(s.encode()) for s in texts], dtype=np.int64)
        comp = np.array(
            [len(zlib.compress(s.encode(), 6)) for s in texts], dtype=np.int64
        )
        return pa.table(
            {
                "doc_id": pc.cast(t.column("doc_id"), pa.int64()),
                "raw_len": pa.array(raw, type=pa.int64()),
                "comp_len": pa.array(comp, type=pa.int64()),
                "ratio": pa.array(
                    comp / np.maximum(raw, 1), type=pa.float64()
                ),
            },
            schema=_schema,
        )

    return ds.map_batches(score, batch_format="pyarrow", batch_size=None)


QUERIES["compression_ratio"] = (q_compression_ratio, None)


def q_purchase_gaps(sf_dir: str) -> Any:
    """Inter-purchase cadence: each user's MEDIAN gap (microseconds)
    between consecutive purchase events — lag-diff and the selection
    median both inside one per-partition pass after a single user_id
    exchange. np.median's mean-of-two-middles == SQL MEDIAN
    bit-for-bit on the integer-us grid, so no rounding."""
    import polars as pl

    from patito_ray.stages.exchange import hash_partition_ids
    from patito_ray.stages.join import default_num_partitions

    P = default_num_partitions()
    ds = _rp(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def add_part(t: pa.Table) -> pa.Table:
        keep = pc.equal(t.column("event_type"), "purchase")
        t = t.filter(keep)
        part = hash_partition_ids(t.column("user_id"), P, "purchase_gaps user_id")
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "tu": pc.cast(t.column("ts"), pa.int64()),
                "event_id": t.column("event_id"),
                "part": pa.array(part, type=pa.int64()),
            }
        )

    _schema = pa.schema(
        [("user_id", pa.int64()), ("median_gap_us", pa.float64())]
    )

    def per_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.column_names:
            return _schema.empty_table()
        return (
            pl.from_arrow(t.drop_columns(["part"]))
            .sort(["user_id", "tu", "event_id"], maintain_order=True)
            .with_columns(
                (pl.col("tu") - pl.col("tu").shift(1))
                .over("user_id")
                .alias("gap")
            )
            .drop_nulls(["gap"])
            .group_by("user_id")
            .agg(pl.col("gap").median().alias("median_gap_us"))
            .select(["user_id", "median_gap_us"])
            .to_arrow()
            .cast(_schema)
        )

    return (
        ds.map_batches(add_part, batch_format="pyarrow", batch_size=None)
        .groupby("part")
        .map_groups(per_part, batch_format="pyarrow")
    )


SQL_PURCHASE_GAPS = """
WITH p AS (
  SELECT user_id,
         epoch_us(ts) - LAG(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts), event_id
         ) AS gap
  FROM events WHERE event_type = 'purchase'
)
SELECT user_id, MEDIAN(gap) AS median_gap_us
FROM p WHERE gap IS NOT NULL GROUP BY user_id
"""

QUERIES["purchase_gaps"] = (q_purchase_gaps, SQL_PURCHASE_GAPS)


def q_user_streaks(sf_dir: str) -> Any:
    """Gaps-and-islands: each user's longest run of CONSECUTIVE active
    days, plus streak count and distinct active days. One user_id hash
    exchange; inside each partition polars does distinct-day dedup,
    the island key (day - row_number, the classic trick) and both
    group levels vectorized. All-integer outputs — zero rounding."""
    import polars as pl

    from patito_ray.stages.exchange import hash_partition_ids
    from patito_ray.stages.join import default_num_partitions

    P = default_num_partitions()
    ds = _rp(sf_dir, "events", ["ts", "user_id"])

    def add_part(t: pa.Table) -> pa.Table:
        day = pc.cast(pc.cast(t.column("ts"), pa.date32()), pa.int32())
        slim = pa.table({"user_id": t.column("user_id"), "day": day})
        # per-batch distinct pre-shrink: the exchange moves at most
        # one row per (user, day) per batch, never the event volume
        slim = pl.from_arrow(slim).unique().to_arrow()
        part = hash_partition_ids(slim.column("user_id"), P, "user_streaks user_id")
        return slim.append_column("part", pa.array(part, type=pa.int64()))

    _schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("max_streak", pa.int64()),
            ("n_streaks", pa.int64()),
            ("active_days", pa.int64()),
        ]
    )

    def per_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.column_names:
            return _schema.empty_table()
        return (
            pl.from_arrow(t.drop_columns(["part"]))
            .unique()
            .sort(["user_id", "day"])
            .with_columns(
                (pl.col("day").cast(pl.Int64) - pl.int_range(pl.len()).over("user_id"))
                .alias("isl")
            )
            .group_by(["user_id", "isl"])
            .agg(pl.len().alias("len"))
            .group_by("user_id")
            .agg(
                pl.col("len").max().alias("max_streak"),
                pl.len().alias("n_streaks"),
                pl.col("len").sum().alias("active_days"),
            )
            .to_arrow()
            .cast(_schema)
        )

    return (
        ds.map_batches(add_part, batch_format="pyarrow", batch_size=None)
        .groupby("part")
        .map_groups(per_part, batch_format="pyarrow")
    )


SQL_USER_STREAKS = """
WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
r AS (
  SELECT user_id, day,
         day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day)
                    AS INTEGER) AS isl
  FROM d
),
c AS (SELECT user_id, isl, COUNT(*) AS len FROM r GROUP BY user_id, isl)
SELECT user_id,
       CAST(MAX(len) AS BIGINT) AS max_streak,
       CAST(COUNT(*) AS BIGINT) AS n_streaks,
       CAST(SUM(len) AS BIGINT) AS active_days
FROM c GROUP BY user_id
"""

QUERIES["user_streaks"] = (q_user_streaks, SQL_USER_STREAKS)


def q_time_weighted_value(sf_dir: str) -> Any:
    """Time-weighted average of `value` per user (the standard
    irregular-time-series mean: each reading weighted by how long it
    was current). Exactness trick: quantize value to an integer
    millis grid with floor(|v|*1000+0.5) — identical IEEE ops on both
    engines — and timestamps to integer seconds, so the weighted sum
    and the span are EXACT int64 (< 2^53) on both sides and the final
    twa is one correctly-rounded division. One user_id exchange;
    lag-diff + sums vectorized per partition."""
    import polars as pl

    from patito_ray.stages.exchange import hash_partition_ids
    from patito_ray.stages.join import default_num_partitions

    P = default_num_partitions()
    ds = _rp(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def add_part(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False).astype(np.float64)
        vmil = np.copysign(np.floor(np.abs(v) * 1000.0 + 0.5), v).astype(np.int64)
        tsec = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False) // 1_000_000
        part = hash_partition_ids(t.column("user_id"), P, "time_weighted_value user_id")
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "event_id": t.column("event_id"),
                "tsec": pa.array(tsec, type=pa.int64()),
                "vmil": pa.array(vmil, type=pa.int64()),
                "part": pa.array(part, type=pa.int64()),
            }
        )

    _schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("wsum", pa.int64()),
            ("tspan", pa.int64()),
            ("twa", pa.float64()),
        ]
    )

    def per_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.column_names:
            return _schema.empty_table()
        return (
            pl.from_arrow(t.drop_columns(["part"]))
            .sort(["user_id", "tsec", "event_id"], maintain_order=True)
            .with_columns(
                (pl.col("tsec").shift(-1) - pl.col("tsec")).over("user_id").alias("dt")
            )
            .drop_nulls(["dt"])
            .group_by("user_id")
            .agg(
                (pl.col("vmil") * pl.col("dt")).sum().alias("wsum"),
                pl.col("dt").sum().alias("tspan"),
            )
            .filter(pl.col("tspan") > 0)
            .with_columns(
                (pl.col("wsum").cast(pl.Float64) / pl.col("tspan").cast(pl.Float64))
                .alias("twa")
            )
            .select(["user_id", "wsum", "tspan", "twa"])
            .to_arrow()
            .cast(_schema)
        )

    return (
        ds.map_batches(add_part, batch_format="pyarrow", batch_size=None)
        .groupby("part")
        .map_groups(per_part, batch_format="pyarrow")
    )


SQL_TIME_WEIGHTED_VALUE = """
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) // 1000000 AS tsec,
         CAST(FLOOR(ABS(value) * 1000 + 0.5)
              * (CASE WHEN value < 0 THEN -1 ELSE 1 END) AS BIGINT) AS vmil
  FROM events
),
o AS (
  SELECT user_id, vmil,
         LEAD(tsec) OVER (PARTITION BY user_id ORDER BY tsec, event_id) - tsec AS dt
  FROM e
),
g AS (
  SELECT user_id, CAST(SUM(vmil * dt) AS BIGINT) AS wsum,
         CAST(SUM(dt) AS BIGINT) AS tspan
  FROM o WHERE dt IS NOT NULL GROUP BY user_id
)
SELECT user_id, wsum, tspan,
       CAST(wsum AS DOUBLE) / CAST(tspan AS DOUBLE) AS twa
FROM g WHERE tspan > 0
"""

QUERIES["time_weighted_value"] = (q_time_weighted_value, SQL_TIME_WEIGHTED_VALUE)


def q_user_event_entropy(sf_dir: str) -> Any:
    """Behavioral-diversity score: Shannon entropy of each user's
    event-type distribution. Per-batch partial counts per (user, type)
    ride one user-hashed exchange (a few rows per user per batch, never
    the event volume); entropy is a per-partition numpy kernel. The
    integer columns are exact; entropy rounds at 6 via the DuckDB-exact
    `_ra` grid (PMI precedent for cross-engine LOG2 at nd=6)."""
    import polars as pl

    from patito_ray.stages.exchange import hash_partition_ids
    from patito_ray.stages.join import default_num_partitions

    P = default_num_partitions()
    ds = _rp(sf_dir, "events", ["user_id", "event_type"])

    def partial_counts(t: pa.Table) -> pa.Table:
        out = (
            pl.from_arrow(t)
            .group_by(["user_id", "event_type"])
            .agg(pl.len().cast(pl.Int64).alias("cnt"))
            .to_arrow()
        )
        part = hash_partition_ids(out.column("user_id"), P, "user_event_entropy user_id")
        return out.append_column("part", pa.array(part, type=pa.int64()))

    _schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("n_types", pa.int64()),
            ("n_events", pa.int64()),
            ("entropy", pa.float64()),
        ]
    )

    def per_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.column_names:
            return _schema.empty_table()
        g = (
            pl.from_arrow(t.drop_columns(["part"]))
            .group_by(["user_id", "event_type"])
            .agg(pl.col("cnt").sum().alias("cnt"))
            .sort(["user_id", "event_type"])
        )
        uid = g["user_id"].to_numpy()
        cnt = g["cnt"].to_numpy().astype(np.float64)
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        n_per = np.add.reduceat(cnt, starts)
        p = cnt / np.repeat(n_per, np.diff(np.r_[starts, len(cnt)]))
        terms = -p * np.log2(p)
        # + 0.0 canonicalizes the -0.0 a single-type user produces
        # (reduceat over a singleton segment returns -1.0*log2(1.0) =
        # -0.0 unchanged; DuckDB's SUM accumulates 0.0 + x = +0.0 —
        # the two differ BITWISE and the driver hashes bits)
        ent = np.add.reduceat(terms, starts) + 0.0
        n_types = np.diff(np.r_[starts, len(cnt)])
        return pa.table(
            {
                "user_id": pa.array(uid[starts], type=pa.int64()),
                "n_types": pa.array(n_types.astype(np.int64), type=pa.int64()),
                "n_events": pa.array(n_per.astype(np.int64), type=pa.int64()),
                "entropy": _ra(pa.array(ent), 6),
            }
        )

    return (
        ds.map_batches(partial_counts, batch_format="pyarrow", batch_size=None)
        .groupby("part")
        .map_groups(per_part, batch_format="pyarrow")
    )


SQL_USER_EVENT_ENTROPY = """
WITH c AS (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY user_id, event_type
),
n AS (SELECT user_id, CAST(SUM(cnt) AS BIGINT) AS n FROM c GROUP BY user_id)
SELECT c.user_id AS user_id,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       CAST(MAX(n.n) AS BIGINT) AS n_events,
       ROUND(SUM(-(CAST(cnt AS DOUBLE) / n.n) * LOG2(CAST(cnt AS DOUBLE) / n.n)), 6)
         AS entropy
FROM c JOIN n ON c.user_id = n.user_id GROUP BY c.user_id
"""

QUERIES["user_event_entropy"] = (q_user_event_entropy, SQL_USER_EVENT_ENTROPY)


def q_mutual_nn(sf_dir: str) -> Any:
    """Reciprocal-best-match pairs over the embeddings table: (a, b)
    where each is the other's exact cosine top-1. Discrete output (id
    pairs only) — the float similarity never reaches the comparator.
    functions/similarity.py:mutual_nn_pairs for the broadcast-argmax +
    count==2 merge shape."""
    from patito_ray.functions.similarity import mutual_nn_pairs

    ds = _rp(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = mutual_nn_pairs(ds, id_col="vec_id", vec_col="embedding")
    if isinstance(out, pa.Table):
        return out
    schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])
    return _lazy_norm(out, schema)


SQL_MUTUAL_NN = """
WITH scored AS (
  SELECT q.vec_id AS qa, e.vec_id AS qb,
         list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                CAST(e.embedding AS DOUBLE[])) AS sim
  FROM embeddings q CROSS JOIN embeddings e
  WHERE q.vec_id <> e.vec_id
),
nn AS (
  SELECT qa, qb,
         ROW_NUMBER() OVER (PARTITION BY qa ORDER BY sim DESC, qb ASC) AS rn
  FROM scored
)
SELECT n1.qa AS a, n1.qb AS b
FROM nn n1 JOIN nn n2 ON n1.qa = n2.qb AND n1.qb = n2.qa
WHERE n1.rn = 1 AND n2.rn = 1 AND n1.qa < n1.qb
"""

QUERIES["mutual_nn"] = (q_mutual_nn, SQL_MUTUAL_NN)


def q_revenue_share(sf_dir: str) -> Any:
    """Ratio-to-parent rollup: each nation's share of its REGION's
    order revenue. Per-batch cents partials keyed by nationkey (25
    groups — one tiny merge), dimension tables joined driver-side
    (nation/region are fixed 25/5-row tables at any sf). Cents are an
    exact int64 grid on both engines; the share is one mirrored IEEE
    division per row."""
    import ray

    cust = pa.concat_tables(
        _rp(sf_dir, "customer", ["c_custkey", "c_nationkey"]).iter_batches(
            batch_format="pyarrow"
        )
    )
    ref = ray.put(cust)

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        joined = batch.join(ray.get(ref), keys=["o_custkey"], right_keys=["c_custkey"])
        price = joined.column("o_totalprice").to_numpy(zero_copy_only=False)
        cents = np.floor(price * 100.0 + 0.5).astype(np.int64)
        return (
            pl.from_arrow(
                pa.table(
                    {
                        "c_nationkey": joined.column("c_nationkey"),
                        "cents": pa.array(cents, type=pa.int64()),
                    }
                )
            )
            .group_by("c_nationkey")
            .agg(pl.col("cents").sum().alias("nat_cents"))
            .to_arrow()
        )

    orders = _rp(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    partials = orders.map_batches(partial, batch_format="pyarrow", batch_size=None)
    merged = merge_partial_sums(partials, ["c_nationkey"], ["nat_cents"])
    if not isinstance(merged, pa.Table):
        from patito_ray.stages.agg import collect_table

        merged = collect_table(
            merged,
            empty_schema=pa.schema(
                [("c_nationkey", pa.int64()), ("nat_cents", pa.int64())]
            ),
        )

    nation = pa.concat_tables(
        _rp(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"]).iter_batches(
            batch_format="pyarrow"
        )
    )
    region = pa.concat_tables(
        _rp(sf_dir, "region", ["r_regionkey", "r_name"]).iter_batches(
            batch_format="pyarrow"
        )
    )
    import polars as pl

    out = (
        pl.from_arrow(merged)
        .join(pl.from_arrow(nation), left_on="c_nationkey", right_on="n_nationkey")
        .join(pl.from_arrow(region), left_on="n_regionkey", right_on="r_regionkey")
        .with_columns(pl.col("nat_cents").sum().over("n_regionkey").alias("region_cents"))
        .select(
            pl.col("r_name").alias("region"),
            pl.col("n_name").alias("nation"),
            pl.col("nat_cents").cast(pl.Int64),
            pl.col("region_cents").cast(pl.Int64),
            (pl.col("nat_cents").cast(pl.Float64) / pl.col("region_cents").cast(pl.Float64))
            .alias("share"),
        )
        .to_arrow()
    )
    return out


SQL_REVENUE_SHARE = """
WITH rev AS (
  SELECT n_regionkey, n_name,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS nat_cents
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2
),
reg AS (
  SELECT n_regionkey, CAST(SUM(nat_cents) AS BIGINT) AS region_cents
  FROM rev GROUP BY 1
)
SELECT r_name AS region, n_name AS nation, nat_cents, region_cents,
       CAST(nat_cents AS DOUBLE) / CAST(region_cents AS DOUBLE) AS share
FROM rev
JOIN reg USING (n_regionkey)
JOIN region ON r_regionkey = n_regionkey
"""

QUERIES["revenue_share"] = (q_revenue_share, SQL_REVENUE_SHARE)


def q_source_simpson(sf_dir: str) -> Any:
    """Simpson diversity index of each source's language mix —
    lambda = sum(c*(c-1)) / (n*(n-1)), the probability two random docs
    from the source share a language. ALL-integer partials (one
    source-hashed exchange of (source, lang, cnt) rows); the index is
    a single division of exact int64s — stronger than entropy, which
    needs a log grid."""
    import polars as pl

    from patito_ray.stages.exchange import hash_partition_ids
    from patito_ray.stages.join import default_num_partitions

    P = default_num_partitions()
    ds = _rp(sf_dir, "documents", ["source", "lang"])

    def partial_counts(t: pa.Table) -> pa.Table:
        out = (
            pl.from_arrow(t)
            .group_by(["source", "lang"])
            .agg(pl.len().cast(pl.Int64).alias("cnt"))
            .to_arrow()
        )
        part = hash_partition_ids(out.column("source"), P, "source_simpson source")
        return out.append_column("part", pa.array(part, type=pa.int64()))

    _schema = pa.schema(
        [
            ("source", pa.string()),
            ("n_docs", pa.int64()),
            ("n_langs", pa.int64()),
            ("simpson", pa.float64()),
        ]
    )

    def per_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "source" not in t.column_names:
            return _schema.empty_table()
        return (
            pl.from_arrow(t.drop_columns(["part"]))
            .group_by(["source", "lang"])
            .agg(pl.col("cnt").sum().alias("cnt"))
            .group_by("source")
            .agg(
                pl.col("cnt").sum().alias("n_docs"),
                pl.len().cast(pl.Int64).alias("n_langs"),
                (pl.col("cnt") * (pl.col("cnt") - 1)).sum().alias("num"),
            )
            .filter(pl.col("n_docs") > 1)
            .with_columns(
                (
                    pl.col("num").cast(pl.Float64)
                    / (pl.col("n_docs") * (pl.col("n_docs") - 1)).cast(pl.Float64)
                ).alias("simpson")
            )
            .select(["source", "n_docs", "n_langs", "simpson"])
            .to_arrow()
            .cast(_schema)
        )

    return (
        ds.map_batches(partial_counts, batch_format="pyarrow", batch_size=None)
        .groupby("part")
        .map_groups(per_part, batch_format="pyarrow")
    )


SQL_SOURCE_SIMPSON = """
WITH c AS (
  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM documents GROUP BY source, lang
),
g AS (
  SELECT source, CAST(SUM(cnt) AS BIGINT) AS n_docs,
         CAST(COUNT(*) AS BIGINT) AS n_langs,
         CAST(SUM(cnt * (cnt - 1)) AS BIGINT) AS num
  FROM c GROUP BY source
)
SELECT source, n_docs, n_langs,
       CAST(num AS DOUBLE) / CAST(n_docs * (n_docs - 1) AS DOUBLE) AS simpson
FROM g WHERE n_docs > 1
"""

QUERIES["source_simpson"] = (q_source_simpson, SQL_SOURCE_SIMPSON)


def q_segment_gini(sf_dir: str, _limit_bytes: int = 256 << 20) -> Any:
    """Gini concentration of per-customer revenue within each market
    segment — the standard inequality measure over a sorted group:
    G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)) with x ascending.
    Cents partials per customer ride the adaptive merge; the holistic
    rank step is one segment exchange (5 groups) whose per-partition
    kernel is a vectorized sort + two dot products. Exact int64 until
    the single final division."""
    import ray

    import polars as pl

    cust = pa.concat_tables(
        _rp(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).iter_batches(
            batch_format="pyarrow"
        )
    )
    ref = ray.put(cust)

    def partial(batch: pa.Table) -> pa.Table:
        joined = batch.join(ray.get(ref), keys=["o_custkey"], right_keys=["c_custkey"])
        price = joined.column("o_totalprice").to_numpy(zero_copy_only=False)
        cents = np.floor(price * 100.0 + 0.5).astype(np.int64)
        return (
            pl.from_arrow(
                pa.table(
                    {
                        "o_custkey": joined.column("o_custkey"),
                        "segment": joined.column("c_mktsegment"),
                        "cents": pa.array(cents, type=pa.int64()),
                    }
                )
            )
            .group_by(["o_custkey", "segment"])
            .agg(pl.col("cents").sum().alias("cents"))
            .to_arrow()
        )

    orders = _rp(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    partials = orders.map_batches(partial, batch_format="pyarrow", batch_size=None)
    merged = merge_partial_sums(
        partials, ["o_custkey", "segment"], ["cents"], limit_bytes=_limit_bytes
    )

    _schema = pa.schema(
        [
            ("segment", pa.string()),
            ("n", pa.int64()),
            ("s0", pa.int64()),
            ("gini", pa.float64()),
        ]
    )

    def gini_kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "segment" not in t.column_names:
            return _schema.empty_table()
        df = pl.from_arrow(t).sort(["segment", "cents", "o_custkey"])
        seg = df["segment"].to_numpy()
        x = df["cents"].to_numpy().astype(np.int64)
        starts = np.flatnonzero(np.r_[True, seg[1:] != seg[:-1]])
        sizes = np.diff(np.r_[starts, len(x)])
        i = np.arange(len(x), dtype=np.int64) - np.repeat(starts, sizes) + 1
        # per-element bound (mirrors the oracle's BIGINT i*cents):
        # rank * cents < 2^63 / 1024 so the 1024-element chunk sums
        # below stay exact int64 — ~3.6e7 customers/segment at $2.5M
        # lifetime revenue
        prod = i * x
        # 2*s1 and n*s0 pass 2^63 around sf~7, so segment totals fold
        # chunked int64 partial sums into UNBOUNDED Python ints (the
        # oracle side computes them as HUGEINT); gini then mirrors the
        # SQL CAST(num AS DOUBLE) / CAST(den AS DOUBLE) exactly
        CH = 1024
        out = {"segment": [], "n": [], "s0": [], "gini": []}
        for g in range(len(starts)):
            lo = int(starts[g])
            hi = lo + int(sizes[g])
            bnd = np.arange(0, hi - lo, CH)
            s0 = sum(int(v) for v in np.add.reduceat(x[lo:hi], bnd))
            s1 = sum(int(v) for v in np.add.reduceat(prod[lo:hi], bnd))
            nn = hi - lo
            num = 2 * s1 - (nn + 1) * s0
            out["segment"].append(seg[lo])
            out["n"].append(nn)
            out["s0"].append(s0)
            out["gini"].append(float(num) / float(nn * s0))
        return pa.table(
            {
                "segment": pa.array(out["segment"], type=pa.string()),
                "n": pa.array(out["n"], type=pa.int64()),
                "s0": pa.array(out["s0"], type=pa.int64()),
                "gini": pa.array(out["gini"], type=pa.float64()),
            }
        )

    if isinstance(merged, pa.Table):
        return gini_kernel(merged)
    return merged.groupby("segment").map_groups(gini_kernel, batch_format="pyarrow")


SQL_SEGMENT_GINI = """
WITH r AS (
  SELECT c_mktsegment AS segment, o_custkey,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2
),
k AS (
  SELECT segment, cents,
         ROW_NUMBER() OVER (PARTITION BY segment ORDER BY cents, o_custkey) AS i
  FROM r
),
g AS (
  SELECT segment, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(cents) AS BIGINT) AS s0,
         SUM(i * cents) AS s1
  FROM k GROUP BY segment
)
SELECT segment, n, s0,
       CAST(2 * s1 - (CAST(n AS HUGEINT) + 1) * s0 AS DOUBLE)
         / CAST(CAST(n AS HUGEINT) * s0 AS DOUBLE) AS gini
FROM g
"""

QUERIES["segment_gini"] = (q_segment_gini, SQL_SEGMENT_GINI)


def q_cuped_adjust(sf_dir: str, _limit_bytes: int = 256 << 20) -> Any:
    """CUPED variance reduction (the standard experiment-analysis
    adjustment): per-user post-period metric minus theta * centered
    pre-period metric, theta = cov(pre, post)/var(pre) over users.

    Exactness: per-user pre/post sums live on the integer millis grid
    (exact partials through the adaptive merge; cross-user moment sums
    sx/sy/sxy/sxx are exact int64 too — bound: users * max_user_millis²
    < 2^63, fine to ~10^9 users at this value scale). theta / meanpre /
    adjusted are then MIRRORED single IEEE ops on both engines — no
    rounding anywhere. Degenerate zero pre-variance yields nan on both
    engines identically."""
    import polars as pl
    import ray.data as rd

    SPLIT_US = int(
        (datetime.datetime(2024, 1, 16) - datetime.datetime(1970, 1, 1)).total_seconds()
        * 1_000_000
    )
    ds = _rp(sf_dir, "events", ["ts", "user_id", "value"])

    def partial(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False).astype(np.float64)
        vmil = np.copysign(np.floor(np.abs(v) * 1000.0 + 0.5), v).astype(np.int64)
        tus = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        is_pre = tus < SPLIT_US
        return (
            pl.from_arrow(
                pa.table(
                    {
                        "user_id": t.column("user_id"),
                        "pre": pa.array(np.where(is_pre, vmil, 0), type=pa.int64()),
                        "post": pa.array(np.where(is_pre, 0, vmil), type=pa.int64()),
                    }
                )
            )
            .group_by("user_id")
            .agg(pl.col("pre").sum(), pl.col("post").sum())
            .to_arrow()
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    merged = merge_partial_sums(
        partials, ["user_id"], ["pre", "post"], limit_bytes=_limit_bytes
    )
    users = (rd.from_arrow(merged) if isinstance(merged, pa.Table) else merged).materialize()

    def moments(t: pa.Table) -> pa.Table:
        pre = t.column("pre").to_numpy(zero_copy_only=False).astype(np.int64)
        post = t.column("post").to_numpy(zero_copy_only=False).astype(np.int64)
        return _one_row(
            k=0,
            n=len(pre),
            sx=int(pre.sum()),
            sy=int(post.sum()),
            sxy=int((pre * post).sum()),
            sxx=int((pre * pre).sum()),
        )

    m = merge_partial_sums(
        users.map_batches(moments, batch_format="pyarrow", batch_size=None),
        ["k"],
        ["n", "sx", "sy", "sxy", "sxx"],
        limit_bytes=_limit_bytes,
    )
    if not isinstance(m, pa.Table):
        from patito_ray.stages.agg import collect_table

        m = collect_table(
            m,
            empty_schema=pa.schema(
                [(c, pa.int64()) for c in ("k", "n", "sx", "sy", "sxy", "sxx")]
            ),
        )
    rows = m.to_pylist()
    if not rows:
        return pa.schema(
            [
                ("user_id", pa.int64()),
                ("pre", pa.int64()),
                ("post", pa.int64()),
                ("adjusted", pa.float64()),
            ]
        ).empty_table()
    row = rows[0]
    # np.float64 scalars: a zero pre-variance denominator must yield
    # IEEE inf/nan exactly like the SQL DOUBLE division, not a Python
    # ZeroDivisionError
    n_d, sx_d, sy_d = np.float64(row["n"]), np.float64(row["sx"]), np.float64(row["sy"])
    sxy_d, sxx_d = np.float64(row["sxy"]), np.float64(row["sxx"])
    with np.errstate(divide="ignore", invalid="ignore"):
        meanpre = sx_d / n_d
        theta = (n_d * sxy_d - sx_d * sy_d) / (n_d * sxx_d - sx_d * sx_d)

    def adjust(t: pa.Table) -> pa.Table:
        pre = t.column("pre").to_numpy(zero_copy_only=False).astype(np.float64)
        post = t.column("post").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "user_id": t.column("user_id").cast(pa.int64()),
                "pre": t.column("pre").cast(pa.int64()),
                "post": t.column("post").cast(pa.int64()),
                "adjusted": pa.array(post - theta * (pre - meanpre), type=pa.float64()),
            }
        )

    return users.map_batches(adjust, batch_format="pyarrow", batch_size=None)


SQL_CUPED_ADJUST = """
WITH e AS (
  SELECT user_id, ts,
         CAST(FLOOR(ABS(value) * 1000 + 0.5)
              * (CASE WHEN value < 0 THEN -1 ELSE 1 END) AS BIGINT) AS vmil
  FROM events
),
u AS (
  SELECT user_id,
         CAST(COALESCE(SUM(vmil) FILTER (ts < TIMESTAMP '2024-01-16'), 0) AS BIGINT)
           AS pre,
         CAST(COALESCE(SUM(vmil) FILTER (ts >= TIMESTAMP '2024-01-16'), 0) AS BIGINT)
           AS post
  FROM e GROUP BY user_id
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(pre) AS BIGINT) AS sx,
         CAST(SUM(post) AS BIGINT) AS sy, CAST(SUM(pre * post) AS BIGINT) AS sxy,
         CAST(SUM(pre * pre) AS BIGINT) AS sxx
  FROM u
),
t AS (
  SELECT CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS meanpre,
         (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS theta
  FROM s
)
SELECT u.user_id, u.pre, u.post,
       CAST(u.post AS DOUBLE) - t.theta * (CAST(u.pre AS DOUBLE) - t.meanpre)
         AS adjusted
FROM u, t
"""

QUERIES["cuped_adjust"] = (q_cuped_adjust, SQL_CUPED_ADJUST)


def q_winsorized_mean(sf_dir: str, _limit_bytes: int = 256 << 20) -> Any:
    """Winsorized mean per return flag: clip each price to the group's
    [p10, p90] SELECTION quantiles (rank ceil(q*n) — bit-exact vs SQL,
    zero interpolation), then average. Rides the shared adaptive
    grouped-holistic spine (driver kernel below the byte limit, hash
    exchange beyond). The clip bounds and clipped sum are exact int64
    cents; the mean is one mirrored IEEE division — no rounding."""
    import polars as pl

    from patito_ray.stages.quantiles import _adaptive_grouped_holistic

    from patito_ray.stages.join import default_num_partitions

    P = default_num_partitions()
    ds = _rp(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice"])

    def add_part(t: pa.Table) -> pa.Table:
        from patito_ray.stages.exchange import hash_partition_ids

        price = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        cents = np.floor(price * 100.0 + 0.5).astype(np.int64)
        out = pa.table(
            {
                "flag": t.column("l_returnflag"),
                "cents": pa.array(cents, type=pa.int64()),
            }
        )
        part = hash_partition_ids(out.column("flag"), P, "winsorized_mean l_returnflag")
        return out.append_column("part", pa.array(part, type=pa.int64()))

    _schema = pa.schema(
        [
            ("flag", pa.string()),
            ("n", pa.int64()),
            ("lo", pa.int64()),
            ("hi", pa.int64()),
            ("wmean", pa.float64()),
        ]
    )

    def per_partition(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "flag" not in t.column_names:
            return _schema.empty_table()
        df = pl.from_arrow(t.drop_columns(["part"])).sort(["flag", "cents"])
        flag = df["flag"].to_numpy()
        x = df["cents"].to_numpy().astype(np.int64)
        starts = np.flatnonzero(np.r_[True, flag[1:] != flag[:-1]])
        sizes = np.diff(np.r_[starts, len(x)])
        n = sizes.astype(np.int64)
        # 1-based rank ceil(q*n), clipped to >= 1 — identical IEEE
        # double product + ceil as the SQL CEIL(q*cnt)
        lo_i = np.maximum(np.ceil(n.astype(np.float64) * 0.1).astype(np.int64), 1)
        hi_i = np.maximum(np.ceil(n.astype(np.float64) * 0.9).astype(np.int64), 1)
        lo = x[starts + lo_i - 1]
        hi = x[starts + hi_i - 1]
        clipped = np.clip(x, np.repeat(lo, sizes), np.repeat(hi, sizes))
        ssum = np.add.reduceat(clipped, starts)
        return pa.table(
            {
                "flag": pa.array(flag[starts]),
                "n": pa.array(n, type=pa.int64()),
                "lo": pa.array(lo, type=pa.int64()),
                "hi": pa.array(hi, type=pa.int64()),
                "wmean": pa.array(
                    ssum.astype(np.float64) / n.astype(np.float64), type=pa.float64()
                ),
            }
        )

    return _adaptive_grouped_holistic(ds, add_part, per_partition, _limit_bytes)


SQL_WINSORIZED_MEAN = """
WITH c AS (
  SELECT l_returnflag AS flag,
         CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
  FROM lineitem
),
ranked AS (
  SELECT flag, cents,
         ROW_NUMBER() OVER (PARTITION BY flag ORDER BY cents) AS rn,
         COUNT(*) OVER (PARTITION BY flag) AS cnt
  FROM c
),
b AS (
  SELECT flag, CAST(MAX(cnt) AS BIGINT) AS n,
         MAX(CASE WHEN rn = GREATEST(1, CAST(CEIL(0.1 * cnt) AS BIGINT))
                  THEN cents END) AS lo,
         MAX(CASE WHEN rn = GREATEST(1, CAST(CEIL(0.9 * cnt) AS BIGINT))
                  THEN cents END) AS hi
  FROM ranked GROUP BY flag
)
SELECT b.flag, b.n, b.lo, b.hi,
       CAST(SUM(GREATEST(b.lo, LEAST(b.hi, c.cents))) AS DOUBLE)
         / CAST(b.n AS DOUBLE) AS wmean
FROM c JOIN b ON c.flag = b.flag
GROUP BY b.flag, b.n, b.lo, b.hi
"""

QUERIES["winsorized_mean"] = (q_winsorized_mean, SQL_WINSORIZED_MEAN)


def q_user_burstiness(sf_dir: str) -> Any:
    """Fano factor (variance-to-mean of daily event counts) per user —
    the standard overdispersion / bot-burstiness signal. Daily counts
    are exact integers; sc/sc2 moment sums stay exact int64 through one
    user-hash exchange; the factor itself is a MIRRORED IEEE expression
    of those exact ints on both engines, so no rounding anywhere."""
    import polars as pl

    from patito_ray.stages.exchange import hash_partition_ids
    from patito_ray.stages.join import default_num_partitions

    P = default_num_partitions()
    ds = _rp(sf_dir, "events", ["ts", "user_id"])

    def partial_counts(t: pa.Table) -> pa.Table:
        day = pc.cast(pc.cast(t.column("ts"), pa.date32()), pa.int32())
        out = (
            pl.from_arrow(pa.table({"user_id": t.column("user_id"), "day": day}))
            .group_by(["user_id", "day"])
            .agg(pl.len().cast(pl.Int64).alias("c"))
            .to_arrow()
        )
        part = hash_partition_ids(out.column("user_id"), P, "user_burstiness user_id")
        return out.append_column("part", pa.array(part, type=pa.int64()))

    _schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("n", pa.int64()),
            ("sc", pa.int64()),
            ("fano", pa.float64()),
        ]
    )

    def per_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.column_names:
            return _schema.empty_table()
        g = (
            pl.from_arrow(t.drop_columns(["part"]))
            .group_by(["user_id", "day"])
            .agg(pl.col("c").sum().alias("c"))
            .group_by("user_id")
            .agg(
                pl.len().cast(pl.Int64).alias("n"),
                pl.col("c").sum().alias("sc"),
                (pl.col("c") * pl.col("c")).sum().alias("sc2"),
            )
            .filter(pl.col("n") > 1)
        )
        n = g["n"].to_numpy().astype(np.float64)
        sc = g["sc"].to_numpy().astype(np.float64)
        sc2 = g["sc2"].to_numpy().astype(np.float64)
        fano = ((sc2 - sc * sc / n) / (n - 1.0)) / (sc / n)
        return pa.table(
            {
                "user_id": g["user_id"].to_arrow().cast(pa.int64()),
                "n": g["n"].to_arrow().cast(pa.int64()),
                "sc": g["sc"].to_arrow().cast(pa.int64()),
                "fano": pa.array(fano, type=pa.float64()),
            }
        )

    return (
        ds.map_batches(partial_counts, batch_format="pyarrow", batch_size=None)
        .groupby("part")
        .map_groups(per_part, batch_format="pyarrow")
    )


SQL_USER_BURSTINESS = """
WITH d AS (
  SELECT user_id, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY user_id, CAST(ts AS DATE)
),
m AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS sc,
         CAST(SUM(c * c) AS BIGINT) AS sc2
  FROM d GROUP BY user_id
)
SELECT user_id, n, sc,
       ((CAST(sc2 AS DOUBLE) - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE)
                               / CAST(n AS DOUBLE))
        / CAST(n - 1 AS DOUBLE))
       / (CAST(sc AS DOUBLE) / CAST(n AS DOUBLE)) AS fano
FROM m WHERE n > 1
"""

QUERIES["user_burstiness"] = (q_user_burstiness, SQL_USER_BURSTINESS)
