"""Query registry chunk (split from pipelines/queries.py): 0 registrations.

Registers: 
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


# ---------------------------------------------------------------------------
# validation-engine queries (counters checked against SQL aggregates)
# ---------------------------------------------------------------------------


class LineitemNulls(pr.Model):
    l_orderkey: int
    l_quantity: float
    l_shipdate: datetime.datetime


def q_lineitem_null_counts(sf_dir: str) -> pa.Table:
    ds = _rp(sf_dir, "lineitem", ["l_orderkey", "l_quantity", "l_shipdate"])
    rep = pr.validate_report(ds, LineitemNulls, allow_superfluous_columns=True)
    nc = rep.merged.null_counts
    return _one_row(
        row_count=rep.row_count,
        l_orderkey_nulls=nc.get("l_orderkey", 0),
        l_quantity_nulls=nc.get("l_quantity", 0),
        l_shipdate_nulls=nc.get("l_shipdate", 0),
    )


SQL_LINEITEM_NULLS = """
SELECT CAST(COUNT(*) AS BIGINT) AS row_count,
       CAST(COUNT(*) FILTER (l_orderkey IS NULL) AS BIGINT) AS l_orderkey_nulls,
       CAST(COUNT(*) FILTER (l_quantity IS NULL) AS BIGINT) AS l_quantity_nulls,
       CAST(COUNT(*) FILTER (l_shipdate IS NULL) AS BIGINT) AS l_shipdate_nulls
FROM lineitem
"""


class LineitemBounds(pr.Model):
    l_quantity: float = pr.Field(le=30)
    l_discount: float = pr.Field(ge=0.02, le=0.08)


def q_lineitem_bounds(sf_dir: str) -> pa.Table:
    ds = _rp(sf_dir, "lineitem", ["l_quantity", "l_discount"])
    rep = pr.validate_report(ds, LineitemBounds, allow_superfluous_columns=True)
    bf = rep.merged.bounds_fail
    return _one_row(
        qty_viol=bf.get("l_quantity", 0), disc_viol=bf.get("l_discount", 0)
    )


SQL_LINEITEM_BOUNDS = """
SELECT CAST(COUNT(*) FILTER (NOT (l_quantity <= 30) AND l_quantity IS NOT NULL) AS BIGINT) AS qty_viol,
       CAST(COUNT(*) FILTER (NOT (l_discount >= 0.02) AND l_discount IS NOT NULL) AS BIGINT)
     + CAST(COUNT(*) FILTER (NOT (l_discount <= 0.08) AND l_discount IS NOT NULL) AS BIGINT) AS disc_viol
FROM lineitem
"""


class LineitemFlag(pr.Model):
    l_returnflag: Literal["A", "N"]


def q_lineitem_enum_invalid(sf_dir: str) -> pa.Table:
    ds = _rp(sf_dir, "lineitem", ["l_returnflag"])
    rep = pr.validate_report(ds, LineitemFlag, allow_superfluous_columns=True)
    vals = sorted(rep.merged.enum_invalid.get("l_returnflag", set()))
    return pa.table({"invalid_value": pa.array(vals, type=pa.string())})


SQL_LINEITEM_ENUM = """
SELECT DISTINCT l_returnflag AS invalid_value
FROM lineitem WHERE l_returnflag NOT IN ('A', 'N')
"""


def q_orders_dup_custkey(sf_dir: str) -> pa.Table:
    ds = _rp(sf_dir, "orders", ["o_custkey"])
    n = duplicate_count_distributed(ds, "o_custkey")
    return _one_row(dup_rows=n)


SQL_ORDERS_DUP = """
SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) AS dup_rows
FROM (SELECT COUNT(*) AS c FROM orders GROUP BY o_custkey) WHERE c > 1
"""


class OrdersRef(pr.Model):
    o_custkey: int


def q_orders_referential(sf_dir: str) -> pa.Table:
    ds = _rp(sf_dir, "orders", ["o_custkey"])
    cust = _rp(sf_dir, "customer", ["c_custkey", "c_acctbal"])
    keys = cust.map_batches(
        lambda t: t.filter(pc.greater(t["c_acctbal"], 0)).select(["c_custkey"]),
        batch_format="pyarrow",
        batch_size=None,
    )
    rep = pr.validate_report(
        ds, OrdersRef, allow_superfluous_columns=True, references={"o_custkey": keys}
    )
    return _one_row(missing_keys=rep.merged.ref_fail.get("o_custkey", 0))


SQL_ORDERS_REF = """
SELECT CAST(COUNT(*) FILTER (o_custkey NOT IN
       (SELECT c_custkey FROM customer WHERE c_acctbal > 0)) AS BIGINT) AS missing_keys
FROM orders
"""


class Documents(pr.Model):
    doc_id: int = pr.Field(unique=True)
    text: str
    lang: Literal["en", "de", "fr", "es"]
    source: str
    n_chars: int = pr.Field(constraints=pr.field == pr.col("text").str.len_chars())


def q_documents_checks(sf_dir: str) -> pa.Table:
    ds = _rp(sf_dir, "documents")
    rep = pr.validate_report(ds, Documents)
    m = rep.merged
    return _one_row(
        row_count=rep.row_count,
        doc_id_dups=m.dup_counts.get("doc_id", 0),
        lang_invalid_n=len(m.enum_invalid.get("lang", set())),
        nchars_viol=m.constraint_fail.get("n_chars", 0),
    )


SQL_DOCUMENTS_CHECKS = """
SELECT CAST(COUNT(*) AS BIGINT) AS row_count,
       (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT)
        FROM (SELECT COUNT(*) AS c FROM documents GROUP BY doc_id) WHERE c > 1) AS doc_id_dups,
       CAST(COUNT(DISTINCT lang) FILTER (lang NOT IN ('en','de','fr','es')) AS BIGINT) AS lang_invalid_n,
       CAST(COUNT(*) FILTER (n_chars <> length(text)) AS BIGINT) AS nchars_viol
FROM documents
"""
