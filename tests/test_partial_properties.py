"""Property-based tests of the distributed-correctness invariant:

check_batch over any split of a table, merged in any order, must equal
check_batch over the whole table. This is the exact property that makes
the engine's map_batches + tree-merge execution correct regardless of
block boundaries, merge grouping, task retries or scheduling order.
"""

from typing import Literal, Optional

import hypothesis.strategies as st
import pyarrow as pa
from hypothesis import given, settings

import patito_ray as pr
from patito_ray.validation.checks import check_batch, local_duplicate_count
from patito_ray.validation.result import Partial, merge_partials


class M(pr.Model):
    uid: int = pr.Field(unique=True)
    score: Optional[float] = pr.Field(default=None, ge=0, le=100)
    tag: Literal["a", "b", "c"]
    name: str = pr.Field(min_length=1, max_length=8)
    even: int = pr.Field(constraints=pr.field % 2 == 0)


rows = st.fixed_dictionaries(
    {
        "uid": st.integers(min_value=0, max_value=30),
        "score": st.one_of(
            st.none(), st.floats(min_value=-50, max_value=150, allow_nan=False)
        ),
        "tag": st.sampled_from(["a", "b", "c", "d", "ZZ"]),
        "name": st.text(
            alphabet=st.characters(codec="ascii", categories=("L", "N")),
            min_size=0,
            max_size=12,
        ),
        "even": st.integers(min_value=-100, max_value=100),
    }
)


def _table(data: list[dict]) -> pa.Table:
    return pa.table(
        {
            "uid": pa.array([r["uid"] for r in data], type=pa.int64()),
            "score": pa.array([r["score"] for r in data], type=pa.float64()),
            "tag": pa.array([r["tag"] for r in data], type=pa.string()),
            "name": pa.array([r["name"] for r in data], type=pa.string()),
            "even": pa.array([r["even"] for r in data], type=pa.int64()),
        }
    )


def _canon(p: Partial) -> dict:
    return {
        "rows": p.row_count,
        "nulls": dict(p.null_counts),
        "bounds": dict(p.bounds_fail),
        "constraints": dict(p.constraint_fail),
        "enum": {k: frozenset(v) for k, v in p.enum_invalid.items()},
        "schema": frozenset(p.schema_errors),
    }


@settings(max_examples=60, deadline=None)
@given(data=st.lists(rows, min_size=1, max_size=40), cut=st.integers(0, 39))
def test_split_merge_equals_whole(data, cut):
    table = _table(data)
    spec = M._spec()
    whole = check_batch(table, spec, skip_unique=True)

    cut = min(cut, table.num_rows)
    parts = [
        check_batch(table.slice(0, cut), spec, skip_unique=True),
        check_batch(table.slice(cut), spec, skip_unique=True),
    ]
    merged_lr = merge_partials(list(parts))
    merged_rl = merge_partials(list(reversed(
        [
            check_batch(table.slice(0, cut), spec, skip_unique=True),
            check_batch(table.slice(cut), spec, skip_unique=True),
        ]
    )))
    assert _canon(merged_lr) == _canon(whole)
    assert _canon(merged_rl) == _canon(whole)  # commutativity


@settings(max_examples=40, deadline=None)
@given(
    keys=st.lists(st.integers(min_value=0, max_value=10), min_size=0, max_size=50),
    cut=st.integers(0, 49),
)
def test_bucket_blob_dup_count_matches_local(keys, cut):
    """The bucketed blob exchange must reproduce the reference's
    is_duplicated().sum() for any split of the key column."""
    from patito_ray.validation.checks import (
        batch_key_bucket_blobs,
        merge_bucket_blobs,
    )

    table = pa.table({"k": pa.array(keys, type=pa.int64())})
    expected = local_duplicate_count(table.column("k")) if keys else 0
    cut = min(cut, len(keys))
    blobs = []
    for part in (table.slice(0, cut), table.slice(cut)):
        if part.num_rows:
            blobs.append(batch_key_bucket_blobs(part, "k", num_buckets=4))
    if not blobs:
        return
    allb = pa.concat_tables(blobs)
    got = merge_bucket_blobs(allb).column("dups")[0].as_py()
    assert got == expected
