"""Deterministic synthetic data generation.

Two generators:

1. ``ray_examples(model, n)`` — the distributed version of the
   reference's ``Model.examples()`` dummy-frame builder
   (/root/reference/src/patito/pydantic.py:786-884):
   ``ray.data.range(n)`` -> ``map_batches`` filling each column from
   the compiled spec; unique columns take the global range index
   (the distributed equivalent of the reference's 0,1,2,... cum_count
   sequence).

2. ``webpage_batch(indices)`` — the Common-Crawl-style web-page table
   from BASELINE.json's input_hint (url, warc_ts, html, text, lang),
   synthesized deterministically from the row index with a splitmix64
   mix so every value — in particular ``text`` — is *byte-identical
   per url* across runs, processes and engines (the per-row invariant
   the north rule demands). Vectorized numpy throughout; no RNG state.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa

from patito_ray.model import Model, _example_value

LANGS = ["en", "de", "fr", "es", "it", "pt", "nl", "sv"]
_WORDS = np.array(
    "the of and to in is was for on that with as his they at be this from have "
    "or by one had not but what all were when we there can an your which their "
    "said if will each about how up out them then she many some so these would "
    "other into has more her two like him see time could no make than first been "
    "its who now people my made over did down only way find use may water long "
    "little very after words called just where most know".split()
)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mix (public splitmix64 constants)."""
    z = (x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    return z ^ (z >> np.uint64(31))


def _mix(indices: np.ndarray, salt: int) -> np.ndarray:
    salted = (salt * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    return _splitmix64(indices.astype(np.uint64) ^ np.uint64(salted))


def page_text(i: int) -> str:
    """The reference text for row index ``i`` — the per-row oracle used
    to assert byte-identical extraction. Must stay in lockstep with
    ``page_texts`` (the vectorized batch version)."""
    h = _mix(np.array([i], dtype=np.uint64), 3)[0]
    # NB: divisors must be uint64 — numpy silently casts uint64 % int to
    # lossy float64, which corrupts the modulo for large hashes
    n_words = 5 + int(h % np.uint64(40))
    idx = _mix(np.arange(n_words, dtype=np.uint64) + np.uint64(i) * np.uint64(1000003), 4)
    words = _WORDS[(idx % np.uint64(len(_WORDS))).astype(np.int64)]
    return f"Document {i}. " + " ".join(words.tolist())


def page_texts(idx: np.ndarray) -> list[str]:
    """Vectorized batch text generation, byte-identical to
    ``page_text(i)`` for every i: word hashes for ALL rows computed in
    one flattened mix, only the final string join is per-row."""
    idx = idx.astype(np.uint64)
    h = _mix(idx, 3)
    n_words = (5 + (h % np.uint64(40)).astype(np.int64))
    total = int(n_words.sum())
    if total == 0:
        return []
    rows = np.repeat(np.arange(len(idx)), n_words)
    offsets = np.concatenate([[0], np.cumsum(n_words)[:-1]])
    pos = np.arange(total, dtype=np.int64) - offsets[rows]
    word_seed = pos.astype(np.uint64) + idx[rows] * np.uint64(1000003)
    widx = _mix(word_seed, 4)
    words = _WORDS[(widx % np.uint64(len(_WORDS))).astype(np.int64)]
    out: list[str] = []
    ends = np.cumsum(n_words)
    starts = ends - n_words
    ints = idx.astype(np.int64).tolist()
    wl = words.tolist()
    for k in range(len(idx)):
        out.append(f"Document {ints[k]}. " + " ".join(wl[starts[k] : ends[k]]))
    return out


#: bump when webpage_batch's output changes — keys the bench corpus
#: cache so a stale /tmp corpus never mixes generator generations
CORPUS_VERSION = 2


def page_markup_html(i: int, text: str) -> str:
    """Real-markup html for row ``i`` whose parser-extracted text is
    BYTE-IDENTICAL to ``text``: nested head/style, an h1/p split of the
    text, the first body character encoded as a numeric charref (so
    entity decoding is exercised), and a script block that must be
    dropped. ``extract_html_text`` on this document returns ``text``
    exactly (whitespace between tags collapses under the RE2-ASCII
    normalizer)."""
    head, rest = text.split(". ", 1)
    enc = f"&#{ord(rest[0])};" + rest[1:]
    return (
        f"<html><head><style>p{{margin:0}}</style></head><body>\n"
        f"<h1>{head}.</h1>\n<p>{enc}</p>\n<script>var q={i};</script>\n"
        f"</body></html>"
    )


def webpage_batch(
    indices: np.ndarray,
    hot_domain_fraction: float = 0.1,
) -> pa.Table:
    """Build web-page rows for the given global row indices.

    Skew by construction: ``hot_domain_fraction`` of rows live on one
    hot domain (the hot-key case the uniqueness shuffle must survive);
    urls remain globally unique because the path embeds the row index.
    """
    idx = indices.astype(np.int64)
    h1 = _mix(idx.astype(np.uint64), 1)
    h2 = _mix(idx.astype(np.uint64), 2)

    hot = (h1 % np.uint64(1000)) < np.uint64(int(hot_domain_fraction * 1000))
    site_id = (h2 % np.uint64(10000)).astype(np.int64)
    domains = np.where(hot, "hot.example.com", None).astype(object)
    cold = ~hot
    cold_ids = site_id[cold]
    domains[cold] = np.char.add(
        np.char.add("site-", cold_ids.astype(str)), ".example.org"
    ).astype(object)

    urls = [
        f"https://{d}/page/{i}" for d, i in zip(domains.tolist(), idx.tolist())
    ]

    # warc_ts: 2013-01-01 .. ~2024 in microseconds
    base = np.int64(1356998400) * np.int64(1_000_000)
    span = np.int64(370_000_000) * np.int64(1_000_000)
    ts = base + (_mix(idx.astype(np.uint64), 5) % span.astype(np.uint64)).astype(np.int64)

    texts = page_texts(idx)
    htmls: list[bytes | None] = []
    h3 = _mix(idx.astype(np.uint64), 6)
    r100 = h3 % np.uint64(100)
    null_html = r100 < np.uint64(5)  # 5% missing html
    # 2% real markup (nested tags, entities, script/style) so the
    # flagship invariant exercises the actual html.parser extraction
    # branch, not just the vectorized wrapper strip
    marked = (r100 >= np.uint64(5)) & (r100 < np.uint64(7))
    for t, missing, m, i in zip(
        texts, null_html.tolist(), marked.tolist(), idx.tolist()
    ):
        if missing:
            htmls.append(None)
        elif m:
            htmls.append(page_markup_html(i, t).encode())
        else:
            htmls.append(b"<html><body>" + t.encode() + b"</body></html>")

    langs = [LANGS[int(v)] for v in (h2 % np.uint64(len(LANGS))).tolist()]

    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(ts, type=pa.timestamp("us")),
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(langs, type=pa.string()),
        }
    )


def corrupt_webpages(
    table: pa.Table,
    duplicate_urls: int = 0,
    bad_lang: int = 0,
    null_text: int = 0,
    bad_url: int = 0,
) -> pa.Table:
    """Inject violation classes for negative tests (FIXTURES.md F0)."""
    d = table.to_pydict()
    n = len(d["url"])
    # disjoint index ranges so one corruption never undoes another
    for k in range(min(duplicate_urls, n // 4)):
        d["url"][n - 1 - k] = d["url"][k]
    for k in range(min(bad_lang, n // 4)):
        d["lang"][n // 4 + k] = "zz"
    for k in range(min(null_text, n // 4)):
        d["text"][n // 2 + k] = None
    for k in range(min(bad_url, n // 4)):
        d["url"][n // 4 + k] = f"ftp://not-a-web-url/{k}"
    return pa.table(
        {name: pa.array(d[name], type=table.schema.field(name).type) for name in table.column_names}
    )


def webpage_table(n: int, offset: int = 0) -> pa.Table:
    return webpage_batch(np.arange(offset, offset + n, dtype=np.int64))


def ray_webpages(n: int, blocks: int | None = None) -> Any:
    """Distributed deterministic web-page Dataset: range -> map_batches."""
    import ray.data as rd

    ds = rd.range(n, override_num_blocks=blocks) if blocks else rd.range(n)
    return ds.map_batches(
        lambda b: webpage_batch(np.asarray(b["id"])),
        batch_format="numpy",
        batch_size=None,
    )


def write_webpages(path: str, n: int, blocks: int = 8) -> str:
    """Materialize a deterministic web-page parquet directory (bench and
    test input; resumable layout = one file per block)."""
    ray_webpages(n, blocks=blocks).write_parquet(path)
    return path


def ray_examples(model: type[Model], n: int, blocks: int | None = None) -> Any:
    """Distributed Model.examples(): dummy values per spec, unique
    columns = global range index (reference cum_count semantics at
    cluster scale, SURVEY.md §2c S8)."""
    import ray.data as rd

    spec = model._spec()
    consts: dict[str, Any] = {}
    uniques: list[str] = []
    for name, cs in spec.columns.items():
        if cs.unique:
            uniques.append(name)
        else:
            consts[name] = _example_value(cs)

    def fill(batch: dict[str, np.ndarray]) -> pa.Table:
        from patito_ray.model import _unique_value

        ids = batch["id"]
        height = len(ids)
        arrays: dict[str, pa.Array] = {}
        for name, cs in spec.columns.items():
            if name in uniques:
                import pyarrow.types as pt

                if cs.default_dtype is not None and pt.is_integer(
                    cs.default_dtype
                ):
                    arrays[name] = pa.array(ids, type=cs.default_dtype)
                else:
                    # non-integer unique columns (str/date/...): the
                    # type-appropriate sequence keyed by the GLOBAL id
                    arrays[name] = pa.array(
                        [_unique_value(cs, int(i)) for i in ids],
                        type=cs.default_dtype,
                    )
            else:
                arrays[name] = pa.array([consts[name]] * height, type=cs.default_dtype)
        return pa.table(arrays)

    ds = rd.range(n, override_num_blocks=blocks) if blocks else rd.range(n)
    return ds.map_batches(fill, batch_format="numpy", batch_size=None)
