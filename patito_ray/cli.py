"""Operational entry point — what a ``ray job submit`` would invoke.

The north rule runs validation "via ray job submit on a fixed-size
multi-node Ray cluster"; this CLI is that job script. On a cluster the
same command runs under ``ray job submit -- python -m patito_ray ...``
(ray.init() there attaches to the cluster; here it starts local mode).

Models come from the built-in registry or from a JSON TableSpec
manifest (``manifest.py`` round-trip) — the compiled constraint IR is
the deployment artifact, no Python model class needed at the job site.

Commands:
  validate  --input GLOB --model NAME|spec.json [--checkpoint DIR]
            [--stats] [--violations DIR] [--files-per-shard N]
  profile   --input GLOB [--columns a,b,c]
  dedup     --input GLOB [--text-col text] [--id-col doc_id] [--near [--threshold 0.8]] --output DIR
  infer     --input GLOB --output spec.json [--name Inferred] [--enum-max 20]
  quarantine --input GLOB --model NAME|spec.json --valid DIR --bad DIR
"""

from __future__ import annotations

import argparse
import glob
import json
import sys
from typing import Any


def _resolve_model(name: str) -> Any:
    if name == "webpage":
        from patito_ray.pipelines.webpage import WebPage

        return WebPage
    if name.endswith(".json"):
        from patito_ray.manifest import spec_from_json
        from patito_ray.model import Model

        with open(name) as f:
            spec = spec_from_json(f.read())

        shim = type(spec.model_name, (Model,), {"__annotations__": {}})
        shim._compiled_spec = spec
        return shim
    raise SystemExit(f"unknown model {name!r}: use 'webpage' or a spec .json path")


def _init_ray(num_cpus: int | None) -> None:
    import ray

    if not ray.is_initialized():
        kwargs: dict[str, Any] = {
            "include_dashboard": False,
            "ignore_reinit_error": True,
            "logging_level": "ERROR",
        }
        if num_cpus:
            kwargs.update(address="local", num_cpus=num_cpus)
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def cmd_validate(args: argparse.Namespace) -> int:
    _init_ray(args.num_cpus)
    import ray.data as rd

    model = _resolve_model(args.model)
    files = sorted(glob.glob(args.input))
    if not files:
        raise SystemExit(f"no files match {args.input!r}")

    if args.checkpoint:
        from patito_ray.validation.checkpoint import validate_files_checkpointed

        report = validate_files_checkpointed(
            files,
            model,
            args.checkpoint,
            files_per_shard=args.files_per_shard,
            collect_stats=args.stats,
        )
    else:
        import patito_ray as pr

        ds = rd.read_parquet(files)
        report = pr.validate_report(ds, model)

    if args.violations:
        from patito_ray.validation.violations import write_violations

        counts = write_violations(rd.read_parquet(files), model, args.violations)
        print(json.dumps({"violation_rows": counts}), file=sys.stderr)

    out = {
        "model": report.model_name,
        "rows": report.row_count,
        "ok": report.ok,
        "errors": report.errors,
    }
    if report.column_stats:
        out["column_stats"] = report.column_stats
    print(json.dumps(out, default=str))
    return 0 if report.ok else 1


def cmd_profile(args: argparse.Namespace) -> int:
    _init_ray(args.num_cpus)
    import ray.data as rd

    from patito_ray.validation.stats import column_stats

    files = sorted(glob.glob(args.input))
    cols = args.columns.split(",") if args.columns else None
    stats = column_stats(rd.read_parquet(files, columns=cols))
    if args.heavy_hitters:
        import pickle

        import pyarrow as pa

        from patito_ray.state.sketches import MisraGries

        hh_cols = args.heavy_hitters.split(",")
        cap = args.hh_capacity

        def delta(batch: "pa.Table") -> "pa.Table":
            # ONE scan covers every requested column: per-batch deltas
            # for all of them ride in a single pickled row
            mgs = {}
            for col in hh_cols:
                mg = MisraGries(cap)
                mg.add(batch.column(col))
                mgs[col] = mg
            return pa.table({"mg": pa.array([pickle.dumps(mgs)], type=pa.binary())})

        accs = {col: MisraGries(cap) for col in hh_cols}
        for row in (
            rd.read_parquet(files, columns=hh_cols)
            .map_batches(delta, batch_format="pyarrow", batch_size=None)
            .take_all()
        ):
            for col, mg in pickle.loads(row["mg"]).items():
                accs[col].merge(mg)
        for col, mg in accs.items():
            stats.setdefault(col, {})["heavy_hitters"] = {
                "items": mg.items()[:20],
                "error_bound": mg.error_bound(),
            }
    print(json.dumps(stats, default=str))
    return 0


def cmd_dedup(args: argparse.Namespace) -> int:
    _init_ray(args.num_cpus)
    import ray.data as rd

    from patito_ray.functions.dedup import dedup_exact, dedup_near

    files = sorted(glob.glob(args.input))
    import os

    if os.path.isdir(args.output) and os.listdir(args.output):
        print(
            f"error: output dir {args.output!r} is not empty — parquet "
            "writes APPEND, so a rerun would mix two corpora; point at a "
            "fresh directory or clear it first",
            file=sys.stderr,
        )
        return 2
    ds = rd.read_parquet(files)
    before = ds.count()
    if args.near:
        out = dedup_near(
            ds,
            text_col=args.text_col,
            id_col=args.id_col,
            threshold=args.threshold,
        )
    else:
        out = dedup_exact(ds, text_col=args.text_col, id_col=args.id_col)
    out.write_parquet(args.output)
    after = rd.read_parquet(args.output).count()
    print(
        json.dumps(
            {
                "mode": "near" if args.near else "exact",
                "rows_in": before,
                "rows_out": after,
                "output": args.output,
            }
        )
    )
    return 0


def cmd_infer(args: argparse.Namespace) -> int:
    _init_ray(args.num_cpus)

    from patito_ray.manifest import spec_to_json
    from patito_ray.sources.readers import clean_read_parquet
    from patito_ray.validation.infer import infer_model

    files = sorted(glob.glob(args.input))
    model, info = infer_model(
        clean_read_parquet(files), name=args.name, enum_max=args.enum_max
    )
    with open(args.output, "w") as f:
        f.write(spec_to_json(model._spec()))
    print(
        json.dumps(
            {
                "spec": args.output,
                "columns": len(info["profile"]),
                "rows": next(iter(info["profile"].values()))["n"],
                "unique_candidates": info["unique_candidates"],
            }
        )
    )
    return 0


def cmd_quarantine(args: argparse.Namespace) -> int:
    _init_ray(args.num_cpus)

    from patito_ray.sources.readers import clean_read_parquet
    from patito_ray.validation.violations import quarantine_split_write

    files = sorted(glob.glob(args.input))
    counts = quarantine_split_write(
        clean_read_parquet(files), _resolve_model(args.model), args.valid, args.bad
    )
    print(json.dumps(counts))
    return 0


def cmd_index(args: argparse.Namespace) -> int:
    from patito_ray.state.keyindex import (
        create_key_index,
        key_index_size,
        key_index_update,
    )

    if args.action == "create":
        create_key_index(args.dir, num_buckets=args.buckets, overwrite=args.overwrite)
        print(json.dumps(key_index_size(args.dir)))
        return 0
    if args.action == "stats":
        print(json.dumps(key_index_size(args.dir)))
        return 0
    # update / check need data + a Ray session
    _init_ray(args.num_cpus)
    from patito_ray.sources.readers import clean_read_parquet

    files = sorted(glob.glob(args.input))
    if not files:
        print(json.dumps({"error": f"no files match {args.input!r}"}))
        return 2
    summary = key_index_update(
        clean_read_parquet(files, columns=[args.key_col]),
        args.key_col,
        args.dir,
        fold=(args.action == "update"),
    )
    print(json.dumps(summary.to_pylist()[0]))
    return 0


def cmd_verdicts(args: argparse.Namespace) -> int:
    """Per-partition pass/fail table from a checkpoint dir (no Ray
    session needed — reads manifests only)."""
    from patito_ray.validation.checkpoint import shard_verdicts

    t = shard_verdicts(args.checkpoint)
    for row in t.to_pylist():
        print(json.dumps(row))
    return 0 if all(r or r is None for r in t.column("ok").to_pylist()) else 1


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="patito_ray")
    sub = parser.add_subparsers(dest="command", required=True)

    v = sub.add_parser("validate", help="validate parquet files against a model")
    v.add_argument("--input", required=True, help="glob of parquet files")
    v.add_argument("--model", required=True, help="'webpage' or a spec .json")
    v.add_argument("--checkpoint", help="checkpoint dir (enables resume)")
    v.add_argument("--stats", action="store_true", help="collect column sketches")
    v.add_argument("--violations", help="write violation rows to this dir")
    v.add_argument("--files-per-shard", type=int, default=8)
    v.add_argument("--num-cpus", type=int, default=None)
    v.set_defaults(fn=cmd_validate)

    p = sub.add_parser("profile", help="column statistics (HLL/t-digest)")
    p.add_argument("--input", required=True)
    p.add_argument("--columns", default=None)
    p.add_argument(
        "--heavy-hitters",
        default=None,
        help="comma-separated columns to summarize with the Misra-Gries "
        "frequent-items sketch (skew diagnostics)",
    )
    p.add_argument("--hh-capacity", type=int, default=64)
    p.add_argument("--num-cpus", type=int, default=None)
    p.set_defaults(fn=cmd_profile)

    d = sub.add_parser("dedup", help="exact or near (MinHash-LSH) dedup to an output dir")
    d.add_argument("--input", required=True)
    d.add_argument("--text-col", default="text")
    d.add_argument("--id-col", default="doc_id")
    d.add_argument("--output", required=True)
    d.add_argument("--near", action="store_true", help="MinHash-LSH near-dup removal")
    d.add_argument("--threshold", type=float, default=0.8, help="near-dup jaccard threshold")
    d.add_argument("--num-cpus", type=int, default=None)
    d.set_defaults(fn=cmd_dedup)

    i = sub.add_parser("infer", help="scaffold a model spec (data contract) from data")
    i.add_argument("--input", required=True)
    i.add_argument("--output", required=True, help="spec .json to write")
    i.add_argument("--name", default="Inferred")
    i.add_argument("--enum-max", type=int, default=20)
    i.add_argument("--num-cpus", type=int, default=None)
    i.set_defaults(fn=cmd_infer)

    q = sub.add_parser(
        "quarantine", help="single-pass split: valid rows one dir, violations+reasons another"
    )
    q.add_argument("--input", required=True)
    q.add_argument("--model", required=True, help="'webpage' or a spec .json")
    q.add_argument("--valid", required=True)
    q.add_argument("--bad", required=True)
    q.add_argument("--num-cpus", type=int, default=None)
    q.set_defaults(fn=cmd_quarantine)

    k = sub.add_parser(
        "index",
        help="persisted cross-run uniqueness index: create / update "
        "(check + fold) / check (read-only) / stats",
    )
    k.add_argument("action", choices=["create", "update", "check", "stats"])
    k.add_argument("--dir", required=True, help="index directory")
    k.add_argument("--input", help="glob of parquet files (update/check)")
    k.add_argument("--key-col", default="url")
    k.add_argument("--buckets", type=int, default=64)
    k.add_argument("--overwrite", action="store_true")
    k.add_argument("--num-cpus", type=int, default=None)
    k.set_defaults(fn=cmd_index)

    w = sub.add_parser(
        "verdicts",
        help="per-partition pass/fail verdict table from a checkpoint "
        "dir (exit 1 if any shard failed its local checks)",
    )
    w.add_argument("checkpoint", help="checkpoint directory")
    w.set_defaults(fn=cmd_verdicts)

    args = parser.parse_args(argv)
    code = args.fn(args)
    import ray

    if ray.is_initialized():
        ray.shutdown()
    return code


if __name__ == "__main__":
    sys.exit(main())
