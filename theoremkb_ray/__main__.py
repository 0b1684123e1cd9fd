"""CLI driver — the reference's ``cli.py`` verb surface over the
Ray-Data engine (reference: Styling/src/cli.py:25-284 — register /
train / test / apply / bench / features).

    python -m theoremkb_ray apply    --corpus c.parquet --out store/
    python -m theoremkb_ray train    --granularity word --out-path m.npz
    python -m theoremkb_ray test     --corpus c.parquet --gold g.parquet
    python -m theoremkb_ray features --corpus c.parquet --out f/
    python -m theoremkb_ray export-csv --store store/ --out csv/
    python -m theoremkb_ray bench    --corpus c.parquet

The CLI owns its Ray session (init guarded, shutdown at exit); the
library never calls ``ray.init``.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _init_ray(num_cpus: int | None) -> bool:
    """Init Ray if nobody else owns a session; returns True when WE
    own it (and must shut it down) — an embedding process (pytest's
    session fixture) keeps its session."""
    import ray

    if ray.is_initialized():
        return False
    kwargs = {"address": "local", "include_dashboard": False}
    if num_cpus:
        kwargs["num_cpus"] = num_cpus
    ray.init(**kwargs, logging_level="ERROR")
    return True


def cmd_apply(args) -> int:
    """cli.py ``apply`` (Styling/src/cli.py:232-269): run a segmenter
    over the corpus and materialize the triple store."""
    import pyarrow.parquet as pq

    from .pipelines.kg import run_kg

    links = pq.read_table(args.links) if args.links else None
    summary = run_kg(
        args.corpus,
        args.out,
        links_tbl=links,
        segmenter=args.segmenter,
        canonicalize=not args.no_canonicalize,
        num_partitions=args.partitions,
        resume=not args.no_resume,
        results_checkpoint=args.checkpoint,
    )
    rows = sum(r["rows"] for r in summary.take_all())
    print(json.dumps({"out": args.out, "partitions_written": summary.count(),
                      "rows_written": rows}))
    return 0


def cmd_train(args) -> int:
    """cli.py ``train`` (Styling/src/cli.py:120-145): fit a tagger on
    the synthetic gold corpus (or a corpus+gold pair) and save it."""
    if args.granularity == "word":
        from .stages.words import train_word_crf

        _, acc = train_word_crf(
            num_docs=args.num_docs, seed=args.seed, epochs=args.epochs,
            out_path=args.out_path,
        )
    else:
        from .stages.crf import train_crf

        _, acc = train_crf(
            num_docs=args.num_docs, seed=args.seed, epochs=args.epochs,
            out_path=args.out_path,
        )
    print(json.dumps({"granularity": args.granularity,
                      "held_out_accuracy": round(acc, 4),
                      "artifact": args.out_path}))
    return 0 if acc >= 0.95 else 1


def cmd_test(args) -> int:
    """cli.py ``test`` (Styling/src/cli.py:148-198): per-label P/R/F1
    classification report vs gold spans."""
    import pyarrow.parquet as pq

    from .sources.corpus import read_corpus
    from .stages.ingest import ingest
    from .stages.tokenize import tokenize

    ds = tokenize(ingest(read_corpus(args.corpus)))
    gold = pq.read_table(args.gold)
    if args.granularity == "word":
        from .stages.words import word_classification_report

        rep = word_classification_report(ds, gold)
    else:
        from .stages.agreement import classification_report
        from .stages.crf import segment_crf

        rep = classification_report(segment_crf(ds), gold)
    print(rep.to_string(index=False))
    return 0


def cmd_features(args) -> int:
    """cli.py ``features`` (Styling/src/cli.py:214-229): materialize
    the per-line feature table for a corpus as parquet."""
    import numpy as np
    import pyarrow as pa

    from .sources.corpus import read_corpus
    from .stages.crf import N_FEATS, feature_matrix
    from .stages.ingest import ingest
    from .stages.tokenize import explode_lines, tokenize

    def featurize(b: pa.Table) -> pa.Table:
        flat, off = explode_lines(b["lines"])
        X = feature_matrix(flat, off)
        lengths = np.diff(off)
        doc_idx = np.repeat(np.arange(b.num_rows), lengths)
        docs = np.asarray(b["doc_id"].to_pylist(), dtype=object)[doc_idx]
        line_no = np.arange(int(off[-1])) - off[:-1][doc_idx]
        cols = {
            "doc_id": pa.array(docs, pa.string()),
            "line": pa.array(line_no, pa.int64()),
        }
        for j in range(N_FEATS):
            cols[f"f{j:02d}"] = pa.array(X[:, j])
        return pa.table(cols)

    ds = tokenize(ingest(read_corpus(args.corpus)))
    out = ds.map_batches(featurize, batch_format="pyarrow")
    out.write_parquet(args.out)
    print(json.dumps({"out": args.out, "rows": out.count()}))
    return 0


def cmd_export_csv(args) -> int:
    """Graph-table CSV export in the reference's output shape
    (extract_graph.py:298-307)."""
    from .sources.sinks import export_graph_csv

    counts = export_graph_csv(args.store, args.out)
    print(json.dumps(counts))
    return 0


def cmd_serve(args) -> int:
    """Read-only REST serving over a triple store (server.py analog);
    blocks until interrupted."""
    from .serve import TripleStoreServer

    srv = TripleStoreServer(args.store, host=args.host, port=args.port)
    srv.start()
    print(json.dumps({"serving": srv.url, "store": args.store}), flush=True)
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        srv.stop()
    return 0


def cmd_bench(args) -> int:
    """cli.py ``bench`` (Styling/src/cli.py:272-284) — but measuring
    the full pipeline, not one extractor on one paper."""
    from .pipelines.kg import triples_dataset
    from .sources.corpus import read_corpus

    t0 = time.perf_counter()
    n = triples_dataset(
        read_corpus(args.corpus), segmenter=args.segmenter,
        canonicalize=not args.no_canonicalize,
    ).count()
    dt = time.perf_counter() - t0
    print(json.dumps({"triples": n, "sec": round(dt, 2),
                      "triples_per_sec": round(n / dt, 1)}))
    return 0


def cmd_delta(args) -> int:
    """Incremental ingest (pipelines/delta.py): append the corpus'
    NEW documents to an existing store as a delta segment."""
    import pyarrow.parquet as pq

    from .pipelines.delta import record_processed, run_kg_delta
    from .sources.corpus import read_corpus

    if args.record_base:
        run_dir = record_processed(read_corpus(args.corpus), args.store)
        print(json.dumps({"recorded": run_dir}))
        return 0
    links = pq.read_table(args.links) if args.links else None
    res = run_kg_delta(
        args.corpus,
        args.store,
        links_tbl=links,
        segmenter=args.segmenter,
        canonicalize=not args.no_canonicalize,
    )
    print(json.dumps(res))
    return 0


def cmd_build_corpus(args) -> int:
    """Composed LLM corpus build (pipelines/corpus_build.py)."""
    from .pipelines.corpus_build import run_corpus_build

    quotas = json.loads(args.quotas) if args.quotas else None
    langs = args.langs.split(",") if args.langs else None
    rep = run_corpus_build(
        args.docs,
        out_dir=args.out,
        quality_min=args.quality_min,
        langs=langs,
        quotas=quotas,
        num_shards=args.shards,
        report=not args.no_report,
    )
    print(rep.to_json(orient="records"))
    return 0


def cmd_watch(args) -> int:
    """Micro-batch continuous ingestion (pipelines/stream.py)."""
    from .pipelines.stream import watch_and_ingest

    log = watch_and_ingest(
        args.watch_dir,
        args.store,
        poll_interval=args.poll,
        max_rounds=args.max_rounds,
        stop_after_idle=args.stop_after_idle,
        segmenter=args.segmenter,
        canonicalize=not args.no_canonicalize,
    )
    print(log.to_json(orient="records"))
    return 0


def cmd_validate(args) -> int:
    """Declarative expectations over a parquet table
    (stages/validate.py); exit 1 when any rule fails."""
    import ray.data as rd

    from .stages.validate import ValidationError, validate

    rules = json.loads(open(args.rules).read())
    ds = rd.read_parquet(args.table)
    try:
        rep = validate(
            ds, rules, mode="raise" if args.strict else "report"
        )
    except ValidationError as e:
        print(json.dumps({"ok": False, "error": str(e)}))
        return 1
    print(rep.to_json(orient="records"))
    return 0


def cmd_wds_export(args) -> int:
    """Binary-payload parquet -> WebDataset tar shards
    (sources/webdataset.py); prints the per-shard summary."""
    import ray.data as rd

    from .sources.webdataset import write_webdataset

    ds = rd.read_parquet(args.table)
    summary = write_webdataset(
        ds,
        args.out,
        key_col=args.key_col,
        payload_col=args.payload_col,
        num_shards=args.shards,
    )
    print(summary.to_json(orient="records"))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="theoremkb_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    ap = sub.add_parser("apply", help="corpus parquet -> triple store")
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--links", default=None)
    ap.add_argument("--segmenter", default="crf",
                    choices=["crf", "word", "naive"])
    ap.add_argument("--partitions", type=int, default=32)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--no-canonicalize", action="store_true")
    ap.add_argument("--no-resume", action="store_true")
    ap.set_defaults(fn=cmd_apply)

    tp = sub.add_parser("train", help="fit + save a tagger artifact")
    tp.add_argument("--granularity", default="line", choices=["line", "word"])
    tp.add_argument("--num-docs", type=int, default=250)
    tp.add_argument("--seed", type=int, default=7)
    tp.add_argument("--epochs", type=int, default=8)
    tp.add_argument("--out-path", required=True)
    tp.set_defaults(fn=cmd_train)

    sp = sub.add_parser("test", help="P/R/F1 report vs gold spans")
    sp.add_argument("--corpus", required=True)
    sp.add_argument("--gold", required=True)
    sp.add_argument("--granularity", default="line", choices=["line", "word"])
    sp.set_defaults(fn=cmd_test)

    fp = sub.add_parser("features", help="materialize line features")
    fp.add_argument("--corpus", required=True)
    fp.add_argument("--out", required=True)
    fp.set_defaults(fn=cmd_features)

    ep = sub.add_parser("export-csv", help="reference-shape graph CSVs")
    ep.add_argument("--store", required=True)
    ep.add_argument("--out", required=True)
    ep.set_defaults(fn=cmd_export_csv)

    vp = sub.add_parser("serve", help="REST serving over a triple store")
    vp.add_argument("--store", required=True)
    vp.add_argument("--host", default="127.0.0.1")
    vp.add_argument("--port", type=int, default=8000)
    vp.set_defaults(fn=cmd_serve)

    dp = sub.add_parser(
        "delta", help="append new docs to an existing store"
    )
    dp.add_argument("--corpus", required=True)
    dp.add_argument("--store", required=True)
    dp.add_argument("--links")
    dp.add_argument("--segmenter", default="crf")
    dp.add_argument("--no-canonicalize", action="store_true")
    dp.add_argument(
        "--record-base",
        action="store_true",
        help="only record this corpus as already-processed (seed the "
        "sidecar for a store built by `apply`)",
    )
    dp.set_defaults(fn=cmd_delta)

    cb = sub.add_parser(
        "build-corpus", help="composed LLM corpus curation chain"
    )
    cb.add_argument("--docs", required=True)
    cb.add_argument("--out")
    cb.add_argument("--quality-min", type=float, default=0.2)
    cb.add_argument("--langs", help="comma-separated lang allowlist")
    cb.add_argument("--quotas", help='JSON dict, e.g. {"en": 100}')
    cb.add_argument("--shards", type=int, default=16)
    cb.add_argument("--no-report", action="store_true")
    cb.set_defaults(fn=cmd_build_corpus)

    wp = sub.add_parser(
        "watch", help="micro-batch continuous ingestion from a directory"
    )
    wp.add_argument("--watch-dir", required=True)
    wp.add_argument("--store", required=True)
    wp.add_argument("--poll", type=float, default=5.0)
    wp.add_argument("--max-rounds", type=int)
    wp.add_argument("--stop-after-idle", type=int, default=2)
    wp.add_argument("--segmenter", default="crf")
    wp.add_argument("--no-canonicalize", action="store_true")
    wp.set_defaults(fn=cmd_watch)

    vv = sub.add_parser(
        "validate", help="data-quality expectations over a parquet table"
    )
    vv.add_argument("--table", required=True)
    vv.add_argument("--rules", required=True, help="JSON rule list")
    vv.add_argument("--strict", action="store_true")
    vv.set_defaults(fn=cmd_validate)

    wd = sub.add_parser(
        "wds-export",
        help="binary-payload parquet -> WebDataset tar shards",
    )
    wd.add_argument("table", help="parquet file/dir of binary rows")
    wd.add_argument("out", help="output shard directory")
    wd.add_argument("--key-col", default="media_id")
    wd.add_argument("--payload-col", default="payload")
    wd.add_argument("--shards", type=int, default=8)
    wd.set_defaults(fn=cmd_wds_export)

    bp = sub.add_parser("bench", help="time the triple pipeline")
    bp.add_argument("--corpus", required=True)
    bp.add_argument("--segmenter", default="crf",
                    choices=["crf", "word", "naive"])
    bp.add_argument("--no-canonicalize", action="store_true")
    bp.set_defaults(fn=cmd_bench)

    args = p.parse_args(argv)
    own = _init_ray(args.num_cpus)
    try:
        return args.fn(args)
    finally:
        if own:
            import ray

            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
