"""CLI entry points — the standalone-stage-mains parity surface (SURVEY §2.9;
each reference builder module has its own main()).

Usage (each owns its Ray session, like the reference's standalone mains):

    python -m clangd_to_neo4j_ray build --pages DIR --out DIR [--neo4j-csv]
    python -m clangd_to_neo4j_ray incremental --pages DIR --work DIR --out DIR
    python -m clangd_to_neo4j_ray enrich --pages DIR --work DIR
    python -m clangd_to_neo4j_ray gen-fixture --out DIR --pages N [--dense]
    python -m clangd_to_neo4j_ray query NAME [--sf-dir DIR] [--limit K]
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_session(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from .context import tune_data_context

    tune_data_context()


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="clangd_to_neo4j_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="full pages->KG build")
    b.add_argument("--pages", required=True)
    b.add_argument("--out", required=True)
    b.add_argument("--neo4j-csv", action="store_true")
    b.add_argument(
        "--format",
        choices=["parquet", "warc"],
        default="parquet",
        help="pages source format (warc = Common-Crawl-native records)",
    )

    i = sub.add_parser("incremental", help="checkpointed/incremental build")
    i.add_argument("--pages", required=True)
    i.add_argument("--work", required=True)
    i.add_argument("--out", required=True)

    e = sub.add_parser(
        "enrich", help="dirty-scope incremental enrichment (summaries+rollups)"
    )
    e.add_argument("--pages", required=True)
    e.add_argument("--work", required=True)

    g = sub.add_parser("gen-fixture", help="deterministic pages corpus")
    g.add_argument("--out", required=True)
    g.add_argument("--pages", type=int, default=10000)
    g.add_argument("--dense", action="store_true")

    q = sub.add_parser("query", help="run a registered query")
    q.add_argument("name")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    q.add_argument("--limit", type=int, default=20)

    args = p.parse_args(argv)
    _ray_session(args.num_cpus)
    import ray

    try:
        if args.cmd == "build":
            from .pipelines.build_graph import build_graph
            from .sources.fixtures import make_entities

            manifest = build_graph(
                args.pages, make_entities(), args.out,
                write_neo4j_csv=args.neo4j_csv,
                source_format=args.format,
            )
            print(json.dumps(manifest, indent=2))
        elif args.cmd == "incremental":
            from .pipelines.incremental import incremental_build
            from .sources.fixtures import make_entities

            r = incremental_build(args.pages, make_entities(), args.work, args.out)
            print(json.dumps({"stage1": r["stage1"]}, indent=2))
        elif args.cmd == "enrich":
            from .pipelines.enrich import incremental_enrich

            r = incremental_enrich(args.pages, args.work)
            print(
                json.dumps(
                    {
                        "stage1": r["stage1"],
                        "rollups": r["rollups"],
                        "project": {"summary": r["project"]["summary"]},
                    },
                    indent=2,
                )
            )
        elif args.cmd == "gen-fixture":
            from .sources.fixtures import generate_pages_sharded

            out = generate_pages_sharded(
                args.pages, args.out,
                sent_range=(20, 40) if args.dense else (2, 6),
            )
            print(out)
        elif args.cmd == "query":
            from .queries import QUERIES

            if args.name not in QUERIES:
                print(f"unknown query {args.name}; known: {sorted(QUERIES)}")
                return 2
            r = QUERIES[args.name](args.sf_dir)
            df = r.to_pandas() if hasattr(r, "to_pandas") else r
            print(df.head(args.limit).to_string())
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
