#!/usr/bin/env python
"""Model registry CLI (reference: scripts/model_registry.py:96-290):
register / list / get / promote / compare / latest-pointer / sync."""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="model_registry")
    parser.add_argument("--registry", default="artifacts/registry.json")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("register")
    p.add_argument("--name", required=True)
    p.add_argument("--model-dir", required=True)
    p.add_argument("--metrics", default=None, help="JSON string or file path")
    p.add_argument("--latency-probe", action="store_true")

    p = sub.add_parser("list")

    p = sub.add_parser("get")
    p.add_argument("--name", required=True)
    p.add_argument("--version", default=None)

    p = sub.add_parser("promote")
    p.add_argument("--name", required=True)
    p.add_argument("--version", default=None)

    p = sub.add_parser("compare")
    p.add_argument("--name", required=True)
    p.add_argument("--versions", nargs=2, required=True)

    p = sub.add_parser("latest")
    p.add_argument("--out", required=True)

    p = sub.add_parser("sync")
    p.add_argument("--name", required=True)
    p.add_argument("--remote-dir", required=True)
    p.add_argument("--version", default=None)

    args = parser.parse_args(argv)

    from sskd_tpu.registry import ModelRegistry

    reg = ModelRegistry(args.registry)
    if args.cmd == "register":
        metrics = None
        if args.metrics:
            if Path(args.metrics).exists():
                metrics = json.loads(Path(args.metrics).read_text())
            else:
                metrics = json.loads(args.metrics)
        card = reg.register(
            args.name, args.model_dir, metrics=metrics, latency_probe=args.latency_probe
        )
        print(json.dumps(card, indent=2))
    elif args.cmd == "list":
        print(json.dumps(reg.list_models(), indent=2))
    elif args.cmd == "get":
        print(json.dumps(reg.get(args.name, args.version), indent=2))
    elif args.cmd == "promote":
        print(json.dumps(reg.promote(args.name, args.version), indent=2))
    elif args.cmd == "compare":
        print(json.dumps(reg.compare(args.name, *args.versions), indent=2))
    elif args.cmd == "latest":
        reg.write_latest_pointer(args.out)
        print(f"wrote {args.out}")
    elif args.cmd == "sync":
        dest = reg.sync_to(args.remote_dir, args.name, args.version)
        print(f"synced to {dest}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
