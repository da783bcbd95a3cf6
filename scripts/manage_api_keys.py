#!/usr/bin/env python
"""API key manager CLI (reference: scripts/manage_api_keys.py):
generate / list / revoke / rotate / export-env."""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="manage_api_keys")
    parser.add_argument("--keys-file", default="artifacts/keys.json")
    parser.add_argument("--salt", default="")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("generate")
    p.add_argument("--label", required=True)
    sub.add_parser("list")
    p = sub.add_parser("revoke")
    p.add_argument("--label", required=True)
    p = sub.add_parser("rotate")
    p.add_argument("--label", required=True)
    sub.add_parser("export-env")

    args = parser.parse_args(argv)

    from sskd_tpu.keys import APIKeyManager

    mgr = APIKeyManager(args.keys_file, salt=args.salt)
    if args.cmd == "generate":
        key = mgr.generate(args.label)
        print(f"API key (shown once): {key}")
    elif args.cmd == "list":
        print(json.dumps(mgr.list_keys(), indent=2))
    elif args.cmd == "revoke":
        mgr.revoke(args.label)
        print(f"revoked {args.label}")
    elif args.cmd == "rotate":
        key = mgr.rotate(args.label)
        print(f"rotated {args.label}; new key (shown once): {key}")
    elif args.cmd == "export-env":
        print(f"SEMANTIC_KD_API_KEY_HASHES={mgr.export_env()}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
