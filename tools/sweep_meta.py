#!/usr/bin/env python
"""Finalize a sweep artifact's meta (round merge rule, r14 precedent).

Computes ``missing_at_round_end`` against the LIVE registry — never a
hand-maintained list (the r13 meta hand-listed and was wrong twice) —
and stamps the round number plus a free-text note describing oracle
substitutions. Run AFTER all passes (light + heavy + np-oracle merges)
have landed in the artifact.

Usage:
    python tools/sweep_meta.py --in SWEEP_SF3_r15.json --round 15 \
        --note "..."
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--in", dest="path", required=True)
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--note", default="")
    args = ap.parse_args()

    from fireworks_spark.registry import QUERIES

    with open(args.path) as fh:
        doc = json.load(fh)
    q = doc.get("queries") or {}
    doc["round"] = args.round
    doc["ok"] = sum(1 for r in q.values() if r.get("ok"))
    doc["checked"] = len(q)
    doc["fails"] = sorted(k for k, r in q.items() if not r.get("ok"))
    doc["missing_at_round_end"] = sorted(k for k in QUERIES if k not in q)
    extra = sorted(k for k in q if k not in QUERIES)
    if extra:
        doc["not_in_registry"] = extra
    if args.note:
        doc["note"] = args.note
    doc.pop("partial", None)
    tmp = args.path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(doc, fh, indent=1)
    os.replace(tmp, args.path)
    print(
        f"{args.path}: ok {doc['ok']}/{doc['checked']}, "
        f"fails {doc['fails']}, missing {doc['missing_at_round_end']}"
    )


if __name__ == "__main__":
    main()
