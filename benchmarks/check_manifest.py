"""End-of-chain manifest check (VERDICT r4 #5).

Two of six round-4 chain steps failed without leaving a trace in
results.json — the chain "completed" while the memory story silently
never landed. Every chain now ends by declaring which results.json keys
it was supposed to produce; this prints the found/missing diff and
exits nonzero when anything expected is absent, so a chain log can
never read as complete while rows are missing.

Keys are dotted paths into benchmarks/results.json, e.g.
``train_memory.css_320x448_b8_remat`` or ``unroll_ab.b8``. A trailing
``*`` matches any key with that prefix at that level (e.g.
``train_memory.2_448x1024*`` = at least one matching row exists).

Usage: python benchmarks/check_manifest.py KEY [KEY ...]
"""

from __future__ import annotations

import json
import os
import sys

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results.json")


def lookup(results: dict, dotted: str) -> bool:
    node = results
    parts = dotted.split(".")
    for i, part in enumerate(parts):
        if not isinstance(node, dict):
            return False
        if part.endswith("*"):
            prefix = part[:-1]
            matches = [k for k in node if k.startswith(prefix)]
            if not matches:
                return False
            if i == len(parts) - 1:
                return True
            rest = ".".join(parts[i + 1:])
            return any(lookup({"_": node[m]}, "_." + rest)
                       for m in matches)
        if part not in node:
            return False
        node = node[part]
    return True


def main(argv=None) -> int:
    keys = (argv if argv is not None else sys.argv[1:])
    if not keys:
        print("usage: check_manifest.py KEY [KEY ...]", file=sys.stderr)
        return 2
    try:
        with open(RESULTS) as f:
            results = json.load(f)
    except (FileNotFoundError, ValueError) as e:
        print(json.dumps({"manifest_ok": False,
                          "error": f"results.json unreadable: {e}"}))
        return 1
    missing = [k for k in keys if not lookup(results, k)]
    found = [k for k in keys if k not in missing]
    print(json.dumps({"manifest_ok": not missing, "found": found,
                      "missing": missing}, indent=1))
    return 1 if missing else 0


if __name__ == "__main__":
    raise SystemExit(main())
