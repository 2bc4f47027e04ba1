#!/usr/bin/env python
"""Diff-aware re-verification window builder (VERDICT r6 'Next round' #3).

The external-verification union hit 242/242 in round 6, so a rotation window
of never-verified keys buys nothing. The highest-value window now is STALE
re-verification: keys whose implementing module changed in git AFTER the
round in which the driver last verified them green.

For every key in `queries()`:
  last_green(key) = max round r such that CORRECTNESS_r0N.json marks it
                    rows+schema+hash green (hash may be absent for
                    rows-only checks).
  impl(key)       = the file containing the callable's code object.
  stale(key)      = git last-commit-time(impl) > commit-time("round r:
                    verdict/..." snapshot) for r = last_green(key).

Output: a ranked window — fresh keys first (never externally verified),
then stale keys grouped by implementing module, most-recently-changed
module first; within a module, oldest last-green round first (the longest
unverified code drift). Paste the top WINDOW_SIZE into `_PRIORITY` in
__spark_entry__.py; the remainder into `_RECHECK`.

Module-recency is a proxy: a file whose last commit was an unrelated helper
still marks every key in it stale. When you KNOW a key's own function body
was rewritten since its last green round (e.g. the r6-tail zorder rewrite),
pin it explicitly with --pin so it cannot fall out of the window behind
more-recently-touched modules.

Run from the repo root:
    python tools/stale_keys.py [--window 50] [--pin key1 --pin key2]
"""
from __future__ import annotations

import argparse
import collections
import glob
import importlib.util
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], capture_output=True, text=True, cwd=REPO
    ).stdout


def last_green_rounds() -> dict[str, int]:
    out: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        for key, v in json.load(open(path)).items():
            green = (
                v.get("rows_match")
                and v.get("schema_match")
                and v.get("hash_match") in (True, None)
            )
            if green:
                out[key] = max(out.get(key, 0), rnd)
    return out


def round_commit_times() -> dict[int, int]:
    times: dict[int, int] = {}
    for line in _git("log", "--format=%ct|%s").splitlines():
        ts, subject = line.split("|", 1)
        m = re.match(r"round (\d+): verdict", subject)
        if m:
            times[int(m.group(1))] = int(ts)
    return times


def load_queries():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.queries()


def impl_path(fn) -> str | None:
    code = getattr(fn, "__code__", None)
    if code is None:
        inner = getattr(fn, "func", None)  # functools.partial
        code = getattr(inner, "__code__", None)
    if code is None:
        return None
    try:
        return os.path.relpath(code.co_filename, REPO)
    except ValueError:
        return None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--window", type=int, default=50)
    ap.add_argument(
        "--pin",
        action="append",
        default=[],
        help="key whose own body changed since last green; placed right "
        "after the fresh keys regardless of module recency",
    )
    args = ap.parse_args()

    green = last_green_rounds()
    rnd_ts = round_commit_times()
    queries = load_queries()

    file_ts: dict[str, int] = {}

    def mtime(path: str) -> int:
        if path not in file_ts:
            out = _git("log", "-1", "--format=%ct", "--", path).strip()
            file_ts[path] = int(out) if out else 0
        return file_ts[path]

    fresh: list[str] = []
    stale_by_mod: dict[str, list[tuple[str, int]]] = collections.defaultdict(list)
    for key, fn in queries.items():
        lg = green.get(key)
        if lg is None:
            fresh.append(key)
            continue
        path = impl_path(fn)
        if path and lg in rnd_ts and mtime(path) > rnd_ts[lg]:
            stale_by_mod[path].append((key, lg))

    ranked: list[str] = list(fresh)
    ranked += [k for k in args.pin if k in queries and k not in ranked]
    for path in sorted(stale_by_mod, key=lambda p: -mtime(p)):
        for key, _lg in sorted(stale_by_mod[path], key=lambda kl: (kl[1], kl[0])):
            if key not in ranked:
                ranked.append(key)

    n_stale = sum(len(v) for v in stale_by_mod.values())
    print(f"# fresh={len(fresh)} stale={n_stale} of {len(queries)} keys", file=sys.stderr)
    window = ranked[: args.window]
    rest = ranked[args.window :]
    print("_PRIORITY = (")
    for k in window:
        print(f'    "{k}",')
    print(")")
    print("_RECHECK = (")
    for k in rest:
        print(f'    "{k}",')
    print(")")
    return 0


if __name__ == "__main__":
    sys.exit(main())
