#!/usr/bin/env python
"""Diff-aware re-verification window builder (VERDICT r6 #3, sharpened to
FUNCTION level in r8 per VERDICT r7 'Next round' #4).

The external-verification union covers every key, so the window's value is
STALE re-verification: keys whose BEHAVIOR-RELEVANT CODE changed after the
round in which the driver last verified them green.

Staleness is content-signature based (tools/key_signatures.py): per key,
sha1(impl source + transitively referenced package helper sources + oracle
SQL string), computed on the CURRENT tree and on a git worktree of each
last-green round's `round N: verdict` commit (the tree the driver
verified). A key is stale iff the signatures differ. This is exact where
module mtime was a proxy both ways: append-only edits no longer mark a
module's other keys stale (r7 burned three rounds of window slots on
those), and a rewrite of a SHARED helper in another module now marks every
transitive consumer stale (mtime-on-own-module missed those; r6/r7 had to
hand---pin them).

Output: a ranked window — fresh keys first (never externally verified),
then pins, then stale keys grouped by implementing module,
most-recently-changed module first; within a module, oldest last-green
round first (the longest unverified drift). Paste the top WINDOW_SIZE into
`_PRIORITY` in __spark_entry__.py; the remainder into `_RECHECK`.

--pin still exists for out-of-band reasons (e.g. a data-file change the
signature can't see); --mtime falls back to the old module-recency proxy
if historical imports ever break.

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


def round_commits() -> dict[int, str]:
    """round number -> sha of its `round N: verdict` snapshot commit."""
    shas: dict[int, str] = {}
    for line in _git("log", "--format=%H|%s").splitlines():
        sha, subject = line.split("|", 1)
        m = re.match(r"round (\d+): verdict", subject)
        if m:
            shas.setdefault(int(m.group(1)), sha)
    return shas


def signatures_at(commit: str) -> dict[str, str] | None:
    """Per-key content signatures of the tree at `commit`, via a throwaway
    git worktree + subprocess import (cached per sha under /tmp)."""
    import tempfile

    cache = os.path.join(tempfile.gettempdir(), f"kcsc_sigs_{commit}.json")
    if os.path.exists(cache):
        return json.load(open(cache))
    wt = tempfile.mkdtemp(prefix="kcsc_sig_wt_")
    try:
        subprocess.run(
            ["git", "worktree", "add", "--detach", wt, commit],
            capture_output=True, cwd=REPO, check=True,
        )
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "key_signatures.py"), wt],
            capture_output=True, text=True,
        )
        if out.returncode != 0:
            return None
        sigs = json.loads(out.stdout)
        json.dump(sigs, open(cache, "w"))
        return sigs
    except Exception:
        return None
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", wt],
            capture_output=True, cwd=REPO,
        )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--window", type=int, default=50)
    ap.add_argument(
        "--pin",
        action="append",
        default=[],
        help="key to verify for an out-of-band reason; placed right "
        "after the fresh keys",
    )
    ap.add_argument(
        "--mtime",
        action="store_true",
        help="fall back to the pre-r8 module-recency proxy",
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

    sig_now: dict[str, str] | None = None
    sig_round: dict[int, dict[str, str] | None] = {}
    if not args.mtime:
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "key_signatures.py"), REPO],
            capture_output=True, text=True,
        )
        sig_now = json.loads(out.stdout) if out.returncode == 0 else None
        if sig_now is None:
            print("# signature of current tree failed; using --mtime proxy", file=sys.stderr)
        else:
            shas = round_commits()
            for r in sorted({lg for lg in green.values()}):
                sig_round[r] = signatures_at(shas[r]) if r in shas else None
                if sig_round[r] is None:
                    print(f"# round {r} signatures unavailable; its keys fall back "
                          "to the mtime proxy", file=sys.stderr)

    fresh: list[str] = []
    stale_by_mod: dict[str, list[tuple[str, int]]] = collections.defaultdict(list)
    for key, fn in queries.items():
        lg = green.get(key)
        if lg is None:
            fresh.append(key)
            continue
        path = impl_path(fn)
        old = (sig_round.get(lg) or {}).get(key) if sig_now is not None else None
        if sig_now is not None and old is not None:
            if sig_now.get(key) != old and path:
                stale_by_mod[path].append((key, lg))
            continue
        # fallback: module-recency proxy
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
