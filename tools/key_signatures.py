#!/usr/bin/env python
"""Per-key content signatures for the diff-aware verification window.

For a repo tree (argv[1], default: this repo), import its __spark_entry__
and emit JSON {key: sha1} where the hash covers, per queries() key:

  - the source text of the key's callable,
  - the source of every package function it TRANSITIVELY references
    (resolved through each function's defining module's globals, plus the
    attributes of any package modules those globals alias — so `H.h32`
    pulls functions/hashing.h32), and
  - the key's oracle_sql() string (which inlines the generated constants,
    so a constant-only change that alters semantics changes the SQL too).

Two trees produce the same signature for a key iff nothing the key's
behavior depends on changed — the function-level staleness VERDICT r7
'Next round' #4 asked for, strictly sharper than module mtime (append-only
edits to a 2,000-line module no longer mark its 30 keys stale), and
strictly safer (a shared-helper rewrite in another module IS caught,
which mtime-on-own-module missed).

Run standalone (prints JSON to stdout):
    python tools/key_signatures.py [tree_root]
"""
from __future__ import annotations

import hashlib
import inspect
import json
import os
import sys
import types


def _package_root(tree: str) -> str:
    return os.path.join(tree, "kafka_connect_storage_cloud_spark")


def _in_package(obj, pkg_dir: str) -> bool:
    try:
        f = inspect.getfile(obj)
    except (TypeError, OSError):
        return False
    return os.path.abspath(f).startswith(os.path.abspath(pkg_dir))


def closure_sources(fn, pkg_dir: str) -> list[str]:
    """Source texts of fn plus every package callable it transitively
    references. Over-approximates attribute calls (`H.h32` pulls any
    package-module attribute named by a co_name) — over-marking stale is
    safe; under-marking is not."""
    seen_codes = set()
    sources: dict[str, str] = {}
    todo = [fn]
    while todo:
        f = todo.pop()
        if isinstance(f, types.MethodType):
            f = f.__func__
        code = getattr(f, "__code__", None)
        if code is None:  # functools.partial
            inner = getattr(f, "func", None)
            code = getattr(inner, "__code__", None)
            f = inner
        if code is None or code in seen_codes:
            continue
        seen_codes.add(code)
        try:
            key = f"{f.__module__}.{f.__qualname__}"
            sources[key] = inspect.getsource(f)
        except (OSError, TypeError):
            pass
        mod = sys.modules.get(getattr(f, "__module__", ""), None)
        if mod is None:
            continue
        names = set(code.co_names)
        # nested code objects (lambdas/closures) contribute their names too
        stack = [code]
        while stack:
            c = stack.pop()
            for const in c.co_consts:
                if isinstance(const, types.CodeType):
                    names.update(const.co_names)
                    stack.append(const)
        for name in names:
            g = getattr(mod, name, None)
            if g is None:
                continue
            if callable(g) and _in_package(g, pkg_dir):
                todo.append(g)
            elif isinstance(g, types.ModuleType) and _in_package(g, pkg_dir):
                for attr in names:
                    h = getattr(g, attr, None)
                    if h is not None and callable(h) and _in_package(h, pkg_dir):
                        todo.append(h)
    return [sources[k] for k in sorted(sources)]


def signatures(tree: str) -> dict[str, str]:
    import importlib.util

    entry = os.path.join(tree, "__spark_entry__.py")
    spec = importlib.util.spec_from_file_location("__sig_entry__", entry)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["__sig_entry__"] = mod
    spec.loader.exec_module(mod)
    qs = mod.queries()
    oracles = mod.oracle_sql()
    pkg_dir = _package_root(tree)
    out = {}
    for key, fn in qs.items():
        h = hashlib.sha1()
        h.update(oracles.get(key, "").encode())
        for src in closure_sources(fn, pkg_dir):
            h.update(src.encode())
        out[key] = h.hexdigest()
    return out


if __name__ == "__main__":
    tree = os.path.abspath(sys.argv[1]) if len(sys.argv) > 1 else (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    sys.path.insert(0, tree)
    print(json.dumps(signatures(tree), indent=0, sort_keys=True))
