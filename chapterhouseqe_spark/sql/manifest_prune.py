"""Manifest-based file skipping for the reference SQL path.

If a ``read_files`` target directory carries the ``_MANIFEST.json``
written by ``operators/layout.py:write_manifest``, the engine consults
it at PLAN time: numeric range/equality conjuncts in the WHERE clause
prune files whose [min, max] provably exclude every matching row, and
Spark is handed the surviving file list instead of the directory — the
scan never lists or footer-reads a skipped file. This is the engine-
integrated form of the graded ``manifest_pruned_scan`` operator (the
Iceberg/Delta idea: the planner reads ONE small JSON, not the store's
LIST API — the operation object stores throttle at 100 TB).

Safety rules (pruning may only SKIP a file that cannot match):

- Only top-level AND conjuncts of the form ``col <op> literal`` /
  ``literal <op> col`` with op in ``= >= > <= <`` are used; anything
  else (OR, functions, casts) is ignored — ignored conjuncts keep
  files, never drop them.
- Only NUMERIC literals against NUMERIC file stats participate.
  String/timestamp stats are stored ISO-encoded; a user literal like
  ``'1997-03-31'`` means midnight under SQL timestamp coercion but
  sorts BELOW ``'1997-03-31T00:00:00'`` lexicographically, so a
  boundary file could be wrongly skipped — the exact class of bug a
  pruner must never have. (The explicit ``manifest_scan`` operator
  handles timestamps by encoding both sides identically.)
- Strict ``<``/``>`` are widened to closed bounds before the check:
  pruning stays valid, at worst one extra file is read.
- The WHERE clause itself still runs — pruning only removes files with
  no matching rows, so results are bit-identical with and without a
  manifest.
"""

from __future__ import annotations

import json
import os

from chapterhouseqe_spark.sql.parser import BinaryOp, Identifier, Literal

_OPS = {">=", ">", "<=", "<", "="}


def _conjuncts(expr) -> list:
    if isinstance(expr, BinaryOp) and expr.op.lower() == "and":
        return _conjuncts(expr.left) + _conjuncts(expr.right)
    return [expr]


def numeric_bounds(where) -> dict[str, tuple[int | float | None, int | float | None]]:
    """Per-column (lo, hi) closed numeric bounds implied by the WHERE's
    top-level conjuncts; None = unbounded on that side."""
    bounds: dict[str, tuple[int | float | None, int | float | None]] = {}
    if where is None:
        return bounds
    for c in _conjuncts(where):
        if not isinstance(c, BinaryOp) or c.op not in _OPS:
            continue
        ident, lit, op = None, None, c.op
        if isinstance(c.left, Identifier) and isinstance(c.right, Literal):
            ident, lit = c.left, c.right
        elif isinstance(c.right, Identifier) and isinstance(c.left, Literal):
            ident, lit = c.right, c.left
            # mirror: 5 < col  ==  col > 5
            op = {">": "<", "<": ">", ">=": "<=", "<=": ">="}.get(op, op)
        if ident is None or isinstance(lit.value, (bool, str)) or lit.value is None:
            continue
        if not isinstance(lit.value, (int, float)):
            continue
        name = ident.parts[-1] if hasattr(ident, "parts") else ident.name
        # Keep int literals as Python ints: float() rounds BIGINTs
        # above 2^53, which could wrongly prune a file whose exact
        # int min/max brackets the true literal (pruning must never
        # change results). Python compares int vs int/float exactly.
        v = lit.value if isinstance(lit.value, int) else float(lit.value)
        lo, hi = bounds.get(name, (None, None))
        if op in (">=", ">"):
            lo = v if lo is None else max(lo, v)
        elif op in ("<=", "<"):
            hi = v if hi is None else min(hi, v)
        else:  # =
            lo = v if lo is None else max(lo, v)
            hi = v if hi is None else min(hi, v)
        bounds[name] = (lo, hi)
    return bounds


def pruned_file_list(resolved: str, where) -> list[str] | None:
    """File list for a manifest-backed directory after numeric pruning,
    or None when pruning does not apply (no manifest, remote path, no
    usable bounds). An empty return also maps to None (caller falls
    back to the plain scan; the WHERE yields the empty result anyway).
    """
    base = resolved
    for suffix in ("/*.parquet", "/*"):
        if base.endswith(suffix):
            base = base[: -len(suffix)]
            break
    if not os.path.isdir(base):
        return None
    # Either manifest form: the plain single JSON, or the sharded
    # index (operators/layout.py:write_manifest_sharded) — shards
    # whose aggregate bounds exclude the query range are skipped
    # without opening their JSON, same conservative rules.
    mpath = os.path.join(base, "_MANIFEST.json")
    ipath = os.path.join(base, "_MANIFEST_INDEX.json")
    if os.path.exists(mpath):
        with open(mpath) as fh:
            man = json.load(fh)
        n_total = len(man["files"])
        entries = man["files"]
        columns = man.get("columns", [])
    elif os.path.exists(ipath):
        with open(ipath) as fh:
            index = json.load(fh)
        columns = index.get("columns", [])
        n_total = sum(s["n_files"] for s in index["shards"])
        bounds0 = numeric_bounds(where)
        entries = []
        for srow in index["shards"]:
            skip = False
            for col, (lo, hi) in bounds0.items():
                b = (srow.get("bounds") or {}).get(col)
                if b is None:
                    continue
                mn, mx = b
                if not isinstance(mn, (int, float)) or not isinstance(
                    mx, (int, float)
                ):
                    continue
                if (hi is not None and mn > hi) or (
                    lo is not None and mx < lo
                ):
                    skip = True
                    break
            if skip:
                continue
            with open(
                os.path.join(base, "_manifest_shards", srow["shard"])
            ) as fh:
                entries.extend(json.load(fh)["files"])
    else:
        return None
    bounds = numeric_bounds(where)
    usable = [c for c in columns if c in bounds]
    if not usable:
        return None
    kept = []
    for entry in entries:
        keep = True
        for col in usable:
            rng = entry.get(col)
            if rng is None:
                continue  # no stats: conservatively keep
            mn, mx = rng
            if not isinstance(mn, (int, float)) or not isinstance(
                mx, (int, float)
            ):
                continue  # non-numeric stats never prune (see module doc)
            lo, hi = bounds[col]
            if (hi is not None and mn > hi) or (lo is not None and mx < lo):
                keep = False
                break
        if keep:
            kept.append(os.path.join(base, entry["file"]))
    if not kept or len(kept) == n_total:
        return None  # nothing pruned (or everything): plain scan
    return kept
