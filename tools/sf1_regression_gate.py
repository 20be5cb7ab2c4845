"""Round-over-round per-query sf1 regression gate (r9 verdict item 2).

Since r9 the bench tail carries the FULL per-query sf1 map
(``BENCH_r{N}.json -> parsed.sf1_queries``), but nothing compared it
round-over-round — a single query going super-linear at sf1 needed a
human to notice. This gate diffs the newest sf1 map against the
previous round's and FAILS on any query that got more than
``THRESHOLD``x slower (at the slower end of an absolute ``FLOOR_SEC``
— sub-second entries live in the shared machine's noise band; the r9
A/B triage showed sub-second timings flip direction between sessions)
unless PLANS.md carries an explicit waiver line::

    sf1-regression-ok: <query_name> — <reason / PLANS.md section>

Waivers are per-name and deliberate: the gate's job is to force a
PLANS.md entry (an A/B or an explanation) for every real mover, the
same discipline the r8→r9 headline-shift triage followed.

Map sources accepted, newest-first preference:

- ``bench_last.json`` (written by every ``bench.py`` run — the
  round-close path: current run vs the previous round's artifact)
- ``BENCH_r{N}.json`` driver artifacts (``parsed.sf1_queries``; r8 and
  earlier predate the map and are skipped)

When a map is a ``top10_slowest`` slice the comparison covers the key
intersection only (still the queries whose regressions matter most).

Usage:
    python tools/sf1_regression_gate.py              # newest vs previous
    python tools/sf1_regression_gate.py PREV CUR     # explicit pair
    python tools/sf1_regression_gate.py --record     # also append the
                                                     # diff to PLANS.md
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
THRESHOLD = 1.5
FLOOR_SEC = 0.5


def extract_map(path: str, tier: str = "sf1") -> dict[str, float] | None:
    """Pull a per-query tier map out of any bench output shape.

    Values are MEDIANS: r11+ artifacts carry ``[median, spread]``
    pairs (bench.py median-of-N isolated passes — r10 verdict item 2);
    r9/r10 artifacts carry flat single-pass floats. The gate diffs the
    medians so a page-cache-band outlier session can no longer read as
    a regression. ``tier`` selects sf1 (driver artifacts + local runs)
    or extended/core (two-sample medians since r13 — local
    ``BENCH_LOCAL_r{N}.json`` snapshots + bench_last.json only, since
    the driver's compact line carries breadth TOTALS, not maps)."""
    with open(path) as fh:
        d = json.load(fh)
    if isinstance(d.get("parsed"), dict):  # driver BENCH_r{N}.json
        d = d["parsed"]
    if tier == "sf1":
        m = d.get("sf1_queries") or d.get("sf1")
    else:
        m = d.get(tier)
    if not m:
        return None
    return {
        n: float(v[0]) if isinstance(v, (list, tuple)) else float(v)
        for n, v in m.items()
    }


def extract_sf1(path: str) -> dict[str, float] | None:
    return extract_map(path, "sf1")


def _round_num(path: str) -> int:
    base = os.path.basename(path)
    try:
        return int(base.split("_r")[1].split(".")[0])
    except (IndexError, ValueError):
        return -1


def candidate_sources(tier: str = "sf1") -> list[tuple[str, dict[str, float]]]:
    """All map-bearing sources, oldest -> newest. Artifacts order by
    the ROUND NUMBER in the filename (mtimes don't survive git
    checkouts, so mtime order can invert after a fresh clone);
    bench_last.json is appended as newest only when it is
    mtime-newer than the newest artifact (a fresh round-close run) —
    a stale bench_last from a prior round is skipped, its round's
    artifact already carries that map."""
    pattern = "BENCH_r*.json" if tier == "sf1" else "BENCH_LOCAL_r*.json"
    paths = sorted(glob.glob(os.path.join(REPO, pattern)), key=_round_num)
    paths = [p for p in paths if "LOCAL" in p] if tier != "sf1" else [
        p for p in paths if "LOCAL" not in p
    ]
    last = os.path.join(REPO, "bench_last.json")
    if os.path.exists(last) and (
        not paths
        or os.path.getmtime(last) > max(os.path.getmtime(p) for p in paths)
    ):
        paths = paths + [last]
    out = []
    for p in paths:
        try:
            m = extract_map(p, tier)
        except (json.JSONDecodeError, OSError):
            continue
        if m:
            # identical map to the previous source (artifact recorded
            # from the same run as bench_last) adds no signal
            if out and out[-1][1] == m:
                continue
            out.append((p, m))
    return out


def waivers(tier: str = "sf1") -> set[str]:
    names: set[str] = set()
    plans = os.path.join(REPO, "PLANS.md")
    if not os.path.exists(plans):
        return names
    key = f"{tier}-regression-ok:"
    for line in open(plans):
        if key in line:
            frag = line.split(key, 1)[1].strip()
            if frag:
                names.add(frag.split()[0].strip(":,"))
    return names


def diff_maps(
    prev: dict[str, float], cur: dict[str, float]
) -> list[tuple[str, float, float, float]]:
    movers = []
    for name, t in cur.items():
        p = prev.get(name)
        if p is None or p <= 0:
            continue
        if t > FLOOR_SEC and t / p > THRESHOLD:
            movers.append((name, p, t, round(t / p, 2)))
    return sorted(movers, key=lambda x: -x[3])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("pair", nargs="*", help="explicit PREV CUR json paths")
    ap.add_argument(
        "--record",
        action="store_true",
        help="append the diff summary to PLANS.md",
    )
    ap.add_argument(
        "--tier",
        choices=("sf1", "extended", "core"),
        default="sf1",
        help="which per-query map to diff (breadth tiers use the "
        "BENCH_LOCAL_r{N}.json snapshots, two-sample medians)",
    )
    args = ap.parse_args()

    if args.pair:
        if len(args.pair) != 2:
            print("need exactly two paths (PREV CUR)", file=sys.stderr)
            return 2
        srcs = [(p, extract_map(p, args.tier)) for p in args.pair]
        if any(m is None for _, m in srcs):
            print(f"no {args.tier} map in one of the inputs", file=sys.stderr)
            return 2
    else:
        srcs = candidate_sources(args.tier)[-2:]
        if len(srcs) < 2:
            print(
                f"{args.tier}-gate: fewer than two {args.tier} maps "
                "exist — nothing to diff"
            )
            return 0

    (prev_path, prev), (cur_path, cur) = srcs
    movers = diff_maps(prev, cur)
    waived = waivers(args.tier)
    bad = [m for m in movers if m[0] not in waived]
    shared = set(prev) & set(cur)
    imp = sorted(
        ((n, prev[n], cur[n]) for n in shared if prev[n] > 0.0),
        key=lambda x: x[2] / x[1],
    )[:3]

    print(
        f"{args.tier}-gate: {os.path.basename(prev_path)} -> "
        f"{os.path.basename(cur_path)}  ({len(shared)} shared queries, "
        f"threshold {THRESHOLD}x above {FLOOR_SEC}s)"
    )
    for name, p, t, r in movers:
        tag = "WAIVED" if name in waived else "FAIL"
        print(f"  {tag}: {name}  {p:.3f}s -> {t:.3f}s  ({r}x)")
    if not movers:
        print("  no movers above threshold")
    if imp:
        best = ", ".join(f"{n} {p:.2f}->{t:.2f}s" for n, p, t in imp)
        print(f"  fastest-improving: {best}")

    if args.record:
        with open(os.path.join(REPO, "PLANS.md"), "a") as fh:
            fh.write(
                f"\n- {args.tier}-gate {os.path.basename(prev_path)} -> "
                f"{os.path.basename(cur_path)}: "
                + (
                    "; ".join(
                        f"{n} {p:.2f}s->{t:.2f}s ({r}x)"
                        for n, p, t, r in movers
                    )
                    if movers
                    else "no movers above threshold"
                )
                + "\n"
            )

    if bad:
        print(
            f"{args.tier}-gate FAILED: add a PLANS.md A/B entry and an "
            f"explicit\n'{args.tier}-regression-ok: <name> — <reason>' "
            "waiver for each genuine mover",
            file=sys.stderr,
        )
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
