"""Shared candidate-mass fail-fast (r12 verdict item 1).

Three operator families independently learned the same scale lesson:
any candidate-generation step whose row count is a *product* of two
data-dependent factors can silently go superlinear when one factor is
held fixed in testing but grows with the corpus in production —

- ``dedup.ngram_jaccard_pairs`` (r10 item 3): pairing mass Σ c_s²
  over the inverted index; exactness itself is quadratic on dense-df
  corpora (measured ENOSPC/OOM boundary ~150k closed-vocab docs).
- ``retrieval.bm25_scores`` (r11 item 3): Σ_t df(t)·qcount(t); the
  self-probe query count grows with the corpus when ``probe_mod`` is
  fixed (measured 94.5s → 639.2s at 1×→10×).
- ``corpus.chunk_ann_topk`` (r12 item 1): Σ_b probes(b)·chunks(b);
  same probe-count law (measured 12.7× at 10× with ``probe_mod``
  fixed; linear once ``probe_mod`` scales — PLANS.md r12 addendum).

The shared discipline: pre-count the EXACT candidate mass with one
cheap aggregation over an already-materialized frame, then raise a
``ValueError`` naming (a) the knob that waives or widens the budget,
(b) the measured scaling law that motivated the guard, and (c) the
remediations — in seconds on the driver, instead of a dead executor
hours into a 100 TB run. The guard only counts, never filters:
results are bit-identical with or without it (each call site's graded
query re-proves this through the driver oracle).

This module centralizes the compare-and-raise so every future family
member inherits the same message contract, and the budget default
lives in exactly one place.
"""

from __future__ import annotations

# Default budget: ~1e9 candidate rows is where the measured operator
# families cross from "slow" to "dead executor" on this engine's
# standard heap (r10 ENOSPC probe; r11 retrieval probe: ~24 GB of
# (term, query, doc, tf) rows). Individual operators may override.
CANDIDATE_MASS_BUDGET = int(1e9)


def check_candidate_mass(
    op: str,
    mass_rows: float | None,
    budget: int | None,
    *,
    knob: str,
    law: str,
    remediations: str,
) -> None:
    """Raise ``ValueError`` when ``mass_rows`` exceeds ``budget``.

    ``op`` — operator name for the message; ``mass_rows`` — the exact
    pre-counted candidate-row mass (double; ``None`` treated as 0 —
    an empty frame's SUM aggregate); ``budget`` — the caller's knob
    value, ``None`` waives (probe runs with oversized heaps);
    ``knob`` — the parameter name the caller exposes, so the message
    names the exact thing to change; ``law`` — one line stating what
    the mass counts and the measured blowup; ``remediations`` — the
    operator-specific ways to shrink the mass.
    """
    if budget is None:
        return
    mass = mass_rows or 0.0
    if mass <= budget:
        return
    raise ValueError(
        f"{op}: this plan would materialize ~{mass:.3g} candidate rows "
        f"({law}), over the {knob} budget of {budget:,}. "
        f"Remediations: {remediations}; pass {knob}=None only for "
        "probe runs with an oversized heap."
    )
