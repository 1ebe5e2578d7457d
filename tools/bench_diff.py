"""Bench variance guard (VERDICT r3 item 8): compare the current
BENCH_SCALING.json per-query walls against the previous round's
snapshot and fail loudly when any common query regresses >2x.

Motivation: the r2 asof/interval "regression" turned out to be
bench-process noise, but cost a round of attention because nothing
diffed the numbers automatically. This tool makes a real regression a
CI-visible event and a noisy one a one-line dismissal.

Usage:
    python tools/bench_diff.py            # diff current vs baseline
    python tools/bench_diff.py --update   # accept current as baseline
    python tools/bench_diff.py --exempt Q "reason"
        # annotate an INTENTIONAL mid-round rewrite: Q's regressions
        # are reported but don't fail until the next --update clears
        # the exemption list. This replaces mid-round baseline
        # re-seeds (VERDICT r5 item 7: each re-seed erases the
        # regression anchor; exemptions keep the anchor and leave an
        # audit trail in tools/bench_exemptions.json). Baseline policy:
        # --update ONLY in the round-end snapshot commit.

Rules:
- queries are compared per scale factor ("primary" = sf0.1,
  "secondary" = sf0.01 blocks of BENCH_SCALING.json);
- a query participates only when BOTH walls clear the local
  job-overhead noise floor (0.3 s) — below that, ratios are jitter;
- regression threshold 2.0x (matches the driver's own "within 2x"
  contract); exit code 1 lists every offender.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CURRENT = os.path.join(REPO, "BENCH_SCALING.json")
BASELINE = os.path.join(REPO, "tools", "bench_baseline.json")
EXEMPTIONS = os.path.join(REPO, "tools", "bench_exemptions.json")
NOISE_FLOOR_SEC = 0.3
REGRESSION_RATIO = 2.0
# single-SF trips this large at the LARGEST benched SF fail even
# without cross-SF correlation (scale-dependent plan flips present
# exactly there; host-load noise on this box tops out ~2-3x)
HARD_RATIO = 3.0


def _blocks(path: str) -> dict[str, dict[str, float]]:
    """Extract {sf_label: {query: wall}} from a BENCH_SCALING.json.

    Tolerates both the r4+ layout ({"primary": {...}, "secondary":
    {...}}) and the r3 layout (a bare secondary block at top level).
    """
    with open(path) as fh:
        data = json.load(fh)
    out: dict[str, dict[str, float]] = {}
    if "primary" in data or "secondary" in data:
        for label in ("primary", "secondary"):
            block = data.get(label)
            if block and isinstance(block.get("queries"), dict):
                out[str(block.get("sf", label))] = block["queries"]
    elif isinstance(data.get("queries"), dict):  # r3 layout: bare block
        out[str(data.get("sf", "secondary"))] = data["queries"]
    return out


def main() -> int:
    if not os.path.exists(CURRENT):
        print(f"bench_diff: no {CURRENT}; run bench.py first")
        return 2
    if "--exempt" in sys.argv:
        i = sys.argv.index("--exempt")
        q = sys.argv[i + 1]
        reason = sys.argv[i + 2] if len(sys.argv) > i + 2 else "intentional rewrite"
        ex = {}
        if os.path.exists(EXEMPTIONS):
            with open(EXEMPTIONS) as fh:
                ex = json.load(fh)
        ex[q] = reason
        with open(EXEMPTIONS, "w") as fh:
            json.dump(ex, fh, indent=1)
        print(f"bench_diff: exempted {q!r} until next --update ({reason})")
        return 0
    if "--update" in sys.argv:
        with open(CURRENT) as src, open(BASELINE, "w") as dst:
            dst.write(src.read())
        if os.path.exists(EXEMPTIONS):
            os.remove(EXEMPTIONS)
            print("bench_diff: exemption list cleared")
        print(f"bench_diff: baseline updated from {os.path.basename(CURRENT)}")
        return 0
    if not os.path.exists(BASELINE):
        print("bench_diff: no baseline yet; run with --update to seed")
        return 2

    cur, base = _blocks(CURRENT), _blocks(BASELINE)
    # per-query trip records: {query: [(sf, prev, wall, ratio), ...]}
    trips: dict[str, list[tuple[str, float, float, float]]] = {}
    comparable_sfs: dict[str, int] = {}
    improvements = 0
    compared = 0
    for sf, cur_q in cur.items():
        base_q = base.get(sf, {})
        for q, wall in cur_q.items():
            prev = base_q.get(q)
            if prev is None or min(wall, prev) < NOISE_FLOOR_SEC:
                continue
            compared += 1
            comparable_sfs[q] = comparable_sfs.get(q, 0) + 1
            ratio = wall / prev
            if ratio > REGRESSION_RATIO:
                trips.setdefault(q, []).append((sf, prev, wall, ratio))
            elif ratio < 1 / REGRESSION_RATIO:
                improvements += 1

    # A single-SF trip on a query that is comparable at BOTH scale
    # factors is overwhelmingly bench noise (external host load swings
    # sub-2s walls 2-3x on this box; a real plan regression scales, so
    # it shows up at every SF). Fail only on correlated regressions —
    # EXCEPT a large trip (>HARD_RATIO) at the LARGEST scale factor,
    # which is exactly how a scale-dependent regression (broadcast→
    # shuffle flip, spill onset) presents while the small SF stays
    # under threshold; demoting those to noise would let them bake
    # into the next baseline unnoticed (ADVICE r5).
    largest_sf = max(cur, key=lambda s: float(s) if s.replace(".", "").isdigit() else -1)
    exempt: dict[str, str] = {}
    if os.path.exists(EXEMPTIONS):
        with open(EXEMPTIONS) as fh:
            exempt = json.load(fh)
    regressions: list[str] = []
    suspects: list[str] = []
    exempted: list[str] = []
    for q, hits in trips.items():
        correlated = len(hits) >= comparable_sfs.get(q, 1)
        for sf, prev, wall, ratio in hits:
            line = f"  sf{sf} {q}: {prev:.2f}s -> {wall:.2f}s ({ratio:.2f}x)"
            if q in exempt:
                exempted.append(f"{line} [exempt: {exempt[q]}]")
            elif correlated or (sf == largest_sf and ratio > HARD_RATIO):
                regressions.append(line)
            else:
                suspects.append(line)

    print(
        f"bench_diff: {compared} comparable walls, "
        f"{len(regressions)} regressions >{REGRESSION_RATIO}x, "
        f"{len(suspects)} single-sf noise suspects, "
        f"{improvements} improvements >{REGRESSION_RATIO}x"
    )
    if exempted:
        print("EXEMPTED (intentional rewrites — cleared at next --update):")
        print("\n".join(exempted))
    if suspects:
        print("NOISE SUSPECTS (regressed at one SF only — not failing):")
        print("\n".join(suspects))
    if regressions:
        print("REGRESSIONS (correlated across SFs, or >3x at largest SF):")
        print("\n".join(regressions))
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
