#!/usr/bin/env python3
"""Compare two bench artifacts round-over-round, regime-aware.

Usage: python3 tools/bench_compare.py <old.json> <new.json> [threshold]

Both inputs may be either a full bench_out.json (flat) or a driver
BENCH_r{N}.json wrapper (the per-query map then comes from its compact
"parsed" line — headline entries only, noted in the output).

Raw minima are only comparable WITHIN a timing regime; the artifacts
self-describe theirs via `baseline_break`, and this tool refuses to
print a bare delta table across differing regimes without saying so
first (three rounds of judged "regressions" were regime changes).
Certification entries (single-run, `certification_only`) are excluded
from ratio reporting — their sample is not a min-of-N timing.
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    if "queries" not in d and "parsed" in d:
        d = d["parsed"] or {}
        d["_headline_only"] = True
    return d


def main(old_path, new_path, threshold=1.5):
    old, new = load(old_path), load(new_path)
    ob, nb = old.get("baseline_break", ""), new.get("baseline_break", "")
    if ob != nb:
        print("REGIME BREAK between artifacts — raw minima are NOT "
              "directly comparable; read ratios and claims instead:")
        print(f"  old: {ob or '(none)'}")
        print(f"  new: {nb or '(none)'}")
    for d, p in ((old, old_path), (new, new_path)):
        if d.get("_headline_only"):
            print(f"note: {p} carries only headline entries "
                  "(driver wrapper, not the full artifact)")
    cert = set(old.get("certification_only", [])) | \
        set(new.get("certification_only", []))
    # entries timed in a fork that observed external load (r14
    # `load_qualified`): their seconds are a contention artifact, not a
    # code signal — excluded from the delta table on either side
    loadq = set(old.get("load_qualified", [])) | \
        set(new.get("load_qualified", []))
    if loadq:
        print(f"note: {len(loadq)} load-qualified entr"
              f"{'y' if len(loadq) == 1 else 'ies'} excluded "
              f"(fork observed load over threshold): "
              f"{', '.join(sorted(loadq))}")
    # rescue-pass single-run samples (r18 `degraded_single_run`): one
    # warm sample taken under budget pressure so a claim could carry a
    # verdict — not a min-of-N number, excluded from the delta table
    degq = set(old.get("degraded_single_run", [])) | \
        set(new.get("degraded_single_run", []))
    if degq:
        print(f"note: {len(degq)} degraded single-run entr"
              f"{'y' if len(degq) == 1 else 'ies'} excluded "
              f"(claim-rescue sample, not a min-of-N timing): "
              f"{', '.join(sorted(degq))}")
    # entries a wall-budget-truncated run never timed (r16
    # `skipped_budget`): absent by policy, not dropped from the bench
    for side, art in (("old", old), ("new", new)):
        sb = art.get("skipped_budget", [])
        if sb:
            print(f"note: {side} artifact skipped {len(sb)} entr"
                  f"{'y' if len(sb) == 1 else 'ies'} under its wall "
                  f"budget ({art.get('budget_s', '?')} s) — absent "
                  "from its fields by policy, not a coverage change")
    oq = {k: v for k, v in old.get("queries", {}).items()
          if isinstance(v, (int, float))}
    nq = {k: v for k, v in new.get("queries", {}).items()
          if isinstance(v, (int, float))}
    shared = sorted(set(oq) & set(nq) - cert - loadq - degq)
    rows = []
    for n in shared:
        a, b = oq[n], nq[n]
        if a <= 0:
            continue
        rows.append((b / a, n, a, b))
    rows.sort()
    print(f"\n{len(shared)} comparable timed entries "
          f"({len(cert)} certification entries excluded)")
    flagged = [r for r in rows if r[0] >= threshold or r[0] <= 1 / threshold]
    if not flagged:
        print(f"no entry moved by >= {threshold}x in either direction")
    else:
        print(f"entries moved >= {threshold}x (check fork_telemetry and "
              "regime before reading these as code changes):")
        for ratio, n, a, b in flagged:
            print(f"  {n:28s} {a:8.2f} -> {b:8.2f}  x{ratio:.2f}")
    # claims: conclusion flips are the signal that survives regime breaks
    oc, nc = old.get("claims", {}), new.get("claims", {})
    # r17 rename: the big CC rig shrank 2M -> 600k edges and the claim
    # renamed with it — compare the lineage as one claim so a flip (or
    # a failed-then-unevaluated disappearance) is never masked by the
    # rename
    renames = {"precontract_tames_skew_cc2m": "precontract_tames_skew_cc600k"}
    for old_name, new_name in renames.items():
        if old_name in oc and old_name not in nc:
            oc = dict(oc)
            oc[new_name] = oc.pop(old_name)
            print(f"note: claim {old_name} renamed to {new_name} "
                  "(same conclusion, rig shrunk 2M -> 600k edges)")
    for name in sorted(set(oc) | set(nc)):
        a, b = oc.get(name), nc.get(name)
        if a is not None and b is not None and a != b:
            print(f"CLAIM FLIP: {name}: {a} -> {b}")
    # a claim that FAILED in the old artifact and went UNEVALUATED in
    # the new one (operands skipped/errored) must not silently vanish
    # (r16 verdict #7) — the new artifact names its unevaluated claims
    new_uneval = set(new.get("claims_unevaluated", []))
    for old_name, new_name in renames.items():
        if old_name in new_uneval:
            new_uneval.add(new_name)
    for name in sorted(set(oc)):
        renamed = renames.get(name, name)
        # r18 (r17 advice): warn whenever the previously-FAILED claim is
        # simply ABSENT from the new claims map — whether it is named in
        # claims_unevaluated, was deleted/renamed without a renames
        # entry, or the new artifact predates the field. The old
        # `not new_uneval` guard let a deleted claim vanish silently
        # exactly when OTHER claims happened to be unevaluated.
        if oc[name] is False and renamed not in nc:
            why = ("named unevaluated" if renamed in new_uneval
                   else "absent from the new claims map")
            print(f"WARNING: claim {name} FAILED in the old artifact "
                  f"and was NOT evaluated in the new one ({why}) — the "
                  "failure is unresolved, not fixed")
    # claims evaluated from rescue-pass samples: verdicts exist but rest
    # on one sample per degraded operand — surfaced so a flip here is
    # read as provisional
    for name in sorted(new.get("claims_single_run", [])):
        print(f"note: claim {name} evaluated from single-run rescue "
              "samples in the new artifact (flagged, not definitive)")
    flips = [n for n in set(oc) & set(nc) if oc[n] != nc[n]]
    print(f"\nclaims: old {sum(bool(v) for v in oc.values())}/{len(oc)} ok, "
          f"new {sum(bool(v) for v in nc.values())}/{len(nc)} ok, "
          f"{len(flips)} flip(s)")
    ot, nt = old.get("value"), new.get("value")
    if ot and nt:
        print(f"timed totals: {ot:.1f} -> {nt:.1f} s "
              f"(cert_secs: {old.get('cert_secs', 0) or 0:.1f} -> "
              f"{new.get('cert_secs', 0) or 0:.1f})")
    return 0


if __name__ == "__main__":
    t = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    sys.exit(main(sys.argv[1], sys.argv[2], t))
