#!/usr/bin/env python3
"""Drift-controlled round-over-round bench comparison.

DEV/JUDGE HARNESS. Cross-run VM drift has twice read as a uniform
per-query "regression" on untouched plans (VERDICT r10: 1.36x +/- 0.08
across the board). Bench interleaves three FROZEN spark.range-only
anchor workloads with the query suite and publishes their mins as
"anchors"; because the anchor code never changes, the anchor ratio
between two rounds measures the HOST, and

    drift_controlled(q) = (q_new / q_old) / (A_new / A_old),
    A = geometric mean of the shared anchor mins,

is the comparison with host drift cancelled.

r18 (VERDICT r17 task 1): Bench now runs its reps as interleaved
pass-major passes and publishes per-pass wall-clock windows — "pw"
(base-pass (start, end) pairs) on the compact line, "passes" (every
window + the per-query draw matrix) on the verbose line. This tool localizes a
contention window to its passes and, when the draw matrix is present,
recomputes each query's min with the slowest pass MASKED — if the
masked mins match the published ones, the published numbers already
survived the window.

Usage: python3 tools/drift_compare.py BENCH_old.json BENCH_new.json

Reads either the driver's wrapper JSON ({"parsed": {...}}) or a bare
Bench line. If either side lacks anchors (rounds before r12), falls
back to raw ratios and says so.
"""
import json
import math
import sys

# Contamination band on the anchor geomean ratio. MIRRORS
# Bench.HostDriftBand (Bench.scala) — change BOTH together, or the
# Python reader and the Scala clean-baseline picker will disagree
# about which rounds are contaminated (ADVICE r17).
HOST_DRIFT_BAND = 1.3

# A pass whose duration exceeds this multiple of the median pass
# duration is flagged as covering a contention window.
SLOW_PASS_BAND = 3.0


def load(path):
    with open(path) as f:
        doc = json.load(f)
    top = doc  # wrapper-level annotations (e.g. retroactive host_drift)
    if "parsed" in doc and isinstance(doc["parsed"], dict):
        parsed = doc["parsed"]
        # anchors may only exist on the compact line the driver parsed,
        # or on the wrapper's captured tail — prefer parsed, fall back
        # to scanning the tail for the last JSON object with anchors
        if "anchors" not in parsed and "tail" in doc:
            for line in reversed(doc["tail"].splitlines()):
                line = line.strip()
                if line.startswith("{") and '"anchors"' in line:
                    try:
                        parsed = json.loads(line)
                        break
                    except json.JSONDecodeError:
                        continue
        doc = parsed
    queries = doc.get("queries", {})
    anchors = doc.get("anchors", {})
    # spread-line anchors are {"min": ...} objects; compact-line are floats.
    # r15+ compact lines strip the uniform "anchor_" key prefix (line
    # headroom) — restore it so old/new rounds intersect by name.
    anchors = {(k if k.startswith("anchor_") else f"anchor_{k}"):
               (v["min"] if isinstance(v, dict) else v)
               for k, v in anchors.items()}
    # r14+: forced-consumer window timings ("forced" on the compact
    # line, "queries_forced" on the verbose line); -1 marks a failed
    # forced pass and is dropped like an errored query. r16+ compact
    # lines key "forced" by INDEX into the queries key order (line
    # headroom trim) — resolve back via insertion order (json.load
    # preserves document key order in Python dicts).
    forced = doc.get("forced", doc.get("queries_forced", {})) or {}
    qorder = list(queries.keys())
    forced = {(qorder[int(k)] if k.isdigit() and int(k) < len(qorder) else k): v
              for k, v in forced.items()
              if isinstance(v, (int, float)) and v > 0}
    # host-contamination mark (VERDICT r16 task 2): an explicit
    # top-level "host_drift" annotation, the compact line's "hd" stamp,
    # or a published anchor ratio past the band (pre-stamp rounds:
    # r16's line already carries "ar":1.95). Only HIGH ar marks
    # contamination — contention only ever slows a host.
    drift = doc.get("drift") or {}
    ar = drift.get("ar") if isinstance(drift, dict) else None
    hd = bool(top.get("host_drift")) or "hd" in doc or \
        (isinstance(ar, (int, float)) and ar > HOST_DRIFT_BAND)
    # r18: the first-class baseline object ({"round": N, "ar": x}) and
    # the pass-structure blocks (compact "pw", verbose "passes")
    baseline = doc.get("baseline") if isinstance(doc.get("baseline"), dict) else None
    # "pw" only — a brief pre-release revision emitted shared
    # boundaries under "po"; both formats are even-length, so the old
    # key is ignored rather than guessed at
    pw = doc.get("pw") if isinstance(doc.get("pw"), list) else None
    passes = doc.get("passes") if isinstance(doc.get("passes"), dict) else None
    return queries, anchors, forced, hd, baseline, pw, passes


def pass_report(name, pw, passes):
    """Localize a contention window to its passes and mask it.

    With only "pw" (the driver artifact), reports which base pass ran
    anomalously long — the published per-query mins already exclude it
    by construction (min over passes). With the verbose "passes" draw
    matrix, additionally recomputes each query's min EXCLUDING the
    slow passes and reports any query whose published min came only
    from them (none, if the interleaving did its job).

    Pass durations are only comparable WITHIN a membership class: the
    base passes run the whole suite, the FastCutoff-doubling passes run
    only the sub-300ms subset, forced passes the forced set — so each
    pass's duration is compared against the median of passes running
    the SAME query set, never across classes.
    """
    durations = []  # (label, seconds)
    times = (passes or {}).get("times")
    times = times if isinstance(times, dict) else None
    if passes and isinstance(passes.get("windows"), list):
        durations = [(w[0], w[2] - w[1]) for w in passes["windows"]
                     if isinstance(w, list) and len(w) == 3]
    elif pw and len(pw) >= 2:
        # flat (start, end) PAIRS per base pass — durations are pure
        # pass time (the phase-2 anchor bracket between passes never
        # bills to a pass)
        durations = [(f"q{i // 2 + 1}", pw[i + 1] - pw[i])
                     for i in range(0, len(pw) - 1, 2)]
    if not durations:
        return

    def pass_idx(label):
        return int(label[1:]) if label[1:].isdigit() else None

    # Classify passes by PER-PASS DRAW COVERAGE, not by the exact set
    # of queries that produced a draw in the pass (ADVICE r18): a
    # single errored rep used to split its pass into a singleton
    # membership class that the len(ws) < 3 guard then skipped —
    # disabling slow-pass detection precisely for troubled passes.
    # Base passes draw (nearly) every non-forced query; the
    # FastCutoff-doubling passes draw only the sub-cutoff subset; a
    # missing draw barely moves a pass's coverage count, so the class
    # assignment survives errored reps on either side (a min-max-index
    # recovery of the rep count would misfile the LAST base pass as
    # "fast" whenever any slow query's trailing rep errored).
    coverage = {}
    q_passes = {}  # query -> set of passes it drew in
    if times is not None:
        for q, draws in times.items():
            if q.startswith("f:"):
                continue
            for dp, _ in draws:
                coverage[dp] = coverage.get(dp, 0) + 1
                q_passes.setdefault(q, set()).add(dp)
    max_cov = max(coverage.values()) if coverage else 0
    # The two EXPECTED coverage levels (ADVICE r19 — the fixed
    # 0.6*max_cov ratio misfiled both edges: an error-truncated base
    # pass below 60% read as "fast", and when >=60% of the suite is
    # sub-cutoff every fast pass read as "base"). A base pass draws
    # every non-forced query (level n_all); a FastCutoff-doubling pass
    # draws only the sub-cutoff subset — and sub-cutoff queries are
    # exactly the ones drawn in (nearly) every pass, so the subset
    # size is recoverable from the draw matrix itself, tolerating one
    # errored rep per query.
    n_all = len(q_passes)
    max_qp = max((len(ps) for ps in q_passes.values()), default=0)
    # the one-errored-rep tolerance only makes sense when a query has
    # >2 passes to be missing from — at max_qp == 2 (Reps=1 plus one
    # fast pass) "max_qp - 1" admits every base-only query, collapsing
    # n_fast to n_all and misfiling the genuine fast pass as base
    fast_floor = max_qp - 1 if max_qp > 2 else max_qp
    n_fast = sum(1 for ps in q_passes.values() if len(ps) >= fast_floor)

    def membership(label):
        p = pass_idx(label)
        if p is None:
            return label
        if label[0] == "f":
            return "forced"
        if times is None or max_cov == 0:
            return "base"  # pw-only path: all windows are base passes
        if n_fast >= n_all:
            return "base"  # no fast tier ran (cutoff never fired)
        c = coverage.get(p, 0)
        # nearest expected level wins; ties file as base
        return "base" if abs(c - n_all) <= abs(c - n_fast) else "fast"

    groups = {}
    for label, d in durations:
        groups.setdefault(membership(label), []).append((label, d))
    slow = []  # (label, duration, class median)
    for ws in groups.values():
        if len(ws) < 3:
            continue  # no median to compare against
        med = sorted(d for _, d in ws)[len(ws) // 2]
        slow += [(l, d, med) for l, d in ws
                 if med > 0 and d > SLOW_PASS_BAND * med]
    for label, d, med in slow:
        print(f"*** {name}: pass {label} ran {d:.1f}s vs its class "
              f"median {med:.1f}s (> x{SLOW_PASS_BAND:.0f}) — a "
              "contention window; interleaved per-query mins sample "
              "the other passes and survive it ***")
    if times is not None and slow:
        slow_q = {pass_idx(l) for l, _, _ in slow if l[0] == "q"}
        slow_f = {pass_idx(l) for l, _, _ in slow if l[0] == "f"}
        hit = []
        for q, draws in times.items():
            slow_ps = slow_f if q.startswith("f:") else slow_q
            ts = [t for p, t in draws if isinstance(t, (int, float))]
            clean = [t for p, t in draws if p not in slow_ps
                     and isinstance(t, (int, float))]
            if ts and (not clean or min(clean) > min(ts) * 1.001):
                hit.append(q)
        if hit:
            print(f"*** {name}: queries whose min depends on the slow "
                  f"pass(es): {', '.join(hit)} — treat their numbers as "
                  "contaminated ***")
        else:
            print(f"{name}: every query's min is clean of the slow "
                  "pass(es) — published numbers stand")


def effective_ar(path, seen=None):
    """An artifact's anchor ratio COMPOUNDED to the last clean round in
    its declared baseline chain (mirrors Bench.effectiveAr, r20):
    consecutive loaded rounds launder each other clean under the
    one-hop rule — r19 published ar 1.23 vs the hd-stamped r18 (itself
    x2.12 vs clean r15), effective x2.61 — and dc against such a
    baseline over-corrects on a quieter host. Diagnostic only; walks
    BENCH_r<N>.json siblings of `path`."""
    import os
    import re
    seen = seen or set()
    base = os.path.basename(path)
    if base in seen or len(seen) > 32:
        return None
    try:
        with open(path) as f:
            doc = json.load(f)
        if "parsed" in doc and isinstance(doc["parsed"], dict):
            doc = doc["parsed"]
        drift = doc.get("drift") or {}
        ar = drift.get("ar") if isinstance(drift, dict) else None
        ref = drift.get("base") if isinstance(drift, dict) else None
        if not isinstance(ar, (int, float)):
            return None
        m = re.search(r"r(\d+)", str(ref or ""))
        if not m:
            return ar
        sib = os.path.join(os.path.dirname(path) or ".",
                           f"BENCH_r{int(m.group(1)):02d}.json")
        if not os.path.exists(sib):
            return ar
        with open(sib) as f:
            sdoc = json.load(f)
        if not isinstance(sdoc, dict):
            sdoc = {}
        # "parsed": null is a real artifact shape (the tail-overflow
        # rounds, e.g. BENCH_r07.json) — get(key, default) returns the
        # null, not the default, so guard the VALUE's type
        sp = sdoc["parsed"] if isinstance(sdoc.get("parsed"), dict) else sdoc
        sub = effective_ar(sib, seen | {base})
        stamped = bool(sdoc.get("host_drift")) or "hd" in sp
        dirty = stamped or (isinstance(sub, (int, float)) and sub > HOST_DRIFT_BAND)
        if dirty and isinstance(sub, (int, float)):
            return ar * sub
        return ar
    except (OSError, json.JSONDecodeError, ValueError, TypeError):
        return None


def main():
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    q_old, a_old, f_old, hd_old, bl_old, pw_old, ps_old = load(sys.argv[1])
    q_new, a_new, f_new, hd_new, bl_new, pw_new, ps_new = load(sys.argv[2])
    for path, bl in ((sys.argv[1], bl_old), (sys.argv[2], bl_new)):
        if bl:
            print(f"{path}: declares baseline round {bl.get('round')} "
                  f"(anchor ratio x{bl.get('ar')})")
    ea_old = effective_ar(sys.argv[1])
    if not hd_old and isinstance(ea_old, (int, float)) and ea_old > HOST_DRIFT_BAND:
        print(f"*** NOTE: {sys.argv[1]} reads clean one-hop but its anchors "
              f"compound to x{ea_old:.2f} vs the last clean round in its "
              "baseline chain — on a quieter new host the dc column below "
              "OVER-CORRECTS (uniform high dc with uniform low raw); "
              "adjudicate two-sided: raw ratios + a cross-check against "
              "the last clean artifact ***")
    if hd_old:
        print(f"*** WARNING: {sys.argv[1]} is host-drift marked — its "
              "absolute numbers ran on a contaminated host; prefer the "
              "last clean round as the old side ***")
    if hd_new:
        print(f"*** WARNING: {sys.argv[2]} is host-drift marked — read "
              "the drift-controlled column only; the raw column and "
              "totals are contaminated ***")
    pass_report(sys.argv[1], pw_old, ps_old)
    pass_report(sys.argv[2], pw_new, ps_new)
    shared_anchors = sorted(set(a_old) & set(a_new))
    if shared_anchors:
        g_old = math.exp(sum(math.log(a_old[a]) for a in shared_anchors)
                         / len(shared_anchors))
        g_new = math.exp(sum(math.log(a_new[a]) for a in shared_anchors)
                         / len(shared_anchors))
        host = g_new / g_old
        print(f"anchors shared: {', '.join(shared_anchors)}")
        for a in shared_anchors:
            print(f"  {a:16s} {a_old[a]:8.4f} -> {a_new[a]:8.4f}  "
                  f"x{a_new[a] / a_old[a]:.3f}")
        print(f"host drift factor (anchor geomean ratio): x{host:.3f}")
        if host > HOST_DRIFT_BAND:
            print(f"*** host drift exceeds the {HOST_DRIFT_BAND}x "
                  "contamination band — the new side ran on a loaded "
                  "host; trust only the drift-controlled column ***")
    else:
        host = 1.0
        print("WARNING: no shared anchors — raw ratios only "
              "(one side predates the r12 anchor protocol)")
    shared = sorted(set(q_old) & set(q_new))
    dropped = [q for q in shared if q_old[q] <= 0 or q_new[q] <= 0]
    shared = [q for q in shared if q not in dropped]
    if dropped:
        print(f"skipped (errored in one side): {', '.join(dropped)}")
    print(f"\n{'query':34s} {'old':>8s} {'new':>8s} {'raw':>7s} {'drift-ctl':>9s}")
    ctl = []
    for q in shared:
        raw = q_new[q] / q_old[q]
        dc = raw / host
        ctl.append(dc)
        print(f"{q:34s} {q_old[q]:8.4f} {q_new[q]:8.4f} x{raw:6.3f} x{dc:8.3f}")
    if ctl:
        tot_raw = sum(q_new[q] for q in shared) / sum(q_old[q] for q in shared)
        g_ctl = math.exp(sum(math.log(x) for x in ctl) / len(ctl))
        print(f"\nshared-total raw ratio: x{tot_raw:.3f}   "
              f"per-query drift-controlled geomean: x{g_ctl:.3f}")
    shared_f = sorted(set(f_old) & set(f_new))
    if shared_f:
        print(f"\nforced-consumer series (window cost, not the scan):")
        print(f"{'query':34s} {'old':>8s} {'new':>8s} {'raw':>7s} {'drift-ctl':>9s}")
        for q in shared_f:
            raw = f_new[q] / f_old[q]
            print(f"{q:34s} {f_old[q]:8.4f} {f_new[q]:8.4f} "
                  f"x{raw:6.3f} x{raw / host:8.3f}")


if __name__ == "__main__":
    main()
