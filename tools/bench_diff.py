#!/usr/bin/env python3
"""Compare two Bench JSON outputs (raw line or driver BENCH_r{N}.json).

Usage: python3 tools/bench_diff.py OLD NEW [--threshold 1.3]

Prints per-query ratios for queries slower than threshold x, new/removed
queries, and the total delta. Exit 1 if any regression exceeds the
threshold (useful as a pre-commit perf gate).

Which OLD to diff against (VERDICT r10 #3): use BENCH_floor_local.json —
the best DEMONSTRATED full run, updated only when a run beats it —
as the regression denominator. BENCH_full_local.json is overwritten by
every graft.Bench run (it is "latest", and the driver's elevated runs
land there too), so diffing against it under-reports regressions
whenever the previous run was noise-elevated.
"""
import json, re, sys


def load(path):
    text = open(path).read()
    try:
        d = json.loads(text)
    except json.JSONDecodeError:
        d = None
    if d is not None and "queries" in d:
        return d
    if d is not None and "tail" in d:  # driver BENCH_r{N}.json wrapper
        m = re.search(r'\{"metric".*\}', d["tail"])
        if m:
            return json.loads(m.group(0))
    m = re.search(r'\{"metric".*\}', text)
    if m:
        return json.loads(m.group(0))
    # Fallback: a driver tail truncated mid-line (the leading
    # {"metric":"total",... got cut). Scrape whatever "name":secs pairs
    # survive and synthesize a partial record; per-query diffs still
    # work, the total becomes the partial sum.
    source = d["tail"] if d is not None and "tail" in d else text
    pairs = re.findall(r'"([a-z0-9_]+)":([0-9]+\.[0-9]+)', source)
    queries = {k: float(v) for k, v in pairs if k not in ("value", "sf")}
    if queries:
        # round-4+ format puts the suite total LAST so it survives
        # front-truncation; prefer it over the partial sum when present
        mv = re.findall(r'"value":([0-9]+\.[0-9]+)\}', source)
        total = float(mv[-1]) if mv else sum(queries.values())
        return {"value": total, "queries": queries, "partial": True}
    raise SystemExit(f"no bench JSON found in {path}")


def main(old_path, new_path, threshold=1.3):
    old, new = load(old_path), load(new_path)
    oq, nq = old["queries"], new["queries"]
    regressions = []
    for name in sorted(set(oq) & set(nq)):
        ratio = nq[name] / oq[name] if oq[name] > 0 else float("inf")
        if ratio >= threshold and nq[name] - oq[name] > 0.2:  # ignore sub-noise
            regressions.append((ratio, name))
    for ratio, name in sorted(regressions, reverse=True):
        print(f"REGRESSION {name:28s} {oq[name]:6.2f}s -> {nq[name]:6.2f}s  ({ratio:.2f}x)")
    for name in sorted(set(nq) - set(oq)):
        print(f"NEW        {name:28s} {nq[name]:6.2f}s")
    for name in sorted(set(oq) - set(nq)):
        print(f"REMOVED    {name:28s} (was {oq[name]:.2f}s)")
    print(f"total: {old['value']:.1f}s -> {new['value']:.1f}s "
          f"({len(oq)} -> {len(nq)} queries)")
    return 1 if regressions else 0


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    thr = 1.3
    for a in sys.argv[1:]:
        if a.startswith("--threshold"):
            thr = float(a.split("=", 1)[1] if "=" in a else sys.argv[sys.argv.index(a) + 1])
    sys.exit(main(args[0], args[1], thr))
