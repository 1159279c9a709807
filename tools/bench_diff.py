#!/usr/bin/env python3
"""Dev tool: per-query diff of two Bench JSON lines (quiet runs).

Usage: python3 tools/bench_diff.py old.json new.json [top_n]

Prints the movers sorted by absolute delta, with canary-normalized
deltas beside the raw ones (each run's canary ref scales its own
column), so vintage/host drift separates from code drift at a glance.
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.loads(f.read().strip().splitlines()[-1])
    # normalize: per-query values may be plain seconds or dicts with
    # a 'sec' field; the canary ref key has shifted across rounds
    d["queries"] = {k: (v["sec"] if isinstance(v, dict) else v)
                    for k, v in d["queries"].items()}
    c = d.get("canary_ref", d.get("canary"))
    if isinstance(c, dict):
        c = c.get("ref", c.get("sec", 0.0))
    d["__canary"] = float(c or 0.0)
    return d


def main(old_path, new_path, top_n=25):
    a, b = load(old_path), load(new_path)
    qa, qb = a["queries"], b["queries"]
    ca, cb = a["__canary"], b["__canary"]
    common = sorted(set(qa) & set(qb))
    only_a = sorted(set(qa) - set(qb))
    only_b = sorted(set(qb) - set(qa))
    rows = []
    for q in common:
        d = qb[q] - qa[q]
        dn = (qb[q] / cb - qa[q] / ca) * min(ca, cb) if ca and cb else d
        rows.append((q, qa[q], qb[q], d, dn))
    rows.sort(key=lambda r: -abs(r[3]))
    print(f"old: {a['value']:.1f}s n={len(qa)} canary={ca}")
    print(f"new: {b['value']:.1f}s n={len(qb)} canary={cb}")
    def trunc(xs):
        return xs if len(xs) <= 8 else f"{len(xs)} queries"
    print(f"common {len(common)}; only-old {trunc(only_a)}; "
          f"only-new {trunc(only_b)}")
    tot = sum(r[3] for r in rows)
    print(f"common-subset delta: {tot:+.1f}s "
          f"(new-only adds {sum(qb[q] for q in only_b):.1f}s)")
    print(f"{'query':34s} {'old':>7s} {'new':>7s} {'delta':>7s} {'norm':>7s}")
    for q, va, vb, d, dn in rows[:int(top_n)]:
        print(f"{q:34s} {va:7.2f} {vb:7.2f} {d:+7.2f} {dn:+7.2f}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], *(sys.argv[3:] or []))
