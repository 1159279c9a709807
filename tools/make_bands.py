#!/usr/bin/env python3
"""Dev tool: regenerate tools/bench_bands.json from the committed
quiet baseline. A band is [0, hi] where hi is the recorded PROSE band
ceiling when BASELINE.md carries one (the multi-run evidence), else
max(2 x quiet_sec, quiet_sec + 1.0) — 2x is the repo's regression
contract, the +1.0 floor keeps sub-second queries from flagging on
scheduler jitter. Bench.scala reads the file and marks `above_band`
per query, so regression candidates surface mechanically instead of
via prose-table cross-reference.

Usage: python3 tools/make_bands.py [quiet_bench.json] > tools/bench_bands.json
"""
import hashlib
import json
import os
import sys


def vintage_hash(sf_dir: str):
    """Testdata vintage hash — MUST stay in lockstep with the Scala
    twin BenchBands.vintageHash: sha256 over sorted `name:bytes` lines
    of the dir's *.parquet entries (recursive byte count), first 12
    hex chars. Bench.scala compares the recorded value against the
    live sf dir and marks vintage_stale runs (r08/r13 both burned
    adjudication time on vintage-shift false flags)."""
    def nbytes(p):
        if os.path.isdir(p):
            return sum(nbytes(os.path.join(p, f)) for f in os.listdir(p))
        return os.path.getsize(p)
    try:
        entries = sorted(f for f in os.listdir(sf_dir)
                         if f.endswith(".parquet"))
        if not entries:
            return None
        payload = "\n".join(
            f"{f}:{nbytes(os.path.join(sf_dir, f))}" for f in entries)
        return hashlib.sha256(payload.encode("utf-8")).hexdigest()[:12]
    except OSError:
        return None

# multi-run prose bands from BASELINE.md (ceilings; seconds at sf0.1).
# NOTE the testdata-vintage caveat: the driver REGENERATES the parquet
# every round, so per-query costs shift with corpus density, not only
# with code — r8's quiet+isolated re-reads moved bt1 3.7->6.1-7.0,
# g2 11.9-13.1->14.2-16.4, dd12 3.1->5.6 with untouched plans. Bands
# should be regenerated from each round's own quiet run.
PROSE_HI = {
    "dd7_exact_jaccard": 13.0,      # r25 (opt round): 3 isolated
                                    # same-session reads 9.60/10.15/
                                    # 9.66 at canary 0.108-0.128 —
                                    # within ±3% after the kernel's
                                    # hashed-join-key + fan-out rework
                                    # killed the old 8.4-16 s salted-
                                    # join variance (was 15.5)
    # round-25 (optimization round) additions — first-landing ceilings
    # for the round-24 queries, normalized to the committed canary ref
    # 0.115 from warm bench-mode reads at canary 0.149 (the r23 append
    # rule: never regenerate the whole file from a slower-host run)
    "mm4_audio_neardup": 6.9,
    "mm5_video_neardup": 6.0,
    "mm6_crossmodal_neardup": 8.2,
    "qc1_quality_classifier": 13.9,
    "dd6_cluster_keep": 15.0,       # 9.6/14.5 r14 pair (16.7 r13b one-off)
    "pipe2_training_prep": 23.0,    # 19.3/19.9 r14 pair, 18-23 recorded
    "g2_pagerank": 17.0,            # 11.1/11.9 r14; 14.2/16.4 r8 vintage
    "pipe1_corpus_clean": 7.5,      # 5.3/7.0 r14 pair; isolated 4.7;
                                    # dd7@0.9 phase is 4.7 of it
                                    # (MicroBench decomposition,
                                    # BASELINE.md r14)
    "dd16_ngram_containment": 16.0, # 8.7/14.1 r14 pair — truth side is
                                    # a second dd7-class join, variance
                                    # tracks dd7's
    "yuen1_trimmed_ttest": 1.2,     # 0.55-0.60 rows, jitter floor
    "dd14_overlap_stitch": 3.0,     # redesigned r14 over the chunk
                                    # stream (20k stitches, was a
                                    # vacuous 0-row join); isolated
                                    # 1.29, in-bench residue margin
}


def main(path: str) -> None:
    full = json.load(open(path))
    base = full["queries"]
    bands = {}
    for name, rec in sorted(base.items()):
        sec = rec["sec"]
        hi = PROSE_HI.get(name, max(2.0 * sec, sec + 1.0))
        bands[name] = [0.0, round(hi, 3)]
    for name, hi in PROSE_HI.items():
        bands.setdefault(name, [0.0, hi])
    # the quiet run's canary ref: Bench.scala scales each ceiling by
    # (segment canary / this ref) so a run on a more-contended host
    # compares against contention-adjusted ceilings instead of raw
    # numbers from a differently-loaded day (r08: 5 flags, all later
    # adjudicated variance/vintage)
    if full.get("canary_ref"):
        bands["__canary_ref"] = [0.0, full["canary_ref"]]
    # vintage stamp: hash the sf dir the quiet run measured, so a
    # later bench on regenerated testdata self-identifies as stale
    v = vintage_hash(full.get("sf", "")) if full.get("sf") else None
    if v:
        bands["__vintage"] = v
    json.dump(bands, sys.stdout, indent=0, sort_keys=True)
    sys.stdout.write("\n")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "BENCH_full_r12c_quiet.json")
