"""Opportunistic paired scaling probe.

The shared host's throughput swings 2-3x between minutes, and a full
3-pair probe (~14 min) almost always straddles a noise burst.  This
script instead fires ONE back-to-back (n8, n32) flagship pair only when
the 1-minute load average says the host is quiet, records the pair with
its before/after load context, and sleeps otherwise.  The resulting log
lets BENCH/BASELINE.md report the quiet-window pair honestly (pairs whose
surrounding load stayed low) next to the all-window median.

Usage::

    python BENCH/probe_pairs.py [max_pairs] [max_minutes] [load_gate] [lo] [hi]
    python BENCH/probe_pairs.py --reannotate

``lo``/``hi`` default to 8/32.  A TRULY idle host depresses the 8->32
ratio through the single-VM DRAM floor (the n8 leg gets the whole
40 GB/s — see BASELINE.md mode (c)); on such hosts a (2, 8) pair is the
cleaner N->4N observation because BOTH legs sit below the bandwidth
ceiling.  Writes JSONL to BENCH/probe_pairs.jsonl (appends).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")
LOG = os.path.join(REPO, "BENCH", "probe_pairs.jsonl")


def load1() -> float:
    return os.getloadavg()[0]


def cpu_ticks() -> tuple[int, int]:
    """(busy_own, steal) jiffies from /proc/stat — steal is hypervisor
    time stolen by neighbor VMs, the direct measure of external
    interference on this shared host."""
    with open("/proc/stat") as fh:
        f = fh.readline().split()
    user, nice, system = int(f[1]), int(f[2]), int(f[3])
    steal = int(f[8]) if len(f) > 8 else 0
    return user + nice + system, steal


def steal_pct(t0, t1, elapsed: float, ncpu: int = 32) -> float:
    """Steal as % of total machine capacity over the interval."""
    hz = os.sysconf("SC_CLK_TCK")
    return round(100.0 * (t1[1] - t0[1]) / (elapsed * hz * ncpu), 2)


def run_leg(cores: int, replicate: int = 96) -> dict:
    env = os.environ.copy()
    env.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")
    env.setdefault("SPARK_GRAFT_JAVA_OPTS", "-XX:+UseParallelGC")
    proc = subprocess.run(
        [sys.executable, BENCH, "--flagship-only", "--cores", str(cores),
         "--replicate", str(replicate), "--mode", "hof"],
        capture_output=True, text=True, env=env, check=True,
    )
    return json.loads(proc.stdout.strip().splitlines()[-1])


# Consensus bands from the accumulated record (BENCH/probe_pairs.jsonl):
# clean n8 legs read 7-12.5k docs/s, clean n32 legs 25-42k.  Each band
# catches a measured failure mode that steal/load alone misses:
#  (a) n32-leg steal        -> depressed n32 (observed >= 9% on every <0.65
#                              high-steal pair)
#  (b) n8-leg steal         -> inflated/nonsense pairs (one read eff 1.27)
#  (c) n8 above band        -> single-VM DRAM floor: the n8 leg got the whole
#                              memory bandwidth (bw_probe.py: parallel memcpy
#                              itself scales 0.55), so eff understates
#  (d) n32 below band       -> neighbor DRAM bursts invisible to steal AND
#                              load — identifiable only by the depressed
#                              absolute vs the consensus band
N8_BAND = (7000.0, 12100.0)
N32_BAND = (25000.0, 42000.0)
# (2,8) consensus bands, PROMOTED round 5 after 23 recorded observations:
# clean n2 legs read 3.0-4.6k docs/s, clean n8 legs >= 12k.  Sub-3k n2
# legs pair with nonphysical eff > 1 (the n2 leg lost DRAM to a neighbor
# the way mode-(c) inflates n8 at (8,32)); zero-steal n8 legs at 7-11k
# are the mode-(d) neighbor-DRAM signature at this level.
N2_BAND = (3000.0, 4600.0)
N8_HI_FLOOR = 12000.0
STEAL_N8_MAX = 5.0
STEAL_N32_MAX = 9.0
NO_STEAL_LOAD_GATE = 1.0  # pre-steal-column records: idle-start or reject


def verdict(rec: dict) -> tuple[bool, list[str]]:
    """Auto-accept check for one pair; reasons name the failure mode.
    Consensus bands apply to the default (8, 32) levels only — other level
    pairs are judged on steal/load alone."""
    reasons = []
    if rec.get("levels", [8, 32]) != [8, 32]:
        s_lo = rec.get("steal_pct_n8_leg")
        s_hi = rec.get("steal_pct_n32_leg")
        if s_hi is not None and s_hi >= STEAL_N32_MAX:
            reasons.append(f"hi_steal>={STEAL_N32_MAX}")
        if s_lo is not None and s_lo >= STEAL_N8_MAX:
            reasons.append(f"lo_steal>={STEAL_N8_MAX}")
        if rec["eff_8_32"] > 1.05:
            reasons.append("eff_nonphysical")
        if rec.get("levels") == [2, 8]:
            if not (N2_BAND[0] <= rec["n8"] <= N2_BAND[1]):
                reasons.append("n2_outside_band")
            if rec["n32"] < N8_HI_FLOOR:
                reasons.append("n8_depressed_vs_consensus")
        return (not reasons), reasons
    n8, n32 = rec["n8"], rec["n32"]
    s8 = rec.get("steal_pct_n8_leg")
    s32 = rec.get("steal_pct_n32_leg")
    if s32 is not None and s32 >= STEAL_N32_MAX:
        reasons.append(f"n32_steal>={STEAL_N32_MAX}")
    if s8 is not None and s8 >= STEAL_N8_MAX:
        reasons.append(f"n8_steal>={STEAL_N8_MAX}")
    if s32 is None and rec.get("load_before", 9.9) > NO_STEAL_LOAD_GATE:
        reasons.append("no_steal_data_and_not_idle_start")
    if n8 > N8_BAND[1]:
        reasons.append("n8_above_band_bandwidth_floor")
    if n8 < N8_BAND[0]:
        reasons.append("n8_below_band")
    if n32 < N32_BAND[0]:
        reasons.append("n32_depressed_vs_consensus")
    if n32 > N32_BAND[1]:
        reasons.append("n32_above_band")
    if rec["eff_8_32"] > 1.05:
        reasons.append("eff_nonphysical")
    return (not reasons), reasons


def reannotate() -> None:
    """Rewrite the log with accept verdicts (idempotent)."""
    recs = [json.loads(l) for l in open(LOG)]
    with open(LOG, "w") as fh:
        for rec in recs:
            rec["accept"], rec["reject_reasons"] = verdict(rec)
            fh.write(json.dumps(rec) + "\n")
    ok = [r for r in recs if r["accept"]]
    print(f"{len(ok)}/{len(recs)} accepted; effs:",
          sorted(r["eff_8_32"] for r in ok))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--reannotate":
        reannotate()
        return
    max_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    max_minutes = float(sys.argv[2]) if len(sys.argv) > 2 else 45
    gate = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    lo = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    hi = int(sys.argv[5]) if len(sys.argv) > 5 else 32
    deadline = time.time() + max_minutes * 60
    done = 0
    while done < max_pairs and time.time() < deadline:
        l0 = load1()
        if l0 > gate:
            time.sleep(30)
            continue
        t0 = time.time()
        c0 = cpu_ticks()
        r8 = run_leg(lo)
        t_mid = time.time()
        c_mid = cpu_ticks()
        l_mid = load1()
        r32 = run_leg(hi)
        t1 = time.time()
        c1 = cpu_ticks()
        l1 = load1()
        eff = round(r32["docs_per_sec"] / ((hi / lo) * r8["docs_per_sec"]), 3)
        rec = {
            "ts": round(t0, 1),
            "levels": [lo, hi],
            "n8": r8["docs_per_sec"],
            "n32": r32["docs_per_sec"],
            "eff_8_32": eff,
            "load_before": round(l0, 2),
            "load_mid": round(l_mid, 2),
            "load_after": round(l1, 2),
            "steal_pct_n8_leg": steal_pct(c0, c_mid, t_mid - t0),
            "steal_pct_n32_leg": steal_pct(c_mid, c1, t1 - t_mid),
            "elapsed_s": round(time.time() - t0, 1),
        }
        rec["accept"], rec["reject_reasons"] = verdict(rec)
        with open(LOG, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)
        done += 1
        time.sleep(15)


if __name__ == "__main__":
    main()
