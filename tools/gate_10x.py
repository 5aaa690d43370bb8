#!/usr/bin/env python3
"""Author CORRECTNESS_10x.json from a diff_oracle run on the 10x fixture.

Usage:
  sbt -batch Test/compile && <generate fixture>:
    java ... graft.ScaleProbeSf1 gen10      # -> /tmp/graft_sfsyn_v2_10
  SPARK_GRAFT_CPUS=16 tools/run_direct.sh verify /tmp/graft_sfsyn_v2_10 /tmp/v10x
  python3 tools/gate_10x.py /tmp/graft_sfsyn_v2_10 /tmp/v10x <round>

Runs tools/diff_oracle.py over EVERY key Verify dumped, captures the
per-key PASS/FAIL/SKIP, and writes CORRECTNESS_10x.json (keys sorted;
SKIP = declared no-oracle keys, recorded as rows-only). Exits non-zero
if any key FAILs, so the gate cannot be silently committed red.
"""
import json
import subprocess
import sys
from pathlib import Path

from gatelib import parse_diff_oracle, probe_no_oracle

def main():
    sf_dir, out_dir, rnd = sys.argv[1], sys.argv[2], int(sys.argv[3])
    here = Path(__file__).parent
    p = subprocess.run(
        [sys.executable, str(here / "diff_oracle.py"), sf_dir, out_dir],
        capture_output=True, text=True)
    keys, n_fail = parse_diff_oracle(p.stdout)
    # ADVICE r7: a crashed oracle run (nonzero rc, or nothing parsed) must
    # fail loudly instead of writing a green-looking artifact with n_pass=0.
    if p.returncode != 0 and n_fail == 0:
        sys.stderr.write(f"diff_oracle.py exited rc={p.returncode} with no "
                         f"parsed FAILs; refusing to write artifact\n")
        sys.stderr.write(p.stderr[-4000:])
        sys.exit(2)
    if len(keys) < 100:
        sys.stderr.write(f"only {len(keys)} keys parsed from diff_oracle.py "
                         f"(expected ~161+); refusing to write artifact\n")
        sys.stderr.write(p.stderr[-4000:])
        sys.exit(2)
    # VERDICT r9 task 5: the no-oracle keys must EXECUTE at the decade
    # and stay within their committed row/time envelopes — a green
    # oracle gate alone proved blind to the simhash degeneration
    probes, n_probe_fail = probe_no_oracle(out_dir, "10x")
    doc = {
        "round": rnd,
        "fixture": ("ScaleProbeSf1 synthetic at 10x the sf0.1 shape "
                    "(50k docs / 20k vectors / 1.5M orders / 6M lineitems), "
                    "deterministic hash-derived generator with real cluster "
                    "structure, full sf0.1 schemas"),
        "method": ("graft.Verify on the 10x dir -> tools/diff_oracle.py "
                   "(DuckDB oracle; rows+schema+values exact, same gate as "
                   "the driver's t2)"),
        "why": ("VERDICT r6 task 3: extend the scale-dependent correctness "
                "gate from the 45 heaviest keys to every oracle key"),
        "n_pass": sum(1 for v in keys.values() if v.get("match")),
        "n_fail": n_fail,
        "n_no_oracle": sum(1 for v in keys.values() if v.get("match") is None),
        "no_oracle_probes": probes,
        "keys": dict(sorted(keys.items())),
    }
    Path("CORRECTNESS_10x.json").write_text(json.dumps(doc, indent=1) + "\n")
    print(f"pass={doc['n_pass']} fail={n_fail} no_oracle={doc['n_no_oracle']} "
          f"probe_fail={n_probe_fail}")
    for k, v in keys.items():
        if v.get("match") is False:
            print(f"FAIL {k}: {v['why']}")
    for k, v in probes.items():
        if v.get("status") == "FAIL":
            print(f"PROBE FAIL {k}: {v['why']}")
    sys.exit(1 if (n_fail or n_probe_fail) else 0)

if __name__ == "__main__":
    main()
