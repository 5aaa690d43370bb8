#!/usr/bin/env python3
"""Author CORRECTNESS_100x.json from a diff_oracle run on the 100x fixture.

Usage:
  java ... graft.ScaleProbeSf1 gen100     # -> /tmp/graft_sfsyn_v2_100
  SPARK_GRAFT_CPUS=16 tools/run_direct.sh verify /tmp/graft_sfsyn_v2_100 \
      /tmp/v100x <key ...>
  python3 tools/gate_100x.py /tmp/graft_sfsyn_v2_100 /tmp/v100x <round> \
      <key ...> [--excluded key=reason ...]

Runs tools/diff_oracle.py restricted to the given keys, captures the
per-key PASS/FAIL, and writes CORRECTNESS_100x.json. Keys whose DuckDB
oracle is computationally infeasible at 100x (an ORACLE limitation —
the engine side runs; note the reason) are recorded under "excluded"
via --excluded, never silently dropped. Exits non-zero on any FAIL, on
a crashed oracle run, or when fewer than 45 keys pass (the VERDICT r7
task 5 floor).
"""
import json
import subprocess
import sys
from pathlib import Path

from gatelib import parse_diff_oracle, probe_no_oracle

def main():
    sf_dir, out_dir, rnd = sys.argv[1], sys.argv[2], int(sys.argv[3])
    rest = sys.argv[4:]
    keys_in, excluded = [], {}
    it = iter(rest)
    for a in it:
        if a == "--excluded":
            # everything after --excluded MUST be key=reason: a bare
            # key here would otherwise be silently recorded as
            # excluded instead of gated, losing coverage
            for ex in it:
                k, eq, why = ex.partition("=")
                if not eq or not why:
                    sys.stderr.write(
                        f"--excluded entry '{ex}' is not key=reason; "
                        f"if it was meant to be gated, put it BEFORE "
                        f"--excluded\n")
                    sys.exit(2)
                excluded[k] = why
        else:
            keys_in.append(a)
    here = Path(__file__).parent
    # ADVICE r8: an --excluded entry was never validated — a typo'd or
    # renamed key would record a plausible-looking exclusion while the
    # real key silently went ungated. Excluded keys must (a) not also be
    # gated in this run and (b) exist in the repo's oracle key list
    # (Verify dumps oracle_sql.json next to the results).
    both = sorted(set(excluded) & set(keys_in))
    if both:
        sys.stderr.write(f"keys both gated and excluded: {both}\n")
        sys.exit(2)
    oracle_json = Path(out_dir) / "oracle_sql.json"
    if oracle_json.exists():
        known = set(json.loads(oracle_json.read_text()))
        bogus = sorted(set(excluded) - known)
        if bogus:
            sys.stderr.write(
                f"--excluded keys not in the oracle key list: {bogus} — "
                f"typo'd exclusions hide lost coverage\n")
            sys.exit(2)
        # ADVICE r9: gated ∪ excluded must COVER the full oracle key
        # list — an oracle key whose engine-side dump failed or was
        # never run would otherwise be absent from both sets while the
        # artifact reports all-PASS ("never silently dropped" means
        # exactly this check)
        uncovered = sorted(known - set(keys_in) - set(excluded))
        if uncovered:
            sys.stderr.write(
                f"{len(uncovered)} oracle keys neither gated nor "
                f"excluded: {uncovered} — every oracle key must be one "
                f"or the other\n")
            sys.exit(2)
    p = subprocess.run(
        [sys.executable, str(here / "diff_oracle.py"), sf_dir, out_dir]
        + keys_in,
        capture_output=True, text=True)
    keys, n_fail = parse_diff_oracle(p.stdout)
    if p.returncode != 0 and n_fail == 0:
        sys.stderr.write(f"diff_oracle.py exited rc={p.returncode} with no "
                         f"parsed FAILs; refusing to write artifact\n")
        sys.stderr.write(p.stderr[-4000:])
        sys.exit(2)
    n_pass = sum(1 for v in keys.values() if v.get("match"))
    if n_pass < 45:
        sys.stderr.write(f"only {n_pass} keys passed (< 45 floor); "
                         f"refusing to write artifact\n")
        sys.stderr.write(p.stderr[-4000:])
        sys.exit(2)
    probes, n_probe_fail = probe_no_oracle(out_dir, "100x")
    doc = {
        "round": rnd,
        "fixture": ("ScaleProbeSf1 synthetic at 100x the sf0.1 shape "
                    "(500k docs / 200k vectors / 15M orders / 60M lineitems "
                    "/ 10M events), full sf0.1 schemas, deterministic "
                    "hash-derived generator"),
        "method": ("graft.Verify on the 100x dir -> tools/diff_oracle.py "
                   "restricted to the listed keys (DuckDB oracle; "
                   "rows+schema+values exact, same gate as the driver t2)"),
        "why": ("VERDICT r7 task 5: extend the third-decade gate from the "
                "22 overflow/determinism-prone keys to the full r6 45-key "
                "heavy family (dedup/ANN/graph/text/sampling/storage) plus "
                "the r7 22 and the r8 additions"),
        "n_pass": n_pass,
        "n_fail": n_fail,
        "n_no_oracle": sum(1 for v in keys.values() if v.get("match") is None),
        "excluded": excluded,
        "no_oracle_probes": probes,
        "keys": dict(sorted(keys.items())),
    }
    Path("CORRECTNESS_100x.json").write_text(json.dumps(doc, indent=1) + "\n")
    print(f"pass={n_pass} fail={n_fail} "
          f"no_oracle={doc['n_no_oracle']} excluded={len(excluded)} "
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
