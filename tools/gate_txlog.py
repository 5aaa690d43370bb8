#!/usr/bin/env python3
"""Author CORRECTNESS_txlog.json: the full t2 contract served THROUGH
the txlog lakehouse facade (round-12 VERDICT task 4).

Usage:
  tools/run_direct.sh mirror <sfDir> <mirrorRoot>
  SPARK_GRAFT_TXLOG_MIRROR=<mirrorRoot> \
    tools/run_direct.sh verify <sfDir> <outDir>
  python3 tools/gate_txlog.py <sfDir> <outDir> <round>

Same diff as the driver's t2 (DuckDB oracle over the ORIGINAL parquet
fixtures; the engine side reads ONLY txlog tables), so a green
artifact proves the lakehouse read path — snapshot pinning, log-stats
file skipping, schema-from-log — serves the entire operator surface.
"""
import json
import subprocess
import sys
from pathlib import Path

from gatelib import parse_diff_oracle

def main():
    sf_dir, out_dir, rnd = sys.argv[1], sys.argv[2], int(sys.argv[3])
    here = Path(__file__).parent
    p = subprocess.run(
        [sys.executable, str(here / "diff_oracle.py"), sf_dir, out_dir],
        capture_output=True, text=True)
    keys, n_fail = parse_diff_oracle(p.stdout)
    if p.returncode != 0 and n_fail == 0:
        sys.stderr.write(f"diff_oracle.py rc={p.returncode}, nothing parsed; "
                         f"refusing to write artifact\n")
        sys.stderr.write(p.stderr[-4000:])
        sys.exit(2)
    if len(keys) < 100:
        sys.stderr.write(f"only {len(keys)} keys parsed; refusing\n")
        sys.exit(2)
    doc = {
        "round": rnd,
        "method": ("every core.t fixture read redirected through "
                   "spark.read.format('txlog') over TxLogMirror tables "
                   "(SPARK_GRAFT_TXLOG_MIRROR); oracle side unchanged "
                   "(DuckDB over the original parquet)"),
        "why": ("VERDICT r11 task 4: prove the lakehouse read path serves "
                "the entire operator surface, not just the storage keys"),
        "facade_fixes_found": [
            "core.t facade branch initially handled only LONG events ts; "
            "this environment's parquet-nanos inference serves NTZ through "
            "the mirror, so the branch now dispatches on the served type "
            "exactly like core.events (6 events-family keys were failing)"],
        "n_pass": sum(1 for v in keys.values() if v.get("match")),
        "n_fail": n_fail,
        "n_no_oracle": sum(1 for v in keys.values() if v.get("match") is None),
        "keys": dict(sorted(keys.items())),
    }
    Path("CORRECTNESS_txlog.json").write_text(json.dumps(doc, indent=1) + "\n")
    print(f"CORRECTNESS_txlog.json: {doc['n_pass']} pass, {n_fail} fail, "
          f"{doc['n_no_oracle']} no-oracle")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
