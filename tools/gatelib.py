"""Shared diff_oracle.py output parsing for the scale-gate authors
(gate_10x.py / gate_100x.py): one regex and one FAIL-why extraction
so a diff_oracle output-format change cannot silently diverge the two
gates' parsers (they had already drifted once before this existed).
"""
import re

_LINE = re.compile(r"(PASS|FAIL|SKIP) (\S+?):? \(?(\d+)?")


def parse_diff_oracle(stdout):
    """Returns ({key: result-dict}, n_fail) from diff_oracle stdout."""
    keys, n_fail = {}, 0
    for line in stdout.splitlines():
        m = _LINE.match(line)
        if not m:
            continue
        st, key, rows = m.groups()
        if st == "PASS":
            keys[key] = {"rows": int(rows), "match": True}
        elif st == "SKIP":
            keys[key] = {"rows": int(rows) if rows else None,
                         "match": None, "note": "declared no-oracle"}
        else:
            parts = line.split(":", 1)
            why = parts[1].strip() if len(parts) > 1 else line.strip()
            keys[key] = {"match": False, "why": why[:300]}
            n_fail += 1
    return keys, n_fail


def probe_no_oracle(out_dir, decade):
    """Execute-and-drift-check the declared no-oracle keys (VERDICT r9
    task 5): for each key in tools/no_oracle_probes.json[decade],
    count the dump's output rows (DuckDB over the parquet) and read
    its wall seconds from the dump's timings.json, then compare both
    against the committed expectations. Returns (section, n_fail):
    section is the "no_oracle_probes" artifact block; a missing dump
    dir, a rows ratio outside the tolerance, or a secs drift past the
    factor is a FAIL — never a silent skip (the q_dedup_simhash
    lesson: 74M bogus rows hid for three rounds exactly here).
    """
    import json as _json
    from pathlib import Path as _Path
    import duckdb
    exp_doc = _json.loads(
        (_Path(__file__).parent / "no_oracle_probes.json").read_text())
    exp = exp_doc[decade]
    rows_tol = exp_doc["rows_ratio_tolerance"]
    secs_fac = exp_doc["secs_drift_factor"]
    timings_p = _Path(out_dir) / "timings.json"
    timings = _json.loads(timings_p.read_text()) if timings_p.exists() else {}
    section, n_fail = {}, 0
    for key, e in sorted(exp.items()):
        entry = {"expected_rows": e["rows"], "expected_secs": e["secs"]}
        kdir = _Path(out_dir) / key
        if not kdir.is_dir():
            entry.update(status="FAIL",
                         why="no dump dir - the probe key was not executed "
                             "at this decade")
            n_fail += 1
            section[key] = entry
            continue
        rows = duckdb.sql(
            f"SELECT count(*) FROM '{kdir}/*.parquet'").fetchone()[0]
        secs = timings.get(key)
        entry.update(rows=rows, secs=secs)
        bad = []
        if not (e["rows"] / rows_tol <= rows <= e["rows"] * rows_tol):
            bad.append(f"rows {rows} vs expected {e['rows']} "
                       f"(tolerance x{rows_tol})")
        if secs is not None and secs > e["secs"] * secs_fac:
            bad.append(f"secs {secs} vs expected {e['secs']} "
                       f"(drift bound x{secs_fac})")
        if secs is None:
            entry["note"] = "no timings.json in dump (pre-r10 Verify?)"
        if bad:
            entry.update(status="FAIL", why="; ".join(bad))
            n_fail += 1
        else:
            entry["status"] = "PASS"
        section[key] = entry
    return section, n_fail
