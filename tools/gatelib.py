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
