#!/bin/bash
# Round-9 100x gate: 157 feasible-oracle keys (162 dumped minus the 5
# selfcheckable exclusions; the 3 declared-O(n^2) baselines are also
# recorded as exclusions so every one of the 165 oracle keys is either
# gated or excluded — never silently dropped) against the
# already-completed engine dump in /tmp/v100x_r9_a. Engine shuffles are
# done, so DuckDB gets the whole disk (the r8 lesson: the two cannot
# share it).
cd /root/repo || exit 2
# gated keys = every oracle key with a dump present, minus exclusions
# (derived from the dump itself, not an ephemeral /tmp key list)
KEYS=$(python3 - <<'EOF'
import json, os
d = '/tmp/v100x_r9_a'
oracle = set(json.load(open(os.path.join(d, 'oracle_sql.json'))))
skip = {'q_dedup_semantic', 'q_dedup_semantic_t9', 'q_dedup_components',
        'q_dedup_embed_lsh', 'q_dedup_embed_lsh_t9'}
print(' '.join(sorted(k for k in oracle
                      if k not in skip and os.path.isdir(os.path.join(d, k)))))
EOF
)
python3 tools/gate_100x.py /tmp/graft_sfsyn_v2_100 /tmp/v100x_r9_a 9 \
  $KEYS \
  --excluded \
  "q_dedup_semantic=DuckDB oracle infeasible at 100x: the sqrt(n)-cell kmeans+pair SQL spills >70 GB temp and dies on disk (engine side completes in ~6 min); covered by the cross-JVM selfcheck section below and exact under the full 10x gate" \
  "q_dedup_semantic_t9=same oracle SQL as q_dedup_semantic at tau=0.9 - same 100x spill death; engine side serves the persisted pair artifact; covered by the selfcheck, exact under the 10x gate and SemanticIndexSpec's clustered-fixture recall pin" \
  "q_dedup_components=DuckDB oracle OOM at 100x even running alone (Out of Memory: 100.6 GiB used): the recursive transitive-closure CTE expands paths, not frontiers; engine side (per-round min-collapse) completes; covered by the selfcheck, exact under the 10x gate" \
  "q_dedup_embed_lsh=oracle-side infeasible at 100x: the DuckDB SQL expresses Hamming<=1 as an unbucketed band self-join (bit_count(xor)<=1) - 8 bands x ~2e10 pair predicates at 200k vectors. The r8 ENGINE-side exclusion is FIXED in r9 (band-batched candidates + broadcast recheck: completes in 314 s, disk peak 33%); covered by the selfcheck, exact under the 10x gate" \
  "q_dedup_embed_lsh_t9=oracle-side infeasible at 100x: same unbucketed Hamming band self-join, 4 bands x ~2e10 pair predicates; engine side measured exponent 1.01 at 100x; covered by the selfcheck, exact under the 10x gate (490k pairs on the clustered fixture)" \
  "q_dedup_embed=declared all-pairs ground-truth baseline: O(n^2) by semantics in BOTH engines (4e10 pairs x 64-dim dot at 200k vectors) - not run on either side; registered scale paths are the LSH/semantic siblings, gated or selfchecked here; exact under the 10x gate" \
  "q_sim_cosine_topk=declared brute-force ground-truth baseline: O(n^2) by semantics in both engines at the third decade - not run on either side; scale paths q_sim_ann_{lsh,ivf,pq} are gated here; exact under the 10x gate" \
  "q_sim_knn_label=consumer of the brute-force top-k neighbor producer, O(n^2) by semantics at the third decade - not run on either side; its mechanism is exact under the 10x gate and the ANN siblings cover the scale path"
