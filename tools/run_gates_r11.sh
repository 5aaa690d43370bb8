#!/bin/bash
# Round-11 100x gate refresh. The 10x gate was already regenerated on
# this build (CORRECTNESS_10x.json round 11, 165/165 + probes). For
# 100x the r9 engine dump (/tmp/v100x_r9_a) is reused for the oracle
# keys — NO registered-key code changed in r10 or r11 (r11 touched
# only the unregistered TxLog/GraftBridge modules) — with the 5
# no-oracle probe keys RE-DUMPED fresh so the probe section reads
# real r11 executions, exactly the r10 precedent.
set -eu
cd /root/repo

echo "=== [1/3] 100x re-dump of the no-oracle probe keys ==="
SPARK_GRAFT_CPUS=16 tools/run_direct.sh verify /tmp/graft_sfsyn_v2_100 /tmp/v100x_r9_a \
  q_agg_approx_hll q_agg_approx_quantile q_agg_approx_topk \
  q_dedup_minhash q_dedup_simhash

echo "=== [2/3] 100x gate (157 oracle keys + coverage + probes) ==="
KEYS=$(python3 - <<'EOF'
import json, os
d = '/tmp/v100x_r9_a'
oracle = set(json.load(open(os.path.join(d, 'oracle_sql.json'))))
skip = {'q_dedup_semantic', 'q_dedup_semantic_t9', 'q_dedup_components',
        'q_dedup_embed_lsh', 'q_dedup_embed_lsh_t9',
        'q_dedup_embed', 'q_sim_cosine_topk', 'q_sim_knn_label'}
missing = sorted(k for k in oracle
                 if k not in skip and not os.path.isdir(os.path.join(d, k)))
assert not missing, f"oracle keys without a dump: {missing}"
print(' '.join(sorted(oracle - skip)))
EOF
)
python3 tools/gate_100x.py /tmp/graft_sfsyn_v2_100 /tmp/v100x_r9_a 11 \
  $KEYS \
  --excluded \
  "q_dedup_semantic=DuckDB oracle infeasible at 100x: the sqrt(n)-cell kmeans+pair SQL spills >70 GB temp and dies on disk (engine side completes in ~6 min); covered by the cross-JVM selfcheck section below and exact under the full 10x gate" \
  "q_dedup_semantic_t9=same oracle SQL as q_dedup_semantic at tau=0.9 - same 100x spill death; engine side serves the persisted pair artifact; covered by the selfcheck, exact under the 10x gate and SemanticIndexSpec's clustered-fixture recall pin" \
  "q_dedup_components=DuckDB oracle OOM at 100x even running alone (Out of Memory: 100.6 GiB used): the recursive transitive-closure CTE expands paths, not frontiers; engine side (per-round min-collapse) completes; covered by the selfcheck, exact under the 10x gate" \
  "q_dedup_embed_lsh=oracle-side infeasible at 100x: the DuckDB SQL expresses Hamming<=1 as an unbucketed band self-join (bit_count(xor)<=1) - 8 bands x ~2e10 pair predicates at 200k vectors. Engine side completes (314 s, r9 band batching); DECLARED the bounded-n tau=0.5 recall baseline in r10 (SCALING round-10: sign-LSH's rho(0.5)=0.585 lower-bounds constant-recall work at n^1.585); covered by the selfcheck, exact under the 10x gate" \
  "q_dedup_embed_lsh_t9=oracle-side infeasible at 100x: same unbucketed Hamming band self-join, 4 bands x ~2e10 pair predicates; engine side measured exponent 1.01 at 100x; covered by the selfcheck, exact under the 10x gate (490k pairs on the clustered fixture)" \
  "q_dedup_embed=declared all-pairs ground-truth baseline: O(n^2) by semantics in BOTH engines (4e10 pairs x 64-dim dot at 200k vectors) - not run on either side; registered scale paths are the LSH/semantic siblings, gated or selfchecked here; exact under the 10x gate" \
  "q_sim_cosine_topk=declared brute-force ground-truth baseline: O(n^2) by semantics in both engines at the third decade - not run on either side; scale paths q_sim_ann_{lsh,ivf,pq} are gated here; exact under the 10x gate" \
  "q_sim_knn_label=consumer of the brute-force top-k neighbor producer, O(n^2) by semantics at the third decade - not run on either side; its mechanism is exact under the 10x gate and the ANN siblings cover the scale path"

echo "=== [3/3] cross-JVM selfcheck merge (r9 dumps, keys unchanged r10+r11) ==="
python3 tools/gate_100x_selfcheck.py /tmp/v100x_r9_a /tmp/v100x_r9_b 11 \
  q_dedup_semantic q_dedup_semantic_t9 q_dedup_components \
  q_dedup_embed_lsh q_dedup_embed_lsh_t9

echo "=== all r11 gates done ==="
