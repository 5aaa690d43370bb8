#!/bin/bash
# Round-9 100x gate driver: oracle diff over the 157 feasible keys in
# /tmp/v100x_r9_a (the engine dump), with every infeasible key recorded
# as an exclusion. Run AFTER the engine dumps finish (disk discipline:
# engine shuffle scratch and DuckDB spill cannot share the VM disk).
set -eu
cd "$(dirname "$0")/.."
KEYS=$(python3 - <<'EOF'
import json
d = json.load(open('CORRECTNESS_r08.json'))
skip = {
    # oracle-infeasible (selfchecked instead)
    'q_dedup_semantic', 'q_dedup_semantic_t9', 'q_dedup_components',
    'q_dedup_embed_lsh', 'q_dedup_embed_lsh_t9',
    # declared O(n^2) ground-truth baselines: both engine and oracle
    # are quadratic at the third decade by semantics
    'q_dedup_embed', 'q_sim_cosine_topk', 'q_sim_knn_label',
}
no_oracle = {k for k, v in d.items() if v.get('err') == 'no_oracle'}
print(' '.join(sorted(k for k in d if k not in skip and k not in no_oracle)))
EOF
)
python3 tools/gate_100x.py /tmp/graft_sfsyn_v2_100 /tmp/v100x_r9_a 9 $KEYS \
  --excluded \
  "q_dedup_semantic=oracle infeasible at 100x: DuckDB spills >70GB on the sqrt(n)-cell chain (r8 measurement); engine-determinism selfcheck instead (see selfcheck section)" \
  "q_dedup_semantic_t9=oracle infeasible at 100x: re-pays the full semantic chain per key, same >70GB spill; engine serves the persisted pair artifact; selfchecked" \
  "q_dedup_components=oracle infeasible at 100x: DuckDB OOMs on the transitive-closure CTE; selfchecked" \
  "q_dedup_embed_lsh=oracle infeasible at 100x: the unbucketed band self-join (bit_count(xor)<=1) is ~1.6e11 predicate evaluations; ENGINE side now completes at 100x via r9 band batching - selfchecked" \
  "q_dedup_embed_lsh_t9=oracle infeasible at 100x: same unbucketed band self-join shape (~8e10 evaluations at 200k vectors); engine exponent 1.01 (r7 probe); selfchecked" \
  "q_dedup_embed=declared all-pairs ground-truth baseline: O(n^2) by semantics in BOTH engines (4e10 pairs x 64-dim dot at 200k vectors); registered scale paths are the LSH/semantic siblings, which are gated/selfchecked here" \
  "q_sim_cosine_topk=declared brute-force ground-truth baseline: O(n^2) by semantics in both engines at the third decade; scale paths q_sim_ann_{lsh,ivf,pq} are gated" \
  "q_sim_knn_label=consumer of the brute-force top-k neighbor producer, O(n^2) by semantics at the third decade; its mechanism is gated at 10x (exact) and the ANN siblings cover the scale path"
