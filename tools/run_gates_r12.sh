#!/bin/bash
# Round-12 gate refresh. Key-reachable code changed this round (core.t
# grew the env-gated SPARK_GRAFT_TXLOG_MIRROR facade hook; behavior
# with the env unset is the old parquet path), so unlike r10/r11 the
# ENGINE dumps are regenerated at BOTH decades on the r12 build:
#   - 10x: full dump + full DuckDB gate (tools/gate_10x.py) — fresh
#     oracle agreement on this build (run separately, see below).
#   - 100x: full fresh engine dump; tools/dump_equal.py against the
#     r9 dump as cross-build determinism evidence (any difference
#     aborts the recipe); then the FULL DuckDB diff on the fresh dump
#     (fresh oracle agreement, no transfer argument needed); probes +
#     selfcheck re-merged from the fresh dump (cross-build AND
#     cross-JVM).
set -eu
cd /root/repo

ORACLE_KEYS=$(python3 - <<'PYEOF'
import json, os
d = '/tmp/v100x_r9_a'
oracle = set(json.load(open(os.path.join(d, 'oracle_sql.json'))))
skip = {'q_dedup_semantic', 'q_dedup_semantic_t9', 'q_dedup_components',
        'q_dedup_embed_lsh', 'q_dedup_embed_lsh_t9',
        'q_dedup_embed', 'q_sim_cosine_topk', 'q_sim_knn_label'}
print(' '.join(sorted(oracle - skip)))
PYEOF
)
NO_ORACLE="q_agg_approx_hll q_agg_approx_quantile q_agg_approx_topk q_dedup_minhash q_dedup_simhash"
SELFCHECK="q_dedup_semantic q_dedup_semantic_t9 q_dedup_components q_dedup_embed_lsh q_dedup_embed_lsh_t9"

echo "=== [1/4] fresh 100x engine dump on the r12 build ==="
SPARK_GRAFT_CPUS=16 tools/run_direct.sh verify /tmp/graft_sfsyn_v2_100 /tmp/v100x_r12 \
  $ORACLE_KEYS $NO_ORACLE $SELFCHECK

echo "=== [2/4] cross-build dump equality (r12 vs the r9 oracle-diffed dump) ==="
python3 tools/dump_equal.py /tmp/v100x_r12 /tmp/v100x_r9_a \
  /tmp/dump_equal_100x_r12.json $ORACLE_KEYS

echo "=== [3/4] 100x gate artifact (FULL fresh DuckDB diff on the r12 dump) ==="
python3 tools/gate_100x.py /tmp/graft_sfsyn_v2_100 /tmp/v100x_r12 12 \
  $ORACLE_KEYS \
  --excluded \
  "q_dedup_semantic=DuckDB oracle infeasible at 100x: the sqrt(n)-cell kmeans+pair SQL spills >70 GB temp and dies on disk (engine side completes in ~6 min); covered by the cross-JVM selfcheck section below and exact under the full 10x gate" \
  "q_dedup_semantic_t9=same oracle SQL as q_dedup_semantic at tau=0.9 - same 100x spill death; engine side serves the persisted pair artifact; covered by the selfcheck, exact under the 10x gate and SemanticIndexSpec's clustered-fixture recall pin" \
  "q_dedup_components=DuckDB oracle OOM at 100x even running alone (Out of Memory: 100.6 GiB used): the recursive transitive-closure CTE expands paths, not frontiers; engine side (per-round min-collapse) completes; covered by the selfcheck, exact under the 10x gate" \
  "q_dedup_embed_lsh=oracle-side infeasible at 100x: the DuckDB SQL expresses Hamming<=1 as an unbucketed band self-join (bit_count(xor)<=1) - 8 bands x ~2e10 pair predicates at 200k vectors. Engine side completes (314 s, r9 band batching); DECLARED the bounded-n tau=0.5 recall baseline in r10 (SCALING round-10: sign-LSH's rho(0.5)=0.585 lower-bounds constant-recall work at n^1.585); covered by the selfcheck, exact under the 10x gate" \
  "q_dedup_embed_lsh_t9=oracle-side infeasible at 100x: same unbucketed Hamming band self-join, 4 bands x ~2e10 pair predicates; engine side measured exponent 1.01 at 100x; covered by the selfcheck, exact under the 10x gate (490k pairs on the clustered fixture)" \
  "q_dedup_embed=declared all-pairs ground-truth baseline: O(n^2) by semantics in BOTH engines (4e10 pairs x 64-dim dot at 200k vectors) - not run on either side; registered scale paths are the LSH/semantic siblings, gated or selfchecked here; exact under the 10x gate" \
  "q_sim_cosine_topk=declared brute-force ground-truth baseline: O(n^2) by semantics in both engines at the third decade - not run on either side; scale paths q_sim_ann_{lsh,ivf,pq} are gated here; exact under the 10x gate" \
  "q_sim_knn_label=consumer of the brute-force top-k neighbor producer, O(n^2) by semantics at the third decade - not run on either side; its mechanism is exact under the 10x gate and the ANN siblings cover the scale path"

echo "=== [4/4] selfcheck merge: fresh r12 dump vs the r9_b independent JVM ==="
python3 tools/gate_100x_selfcheck.py /tmp/v100x_r12 /tmp/v100x_r9_b 12 $SELFCHECK

echo "=== all r12 100x gates done ==="
