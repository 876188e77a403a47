#!/bin/bash
# Round-5 chip queue — serialized jobs on the single tunneled v5e.
# Run from /root/repo; logs under /tmp/chipq_*.log
set -u
cd /root/repo

echo "=== [1/4] papers100M GCN rows (hbm + cache) ==="
timeout 7200 python exp/table1/run_papers100m.py \
  --model gcn --rows hbm cache --skip-stages \
  > /tmp/chipq_gcn.log 2>&1
echo "gcn rc=$?"

echo "=== [2/4] papers100M PinSAGE hbm row ==="
timeout 4800 python exp/table1/run_papers100m.py \
  --model pinsage --rows hbm --skip-stages \
  > /tmp/chipq_pinsage.log 2>&1
echo "pinsage rc=$?"

echo "=== [3/4] cost-model hold-out ==="
timeout 7200 python tools/validate_cost_model.py --sigs \
  graphsage-n200000-b2000-f5x10x15-khop0 \
  gcn-n200000-b2000-f5x10x15-khop2 \
  pinsage-n200000-b2000-f5x10x15-random_walk \
  graphsage-n200000-b8000-f5x10x15-khop0 \
  > /tmp/chipq_holdout.log 2>&1
echo "holdout rc=$?"

echo "=== [4/4] uk-union arch0 epoch (2.26B edges, int64 indptr) ==="
timeout 5400 python tools/ukunion_rehearsal.py --num-epoch 2 \
  > /tmp/chipq_ukunion.log 2>&1
echo "ukunion rc=$?"

echo "=== chip queue done ==="
