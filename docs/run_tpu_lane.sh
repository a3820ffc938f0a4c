#!/bin/bash
# Full TPU Mosaic test lane, sharded into chunks that each fit a relay
# window (round-3 verdict missing #2 / weak #3: the monolithic lane
# outgrew a single window and kept getting skipped under time pressure).
#
#   chunk1: everything but slow/subproc  (bulk of the suite)
#   chunk2: -m slow                      (416 px pipelines, sweeps)
#   chunk3: -m subproc                   (jax.distributed loopback pairs;
#           workers are CPU-mesh processes, but run it in the lane so the
#           logs cover the whole suite)
#
# The fast CI path (CPU) is:  pytest -m "not slow and not subproc"
cd /root/repo
R=${1:-r04}
for chunk in "1:not slow and not subproc" "2:slow" "3:subproc"; do
  n=${chunk%%:*}; expr=${chunk#*:}
  echo "=== chunk $n: -m \"$expr\" ==="
  DIE_TPU_TESTS_ON_TPU=1 timeout 3400 python -m pytest tests/ -q -m "$expr" \
    > "docs/TPU_LANE_${R}_chunk${n}.log" 2>&1
  echo "chunk $n rc=$?  $(tail -1 docs/TPU_LANE_${R}_chunk${n}.log)"
done
echo "LANE_DONE"
