#!/bin/bash
# One-window chip session: correctness gate first, then headline bench,
# then protocol tables. Each phase has its own timeout so a mid-run
# tunnel stall can't eat the session. Logs to /tmp/chip_*.log.
set -x
cd /root/repo

echo "=== phase 1: whole-scan kernel verify + timing ==="
timeout 1800 env PYTHONPATH=/root/repo:/root/.axon_site \
  python tools/chip/chip_sparse_verify.py 2>&1 | tee /tmp/chip_verify.log
v=$?
# record but continue: the later phases exercise the already-verified
# lattice kernels and their own escapes, they do not depend on phase 1
if [ $v -ne 0 ]; then echo "PHASE1 VERIFY FAILED/STALLED rc=$v (continuing)"; fi

echo "=== phase 1b: factored paths + decode kernels verify ==="
timeout 1800 env PYTHONPATH=/root/repo:/root/.axon_site \
  python tools/chip/chip_factored_verify.py 2>&1 | tee /tmp/chip_factored.log

echo "=== phase 1c: forced-step diff at composed-LM scale ==="
timeout 1800 env PYTHONPATH=/root/repo:/root/.axon_site \
  python tools/chip/chip_step_scale_diff.py 2>&1 | tee /tmp/chip_stepscale.log

echo "=== phase 2: headline bench ==="
timeout 1800 python bench.py > /tmp/chip_bench.json 2> /tmp/chip_bench.log
cat /tmp/chip_bench.json

echo "=== phase 3: transducer protocol table ==="
(cd benchmarks && timeout 2400 env PYTHONPATH=/root/repo:/root/.axon_site python transducer_benchmark.py 8) \
  2>&1 | tee /tmp/chip_transducer.log

echo "=== phase 4: stc + asg protocols ==="
(cd benchmarks && timeout 1200 env PYTHONPATH=/root/repo:/root/.axon_site python stc_benchmark.py 32) \
  2>&1 | tee /tmp/chip_stc.log
(cd benchmarks && timeout 1200 env PYTHONPATH=/root/repo:/root/.axon_site python asg_benchmark.py 32) \
  2>&1 | tee /tmp/chip_asg.log
echo "=== phase 5: chip throughput / MFU refresh ==="
(cd benchmarks && timeout 1800 env PYTHONPATH=/root/repo:/root/.axon_site python scaling_benchmark.py --local_batch 64) \
  2>&1 | tee /tmp/chip_scaling.log

echo "=== phase 6: ngram2 train step ==="
(cd benchmarks && timeout 1800 env PYTHONPATH=/root/repo:/root/.axon_site python train_step_benchmark.py 32 --ngram2) \
  2>&1 | tee /tmp/chip_trainstep_ngram2.log

echo "=== phase 6b: custom-VJP / dense-tier A/Bs (round 5) ==="
for d in drive_vjp drive_stc drive_wd drive_asg; do
  timeout 2400 env PYTHONPATH=/root/repo:/root/.axon_site \
    python tools/chip/drives/$d.py 2>&1 | tee /tmp/chip_$d.log
done

echo "=== phase 7: timing-methodology sanity (runs LAST: readback) ==="
timeout 1800 env PYTHONPATH=/root/repo:/root/.axon_site \
  python tools/chip/chip_timing_sanity.py 2>&1 | tee /tmp/chip_timing.log
echo "=== chip session done ==="
