#!/bin/bash
# First-chip-session queue after the 2026-08-18 tunnel outage.
# Run from /root/repo. Each step logs to data/chiplogs/; later steps depend
# on earlier results (the microbench decides block vs compact vs mixed), so
# REVIEW LOGS BETWEEN STEPS when running manually.
set -x
mkdir -p data/chiplogs
cd /root/repo

# 1. hardware kernel tests (includes the new compact kernel gate)
timeout 1800 python -m pytest tests_tpu -q 2>&1 | tee data/chiplogs/01_tests_tpu.log

# 2. gather microbench: vg ns/vcol (decides everything downstream)
timeout 1800 python scripts/microbench_gather.py 2>&1 | tee data/chiplogs/02_gather.log

# 3. headline, v1 block (the current default; also warms the jit cache)
timeout 3600 python bench.py 2>&1 | tee data/chiplogs/03_bench_block.log

# 4. RETIRED 2026-08-18: Mosaic dynamic_gather is vreg-local on this
# backend, the compact kernel cannot lower (EXPERIMENTS.md). These exit
# immediately with the reason; kept for a future backend whose probe flips.
# timeout 3600 python bench.py --impl mixed 2>&1 | tee data/chiplogs/04_bench_mixed.log
# timeout 3600 python bench.py --impl compact 2>&1 | tee data/chiplogs/05_bench_compact.log

# 5. trainer-level headline (same code path as the product)
timeout 3600 python bench.py --trainer 2>&1 | tee data/chiplogs/06_trainer_block.log

# 6. products-scale fit + throughput (hidden 256, bf16, remat variants)
timeout 3600 python scripts/bench_products.py --min_edges 192 2>&1 | tee data/chiplogs/07_products_raw.log
timeout 5400 python scripts/bench_products.py --trainer --min_edges 192 2>&1 | tee data/chiplogs/08_products_trainer.log
