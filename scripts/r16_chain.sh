#!/bin/bash
# Round-16 sequential campaign chain (run in tmux; each step exclusive).
# Steps: m12 re-gate (SPI audio fix) -> g4/g6 retry -> tails 1-3.
set -u
cd /root/repo
echo "=== m12 re-gate ==="
bash scripts/run_sf100_chunk.sh /tmp/sf100_r16_m12.txt /tmp/BENCH_r16_sf100_m12.json
echo "=== g4/g6 retry (sized partitions) ==="
bash scripts/run_sf100_chunk.sh /tmp/sf100_r16_g46.txt /tmp/BENCH_r16_sf100_g46.json
echo "=== tail 1 ==="
bash scripts/run_sf100_chunk.sh /tmp/sf100_r16_tail1.txt /tmp/BENCH_r16_sf100_tail1.json
echo "=== tail 2 ==="
bash scripts/run_sf100_chunk.sh /tmp/sf100_r16_tail2.txt /tmp/BENCH_r16_sf100_tail2.json
echo "=== tail 3 ==="
bash scripts/run_sf100_chunk.sh /tmp/sf100_r16_tail3.txt /tmp/BENCH_r16_sf100_tail3.json
echo "CHAIN_ALL_DONE"
