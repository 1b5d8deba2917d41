#!/bin/bash
# Re-measure every README performance-table config as-shipped (one chip).
# Serial by design: the chip must not run concurrent work.
set -u
OUT=${1:-/tmp/bench_sweep.jsonl}
: > "$OUT"
run() {
  echo "== $*" >&2
  timeout 1800 python bench.py "$@" 2>/dev/null | tail -1 | tee -a "$OUT"
}
run --task push --num-envs 4096
run --task reach --num-envs 4096
run --task block_rearrange --num-block 2 --num-envs 4096
run --task block_stack --num-block 5 --num-envs 1024
run --task chest_push --num-block 4 --num-envs 1024
run --task chest_push --num-block 2 --num-envs 1024
run --task insertion --num-envs 1024
run --task primitive_push_reach --num-envs 1024
# image configs: the ray-caster's per-pixel intermediates OOM HBM above
# ~512 envs/chip (16.1G > 15.75G at 1024) — bench the largest fitting batch
run --task push --num-envs 512 --image 84
run --task push --num-envs 256 --image 128
