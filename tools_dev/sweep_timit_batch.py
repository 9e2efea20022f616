"""TIMIT-class SDR batch-amortization sweep on the FACTORED kernel.

VERDICT r3 item 1: the only prior TIMIT batch-scaling number (1,875
utt/s at batch 116, r2) predates the factored default. This measures the
current default kernel at the reference batch and 2/4/8x, reusing
bench.py's canonical workload builder (same model, shapes, mesh, remat).

Run: python tools_dev/sweep_timit_batch.py [--batches 29,58,116,232]
"""

import argparse
import json
import sys

sys.path.insert(0, ".")

import bench


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batches", default="29,58,116,232,464")
    parser.add_argument("--warmup", type=int, default=3)
    parser.add_argument("--iters", type=int, default=20)
    args = parser.parse_args()

    from srf_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    for b in map(int, args.batches.split(",")):
        row = bench.section_srf_timit_batch(b, args.warmup, args.iters)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
