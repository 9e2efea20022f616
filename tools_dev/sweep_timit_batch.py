"""TIMIT-class SDR batch-amortization sweep on the FACTORED kernel.

VERDICT r3 item 1: the only prior TIMIT batch-scaling number (1,875
utt/s at batch 116, r2) predates the factored default. This measures the
current default kernel at the reference batch and 2/4/8x, reusing
bench.py's canonical workload builder (same model, shapes, mesh, remat).

Run: python tools_dev/sweep_timit_batch.py [--batches 29,58,116,232]
         [--bf16]   # same sweep with the bf16 SDR body (routing_bf16)
"""

import argparse
import functools
import json
import sys

sys.path.insert(0, ".")

import bench


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batches", default="29,58,116,232,464")
    parser.add_argument("--warmup", type=int, default=3)
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--bf16", action="store_true",
                        help="measure with routing_bf16=True (the bf16 "
                             "SDR body; -7.9%% on WSJ, r3)")
    args = parser.parse_args()

    from srf_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    if args.bf16:
        # bench.build_workload constructs SequenceRouter by keyword; a
        # partial pins the bf16 flag without touching bench.py
        from srf_tpu.models import srf as _srf

        bench.__dict__  # imported above; patch the module it reads from
        _srf.SequenceRouter = functools.partial(
            _srf.SequenceRouter, routing_bf16=True)
    for b in map(int, args.batches.split(",")):
        row = bench.section_srf_timit_batch(b, args.warmup, args.iters)
        if args.bf16:
            row["routing_bf16"] = True
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
