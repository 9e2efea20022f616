"""Checkpoint inspection: steps, subtrees, shapes/dtypes, param counts.

Ops tooling the reference lacks (its nearest analog is rebuilding the
whole model just to call ``model.summary()``, reference:
tfsr/trainer_sr.py:248). Template-free restore onto host CPU — no model
build, no accelerator work, safe on checkpoints from ANY topology
(loads the tree into host RAM; fine at this framework's model scales).

Run:
    python -m srf_tpu.tools.ckpt_info /path/to/ckpt [--step N] [--full]
"""

import sys

import numpy as np


def _walk(tree, prefix=""):
    """Yield (path, leaf-metadata) from an orbax metadata item tree."""
    if isinstance(tree, dict):
        for key in sorted(tree):
            yield from _walk(tree[key], prefix + "/" + str(key))
        return
    yield prefix, tree


def describe(ckpt_path, step=None, full=False, out=sys.stdout):
    import warnings

    import jax
    import orbax.checkpoint as ocp

    from srf_tpu.utils.checkpoint import CheckpointManager

    manager = CheckpointManager(ckpt_path)
    steps = manager.all_steps()
    if not steps:
        out.write("no checkpoints under %s\n" % ckpt_path)
        return 1
    step = step if step is not None else steps[-1]
    out.write("checkpoint dir: %s\n" % ckpt_path)
    out.write("steps on disk:  %s\n" % ", ".join(str(s) for s in steps))
    out.write("inspecting:     step %d\n" % step)
    # template-free restore onto host CPU: inspection must not need the
    # model (or the topology) that wrote the checkpoint
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        with jax.default_device(jax.devices("cpu")[0]):
            tree = manager.manager.restore(
                step, args=ocp.args.StandardRestore()
            )
    groups = {}
    for path, leaf in _walk(tree):
        top = path.split("/")[1] if path.count("/") else path
        arr = np.asarray(leaf)
        shape, dtype = tuple(arr.shape), arr.dtype
        n = int(np.prod(shape)) if shape else 1
        groups.setdefault(top, []).append((path, shape, dtype, n))
    for top in sorted(groups):
        leaves = groups[top]
        total = sum(n for _, _, _, n in leaves)
        out.write(
            "  %-16s %4d leaves, %12s params\n"
            % (top, len(leaves), format(total, ","))
        )
        if full:
            for path, shape, dtype, n in leaves:
                out.write(
                    "    %-64s %-14s %s\n"
                    % (path, "x".join(map(str, shape)) or "scalar", dtype)
                )
    has_ema = "ema_params" in groups
    out.write(
        "EMA weights:    %s\n" % ("present (serve with --tpu-decode-ema)"
                                  if has_ema else "absent")
    )
    manager.close()
    return 0


def main(argv=None):
    argv = list(argv if argv is not None else sys.argv[1:])
    step, full, pos = None, False, []
    it = iter(argv)
    for arg in it:
        if arg == "--full":
            full = True
        elif arg == "--step" or arg.startswith("--step="):
            val = arg.split("=", 1)[1] if "=" in arg else next(it, None)
            if not val:
                raise SystemExit("--step requires a value")
            step = int(val)
        else:
            pos.append(arg)
    if len(pos) != 1:
        print("usage: python -m srf_tpu.tools.ckpt_info <ckpt_dir> "
              "[--step N] [--full]")
        return 1
    return describe(pos[0], step=step, full=full)


if __name__ == "__main__":
    raise SystemExit(main())
