"""Parameter sharding rules for the optional 'model' mesh axis.

The reference's distribution story is pure data parallelism (SURVEY.md
§2.10); DP is therefore the default here too (params replicated). The
'model' axis exists so wider layouts can be expressed without
restructuring. The built-in rule set shards the SRF class-capsule layer —
the widest tensors in the model (out_n = vocab+1 output capsules) — across
'model'; XLA inserts the collectives for the routing softmax/sums.
"""

import re

import jax
from jax.sharding import NamedSharding, PartitionSpec as P


def srf_rules():
    """[(leaf-path regex, PartitionSpec)] — first match wins."""
    return [
        # last capsule layer: shard output capsules (dim 1 of W, dim 1 of b)
        (r"W\d+$", P(None, "model", None, None)),
        (r"b\d+$", P(None, "model", None)),
    ]


def fsdp_sharding(tree, mesh, axis="data", min_size=1024):
    """ZeRO/FSDP-style fully-sharded layout over the data axis.

    Each float leaf's largest axis-divisible dimension shards over
    ``axis``; small or indivisible leaves stay replicated. Apply to a whole
    TrainState pytree so the Adam moments shard exactly like their
    parameters. XLA SPMD inserts the all-gathers at use sites and
    reduce-scatters for the gradient/update — the reference has no analog
    (its params are mirrored per GPU, SURVEY.md §2.10); this is the
    idiomatic TPU upgrade for memory-bound configs.
    """
    n = mesh.shape.get(axis, 1)

    def leaf(x):
        if (n == 1 or not hasattr(x, "shape") or x.ndim == 0
                or x.size < min_size):
            return NamedSharding(mesh, P())
        for i in sorted(range(x.ndim), key=lambda i: -x.shape[i]):
            if x.shape[i] % n == 0:
                spec = [None] * x.ndim
                spec[i] = axis
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(leaf, tree)


def apply_rules(params, mesh, rules=None, only_last_layer=True):
    """Build a sharding pytree: replicated except where a rule matches.

    ``only_last_layer``: restrict W/b rules to the highest-numbered routing
    layer (class capsules); inner conv-capsule layers stay replicated (their
    out_n=CH is small).
    """
    if mesh.shape.get("model", 1) == 1:
        rules = []
    elif rules is None:
        rules = srf_rules()

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    # find the last routing layer index if present
    layer_ids = []
    for path, _ in flat:
        name = jax.tree_util.keystr(path)
        match = re.search(r"W(\d+)'?\]?$", name)
        if match:
            layer_ids.append(int(match.group(1)))
    last = max(layer_ids) if layer_ids else None

    def leaf_sharding(path, leaf):
        name = jax.tree_util.keystr(path)
        for pattern, spec in rules:
            if re.search(pattern, name.replace("']", "").replace("['", "/")):
                if only_last_layer and last is not None:
                    match = re.search(r"[Wb](\d+)", name)
                    if match and int(match.group(1)) != last:
                        continue
                if all(
                    s is None or leaf.shape[i] % mesh.shape[s] == 0
                    for i, s in enumerate(spec)
                ):
                    return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(leaf_sharding, params)
