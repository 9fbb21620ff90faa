"""Multi-chip sharding: mesh construction and sharded kernels.

The reference's only parallelism is GNU-parallel process fan-out on one box
(SURVEY.md §2.6); here the same axes map onto a jax.sharding.Mesh:

  * batch axis ("batch"): independent proof batches (layer-1/2 chains) —
    the reference's `parallel prove_layers_one_two` — run as independent
    program instances over mesh rows.
  * data axis ("data"): *within* one proof, MSM points / NTT rows / Merkle
    leaves are sharded across chips — parallelism the reference cannot do.

MSM combine: each shard computes a full local Pippenger over its points
(zkpoa_tpu.ops.msm.msm_impl inside shard_map); the per-shard Jacobian
results (one point each) are jointly reduced with a log-depth tree of
unified adds after an implicit all-gather. Collectives ride ICI; on
multi-host slices the same code spans DCN through the global mesh.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..ops import msm as msm_mod
from ..ops.curve_jax import Jac


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def msm_sharded(
    curve,
    xs,
    ys,
    scalars: jnp.ndarray,
    mesh: Mesh,
    n_bits: int = 254,
    c: int = msm_mod.DEFAULT_WINDOW_BITS,
    axis: str = "data",
) -> Jac:
    """MSM with points+scalars sharded along `axis` of `mesh`. Returns an
    unsharded Jacobian point. N must divide the axis size (pad with
    point_valid=False upstream if needed)."""
    from jax.experimental.shard_map import shard_map

    ndev = mesh.shape[axis]

    def local(xs_l, ys_l, sc_l):
        p = msm_mod.msm_impl(curve, xs_l, ys_l, sc_l, n_bits, c)
        return jax.tree.map(lambda l: l[None], p)  # leaf [1, ...]

    spec_pts = jax.tree.map(lambda _: P(axis), xs)
    partials = shard_map(
        local,
        mesh=mesh,
        in_specs=(spec_pts, jax.tree.map(lambda _: P(axis), ys), P(axis)),
        out_specs=jax.tree.map(lambda _: P(axis), xs),
        check_rep=False,
    )(xs, ys, scalars)
    # partials leaves: [ndev, ...]; tree-reduce (log2 ndev unified adds)
    m = ndev
    reduced = partials
    while m > 1:
        half = m // 2
        left = jax.tree.map(lambda l: l[:half], reduced)
        right = jax.tree.map(lambda l: l[half : 2 * half], reduced)
        summed = curve.add(left, right)
        if m % 2:
            tail = jax.tree.map(lambda l: l[m - 1 : m], reduced)
            first = jax.tree.map(lambda l: l[:1], summed)
            rest = jax.tree.map(lambda l: l[1:], summed)
            first = curve.add(first, tail)
            summed = jax.tree.map(
                lambda f, r: jnp.concatenate([f, r], axis=0), first, rest
            )
        reduced = summed
        m = half
    return jax.tree.map(lambda l: l[0], reduced)


def shard_leading(arr_tree, mesh: Mesh, axis: str = "data"):
    """Place a pytree of arrays with the leading dim sharded over `axis`."""
    def put(a):
        return jax.device_put(a, NamedSharding(mesh, P(axis)))

    return jax.tree.map(put, arr_tree)


def replicate(arr_tree, mesh: Mesh):
    def put(a):
        return jax.device_put(a, NamedSharding(mesh, P()))

    return jax.tree.map(put, arr_tree)
