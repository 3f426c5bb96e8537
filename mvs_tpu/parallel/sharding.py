"""Sharding plans: how batches, params, and cost volumes lay out on the mesh.

Under pjit/GSPMD, annotating the big intermediates is all that's needed —
XLA inserts the collectives (psum for batch-sharded BN/grads, halo exchange
for depth/space-sharded 3D convs). This module centralizes those annotations.
"""

from __future__ import annotations

import dataclasses
import logging

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)

# Axes already warned about (axis name, reason extent) — warn once per axis
# so a scan over stages doesn't spam, but the first silent de-shard is loud.
_warned_axes: set[str] = set()
# Axes folded into another dim's sharding instead of dropped (e.g. a D=8
# refine-stage volume keeps the mesh 'depth' axis busy by sharding H over
# ('space', 'depth')). Informational; reset alongside _warned_axes.
_folded_axes: set[str] = set()

__all__ = ["ShardingPlan", "data_parallel_plan", "volume_sharded_plan",
           "shard_batch", "replicate"]


@dataclasses.dataclass(frozen=True)
class ShardingPlan:
    """PartitionSpecs for the pipeline's key tensors.

    batch_spec:  leading dim of every per-sample input (imgs, projs, depths)
    volume_spec: the (B, D, H, W, C) cost volume / regularizer activations
    depth_spec:  (B, D, H, W) score/prob volumes
    views_spec:  the (B, V, D, H, W, C) per-source-view warped feature stack
                 (before moment reduction) — sharding V over 'view' makes
                 GSPMD finish the Σf/Σf² reduction with one psum over ICI
                 (the pjit form of collectives.view_sharded_variance_volume)

    The constrain_* methods apply the spec with a SHAPE-AWARE GUARD on the
    'depth'/'space' axes: an axis is only pinned to the mesh if its extent at
    the cost regularizer's deepest stride-2 level (extent >> unet_levels)
    stays >= max(3, axis_size). Below that, XLA GSPMD's halo-exchange
    transpose miscompiles conv KERNEL gradients — measured on jax 0.9.0 CPU:
    forward and input grads exact, but encoder kernel grads scale by exact
    powers of two (4x at a D=16 volume sharded depth=2, whose deepest level
    is D=2). Regression-pinned by
    tests/test_parallel.py::test_small_extent_axes_are_not_sharded and the
    volume-sharded train parity test. Real configs hit this too (CasMVSNet
    stage 3 sweeps D=8), so the guard is semantic, not test plumbing.
    """

    mesh: Mesh
    batch_spec: P
    volume_spec: P
    depth_spec: P
    views_spec: P = P()
    unet_levels: int = 3  # stride-2 levels in UNetCostRegNet

    def _guarded(self, spec: P, shape, levels: int | None = None) -> P:
        """Apply the small-extent guard; `levels` is the number of stride-2
        encoder levels the tensor passes through (defaults to the U-Net depth
        for volume-path tensors; pass 0 for tensors that never enter the
        encoder, e.g. the regularizer's output scores).

        An axis whose own dim is too small is NOT silently dropped: it is
        FOLDED into another guarded dim whose extent can absorb the combined
        device count (P supports tuples of mesh axes per dim). E.g. a
        CasMVSNet stage-3 volume (B, 8, 864, 1152, C) on a depth=2, space=2
        mesh shards H over ('space', 'depth') — all four devices hold
        distinct volume shards and the mesh 'depth' capacity stays busy at
        the real extent, rather than two devices idling while D=8 runs
        replicated. Only when no dim can absorb it is the axis dropped (with
        the loud one-time warning)."""
        if levels is None:
            levels = self.unet_levels

        def mesh_n(names):
            n = 1
            for a in names:
                n *= self.mesh.shape.get(a, 1)
            return n

        def fits(i, names):
            n = mesh_n(names)
            return n <= 1 or (shape[i] >> levels) >= max(3, n)

        # Normalize: each dim -> list of live model/data axes on it.
        entries: list[list] = []
        for axis in spec:
            if axis is None:
                entries.append([])
            elif isinstance(axis, (tuple, list)):
                entries.append([a for a in axis
                                if self.mesh.shape.get(a, 1) > 1])
            else:
                entries.append([axis] if self.mesh.shape.get(axis, 1) > 1
                               else [])

        # Evict guarded axes from dims that fail the extent test.
        homeless: list[str] = []
        for i, names in enumerate(entries):
            while any(a in ("depth", "space") for a in names) and not fits(i, names):
                # Evict 'depth' before 'space' (space dims are the larger
                # absorbers, so keeping 'space' in place maximizes the chance
                # both survive).
                victim = ("depth" if "depth" in names else "space")
                names.remove(victim)
                homeless.append(victim)

        # Re-home evicted axes onto dims that can absorb them. Candidate
        # dims: interior dims (not batch dim 0, not the trailing channel
        # dim) that don't carry 'data'/'view', preferring dims already
        # sharded on a guarded axis (i.e. the spatial dim).
        for victim in list(homeless):
            cands = [i for i in range(1, max(1, len(entries) - 1))
                     if not any(a in ("data", "view") for a in entries[i])]
            cands.sort(key=lambda i: -len(entries[i]))
            for i in cands:
                if fits(i, entries[i] + [victim]):
                    entries[i] = entries[i] + [victim]
                    homeless.remove(victim)
                    if victim not in _folded_axes:
                        _folded_axes.add(victim)
                        logger.info(
                            "ShardingPlan: mesh axis %r folded into dim %d's "
                            "sharding (own dim too small at the deepest "
                            "U-Net level).", victim, i)
                    break

        for victim in homeless:
            if victim not in _warned_axes:
                _warned_axes.add(victim)
                logger.warning(
                    "ShardingPlan: dropping requested mesh axis %r for a "
                    "tensor of shape %s: no dim can absorb it (deepest "
                    "U-Net level extents all < max(3, n)); small-extent "
                    "sharded conv gradients miscompile under GSPMD — the "
                    "tensor stays unsharded on this axis.",
                    victim, tuple(shape),
                )

        out = []
        for names in entries:
            if not names:
                out.append(None)
            elif len(names) == 1:
                out.append(names[0])
            else:
                out.append(tuple(names))
        return P(*out)

    def constrain_volume(self, vol: jnp.ndarray) -> jnp.ndarray:
        spec = self._guarded(self.volume_spec, vol.shape)
        return jax.lax.with_sharding_constraint(
            vol, NamedSharding(self.mesh, spec)
        )

    def constrain_scores(self, s: jnp.ndarray) -> jnp.ndarray:
        # Scores are the regularizer OUTPUT: they never pass through the
        # stride-2 encoder, so only the final 3x3x3 conv's halo matters —
        # guard at levels=0 (kept shardable down to per-shard extent 3).
        spec = self._guarded(self.depth_spec, s.shape, levels=0)
        return jax.lax.with_sharding_constraint(
            s, NamedSharding(self.mesh, spec)
        )

    def constrain_views(self, warped: jnp.ndarray) -> jnp.ndarray:
        spec = self._guarded(self.views_spec, warped.shape)
        return jax.lax.with_sharding_constraint(
            warped, NamedSharding(self.mesh, spec)
        )


def data_parallel_plan(mesh: Mesh) -> ShardingPlan:
    """Pure DP: batch over 'data'; volumes follow the batch."""
    return ShardingPlan(
        mesh=mesh,
        batch_spec=P("data"),
        volume_spec=P("data", None, None, None, None),
        depth_spec=P("data", None, None, None),
        views_spec=P("data", None, None, None, None, None),
    )


def volume_sharded_plan(mesh: Mesh) -> ShardingPlan:
    """DP + model parallelism inside each volume: source views over 'view',
    depth slabs over 'depth', spatial rows over 'space'. GSPMD handles
    3D-conv halos; the softmax over the sharded D axis becomes an all-reduce
    of max/sum, and the view-stack moment reduction becomes a psum — all
    automatic."""
    return ShardingPlan(
        mesh=mesh,
        batch_spec=P("data"),
        volume_spec=P("data", "depth", "space", None, None),
        depth_spec=P("data", "depth", "space", None),
        views_spec=P("data", "view", "depth", "space", None, None),
    )


def shard_batch(mesh: Mesh, batch, spec: P = P("data")):
    """Place a pytree of host arrays onto the mesh, batch-dim sharded."""
    sharding = NamedSharding(mesh, spec)

    def _put(x):
        x = jnp.asarray(x)
        tspec = P(*(spec + (None,) * (x.ndim - len(spec))))
        return jax.device_put(x, NamedSharding(mesh, tspec))

    return jax.tree.map(_put, batch)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (params, opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
