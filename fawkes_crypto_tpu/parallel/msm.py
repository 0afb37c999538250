"""Mesh-sharded Pippenger MSM (shard_map over the point axis).

The TPU-native analog of bellman_ce's multicore MSM worker (SURVEY.md §2.4
last row, §2.5): points and scalars are sharded across devices along one
mesh axis, every device runs the local scatter-free Pippenger of
ops/msm.py on its shard, and the D partial results (one Jacobian point
each) are combined with a log2(D) ppermute butterfly — point addition is
not a ring psum, so the reduction rides explicit ICI exchanges.

Scalars/points enter pre-sharded (..., N, K) like the distributed NTT.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.curve import Point, ec_add
from ..ops.msm import MSMCtx


class DistMSM:
    """Per (field ctx, N, mesh-axis) sharded MSM."""

    def __init__(self, f, n: int, mesh: Mesh, axis: str = "sp", c: int = 8):
        d = mesh.shape[axis]
        assert n % d == 0, "points must divide evenly across shards"
        self.mesh = mesh
        self.axis = axis
        self.d = d
        self.local = MSMCtx(f, n // d, c=c)
        self.f = f
        self._fns = {}  # (pts ndims, scalars ndim) -> shard_map-wrapped body

    def _body(self, pts, scalars):
        # shards arrive rank-preserved: coords (N/D, ...), scalars (N/D, K)
        acc = self.local.msm(pts, scalars)
        # butterfly all-reduce: after log2(D) exchange+add rounds every
        # device holds the full sum
        d = self.d
        mask = 1
        while mask < d:
            perm = [(i, i ^ mask) for i in range(d)]
            other = tuple(
                jax.lax.ppermute(c, self.axis, perm) for c in acc
            )
            acc = ec_add(self.f, acc, other)
            mask <<= 1
        return tuple(c[None] for c in acc)

    def make(self):
        """Returns msm(pts, scalars) over mesh-sharded inputs.

        pts: Jacobian coords each (N, ...) sharded along the first axis;
        scalars: (N, K) likewise. Output: single-point coords (replicated
        across shards, shard 0 returned).
        """
        def specs_for(pts):
            return tuple(
                P(self.axis, *([None] * (c.ndim - 1))) for c in pts
            )

        def run(pts, scalars):
            key = (tuple(c.ndim for c in pts), scalars.ndim)
            fn = self._fns.get(key)
            if fn is None:
                in_specs = (
                    specs_for(pts),
                    P(self.axis, *([None] * (scalars.ndim - 1))),
                )
                out_specs = tuple(
                    P(self.axis, *([None] * (c.ndim - 2))) for c in pts
                )
                # jit the shard_map: un-jitted it executes the body
                # primitive-by-primitive (hundreds of tiny sharded
                # executables + dispatch — the r4 dryrun's minutes-long
                # "compile"); jitted it is ONE compiled SPMD program
                fn = jax.jit(shard_map(
                    self._body, mesh=self.mesh,
                    in_specs=in_specs, out_specs=out_specs,
                    check_vma=False,
                ))
                self._fns[key] = fn
            out = fn(pts, scalars)
            # every shard holds the same sum; take shard 0
            return tuple(c[0] for c in out)

        return run
