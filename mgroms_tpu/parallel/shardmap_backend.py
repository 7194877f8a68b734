"""Explicit shard_map backend: per-shard operators + ppermute halo exchange.

The GSPMD backend (parallel/backend.py) expresses the solve on global
arrays and lets XLA choose the collectives; operators are replicated.  This
backend is the reference's actual distribution contract made explicit
(mg_mpi_exchange.f90 / mg_grids.f90):

  - every sharded level's operator is stored *per-shard extended* — each
    device holds its (8, nz, ny_l+2, nx_l+2) tile, halo ring included, the
    TPU image of the per-rank ``cA(nd,nz,0:ny+1,0:nx+1)`` allocation
    (mg_grids.f90:24-65) — no replication cost;
  - halo refresh is an explicit two-phase ppermute exchange
    (parallel/exchange.py), one per smoother color, exactly the
    fill_halo-per-color protocol (mg_relax.f90:181);
  - the red-black parity is computed from the shard's global origin
    (axis_index * tile), the image of the reference's global (i+j) color
    rule on local loop bounds;
  - levels below the agglomeration threshold stay replicated and run the
    single-device code path (replicate-not-idle, mg_gather.f90).

Iterates are identical to the single-device solver: seam halos carry
neighbour interior values, domain-edge halos the Neumann mirror — the same
extended array extend_h1 builds globally.
"""

from __future__ import annotations

from functools import partial
from typing import List

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..assembly import LevelOperator
from ..config import SolverConfig
from ..levels import LevelSpec
from ..ops import relax as relax_ops
from ..ops import stencil, transfer
from .backend import DistributedBackend
from .exchange import axis_offsets, block_extended, halo_extend
from .mesh import MeshPlan

_SPEC3 = P(None, "py", "px")
_SPEC4 = P(None, None, "py", "px")


def shard_operators_blocked(ops: List[LevelOperator], plan: MeshPlan
                            ) -> List[LevelOperator]:
    """Sharded levels: cA in per-shard-extended blocked layout, one tile per
    device.  Replicated levels: unchanged replicated placement."""
    npy, npx = plan.mesh.devices.shape
    repl = NamedSharding(plan.mesh, P())
    blk = NamedSharding(plan.mesh, _SPEC4)
    out = []
    for lev, op in enumerate(ops):
        if plan.shards[lev].sharded:
            cA = jax.device_put(block_extended(op.cA, npy, npx), blk)
        else:
            cA = jax.device_put(op.cA, repl)
        out.append(LevelOperator(
            cA=cA,
            umask=jax.device_put(op.umask, repl),
            vmask=jax.device_put(op.vmask, repl),
            Ainv=None if op.Ainv is None else jax.device_put(op.Ainv, repl),
        ))
    return out


class ShardMapBackend(DistributedBackend):
    """Same cycle math, explicit communication."""

    def __init__(self, levels: List[LevelSpec], ops: List[LevelOperator],
                 cfg: SolverConfig, plan: MeshPlan, platform=None,
                 packs=None):
        # skip DistributedBackend.__init__'s assumptions: ops here may
        # already be blocked
        super(DistributedBackend, self).__init__(levels, ops, cfg,
                                                 platform=platform,
                                                 packs=packs)
        self.plan = plan
        self.ndevices = int(plan.mesh.devices.size)

    # -- smoothing ----------------------------------------------------------
    def _use_compact_shard(self, lev) -> bool:
        """Compact quad-parity smoothing on a SHARDED level: local tiles
        must be even (so local parity == global parity) and, on TPU, the
        local quad width must still fill the vector lanes."""
        sh = self.plan.shards[lev]
        spec = self.levels[lev]
        if not (self.cfg.compact and spec.nd == 8
                and self.cfg.relax_kind in ("RB", "FC")
                and sh.ny % 2 == 0 and sh.nx % 2 == 0):
            return False
        if self.platform == "cpu":
            return True
        return sh.nx // 2 >= 128 and sh.ny // 2 >= 8

    def relax(self, lev, p, b, nsweeps):
        sh = self.plan.shards[lev]
        if not sh.sharded:
            return super().relax(lev, p, b, nsweeps)
        cfg = self.cfg
        use_compact = self._use_compact_shard(lev)

        def local(p_l, b_l, cA_l):
            if use_compact:
                from ..ops.relax_compact import relax_compact
                from .exchange import extend_quads_shard
                return relax_compact(
                    p_l, b_l, cA_l, nsweeps, cfg.relax_kind,
                    cfg.cmatrix == "real", tridiag_method=cfg.tridiag,
                    extend_fn=extend_quads_shard)
            j0, i0 = axis_offsets(sh.ny, sh.nx)
            return relax_ops.relax(
                p_l, b_l, cA_l, nsweeps, cfg.relax_kind,
                cfg.cmatrix == "real", extend_fn=halo_extend,
                j0=j0, i0=i0, tridiag_method=cfg.tridiag)

        f = jax.shard_map(local, mesh=self.plan.mesh,
                          in_specs=(_SPEC3, _SPEC3, _SPEC4),
                          out_specs=_SPEC3)
        return f(p, b, self.ops[lev].cA)

    # -- residual -------------------------------------------------------------
    def residual(self, lev, p, b):
        if not self.plan.shards[lev].sharded:
            return super().residual(lev, p, b)
        real = self.cfg.cmatrix == "real"

        def local(p_l, b_l, cA_l):
            return stencil.residual(halo_extend(p_l), b_l, cA_l, real)

        f = jax.shard_map(local, mesh=self.plan.mesh,
                          in_specs=(_SPEC3, _SPEC3, _SPEC4),
                          out_specs=_SPEC3)
        return f(p, b, self.ops[lev].cA)

    # -- transfers ------------------------------------------------------------
    # restrict: the 8-child sum is shard-local (children of a local coarse
    # tile are exactly the local fine tile); the GSPMD reshape-sum inherits
    # the sharding with no communication, and the de-shard transition level
    # is one all-gather — keep the parent implementation.

    def prolong(self, lev, pc):
        if not (self.plan.shards[lev].sharded
                and self.plan.shards[lev + 1].sharded):
            # coarse level replicated (or 2-D edge cases): parent path
            return super().prolong(lev, pc)
        nz_f = self.levels[lev].nzg
        interp = self.cfg.interp_type
        aggressive = self.levels[lev + 1].aggressive_from_prev

        def local(pc_l):
            return transfer.prolong(halo_extend(pc_l), nz_f, interp,
                                    aggressive=aggressive)

        f = jax.shard_map(local, mesh=self.plan.mesh,
                          in_specs=(_SPEC3,), out_specs=_SPEC3)
        return f(pc)


jax.tree_util.register_pytree_node(
    ShardMapBackend,
    ShardMapBackend.tree_flatten,
    ShardMapBackend.tree_unflatten)
