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



def shard_operators_blocked(ops: List[LevelOperator], plan: MeshPlan
                            ) -> List[LevelOperator]:
    """Sharded levels: cA in per-shard-extended blocked layout, one tile per
    device (blocked only along the level's ACTIVE mesh axes — staged
    agglomeration).  Replicated levels: unchanged replicated placement."""
    npy, npx = plan.mesh.devices.shape
    repl = NamedSharding(plan.mesh, P())
    out = []
    for lev, op in enumerate(ops):
        sh = plan.shards[lev]
        if sh.sharded:
            bpy = npy if sh.shard_py else 1
            bpx = npx if sh.shard_px else 1
            blk = NamedSharding(plan.mesh, plan.spec(lev, 4))
            cA = jax.device_put(block_extended(op.cA, bpy, bpx), blk)
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

    def _axes(self, lev):
        """Active mesh axis names for this level (None = dropped by staged
        agglomeration: physical mirror instead of seam exchange there)."""
        sh = self.plan.shards[lev]
        return ("py" if sh.shard_py else None,
                "px" if sh.shard_px else None)

    def relax(self, lev, p, b, nsweeps):
        sh = self.plan.shards[lev]
        if not sh.sharded:
            return super().relax(lev, p, b, nsweeps)
        cfg = self.cfg
        use_compact = self._use_compact_shard(lev)
        pya, pxa = self._axes(lev)
        sp3, sp4 = self.plan.spec(lev, 3), self.plan.spec(lev, 4)

        def local(p_l, b_l, cA_l):
            if use_compact:
                from ..ops.relax_compact import relax_compact
                from .exchange import extend_quads_shard
                return relax_compact(
                    p_l, b_l, cA_l, nsweeps, cfg.relax_kind,
                    cfg.cmatrix == "real", tridiag_method=cfg.tridiag,
                    extend_fn=lambda q: extend_quads_shard(
                        q, py_axis=pya, px_axis=pxa))
            j0, i0 = axis_offsets(sh.ny, sh.nx, pya, pxa)
            return relax_ops.relax(
                p_l, b_l, cA_l, nsweeps, cfg.relax_kind,
                cfg.cmatrix == "real",
                extend_fn=lambda x: halo_extend(x, pya, pxa),
                j0=j0, i0=i0, tridiag_method=cfg.tridiag)

        f = jax.shard_map(local, mesh=self.plan.mesh,
                          in_specs=(sp3, sp3, sp4),
                          out_specs=sp3)
        return f(p, b, self.ops[lev].cA)

    # -- residual -------------------------------------------------------------
    def residual(self, lev, p, b):
        if not self.plan.shards[lev].sharded:
            return super().residual(lev, p, b)
        real = self.cfg.cmatrix == "real"
        pya, pxa = self._axes(lev)
        sp3, sp4 = self.plan.spec(lev, 3), self.plan.spec(lev, 4)

        def local(p_l, b_l, cA_l):
            return stencil.residual(halo_extend(p_l, pya, pxa), b_l, cA_l,
                                    real)

        f = jax.shard_map(local, mesh=self.plan.mesh,
                          in_specs=(sp3, sp3, sp4),
                          out_specs=sp3)
        return f(p, b, self.ops[lev].cA)

    # -- transfers ------------------------------------------------------------
    # restrict: the 8-child sum is shard-local (children of a local coarse
    # tile are exactly the local fine tile); the GSPMD reshape-sum inherits
    # the sharding with no communication, and each stage transition (an
    # axis drop) is one all-gather over that axis — keep the parent
    # implementation with its per-level constraint.

    def prolong(self, lev, pc):
        shf, shc = self.plan.shards[lev], self.plan.shards[lev + 1]
        if not (shf.sharded and shc.sharded
                and shf.shard_py == shc.shard_py
                and shf.shard_px == shc.shard_px):
            # replicated coarse level, or a stage transition (different
            # active axes): the GSPMD path inserts the re-shard collective
            return super().prolong(lev, pc)
        nz_f = self.levels[lev].nzg
        interp = self.cfg.interp_type
        aggressive = self.levels[lev + 1].aggressive_from_prev
        pya, pxa = self._axes(lev)
        sp3c, sp3f = self.plan.spec(lev + 1, 3), self.plan.spec(lev, 3)

        def local(pc_l):
            return transfer.prolong(halo_extend(pc_l, pya, pxa), nz_f,
                                    interp, aggressive=aggressive)

        f = jax.shard_map(local, mesh=self.plan.mesh,
                          in_specs=(sp3c,), out_specs=sp3f)
        return f(pc)


jax.tree_util.register_pytree_node(
    ShardMapBackend,
    ShardMapBackend.tree_flatten,
    ShardMapBackend.tree_unflatten)
