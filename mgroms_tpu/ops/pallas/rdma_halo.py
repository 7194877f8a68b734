"""Pallas RDMA halo overlap: seam exchange rides the ICI during compute.

The shard_map hot path refreshes seam halos with blocking ``lax.ppermute``
BEFORE any dependent compute (parallel/exchange.py) — the TPU image of the
reference's Waitany-before-compute MPI protocol (mg_mpi_exchange.f90:
286-324), which likewise never overlapped communication with compute.  This
module is the beat-the-reference experiment: a fused residual kernel that

  1. STARTS inter-chip RDMA of its x-seam edge columns
     (``pltpu.make_async_remote_copy`` over the 'px' mesh axis),
  2. computes the residual on every interior column (independent of the
     seam halos) while the transfer is in flight,
  3. waits on the receive semaphores and finishes the two seam columns.

Scope: x-seams only ('px' ring), y handled by the physical mirror — i.e.
a mesh of shape (1, npx).  The y axis composes the same way (a second
slot pair per direction); the 2-D form is future work gated on real
multi-chip hardware.  The whole local block is VMEM-resident (grid=()),
which bounds local tiles to roughly (64, 256, 256) f32 — the CUC per-chip
tile at 4x4 meshes.  A j-tiled variant would pipeline like relax_tiled.

Validated against the ppermute path on the simulated CPU mesh via
``pltpu.InterpretParams`` (which models remote DMAs and semaphores —
tests/test_rdma.py); on real multi-chip slices it compiles to Mosaic
RDMA over ICI.  Single-chip sessions cannot *measure* the overlap win —
see docs/rdma_overlap.md for the written analysis and bound.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import stencil


def _mirror_y(x: jnp.ndarray) -> jnp.ndarray:
    """Physical homogeneous-Neumann extension in j (edge copy — the
    bc.extend_h1 rule; this experiment keeps y unsharded)."""
    return jnp.concatenate([x[:, :1], x, x[:, -1:]], axis=1)


def _kernel(p_ref, b_ref, cA_ref, out_ref, comm_ref, send_sem, recv_sem,
            *, real_matrix: bool, px_name: str, py_name: str):
    npx = lax.axis_size(px_name)
    my = lax.axis_index(px_name)
    # flat LOGICAL device id (row-major over the (py, px) mesh; LOGICAL
    # ids must be scalars, not mesh-coordinate tuples)
    base = lax.axis_index(py_name) * npx
    nxl = p_ref.shape[-1]

    # -- 1. launch seam RDMA (comm slot 0 = my west halo, 1 = my east) ----
    @pl.when(my < npx - 1)
    def _():
        # my east edge column -> east neighbour's west-halo slot
        pltpu.make_async_remote_copy(
            src_ref=p_ref.at[:, :, nxl - 1:nxl], dst_ref=comm_ref.at[0],
            send_sem=send_sem.at[0], recv_sem=recv_sem.at[0],
            device_id=base + my + 1,
            device_id_type=pltpu.DeviceIdType.LOGICAL).start()

    @pl.when(my > 0)
    def _():
        # my west edge column -> west neighbour's east-halo slot
        pltpu.make_async_remote_copy(
            src_ref=p_ref.at[:, :, 0:1], dst_ref=comm_ref.at[1],
            send_sem=send_sem.at[1], recv_sem=recv_sem.at[1],
            device_id=base + my - 1,
            device_id_type=pltpu.DeviceIdType.LOGICAL).start()

    # -- 2. interior columns [1, nxl-1): all reads local; the RDMA is in
    # flight while the VPU does this (the overlap) ------------------------
    p = p_ref[:]
    pe_y = _mirror_y(p)                       # (nz, ny+2, nxl)
    out_ref[:, :, 1:-1] = stencil.residual(
        pe_y, b_ref[:, :, 1:-1], cA_ref[:, :, :, 1:nxl + 1], real_matrix)

    # -- 3. seam columns: wait for the in-flight receives, then finish ----
    @pl.when(my > 0)
    def _():
        # wait the receive into my west-halo slot (sent by my west
        # neighbour; the descriptor only names local refs/semaphores)
        pltpu.make_async_remote_copy(
            src_ref=p_ref.at[:, :, nxl - 1:nxl], dst_ref=comm_ref.at[0],
            send_sem=send_sem.at[0], recv_sem=recv_sem.at[0],
            device_id=base + my,
            device_id_type=pltpu.DeviceIdType.LOGICAL).wait_recv()

    @pl.when(my < npx - 1)
    def _():
        pltpu.make_async_remote_copy(
            src_ref=p_ref.at[:, :, 0:1], dst_ref=comm_ref.at[1],
            send_sem=send_sem.at[1], recv_sem=recv_sem.at[1],
            device_id=base + my,
            device_id_type=pltpu.DeviceIdType.LOGICAL).wait_recv()

    halo_w = jnp.where(my > 0, comm_ref[0], p[:, :, 0:1])      # mirror at
    halo_e = jnp.where(my < npx - 1, comm_ref[1], p[:, :, -1:])  # domain edge
    we = _mirror_y(jnp.concatenate([halo_w, p[:, :, 0:2]], axis=2))
    out_ref[:, :, 0:1] = stencil.residual(
        we, b_ref[:, :, 0:1], cA_ref[:, :, :, 0:3], real_matrix)
    ee = _mirror_y(jnp.concatenate([p[:, :, nxl - 2:], halo_e], axis=2))
    out_ref[:, :, nxl - 1:nxl] = stencil.residual(
        ee, b_ref[:, :, nxl - 1:nxl], cA_ref[:, :, :, nxl - 1:nxl + 2],
        real_matrix)

    # -- drain the sends before kernel exit -------------------------------
    @pl.when(my < npx - 1)
    def _():
        pltpu.make_async_remote_copy(
            src_ref=p_ref.at[:, :, nxl - 1:nxl], dst_ref=comm_ref.at[0],
            send_sem=send_sem.at[0], recv_sem=recv_sem.at[0],
            device_id=base + my,
            device_id_type=pltpu.DeviceIdType.LOGICAL).wait_send()

    @pl.when(my > 0)
    def _():
        pltpu.make_async_remote_copy(
            src_ref=p_ref.at[:, :, 0:1], dst_ref=comm_ref.at[1],
            send_sem=send_sem.at[1], recv_sem=recv_sem.at[1],
            device_id=base + my,
            device_id_type=pltpu.DeviceIdType.LOGICAL).wait_send()


@functools.partial(jax.jit, static_argnames=("real_matrix", "px_name",
                                             "py_name", "interpret"))
def residual_overlap_x(p_l: jnp.ndarray, b_l: jnp.ndarray,
                       cA_l: jnp.ndarray, real_matrix: bool,
                       px_name: str = "px", py_name: str = "py",
                       interpret: bool = False) -> jnp.ndarray:
    """r = b - A p on the local block with the x-seam halo exchange
    OVERLAPPED with the interior residual (must run inside shard_map over a
    (1, npx) mesh).  Bitwise the same residual as
    ``stencil.residual(halo_extend(p), b, cA)`` — only the schedule differs.

    ``cA_l``: this shard's extended band stack (8, nz, ny+2, nx_l+2).
    """
    nz, ny, nxl = p_l.shape
    assert nxl >= 2, "need at least 2 local columns"
    kern = functools.partial(_kernel, real_matrix=real_matrix,
                             px_name=px_name, py_name=py_name)
    kwargs = {}
    if interpret:
        kwargs["interpret"] = pltpu.InterpretParams()
    else:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            has_side_effects=True, collective_id=7,
            vmem_limit_bytes=128 * 1024 * 1024)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((nz, ny, nxl), p_l.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, nz, ny, 1), p_l.dtype),   # comm: W/E halo slots
            pltpu.SemaphoreType.DMA((2,)),           # send sems
            pltpu.SemaphoreType.DMA((2,)),           # recv sems
        ],
        **kwargs,
    )(p_l, b_l, cA_l)
