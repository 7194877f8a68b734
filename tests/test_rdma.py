"""RDMA halo-overlap kernel vs the blocking ppermute path.

``pltpu.InterpretParams`` simulates the inter-chip DMAs and semaphores on
the virtual CPU mesh, so the overlap kernel's communication protocol (who
sends what to whom, and that seam columns wait for their receive) is
validated without multi-chip hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from mgroms_tpu.bc import extend_h1
from mgroms_tpu.ops import stencil

needs4 = pytest.mark.skipif(len(jax.devices()) < 4,
                            reason="needs 4 virtual devices")


@needs4
@pytest.mark.parametrize("real_matrix", [False, True])
def test_rdma_overlap_residual_matches_blocking(real_matrix):
    nz, ny, nx = 6, 16, 64
    npx = 4
    rng = np.random.default_rng(3)
    p = jnp.asarray(rng.standard_normal((nz, ny, nx)))
    b = jnp.asarray(rng.standard_normal((nz, ny, nx)))
    cA = jnp.asarray(rng.standard_normal((8, nz, ny + 2, nx + 2)))

    # reference: blocking halo extension + XLA residual
    r_ref = stencil.residual(extend_h1(p), b, cA, real_matrix)

    from mgroms_tpu.ops.pallas.rdma_halo import residual_overlap_x
    from mgroms_tpu.parallel.exchange import block_extended

    mesh = Mesh(np.array(jax.devices()[:npx]).reshape(1, npx), ("py", "px"))
    cA_blk = block_extended(cA, 1, npx)

    def local(p_l, b_l, cA_l):
        return residual_overlap_x(p_l, b_l, cA_l, real_matrix,
                                  interpret=True)

    f = jax.shard_map(local, mesh=mesh,
                      in_specs=(P(None, None, "px"), P(None, None, "px"),
                                P(None, None, None, "px")),
                      out_specs=P(None, None, "px"), check_vma=False)
    r = f(p, b, cA_blk)
    # identical arithmetic on identical inputs — only the schedule differs;
    # seam columns must see the neighbour's true edge values via RDMA
    np.testing.assert_allclose(np.asarray(r), np.asarray(r_ref),
                               rtol=1e-12, atol=1e-12)
