"""DMA-rate probe: pl.Element overlapping windows vs aligned blocks.

Round-4 question: the chunked fused sweep moves ~4 GB/sweep but runs at
~280 GB/s effective while the per-color tiled kernel (aligned blocks)
runs at ~500 GB/s.  Is the Element-window access pattern itself the
bottleneck?  Each variant streams the same bytes through a trivial
accumulate kernel; the per-iteration time differences isolate the DMA
pattern cost.

Usage: PYTHONPATH=/root/.axon_site:. python scripts/micro_dma_probe.py
"""

import functools
import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_z = np.int32(0)


def probe_windows(nstreams, nz, hs, wide, tj, ws, H, interpret=False):
    """nstreams Element-window inputs (nz, ws, wide) over (nz, hs, wide)
    HBM arrays, grid H//tj, double-buffered; kernel sums window slices."""
    def kern(*refs):
        out = refs[-1]
        acc = None
        for r in refs[:-1]:
            x = r[:, 2: 2 + tj, 2: 2 + 128]
            acc = x if acc is None else acc + x
        out[:] = acc

    def win():
        return pl.BlockSpec((pl.Element(nz), pl.Element(ws),
                             pl.Element(wide)),
                            lambda i: (_z, i * tj, _z),
                            memory_space=pltpu.VMEM,
                            pipeline_mode=pl.Buffered(2))

    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((nz, H, 128), jnp.float32),
        grid=(H // tj,),
        in_specs=[win() for _ in range(nstreams)],
        out_specs=pl.BlockSpec((nz, tj, 128), lambda i: (_z, i, _z),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
    )
    return f


def probe_blocks(nstreams, nz, H, Wc, tj, interpret=False):
    """nstreams aligned-block inputs (nz, tj, Wc), double-buffered."""
    def kern(*refs):
        out = refs[-1]
        acc = None
        for r in refs[:-1]:
            x = r[:]
            acc = x if acc is None else acc + x
        out[:] = acc

    def blk():
        return pl.BlockSpec((nz, tj, Wc), lambda i: (_z, i, _z),
                            memory_space=pltpu.VMEM,
                            pipeline_mode=pl.Buffered(2))

    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((nz, H, Wc), jnp.float32),
        grid=(H // tj,),
        in_specs=[blk() for _ in range(nstreams)],
        out_specs=pl.BlockSpec((nz, tj, Wc), lambda i: (_z, i, _z),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
    )
    return f


def main():
    from mgroms_tpu.utils.timing import time_device_fn
    nz, H = 64, 512
    tj = 16
    ws = 24
    hs = H - tj + ws
    key = jax.random.PRNGKey(0)

    results = {}

    # A: 24 Element windows, chunk width 132 (the fused kernel's band
    # stream shape at CUC L0, C=4)
    wide = 132
    n = 24
    xs = jax.random.uniform(key, (n, nz, hs, wide), jnp.float32)
    fw = probe_windows(n, nz, hs, wide, tj, ws, H)

    def step_w(c):
        xs, y = c
        # chain: next input depends on previous output, so the loop body
        # cannot be hoisted out of the fori_loop
        xs = xs.at[0, 0, 0, 0].add(y[0, 0, 0] * jnp.float32(1e-30))
        y = fw(*[xs[i] for i in range(n)])
        return (xs, y)

    y0 = fw(*[xs[i] for i in range(n)])
    t = time_device_fn(step_w, (xs, y0), iters=20)
    gb = n * (H // tj) * nz * ws * wide * 4 / 1e9
    results["element_windows_132"] = {
        "ms": round(t * 1e3, 3), "GB": round(gb, 2),
        "GBps": round(gb / t, 1)}
    print(json.dumps(results["element_windows_132"]), flush=True)

    # B: same total bytes as aligned blocks (nz, tj, 128) x 38 streams
    Wc = 128
    nb = max(1, int(round(gb * 1e9 / ((H // tj) * nz * tj * Wc * 4))))
    xsb = jax.random.uniform(key, (nb, nz, H, Wc), jnp.float32)
    fb = probe_blocks(nb, nz, H, Wc, tj)

    def step_b(c):
        xs, y = c
        xs = xs.at[0, 0, 0, 0].add(y[0, 0, 0] * jnp.float32(1e-30))
        y = fb(*[xs[i] for i in range(nb)])
        return (xs, y)

    yb = fb(*[xsb[i] for i in range(nb)])
    t = time_device_fn(step_b, (xsb, yb), iters=20)
    gbb = nb * H * nz * Wc * 4 / 1e9
    results["aligned_blocks_128"] = {
        "ms": round(t * 1e3, 3), "GB": round(gbb, 2),
        "GBps": round(gbb / t, 1), "streams": nb}
    print(json.dumps(results["aligned_blocks_128"]), flush=True)

    # C: full-width Element windows (C=1 geometry, width 516) — the
    # round-3 kernel's pattern at L1-like width but L0 depth
    wide3 = 516
    n3 = 6
    xs3 = jax.random.uniform(key, (n3, nz, hs, wide3), jnp.float32)
    fw3 = probe_windows(n3, nz, hs, wide3, tj, ws, H)

    def step_w3(c):
        xs, y = c
        xs = xs.at[0, 0, 0, 0].add(y[0, 0, 0] * jnp.float32(1e-30))
        y = fw3(*[xs[i] for i in range(n3)])
        return (xs, y)

    y3 = fw3(*[xs3[i] for i in range(n3)])
    t = time_device_fn(step_w3, (xs3, y3), iters=20)
    gb3 = n3 * (H // tj) * nz * ws * wide3 * 4 / 1e9
    results["element_windows_516"] = {
        "ms": round(t * 1e3, 3), "GB": round(gb3, 2),
        "GBps": round(gb3 / t, 1)}
    print(json.dumps(results["element_windows_516"]), flush=True)
    print(json.dumps(results))


def probe_windows_jlead(nstreams, nz, hs, wide, tj, ws, H,
                        interpret=False):
    """(j, z, i)-layout arrays (hs, nz, wide): a row window is ONE
    contiguous HBM span (ws*nz*wide*4 bytes) — no per-z striding."""
    def kern(*refs):
        out = refs[-1]
        acc = None
        for r in refs[:-1]:
            x = r[2: 2 + tj, :, 2: 2 + 128]
            acc = x if acc is None else acc + x
        out[:] = acc

    def win():
        return pl.BlockSpec((pl.Element(ws), pl.Element(nz),
                             pl.Element(wide)),
                            lambda i: (i * tj, _z, _z),
                            memory_space=pltpu.VMEM,
                            pipeline_mode=pl.Buffered(2))

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((H, nz, 128), jnp.float32),
        grid=(H // tj,),
        in_specs=[win() for _ in range(nstreams)],
        out_specs=pl.BlockSpec((tj, nz, 128), lambda i: (i, _z, _z),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
    )


def main2():
    from mgroms_tpu.utils.timing import time_device_fn
    nz, H, tj, ws = 64, 512, 16, 24
    hs = H - tj + ws
    key = jax.random.PRNGKey(1)
    for wide, n, label in ((132, 24, "jlead_windows_132x24"),
                           (132, 6, "jlead_windows_132x6")):
        xs = jax.random.uniform(key, (n, hs, nz, wide), jnp.float32)
        f = probe_windows_jlead(n, nz, hs, wide, tj, ws, H)

        def step(c, f=f, n=n):
            xs, y = c
            xs = xs.at[0, 0, 0, 0].add(y[0, 0, 0] * jnp.float32(1e-30))
            y = f(*[xs[i] for i in range(n)])
            return (xs, y)

        y0 = f(*[xs[i] for i in range(n)])
        t = time_device_fn(step, (xs, y0), iters=20)
        gb = n * (H // tj) * nz * ws * wide * 4 / 1e9
        print(json.dumps({label: {"ms": round(t * 1e3, 3),
                                  "GB": round(gb, 2),
                                  "GBps": round(gb / t, 1)}}), flush=True)
    # aligned blocks at a tiled-kernel-like stream count
    from functools import partial
    for nb, label in ((12, "aligned_blocks_128x12"),):
        Wc = 128
        xsb = jax.random.uniform(key, (nb, nz, H, Wc), jnp.float32)
        fb = probe_blocks(nb, nz, H, Wc, tj)

        def stepb(c, fb=fb, nb=nb):
            xs, y = c
            xs = xs.at[0, 0, 0, 0].add(y[0, 0, 0] * jnp.float32(1e-30))
            y = fb(*[xs[i] for i in range(nb)])
            return (xs, y)

        yb = fb(*[xsb[i] for i in range(nb)])
        t = time_device_fn(stepb, (xsb, yb), iters=20)
        gbb = nb * H * nz * Wc * 4 / 1e9
        print(json.dumps({label: {"ms": round(t * 1e3, 3),
                                  "GB": round(gbb, 2),
                                  "GBps": round(gbb / t, 1)}}), flush=True)
    # one wide aligned stream, z-major: (nz, H, 24*128) blocks
    WW = 24 * 128
    xw = jax.random.uniform(key, (nz, H, WW), jnp.float32)

    def kern(r, out):
        acc = None
        for m in range(24):
            x = r[:, :, m * 128:(m + 1) * 128]
            acc = x if acc is None else acc + x
        out[:] = acc

    fwide = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((nz, H, 128), jnp.float32),
        grid=(H // tj,),
        in_specs=[pl.BlockSpec((nz, tj, WW), lambda i: (_z, i, _z),
                               memory_space=pltpu.VMEM,
                               pipeline_mode=pl.Buffered(2))],
        out_specs=pl.BlockSpec((nz, tj, 128), lambda i: (_z, i, _z),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
    )

    def stepw(c):
        x, y = c
        x = x.at[0, 0, 0].add(y[0, 0, 0] * jnp.float32(1e-30))
        return (x, fwide(x))

    yw = fwide(xw)
    t = time_device_fn(stepw, (xw, yw), iters=20)
    gbw = nz * H * WW * 4 / 1e9
    print(json.dumps({"one_wide_zmajor_stream": {
        "ms": round(t * 1e3, 3), "GB": round(gbw, 2),
        "GBps": round(gbw / t, 1)}}), flush=True)


if __name__ == "__main__" and "--more" in sys.argv:
    main2()
