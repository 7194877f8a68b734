"""Per-(level, section) wall-clock profiler.

TPU-native equivalent of ``src/mg_tictoc.f90``: the reference accumulates
``system_clock`` deltas and call counts in a (level x subroutine) table
(:10-16) bracketed by tic/toc calls, and dumps a per-rank table
(``print_tictoc``, :114-153).

On TPU, wall-clocking device work requires a sync, so ``tic``/``toc`` here
block on outstanding work only when ``sync=True`` (default off inside jitted
regions, where XLA owns scheduling — use ``jax.profiler`` traces for kernel-
level timing; this table times host-visible phases like the reference's
per-level accounting).
"""

from __future__ import annotations

import time
from collections import defaultdict
from typing import Dict, Optional, Tuple

import jax


class TicToc:
    def __init__(self):
        # (level, name) -> [accumulated seconds, calls]
        self.table: Dict[Tuple[int, str], list] = defaultdict(lambda: [0.0, 0])
        self._open: Dict[Tuple[int, str], float] = {}

    def tic(self, lev: int, name: str, sync: bool = False) -> None:
        if sync:
            (jax.effects_barrier
             if hasattr(jax, "effects_barrier") else lambda: None)()
        self._open[(lev, name)] = time.perf_counter()

    def toc(self, lev: int, name: str, sync: bool = False) -> None:
        t = time.perf_counter()
        key = (lev, name)
        t0 = self._open.pop(key, None)
        if t0 is None:
            return
        entry = self.table[key]
        entry[0] += t - t0
        entry[1] += 1

    def report(self) -> str:
        """Per-level time/call table (print_tictoc, mg_tictoc.f90:114-153)."""
        names = sorted({k[1] for k in self.table})
        levs = sorted({k[0] for k in self.table})
        out = ["level  " + "".join(f"{n:>22s}" for n in names)]
        for lev in levs:
            row = [f"{lev:5d}  "]
            for n in names:
                t, c = self.table.get((lev, n), (0.0, 0))
                row.append(f"{t:12.4f}s/{c:6d}x  " if c else " " * 22)
            out.append("".join(row))
        return "\n".join(out)

    def reset(self) -> None:
        self.table.clear()
        self._open.clear()


_GLOBAL = TicToc()


def tic(lev: int, name: str) -> None:
    _GLOBAL.tic(lev, name)


def toc(lev: int, name: str) -> None:
    _GLOBAL.toc(lev, name)


def print_tictoc() -> None:
    print(_GLOBAL.report())


def reset_tictoc() -> None:
    _GLOBAL.reset()
