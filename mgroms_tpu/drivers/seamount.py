"""Seamount benchmark driver (reference ``testseamount``,
src/mg_testseamount.f90: 64^3 default, Lx=Ly=10 km, Htot=4 km, hc=4000,
theta=0)."""

import jax.numpy as jnp

from .common import base_parser, run_case
from ..cases.seamount import setup_seamount


def main(argv=None):
    p = base_parser()
    p.add_argument("--Lx", type=float, default=1.0e4)
    p.add_argument("--Ly", type=float, default=1.0e4)
    p.add_argument("--Htot", type=float, default=4.0e3)
    p.add_argument("--hc", type=float, default=4.0e3)
    args = p.parse_args(argv)
    print("Initialise seamount bench")
    print(f"Lx, Ly, Htot: {args.Lx} {args.Ly} {args.Htot}")
    case = setup_seamount(args.nx, args.ny, args.nz, args.Lx, args.Ly,
                          args.Htot, hc=args.hc)
    return run_case(args, case)


if __name__ == "__main__":
    main()
