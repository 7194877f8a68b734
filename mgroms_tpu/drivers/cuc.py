"""CUC benchmark driver (reference ``testcuc``, src/mg_testcuc.f90:
1024x1024x64, Lx=Ly=200 km, hc=250, theta_b=theta_s=6, real bathymetry
from cuc_nhgrd.nc — synthetic continental slope when the file is absent)."""

import os

from .common import base_parser, run_case
from ..cases.cuc import CUC_DEFAULTS, load_cuc, setup_cuc_synthetic


def main(argv=None):
    p = base_parser(nx=CUC_DEFAULTS["nx"], ny=CUC_DEFAULTS["ny"],
                    nz=CUC_DEFAULTS["nz"])
    p.add_argument("--data", default="../DATA/cuc_nhgrd.nc",
                   help="CUC grid file (reference path, "
                        "mg_setup_tests.f90:47)")
    args = p.parse_args(argv)
    if os.path.exists(args.data):
        print(f"Initialise CUC bench from {args.data}")
        case = load_cuc(args.data, args.nx, args.ny)
    else:
        print(f"{args.data} not found -> synthetic continental-slope "
              "bathymetry (same dimensions/statistics)")
        case = setup_cuc_synthetic(args.nx, args.ny, args.nz)
    return run_case(args, case)


if __name__ == "__main__":
    main()
