#!/usr/bin/env python
"""One-time OISSTv2 NetCDF -> npz conversion.

The reference consumes ``sst.day.mean.box{b}.nc`` NetCDF files (Zenodo record
7259555, ref ``README.md:44-45``) through xarray+dask at every run. This
framework's fast path is plain npz (no xarray/dask needed at train time);
convert once with:

    python scripts/convert_oisst_netcdf.py /data/oisstv2/subregion-60x60boxes-pixelwise_stats

Requires xarray (only for the conversion).
"""
import glob
import os
import sys

from dyffusion_tpu.data.oisstv2 import convert_netcdf_box_to_npz


def main(data_dir: str) -> None:
    ncs = sorted(glob.glob(os.path.join(data_dir, "sst.day.mean.box*.nc")))
    if not ncs:
        raise SystemExit(f"no sst.day.mean.box*.nc files under {data_dir}")
    for nc in ncs:
        out = convert_netcdf_box_to_npz(nc)
        print(f"{nc} -> {out}")


if __name__ == "__main__":
    main(sys.argv[1])
