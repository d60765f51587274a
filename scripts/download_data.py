#!/usr/bin/env python3
"""Dataset acquisition with integrity checks.

The capability of the reference's ``scripts/download_physical_systems_data.sh``
+ ``download_navier_stokes.sh`` / ``download_spring_mesh.sh`` (NYU Faculty
Digital Archive fetch with sha256 verification and multipart reassembly) and
the Zenodo SST fetch documented in its README (record 7259555), as one tool:

    python scripts/download_data.py navier-stokes --data-dir ~/data/physical-nn-benchmark
    python scripts/download_data.py spring-mesh   --data-dir ~/data/physical-nn-benchmark
    python scripts/download_data.py oisst         --data-dir ~/data/oisstv2 [--boxes 84 85 ...]
    python scripts/download_data.py --list

Files are streamed to ``<data-dir>/<name>``, multipart archives are
reassembled in order, the sha256 of the final artifact is verified against the
manifest (download refused on mismatch), and tar.gz archives are extracted.
Partial downloads resume via HTTP Range when the server supports it.

URLs and checksums below are the published dataset locations (NYU archive
handle 2451/63316-63317; Zenodo record 7259555 — integrity values come from
the Zenodo API at fetch time).
"""
from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import tarfile
import urllib.request

NYU = "https://archive.nyu.edu/bitstream"

# Published artifacts: (urls [in part order], final sha256). "data" bundles
# hold the trajectories; "full" bundles include experiment outputs.
MANIFEST = {
    "spring-mesh": {
        "data": {
            "urls": [f"{NYU}/2451/63316/3/nn-benchmark-data-spring-mesh.tar.gz"],
            "out": "nn-benchmark-data-spring-mesh.tar.gz",
            "sha256": "548bf16fbbf7dc06fcc29b968a3f8ecb7e81999252c83e41446bc3b975c013a6",
        },
        "full": {
            "urls": [
                f"{NYU}/2451/63317/{25 + i}/nn-benchmark-full-spring-mesh.tar.gz.PART{i:02d}"
                for i in range(5)
            ],
            "out": "nn-benchmark-full-spring-mesh.tar.gz",
            "sha256": "a0c918e8c96093b5a94af98a230e09ba00229f8a46c7932210e90c1da329c2da",
        },
    },
    "navier-stokes": {
        "data": {
            "urls": [f"{NYU}/2451/63316/5/nn-benchmark-data-navier-stokes-multi.tar.gz"],
            "out": "nn-benchmark-data-navier-stokes-multi.tar.gz",
            "sha256": "affa7e210f5eec8d443c4c7cd54afc7632ec65be640a4b6a5dc5d96356f5ce59",
        },
        "full": {
            "urls": [
                f"{NYU}/2451/63317/{1 + i}/nn-benchmark-full-navier-stokes-multi.tar.gz.PART{i:02d}"
                for i in range(12)
            ],
            "out": "nn-benchmark-full-navier-stokes-multi.tar.gz",
            "sha256": "41a4a1f4cc9d052d3851eb983c172f2041056090dbd9e0bf9d22dc6efe8b9fc0",
        },
    },
}

ZENODO_RECORD = "7259555"  # OISSTv2 SST boxes (ref README.md:44-45)
ZENODO_API = f"https://zenodo.org/api/records/{ZENODO_RECORD}"


def sha256_of(path: str, chunk: int = 1 << 20) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def md5_of(path: str, chunk: int = 1 << 20) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def stream_download(url: str, dest: str) -> None:
    """Stream a URL to dest, resuming with HTTP Range if partial."""
    tmp = dest + ".part"
    start = os.path.getsize(tmp) if os.path.exists(tmp) else 0
    req = urllib.request.Request(url)
    if start:
        req.add_header("Range", f"bytes={start}-")
    mode = "ab" if start else "wb"
    try:
        with urllib.request.urlopen(req) as r, open(tmp, mode) as f:
            if start and r.status != 206:  # server ignored Range: restart
                f.seek(0)
                f.truncate()
            while True:
                b = r.read(1 << 20)
                if not b:
                    break
                f.write(b)
    except urllib.error.HTTPError as e:
        if e.code == 416 and start:  # already complete
            pass
        else:
            raise
    os.replace(tmp, dest)


def assemble_and_verify(entry: dict, data_dir: str, keep_parts: bool = False) -> str:
    """Download all parts, reassemble, verify sha256, extract. Returns the
    verified archive path. Raises on checksum mismatch."""
    os.makedirs(data_dir, exist_ok=True)
    out_path = os.path.join(data_dir, entry["out"])
    if os.path.exists(out_path) and sha256_of(out_path) == entry["sha256"]:
        print(f"[ok] {entry['out']} already present and verified")
    else:
        parts = []
        for url in entry["urls"]:
            name = url.rsplit("/", 1)[-1]
            p = os.path.join(data_dir, name)
            if not os.path.exists(p):
                print(f"[dl] {url}")
                stream_download(url, p)
            parts.append(p)
        if len(parts) == 1:
            if parts[0] != out_path:
                os.replace(parts[0], out_path)
        else:
            print(f"[cat] reassembling {len(parts)} parts -> {entry['out']}")
            with open(out_path, "wb") as out:
                for p in parts:
                    with open(p, "rb") as f:
                        while True:
                            b = f.read(1 << 20)
                            if not b:
                                break
                            out.write(b)
        got = sha256_of(out_path)
        if got != entry["sha256"]:
            os.remove(out_path)
            raise RuntimeError(
                f"sha256 mismatch for {entry['out']}: got {got}, want {entry['sha256']} — "
                "download removed, please retry"
            )
        print(f"[ok] sha256 verified: {entry['out']}")
        if not keep_parts and len(entry["urls"]) > 1:
            for p in parts:
                if os.path.exists(p):
                    os.remove(p)
    if out_path.endswith(".tar.gz"):
        print(f"[tar] extracting {entry['out']}")
        with tarfile.open(out_path, "r:gz") as tf:
            tf.extractall(data_dir)
    return out_path


def download_oisst(data_dir: str, boxes=None) -> None:
    """Fetch the preprocessed SST boxes from Zenodo record 7259555 with
    per-file integrity checks from the Zenodo API (md5)."""
    os.makedirs(data_dir, exist_ok=True)
    with urllib.request.urlopen(ZENODO_API) as r:
        record = json.load(r)
    files = record.get("files", [])
    wanted = None if boxes is None else {str(b) for b in boxes}
    for f in files:
        name = f.get("key") or f.get("filename")
        if wanted is not None and not any(w in name for w in wanted):
            continue
        url = f.get("links", {}).get("self") or f.get("links", {}).get("download")
        checksum = (f.get("checksum") or "").split(":")
        dest = os.path.join(data_dir, name)
        if os.path.exists(dest) and len(checksum) == 2 and checksum[0] == "md5":
            if md5_of(dest) == checksum[1]:
                print(f"[ok] {name} already present and verified")
                continue
        print(f"[dl] {url}")
        stream_download(url, dest)
        if len(checksum) == 2 and checksum[0] == "md5":
            got = md5_of(dest)
            if got != checksum[1]:
                os.remove(dest)
                raise RuntimeError(f"md5 mismatch for {name}: got {got}, want {checksum[1]}")
            print(f"[ok] md5 verified: {name}")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("dataset", nargs="?", choices=["spring-mesh", "navier-stokes", "oisst"])
    ap.add_argument("--data-dir", default=os.path.expanduser("~/data/physical-nn-benchmark"))
    ap.add_argument("--bundle", default="full", choices=["data", "full"],
                    help="physical-systems bundle: 'data' (trajectories) or 'full' (incl. outputs)")
    ap.add_argument("--boxes", nargs="*", type=int, default=None, help="OISST grid boxes to fetch")
    ap.add_argument("--keep-parts", action="store_true")
    ap.add_argument("--list", action="store_true", help="list known artifacts and exit")
    args = ap.parse_args(argv)

    if args.list or args.dataset is None:
        for system, bundles in MANIFEST.items():
            for bundle, e in bundles.items():
                print(f"{system:14s} {bundle:5s} {e['out']}  sha256={e['sha256'][:12]}…  ({len(e['urls'])} part(s))")
        print(f"oisst          zenodo record {ZENODO_RECORD} (checksums from API)")
        return 0

    if args.dataset == "oisst":
        download_oisst(args.data_dir, args.boxes)
    else:
        assemble_and_verify(MANIFEST[args.dataset][args.bundle], args.data_dir, args.keep_parts)
    return 0


if __name__ == "__main__":
    sys.exit(main())
