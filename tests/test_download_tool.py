"""Hermetic tests of the dataset-acquisition tool (sha256 verification,
multipart reassembly, extraction) using file:// fixtures — no network.
Mirrors the capability of ref ``scripts/download_physical_systems_data.sh``.
"""
import hashlib
import os
import sys
import tarfile

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
import download_data as dl  # noqa: E402


def _make_archive(tmp_path, payload=b"hello trajectories"):
    src = tmp_path / "payload.txt"
    src.write_bytes(payload)
    arc = tmp_path / "bundle.tar.gz"
    with tarfile.open(arc, "w:gz") as tf:
        tf.add(src, arcname="payload.txt")
    return arc.read_bytes()


def test_multipart_reassembly_and_sha256(tmp_path):
    blob = _make_archive(tmp_path)
    # split into 3 parts served over file://
    parts_dir = tmp_path / "srv"
    parts_dir.mkdir()
    urls = []
    third = len(blob) // 3 + 1
    for i in range(3):
        p = parts_dir / f"bundle.tar.gz.PART{i:02d}"
        p.write_bytes(blob[i * third : (i + 1) * third])
        urls.append(p.as_uri())
    entry = {
        "urls": urls,
        "out": "bundle.tar.gz",
        "sha256": hashlib.sha256(blob).hexdigest(),
    }
    data_dir = tmp_path / "data"
    out = dl.assemble_and_verify(entry, str(data_dir))
    assert os.path.exists(out)
    # extraction happened
    assert (data_dir / "payload.txt").read_bytes() == b"hello trajectories"
    # parts cleaned up after successful verification
    assert not list(data_dir.glob("*.PART*"))
    # idempotent: second call verifies and skips
    dl.assemble_and_verify(entry, str(data_dir))


def test_sha256_mismatch_refuses_download(tmp_path):
    blob = _make_archive(tmp_path)
    src = tmp_path / "srv.tar.gz"
    src.write_bytes(blob)
    entry = {"urls": [src.as_uri()], "out": "b.tar.gz", "sha256": "0" * 64}
    with pytest.raises(RuntimeError, match="sha256 mismatch"):
        dl.assemble_and_verify(entry, str(tmp_path / "data"))
    # corrupted artifact was removed
    assert not (tmp_path / "data" / "b.tar.gz").exists()


def test_manifest_shape():
    for system in ("spring-mesh", "navier-stokes"):
        for bundle in ("data", "full"):
            e = dl.MANIFEST[system][bundle]
            assert len(e["sha256"]) == 64
            assert all(u.startswith("https://archive.nyu.edu/") for u in e["urls"])
            # part ordering is PART00, PART01, ... (reassembly order matters)
            if len(e["urls"]) > 1:
                suffixes = [u[-6:] for u in e["urls"]]
                assert suffixes == sorted(suffixes)
