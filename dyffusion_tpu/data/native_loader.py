"""Native-accelerated data loading: C++ batch gather + device prefetch.

The reference delegates host-side batching to torch's C++ DataLoader workers
(``abstract_datamodule.py:122-162``). Here the native component is
``_native/batch_gather.cpp`` (threaded row gather into contiguous batch
buffers, built on first use with g++ and bound via ctypes), and
:class:`PrefetchIterator` double-buffers batches onto the device so the
jitted train step never waits on host assembly — the TPU-native analogue of
pin_memory + workers.

Falls back transparently to numpy fancy-indexing when no compiler is
available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from queue import Queue
from typing import Dict, Iterator, Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libbatch_gather.so")
_lib = None
_lib_tried = False


def _load_native():
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    try:
        if not os.path.exists(_SO_PATH) or (
            os.path.getmtime(_SO_PATH) < os.path.getmtime(os.path.join(_NATIVE_DIR, "batch_gather.cpp"))
        ):
            subprocess.run(
                [
                    "g++", "-O3", "-march=native", "-shared", "-fPIC",
                    os.path.join(_NATIVE_DIR, "batch_gather.cpp"),
                    "-o", _SO_PATH, "-lpthread",
                ],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(_SO_PATH)
        lib.gather_rows.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_int,
        ]
        lib.gather_rows_f64_to_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_int,
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def native_available() -> bool:
    return _load_native() is not None


def gather_batch(src: np.ndarray, indices: np.ndarray, n_threads: int = 0) -> np.ndarray:
    """``src[indices]`` via the native threaded gather (numpy fallback)."""
    lib = _load_native()
    indices = np.ascontiguousarray(indices, np.int64)
    if lib is None or not src.flags["C_CONTIGUOUS"]:
        return src[indices]
    out = np.empty((len(indices),) + src.shape[1:], src.dtype)
    example_bytes = int(np.prod(src.shape[1:], dtype=np.int64)) * src.itemsize
    lib.gather_rows(
        src.ctypes.data_as(ctypes.c_void_p),
        indices.ctypes.data_as(ctypes.c_void_p),
        len(indices), example_bytes,
        out.ctypes.data_as(ctypes.c_void_p), n_threads,
    )
    return out


class PrefetchIterator:
    """Double-buffered background prefetch: assembles the NEXT batch (native
    gather) and stages it on-device while the current step runs."""

    def __init__(
        self,
        tensors: Dict[str, np.ndarray],
        batch_size: int,
        shuffle: bool = True,
        rng: Optional[np.random.Generator] = None,
        drop_last: bool = True,
        device_put=None,
        prefetch: int = 2,
    ):
        self.tensors = tensors
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = rng or np.random.default_rng()
        self.drop_last = drop_last
        self.device_put = device_put
        self.prefetch = prefetch

    def __iter__(self) -> Iterator[Dict]:
        n = next(iter(self.tensors.values())).shape[0]
        idx = np.arange(n)
        if self.shuffle:
            self.rng.shuffle(idx)
        stop = n - (n % self.batch_size) if self.drop_last else n
        starts = list(range(0, stop, self.batch_size))
        if not starts:
            return
        q: Queue = Queue(maxsize=self.prefetch)

        def worker():
            try:
                for s in starts:
                    sel = idx[s : s + self.batch_size]
                    batch = {k: gather_batch(v, sel) for k, v in self.tensors.items()}
                    if self.device_put is not None:
                        batch = self.device_put(batch)
                    q.put(batch)
            finally:
                q.put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                break
            yield item
        t.join()
