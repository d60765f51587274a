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


def gather_batch(
    src: np.ndarray,
    indices: np.ndarray,
    n_threads: int = 0,
    out_dtype: Optional[np.dtype] = None,
) -> np.ndarray:
    """``src[indices]`` via the native threaded gather (numpy fallback).

    ``out_dtype=np.float32`` with a float64 source dispatches to the fused
    gather+cast kernel (one pass instead of gather-then-astype) — for
    pipelines that keep their archives in f64 (e.g. raw xarray NetCDF).
    Negative indices index from the end, exactly like numpy; out-of-bounds
    indices raise IndexError on every path (the raw C++ kernel would read
    out of bounds, so bounds are validated here).
    """
    indices = np.ascontiguousarray(indices, np.int64)
    n = src.shape[0]
    if indices.size == 0:
        shape = (0,) + src.shape[1:]
        return np.empty(shape, out_dtype if out_dtype is not None else src.dtype)
    if indices.min() < -n or indices.max() >= n:
        raise IndexError(
            f"gather_batch: index out of bounds for axis 0 with size {n}"
        )
    indices = np.where(indices < 0, indices + n, indices)
    fuse_cast = (
        out_dtype is not None
        and np.dtype(out_dtype) == np.float32
        and src.dtype == np.float64
    )
    lib = _load_native()
    if lib is None or not src.flags["C_CONTIGUOUS"]:
        out = src[indices]
        return out.astype(out_dtype) if out_dtype is not None else out
    row_elems = int(np.prod(src.shape[1:], dtype=np.int64))
    if fuse_cast:
        out = np.empty((len(indices),) + src.shape[1:], np.float32)
        lib.gather_rows_f64_to_f32(
            src.ctypes.data_as(ctypes.c_void_p),
            indices.ctypes.data_as(ctypes.c_void_p),
            len(indices), row_elems,
            out.ctypes.data_as(ctypes.c_void_p), n_threads,
        )
        return out
    out = np.empty((len(indices),) + src.shape[1:], src.dtype)
    lib.gather_rows(
        src.ctypes.data_as(ctypes.c_void_p),
        indices.ctypes.data_as(ctypes.c_void_p),
        len(indices), row_elems * src.itemsize,
        out.ctypes.data_as(ctypes.c_void_p), n_threads,
    )
    return out.astype(out_dtype) if out_dtype is not None else out


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
        stop_evt = threading.Event()

        def worker():
            try:
                for s in starts:
                    if stop_evt.is_set():
                        return
                    sel = idx[s : s + self.batch_size]
                    batch = {k: gather_batch(v, sel) for k, v in self.tensors.items()}
                    if self.device_put is not None:
                        batch = self.device_put(batch)
                    # bounded put so a stopped consumer can unblock us
                    while not stop_evt.is_set():
                        try:
                            q.put(batch, timeout=0.1)
                            break
                        except Exception:  # queue.Full
                            continue
                q.put(None)
            except BaseException as e:  # surface worker failures to the consumer
                while not stop_evt.is_set():
                    try:
                        q.put(e, timeout=0.1)
                        break
                    except Exception:  # queue.Full
                        continue

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
            t.join()
        finally:
            # consumer stopped early (max_steps break, GeneratorExit, error):
            # unblock and reap the worker instead of leaking it plus its
            # device-resident staged batches
            stop_evt.set()
            while True:
                try:
                    q.get_nowait()
                except Exception:  # queue.Empty
                    break
            t.join(timeout=5.0)
