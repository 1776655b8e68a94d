"""ctypes binding for the native C++ TFRecord/JPEG data loader.

The reference fed its graph from TF's C++ runtime threads (SURVEY.md §3.1:
"TFRecordDataset/provider -> decode Example -> jpeg decode (CPU host
threads)"); here the equivalent native layer is
``x_detector_tpu/native/xdet_loader.cc`` — a dependency-free threaded reader
(TFRecord framing + CRC32C, protobuf wire parsing, libjpeg decode, bilinear
canvas resize) built as ``libxdet_loader.so`` and driven through ctypes.

Falls back cleanly (raises ImportError at construction) when the shared
library has not been built; callers can then use data/tfrecord.py.
Build: ``make -C x_detector_tpu/native`` (done automatically on first use).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Iterator, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), os.pardir, "native")
_SO_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libxdet_loader.so"))
_ID_CAPACITY = 64

_lib = None


_ABI_VERSION = 2  # must match xdet_loader_abi_version() in xdet_loader.cc


def _build(force: bool = False) -> None:
    cmd = ["make", "-C", os.path.abspath(_NATIVE_DIR)]
    if force:
        cmd.insert(1, "-B")
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        raise RuntimeError(
            "native loader build failed (falling back to the tf.data "
            f"reader is fine):\n{proc.stderr[-2000:]}")


def _stale() -> bool:
    src = os.path.join(os.path.abspath(_NATIVE_DIR), "xdet_loader.cc")
    try:
        return os.path.getmtime(_SO_PATH) < os.path.getmtime(src)
    except OSError:
        return True


def _load_library(build_if_missing: bool = True):
    global _lib
    if _lib is not None:
        return _lib
    if build_if_missing and (not os.path.exists(_SO_PATH) or _stale()):
        _build()
    lib = ctypes.CDLL(_SO_PATH)
    if not hasattr(lib, "xdet_loader_abi_version") or \
            lib.xdet_loader_abi_version() != _ABI_VERSION:
        # stale .so from an older source revision: rebuild in place
        if not build_if_missing:
            raise ImportError("stale libxdet_loader.so (ABI mismatch)")
        del lib
        _build(force=True)
        # dlopen dedups by pathname and ctypes never dlcloses, so CDLL on
        # _SO_PATH again would hand back the STALE already-loaded image
        # (round-4 review, verified empirically).  Copy the rebuilt
        # library to a unique path and load that.
        import shutil
        import tempfile
        fd, fresh = tempfile.mkstemp(prefix="xdet_loader_rebuilt_",
                                     suffix=".so")
        os.close(fd)
        shutil.copy2(_SO_PATH, fresh)
        try:
            lib = ctypes.CDLL(fresh)
        finally:
            # the mapping stays valid after unlink (Linux); without this,
            # every stale-ABI process leaks one temp .so
            os.unlink(fresh)
        if lib.xdet_loader_abi_version() != _ABI_VERSION:
            raise ImportError(
                "rebuilt libxdet_loader.so still reports ABI "
                f"{lib.xdet_loader_abi_version()} != {_ABI_VERSION}")
    lib.xdet_loader_create.restype = ctypes.c_void_p
    lib.xdet_loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_uint64,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_uint64]
    lib.xdet_loader_next.restype = ctypes.c_int
    lib.xdet_loader_next.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
        ctypes.c_char_p, ctypes.c_int]
    lib.xdet_loader_position.restype = ctypes.c_uint64
    lib.xdet_loader_position.argtypes = [ctypes.c_void_p]
    lib.xdet_loader_num_examples.restype = ctypes.c_uint64
    lib.xdet_loader_num_examples.argtypes = [ctypes.c_void_p]
    lib.xdet_loader_destroy.restype = None
    lib.xdet_loader_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


class NativeLoader:
    """Iterator of batches with the trainer schema (+ image_id, difficult).

    The stream is **bitwise deterministic** for a given (shards, seed,
    num_threads-independent) configuration — each epoch is an exact seeded
    permutation of a record index, decoded by position — and resumable:
    ``position`` is the number of examples consumed; pass it back as
    ``start_example`` to continue the identical stream after a restart
    (SURVEY.md §5 deterministic data-iterator state).
    """

    def __init__(self, shard_paths: Sequence[str], canvas_size: int,
                 max_gt: int, batch_size: int, shuffle: bool = True,
                 seed: int = 0, repeat: bool = True, num_threads: int = 4,
                 letterbox: bool = False, start_example: int = 0):
        self._lib = _load_library()
        self.canvas = canvas_size
        self.max_gt = max_gt
        self.batch = batch_size
        # Oversubscribing a small host collapses throughput (8 workers on a
        # 1-core box measured 13 img/s vs 118 at 4): cap at the core count.
        num_threads = max(1, min(num_threads, os.cpu_count() or 1))
        paths = [p.encode() for p in shard_paths]
        arr = (ctypes.c_char_p * len(paths))(*paths)
        self._handle = self._lib.xdet_loader_create(
            arr, len(paths), canvas_size, max_gt, batch_size,
            int(shuffle), seed, int(repeat), num_threads, int(letterbox),
            start_example)
        assert self._handle, "native loader creation failed"

    @property
    def position(self) -> int:
        """Examples consumed so far — the resume token (``start_example``)."""
        return int(self._lib.xdet_loader_position(self._handle))

    @property
    def num_examples(self) -> int:
        """Indexed records per epoch."""
        return int(self._lib.xdet_loader_num_examples(self._handle))

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        return self

    def __next__(self) -> Dict[str, np.ndarray]:
        b, c, g = self.batch, self.canvas, self.max_gt
        images = np.empty((b, c, c, 3), np.float32)
        boxes = np.empty((b, g, 4), np.float32)
        labels = np.empty((b, g), np.int32)
        mask = np.empty((b, g), np.uint8)
        difficult = np.empty((b, g), np.uint8)
        box_scale = np.empty((b, 2), np.float32)
        ids = ctypes.create_string_buffer(b * _ID_CAPACITY)
        n = self._lib.xdet_loader_next(
            self._handle,
            images.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            difficult.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            box_scale.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ids, _ID_CAPACITY)
        if n == 0:
            raise StopIteration
        id_list = [
            ids.raw[i * _ID_CAPACITY:(i + 1) * _ID_CAPACITY].split(b"\0")[0]
            for i in range(n)]
        return {
            "image": images[:n], "gt_boxes": boxes[:n],
            "gt_labels": labels[:n], "gt_mask": mask[:n].astype(bool),
            "difficult": difficult[:n].astype(bool),
            "box_scale": box_scale[:n], "image_id": id_list,
        }

    def close(self) -> None:
        if getattr(self, "_handle", None):
            self._lib.xdet_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def native_available(build_if_missing: bool = False) -> bool:
    try:
        _load_library(build_if_missing)
        return True
    except Exception:
        return False
