"""Host-side threaded batch sampler backed by native/dataloader.cpp.

The role the torch DataLoader + collate plays in the reference's input
pipeline (nerf/provider.py:398-459). The TPU-first default keeps the whole
image stack resident in HBM and assembles batches on-device (provider.py),
which is faster — but caps dataset size at device memory. This host pipeline
is the alternative for stacks that don't fit: images stay on the host as one
uint8 [V, H*W, C] buffer (optionally a np.memmap), C++ worker threads sample
(view, pixel-indices, normalized pixels) batches into a bounded ring, and
the trainer overlaps the device step with host-side sampling of the next
batch.

Enabled per-dataset via ``DatasetOptions.host_pipeline=True``.
"""

from __future__ import annotations

import ctypes
from typing import Optional, Tuple

import numpy as np


def _lib():
    """The shared native library (built on demand), with this module's C
    prototypes registered; None when the toolchain is unavailable."""
    from focnerf_tpu.utils.mesh_extract import _native_lib

    lib = _native_lib()
    if lib is None:
        return None
    if not getattr(lib, "_loader_protos", False):
        lib.loader_create.restype = ctypes.c_void_p
        lib.loader_create.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),  # images [V, P, C]
            ctypes.c_int64,  # views
            ctypes.c_int64,  # pixels
            ctypes.c_int64,  # channels
            ctypes.c_int,  # batch_rays
            ctypes.c_int,  # n_threads
            ctypes.c_int,  # queue_capacity
            ctypes.c_uint64,  # seed
        ]
        lib.loader_next.restype = None
        lib.loader_next.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.loader_destroy.restype = None
        lib.loader_destroy.argtypes = [ctypes.c_void_p]
        lib._loader_protos = True
    return lib


def available() -> bool:
    return _lib() is not None


class NativeBatchLoader:
    """Threaded (view, ray-indices, pixels) sampler over a uint8 image stack.

    ``images`` must be C-contiguous uint8 [V, P, C] and stay alive for the
    loader's lifetime (the C side holds a borrowed pointer).
    """

    def __init__(
        self,
        images: np.ndarray,
        batch_rays: int,
        *,
        n_threads: int = 2,
        queue_capacity: int = 4,
        seed: int = 0,
    ):
        lib = _lib()
        if lib is None:
            raise RuntimeError("native loader unavailable (build native/ first)")
        assert images.dtype == np.uint8 and images.ndim == 3
        self._images = np.ascontiguousarray(images)  # keep the buffer alive
        self._lib = lib
        v, p, c = self._images.shape
        self.views, self.pixels, self.channels = v, p, c
        self.batch_rays = int(batch_rays)
        self._handle = lib.loader_create(
            self._images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            v, p, c, self.batch_rays, n_threads, queue_capacity,
            ctypes.c_uint64(np.uint64(seed if seed else 0x9E3779B97F4A7C15)),
        )
        # reusable output buffers (loader_next copies into caller memory)
        self._view = np.zeros((1,), np.int32)
        self._inds = np.zeros((self.batch_rays,), np.int32)
        self._pix = np.zeros((self.batch_rays, c), np.float32)

    def next(self) -> Tuple[int, np.ndarray, np.ndarray]:
        """Blocking: (view, ray indices [n], float32 pixels [n, C] in [0,1]).

        Returned arrays are copies (safe to hold across calls)."""
        self._lib.loader_next(
            self._handle,
            self._view.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            self._inds.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            self._pix.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return int(self._view[0]), self._inds.copy(), self._pix.copy()

    def close(self):
        if getattr(self, "_handle", None):
            self._lib.loader_destroy(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):  # pragma: no cover - gc timing
        try:
            self.close()
        except Exception:
            pass
