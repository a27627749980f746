"""TensorStore — a minimal, memmap-able on-disk tensor tree.

The native converted-checkpoint format (SURVEY.md §5 "checkpoint/resume"
design consequence): the offline converter writes packed INT4 blocks +
scales here once, making every subsequent engine start O(read bandwidth) —
versus the reference's 15-20 minute per-boot CPU-dequant pipeline
(reference ``README.md:12``, ``streaming_unsloth_bnb.py``).

Layout: ``<root>/manifest.json`` maps dotted tensor names to
``{file, dtype, shape, byte_offset, byte_len}``; data lives in a few large
``.bin`` shard files, 64-byte aligned, so loads can memmap and
``jax.device_put`` slices directly. bfloat16 is stored natively via
ml_dtypes. No torch, no pickle.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Iterator, Optional, Tuple

import ml_dtypes
import numpy as np

_DTYPES = {
    "float32": np.float32,
    "float16": np.float16,
    "bfloat16": ml_dtypes.bfloat16,
    "uint8": np.uint8,
    "int8": np.int8,
    "int32": np.int32,
    "uint16": np.uint16,
}
_DTYPE_NAMES = {np.dtype(v): k for k, v in _DTYPES.items()}

_ALIGN = 64


class TensorStoreWriter:
    """Streaming writer: tensors are appended as they are produced, one shard
    file per ``shard_bytes`` (default 1 GiB), so converting a 20B model never
    holds more than one expert in RAM (the lesson of the reference's
    streaming loaders, ``streaming_unsloth_bnb.py:234-302``)."""

    def __init__(self, root: str, shard_bytes: int = 1 << 30):
        self.root = root
        self.shard_bytes = shard_bytes
        os.makedirs(root, exist_ok=True)
        self._manifest: Dict[str, dict] = {}
        self._meta: Dict[str, object] = {}
        self._shard_idx = -1
        self._shard_file = None
        self._shard_pos = 0
        self._open_new_shard()

    def _open_new_shard(self):
        if self._shard_file is not None:
            self._shard_file.close()
        self._shard_idx += 1
        self._shard_name = f"data-{self._shard_idx:05d}.bin"
        self._shard_file = open(os.path.join(self.root, self._shard_name), "wb")
        self._shard_pos = 0

    def add(self, name: str, array: np.ndarray) -> None:
        if name in self._manifest:
            raise ValueError(f"duplicate tensor name: {name}")
        arr = np.ascontiguousarray(array)
        dt = np.dtype(arr.dtype)
        if dt not in _DTYPE_NAMES:
            raise ValueError(f"unsupported dtype {dt} for {name}")
        if self._shard_pos > 0 and self._shard_pos + arr.nbytes > self.shard_bytes:
            self._open_new_shard()
        pad = (-self._shard_pos) % _ALIGN
        if pad:
            self._shard_file.write(b"\0" * pad)
            self._shard_pos += pad
        self._manifest[name] = {
            "file": self._shard_name,
            "dtype": _DTYPE_NAMES[dt],
            "shape": list(arr.shape),
            "byte_offset": self._shard_pos,
            "byte_len": arr.nbytes,
        }
        self._shard_file.write(arr.tobytes())
        self._shard_pos += arr.nbytes

    def set_metadata(self, key: str, value) -> None:
        self._meta[key] = value

    def finalize(self) -> None:
        self._shard_file.close()
        self._shard_file = None
        with open(os.path.join(self.root, "manifest.json"), "w") as f:
            json.dump({"tensors": self._manifest, "metadata": self._meta}, f, indent=1)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        if self._shard_file is not None:
            self.finalize()


class TensorStore:
    """Read side: memmap-backed named tensor access."""

    def __init__(self, root: str):
        self.root = root
        with open(os.path.join(root, "manifest.json")) as f:
            m = json.load(f)
        self.manifest: Dict[str, dict] = m["tensors"]
        self.metadata: Dict[str, object] = m.get("metadata", {})
        self._mmaps: Dict[str, np.memmap] = {}

    def keys(self) -> Iterator[str]:
        return iter(self.manifest.keys())

    def __contains__(self, name: str) -> bool:
        return name in self.manifest

    def _mmap(self, fname: str) -> np.memmap:
        if fname not in self._mmaps:
            self._mmaps[fname] = np.memmap(
                os.path.join(self.root, fname), dtype=np.uint8, mode="r"
            )
        return self._mmaps[fname]

    def read(self, name: str) -> np.ndarray:
        """Zero-copy view into the shard memmap."""
        info = self.manifest[name]
        raw = self._mmap(info["file"])[
            info["byte_offset"] : info["byte_offset"] + info["byte_len"]
        ]
        return raw.view(_DTYPES[info["dtype"]]).reshape(info["shape"])

    def shape(self, name: str) -> Tuple[int, ...]:
        return tuple(self.manifest[name]["shape"])

    def total_bytes(self) -> int:
        return sum(i["byte_len"] for i in self.manifest.values())
