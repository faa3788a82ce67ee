"""Torch-free reader for legacy (pre-zipfile) torch checkpoint files.

The reference ships its released weights as legacy torch serialization
(torch 1.0.1 ``torch.save`` of a trunk ``state_dict()``, e.g.
chem/pretrain_masking.py:146-147; format verified in SURVEY.md §2.5). This
module parses that format with only pickle + numpy, so checkpoint import
works without torch installed. Layout of a legacy file:

  1. pickle: magic number (0x1950a86a20f9469cfc6c)
  2. pickle: protocol version (1001)
  3. pickle: system info dict
  4. pickle: the object graph; tensors are ``torch._utils._rebuild_tensor_v2``
     calls over persistent-id storage references
     ``('storage', StorageType, root_key, location, numel)``
  5. pickle: list of storage root keys in serialization order
  6. per key: little-endian int64 element count, then raw storage bytes

Also supports the modern zipfile format (torch >= 1.6) so checkpoints written
by the installed torch round-trip too.
"""

from __future__ import annotations

import io
import os
import pickle
import struct
import zipfile
from collections import OrderedDict
from typing import Any, Dict

import numpy as np

_MAGIC = 0x1950A86A20F9469CFC6C

_STORAGE_DTYPES = {
    "FloatStorage": np.float32,
    "DoubleStorage": np.float64,
    "HalfStorage": np.float16,
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
    "BFloat16Storage": None,  # handled specially (numpy has no bf16)
}


class _StorageRef:
    def __init__(self, key: str, dtype, numel: int):
        self.key, self.dtype, self.numel = key, dtype, numel
        self.data: np.ndarray | None = None


class _TensorStub:
    def __init__(self, storage: _StorageRef, offset, size, stride):
        self.storage, self.offset = storage, offset
        self.size, self.stride = tuple(size), tuple(stride)

    def materialize(self) -> np.ndarray:
        buf = self.storage.data
        if buf is None:
            raise ValueError(f"storage {self.storage.key} never loaded")
        itemsize = buf.dtype.itemsize
        return np.lib.stride_tricks.as_strided(
            buf[self.offset:],
            shape=self.size,
            strides=tuple(s * itemsize for s in self.stride),
        ).copy()


def _rebuild_tensor_v2(storage, offset, size, stride, *unused):
    return _TensorStub(storage, offset, size, stride)


def _rebuild_tensor(storage, offset, size, stride):
    return _TensorStub(storage, offset, size, stride)


class _StorageTypeTag:
    def __init__(self, name: str):
        self.name = name


_SAFE_BUILTINS = {
    ("collections", "OrderedDict"): OrderedDict,
    ("torch._utils", "_rebuild_tensor_v2"): _rebuild_tensor_v2,
    ("torch._utils", "_rebuild_tensor"): _rebuild_tensor,
}


class ObjStub:
    """Inert stand-in for a foreign class in a pickle (e.g. PyG ``Data``):
    pickle NEWOBJ/BUILD only allocates it and fills ``__dict__`` — no code
    from the original class ever runs."""

    def __init__(self, *args, **kwargs):  # REDUCE-with-args tolerance
        pass


class _Unpickler(pickle.Unpickler):
    """Allow-list unpickler: torch tensor plumbing only, nothing executable.

    ``extra_classes`` maps additional allowed (module, name) pairs to inert
    stub classes (used by compat.import_pyg for torch_geometric containers).
    """

    def __init__(self, f, storages: Dict[str, _StorageRef],
                 extra_classes: Dict[tuple, type] | None = None):
        super().__init__(f, encoding="utf-8")
        self._storages = storages
        self._extra = extra_classes or {}

    def find_class(self, module, name):
        if (module, name) in _SAFE_BUILTINS:
            return _SAFE_BUILTINS[(module, name)]
        if (module, name) in self._extra:
            return self._extra[(module, name)]
        if module == "torch" and name in _STORAGE_DTYPES:
            return _StorageTypeTag(name)
        raise pickle.UnpicklingError(
            f"refusing to unpickle {module}.{name}"
        )

    def persistent_load(self, pid):
        if not (isinstance(pid, tuple) and pid and pid[0] == "storage"):
            raise pickle.UnpicklingError(f"unknown persistent id {pid!r}")
        # torch <=1.2 appends a 6th view_metadata field; ignore it
        _, storage_type, root_key, _location, numel = pid[:5]
        if isinstance(storage_type, _StorageTypeTag):
            type_name = storage_type.name
        else:  # torch >=1.13 writes UntypedStorage + dtype separately
            type_name = getattr(storage_type, "__name__", str(storage_type))
        dtype = _STORAGE_DTYPES.get(type_name)
        if root_key not in self._storages:
            self._storages[root_key] = _StorageRef(root_key, dtype, numel)
        return self._storages[root_key]


def _materialize(obj: Any) -> Any:
    if isinstance(obj, _TensorStub):
        return obj.materialize()
    if isinstance(obj, (dict, OrderedDict)):
        return type(obj)((k, _materialize(v)) for k, v in obj.items())
    if isinstance(obj, (list, tuple)):
        return type(obj)(_materialize(v) for v in obj)
    if isinstance(obj, ObjStub):
        obj.__dict__ = {
            k: _materialize(v) for k, v in obj.__dict__.items()
        }
        return obj
    return obj


def _load_legacy(f, extra_classes=None) -> Any:
    storages: Dict[str, _StorageRef] = {}
    magic = pickle.load(f)
    if magic != _MAGIC:
        raise ValueError("not a legacy torch file (bad magic)")
    pickle.load(f)  # protocol version
    pickle.load(f)  # sys info
    result = _Unpickler(f, storages, extra_classes).load()
    keys = pickle.load(f)
    for key in keys:
        ref = storages[key]
        (numel,) = struct.unpack("<q", f.read(8))
        dtype = np.dtype(ref.dtype)
        ref.data = np.frombuffer(
            f.read(numel * dtype.itemsize), dtype=dtype
        )
    return _materialize(result)


def _load_zip(path: str, extra_classes=None) -> Any:
    storages: Dict[str, _StorageRef] = {}
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        pkl_name = next(n for n in names if n.endswith("/data.pkl"))
        prefix = pkl_name[: -len("data.pkl")]
        result = _Unpickler(
            io.BytesIO(zf.read(pkl_name)), storages, extra_classes
        ).load()
        for key, ref in storages.items():
            raw = zf.read(f"{prefix}data/{key}")
            ref.data = np.frombuffer(raw, dtype=np.dtype(ref.dtype))
    return _materialize(result)


def load_torch_checkpoint(path: str, extra_classes=None) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint (legacy or zip) as name -> numpy array."""
    if zipfile.is_zipfile(path):
        return _load_zip(path, extra_classes)
    with open(path, "rb") as f:
        return _load_legacy(f, extra_classes)
