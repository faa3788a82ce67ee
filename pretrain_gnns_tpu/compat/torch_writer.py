"""Torch-free WRITER for legacy torch checkpoint files.

Counterpart of torch_reader: emits the legacy (pre-zipfile) serialization
format that torch 1.0.1's ``torch.load`` accepts, so trunks trained in this
framework can be loaded by the unmodified reference code
(``GNN_graphpred.from_pretrained``, chem/model.py:354-356). Layout mirrors
torch/serialization.py's ``_legacy_save``:

  pickle(magic) pickle(protocol) pickle(sys_info)
  pickle(obj with persistent_id storage refs)
  pickle([storage keys]) then per key: int64 numel + raw bytes
"""

from __future__ import annotations

import pickle
from collections import OrderedDict
from typing import Mapping

import numpy as np

_MAGIC = 0x1950A86A20F9469CFC6C
_PROTOCOL = 1001
_SYS_INFO = {
    "protocol_version": _PROTOCOL,
    "little_endian": True,
    "type_sizes": {"short": 2, "int": 4, "long": 4},
}

_DTYPE_TO_STORAGE = {
    np.dtype(np.float32): "FloatStorage",
    np.dtype(np.float64): "DoubleStorage",
    np.dtype(np.float16): "HalfStorage",
    np.dtype(np.int64): "LongStorage",
    np.dtype(np.int32): "IntStorage",
    np.dtype(np.int16): "ShortStorage",
    np.dtype(np.int8): "CharStorage",
    np.dtype(np.uint8): "ByteStorage",
    np.dtype(np.bool_): "BoolStorage",
}


class _Global:
    """Pickled as a raw GLOBAL opcode (module.name) without pickle's
    lookup/identity checks — torch need not be importable."""

    def __init__(self, module: str, name: str):
        self.module, self.name = module, name

    def __call__(self, *a, **kw):  # satisfies pickle's callable check
        raise NotImplementedError


_REBUILD = _Global("torch._utils", "_rebuild_tensor_v2")
_STORAGE_CLASSES = {
    name: _Global("torch", name) for name in _DTYPE_TO_STORAGE.values()
}


class _Tensor:
    """Pickles as torch._utils._rebuild_tensor_v2(storage, 0, size,
    stride, False, OrderedDict())."""

    def __init__(self, arr: np.ndarray, key: str):
        arr = np.asarray(arr)
        if not arr.flags.c_contiguous:
            arr = arr.copy()  # NOT ascontiguousarray: it promotes 0-d to 1-d
        self.arr = arr
        self.key = key

    def __reduce_ex__(self, protocol):
        storage = _Storage(self.arr, self.key)
        size = self.arr.shape
        stride = tuple(
            s // self.arr.dtype.itemsize for s in self.arr.strides
        )
        return (
            _REBUILD,
            (storage, 0, size, stride, False, OrderedDict()),
        )


class _Storage:
    def __init__(self, arr: np.ndarray, key: str):
        self.arr = arr
        self.key = key


class _Pickler(pickle._Pickler):  # pure-python pickler: save() overridable
    def __init__(self, f):
        super().__init__(f, protocol=2)
        self.storages: "OrderedDict[str, np.ndarray]" = OrderedDict()

    def save(self, obj, save_persistent_id=True):
        if isinstance(obj, _Global):
            self.write(
                b"c" + obj.module.encode() + b"\n"
                + obj.name.encode() + b"\n"
            )
            return
        super().save(obj, save_persistent_id)

    def persistent_id(self, obj):
        if isinstance(obj, _Storage):
            st_name = _DTYPE_TO_STORAGE[obj.arr.dtype]
            self.storages.setdefault(obj.key, obj.arr)
            # 6th element: view_metadata (torch <=1.2 format, expected by
            # torch's legacy loader)
            return (
                "storage",
                _STORAGE_CLASSES[st_name],
                obj.key,
                "cpu",
                obj.arr.size,
                None,
            )
        return None


def save_state_dict(state_dict: Mapping[str, np.ndarray], path: str) -> None:
    """Write {name: array} as a legacy torch checkpoint (OrderedDict of
    tensors, the reference trunk format)."""
    obj = OrderedDict(
        (k, _Tensor(np.asarray(v), str(i)))
        for i, (k, v) in enumerate(state_dict.items())
    )
    with open(path, "wb") as f:
        pickle.dump(_MAGIC, f, protocol=2)
        pickle.dump(_PROTOCOL, f, protocol=2)
        pickle.dump(_SYS_INFO, f, protocol=2)
        p = _Pickler(f)
        p.dump(obj)
        keys = list(p.storages.keys())
        pickle.dump(keys, f, protocol=2)
        for k in keys:
            arr = p.storages[k]
            f.write(np.int64(arr.size).tobytes())
            f.write(arr.tobytes())
