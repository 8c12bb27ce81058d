"""Torch-free reader for PyTorch ``.pth``/``.bin`` checkpoints.

The reference ships its zoo as ``torch.save``-serialized state dicts downloaded at
factory time (holocron/models/utils.py:89-113). Its base dependency set includes
torch, so ``pretrained=True`` always works; this package's runtime deps are JAX-only,
so the checkpoint bytes are parsed here directly instead of via ``torch.load``:

- **Zip format** (torch >= 1.6 default): a zipfile holding ``<stem>/data.pkl`` (the
  pickled object graph, where each tensor is ``torch._utils._rebuild_tensor_v2(
  storage, offset, size, stride, ...)`` and each storage is a pickle persistent-id
  ``('storage', StorageType, key, location, numel)``) plus one raw little-endian
  buffer per storage under ``<stem>/data/<key>``.
- **Legacy format** (pre-1.6): a single stream of pickles (magic, protocol, sys-info,
  object graph, storage-key list) followed by the raw storage buffers, each prefixed
  with an int64 element count.

Only data is reconstructed (as numpy arrays) — no code execution: the unpickler
whitelists the handful of rebuild functions/classes torch emits for plain tensor
checkpoints and refuses everything else, which is strictly safer than
``torch.load(weights_only=False)``.
"""

import io
import pickle
import struct
import zipfile
from typing import Any, BinaryIO, Dict, Tuple

import numpy as np

__all__ = ["read_pth"]

try:  # bfloat16 checkpoints (ml_dtypes ships with jax)
    from ml_dtypes import bfloat16 as _bf16
except ImportError:  # pragma: no cover
    _bf16 = None

# torch storage-class name -> numpy dtype (sizes per torch/serialization.py naming)
_STORAGE_DTYPES: Dict[str, Any] = {
    "DoubleStorage": np.float64,
    "FloatStorage": np.float32,
    "HalfStorage": np.float16,
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
    "BFloat16Storage": _bf16,
    "ComplexFloatStorage": np.complex64,
    "ComplexDoubleStorage": np.complex128,
}

_LEGACY_MAGIC = 0x1950A86A20F9469CFC6C


class _Storage:
    """A storage buffer: either eagerly decoded (zip) or filled after unpickling
    (legacy, where the raw bytes follow the pickle stream)."""

    __slots__ = ("dtype", "nbytes", "data")

    def __init__(self, dtype, nbytes: int):
        self.dtype = dtype
        self.nbytes = nbytes
        self.data: np.ndarray = None  # type: ignore[assignment]

    def fill(self, raw: bytes) -> None:
        if self.dtype is None:
            raise ValueError("bfloat16 checkpoint but ml_dtypes is not importable")
        self.data = np.frombuffer(raw, dtype=self.dtype)


class _LazyTensor:
    """Deferred strided view over a storage — materialized once all storages are
    filled (legacy format delivers the bytes after the object graph)."""

    __slots__ = ("storage", "offset", "size", "stride")

    def __init__(self, storage: _Storage, offset: int, size, stride):
        self.storage = storage
        self.offset = offset
        self.size = tuple(size)
        self.stride = tuple(stride)

    def materialize(self) -> np.ndarray:
        arr = self.storage.data
        if arr is None:
            raise ValueError("corrupt checkpoint: tensor references a storage with no data")
        if not self.size:
            return arr[self.offset].copy()
        itemsize = arr.itemsize
        view = np.lib.stride_tricks.as_strided(
            arr[self.offset :], shape=self.size, strides=tuple(s * itemsize for s in self.stride)
        )
        return np.ascontiguousarray(view)


def _rebuild_tensor_v2(storage, offset, size, stride, requires_grad=None, backward_hooks=None, metadata=None):
    return _LazyTensor(storage, offset, size, stride)


def _rebuild_parameter(data, requires_grad=None, backward_hooks=None):
    return data


def _rebuild_from_type_v2(func, new_type, args, state):
    # tensor subclasses (e.g. Parameter saved via __reduce_ex__): the plain data
    # rebuild is the first element
    return func(*args)


class _MarkerDict(dict):
    """Stands in for OrderedDict while accepting the odd ``_metadata`` attribute
    torch sticks on state dicts."""

    def __setattr__(self, key, value):
        pass


_SAFE_GLOBALS: Dict[Tuple[str, str], Any] = {
    ("torch._utils", "_rebuild_tensor_v2"): _rebuild_tensor_v2,
    ("torch._utils", "_rebuild_tensor"): lambda storage, offset, size, stride: _LazyTensor(
        storage, offset, size, stride
    ),
    ("torch._utils", "_rebuild_parameter"): _rebuild_parameter,
    ("torch._tensor", "_rebuild_from_type_v2"): _rebuild_from_type_v2,
    ("collections", "OrderedDict"): _MarkerDict,
    ("torch", "Size"): tuple,
}


class _Unpickler(pickle.Unpickler):
    def __init__(self, file: BinaryIO, storages: Dict[str, _Storage], legacy: bool):
        super().__init__(file, encoding="utf-8")
        self._storages = storages
        self._legacy = legacy

    def find_class(self, module: str, name: str):
        fn = _SAFE_GLOBALS.get((module, name))
        if fn is not None:
            return fn
        if module in ("torch", "torch.storage") and (
            name in _STORAGE_DTYPES or name == "UntypedStorage"
        ):
            return ("storage_type", name)  # only ever consumed inside persistent ids
        raise pickle.UnpicklingError(
            f"refusing to unpickle global {module}.{name} — not a plain tensor checkpoint"
        )

    def persistent_load(self, pid):
        if not (isinstance(pid, tuple) and pid and pid[0] == "storage"):
            raise pickle.UnpicklingError(f"unsupported persistent id {pid!r}")
        _, storage_type, key, _location, numel = pid[:5]
        type_name = storage_type[1] if isinstance(storage_type, tuple) else storage_type
        key = str(key)
        if key not in self._storages:
            if type_name == "UntypedStorage":
                dtype, nbytes = np.uint8, int(numel)  # raw bytes; dtype comes from the tensor
            else:
                dtype = _STORAGE_DTYPES[type_name]
                itemsize = 2 if dtype is _bf16 else np.dtype(dtype).itemsize
                nbytes = int(numel) * itemsize
            self._storages[key] = _Storage(dtype, nbytes)
        return self._storages[key]


def _materialize(obj):
    if isinstance(obj, _LazyTensor):
        return obj.materialize()
    if isinstance(obj, dict):
        return {k: _materialize(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return type(obj)(_materialize(v) for v in obj)
    return obj


def _read_zip(f: BinaryIO) -> Any:
    zf = zipfile.ZipFile(f)
    names = zf.namelist()
    pkl_name = next(n for n in names if n.endswith("/data.pkl") or n == "data.pkl")
    stem = pkl_name[: -len("data.pkl")]
    storages: Dict[str, _Storage] = {}
    unpickler = _Unpickler(io.BytesIO(zf.read(pkl_name)), storages, legacy=False)
    obj = unpickler.load()
    for key, storage in storages.items():
        storage.fill(zf.read(f"{stem}data/{key}"))
    return _materialize(obj)


class _PlainUnpickler(pickle.Unpickler):
    """For the legacy header/trailer pickles (magic int, protocol version, sys-info
    dict, storage-key list): plain data only — any global or persistent id means the
    bytes are not a torch checkpoint header, so refuse BEFORE anything can run.
    (Stock ``pickle.load`` here would execute an attacker ``__reduce__`` payload
    before the magic number is even compared.)"""

    def find_class(self, module: str, name: str):
        raise pickle.UnpicklingError(
            f"refusing global {module}.{name} in a checkpoint header — plain data only"
        )

    def persistent_load(self, pid):
        raise pickle.UnpicklingError(f"unexpected persistent id {pid!r} in a checkpoint header")


def _plain_load(f: BinaryIO) -> Any:
    return _PlainUnpickler(f, encoding="utf-8").load()


def _read_legacy(f: BinaryIO) -> Any:
    magic = _plain_load(f)
    if magic != _LEGACY_MAGIC:
        raise ValueError("not a torch legacy checkpoint (bad magic)")
    _plain_load(f)  # protocol version
    _plain_load(f)  # sys info
    storages: Dict[str, _Storage] = {}
    obj = _Unpickler(f, storages, legacy=True).load()
    storage_keys = _plain_load(f)
    for key in storage_keys:
        (numel,) = struct.unpack("<q", f.read(8))
        storage = storages[str(key)]
        itemsize = 2 if storage.dtype is _bf16 else np.dtype(storage.dtype).itemsize
        storage.fill(f.read(numel * itemsize))
    return _materialize(obj)


def read_pth(path_or_file) -> Any:
    """Reads a ``torch.save`` checkpoint (zip or legacy format) without torch.

    Returns the saved object graph with every tensor as a contiguous numpy array
    (bfloat16 via ml_dtypes). Refuses pickles containing anything beyond plain
    tensor containers.
    """
    if hasattr(path_or_file, "read"):
        f = path_or_file
        own = False
    else:
        f = open(path_or_file, "rb")
        own = True
    try:
        if zipfile.is_zipfile(f):
            f.seek(0)
            return _read_zip(f)
        f.seek(0)
        return _read_legacy(f)
    finally:
        if own:
            f.close()
